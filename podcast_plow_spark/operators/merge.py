"""Upsert / merge sinks (SURVEY.md §2.1 S8–S14, §2.8 D5).

The reference's sinks are row-at-a-time Postgres upserts; their batch
semantics are deterministic column algebra, so each is expressed as a
single DataFrame merge (the parquet-fallback form of Iceberg
``MERGE INTO``; swap in `spark.sql("MERGE INTO ...")` on a real
catalog — the column expressions are identical):

- S8  upsert_coalesce: update uses ``COALESCE(new, old)`` per column
      (reference ``server/ingest/feeds.py:106-135``).
- S9  key precedence guid-else-url: merge key =
      ``coalesce(guid, show_notes_url)`` with title overwritten and the
      rest coalesced (reference ``server/ingest/feeds.py:138-214``).
- S10 cross-fill ids: ``COALESCE(NULLIF(new,''), old)``
      (reference ``server/services/evidence_fetcher.py:632-693``).
- S11 insert_if_absent: ``ON CONFLICT DO NOTHING``
      (reference ``server/ingest/transcripts.py:124-136``).
- S12 delete_and_replace: per-partition delete+insert
      (reference ``worker/claim_pipeline.py:49-70``) — the
      ``replaceWhere`` dynamic-overwrite analog.
- D5  dedup_gc: first-id-per-key is primary, rest deleted
      (reference ``server/services/claims.py:76-105``).

Scale notes: every merge is an equi-join on the key — broadcast when
the source batch is small (the common crawl case: epoch-sized source
vs huge target), shuffle-hash otherwise; AQE picks per-batch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "upsert_coalesce",
    "insert_if_absent",
    "delete_and_replace",
    "dedup_gc",
]


def upsert_coalesce(
    target: DataFrame,
    source: DataFrame,
    key: str | list[str],
    overwrite_cols: list[str] | None = None,
    nullif_empty_cols: list[str] | None = None,
) -> DataFrame:
    """MERGE: matched rows take ``coalesce(source.col, target.col)``
    per non-key column (``overwrite_cols`` take source
    unconditionally; ``nullif_empty_cols`` treat '' as NULL first —
    the S10 cross-fill rule); unmatched source rows insert."""
    keys = [key] if isinstance(key, str) else list(key)
    overwrite = set(overwrite_cols or [])
    nullify = set(nullif_empty_cols or [])
    data_cols = [c for c in target.columns if c not in keys]

    src = source.select(
        F.lit(True).alias("__s_present"),
        *[F.col(k).alias(f"__k_{k}") for k in keys],
        *[F.col(c).alias(f"__s_{c}") for c in source.columns if c not in keys],
    )
    # presence is detected via sentinel columns, NOT key nullness — a
    # row whose key column happens to be NULL must survive the merge
    # as itself rather than be mistaken for the absent side.
    tgt = target.withColumn("__t_present", F.lit(True))
    cond = None
    for k in keys:
        c = tgt[k] == src[f"__k_{k}"]
        cond = c if cond is None else cond & c
    joined = tgt.join(src, cond, "full_outer")

    matched_t = tgt["__t_present"].isNotNull()
    matched_s = src["__s_present"].isNotNull()
    target = tgt  # merged()/key_cols below resolve columns against the joined side

    def merged(c: str) -> Column:
        s = F.col(f"__s_{c}") if f"__s_{c}" in joined.columns else F.lit(None)
        if c in nullify:
            s = F.nullif(s, F.lit(""))
        t = target[c]
        if c in overwrite:
            upd = s
        else:
            upd = F.coalesce(s, t)
        return (
            F.when(matched_t & matched_s, upd)
            .when(matched_t, t)
            .otherwise(s)
            .alias(c)
        )

    key_cols = [
        F.when(matched_t, target[k]).otherwise(src[f"__k_{k}"]).alias(k) for k in keys
    ]
    return joined.select(*key_cols, *[merged(c) for c in data_cols])


def insert_if_absent(target: DataFrame, source: DataFrame, key: str | list[str]) -> DataFrame:
    """S11: append only source rows whose key is absent from target."""
    keys = [key] if isinstance(key, str) else list(key)
    fresh = source.join(target.select(*keys).distinct(), keys, "left_anti")
    return target.unionByName(fresh.select(*target.columns))


def delete_and_replace(target: DataFrame, replacement: DataFrame, predicate: Column) -> DataFrame:
    """S12: drop target rows matching ``predicate``, insert
    ``replacement`` (idempotent re-run semantics; the Iceberg
    ``overwrite(predicate)`` / ``replaceWhere`` analog)."""
    return target.where(~predicate).unionByName(replacement.select(*target.columns))


def dedup_gc(df: DataFrame, key_col: str, id_col: str) -> tuple[DataFrame, DataFrame]:
    """D5: per key keep the min-id row (primary); return
    (kept, deleted_ids)."""
    w = Window.partitionBy(key_col).orderBy(F.col(id_col).asc())
    ranked = df.withColumn("__rn", F.row_number().over(w))
    kept = ranked.where(F.col("__rn") == 1).drop("__rn")
    deleted = ranked.where(F.col("__rn") > 1).select(id_col)
    return kept, deleted
