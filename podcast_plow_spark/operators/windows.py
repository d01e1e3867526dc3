"""Window-family operators (SURVEY.md §2.6/§2.7).

- latest_per_key: Postgres ``DISTINCT ON (k) ... ORDER BY k, ts DESC``
  (reference ``server/app.py:799-803``) → row_number window.
- top_n_per_group: nightly per-show selection (reference
  ``.github/workflows/nightly.yml:108-118``).
- chunk_tokens: sliding 1800-token / 10%-overlap chunker (reference
  ``server/services/chunker.py:14-15,68-103``) — expressed as a pure
  Column pipeline (sequence → transform → slice), no Python in the
  loop; each row is independent so it scales embarrassingly.
- budgeted_top_k: greedy sentence selection under a word budget
  (reference ``server/ingest/summaries.py:48-74``) via a cumulative-sum
  window.

Scale notes: all windows here partition by a key (claim_id,
podcast_id, transcript_id) — no global windows. Skewed keys are
bounded by domain (one podcast has bounded episodes), so no salting
needed in this family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["latest_per_key", "top_n_per_group", "chunk_tokens", "budgeted_top_k"]


def latest_per_key(df: DataFrame, key: str | list[str], order: list[Column]) -> DataFrame:
    """W1: keep the first row per key under ``order`` (e.g.
    ``[desc(created_at), desc(id)]`` for latest)."""
    keys = [key] if isinstance(key, str) else key
    w = Window.partitionBy(*keys).orderBy(*order)
    return df.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1).drop("__rn")


def top_n_per_group(df: DataFrame, group: str | list[str], order: list[Column], n: int) -> DataFrame:
    """W2: row_number ≤ n per group."""
    keys = [group] if isinstance(group, str) else group
    w = Window.partitionBy(*keys).orderBy(*order)
    return df.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= n)


def chunk_tokens(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_tokens: int = 1800,
    overlap_ratio: float = 0.1,
) -> DataFrame:
    """W3: fixed-window token chunks with overlap.

    Reference semantics (server/services/chunker.py:68-103): tokens =
    whitespace split; window of ``max_tokens``; next window starts at
    ``end - floor(overlap_ratio * window_size)``; emits (chunk_index,
    token_start, token_end, token_count, text).

    Spark expression: step = max_tokens - floor(overlap_ratio *
    max_tokens) for full windows; start positions = sequence(0, n-1,
    step); chunk = slice(tokens, start+1, max_tokens). The trailing
    partial window keeps the reference's overlap-from-end behaviour
    because slice() truncates at the array end.
    """
    step = max_tokens - int(overlap_ratio * max_tokens)
    tokens = F.split(F.trim(F.col(text_col)), r"\s+")
    out = (
        df.withColumn("__tokens", tokens)
        .withColumn("__n", F.size("__tokens"))
        .withColumn(
            "__starts",
            F.when(F.col("__n") <= 0, F.array().cast("array<int>")).otherwise(
                F.sequence(F.lit(0), F.greatest(F.col("__n") - 1, F.lit(0)), F.lit(step))
            ),
        )
        .select(
            F.col(id_col),
            F.posexplode("__starts").alias("chunk_index", "token_start"),
            F.col("__tokens"),
            F.col("__n"),
        )
        # drop degenerate trailing windows fully covered by the previous one
        .where((F.col("token_start") == 0) | (F.col("token_start") < F.col("__n")))
        .withColumn("token_end", F.least(F.col("token_start") + max_tokens, F.col("__n")))
        .withColumn("token_count", F.col("token_end") - F.col("token_start"))
        .where(F.col("token_count") > 0)
        .withColumn("text", F.array_join(F.slice("__tokens", F.col("token_start") + 1, F.lit(max_tokens)), " "))
        .drop("__tokens", "__n")
    )
    return out


def budgeted_top_k(
    df: DataFrame,
    score: Column,
    words: Column,
    budget: int,
    max_items: int,
    min_words: int = 6,
    tiebreak: list[Column] | None = None,
) -> DataFrame:
    """K5: rank by score desc, keep rows while the running word total
    stays within budget and rank ≤ max_items (reference
    server/ingest/summaries.py:48-74)."""
    order = [score.desc()] + (tiebreak or [])
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = (
        df.where(words >= min_words)
        .withColumn("__cum_words", F.sum(words).over(w))
        .withColumn("__rank", F.row_number().over(Window.orderBy(*order)))
    )
    return ranked.where((F.col("__cum_words") <= budget) & (F.col("__rank") <= max_items)).drop(
        "__cum_words", "__rank"
    )
