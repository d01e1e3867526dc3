"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — one entry per implemented operator from SURVEY.md §2.
``oracle_sql()`` — DuckDB-equivalent ANSI SQL per query.

Column-name + rounding discipline: every computed column is aliased
identically on both sides; double-valued aggregates are rounded (2–6
decimals) on both sides so engine-order-dependent FP summation cannot
flip the driver's value hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

SF0001 = "/root/testdata/sf0.001"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ----------------------------------------------------------------------
# Flagship: pricing summary (A1/A-family aggregation; TPC-H Q1 shape)
# ----------------------------------------------------------------------

def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_SQL_PRICING = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(AVG(l_discount), 6) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ----------------------------------------------------------------------
# Q2/K1 — frontier dequeue ordering (priority DESC, run_at, seq) top-K
# (reference server/services/jobs.py:259). orders stands in: priority
# derived from o_orderpriority, run_at = o_orderdate, seq = o_orderkey.
# ----------------------------------------------------------------------

def q_dequeue_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    pri = (6 - F.substring("o_orderpriority", 1, 1).cast("int")).alias("priority")
    batch = (
        orders.select("o_orderkey", "o_orderdate", pri)
        .orderBy(F.col("priority").desc(), F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .limit(100)
    )
    w = Window.orderBy(F.col("priority").desc(), F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
    return batch.withColumn("crawl_rank", F.row_number().over(w).cast("long"))


_SQL_DEQUEUE = """
SELECT o_orderkey, o_orderdate,
       6 - CAST(substr(o_orderpriority, 1, 1) AS INT) AS priority,
       CAST(ROW_NUMBER() OVER (ORDER BY 6 - CAST(substr(o_orderpriority,1,1) AS INT) DESC,
                               o_orderdate ASC, o_orderkey ASC) AS BIGINT) AS crawl_rank
FROM orders
ORDER BY crawl_rank
LIMIT 100
"""


# ----------------------------------------------------------------------
# W1/J2 — latest-per-key (DISTINCT ON analog; reference server/app.py:799-803)
# ----------------------------------------------------------------------

def q_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", F.col("event_id").alias("last_event_id"), F.col("ts").alias("last_ts"),
                F.col("event_type").alias("last_type"))
    )


_SQL_LATEST_EVENT = """
SELECT user_id, event_id AS last_event_id, ts AS last_ts, event_type AS last_type
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
WHERE rn = 1
"""


# ----------------------------------------------------------------------
# W2 — top-N per group (reference .github/workflows/nightly.yml:108-118)
# ----------------------------------------------------------------------

def q_top2_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate").desc_nulls_last(), F.col("o_orderkey").desc())
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 2)
        .select("o_custkey", "o_orderkey", "o_orderdate", F.col("rn").cast("long").alias("rn"))
    )


_SQL_TOP2 = """
SELECT o_custkey, o_orderkey, o_orderdate, CAST(rn AS BIGINT) AS rn
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate DESC NULLS LAST, o_orderkey DESC) AS rn
      FROM orders)
WHERE rn <= 2
"""


# ----------------------------------------------------------------------
# J3 — anti-join (reference server/ingest/transcripts.py:104-110)
# ----------------------------------------------------------------------

def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti").select("c_custkey", "c_name")


_SQL_NO_ORDERS = """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


# ----------------------------------------------------------------------
# J6 — lateral-count join (reference server/ui/__init__.py:80-84)
# ----------------------------------------------------------------------

def q_customer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    counts = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        c.join(counts, c["c_custkey"] == counts["o_custkey"], "left")
        .select("c_custkey", F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("order_count"))
    )


_SQL_ORDER_COUNTS = """
SELECT c_custkey,
       CAST(COALESCE((SELECT COUNT(*) FROM orders o WHERE o.o_custkey = c.c_custkey), 0) AS BIGINT) AS order_count
FROM customer c
"""


# ----------------------------------------------------------------------
# J1 — inner equi-join, broadcastable dim (reference server/app.py:876-882)
# ----------------------------------------------------------------------

def q_orders_with_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders")
    joined = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"], "inner")
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"], "inner")
    )
    return (
        joined.groupBy("n_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"), F.count(F.lit(1)).alias("n_orders"))
        .orderBy("n_name")
    )


_SQL_ORDERS_NATION = """
SELECT n_name, ROUND(SUM(o_totalprice), 2) AS revenue, COUNT(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_name
"""


# ----------------------------------------------------------------------
# F12/K6 — ILIKE search with recency cap (reference server/app.py:962-1021)
# ----------------------------------------------------------------------

def q_search_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return (
        p.where(F.lower(F.col("p_name")).contains("red"))
        .orderBy(F.col("p_partkey").asc())
        .limit(20)
        .select("p_partkey", "p_name", "p_type")
    )


_SQL_SEARCH_PARTS = """
SELECT p_partkey, p_name, p_type FROM part
WHERE p_name ILIKE '%red%' ORDER BY p_partkey ASC LIMIT 20
"""


# ----------------------------------------------------------------------
# Q4/X24 — retry backoff base math (reference server/services/jobs.py:121-134)
# (the jittered variant is deterministic-seeded and covered by pytest;
#  the clamp envelope is the SQL-expressible part)
# ----------------------------------------------------------------------

def q_retry_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    attempts = (F.col("event_id") % 5).cast("int").alias("attempts")
    base = F.greatest(F.lit(30), F.least((F.col("event_id") % 5) * 60, F.lit(3600))).cast("long")
    return ev.select("event_id", attempts, base.alias("backoff_base_sec"))


_SQL_BACKOFF = """
SELECT event_id, CAST(event_id % 5 AS INT) AS attempts,
       CAST(GREATEST(30, LEAST((event_id % 5) * 60, 3600)) AS BIGINT) AS backoff_base_sec
FROM events
"""


# ----------------------------------------------------------------------
# X9/Q5 — sha256 fingerprints (reference server/services/jobs.py:166-182)
# ----------------------------------------------------------------------

def q_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    msg = F.concat_ws(":", F.lit("evt"), F.col("event_id").cast("string"), F.col("event_type"))
    return ev.select("event_id", F.sha2(msg, 256).alias("fingerprint"))


_SQL_FINGERPRINTS = """
SELECT event_id, sha256('evt:' || CAST(event_id AS VARCHAR) || ':' || event_type) AS fingerprint
FROM events
"""


# ----------------------------------------------------------------------
# X6/A7/D4 — normalise + dedup-with-min (reference
# worker/claim_extraction.py:312-316; server/services/claims.py:55-73)
# ----------------------------------------------------------------------

def q_normalise_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9\s]", ""), r"\s+", " "))
    return (
        d.select(F.sha2(norm, 256).alias("norm_key"), "doc_id")
        .groupBy("norm_key")
        .agg(F.min("doc_id").alias("primary_id"), F.count(F.lit(1)).alias("dup_count"))
    )


_SQL_NORM_DEDUP = r"""
SELECT sha256(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g'))) AS norm_key,
       MIN(doc_id) AS primary_id, COUNT(*) AS dup_count
FROM documents GROUP BY 1
"""


# ----------------------------------------------------------------------
# A5 — word-frequency scoring (reference server/ingest/summaries.py:32-45)
# ----------------------------------------------------------------------

def q_word_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("word"))
        .where(F.length("word") > 3)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("word").asc())
        .limit(20)
    )


_SQL_WORD_FREQ = r"""
SELECT word, COUNT(*) AS cnt
FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS word FROM documents)
WHERE length(word) > 3
GROUP BY word ORDER BY cnt DESC, word ASC LIMIT 20
"""


# ----------------------------------------------------------------------
# X18 — risk-level tiers (reference worker/claim_extraction.py:326-333)
# ----------------------------------------------------------------------

def q_risk_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    from podcast_plow_spark.functions.text import risk_level_col

    d = _t(spark, sf_dir, "documents")
    return (
        d.select(risk_level_col(F.lower(F.col("text"))).alias("risk_level"))
        .groupBy("risk_level")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("risk_level")
    )


_SQL_RISK = r"""
SELECT CASE
         WHEN regexp_matches(lower(text), '\b(?:cures?|eliminates|guarantees)\b') THEN 'high'
         WHEN regexp_matches(lower(text), '\b(?:may|might|could|suggests?)\b') THEN 'low'
         WHEN regexp_matches(lower(text), '\b(?:reduces?|lowers?|decreases?|improves?|enhances?|raises?|increases?)\b') THEN 'medium'
         ELSE 'medium'
       END AS risk_level, COUNT(*) AS n
FROM documents GROUP BY 1 ORDER BY risk_level
"""


# ----------------------------------------------------------------------
# A3 — grade-aggregation decision tree (reference server/services/grader.py:137-195)
# events as pseudo-evidence: claim = user_id % 100, stance/type derived.
# ----------------------------------------------------------------------

def q_grade_claims(spark: SparkSession, sf_dir: str) -> DataFrame:
    from podcast_plow_spark.operators.grade import grade_claims

    ev = _t(spark, sf_dir, "events")
    pseudo = ev.select(
        (F.col("user_id") % 100).alias("claim_id"),
        F.when(F.col("event_type").isin("purchase", "signup"), F.lit("supports"))
        .when(F.col("event_type") == "error", F.lit("refutes"))
        .otherwise(F.lit("neutral"))
        .alias("stance"),
        F.when(F.col("value") >= 400, F.lit("meta-analysis"))
        .when(F.col("value") >= 300, F.lit("randomized controlled trial"))
        .when(F.col("value") >= 100, F.lit("cohort study"))
        .otherwise(F.lit("in vitro study"))
        .alias("type"),
    )
    return grade_claims(pseudo).select("claim_id", "total_support", "total_refute", "grade").orderBy("claim_id")


_SQL_GRADE = """
WITH pseudo AS (
  SELECT user_id % 100 AS claim_id,
         CASE WHEN event_type IN ('purchase','signup') THEN 'supports'
              WHEN event_type = 'error' THEN 'refutes' ELSE 'neutral' END AS stance,
         CASE WHEN value >= 400 THEN 'meta'
              WHEN value >= 300 THEN 'rct'
              WHEN value >= 100 THEN 'observational'
              ELSE 'weak' END AS bucket
  FROM events
), agg AS (
  SELECT claim_id,
         CAST(SUM(CASE WHEN stance='supports' AND bucket='meta' THEN 1 ELSE 0 END) AS BIGINT) AS s_meta,
         CAST(SUM(CASE WHEN stance='supports' AND bucket='rct' THEN 1 ELSE 0 END) AS BIGINT) AS s_rct,
         CAST(SUM(CASE WHEN stance='supports' AND bucket='observational' THEN 1 ELSE 0 END) AS BIGINT) AS s_obs,
         CAST(SUM(CASE WHEN stance='supports' AND bucket='weak' THEN 1 ELSE 0 END) AS BIGINT) AS s_weak,
         CAST(SUM(CASE WHEN stance='refutes' THEN 1 ELSE 0 END) AS BIGINT) AS total_refute
  FROM pseudo GROUP BY claim_id
)
SELECT claim_id, s_meta + s_rct + s_obs + s_weak AS total_support, total_refute,
       CASE WHEN s_meta + s_rct + s_obs + s_weak = 0 THEN 'unsupported'
            WHEN total_refute > s_meta + s_rct + s_obs + s_weak THEN 'unsupported'
            WHEN s_meta >= 1 OR s_rct >= 2 THEN 'strong'
            WHEN s_rct >= 1 THEN 'moderate'
            WHEN s_obs >= 2 THEN 'moderate'
            WHEN s_obs >= 1 OR s_weak >= 1 THEN 'weak'
            ELSE 'unsupported' END AS grade
FROM agg ORDER BY claim_id
"""


# ----------------------------------------------------------------------
# X11 — JSON payload parse-with-fallback (reference server/services/jobs.py:95-110)
# ----------------------------------------------------------------------

def q_json_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        ev.select("event_type", F.coalesce(k, F.lit(0)).alias("k"))
        .groupBy("event_type")
        .agg(F.round(F.avg("k"), 4).alias("avg_k"), F.count(F.lit(1)).alias("n"))
        .orderBy("event_type")
    )


_SQL_JSON = """
SELECT event_type, ROUND(AVG(COALESCE(CAST(json_extract_string(props, '$.k') AS INT), 0)), 4) AS avg_k,
       COUNT(*) AS n
FROM events GROUP BY event_type ORDER BY event_type
"""


# ----------------------------------------------------------------------
# D1/set-ops — unionByName + dedup (reference evidence_fetcher.py:449-458)
# ----------------------------------------------------------------------

def q_union_nationkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).distinct().orderBy("nationkey")


_SQL_UNION = """
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey AS nationkey FROM supplier
ORDER BY nationkey
"""


# ----------------------------------------------------------------------
# Similarity — brute-force cosine top-k over embeddings (training-data op)
# BLAS-vectorized mapInPandas with broadcast corpus (see
# podcast_plow_spark/operators/similarity.py for the 100 TB LSH path).
# ----------------------------------------------------------------------

def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from podcast_plow_spark.operators.similarity import cosine_topk_pairs

    emb = _t(spark, sf_dir, "embeddings")
    return cosine_topk_pairs(spark, emb, "vec_id", "embedding", k=50)


_SQL_COSINE = """
SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 4) AS cos_sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
ORDER BY cos_sim DESC, a_id ASC, b_id ASC
LIMIT 50
"""


# ----------------------------------------------------------------------
# Text analysis — token counts + uniqueness ratio (training-data op)
# ----------------------------------------------------------------------

def q_doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("token_count"),
        F.round(F.size(F.array_distinct(toks)).cast("double") / F.size(toks), 4).alias("uniq_ratio"),
    )


_SQL_DOC_QUALITY = r"""
SELECT doc_id,
       CAST(length(string_split_regex(trim(text), '\s+')) AS BIGINT) AS token_count,
       ROUND(CAST(length(list_distinct(string_split_regex(trim(text), '\s+'))) AS DOUBLE)
             / length(string_split_regex(trim(text), '\s+')), 4) AS uniq_ratio
FROM documents
"""


# ----------------------------------------------------------------------
# Dedup family (training-data ops; podcast_plow_spark/operators/dedup.py)
# ----------------------------------------------------------------------

_SQL_SHINGLES_CTE = r"""
WITH sh AS (
  SELECT DISTINCT doc_id, array_to_string(toks[s:s+2], ' ') AS shingle
  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
       LATERAL (SELECT unnest(generate_series(1, greatest(0, len(toks)-2))) AS s)
)
"""


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from podcast_plow_spark.operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_t(spark, sf_dir, "documents"), k_shingle=3, jaccard_threshold=0.5)


_SQL_NGRAM_JACCARD = _SQL_SHINGLES_CTE + """
, sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
common AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, CAST(COUNT(*) AS BIGINT) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT a_id, b_id, ROUND(n_common * 1.0 / (na.n_sh + nb.n_sh - n_common), 4) AS jaccard
FROM common JOIN sizes na ON na.doc_id = a_id JOIN sizes nb ON nb.doc_id = b_id
WHERE n_common * 1.0 / (na.n_sh + nb.n_sh - n_common) >= 0.5
"""


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from podcast_plow_spark.operators.dedup import simhash64

    return simhash64(_t(spark, sf_dir, "documents"))


def _simhash_oracle_sql() -> str:
    votes = ",\n".join(
        f"SUM(CASE WHEN (h >> {bit}) & 1 = 1 THEN 1 ELSE -1 END) AS v{bit}" for bit in range(60)
    )
    fp = " + ".join(f"(CASE WHEN v{bit} > 0 THEN CAST({2**bit} AS BIGINT) ELSE 0 END)" for bit in range(60))
    return rf"""
WITH toks AS (
  SELECT doc_id, unnest(list_distinct(string_split_regex(trim(text), '\s+'))) AS tok
  FROM documents
), hashed AS (
  SELECT doc_id, CAST('0x' || substr(sha256(tok), 1, 15) AS BIGINT) AS h
  FROM toks WHERE tok <> ''
), agg AS (
  SELECT doc_id, {votes} FROM hashed GROUP BY doc_id
)
SELECT doc_id, {fp} AS simhash FROM agg
"""


def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    from podcast_plow_spark.operators.dedup import minhash_signatures, word_shingles

    sh = word_shingles(_t(spark, sf_dir, "documents"), k=3)
    return minhash_signatures(sh, num_hashes=16, seed=42)


def _minhash_oracle_sql() -> str:
    from podcast_plow_spark.operators.dedup import MINHASH_P, _affine_params

    cols = ",\n".join(
        f"MIN((h * {a} + {b}) % {MINHASH_P}) AS mh{i}" for i, (a, b) in enumerate(_affine_params(16, 42))
    )
    return (
        _SQL_SHINGLES_CTE
        + f"""
, hashed AS (
  SELECT doc_id, CAST('0x' || substr(sha256(shingle), 1, 15) AS BIGINT) % {MINHASH_P} AS h FROM sh
)
SELECT doc_id, {cols} FROM hashed GROUP BY doc_id
"""
    )


def q_minhash_lsh_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs, exact-verified. Non-SQL-expressible
    banding → rows-only driver check; recall vs the exact n-gram
    Jaccard operator is asserted in tests/test_dedup.py."""
    from podcast_plow_spark.operators.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"), k_shingle=3, num_hashes=16, n_bands=4, jaccard_threshold=0.5
    )


def q_lsh_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN (scale path) — probabilistic recall, rows-only
    check; recall floor asserted in tests/test_similarity.py."""
    from podcast_plow_spark.operators.similarity import lsh_cosine_topk_pairs

    return lsh_cosine_topk_pairs(spark, _t(spark, sf_dir, "embeddings"), k=50)


# ----------------------------------------------------------------------
# driver API
# ----------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_pricing_summary(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "pricing_summary": q_pricing_summary,
        "dequeue_order": q_dequeue_order,
        "latest_event_per_user": q_latest_event_per_user,
        "top2_orders_per_customer": q_top2_orders_per_customer,
        "customers_without_orders": q_customers_without_orders,
        "customer_order_counts": q_customer_order_counts,
        "orders_with_nation": q_orders_with_nation,
        "search_parts": q_search_parts,
        "retry_backoff": q_retry_backoff,
        "fingerprints": q_fingerprints,
        "normalise_dedup": q_normalise_dedup,
        "word_freq": q_word_freq,
        "risk_levels": q_risk_levels,
        "grade_claims": q_grade_claims,
        "json_payload": q_json_payload,
        "union_nationkeys": q_union_nationkeys,
        "cosine_topk": q_cosine_topk,
        "doc_quality": q_doc_quality,
        "ngram_jaccard_dedup": q_ngram_jaccard,
        "simhash_fingerprints": q_simhash,
        "minhash_signatures": q_minhash_signatures,
        "minhash_lsh_dedup": q_minhash_lsh_dedup,
        "lsh_cosine_topk": q_lsh_cosine_topk,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "pricing_summary": _SQL_PRICING,
        "dequeue_order": _SQL_DEQUEUE,
        "latest_event_per_user": _SQL_LATEST_EVENT,
        "top2_orders_per_customer": _SQL_TOP2,
        "customers_without_orders": _SQL_NO_ORDERS,
        "customer_order_counts": _SQL_ORDER_COUNTS,
        "orders_with_nation": _SQL_ORDERS_NATION,
        "search_parts": _SQL_SEARCH_PARTS,
        "retry_backoff": _SQL_BACKOFF,
        "fingerprints": _SQL_FINGERPRINTS,
        "normalise_dedup": _SQL_NORM_DEDUP,
        "word_freq": _SQL_WORD_FREQ,
        "risk_levels": _SQL_RISK,
        "grade_claims": _SQL_GRADE,
        "json_payload": _SQL_JSON,
        "union_nationkeys": _SQL_UNION,
        "cosine_topk": _SQL_COSINE,
        "doc_quality": _SQL_DOC_QUALITY,
        "ngram_jaccard_dedup": _SQL_NGRAM_JACCARD,
        "simhash_fingerprints": _simhash_oracle_sql(),
        "minhash_signatures": _minhash_oracle_sql(),
        # minhash_lsh_dedup / lsh_cosine_topk: banding + hyperplane LSH
        # are not SQL-expressible → rows-only driver check; recall
        # floors asserted in tests/test_dedup.py / tests/test_similarity.py
    }
