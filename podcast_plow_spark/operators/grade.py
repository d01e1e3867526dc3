"""A3 — claim grade aggregation, Spark-native.

Reference semantics (``server/services/grader.py:18-195``): each
evidence row is bucketed by keyword (meta / rct / weak / observational,
default observational, empty → weak); rows with stance outside
{supports, refutes} are ignored; per-claim counts feed a fixed decision
tree:

    total_support == 0            → unsupported
    total_refute  >  total_support→ unsupported
    meta ≥ 1 or rct ≥ 2           → strong
    rct ≥ 1 or observational ≥ 2  → moderate
    observational ≥ 1 or weak ≥ 1 → weak
    else                          → unsupported

Spark expression: the UDAF is a plain ``groupBy(claim_id).agg`` of
eight conditional counts followed by a ``when`` chain — fully
JVM-side, whole-stage-codegen'd, map-side-combinable. No pivot (the
stance×bucket matrix is tiny and fixed, so conditional sums beat a
pivot's extra shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["classify_type_col", "grade_claims", "META_KEYWORDS", "RCT_KEYWORDS",
           "OBSERVATIONAL_KEYWORDS", "WEAK_KEYWORDS"]

META_KEYWORDS = ("meta-analysis", "meta analysis", "systematic review")
RCT_KEYWORDS = (
    "randomized", "randomised", "randomized controlled trial",
    "randomised controlled trial", "randomized clinical trial",
    "randomised clinical trial", "double-blind", "double blind", "rct",
)
OBSERVATIONAL_KEYWORDS = (
    "cohort", "case-control", "case control", "observational",
    "prospective", "retrospective", "cross-sectional", "cross sectional",
    "longitudinal", "registry", "population", "survey", "pilot",
    "feasibility", "open-label", "open label", "clinical study",
    "clinical trial",
)
WEAK_KEYWORDS = (
    "animal", "mouse", "rat", "mice", "in vivo", "in vitro", "ex vivo",
    "mechanistic", "cell", "cells", "case report", "case series",
    "expert opinion", "preclinical",
)


def _any_contains(text: Column, keywords: tuple[str, ...]) -> Column:
    cond = F.lit(False)
    for kw in keywords:
        cond = cond | text.contains(kw)
    return cond


def classify_type_col(evidence_type: Column) -> Column:
    """Bucket an evidence-type string (reference grader.py:92-108)."""
    t = F.lower(F.trim(F.coalesce(evidence_type, F.lit(""))))
    return (
        F.when(t == "", F.lit("weak"))
        .when(_any_contains(t, META_KEYWORDS), F.lit("meta"))
        .when(_any_contains(t, RCT_KEYWORDS), F.lit("rct"))
        .when(_any_contains(t, WEAK_KEYWORDS), F.lit("weak"))
        .when(_any_contains(t, OBSERVATIONAL_KEYWORDS), F.lit("observational"))
        .otherwise(F.lit("observational"))
    )


def grade_claims(
    evidence: DataFrame,
    claim_col: str = "claim_id",
    stance_col: str = "stance",
    type_col: str = "type",
) -> DataFrame:
    """Per-claim grade (reference grader.py:137-195). Returns
    (claim_id, support/refute counts per bucket, grade)."""
    stance = F.lower(F.trim(F.coalesce(F.col(stance_col), F.lit(""))))
    bucket = classify_type_col(F.col(type_col))
    sup = stance == "supports"
    ref = stance == "refutes"

    def cnt(cond: Column) -> Column:
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long")

    agg = evidence.groupBy(F.col(claim_col).alias("claim_id")).agg(
        cnt(sup & (bucket == "meta")).alias("s_meta"),
        cnt(sup & (bucket == "rct")).alias("s_rct"),
        cnt(sup & (bucket == "observational")).alias("s_obs"),
        cnt(sup & (bucket == "weak")).alias("s_weak"),
        cnt(ref & (bucket == "meta")).alias("r_meta"),
        cnt(ref & (bucket == "rct")).alias("r_rct"),
        cnt(ref & (bucket == "observational")).alias("r_obs"),
        cnt(ref & (bucket == "weak")).alias("r_weak"),
    )
    total_s = F.col("s_meta") + F.col("s_rct") + F.col("s_obs") + F.col("s_weak")
    total_r = F.col("r_meta") + F.col("r_rct") + F.col("r_obs") + F.col("r_weak")
    grade = (
        F.when(total_s == 0, F.lit("unsupported"))
        .when(total_r > total_s, F.lit("unsupported"))
        .when((F.col("s_meta") >= 1) | (F.col("s_rct") >= 2), F.lit("strong"))
        .when(F.col("s_rct") >= 1, F.lit("moderate"))
        .when(F.col("s_obs") >= 2, F.lit("moderate"))
        .when((F.col("s_obs") >= 1) | (F.col("s_weak") >= 1), F.lit("weak"))
        .otherwise(F.lit("unsupported"))
    )
    return agg.withColumn("total_support", total_s).withColumn("total_refute", total_r).withColumn(
        "grade", grade
    )
