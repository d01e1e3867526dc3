"""X21 — the query-builder trio + K3 evidence ranking vocabulary.

Reference parity (re-derived; vocabulary tables are data mirrored for
behavioural parity):
- ``build_query_terms``: reference
  ``server/services/evidence_fetcher.py:365-405`` — phrase synonyms
  first, then token synonyms (stopword-filtered, singularized),
  directional verbs deferred to the tail, cap 12, order-preserving
  dedup (D1).
- ``mesh_query_from_terms`` / ``simple_query_from_terms``: reference
  ``:408-432`` — ≤6 AND-ed MeSH/Title-Abstract disjunctions; ≤8
  space-joined terms, multiword terms quoted.
- ``build_query_variants``: reference ``:435-458`` — mesh, simple,
  exact-phrase normalized + raw, order-preserving dedup.
- ``TYPE_RANK`` (K3): reference ``:224-242``.
- ``STOPWORDS`` (F9): reference ``:25-149``.

Vectorization: ``build_query_variants`` ships as a pandas UDF
returning an array column (queries per claim), explode downstream.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

from podcast_plow_spark.functions.evidence import classify_publication_type  # noqa: F401

__all__ = [
    "STOPWORDS",
    "TYPE_RANK",
    "DEFAULT_TYPE_RANK",
    "singularize",
    "build_query_terms",
    "mesh_query_from_terms",
    "simple_query_from_terms",
    "build_query_variants",
    "build_query_variants_udf",
]

STOPWORDS = frozenset(
    "a about after against an and any are as at be because been before being between both but by can "
    "could did do does doing during each either few for from had has have having he her here hers "
    "herself him himself his how i if in into is it its itself just may me might more most my myself "
    "no nor not of off on once only or other our ours ourselves out over own same she should so some "
    "such than that the their theirs them themselves then there these they this those through to too "
    "under until up very was we were what when where which while who whom why will with within without "
    "would you your yours yourself yourselves".split()
)

DIRECTIONAL_KEYWORDS = frozenset(
    "boost cause decrease enhance improve increase lower prevent promote protect reduce support".split()
)

PHRASE_SYNONYMS: dict[str, tuple[str, ...]] = {
    "blood pressure": ("blood pressure",),
    "body weight": ("body weight",),
    "heart rate": ("heart rate",),
    "cognitive function": ("cognition", "cognitive function"),
    "gut microbiome": ("gastrointestinal microbiome", "microbiota"),
    "immune system": ("immune system",),
    "insulin sensitivity": ("insulin sensitivity", "insulin resistance"),
    "metabolic health": ("metabolic diseases", "metabolic health"),
    "weight loss": ("weight loss", "body weight"),
}

MESH_SYNONYMS: dict[str, tuple[str, ...]] = {
    "aging": ("aging", "longevity"), "alzheimer": ("alzheimer disease",),
    "alzheimers": ("alzheimer disease",), "anxiety": ("anxiety", "anxiety disorders"),
    "autophagy": ("autophagy",), "blood": ("blood", "blood pressure"),
    "brain": ("brain", "brain diseases"), "cancer": ("neoplasms",),
    "cardio": ("cardiovascular diseases",), "cardiovascular": ("cardiovascular diseases",),
    "cholesterol": ("cholesterol", "hypercholesterolemia"),
    "cognition": ("cognition", "cognition disorders"),
    "cognitive": ("cognition", "cognitive function"), "creatine": ("creatine",),
    "depression": ("depressive disorder", "depression"), "diabetes": ("diabetes mellitus",),
    "diet": ("diet", "diet therapy"), "exercise": ("exercise", "physical exercise"),
    "fasting": ("fasting", "intermittent fasting"), "glucose": ("blood glucose",),
    "gut": ("gastrointestinal microbiome", "microbiota"),
    "heart": ("heart diseases", "cardiovascular diseases"),
    "immune": ("immune system", "immune response"), "immunity": ("immune system", "immune response"),
    "inflammation": ("inflammation", "anti-inflammatory agents"), "ketone": ("ketone bodies",),
    "ketones": ("ketone bodies",), "ketogenic": ("ketogenic diet",),
    "longevity": ("longevity", "aging"), "magnesium": ("magnesium",),
    "memory": ("memory", "cognition"), "microbiome": ("microbiota", "gastrointestinal microbiome"),
    "neurodegenerative": ("neurodegenerative diseases",), "obesity": ("obesity", "body mass index"),
    "performance": ("physical endurance", "exercise"), "protein": ("dietary proteins", "protein supplements"),
    "risk": ("risk", "risk factors"), "sleep": ("sleep", "sleep disorders"),
    "supplement": ("dietary supplements",), "supplements": ("dietary supplements",),
    "tumor": ("neoplasms",), "vitamin": ("vitamins",), "weight": ("body weight", "weight loss"),
}

TYPE_RANK = {
    "systematic review": 0, "meta-analysis": 0, "systematic review and meta-analysis": 0,
    "randomized controlled trial": 1, "controlled clinical trial": 1,
    "clinical trial": 2, "multicenter study": 2, "pragmatic clinical trial": 2,
    "observational study": 3, "cohort studies": 3, "case-control studies": 3,
    "cross-sectional studies": 3, "comparative study": 3, "prospective studies": 3,
    "retrospective studies": 3, "review": 4,
}
DEFAULT_TYPE_RANK = 6


def singularize(token: str) -> str:
    """X5 (reference evidence_fetcher.py:355-362)."""
    if len(token) > 3 and token.endswith("ies"):
        return token[:-3] + "y"
    if len(token) > 3 and token.endswith("ses"):
        return token[:-1]
    if len(token) > 3 and token.endswith("s") and not token.endswith("ss"):
        return token[:-1]
    return token


def build_query_terms(text: str) -> list[str]:
    if not text:
        return []
    lowered = text.lower().replace("-", " ")
    terms: list[str] = []
    seen: set[str] = set()
    directional: list[str] = []

    for phrase, synonyms in PHRASE_SYNONYMS.items():
        if phrase in lowered:
            for syn in synonyms:
                if syn not in seen:
                    terms.append(syn)
                    seen.add(syn)

    for token in re.findall(r"[a-z0-9']+", lowered):
        if token in STOPWORDS or not token:
            continue
        base = singularize(token)
        options: list[str] = []
        if base in MESH_SYNONYMS:
            options.extend(MESH_SYNONYMS[base])
        if token in MESH_SYNONYMS and token != base:
            options.extend(MESH_SYNONYMS[token])
        if base in DIRECTIONAL_KEYWORDS:
            directional.append(base)
        else:
            options.append(base)
        for opt in options:
            opt = opt.strip()
            if not opt or opt in seen:
                continue
            terms.append(opt)
            seen.add(opt)
    for opt in directional:
        if opt not in seen:
            terms.append(opt)
            seen.add(opt)
    return terms[:12]


def mesh_query_from_terms(terms: list[str], max_terms: int = 6) -> str:
    parts = []
    for term in terms[:max_terms]:
        clean = term.replace('"', "")
        if not clean:
            continue
        if " " in clean:
            parts.append(f'("{clean}"[MeSH Terms] OR "{clean}"[Title/Abstract])')
        else:
            parts.append(f"({clean}[MeSH Terms] OR {clean}[Title/Abstract])")
    return " AND ".join(parts)


def simple_query_from_terms(terms: list[str], max_terms: int = 8) -> str:
    selected: list[str] = []
    for term in terms:
        if len(selected) >= max_terms:
            break
        clean = term.replace('"', "").strip()
        if not clean:
            continue
        selected.append(f'"{clean}"' if " " in clean else clean)
    return " ".join(selected)


def build_query_variants(normalized_text: str | None, raw_text: str | None) -> list[str]:
    base = normalized_text or raw_text or ""
    terms = build_query_terms(base)
    queries: list[str] = []
    mesh = mesh_query_from_terms(terms)
    if mesh:
        queries.append(mesh)
    simple = simple_query_from_terms(terms)
    if simple:
        queries.append(simple)
    if normalized_text:
        queries.append(f'"{normalized_text.strip()}"')
    if raw_text and raw_text.strip() and raw_text.strip() != normalized_text:
        queries.append(f'"{raw_text.strip()}"')
    seen: set[str] = set()
    unique = []
    for q in queries:
        q = q.strip()
        if q and q not in seen:
            unique.append(q)
            seen.add(q)
    return unique


@pandas_udf(ArrayType(StringType()))
def build_query_variants_udf(normalized: pd.Series, raw: pd.Series) -> pd.Series:
    return pd.Series([build_query_variants(n, r) for n, r in zip(normalized, raw)])
