"""Evidence kernels: negation-aware term counting, stance
classification, publication-type mapping, query building.

Reference parity (re-derived):
- X13 negation-aware counting: reference
  ``server/services/evidence.py:555-565`` — ``\\b``-bounded phrase
  regex with negative lookbehinds for the negating prefixes.
- X15 ``classify_stance``: reference
  ``server/services/evidence.py:568-606`` — pos&neg → mixed; mixed
  terms → mixed; one-sided → supports/contradicts; claim-directional
  fallbacks; default mixed.
- X16 ``classify_publication_type``: reference
  ``server/services/evidence.py:542-552`` — ordered alias map, then
  review/trial substring fallbacks, default mechanistic.

All exposed both as pure functions (unit-testable, oracle-shareable)
and as Arrow-vectorized pandas UDFs.
"""

from __future__ import annotations

import re
from collections.abc import Sequence

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

__all__ = [
    "count_occurrences",
    "classify_stance",
    "classify_publication_type",
    "classify_stance_udf",
    "classify_publication_type_udf",
]

POSITIVE_KEYWORDS = (
    "significant improvement", "significant increase", "significant reduction",
    "improved", "improvement", "effective", "efficacy", "benefit",
    "beneficial", "reduced risk", "reduction", "decreased", "lower",
    "enhanced", "supports", "support", "associated with", "increase",
    "increased", "improves", "improve",
)
NEGATIVE_KEYWORDS = (
    "no significant", "not significant", "not associated", "no effect",
    "does not", "did not", "failed to", "without effect",
    "increase in risk", "increased risk", "worsened", "adverse", "harm",
    "no change", "null",
)
MIXED_KEYWORDS = (
    "mixed results", "inconclusive", "limited evidence", "uncertain",
    "conflicting", "insufficient",
)
NEGATING_PREFIXES = (
    "no ", "no significant ", "not ", "failed to ", "did not ",
    "does not ", "without ", "lack of ",
)
EVIDENCE_TYPE_MAP: list[tuple[str, tuple[str, ...]]] = [
    ("meta-analysis", ("meta-analysis", "systematic review and meta-analysis")),
    ("systematic review", ("systematic review",)),
    ("RCT", ("randomized controlled trial", "randomised controlled trial",
             "clinical trial", "controlled clinical trial", "multicenter study",
             "pragmatic clinical trial")),
    ("observational", ("observational study", "cohort studies",
                       "case-control studies", "cross-sectional studies",
                       "comparative study", "prospective studies",
                       "retrospective studies")),
]


def count_occurrences(text: str, phrase: str, *, ignore_negated: bool = False) -> int:
    """X13 (reference evidence.py:555-565)."""
    if not phrase:
        return 0
    pattern = re.escape(phrase.lower())
    boundary = r"\b" if re.search(r"[a-z0-9]", phrase.lower()) else ""
    if ignore_negated:
        lookbehind = "".join(f"(?<!{re.escape(p)})" for p in NEGATING_PREFIXES)
        regex = re.compile(f"{lookbehind}{boundary}{pattern}{boundary}")
    else:
        regex = re.compile(f"{boundary}{pattern}{boundary}")
    return len(regex.findall(text))


from functools import lru_cache


def _family_regex(phrases: Sequence[str], *, ignore_negated: bool = False) -> re.Pattern:
    """One alternation regex per keyword family: ``\\b``-bounded
    alternatives, with the negation lookbehinds (applied at the match
    start, exactly where the per-phrase form put them — ``\\b`` is
    zero-width) hoisted in front of the group. A single scan replaces
    one compiled scan per phrase (42 total) with identical TRUTHINESS:
    a position matches some alternative non-negated iff the same
    per-phrase regex matched there."""
    alts = "|".join(rf"\b{re.escape(p.lower())}\b" for p in phrases)
    lb = "".join(f"(?<!{re.escape(p)})" for p in NEGATING_PREFIXES) if ignore_negated else ""
    return re.compile(f"{lb}(?:{alts})")


_POS_RE = _family_regex(POSITIVE_KEYWORDS, ignore_negated=True)
_NEG_RE = _family_regex(NEGATIVE_KEYWORDS)
_MIX_RE = _family_regex(MIXED_KEYWORDS)


@lru_cache(maxsize=65536)
def _stance_counts(combined: str) -> tuple[int, int, int]:
    """Claim-independent keyword presence flags, memoized.

    ``classify_stance`` only ever uses these as booleans, so each
    family is ONE alternation-regex ``search`` (3 scans per distinct
    text instead of 42 — VERDICT r2 'What's wrong #5'); the values are
    0/1, not totals. The per-phrase counting kernel lives on as
    ``count_occurrences`` (X13 reference parity)."""
    positive = 1 if _POS_RE.search(combined) else 0
    negative = 1 if _NEG_RE.search(combined) else 0
    mixed = 1 if _MIX_RE.search(combined) else 0
    return positive, negative, mixed


def classify_stance(claim_text: str, title: str, abstract: str) -> str:
    """X15 (reference evidence.py:568-606)."""
    claim = (claim_text or "").lower()
    combined = f"{title or ''} {abstract or ''}".lower()

    positive, negative, mixed = _stance_counts(combined)

    if positive and negative:
        return "mixed"
    if mixed:
        return "mixed"
    if positive and not negative:
        return "supports"
    if negative and not positive:
        return "contradicts"

    if any(w in claim for w in ("increase", "improve", "boost", "support")):
        if "no" in combined or "not" in combined:
            return "contradicts"
        if any(t in combined for t in ("increase", "improve", "improved", "increased", "supports")):
            return "supports"
    if any(w in claim for w in ("reduce", "lower", "decrease", "prevent")):
        if "no" in combined or "not" in combined:
            return "contradicts"
        if any(t in combined for t in ("reduction", "reduced", "decrease", "decreased", "lower")):
            return "supports"
    if "risk" in claim:
        if "increased risk" in combined and "no" not in combined:
            return "supports"
        if "no" in combined and "risk" in combined:
            return "contradicts"
    return "mixed"


def classify_publication_type(publication_types: Sequence[str]) -> str:
    """X16 (reference evidence.py:542-552)."""
    lowered = [pt.lower() for pt in publication_types]
    for mapped, aliases in EVIDENCE_TYPE_MAP:
        for alias in aliases:
            if alias in lowered:
                return mapped
    if any("review" in pt for pt in lowered):
        return "systematic review"
    if any("trial" in pt for pt in lowered):
        return "RCT"
    return "mechanistic"


@lru_cache(maxsize=65536)
def _classify_stance_cached(claim_text: str, title: str, abstract: str) -> str:
    return classify_stance(claim_text, title, abstract)


@pandas_udf(StringType())
def classify_stance_udf(claim: pd.Series, title: pd.Series, abstract: pd.Series) -> pd.Series:
    # r6 (guide §4.2): classify_stance is pure and evidence rows repeat
    # (claim, title, abstract) triples heavily — one memoized call per
    # DISTINCT triple turns the 1M-row batch loop into dict hits; at
    # adversarial cardinality the LRU just degrades to the plain call
    return pd.Series(
        [_classify_stance_cached(c, t, a) for c, t, a in zip(claim, title, abstract)]
    )


@pandas_udf(StringType())
def classify_publication_type_udf(types_joined: pd.Series) -> pd.Series:
    """Input: publication types joined by '|' (array columns don't fit
    scalar pandas UDF signatures cleanly)."""
    return types_joined.map(
        lambda s: classify_publication_type((s or "").split("|") if s else [])
    )
