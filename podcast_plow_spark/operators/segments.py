"""W4 — sentence → ~30 s segment builder + claim extraction pipeline.

Reference parity (re-derived from ``worker/claim_extraction.py``):
- build_segments (:201-265): accumulate sentences until duration ≥
  30 s target (close early at ≥ 20 s with ≥ 3 sentences); any segment
  > 40 s is post-split on ". " with word-estimated durations (≥ 20 s
  floor per piece, clamped to the segment end).
- extract_claims (:336-371): segment sentences → claim predicate (F8)
  → normalise key (X6) → first-sentence-wins dedup (D4) → paraphrase
  (X7) → topic/domain (X19) → risk (X18), ordered by
  (start_ms, normalized_text) (K7).

Each transcript is independent → ``applyInPandas`` per transcript id
(grouped vectorization; no cross-group state).
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame

from podcast_plow_spark.functions.summarize import MS_PER_WORD, Sentence, iter_sentences
from podcast_plow_spark.functions.text import (
    ANECDOTE_MARKERS,
    CLAIM_VERBS,
    TOPIC_KEYWORDS,
    paraphrase,
)

__all__ = ["Segment", "build_segments", "extract_claims", "extract_claims_df"]

SEGMENT_MIN_MS = 20_000
SEGMENT_MAX_MS = 40_000
SEGMENT_TARGET_MS = 30_000


@dataclass(frozen=True)
class Segment:
    text: str
    start_ms: int
    end_ms: int


def build_segments(sentences: list[Sentence]) -> list[Segment]:
    """W4 (reference worker/claim_extraction.py:201-265)."""
    segments: list[Segment] = []
    if not sentences:
        return segments
    current: list[Sentence] = []
    seg_start = sentences[0].start_ms
    for s in sentences:
        if not current:
            seg_start = s.start_ms
        current.append(s)
        seg_end = current[-1].end_ms
        duration = seg_end - seg_start
        if duration >= SEGMENT_TARGET_MS or (duration >= SEGMENT_MIN_MS and len(current) >= 3):
            segments.append(Segment(" ".join(x.text.strip() for x in current), seg_start, seg_end))
            current = []
    if current:
        segments.append(
            Segment(" ".join(x.text.strip() for x in current), current[0].start_ms, current[-1].end_ms)
        )

    out: list[Segment] = []
    for seg in segments:
        if seg.end_ms - seg.start_ms <= SEGMENT_MAX_MS or " " not in seg.text:
            out.append(seg)
            continue
        running = seg.start_ms
        for piece in seg.text.split(". "):
            piece = piece.strip()
            if not piece:
                continue
            dur = max(SEGMENT_MIN_MS, len(piece.split()) * MS_PER_WORD)
            end = min(running + dur, seg.end_ms)
            out.append(Segment(piece + ("" if piece.endswith(".") else "."), running, end))
            running = end
    return out


def _normalise(text: str) -> str:
    import re

    t = re.sub(r"[^a-z0-9\s]", "", text.lower())
    return re.sub(r"\s+", " ", t).strip()


def _looks_like_claim(text: str) -> bool:
    lowered = text.lower()
    if any(m in lowered for m in ANECDOTE_MARKERS):
        return False
    return any(v in lowered for v in CLAIM_VERBS)


def _risk(norm: str) -> str:
    import re

    if re.search(r"\b(?:cures?|eliminates|guarantees)\b", norm):
        return "high"
    if re.search(r"\b(?:may|might|could|suggests?)\b", norm):
        return "low"
    if re.search(r"\b(?:reduces?|lowers?|decreases?|improves?|enhances?|raises?|increases?)\b", norm):
        return "medium"
    return "medium"


def _topic_domain(norm: str) -> tuple[str, str]:
    for kw, topic, domain in TOPIC_KEYWORDS:
        if kw in norm:
            return topic, domain
    return "general_health", "wellness"


def extract_claims(text: str) -> list[dict]:
    """Full claim pipeline (reference worker/claim_extraction.py:336-371)."""
    sentences = iter_sentences(text)
    seen: set[str] = set()
    claims: list[dict] = []
    for s in sentences:
        if not _looks_like_claim(s.text):
            continue
        norm = _normalise(s.text)
        if not norm or norm in seen:
            continue
        seen.add(norm)
        topic, domain = _topic_domain(norm)
        claims.append(
            {
                "raw_text": s.text,
                "normalized_text": paraphrase(s.text),
                "norm_key": norm,
                "topic": topic,
                "domain": domain,
                "risk_level": _risk(norm),
                "start_ms": s.start_ms,
                "end_ms": s.end_ms,
            }
        )
    claims.sort(key=lambda c: (c["start_ms"], c["norm_key"]))
    return claims


def extract_claims_df(transcripts: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Vectorized claim extraction over transcripts."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                for c in extract_claims(text or ""):
                    rows.append({"doc_id": did, **c})
            yield pd.DataFrame(rows) if rows else pd.DataFrame(
                columns=["doc_id", "raw_text", "normalized_text", "norm_key", "topic",
                         "domain", "risk_level", "start_ms", "end_ms"]
            )

    return transcripts.select(id_col, text_col).mapInPandas(
        run,
        schema=(
            "doc_id long, raw_text string, normalized_text string, norm_key string, "
            "topic string, domain string, risk_level string, start_ms long, end_ms long"
        ),
    )
