"""Summarization kernels: sentence splitting with timing, frequency
ranking, budgeted selection, Luhn scoring, TL;DR formatting.

Reference parity (re-derived):
- X20 sentence/timestamp estimation: reference
  ``worker/claim_extraction.py:154-198`` — ``\\b[\\w']+\\b`` tokens,
  ``[^.!?]+[.!?]`` sentences, 120 wpm ⇒ 500 ms/word, ``end_ms ≥
  start_ms + 500``.
- A5/K5 extractive summary: reference
  ``server/ingest/summaries.py:25-74`` — per-document Counter of
  words len>3; sentence score = mean freq × freshness ``1/(1+idx/10)``;
  greedy take of ≥6-word sentences until word budget / count cap;
  restore document order.
- X22 Luhn scoring: the reference delegates to sumy's LuhnSummarizer
  (``server/services/summarize.py:44-64``); sumy is absent here, so
  this is the classic Luhn algorithm (significant words = above-mean
  frequency among len>3 words; window score = significant²/span)
  with OUR determinism frozen by tests — flagged as a stand-in.
- X23 TL;DR formatting: reference ``server/services/summarize.py:91-115``.

The per-document pipeline ships as a grouped pandas UDF
(``summarize_documents``): each document is independent, so this is
embarrassingly parallel over Arrow batches.
"""

from __future__ import annotations

import math
import re
from collections import Counter
from collections.abc import Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame

__all__ = [
    "Sentence",
    "iter_sentences",
    "rank_sentences",
    "select_sentences",
    "luhn_scores",
    "format_tldr",
    "summarize_documents",
]

WORD_RE = re.compile(r"\b[\w']+\b")
SENTENCE_RE = re.compile(r"[^.!?]+[.!?]")
MS_PER_WORD = 500  # 120 wpm (reference worker/claim_extraction.py:39-40)


@dataclass(frozen=True)
class Sentence:
    text: str
    start_word: int
    end_word: int
    start_ms: int
    end_ms: int


def iter_sentences(text: str) -> list[Sentence]:
    """X20 (reference worker/claim_extraction.py:154-198)."""
    tokens = list(WORD_RE.finditer(text))
    out: list[Sentence] = []
    if not tokens:
        return out
    ti = 0
    for match in SENTENCE_RE.finditer(text):
        stext = match.group().strip()
        start_char, end_char = match.span()
        while ti < len(tokens) and tokens[ti].end() <= start_char:
            ti += 1
        start_word = ti
        while ti < len(tokens) and tokens[ti].start() < end_char:
            ti += 1
        end_word = ti
        if start_word == end_word:
            continue
        start_ms = start_word * MS_PER_WORD
        end_ms = max(start_ms + MS_PER_WORD, end_word * MS_PER_WORD)
        out.append(Sentence(stext, start_word, end_word, start_ms, end_ms))
    return out


def rank_sentences(sentences: list[str]) -> list[tuple[float, int, str]]:
    """A5 (reference server/ingest/summaries.py:32-45)."""
    freq: Counter[str] = Counter()
    for s in sentences:
        freq.update(w for w in WORD_RE.findall(s.lower()) if len(w) > 3)
    ranked: list[tuple[float, int, str]] = []
    for idx, s in enumerate(sentences):
        words = [w for w in WORD_RE.findall(s.lower()) if len(w) > 3]
        if not words:
            continue
        score = sum(freq[w] for w in words) / len(words)
        ranked.append((score * (1 / (1 + idx / 10)), idx, s))
    ranked.sort(reverse=True)
    return ranked


def select_sentences(sentences: list[str], *, max_words: int, max_sentences: int) -> list[str]:
    """K5 greedy budget selection (reference summaries.py:48-74)."""
    ranked = rank_sentences(sentences)
    selected: list[tuple[int, str]] = []
    used: set[int] = set()
    total = 0
    for _score, idx, s in ranked:
        if idx in used:
            continue
        n = len(s.split())
        if n < 6:
            continue
        selected.append((idx, s))
        used.add(idx)
        total += n
        if total >= max_words or len(selected) >= max_sentences:
            break
    if not selected:
        for idx, s in enumerate(sentences):
            n = len(s.split())
            if n < 6:
                continue
            selected.append((idx, s))
            total += n
            if total >= max_words or len(selected) >= max_sentences:
                break
    selected.sort()
    return [s for _, s in selected]


def luhn_scores(sentences: list[str]) -> list[float]:
    """X22 stand-in for sumy's LuhnSummarizer (see module docstring)."""
    freq: Counter[str] = Counter()
    for s in sentences:
        freq.update(w for w in WORD_RE.findall(s.lower()) if len(w) > 3)
    if not freq:
        return [0.0] * len(sentences)
    mean_freq = sum(freq.values()) / len(freq)
    significant = {w for w, c in freq.items() if c >= mean_freq}
    scores = []
    for s in sentences:
        words = WORD_RE.findall(s.lower())
        sig_pos = [i for i, w in enumerate(words) if w in significant and len(w) > 3]
        if not sig_pos:
            scores.append(0.0)
            continue
        span = sig_pos[-1] - sig_pos[0] + 1
        scores.append(len(sig_pos) ** 2 / span)
    return scores


def luhn_point_count(token_count: int) -> int:
    """Desired points per chunk: clamp(ceil(tokens/400), 3, 7)
    (reference server/services/summarize.py:52-55)."""
    return max(3, min(math.ceil(token_count / 400), 7))


def format_tldr(points: list[str], *, narrative: bool = False) -> str:
    """X23 (reference server/services/summarize.py:91-115)."""
    if not points:
        return ""
    if not narrative:
        return "\n".join(f"- {p}" for p in points)
    terminated = [p if p.endswith((".", "!", "?")) else p + "." for p in points]
    if len(terminated) > 4:
        half = math.ceil(len(terminated) / 2)
        return " ".join(terminated[:half]) + "\n\n" + " ".join(terminated[half:])
    return " ".join(terminated)


def summarize_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_words: int = 80,
    max_sentences: int = 3,
) -> DataFrame:
    """Per-document extractive summary — vectorized mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                sents = [s.text for s in iter_sentences(text or "")] or [(text or "").strip()]
                chosen = select_sentences(sents, max_words=max_words, max_sentences=max_sentences)
                rows.append({"doc_id": did, "summary": format_tldr(chosen), "n_points": len(chosen)})
            yield pd.DataFrame(rows)

    return docs.select(id_col, text_col).mapInPandas(run, schema="doc_id long, summary string, n_points int")
