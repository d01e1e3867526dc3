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
  constructed with ALL DEFAULTS (``server/services/summarize.py:48-49``
  — no stemmer ⇒ identity, no stop words ⇒ empty set,
  significant_percentage=1). This module implements sumy's *published*
  algorithm exactly (sumy/summarizers/luhn.py + models/tf.py +
  _summarizer.py semantics, re-derived from the public source):

  * words per sentence: tokens matching ``^[^\\W\\d_]+$`` (sumy's
    Tokenizer word filter — purely alphabetic), lowercased;
  * significant stems: the ``int(len(words)·percentage)`` most
    frequent terms (ties broken by first occurrence — CPython Counter
    insertion order + stable sort, as in sumy);
  * sentence rating: Luhn chunking with ``max_gap_size=4`` — a chunk
    opens at a significant word, extends until 4 consecutive
    non-significant words, trailing zeros stripped; chunk rating is
    ``significant²/span`` with the single-significant-word chunk rated
    0; sentence rating = max chunk rating;
  * selection: stable sort by rating desc (document order on ties),
    take N, emit in document order.

  Two declared divergences, both outside the scoring algorithm:
  sentence boundaries come from this repo's regex splitter (sumy uses
  nltk punkt — not in this container), and word splits inside
  contractions differ from nltk word_tokenize ("don't" → don/t vs
  do). Frozen by a golden-output corpus in
  tests/test_evidence_and_summary.py.
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
    "luhn_words",
    "luhn_significant_words",
    "luhn_rate_sentence",
    "luhn_summarize",
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


# --- sumy-Luhn (X22), exact published semantics ------------------------

#: sumy Tokenizer's word filter: purely alphabetic tokens
LUHN_WORD_RE = re.compile(r"[^\W\d_]+", re.UNICODE)
LUHN_MAX_GAP_SIZE = 4  # sumy LuhnSummarizer.max_gap_size


def luhn_words(sentence: str) -> list[str]:
    """Sentence → sumy-word list (tokens matching ``^[^\\W\\d_]+$``)."""
    return LUHN_WORD_RE.findall(sentence)


def luhn_significant_words(
    words: list[str],
    stop_words: frozenset[str] = frozenset(),
    significant_percentage: float = 1.0,
) -> tuple[str, ...]:
    """sumy ``_get_significant_words`` + ``TfDocumentModel
    .most_frequent_terms``: lowercase, drop stop words, keep the
    ``int(len(words)·percentage)`` most frequent terms — frequency
    desc, ties by first occurrence (Counter insertion order under a
    stable sort, exactly as sumy computes it)."""
    normed = [w.lower() for w in words]
    kept = [w for w in normed if w not in stop_words]
    counts: Counter[str] = Counter(kept)
    terms = sorted(counts.items(), key=lambda i: -i[1])
    best = int(len(kept) * significant_percentage)
    return tuple(t for t, _ in terms[:best])


def luhn_rate_sentence(
    words: list[str],
    significant: frozenset[str] | set[str] | tuple[str, ...],
    max_gap_size: int = LUHN_MAX_GAP_SIZE,
) -> float:
    """sumy ``rate_sentence``/``_get_chunk_ratings``/``_get_chunk_rating``
    verbatim semantics: chunks open at a significant word and extend
    until ``max_gap_size`` consecutive non-significant words; each
    chunk is scored ``significant²/span`` after stripping trailing
    zeros, except a single-significant-word chunk scores 0; the
    sentence's rating is the max chunk rating (0 if no chunks)."""
    sig = set(significant)
    chunks: list[list[int]] = []
    nonsig_tail = [0] * max_gap_size
    in_chunk = False
    for word in words:
        w = word.lower()
        if w in sig and not in_chunk:
            in_chunk = True
            chunks.append([1])
        elif in_chunk:
            chunks[-1].append(int(w in sig))
        if chunks and chunks[-1][-max_gap_size:] == nonsig_tail:
            in_chunk = False
    best = 0.0
    for chunk in chunks:
        c = list(chunk)
        while c and c[-1] == 0:
            c.pop()
        if not c:
            continue
        n_sig = sum(c)
        rating = 0.0 if n_sig == 1 else n_sig * n_sig / len(c)
        best = max(best, rating)
    return best


def luhn_scores(
    sentences: list[str],
    stop_words: frozenset[str] = frozenset(),
    significant_percentage: float = 1.0,
) -> list[float]:
    """Per-sentence sumy-Luhn ratings for a document given as a
    sentence list (significant words computed over the whole
    document, as sumy does). Defaults mirror ``LuhnSummarizer()``
    exactly as the reference constructs it."""
    per_sentence = [luhn_words(s) for s in sentences]
    doc_words: list[str] = [w for ws in per_sentence for w in ws]
    significant = frozenset(luhn_significant_words(doc_words, stop_words, significant_percentage))
    return [luhn_rate_sentence(ws, significant) for ws in per_sentence]


def luhn_summarize(text: str, sentences_count: int) -> list[str]:
    """The reference's ``_summarize_chunk_text`` pipeline
    (server/services/summarize.py:44-64) on sumy-Luhn scoring:
    rate every sentence, stable-sort by rating desc (ties keep
    document order), take N, emit in document order, whitespace
    collapsed."""
    sentences = [s.text for s in iter_sentences(text or "")]
    if not sentences:
        return []
    scores = luhn_scores(sentences)
    order = sorted(range(len(sentences)), key=lambda i: -scores[i])[:sentences_count]
    return [re.sub(r"\s+", " ", sentences[i]).strip() for i in sorted(order)]


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
