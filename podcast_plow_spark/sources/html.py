"""HTML kernels (stdlib HTMLParser — no BeautifulSoup in container).

Reference parity (re-derived):
- X12 transcript extraction: reference
  ``server/ingest/transcripts.py:35-66`` — decompose
  script/style/noscript/header/footer/svg/iframe; collect
  p/li/blockquote text; transcript-anchored suffix selection; article
  fallback; ≥200-word gates.
- D2 candidate URL extraction: reference
  ``server/ingest/youtube.py:105-165`` — **document-order priority
  across sources**: canonical/alternate links → og:video metas →
  iframes → anchors → raw-text regex; scheme fixups; first occurrence
  wins.

Both ship as Arrow-vectorized pandas UDFs (``mapInPandas`` over HTML
document batches); parsing is pure CPU and embarrassingly parallel.
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame

from podcast_plow_spark.functions.urls import (
    _YT_ID_RE,
    fixup_scheme,
    normalize_youtube_url,
)

__all__ = ["extract_transcript", "extract_candidates", "extract_transcript_df"]

MIN_WORDS = 200
_DROP_TAGS = {"script", "style", "noscript", "header", "footer", "svg", "iframe"}
_PARA_TAGS = {"p", "li", "blockquote"}


class _TextCollector(HTMLParser):
    """Collects paragraph-level text + the candidate-source elements
    in document order."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.paragraphs: list[str] = []
        self.article_parts: list[str] = []
        self.links: list[tuple[str, str]] = []      # (rel, href) of <link>
        self.metas: list[tuple[str, str]] = []      # (property/name, content)
        self.iframes: list[str] = []
        self.anchors: list[str] = []
        self._drop_depth = 0
        self._para_stack: list[list[str]] = []
        self._article_depth = 0

    def handle_starttag(self, tag, attrs):
        a = dict(attrs)
        if tag in _DROP_TAGS:
            if tag == "iframe" and a.get("src"):
                self.iframes.append(a["src"])
            self._drop_depth += 1
            return
        if self._drop_depth:
            return
        if tag == "link" and a.get("rel") and a.get("href"):
            self.links.append((a["rel"].lower(), a["href"]))
        elif tag == "meta":
            key = a.get("property") or a.get("name") or ""
            if key and a.get("content"):
                self.metas.append((key.lower(), a["content"]))
        elif tag == "a" and a.get("href"):
            self.anchors.append(a["href"])
        if tag in _PARA_TAGS:
            self._para_stack.append([])
        if tag == "article":
            self._article_depth += 1

    def handle_endtag(self, tag):
        if tag in _DROP_TAGS:
            self._drop_depth = max(0, self._drop_depth - 1)
            return
        if self._drop_depth:
            return
        if tag in _PARA_TAGS and self._para_stack:
            text = " ".join(self._para_stack.pop()).strip()
            if text:
                self.paragraphs.append(text)
        if tag == "article":
            self._article_depth = max(0, self._article_depth - 1)

    def handle_data(self, data):
        if self._drop_depth:
            return
        text = data.strip()
        if not text:
            return
        if self._para_stack:
            self._para_stack[-1].append(text)
        if self._article_depth:
            self.article_parts.append(text)


def _normalize_ws(text: str) -> str:
    return re.sub(r"\s+", " ", text).strip()


def extract_transcript(html: str) -> str | None:
    """X12 (reference server/ingest/transcripts.py:35-66)."""
    parser = _TextCollector()
    try:
        parser.feed(html or "")
    except Exception:  # noqa: BLE001 — malformed HTML never crashes the batch
        return None
    paragraphs = parser.paragraphs
    if not paragraphs:
        body = _normalize_ws(re.sub(r"<[^>]+>", " ", html or ""))
        paragraphs = [body] if body else []
    if not paragraphs:
        return None
    for idx, para in enumerate(p.lower() for p in paragraphs):
        if "transcript" in para:
            candidate = "\n\n".join(_normalize_ws(p) for p in paragraphs[idx:])
            if len(candidate.split()) >= MIN_WORDS:
                return candidate
    joined = "\n\n".join(_normalize_ws(p) for p in paragraphs)
    if "transcript" in joined.lower() and len(joined.split()) >= MIN_WORDS:
        return joined
    if parser.article_parts:
        article_text = _normalize_ws(" ".join(parser.article_parts))
        if len(article_text.split()) >= MIN_WORDS:
            return article_text
    if len(joined.split()) >= MIN_WORDS:
        return joined
    return None


def extract_candidates(html: str, base_url: str | None = None) -> list[str]:
    """D2 (reference server/ingest/youtube.py:105-165): candidates in
    source-priority document order, first occurrence wins."""
    parser = _TextCollector()
    try:
        parser.feed(html or "")
    except Exception:  # noqa: BLE001
        return []
    out: list[str] = []

    def add(url: str | None) -> None:
        if not url:
            return
        fixed = fixup_scheme(url.strip(), base_url)
        normalized = normalize_youtube_url(fixed) if fixed else None
        if normalized and normalized not in out:
            out.append(normalized)

    for rel, href in parser.links:
        rels = set(rel.split())
        if rels & {"canonical", "alternate"}:
            add(href)
    wanted_metas = ("og:video", "og:video:url", "og:video:secure_url", "twitter:player")
    for key, content in parser.metas:
        if key in wanted_metas:
            add(content)
    for src in parser.iframes:
        add(src)
    for href in parser.anchors:
        add(href)
    for match in _YT_ID_RE.finditer(html or ""):
        add(match.group(0))
    return out


def extract_transcript_df(pages: DataFrame, url_col: str = "url", html_col: str = "html") -> DataFrame:
    """Vectorized X12 over a DataFrame of fetched pages."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, html in zip(pdf[url_col], pdf[html_col]):
                text = extract_transcript(html)
                rows.append(
                    {
                        "url": url,
                        "transcript": text,
                        "word_count": len(text.split()) if text else 0,
                    }
                )
            yield pd.DataFrame(rows)

    return pages.mapInPandas(run, schema="url string, transcript string, word_count long")
