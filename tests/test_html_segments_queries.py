"""X12/D2 HTML kernels, W4 segments, X21 query builder — frozen
semantics mirroring the reference's test scenarios
(tests/test_claim_extraction.py, tests/test_youtube_ingest.py)."""

from __future__ import annotations

from podcast_plow_spark.functions.querybuild import (
    build_query_terms,
    build_query_variants,
    mesh_query_from_terms,
    simple_query_from_terms,
)
from podcast_plow_spark.functions.summarize import iter_sentences
from podcast_plow_spark.operators.segments import (
    SEGMENT_MAX_MS,
    SEGMENT_MIN_MS,
    build_segments,
    extract_claims,
)
from podcast_plow_spark.sources.html import extract_candidates, extract_transcript

LONG_BODY = " ".join(f"word{i}" for i in range(250))
HTML_TRANSCRIPT = f"""
<html><head><script>ignore me</script><style>p {{}}</style></head>
<body><header>site chrome</header>
<p>Intro paragraph before.</p>
<p>Transcript</p>
<p>{LONG_BODY}</p>
<footer>footer junk</footer></body></html>
"""


class TestExtractTranscript:
    def test_transcript_anchor_suffix(self):
        got = extract_transcript(HTML_TRANSCRIPT)
        assert got is not None
        assert got.startswith("Transcript")
        assert "Intro paragraph" not in got
        assert "ignore me" not in got and "footer junk" not in got

    def test_min_words_gate(self):
        assert extract_transcript("<p>Transcript</p><p>too short</p>") is None

    def test_article_fallback(self):
        html = f"<article>{LONG_BODY}</article>"
        got = extract_transcript(html)
        assert got is not None and got.split()[0] == "word0"

    def test_malformed_html_returns_none_or_text(self):
        assert extract_transcript("<p>< <<< broken") is None


class TestExtractCandidates:
    HTML = """
    <html><head>
      <link rel="canonical" href="https://www.youtube.com/watch?v=AAAAAAAAAAA">
      <meta property="og:video" content="https://youtu.be/BBBBBBBBBBB">
    </head><body>
      <iframe src="https://www.youtube.com/embed/CCCCCCCCCCC"></iframe>
      <a href="https://youtu.be/DDDDDDDDDDD">link</a>
      <a href="https://youtu.be/AAAAAAAAAAA">dup of canonical</a>
    </body></html>
    """

    def test_source_priority_order_first_wins(self):
        got = extract_candidates(self.HTML)
        assert got == [
            "https://www.youtube.com/watch?v=AAAAAAAAAAA",
            "https://www.youtube.com/watch?v=BBBBBBBBBBB",
            "https://www.youtube.com/watch?v=CCCCCCCCCCC",
            "https://www.youtube.com/watch?v=DDDDDDDDDDD",
        ]

    def test_relative_url_joined_with_base(self):
        html = '<a href="//www.youtube.com/watch?v=EEEEEEEEEEE">x</a>'
        got = extract_candidates(html, "https://example.com/page")
        assert got == ["https://www.youtube.com/watch?v=EEEEEEEEEEE"]

    def test_non_youtube_ignored(self):
        assert extract_candidates('<a href="https://vimeo.com/123">v</a>') == []


class TestSegments:
    def test_duration_invariants(self):
        # ~40 sentences × ~8 words → every sentence ≈ 4s
        text = " ".join("alpha beta gamma delta epsilon zeta eta theta." for _ in range(40))
        segs = build_segments(iter_sentences(text))
        assert segs
        for seg in segs[:-1]:
            assert seg.end_ms - seg.start_ms >= SEGMENT_MIN_MS
        for seg in segs:
            assert seg.end_ms - seg.start_ms <= SEGMENT_MAX_MS

    def test_contiguous_non_overlapping(self):
        text = " ".join("one two three four five six seven eight." for _ in range(30))
        segs = build_segments(iter_sentences(text))
        for a, b in zip(segs, segs[1:]):
            assert b.start_ms >= a.start_ms

    def test_empty(self):
        assert build_segments([]) == []


class TestExtractClaims:
    TEXT = (
        "Creatine improves working memory. I remember a story about creatine. "
        "Creatine improves working memory. Magnesium supports deep sleep."
    )

    def test_dedup_and_predicate(self):
        claims = extract_claims(self.TEXT)
        keys = [c["norm_key"] for c in claims]
        assert len(keys) == len(set(keys))  # D4 dedup
        assert all("story" not in k for k in keys)  # anecdote filtered
        assert len(claims) == 2

    def test_ordering_and_timing(self):
        claims = extract_claims(self.TEXT)
        assert claims == sorted(claims, key=lambda c: (c["start_ms"], c["norm_key"]))
        assert all(c["end_ms"] > c["start_ms"] for c in claims)

    def test_topic_assignment(self):
        claims = extract_claims("Magnesium supports deep sleep.")
        assert claims[0]["topic"] == "sleep_quality" and claims[0]["domain"] == "wellness"

    def test_paraphrase_applied(self):
        claims = extract_claims("The host says that creatine improves memory.")
        assert claims[0]["normalized_text"].startswith("The speaker maintains that")


class TestQueryBuilder:
    def test_phrase_synonyms_first_then_tokens(self):
        terms = build_query_terms("creatine improves cognitive function")
        assert terms[0] in ("cognition", "cognitive function")  # phrase synonyms lead
        assert "creatine" in terms
        assert terms[-1] == "improve"  # directional deferred to tail

    def test_cap_12(self):
        long = "creatine magnesium sleep memory exercise diet protein vitamin cancer heart gut brain anxiety"
        assert len(build_query_terms(long)) == 12

    def test_mesh_and_simple_forms(self):
        terms = ["creatine", "ketone bodies"]
        mesh = mesh_query_from_terms(terms)
        assert mesh == (
            "(creatine[MeSH Terms] OR creatine[Title/Abstract]) AND "
            '("ketone bodies"[MeSH Terms] OR "ketone bodies"[Title/Abstract])'
        )
        assert simple_query_from_terms(terms) == 'creatine "ketone bodies"'

    def test_variants_order_preserving_dedup(self):
        qs = build_query_variants("creatine improves memory", "creatine improves memory")
        assert len(qs) == len(set(qs))
        assert qs[-1] == '"creatine improves memory"'
