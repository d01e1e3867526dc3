"""Unit parity tests for stance classification (X13-X16) and the
summary pipeline (A5/K5/X20/X22/X23) — scenarios modeled on the
reference's behaviour without copying its fixtures."""

from __future__ import annotations

from podcast_plow_spark.functions.evidence import (
    classify_publication_type,
    classify_stance,
    count_occurrences,
)
from podcast_plow_spark.functions.summarize import (
    format_tldr,
    iter_sentences,
    luhn_point_count,
    luhn_scores,
    select_sentences,
)


class TestCountOccurrences:
    def test_word_boundary(self):
        assert count_occurrences("improve improved improving", "improve") == 1

    def test_negation_lookbehind(self):
        assert count_occurrences("did not improve", "improve", ignore_negated=True) == 0
        assert count_occurrences("did improve", "improve", ignore_negated=True) == 1


class TestClassifyStance:
    def test_positive_only_supports(self):
        assert classify_stance("x", "Significant improvement observed", "") == "supports"

    def test_negative_only_contradicts(self):
        assert classify_stance("x", "No effect was found", "") == "contradicts"

    def test_pos_and_neg_mixed(self):
        assert classify_stance("x", "improved outcomes but adverse events", "") == "mixed"

    def test_mixed_keywords(self):
        assert classify_stance("x", "results were inconclusive", "") == "mixed"

    def test_claim_directional_fallback(self):
        got = classify_stance("magnesium increases sleep quality", "magnesium and sleep", "we observed increase")
        assert got == "supports"

    def test_default_mixed(self):
        assert classify_stance("anything", "unrelated title", "unrelated body") == "mixed"


class TestClassifyPublicationType:
    def test_ordered_map(self):
        assert classify_publication_type(["Systematic Review and Meta-Analysis"]) == "meta-analysis"
        assert classify_publication_type(["Randomized Controlled Trial"]) == "RCT"
        assert classify_publication_type(["Cohort Studies"]) == "observational"

    def test_fallbacks(self):
        assert classify_publication_type(["narrative review"]) == "systematic review"
        assert classify_publication_type(["some trial thing"]) == "RCT"
        assert classify_publication_type(["bench study"]) == "mechanistic"


class TestSentences:
    TEXT = "Creatine improves memory. It also helps power output! Does it help sleep?"

    def test_split_and_timing(self):
        sents = iter_sentences(self.TEXT)
        assert [s.text for s in sents] == [
            "Creatine improves memory.",
            "It also helps power output!",
            "Does it help sleep?",
        ]
        assert sents[0].start_ms == 0 and sents[0].end_ms == 3 * 500
        assert sents[1].start_word == 3

    def test_min_duration_floor(self):
        s = iter_sentences("Hi.")[0]
        assert s.end_ms - s.start_ms >= 500


class TestSelection:
    def test_budget_and_count_caps(self):
        sents = [f"sentence number {i} with plenty of informative words inside" for i in range(20)]
        out = select_sentences(sents, max_words=25, max_sentences=3)
        assert 1 <= len(out) <= 3

    def test_document_order_restored(self):
        sents = [
            "Alpha beta gamma delta epsilon zeta eta.",
            "Common common common common common common words.",
            "Common common common common common common words again.",
        ]
        out = select_sentences(sents, max_words=100, max_sentences=2)
        assert out == sorted(out, key=sents.index)

    def test_short_sentences_skipped(self):
        out = select_sentences(["Too short.", "This sentence has the required six words."],
                               max_words=50, max_sentences=5)
        assert out == ["This sentence has the required six words."]


class TestLuhn:
    """sumy-Luhn exact published semantics (sumy/summarizers/luhn.py
    re-derived; reference constructs LuhnSummarizer() with all
    defaults). Golden outputs hand-computed from the algorithm."""

    def test_default_config_every_word_significant(self):
        # LuhnSummarizer() default: no stop words, percentage=1 →
        # every word significant → rating = word count (0 if < 2 words)
        scores = luhn_scores(["one two three.", "four five.", "six."])
        assert scores == [3.0, 2.0, 0.0]

    def test_gap_rule_breaks_chunks_after_four_nonsignificant(self):
        from podcast_plow_spark.functions.summarize import luhn_rate_sentence

        # chunk1: cat sat + 4 stop gap → closed (trailing zeros stripped →
        # [1,1] = 4/2 = 2.0); chunk2: mat dog = 2.0
        words = "the cat sat of the and to the mat dog".split()
        sig = {"cat", "sat", "mat", "dog"}
        assert luhn_rate_sentence(words, sig) == 2.0
        # gap of 2 keeps one chunk: [1,0,0,1] → 2²/4 = 1.0
        assert luhn_rate_sentence("cat of and sat".split(), {"cat", "sat"}) == 1.0
        # exactly max_gap_size nonsig INSIDE a chunk still breaks it
        words2 = "cat a b c d sat".split()
        assert luhn_rate_sentence(words2, {"cat", "sat"}) == 0.0  # two 1-sig chunks → 0

    def test_single_significant_word_rates_zero(self):
        from podcast_plow_spark.functions.summarize import luhn_rate_sentence

        assert luhn_rate_sentence("cat of the".split(), {"cat"}) == 0.0

    def test_significant_percentage_truncates_by_frequency(self):
        from podcast_plow_spark.functions.summarize import luhn_significant_words

        terms = luhn_significant_words(
            ["b", "b", "b", "a", "a", "c", "d"], significant_percentage=0.3
        )
        assert terms == ("b", "a")  # int(7·0.3)=2 most frequent, stable ties

    def test_selection_stable_document_order(self):
        from podcast_plow_spark.functions.summarize import luhn_summarize

        text = "Alpha beta gamma delta. Hi there. One two three four five."
        # ratings: 4, 2, 5 → top-2 = sentences 0 and 2, document order
        assert luhn_summarize(text, 2) == [
            "Alpha beta gamma delta.",
            "One two three four five.",
        ]
        # ties keep document order: first of equal ratings wins
        tie = "One two three. Four five six. Seven eight nine ten."
        assert luhn_summarize(tie, 2) == ["One two three.", "Seven eight nine ten."]

    def test_golden_corpus(self):
        from podcast_plow_spark.functions.summarize import luhn_scores

        # stop-word config exercises the real clustering; values
        # hand-computed from sumy's chunk algebra
        stops = frozenset({"the", "a", "of", "and", "to"})
        sents = [
            "the cat sat of the and to the mat dog.",  # chunks [cat,sat],[mat,dog] → 2.0
            "cat of and sat.",                          # [1,0,0,1] → 1.0
            "cat of the.",                              # single sig → 0.0
            "the of and to.",                           # no sig → 0.0
        ]
        assert luhn_scores(sents, stop_words=stops) == [2.0, 1.0, 0.0, 0.0]

    def test_spark_query_matches_python_kernel(self, spark):
        """The pure-Column luhn_summary query computes the SAME ratings
        as luhn_rate_sentence on 12-token windows with the query's
        stop-word list."""
        import __spark_entry__ as m
        from podcast_plow_spark.functions.summarize import luhn_rate_sentence

        import re as _re

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(20)
        tmpdir = "/tmp/luhn_parity_docs"
        docs.write.mode("overwrite").parquet(f"{tmpdir}/documents.parquet")
        got = {
            (r["doc_id"], r["sent_idx"]): r["rating"]
            for r in m.q_luhn_summary(spark, tmpdir).collect()
        }
        stops = set(m._LUHN_STOPS)
        for row in docs.collect():
            toks = _re.findall(r"[a-z]+", (row["text"] or "").lower())
            for si in range(0, (len(toks) + 11) // 12):
                words = toks[si * 12 : si * 12 + 12]
                expected = round(luhn_rate_sentence(words, set(w for w in words if w not in stops)), 4)
                key = (row["doc_id"], si)
                if key in got:  # only top-N sentences are emitted
                    assert abs(got[key] - expected) < 1e-9, (key, got[key], expected)

    def test_point_count_clamp(self):
        assert luhn_point_count(100) == 3
        assert luhn_point_count(1800) == 5
        assert luhn_point_count(10_000) == 7


class TestFormat:
    def test_bullets(self):
        assert format_tldr(["a", "b"]) == "- a\n- b"

    def test_narrative_split_in_half_over_4(self):
        got = format_tldr(["one", "two", "three", "four", "five"], narrative=True)
        assert "\n\n" in got
        first = got.split("\n\n")[0]
        assert first == "one. two. three."


class TestLuhnProperties:
    """Property-based invariants of the sumy-Luhn chunk algebra."""

    def test_properties(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from podcast_plow_spark.functions.summarize import luhn_rate_sentence

        words_st = st.lists(st.sampled_from(["a", "b", "c", "d", "e", "f"]), max_size=40)
        sig_st = st.sets(st.sampled_from(["a", "b", "c"]))

        @settings(max_examples=300, deadline=None)
        @given(words_st, sig_st)
        def check(words, sig):
            r = luhn_rate_sentence(words, sig)
            n_sig = sum(1 for w in words if w in sig)
            assert r >= 0.0
            if n_sig <= 1:
                assert r == 0.0  # single/zero significant word scores 0
            # a chunk's rating is sig²/span ≤ n_sig² / n_sig = n_sig when
            # span ≥ sig; max over chunks inherits the bound
            assert r <= max(n_sig, 0)
            if words and all(w in sig for w in words) and len(words) >= 2:
                assert r == float(len(words))  # dense chunk: n²/n = n
            # invariance: rating only depends on the significance pattern
            mapped = ["x" if w in sig else "y" for w in words]
            assert r == luhn_rate_sentence(mapped, {"x"})

        check()


class TestStanceAlternationEquivalence:
    """The r3 single-scan family regexes must agree (as booleans) with
    the original per-phrase scans for every family, on adversarial
    corpora mixing negation prefixes, overlaps, and boundaries."""

    def _old_flags(self, text: str) -> tuple[int, int, int]:
        from podcast_plow_spark.functions.evidence import (
            MIXED_KEYWORDS,
            NEGATIVE_KEYWORDS,
            POSITIVE_KEYWORDS,
        )

        pos = sum(count_occurrences(text, t, ignore_negated=True) for t in POSITIVE_KEYWORDS)
        neg = sum(count_occurrences(text, t) for t in NEGATIVE_KEYWORDS)
        mix = sum(count_occurrences(text, t) for t in MIXED_KEYWORDS)
        return (1 if pos else 0, 1 if neg else 0, 1 if mix else 0)

    def test_equivalence_corpus(self):
        from podcast_plow_spark.functions.evidence import _stance_counts

        corpus = [
            "",
            "no significant improvement",
            "did not improve outcomes",
            "significant improvement in memory",
            "lack of benefit but reduced risk",
            "results were inconclusive and conflicting",
            "increase in risk without effect",
            "improvements are unimproved",  # boundary: no bare keyword
            "the treatment improved sleep; no change in mood",
            "failed to support the hypothesis",
            "does not lower blood pressure",
            "adverse events increased",
            "no effect, null, harm, benefit",
            "supports supports supports",
            "noimprove improveno no improve",
        ]
        for text in corpus:
            new = tuple(1 if v else 0 for v in _stance_counts(text))
            assert new == self._old_flags(text), text
