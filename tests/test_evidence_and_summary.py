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
    def test_scores_favor_dense_significant_runs(self):
        sents = [
            "filler word then gap gap filler maybe",
            "spark spark spark spark spark spark",
        ]
        scores = luhn_scores(sents)
        assert scores[1] > scores[0]

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
