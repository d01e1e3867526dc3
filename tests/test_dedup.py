"""Dedup-family invariants: LSH candidates are a subset of exact
pairs after verification, and recall on the planted near-dups is high."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from podcast_plow_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash64,
    word_shingles,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


def test_exact_dedup_covers_all_docs(spark, docs):
    total = docs.count()
    agg = exact_dedup(docs).agg(F.sum("dup_count")).collect()[0][0]
    assert agg == total


def test_ngram_jaccard_symmetric_bounds(spark, docs):
    pairs = ngram_jaccard_pairs(docs, jaccard_threshold=0.5).collect()
    assert len(pairs) > 0, "generator plants near-dups; expected pairs"
    for r in pairs:
        assert r["a_id"] < r["b_id"]
        assert 0.5 <= r["jaccard"] <= 1.0


def test_minhash_lsh_recall_vs_exact(spark, docs):
    exact = {
        (r["a_id"], r["b_id"])
        for r in ngram_jaccard_pairs(docs, jaccard_threshold=0.8).collect()
    }
    lsh = {
        (r["a_id"], r["b_id"])
        for r in minhash_lsh_pairs(docs, jaccard_threshold=0.8).collect()
    }
    assert lsh <= exact, "LSH output must be exact-verified (no false positives)"
    if exact:
        recall = len(lsh & exact) / len(exact)
        assert recall >= 0.9, f"recall {recall} below floor on near-identical dups"


def test_simhash_near_dups_have_close_hashes(spark, docs):
    near = ngram_jaccard_pairs(docs, jaccard_threshold=0.9).limit(5).collect()
    if not near:
        pytest.skip("no >=0.9 pairs at this sf")
    fp = {r["doc_id"]: r["simhash"] for r in simhash64(docs).collect()}
    for r in near:
        xor = fp[r["a_id"]] ^ fp[r["b_id"]]
        hamming = bin(xor).count("1")
        assert hamming <= 12, f"near-dup pair {r} hamming {hamming}"


def test_word_shingles_count(spark, docs):
    one = docs.limit(1).collect()[0]
    n_tokens = len(one["text"].split())
    n_shingles = word_shingles(docs.limit(1)).count()
    assert n_shingles <= max(0, n_tokens - 2)
