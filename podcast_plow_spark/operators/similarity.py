"""Similarity search over embedding columns (training-data ops).

Two tiers, per the scale plan:

- :func:`cosine_topk_pairs` — brute-force all-pairs top-k. The corpus
  matrix is *broadcast* (N×d float32; 10^6×64 ≈ 256 MB is the
  practical ceiling) and each executor computes its block of the
  similarity matrix with one BLAS matmul inside ``mapInPandas``.
  Per-row top-k is sufficient for global top-k pairs (any pair in the
  global top-k is beaten by < k pairs, hence is within its own row's
  top-k); the global ``orderBy().limit(k)`` then runs on ≤ N·k rows
  and compiles to TakeOrderedAndProject.
- :func:`lsh_cosine_buckets` — the 100 TB path: seeded random
  hyperplane signatures (SimHash-for-cosine), banded into buckets; an
  equi-join on (band, bucket) prunes the candidate pairs, exact cosine
  reranks inside buckets only. No driver-side corpus needed.

The reference has no vector operators (pgvector loaded but unused —
reference ``infra/initdb/001_init.sql:3``); these are the new
first-class training-pipeline capabilities.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["cosine_topk_pairs", "lsh_cosine_buckets", "lsh_cosine_topk_pairs"]


def cosine_topk_pairs(
    spark: SparkSession,
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 50,
    round_digits: int = 4,
) -> DataFrame:
    """Global top-k most-similar unordered pairs (a_id < b_id) by
    cosine similarity. BLAS-vectorized; one Python call per Arrow batch."""
    pdf = emb.select(id_col, vec_col).toPandas()
    ids = pdf[id_col].to_numpy()
    mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(mat, axis=1)
    normed = mat / np.where(norms == 0, 1.0, norms)[:, None]
    order = np.argsort(ids)
    bc = spark.sparkContext.broadcast((ids[order], normed[order]))

    out_schema = f"a_id long, b_id long, cos_sim double"

    def block_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        corpus_ids, corpus = bc.value
        for pdf_block in batches:
            if pdf_block.empty:
                continue
            bids = pdf_block[id_col].to_numpy()
            bmat = np.stack(pdf_block[vec_col].to_numpy()).astype(np.float64)
            bnorms = np.linalg.norm(bmat, axis=1)
            bmat = bmat / np.where(bnorms == 0, 1.0, bnorms)[:, None]
            sims = bmat @ corpus.T  # (B, N) one BLAS call
            # only pairs with corpus_id > row_id (a_id < b_id, no dupes)
            mask = corpus_ids[None, :] <= bids[:, None]
            sims = np.where(mask, -np.inf, sims)
            kk = min(k, sims.shape[1])
            top_idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            rows_a, rows_b, rows_s = [], [], []
            for r in range(sims.shape[0]):
                sel = top_idx[r]
                vals = sims[r, sel]
                keep = np.isfinite(vals)
                rows_a.append(np.full(keep.sum(), bids[r]))
                rows_b.append(corpus_ids[sel[keep]])
                rows_s.append(vals[keep])
            if rows_a:
                yield pd.DataFrame(
                    {
                        "a_id": np.concatenate(rows_a),
                        "b_id": np.concatenate(rows_b),
                        "cos_sim": np.concatenate(rows_s),
                    }
                )

    cand = emb.select(id_col, vec_col).mapInPandas(block_topk, schema=out_schema)
    return (
        cand.select("a_id", "b_id", F.round(F.col("cos_sim"), round_digits).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col("a_id").asc(), F.col("b_id").asc())
        .limit(k)
    )


def lsh_cosine_buckets(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 16,
    n_bands: int = 4,
    seed: int = 42,
    dim: int = 64,
) -> DataFrame:
    """Random-hyperplane LSH signatures, banded.

    Returns (id, band, bucket) — one row per band. A self-equi-join on
    (band, bucket) yields candidate pairs with collision probability
    rising with cosine similarity. Deterministic: hyperplanes from a
    seeded RNG, generated identically on every executor.
    """
    rows_per_band = n_planes // n_bands
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))

    def sign_bits(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            bits = (mat @ planes.T) >= 0  # (B, n_planes)
            out = {"__id": pdf[id_col].to_numpy()}
            weights = 1 << np.arange(rows_per_band)
            for b in range(n_bands):
                seg = bits[:, b * rows_per_band : (b + 1) * rows_per_band]
                out[f"band{b}"] = (seg * weights).sum(axis=1).astype(np.int64)
            yield pd.DataFrame(out)

    band_cols = ", ".join(f"band{b} long" for b in range(n_bands))
    sig = emb.select(id_col, vec_col).mapInPandas(sign_bits, schema=f"__id long, {band_cols}")
    stacked = sig.select(
        F.col("__id").alias(id_col),
        F.explode(
            F.array(*[F.struct(F.lit(b).alias("band"), F.col(f"band{b}").alias("bucket")) for b in range(n_bands)])
        ).alias("bb"),
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    return stacked


def lsh_cosine_topk_pairs(
    spark: SparkSession,
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 50,
    n_planes: int = 16,
    n_bands: int = 4,
    seed: int = 42,
    round_digits: int = 4,
) -> DataFrame:
    """Scale path: LSH-pruned candidate pairs, exact cosine rerank.

    Recall is probabilistic (tested ≥ configured floor in
    tests/test_similarity.py); the brute-force operator remains the
    exactness baseline.
    """
    buckets = lsh_cosine_buckets(emb, id_col, vec_col, n_planes, n_bands, seed)
    a = buckets.select(F.col(id_col).alias("a_id"), "band", "bucket")
    b = buckets.select(F.col(id_col).alias("b_id"), "band", "bucket")
    cand = (
        a.join(b, ["band", "bucket"])
        .where(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )
    va = emb.select(F.col(id_col).alias("a_id"), F.col(vec_col).alias("a_vec"))
    vb = emb.select(F.col(id_col).alias("b_id"), F.col(vec_col).alias("b_vec"))
    pairs = cand.join(va, "a_id").join(vb, "b_id")

    def rerank(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            am = np.stack(pdf["a_vec"].to_numpy()).astype(np.float64)
            bm = np.stack(pdf["b_vec"].to_numpy()).astype(np.float64)
            dots = np.einsum("ij,ij->i", am, bm)
            na = np.linalg.norm(am, axis=1)
            nb = np.linalg.norm(bm, axis=1)
            cos = dots / np.where(na * nb == 0, 1.0, na * nb)
            yield pd.DataFrame({"a_id": pdf["a_id"], "b_id": pdf["b_id"], "cos_sim": cos})

    scored = pairs.mapInPandas(rerank, schema="a_id long, b_id long, cos_sim double")
    return (
        scored.select("a_id", "b_id", F.round(F.col("cos_sim"), round_digits).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col("a_id").asc(), F.col("b_id").asc())
        .limit(k)
    )
