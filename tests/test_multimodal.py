"""Multimodal pipeline ops: resize / feature-extract / frame-sample.

The codecs are the deterministic stand-ins from ``sources/images.py``
(no image libs in this container) — what these tests freeze is the
SPARK side: schemas, batch-group vectorization, partition invariance,
corrupt-row isolation, and composition with the similarity operators.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from podcast_plow_spark.sources.images import (
    _caption_for,
    _pixels_for,
    decode_image,
    encode_image,
    phash64,
)
from podcast_plow_spark.sources.multimodal import (
    _frame_pixels,
    extract_image_features,
    generate_video_table,
    resize_images,
    sample_frames,
)


@pytest.fixture(scope="module")
def images(spark, tmp_path_factory):
    from podcast_plow_spark.sources.images import generate_image_table

    path = str(tmp_path_factory.mktemp("mm") / "images")
    generate_image_table(spark, 60, path, w=32, h=24, partitions=4)
    return spark.read.parquet(path)


@pytest.fixture(scope="module")
def videos(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("mm") / "videos")
    generate_video_table(spark, 12, path, n_frames=24, w=16, h=16, fps=12.0)
    return spark.read.parquet(path)


def test_resize_integer_factor_is_exact_area_mean(spark, images):
    out = resize_images(images, 16, 12)
    rows = {r["image_id"]: r for r in out.collect()}
    assert len(rows) == 60
    # scalar reference for one lossless row
    r = rows["img-00000000"]
    assert (r["w"], r["h"], r["fmt"]) == (16, 12, "raw")
    src = _pixels_for(0, 32, 24).astype(np.float64)
    ref = src.reshape(12, 2, 16, 2, 3).mean(axis=(1, 3)).round().clip(0, 255).astype(np.uint8)
    got = decode_image(r["bytes"], "raw", 16, 12)
    assert np.array_equal(got, ref)
    assert r["phash"] == phash64(ref)  # phash recomputed on the RESIZED pixels
    assert r["caption"] == _caption_for(0)


def test_resize_non_integer_factor_nearest_and_partition_invariance(spark, images):
    a = sorted((r["image_id"], r["phash"]) for r in resize_images(images, 10, 10).collect())
    b = sorted(
        (r["image_id"], r["phash"])
        for r in resize_images(images.repartition(7), 10, 10).collect()
    )
    assert a == b and len(a) == 60


def test_resize_drops_corrupt_rows_only(spark, images):
    px = _pixels_for(999, 32, 24)
    bad = spark.createDataFrame(
        [
            ("img-corrupt", b"\x00" * 5, 32, 24, "raw", "c", 0),  # truncated
            ("img-ok", encode_image(px, "raw"), 32, 24, "raw", "c", 0),
            ("img-unknown-fmt", encode_image(px, "raw"), 32, 24, "???", "c", 0),
        ],
        images.schema,
    )
    got = resize_images(bad, 16, 12).collect()
    assert [r["image_id"] for r in got] == ["img-ok"]


def test_extract_features_shape_and_composition_with_near_dup(spark, images):
    feats = extract_image_features(images, n_bins=10)
    rows = feats.collect()
    assert len(rows) == 60
    assert all(len(r["embedding"]) == 16 for r in rows)
    # deterministic: scalar recompute for one row
    r = {x["image_id"]: x for x in rows}["img-00000003"]
    px = _pixels_for(3, 32, 24)
    enc = encode_image(px, "qjpg")
    dec = np.frombuffer(enc, np.uint8).reshape(24, 32, 3).astype(np.float64)
    assert abs(r["embedding"][0] - dec[..., 0].mean() / 255.0) < 1e-12
    hist = np.bincount(
        np.minimum((dec.mean(axis=2) * 10 / 256.0).astype(int), 9).ravel(), minlength=10
    ) / (24.0 * 32.0)
    assert np.allclose(r["embedding"][6:], hist)

    # the embedding column drops straight into the dedup family
    from podcast_plow_spark.operators.similarity import embedding_near_dup_pairs

    ids = feats.select(
        F.expr("cast(substring(image_id, 5) as long)").alias("vec_id"), "embedding"
    )
    pairs = embedding_near_dup_pairs(spark, ids, threshold=0.99, dim=16)
    assert pairs.count() > 0  # feature space is coarse: near-dups exist
    assert set(pairs.columns) == {"a_id", "b_id", "cos_sim"}


def test_sample_frames_every_n_slices_without_decode(spark, videos):
    frames = sample_frames(videos, every_n=6)
    rows = frames.collect()
    assert len(rows) == 12 * 4  # 24 frames / 6
    by_vid: dict = {}
    for r in rows:
        by_vid.setdefault(r["video_id"], []).append(r)
    for vid, rs in by_vid.items():
        assert sorted(r["frame_idx"] for r in rs) == [0, 6, 12, 18]
        for r in rs:
            assert r["ts_sec"] == r["frame_idx"] / 12.0
            n = int(vid.rsplit("-", 1)[-1])
            ref = _frame_pixels(n, r["frame_idx"], 16, 16)
            assert np.array_equal(
                np.frombuffer(r["bytes"], np.uint8).reshape(16, 16, 3), ref
            )


def test_sample_frames_cap_and_corrupt_row(spark, videos):
    capped = sample_frames(videos, every_n=2, max_frames=3)
    per = capped.groupBy("video_id").count().collect()
    assert all(r["count"] == 3 for r in per) and len(per) == 12

    bad = spark.createDataFrame(
        [("vid-bad", b"\x01" * 10, 24, 16, 16, 12.0, "raw")],
        "video_id string, frames binary, n_frames int, w int, h int, fps double, fmt string",
    )
    assert sample_frames(bad, every_n=1).collect() == []


def test_sampled_frames_feed_the_image_ops(spark, videos):
    """frame-sample → feature-extract composes: frames rename into the
    image schema (synthetic caption/phash) and extract cleanly."""
    frames = sample_frames(videos, every_n=12)
    as_images = frames.select(
        F.concat_ws("#", "video_id", F.col("frame_idx").cast("string")).alias("image_id"),
        "bytes",
        "w",
        "h",
        "fmt",
        F.lit("frame").alias("caption"),
        F.lit(0).cast("long").alias("phash"),
    )
    feats = extract_image_features(as_images, n_bins=4)
    rows = feats.collect()
    assert len(rows) == 12 * 2
    assert all(len(r["embedding"]) == 10 for r in rows)
