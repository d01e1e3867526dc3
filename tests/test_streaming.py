"""Structured-Streaming frontier ingestion: availableNow drain over a
seed-file directory, idempotent sink, batch/stream semantic parity."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from podcast_plow_spark.streaming.frontier_stream import (
    candidate_stream_transform,
    run_ingest_stream,
)


@pytest.fixture()
def dirs(tmp_path):
    seeds = tmp_path / "seeds"
    seeds.mkdir()
    return str(seeds), str(tmp_path / "ckpt"), str(tmp_path / "sink")


def _write_seeds(seeds_dir: str, name: str, urls: list[str]) -> None:
    with open(os.path.join(seeds_dir, name), "w") as fh:
        fh.write("\n".join(urls) + "\n")


def test_available_now_drain_and_idempotent_sink(spark, dirs):
    seeds_dir, ckpt, sink = dirs
    _write_seeds(
        seeds_dir,
        "a.txt",
        [
            "# comment",
            "https://A.com/x?utm_source=t",
            "https://a.com/x",        # canonical dup of the line above
            "https://b.com/y",
        ],
    )
    q = run_ingest_stream(spark, seeds_dir, ckpt, sink)
    q.awaitTermination(120)

    out = spark.read.parquet(sink)
    got = {r["url_canon"] for r in out.collect()}
    assert got == {"https://a.com/x", "https://b.com/y"}

    # second file: one new URL + one already-sunk URL → only the new lands
    _write_seeds(seeds_dir, "b.txt", ["https://b.com/y", "https://c.com/z"])
    q2 = run_ingest_stream(spark, seeds_dir, ckpt, sink)
    q2.awaitTermination(120)
    got2 = {r["url_canon"] for r in spark.read.parquet(sink).collect()}
    assert got2 == {"https://a.com/x", "https://b.com/y", "https://c.com/z"}


def test_stream_transform_matches_batch_semantics(spark):
    urls = ["https://X.com/a#f", "https://x.com/a", "https://y.com/b?utm_source=1&id=2"]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    out = candidate_stream_transform(df).select("url_canon", "host").collect()
    got = {(r["url_canon"], r["host"]) for r in out}
    assert got == {("https://x.com/a", "x.com"), ("https://y.com/b?id=2", "y.com")}
