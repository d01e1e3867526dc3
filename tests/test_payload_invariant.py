"""End-to-end payload invariant (BASELINE.json north_star): crawl the
fixtures, then verify every fetched image payload — decoded-pixel
PSNR ≥ 40 dB for lossy formats + caption equality — per row."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from podcast_plow_spark.crawl.engine import CrawlConfig, CrawlEngine
from podcast_plow_spark.crawl.oracle import sequential_crawl
from podcast_plow_spark.sources.fixtures import FixtureSpec, make_fixtures
from podcast_plow_spark.sources.images import generate_image_table
from podcast_plow_spark.sources.snapshots import SnapshotStore


@pytest.fixture(scope="module")
def crawled(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("fixtures"))
    spec = make_fixtures(FixtureSpec(root=root, n_feeds=3, entries_per_feed=5))
    img_path = str(tmp_path_factory.mktemp("imgs") / "images.parquet")
    generate_image_table(spark, n_images=spec.n_feeds * spec.entries_per_feed, out_path=img_path)
    store = SnapshotStore(str(tmp_path_factory.mktemp("store")))
    eng = CrawlEngine(
        spark, store, root, image_table_path=img_path,
        config=CrawlConfig(batch_size=8, per_host_cap=2, num_partitions=4),
    )
    eng.run(seeds_path=f"{root}/feeds.txt", max_epochs=50)
    oracle = sequential_crawl(root, batch_size=8, per_host_cap=2)
    return eng, oracle


def test_every_fetched_payload_passes_invariant(spark, crawled):
    eng, _ = crawled
    res = eng.verify_fetched_payloads().cache()
    n = res.count()
    assert n > 0
    failed = res.where(~F.col("passed")).collect()
    assert failed == [], failed


def test_lossy_rows_are_checked_via_psnr_not_equality(spark, crawled):
    eng, _ = crawled
    res = eng.verify_fetched_payloads()
    lossy = res.where((F.col("psnr_db") < 60) & F.col("passed"))
    assert lossy.count() > 0, "expected qjpg rows exercising the PSNR path"


def test_fetched_set_matches_oracle(spark, crawled):
    eng, oracle = crawled
    verified_ids = {r["image_id"] for r in eng.verify_fetched_payloads().collect()}
    assert verified_ids == set(oracle.fetched_images)
