"""Iceberg catalog adapter — skip-marked without the runtime jar
(the sandbox ships none), exactly like the Pillow-less codec test.
With a jar present (real cluster), this exercises the engine's
persistence contract against a real catalog."""

from __future__ import annotations

import pytest

from podcast_plow_spark.sources.iceberg_store import IcebergStore, iceberg_available


def test_availability_probe_is_safe(spark):
    """The probe must never raise — it gates the optional path."""
    assert iceberg_available(spark) in (True, False)


def test_constructor_refuses_without_runtime(spark):
    if iceberg_available(spark):
        pytest.skip("Iceberg runtime present; negative test not applicable")
    with pytest.raises(RuntimeError, match="SnapshotStore"):
        IcebergStore(spark, catalog="nope")


@pytest.mark.skipif(
    "not config.getoption('--run-iceberg', default=False)",
    reason="needs an Iceberg-configured SparkSession (runtime jar + catalog conf)",
)
def test_store_contract_roundtrip(spark):
    """On a cluster with spark.sql.catalog.it=...SparkCatalog configured:
    write_bucketed → merge_delta → append_table → commit → read_table
    must round-trip the engine's frontier rows."""
    if not iceberg_available(spark):
        pytest.skip("Iceberg runtime not on classpath")
    store = IcebergStore(spark, catalog="it", namespace="plow_test", n_buckets=4)
    df = spark.createDataFrame(
        [(1, "a.com", 0, "queued"), (2, "b.com", 1, "queued")],
        "seq long, host string, host_hash int, status string",
    )
    store.write_bucketed("frontier", df, bucket_col="host")
    upd = spark.createDataFrame([(1, "a.com", 0, "done")], df.schema)
    store.merge_delta("frontier", upd, key_col="seq")
    store.commit(1, {"next_seq": 3})
    got = {
        (r["seq"], r["status"])
        for r in store.read_table(spark, "frontier").collect()
    }
    assert got == {(1, "done"), (2, "queued")}
    assert store.latest_metadata()["next_seq"] == 3
