"""Custom stateful streaming operator (applyInPandasWithState):
per-host politeness budget with state carried across micro-batches."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from podcast_plow_spark.streaming.stateful import limit_host_rate


def _run_once(spark, src, sink, ck):
    stream = spark.readStream.format("text").load(src).select(F.trim(F.col("value")).alias("url_canon"))
    stream = stream.withColumn("host", F.regexp_extract("url_canon", r"https://([^/]+)/", 1))
    q = (
        limit_host_rate(stream, max_per_batch=2)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_budget_enforced_and_state_survives_restart(spark, tmp_path):
    src, sink, ck = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
    os.makedirs(src)
    with open(os.path.join(src, "b1.txt"), "w") as fh:
        fh.write("\n".join(f"https://a.com/{i}" for i in range(5)) + "\nhttps://b.com/x\n")
    _run_once(spark, src, sink, ck)

    rows = {r["url_canon"]: (r["admitted"], r["host_seq"]) for r in spark.read.parquet(sink).collect()}
    admitted_a = [u for u, (ok, _) in rows.items() if ok and "a.com" in u]
    assert len(admitted_a) == 2  # budget: 2 per host per batch
    assert rows["https://b.com/x"] == (True, 1)  # other hosts unaffected

    # second micro-batch: the per-host sequence continues from state
    with open(os.path.join(src, "b2.txt"), "w") as fh:
        fh.write("https://a.com/99\n")
    _run_once(spark, src, sink, ck)
    rows2 = {r["url_canon"]: (r["admitted"], r["host_seq"]) for r in spark.read.parquet(sink).collect()}
    assert rows2["https://a.com/99"] == (True, 3)  # 2 admitted in b1 → seq 3
