#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Also measures frontier crawl throughput (URLs scheduled+fetched/sec)
on a synthetic frontier when the crawl engine is available — that is
the authoritative BASELINE.json metric.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from podcast_plow_spark.session import get_spark

    spark = get_spark(app_name="pps-bench", cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    timings: dict[str, float] = {}

    # warm the JVM + parquet footers with one cheap action
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    # Per-query BEST-OF-2 with spark.catalog.clearCache() before every
    # timed run. Why: this VM's whole-JVM perf is bimodal (documented in
    # BENCH/BASELINE.md — identical idle runs differ 2.6×) and first
    # runs pay python-worker/JIT warmup per query shape; BENCH_r02's
    # 153.6 s total was 2.7× the warm-rerun total purely from that.
    # clearCache between runs keeps the number honest: operator-internal
    # .cache() calls (dedup substrates) never carry data into the next
    # timed run, so each measurement is a cold-data/warm-JIT execution.
    # Default 3 reps since round 5: the r4→r5 regression recheck
    # (BENCH/R5_REGRESSION_RECHECK.md) showed best-of-2 does not damp
    # the host's slow-state bursts; best-of-3 reproduced r3 totals.
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    for name, fn in sorted(qs.items()):
        best = float("inf")
        for _ in range(reps):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.count()  # forces full execution without driver-collecting rows
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
    spark.catalog.clearCache()
    total = round(sum(timings.values()), 3)

    # crawl throughput bench (authoritative metric) — runs when the
    # crawl engine is present.
    try:
        from podcast_plow_spark.crawl.bench import frontier_throughput

        crawl = frontier_throughput(spark, n_urls=int(os.environ.get("SPARK_GRAFT_BENCH_URLS", "300000")))
        timings["frontier_throughput_urls_per_sec"] = round(crawl["urls_per_sec"], 1)
        timings["frontier_throughput_overlap_urls_per_sec"] = round(crawl["urls_per_sec_overlap"], 1)
    except Exception:  # noqa: BLE001 — engine not built yet / optional
        pass

    print(
        json.dumps(
            {
                "metric": "headline query wall time (sum) at sf; plus frontier URLs/sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
