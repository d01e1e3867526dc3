#!/usr/bin/env python
"""spark-submit entrypoint for the crawl engine.

Cluster usage (north rule: multi-executor via --py-files)::

    scripts/package.sh   # builds dist/podcast_plow_spark.zip
    spark-submit --py-files dist/podcast_plow_spark.zip \\
        jobs/crawl_job.py --fixtures /path/fixtures \\
        --store /path/store --seeds /path/fixtures/feeds.txt \\
        --max-epochs 100 [--resume] [--batch-size 64] [--per-host-cap 2]

Local smoke::

    python jobs/crawl_job.py --local 8 --fixtures ... --store ... --seeds ...

The job prints one JSON line: epochs run, crawl size, seen size,
queue-state counts.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# running the file directly (python jobs/crawl_job.py) needs the repo
# root importable; under spark-submit --py-files the zip provides it
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fixtures", required=True)
    ap.add_argument("--store", required=True)
    ap.add_argument("--seeds")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--max-epochs", type=int, default=100)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--per-host-cap", type=int, default=2)
    ap.add_argument("--num-partitions", type=int, default=32)
    ap.add_argument("--local", default=None, help="run on local[N] instead of the cluster master")
    args = ap.parse_args()

    if args.local:
        from podcast_plow_spark.session import get_spark

        spark = get_spark(app_name="plow-crawl", cores=args.local)
    else:
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.appName("plow-crawl").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from podcast_plow_spark.crawl.engine import CrawlConfig, CrawlEngine
    from podcast_plow_spark.operators.frontier import queue_stats
    from podcast_plow_spark.sources.snapshots import SnapshotStore

    engine = CrawlEngine(
        spark,
        SnapshotStore(args.store),
        args.fixtures,
        config=CrawlConfig(
            batch_size=args.batch_size,
            per_host_cap=args.per_host_cap,
            num_partitions=args.num_partitions,
        ),
    )
    if args.resume:
        epochs = engine.run(resume=True, max_epochs=args.max_epochs)
    else:
        if not args.seeds:
            print("--seeds required unless --resume", file=sys.stderr)
            raise SystemExit(2)
        epochs = engine.run(seeds_path=args.seeds, max_epochs=args.max_epochs)

    frontier = engine.store.read_table(spark, "frontier")
    stats = {r["status"]: r["n"] for r in queue_stats(frontier).collect()}
    print(
        json.dumps(
            {
                "epochs": epochs,
                "crawled": len(engine.crawl_order()),
                "seen": len(engine.seen_set()),
                "queue": stats,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
