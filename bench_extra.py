#!/usr/bin/env python
"""Optimization-round measurement harness (guide §1.4): times individual
declared queries with the noop sink so the computation is measured, not
the sink, and optionally captures .explain("formatted") plans.

This file is SEPARATE from the frozen bench.py (driver contract). Usage:

    python bench_extra.py [--sf-dir DIR] [--reps N] [--plans DIR] q1 q2 ...
    python bench_extra.py --all            # every declared query

Prints one line per query: name, best-of-reps seconds, all samples.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plans", default=None, help="directory to write <query>.txt explain output")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--count", action="store_true", help="time df.count() like bench.py instead of noop sink")
    args = ap.parse_args()

    from podcast_plow_spark.session import get_spark

    spark = get_spark(app_name="pps-bench-extra", cores=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    names = sorted(qs) if args.all else args.queries
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    spark.read.parquet(f"{args.sf_dir}/region.parquet").count()  # warm JVM

    results = {}
    for name in names:
        fn = qs[name]
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = fn(spark, args.sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(args.plans, f"{name}.txt"), "w") as f:
                f.write(buf.getvalue())
        samples = []
        for _ in range(args.reps):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.perf_counter()
            df = fn(spark, args.sf_dir)
            if args.count:
                df.count()
            else:
                df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        results[name] = {"best": min(samples), "samples": samples}
        print(json.dumps({"query": name, **results[name]}), flush=True)

    total = round(sum(r["best"] for r in results.values()), 3)
    print(json.dumps({"total_best": total, "sf_dir": args.sf_dir, "n": len(results)}))
    spark.stop()


if __name__ == "__main__":
    main()
