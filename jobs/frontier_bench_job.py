#!/usr/bin/env python
"""spark-submit entrypoint for the frontier throughput benchmark.

The north rule's scaling criterion names *executors*: "run via
spark-submit --py-files on multi-executor clusters at N and 4N
executors". ``scripts/scaling_bench.py`` evidences it with thread
parallelism (local[8] vs local[32]); this job is the closer analog —
real separate executor JVMs (Spark's ``local-cluster`` test master,
or a real ``spark://`` standalone master), shuffle over netty, and
broadcast over the wire, launched exactly as the rule says::

    scripts/package.sh
    spark-submit --master 'local-cluster[2,4,4096]' \\
        --driver-memory 12g \\
        --py-files dist/podcast_plow_spark.zip \\
        jobs/frontier_bench_job.py --n-urls 1000000 --inproc-control

Prints ONE JSON line with the same fields as
``python -m podcast_plow_spark.crawl.bench`` (urls_per_sec,
urls_per_sec_overlap, bracketed kernel_control_* when requested) so
``scripts/executor_scaling_bench.py`` can pair N vs 4N runs with the
mode-matched-control methodology of BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

try:
    import podcast_plow_spark  # noqa: F401  (provided by --py-files)
except ImportError:  # direct `python jobs/frontier_bench_job.py` runs
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-urls", type=int, default=1_000_000)
    ap.add_argument("--inproc-control", action="store_true")
    ap.add_argument(
        "--master",
        default="submit",
        help="override the session master for direct-python runs; under "
        "spark-submit leave as 'submit' (master comes from the launcher)",
    )
    args = ap.parse_args()

    from podcast_plow_spark.crawl.bench import frontier_throughput, kernel_control
    from podcast_plow_spark.session import get_spark

    spark = get_spark(app_name="frontier-bench-submit", cores=args.master)
    spark.sparkContext.setLogLevel("ERROR")

    ctrl_n = max(1, args.n_urls // 8)
    ctrl_pre = kernel_control(spark, ctrl_n, reps=2) if args.inproc_control else None
    tput = frontier_throughput(spark, n_urls=args.n_urls)
    out = {
        "master": spark.sparkContext.master,
        "n_urls": args.n_urls,
        "urls_per_sec": round(tput["urls_per_sec"], 1),
        "urls_per_sec_overlap": round(tput["urls_per_sec_overlap"], 1),
    }
    if args.inproc_control:
        ctrl_post = kernel_control(spark, ctrl_n, reps=2)
        out["kernel_control_sec"] = round(min(ctrl_pre, ctrl_post), 2)
        out["kernel_control_pre_sec"] = round(ctrl_pre, 2)
        out["kernel_control_post_sec"] = round(ctrl_post, 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
