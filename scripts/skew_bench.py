"""Hot-host skew A/B: the salted fetch path vs the un-salted one.

The north rule names explicit salting of skewed hosts. This bench
plants a host carrying ~30% of a dequeued batch and times the
politeness-schedule → fetch/decode stage twice:

- UNSALTED: ``schedule_fetches`` windows by host — the hot host's
  entire fetch group lands in ONE task (window partition = host), and
  every stage downstream of the window inherits that layout, so ~30%
  of the per-URL decode CPU runs serially.
- SALTED: ``salt_hot_hosts`` + the salted schedule spread the hot host
  over n_salts lanes with the per-host politeness budget divided
  across lanes (delay × n_salts per lane on the spacing grid — same
  aggregate rate, crawl ordering untouched; see
  tests/test_crawl_engine.py::TestSaltedEpoch).

Emits one JSON line: {"unsalted_sec", "salted_sec", "speedup",
"n_rows", "hot_frac", "n_salts", "cpus"}.

Usage: python scripts/skew_bench.py [n_rows] [cpus]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000
    cpus = sys.argv[2] if len(sys.argv) > 2 else "16"
    n_salts = 16

    from podcast_plow_spark.session import get_spark

    # AQE's size-based partition coalescing sees only SHUFFLE BYTES —
    # at this demo's row count (tiny bytes, heavy per-row CPU) it would
    # merge every post-window partition into ~1 and serialize BOTH
    # paths, which is not the at-scale layout (at 10^10 rows partitions
    # are byte-large and survive). Disable coalescing so the window's
    # hash layout — the thing salting changes — is what gets timed.
    spark = get_spark(
        cores=cpus,
        extra_conf={"spark.sql.adaptive.coalescePartitions.enabled": "false"},
    )
    from podcast_plow_spark.crawl.bench import _decode_psnr_stage
    from podcast_plow_spark.operators.politeness import salt_hot_hosts, schedule_fetches

    # planted skew: ~30% of the batch on one host, the rest spread
    base = spark.range(0, n, 1, 32)
    host = F.when(F.col("id") % 10 < 3, F.lit("hot.example.com")).otherwise(
        F.concat(F.lit("h"), (F.col("id") % 997).cast("string"), F.lit(".example.com"))
    )
    batch = base.select(
        F.concat(F.lit("https://"), host, F.lit("/images/img-"),
                 F.lpad(F.col("id").cast("string"), 10, "0")).alias("url_canon"),
        host.alias("host"),
        (F.col("id") + 1).alias("crawl_rank"),
    ).cache()
    batch.count()

    def timed(df) -> float:
        t0 = time.perf_counter()
        assert _decode_psnr_stage(df, keep_offset="fetch_offset_sec" in df.columns).where(F.col("invariant_ok")).count() == n
        return time.perf_counter() - t0

    # warm-up (JIT + python worker spin-up) on an unskewed layout
    timed(batch.repartition(32))

    # keep fetch_offset_sec in the decode projection: the fetcher
    # consumes it (it IS the fetch time), and without it Catalyst
    # prunes the whole schedule window — both paths would then decode
    # over the identical upstream layout and time nothing but overhead
    # A: un-salted — decode inherits the schedule window's host-hash
    # layout (the engine's fetch_src = sched path without salting)
    sched_a = schedule_fetches(batch, crawl_delay_sec=0.01)
    unsalted = timed(sched_a.select("url_canon", "fetch_offset_sec"))

    # B: salted — same stage over the (host, salt)-hashed layout
    salted_df = salt_hot_hosts(batch, hot_threshold=n // 10, n_salts=n_salts)
    sched_b = schedule_fetches(
        salted_df, crawl_delay_sec=0.01, salt_col="host_salt", n_salts_col="host_salts"
    )
    salted = timed(sched_b.select("url_canon", "fetch_offset_sec"))

    print(json.dumps({
        "unsalted_sec": round(unsalted, 2),
        "salted_sec": round(salted, 2),
        "speedup": round(unsalted / salted, 2),
        "n_rows": n,
        "hot_frac": 0.3,
        "n_salts": n_salts,
        "cpus": cpus,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
