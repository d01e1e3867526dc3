"""Per-stage timing of one bench epoch at one or two parallelism
levels. With two levels, both run in the SAME python process (new
SparkSession after stop()) so the pair is mode-matched by
construction. Usage: profile_epoch.py <cores>[,<cores2>] [n_urls]"""
import datetime as dt
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from podcast_plow_spark.crawl.bench import _decode_psnr_stage, synthetic_frontier
from podcast_plow_spark.functions.urls import canonicalize_url_udf
from podcast_plow_spark.operators import frontier as fr
from podcast_plow_spark.operators.politeness import schedule_fetches
from podcast_plow_spark.operators.seen import build_bloom, seen_filter_exact
from podcast_plow_spark.session import get_spark


def profile(cores: str, n_urls: int, reps: int = 3) -> dict:
    partitions = 128
    k = n_urls // 4
    spark = get_spark(app_name=f"profile-{cores}", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")

    raw = synthetic_frontier(spark, n_urls, partitions)
    cand0 = raw.withColumn("url_canon", canonicalize_url_udf(F.col("url"))).withColumn(
        "fingerprint", F.sha2(F.col("url_canon"), 256)
    )
    frontier = fr.cluster_by_host(
        fr.enqueue(cand0, epoch=0, num_partitions=partitions, seq_mode="keyed"), partitions
    ).cache()
    frontier.count()
    seen = frontier.select("url_canon")
    bloom = build_bloom(seen, expected_items=n_urls)
    presample = (
        frontier.select("priority", "run_at", "seq")
        .sample(False, min(1.0, 20_000 / max(n_urls, 1)), seed=42)
        .collect()
    )

    def run_epoch(salt, timings):
        t = time.perf_counter()

        def mark(name):
            nonlocal t
            now = time.perf_counter()
            timings.setdefault(name, []).append(now - t)
            t = now

        dq_caches = []
        dequeued = fr.dequeue_batch_polite(
            frontier, k, now=dt.datetime(2024, 1, 1), per_host_cap=1000,
            n_hint=n_urls, safety=1.3, with_rank=False, cache_registry=dq_caches,
            presample=presample,
        )
        mark("dequeue_probe")
        batch = schedule_fetches(
            dequeued.select("url_canon", "host", "seq"), crawl_delay_sec=0.01, rank_col="seq"
        )
        processed = _decode_psnr_stage(batch.repartition(partitions))
        n_batch = processed.where(F.col("invariant_ok")).count()
        mark("sched+decode+count")
        for h in dq_caches:
            h.unpersist()
        fresh = synthetic_frontier(spark, k, partitions, salt=salt).withColumn(
            "url_canon", canonicalize_url_udf(F.col("url"))
        ).withColumn("fingerprint", F.sha2(F.col("url_canon"), 256))
        caches = []
        unseen, _stats = seen_filter_exact(fresh, seen, bloom, cache_registry=caches)
        mark("probe_pin")  # probed.count inside seen_filter_exact
        new_rows = fr.enqueue(unseen, epoch=1, num_partitions=partitions, seq_base=n_urls, seq_mode="keyed")
        n_new = new_rows.count()
        mark("bcast+enqueue+count")
        for h in caches:
            h.unpersist()
        return n_batch, n_new

    timings = {}
    run_epoch(n_urls // 3, {})  # warm
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        nb, _ = run_epoch(n_urls // 2 + n_urls, timings)
        walls.append(time.perf_counter() - t0)
    frontier.unpersist()
    spark.stop()
    best = min(walls)
    return {
        "cores": cores,
        "wall_best": round(best, 2),
        "tput_best": round((nb + k) / best, 1),
        "stages": {name: [round(x, 2) for x in xs] for name, xs in timings.items()},
    }


if __name__ == "__main__":
    import json

    levels = (sys.argv[1] if len(sys.argv) > 1 else "32").split(",")
    n_urls = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    out = [profile(c, n_urls) for c in levels]
    print(json.dumps(out, indent=1))
