"""Seen-filter maintenance A/B: fold-every-epoch vs cuckoo hot tier.

Per-epoch cost of keeping the URL-seen filter current, measured over
E epochs of B insertions each against a Bloom sized for N keys:

- FOLD-EVERY-EPOCH (baseline): build a batch delta Bloom sized LIKE
  the big one, OR-merge (an O(filter-size) pass over the full bit
  array), re-broadcast the merged filter (merge returns a new object,
  so the memoized broadcast is invalidated — at 10^10 keys that's a
  ~15 GB re-ship per epoch), then probe.
- HOT TIER: build a batch-sized cuckoo via the same treeAggregate
  shape, merge into the running hot tier (O(batch)), probe
  bloom-OR-hot; the big Bloom's broadcast stays memoized. One fold at
  the end amortizes the O(filter-size) pass over all E epochs.

Probe correctness is identical by construction (bloom ∪ hot covers
every insertion; exact backstop unchanged) — this measures COST only.

Emits one JSON line:
{"fold_every_epoch_sec", "hot_tier_sec", "speedup", "bloom_keys",
 "batch", "epochs", "cpus"}.

Usage: python scripts/hot_tier_bench.py [bloom_keys] [batch] [epochs] [cpus]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    n_keys = int(sys.argv[1]) if len(sys.argv) > 1 else 30_000_000
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    cpus = sys.argv[4] if len(sys.argv) > 4 else "16"

    from podcast_plow_spark.session import get_spark

    spark = get_spark(cores=cpus)
    from podcast_plow_spark.operators.seen import (
        CuckooFilter,
        build_bloom,
        build_cuckoo,
        probe_bloom,
    )

    def batch_df(e: int, salt: int):
        return (
            spark.range(e * batch, (e + 1) * batch, 1, 8)
            .select(
                F.concat(
                    F.lit("https://h"), (F.col("id") % 997).cast("string"),
                    F.lit(".example.com/p"), (F.col("id") + salt).cast("string"),
                ).alias("url_canon")
            )
        )

    # the big Bloom: geometry for n_keys, seeded with one batch (the
    # bit-array SIZE, not its fill, is what the fold cost depends on)
    base = build_bloom(batch_df(0, 0), expected_items=n_keys)
    probe_src = batch_df(1, 10_000_000).cache()
    probe_src.count()

    def run_probe(bloom, hot=None) -> None:
        probe_bloom(probe_src, bloom, hot=hot).where(F.col("maybe_seen")).count()

    # warm-up: JIT, python workers, broadcast machinery
    run_probe(base)

    # --- A: fold every epoch
    t0 = time.perf_counter()
    bloom_a = base
    for e in range(epochs):
        delta = build_bloom(batch_df(e, 1), "url_canon", like=bloom_a)
        bloom_a = bloom_a.merge(delta)  # O(filter-size) + new broadcast
        run_probe(bloom_a)
    a_sec = time.perf_counter() - t0

    # --- B: hot tier, one fold at the end
    t0 = time.perf_counter()
    bloom_b = base
    hot = None
    for e in range(epochs):
        delta_hot = build_cuckoo(
            batch_df(e, 2), "url_canon",
            like=hot if hot is not None else None,
            expected_items=batch * epochs * 2,
        )
        hot = delta_hot if hot is None else hot.merge(delta_hot)
        run_probe(bloom_b, hot=hot)  # big Bloom broadcast stays memoized
    # the amortized fold (in the engine this reads the frontier rows
    # newer than the last fold; here the union of the batches)
    fold_src = batch_df(0, 2)
    for e in range(1, epochs):
        fold_src = fold_src.unionByName(batch_df(e, 2))
    bloom_b = bloom_b.merge(build_bloom(fold_src, "url_canon", like=bloom_b))
    b_sec = time.perf_counter() - t0

    print(json.dumps({
        "fold_every_epoch_sec": round(a_sec, 2),
        "hot_tier_sec": round(b_sec, 2),
        "speedup": round(a_sec / b_sec, 2),
        "bloom_keys": n_keys,
        "batch": batch,
        "epochs": epochs,
        "cpus": cpus,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
