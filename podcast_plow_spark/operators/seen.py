"""Distributed URL-seen filter: per-partition blocked Bloom filters
merged via ``treeAggregate``, with an exact anti-join backstop
(north rule; SURVEY.md §2.5 note, §4.2).

Reference semantics are **exact** keyed lookups (podcast by rss_url,
episode by guid-else-url, job by fingerprint — reference
``server/ingest/feeds.py:154-159``, ``server/services/jobs.py:166-182``),
so the Bloom filter is only a shuffle-reduction fast path: candidates
that the filter rules out are definitively unseen (no false
negatives); candidates it flags are verified by the exact anti-join.
The final seen set is therefore always exact.

Blocked layout: the bit array is split into 512-bit (8×u64) blocks;
all k probe bits of a key land in one block (cache-friendly, and
mergeable by plain OR). Hash mixing is splitmix64 on the int64 key —
engine-independent and cluster-size invariant.

``bloom_fpr`` is measured per probe-partition and lands in the
lineage table (partition_id, batch_epoch, urls_in, urls_out,
bloom_fpr) per the north rule.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "BloomFilter",
    "ShardedBloom",
    "build_bloom",
    "build_sharded_bloom",
    "probe_bloom",
    "seen_filter_exact",
]

_BLOCK_WORDS = 8  # 8 × 64 = 512-bit blocks


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    x ^= x >> np.uint64(30)
    x = (x * np.uint64(0xBF58476D1CE4E5B9)).astype(np.uint64)
    x ^= x >> np.uint64(27)
    x = (x * np.uint64(0x94D049BB133111EB)).astype(np.uint64)
    x ^= x >> np.uint64(31)
    return x


class BloomFilter:
    """Numpy-backed blocked Bloom filter (value object, broadcastable)."""

    def __init__(self, n_blocks: int, k: int = 6, words: np.ndarray | None = None):
        self.n_blocks = n_blocks
        self.k = k
        self.words = words if words is not None else np.zeros(n_blocks * _BLOCK_WORDS, dtype=np.uint64)

    @classmethod
    def sized_for(cls, expected_items: int, bits_per_item: int = 12, k: int = 6) -> "BloomFilter":
        total_bits = max(1024, expected_items * bits_per_item)
        n_blocks = int(np.ceil(total_bits / (_BLOCK_WORDS * 64)))
        return cls(n_blocks, k)

    def _positions(self, keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """block index (n,) and k bit offsets within block (n, k)."""
        h1 = _splitmix64(keys.astype(np.uint64))
        h2 = _splitmix64(h1)
        block = (h1 % np.uint64(self.n_blocks)).astype(np.uint64)
        i = np.arange(self.k, dtype=np.uint64)[None, :]
        bit = (h2[:, None] + i * _splitmix64(h2)[:, None]) % np.uint64(_BLOCK_WORDS * 64)
        return block, bit

    def add_many(self, keys: np.ndarray) -> None:
        if len(keys) == 0:
            return
        block, bit = self._positions(keys)
        word_idx = block[:, None] * np.uint64(_BLOCK_WORDS) + bit // np.uint64(64)
        masks = np.uint64(1) << (bit % np.uint64(64))
        np.bitwise_or.at(self.words, word_idx.ravel(), masks.ravel())

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        block, bit = self._positions(keys)
        word_idx = block[:, None] * np.uint64(_BLOCK_WORDS) + bit // np.uint64(64)
        masks = np.uint64(1) << (bit % np.uint64(64))
        return ((self.words[word_idx] & masks) == masks).all(axis=1)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert self.n_blocks == other.n_blocks and self.k == other.k
        return BloomFilter(self.n_blocks, self.k, self.words | other.words)

    def broadcast_on(self, spark) -> "object":
        """Memoized Spark broadcast of this filter's payload — probing
        every epoch against an unchanged filter re-ships megabytes of
        bit array otherwise (a flat, serial per-epoch cost). The words
        array is treated as immutable once broadcast (mutating builders
        use add_many BEFORE any probe; merge() returns a NEW object)."""
        bc = getattr(self, "_bc", None)
        if bc is None:
            bc = spark.sparkContext.broadcast((self.n_blocks, self.k, self.words))
            self._bc = bc
        return bc


class ShardedBloom:
    """Blocked Bloom sharded by the frontier's host-hash bucket — the
    10^10 design point of BENCH/SCALE_DESIGN.md made code: a
    monolithic filter at 10^10 URLs × 12 bits is ~15 GB, too large to
    broadcast whole, but the frontier (and every candidate batch, via
    politeness host co-location) is bucketed by ``crc32(host) %
    n_shards`` — so shard s only ever serves probes for bucket s's
    hosts, and an executor working bucket s needs ~15 GB / n_shards.

    In local mode all shards ride one broadcast (same total bytes as
    the monolith); the sharding is the PLACEMENT story plus the
    geometry story (each shard is sized for its keys, so saturation
    in one hot bucket never degrades the other shards' fpr).
    Interface-compatible with :class:`BloomFilter` where it matters:
    ``merge`` (shard-wise OR) and membership via
    :func:`probe_bloom`, which derives each key's bucket JVM-side.
    """

    def __init__(self, n_shards: int, shards: "dict[int, BloomFilter]", k: int = 6):
        self.n_shards = n_shards
        self.shards = shards
        self.k = k

    def merge(self, other: "ShardedBloom") -> "ShardedBloom":
        assert self.n_shards == other.n_shards
        merged: dict[int, BloomFilter] = dict(self.shards)
        for s, bf in other.shards.items():
            merged[s] = merged[s].merge(bf) if s in merged else bf
        return ShardedBloom(self.n_shards, merged, self.k)

    def contains_many(self, keys: np.ndarray, buckets: np.ndarray) -> np.ndarray:
        """Vectorized probe: group keys by bucket, probe each group
        against its shard. A bucket with no shard (no seen URLs from
        those hosts yet) is definitively unseen."""
        out = np.zeros(len(keys), dtype=bool)
        for s in np.unique(buckets):
            bf = self.shards.get(int(s))
            if bf is None:
                continue
            idx = np.nonzero(buckets == s)[0]
            out[idx] = bf.contains_many(keys[idx])
        return out

    def broadcast_on(self, spark) -> "object":
        bc = getattr(self, "_bc", None)
        if bc is None:
            payload = {s: (bf.n_blocks, bf.k, bf.words) for s, bf in self.shards.items()}
            bc = spark.sparkContext.broadcast((self.n_shards, payload))
            self._bc = bc
        return bc


def _host_bucket_col(url_col: str, n_shards: int) -> F.Column:
    """Shard id from a URL column: same crc32-of-host bucketing as the
    frontier's ``host_hash`` layout (functions/urls.py:host_hash_col),
    so shard s of the filter aligns with bucket s of the frontier."""
    host = F.coalesce(F.parse_url(F.col(url_col), F.lit("HOST")), F.lit(""))
    return F.pmod(F.crc32(F.encode(host, "utf-8")), F.lit(n_shards)).cast("int")


def build_sharded_bloom(
    seen: DataFrame,
    key_col: str = "url_canon",
    n_shards: int = 16,
    expected_items: int | None = None,
    k: int = 6,
    bits_per_item: int = 12,
    like: "ShardedBloom | None" = None,
) -> ShardedBloom:
    """Per-host-bucket Bloom shards, built in one distributed pass:
    each input partition builds partial shards for the buckets it
    holds (emitting (shard, words) rows), and partials are OR-merged
    per shard with ``reduceByKey`` — the driver receives n_shards
    merged shards, never P partials. ``like`` pins shard geometry for
    incremental maintenance (build over an epoch's insertions only,
    then ``merge``)."""
    if like is not None:
        n_shards = like.n_shards
        geom = {s: (bf.n_blocks, bf.k) for s, bf in like.shards.items()}
        default_geom = next(iter(geom.values())) if geom else None
    else:
        geom = {}
        default_geom = None
    if default_geom is None:
        n = expected_items or seen.count()
        proto = BloomFilter.sized_for(max(1, n // n_shards), bits_per_item=bits_per_item, k=k)
        default_geom = (proto.n_blocks, proto.k)

    def part_shards(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        partial: dict[int, BloomFilter] = {}
        for pdf in batches:
            if not len(pdf):
                continue
            ks = pdf["__k"].to_numpy(dtype=np.int64).astype(np.uint64) % np.uint64(2**63)
            bs = pdf["__b"].to_numpy(dtype=np.int64)
            for s in np.unique(bs):
                nb, kk = geom.get(int(s), default_geom)
                bf = partial.setdefault(int(s), BloomFilter(nb, kk))
                bf.add_many(ks[bs == s])
        yield pd.DataFrame(
            {"shard": list(partial), "words": [bf.words.tobytes() for bf in partial.values()]}
        )

    keys_df = seen.select(
        _key_col(key_col).alias("__k"), _host_bucket_col(key_col, n_shards).alias("__b")
    )
    if keys_df.rdd.getNumPartitions() > 32:
        keys_df = keys_df.coalesce(32)
    parts = keys_df.mapInPandas(part_shards, "shard int, words binary")
    merged = (
        parts.rdd.map(lambda r: (r["shard"], np.frombuffer(r["words"], dtype=np.uint64)))
        .reduceByKey(lambda a, b: a | b)
        .collect()
    )
    shards = {
        int(s): BloomFilter(geom.get(int(s), default_geom)[0], geom.get(int(s), default_geom)[1], w.copy())
        for s, w in merged
    }
    return ShardedBloom(n_shards, shards, k)


def _key_col(col: str) -> F.Column:
    """int64 key from a string column — first 15 sha256 hex chars
    (engine-independent, same discipline as the dedup family)."""
    return F.conv(F.substring(F.sha2(F.col(col), 256), 1, 15), 16, 10).cast("long")


def build_bloom(
    seen: DataFrame,
    key_col: str = "url_canon",
    expected_items: int | None = None,
    k: int = 6,
    bits_per_item: int = 12,
    like: "BloomFilter | None" = None,
) -> BloomFilter:
    """Per-partition blocked Blooms built in mapPartitions, merged via
    ``treeAggregate`` (logarithmic merge depth — at 10^10 keys the
    driver receives O(log P) partial filters, not P).

    ``like`` builds with another filter's geometry so the result can be
    merged into it (incremental maintenance: per epoch, build over only
    the epoch's insertions and OR into the running filter — never
    re-scan the full seen set)."""
    if like is not None:
        n_blocks, kk = like.n_blocks, like.k
    else:
        n = expected_items or seen.count()
        proto = BloomFilter.sized_for(n, bits_per_item=bits_per_item, k=k)
        n_blocks, kk = proto.n_blocks, proto.k

    def comb_op(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        return a | b

    # Arrow-vectorized partial blooms: each partition builds ONE filter
    # over all its Arrow batches (numpy bulk insert), emitting a single
    # binary row; the tiny per-partition results are tree-merged.
    def part_bloom(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bf = BloomFilter(n_blocks, kk)
        for pdf in batches:
            if len(pdf):
                bf.add_many(pdf["__k"].to_numpy(dtype=np.int64).astype(np.uint64) % np.uint64(2**63))
        yield pd.DataFrame({"words": [bf.words.tobytes()]})

    # ≤ 32 build partitions: each partial filter is n_blocks×64B, so
    # fewer, larger partials cut task + serialization overhead while
    # treeAggregate still bounds what any single node merges
    keys_df = seen.select(_key_col(key_col).alias("__k"))
    if keys_df.rdd.getNumPartitions() > 32:
        keys_df = keys_df.coalesce(32)
    parts = keys_df.mapInPandas(part_bloom, "words binary")
    words = (
        parts.rdd.map(lambda r: np.frombuffer(r["words"], dtype=np.uint64))
        .treeAggregate(np.zeros(n_blocks * _BLOCK_WORDS, dtype=np.uint64), comb_op, comb_op, depth=3)
    )
    return BloomFilter(n_blocks, kk, words)


def probe_bloom(
    candidates: DataFrame, bloom: "BloomFilter | ShardedBloom", key_col: str = "url_canon"
) -> DataFrame:
    """Adds ``maybe_seen`` (bloom positive). Definite negatives skip the
    exact join entirely.

    The Python stage is a SCALAR pandas UDF over the int64 key column
    only: Arrow moves one long column in and one boolean out, instead
    of round-tripping every candidate column through Python (the old
    mapInPandas form serialized the full wide row both ways — ~8× the
    Arrow bytes for a one-column computation). The key itself is
    computed JVM-side (sha2+conv), so Python work is pure numpy
    bit-probing. With a :class:`ShardedBloom`, the key's host bucket
    is ALSO computed JVM-side and the probe touches only that shard."""
    spark = candidates.sparkSession
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BooleanType

    bc = bloom.broadcast_on(spark)

    if isinstance(bloom, ShardedBloom):

        @pandas_udf(BooleanType())
        def probe_sharded(keys: pd.Series, buckets: pd.Series) -> pd.Series:
            n_shards, payload = bc.value
            sb = ShardedBloom(
                n_shards, {s: BloomFilter(nb, kk, w) for s, (nb, kk, w) in payload.items()}
            )
            ks = keys.to_numpy(dtype=np.int64).astype(np.uint64) % np.uint64(2**63)
            return pd.Series(sb.contains_many(ks, buckets.to_numpy(dtype=np.int64)))

        return candidates.withColumn(
            "maybe_seen",
            probe_sharded(_key_col(key_col), _host_bucket_col(key_col, bloom.n_shards)),
        )

    @pandas_udf(BooleanType())
    def probe(keys: pd.Series) -> pd.Series:
        n_blocks, k, words = bc.value
        bf = BloomFilter(n_blocks, k, words)
        ks = keys.to_numpy(dtype=np.int64).astype(np.uint64) % np.uint64(2**63)
        return pd.Series(bf.contains_many(ks))

    return candidates.withColumn("maybe_seen", probe(_key_col(key_col)))


def seen_filter_exact(
    candidates: DataFrame,
    seen: DataFrame | None,
    bloom: "BloomFilter | ShardedBloom | None" = None,
    key_col: str = "url_canon",
    measure_fpr: bool = False,
    cache_registry: "list[DataFrame] | None" = None,
) -> tuple[DataFrame, DataFrame | None]:
    """Returns (unseen_candidates, fpr_stats-or-None).

    Path: bloom probe → definite-unseen bypass ∪ (maybe-seen ∖ exact
    anti-join). With ``measure_fpr`` the per-partition (urls_in,
    bloom_pos, false_pos) stats for lineage are computed — this runs
    extra actions, so it's opt-in (the engine turns it on; the
    throughput bench leaves it off). With no bloom, plain anti-join.

    ``cache_registry``: when given, the probed-candidates DataFrame is
    cached and the handle appended for the CALLER to unpersist after
    materializing the result. Without it, the broadcast subjobs
    (maybe_keys, hits) and the main job each re-evaluate the candidate
    subtree — for UDF-synthesized candidates that's the canonicalize +
    probe python stages run 3×, a measured ~30% of the epoch.
    """
    if seen is None or bloom is None:
        if seen is None:
            unseen = candidates
        else:
            unseen = candidates.join(seen.select(key_col).distinct(), key_col, "left_anti")
        return unseen, None

    probed = probe_bloom(candidates, bloom, key_col)
    if measure_fpr or cache_registry is not None:
        probed = probed.cache()
        # Materialize NOW: the maybe_keys/hits broadcast exchanges
        # below execute as concurrent async subjobs of the caller's
        # action, and Spark cache fills are not locked — racing
        # readers of a cold cache each recompute the full candidate
        # subtree (canonicalize + probe UDFs ran 2× per epoch,
        # verified in SQL-node metrics). One narrow count here pins
        # the cache before any branch can race.
        probed.count()
        if cache_registry is not None:
            cache_registry.append(probed)
    definite_new = probed.where(~F.col("maybe_seen")).drop("maybe_seen")
    maybe = probed.where(F.col("maybe_seen")).drop("maybe_seen")
    # Exact backstop WITHOUT shuffling the (huge) seen side: the Bloom
    # already shrank `maybe` to (true dupes + false positives), so
    #   hits      = seen ⋉ broadcast(maybe)   — seen streamed map-side
    #   truly_new = maybe ▷ broadcast(hits)   — hits ≤ |maybe|, tiny
    # Two broadcast joins, zero shuffle of the frontier. (A plain
    # maybe ▷ seen anti-join would shuffle all 10^10 seen keys every
    # epoch — the Bloom exists precisely to prevent that.)
    maybe_keys = maybe.select(key_col)
    hits = seen.select(key_col).join(F.broadcast(maybe_keys), key_col, "left_semi")
    truly_new = maybe.join(F.broadcast(hits), key_col, "left_anti")
    unseen = definite_new.unionByName(truly_new)

    if not measure_fpr:
        return unseen, None

    stats = (
        probed.withColumn("partition_id", F.spark_partition_id())
        .groupBy("partition_id")
        .agg(
            F.count(F.lit(1)).alias("urls_in"),
            F.sum(F.col("maybe_seen").cast("long")).alias("bloom_pos"),
        )
    )
    fp = truly_new.groupBy().agg(F.count(F.lit(1)).alias("__survived")).collect()[0]["__survived"]
    maybe_n = maybe.count()
    stats = stats.withColumn(
        "false_pos",
        F.when(F.lit(maybe_n) > 0, (F.col("bloom_pos") * F.lit(fp) / F.lit(maybe_n)).cast("long")).otherwise(
            F.lit(0)
        ),
    )
    return unseen, stats
