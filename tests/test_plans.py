"""Physical-plan audits — the ".explain and iterate" discipline frozen
as tests. Each assertion pins a plan property that matters at 100 TB:
pushdown reaching the scan, column pruning, broadcast joins on small
dims, TakeOrderedAndProject for top-K, no exchange under the
politeness window on a clustered frontier."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_parquet_scan(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    df = li.where(F.col("l_shipdate") > "1999-01-01").select("l_orderkey", "l_quantity")
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), GreaterThan(l_shipdate" in plan, plan


def test_column_pruning_narrows_read_schema(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    df = li.select("l_orderkey", "l_quantity")
    plan = _plan(df)
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in plan, plan


def test_small_dim_join_is_broadcast(spark):
    import __spark_entry__ as m

    df = m.q_orders_with_nation(spark, SF)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan, plan


def test_dequeue_is_take_ordered_not_global_sort(spark):
    import datetime as dt

    from podcast_plow_spark.operators import frontier as fr

    cand = spark.createDataFrame(
        [(f"u{i}", f"u{i}", "h.com", f"f{i}", i % 3, i) for i in range(100)],
        "url string, url_canon string, host string, fingerprint string, priority int, seq_key long",
    )
    frontier = fr.enqueue(cand, epoch=0)
    batch = frontier.where(F.col("status") == "queued").orderBy(*fr.DEQUEUE_ORDER()).limit(5)
    plan = _plan(batch)
    assert "TakeOrderedAndProject" in plan, plan


def test_politeness_window_needs_no_exchange_on_clustered_frontier(spark):
    from pyspark.sql import Window

    from podcast_plow_spark.crawl.bench import synthetic_frontier
    from podcast_plow_spark.operators import frontier as fr

    raw = synthetic_frontier(spark, 10_000, 8).withColumn("url_canon", F.col("url")).withColumn(
        "fingerprint", F.sha2(F.col("url"), 256)
    )
    frontier = fr.cluster_by_host(fr.enqueue(raw, epoch=0, seq_mode="keyed"), 8).cache()
    frontier.count()
    w = Window.partitionBy("host").orderBy(*fr.DEQUEUE_ORDER())
    eligible = frontier.withColumn("__hr", F.row_number().over(w))
    plan = _plan(eligible)
    # the only Exchange allowed is inside the cached build plan
    above_cache = plan.split("InMemoryRelation")[0]
    assert "Exchange" not in above_cache, above_cache
    frontier.unpersist()


def test_exact_seen_backstop_uses_broadcast_not_shuffle(spark):
    from podcast_plow_spark.operators.seen import build_bloom, seen_filter_exact

    seen = spark.createDataFrame([(f"https://h{i}.com/p",) for i in range(2000)], "url_canon string")
    cand = spark.createDataFrame([(f"https://h{i}.com/p",) for i in range(1500, 2500)], "url_canon string")
    bloom = build_bloom(seen, expected_items=2000)
    unseen, _ = seen_filter_exact(cand, seen, bloom)
    plan = _plan(unseen)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_grade_aggregation_is_whole_stage_codegen(spark):
    import __spark_entry__ as m

    df = m.q_grade_claims(spark, SF)
    plan = _plan(df)
    assert "HashAggregate" in plan, plan  # conditional-count agg, no pivot shuffle
    assert "Expand" not in plan, plan  # no pivot-style row expansion
