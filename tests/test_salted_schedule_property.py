"""Property test (hypothesis): the salted politeness schedule keeps
every per-host budget for ARBITRARY batches, salt counts and delays.

The proof sketch in ``schedule_fetches``'s docstring says lane ``s``
fetches at offsets ``(s + j·n_salts) × spacing`` — distinct slots on
the per-host spacing grid, hence any two same-host fetches are
≥ spacing apart. This test checks the implementation against randomly
generated batches instead of trusting the sketch, and checks the cold
hosts (1 lane) are byte-identical to the un-salted schedule.

Kept Spark-light: one parametrized DataFrame per hypothesis example
would be slow, so hypothesis drives a SINGLE pooled example set
(deadline=None, max_examples small) — the properties are structural,
not statistical.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from podcast_plow_spark.operators.politeness import salt_hot_hosts, schedule_fetches

hosts_st = st.lists(
    st.tuples(
        st.sampled_from(["a.com", "b.com", "hot.com", "c.com"]),
        st.integers(min_value=1, max_value=60),  # rows for this host
    ),
    min_size=1,
    max_size=4,
    unique_by=lambda t: t[0],
)


@settings(max_examples=12, deadline=None)
@given(
    hosts=hosts_st,
    n_salts=st.integers(min_value=2, max_value=8),
    delay=st.sampled_from([0.34, 1.0, 2.5]),
    threshold=st.integers(min_value=5, max_value=40),
)
def test_salted_schedule_budget_and_cold_parity(spark_global, hosts, n_salts, delay, threshold):
    spark = spark_global
    rows, rank = [], 0
    for host, n in hosts:
        for _ in range(n):
            rank += 1
            rows.append((host, f"https://{host}/p{rank}", rank))
    df = spark.createDataFrame(rows, "host string, url_canon string, crawl_rank long")

    salted = salt_hot_hosts(df, hot_threshold=threshold, n_salts=n_salts)
    sched = schedule_fetches(
        salted, crawl_delay_sec=delay, salt_col="host_salt", n_salts_col="host_salts"
    ).collect()
    plain = {
        (r["host"], r["crawl_rank"]): r["fetch_offset_sec"]
        for r in schedule_fetches(df, crawl_delay_sec=delay).collect()
    }

    by_host: dict = {}
    hot_hosts = {h for h, n in hosts if n >= threshold}
    for r in sched:
        by_host.setdefault(r["host"], []).append(r["fetch_offset_sec"])
        if r["host"] not in hot_hosts:
            # cold rows: salt 0, 1 lane → byte-identical to un-salted
            assert r["fetch_offset_sec"] == plain[(r["host"], r["crawl_rank"])]

    for host, offs in by_host.items():
        offs.sort()
        # distinct spacing-grid slots ⇒ min gap ≥ delay (per host)
        for a, b in zip(offs, offs[1:]):
            assert b - a >= delay - 1e-9, (host, offs)


# session-scoped spark fixture alias (conftest provides `spark`;
# hypothesis forbids function-scoped fixtures inside @given, so bind
# the session-scoped one under a distinct name)
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def spark_global(spark):
    return spark
