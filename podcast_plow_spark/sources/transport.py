"""Fetch transports: the HTTP stage behind the fixture interface.

The reference fetches with ``requests`` using hardcoded timeouts and a
shared session (HTML 20 s — ``server/ingest/youtube.py:94``,
``server/ingest/transcripts.py:92``; API 30 s ``REQUEST_TIMEOUT`` —
``server/services/evidence.py:286``). This sandbox has no network, so
the engine runs on :class:`FileTransport` fixtures — but the HTTP
path ships behind the SAME interface with an injectable session
factory, so tests stay offline and a real cluster flips one config.

Design (P3/P4/P7):

- :class:`FetchResult` — (url, status, body, error); transports never
  raise: a failed fetch is a failed ROW (the frontier's mark_failed
  backoff handles it), never a failed task.
- :class:`FileTransport` — fixture files via
  ``sources.fixtures.transport_path``.
- :class:`HttpTransport` — one ``requests.Session`` per instance
  (instances are per python worker → connection pooling per executor),
  User-Agent pinned, 20 s/30 s timeouts by request kind.
- :func:`fetch_stage` — vectorized mapInPandas fetch honoring the
  politeness schedule: rows carry ``fetch_offset_sec`` (from
  ``operators.politeness.schedule_fetches``); the worker tracks an
  elapsed clock and waits out each row's offset before fetching. The
  wait actually applied is emitted as ``waited_sec`` so politeness is
  observable/testable without real sleeping (fake-clock mode).

Transports are constructed ON the executors (sessions don't pickle):
``fetch_stage`` takes a spec tuple and caches one live transport per
worker process.
"""

from __future__ import annotations

import time
from collections.abc import Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame

__all__ = ["FetchResult", "FileTransport", "HttpTransport", "fetch_stage"]

#: reference timeouts (BASELINE.md): HTML fetch 20 s, API fetch 30 s
HTML_TIMEOUT_SEC = 20.0
API_TIMEOUT_SEC = 30.0


@dataclass(frozen=True)
class FetchResult:
    url: str
    status: int  # HTTP status; -1 = transport error; 404 = not found
    body: bytes | None
    error: str | None = None


class FileTransport:
    """Fixture transport — the offline stand-in for HTTP (precedent:
    the reference's file:// support, server/ingest/transcripts.py:69-100)."""

    def __init__(self, fixtures_root: str):
        self.fixtures_root = fixtures_root

    def fetch(self, url: str, kind: str = "html") -> FetchResult:
        from podcast_plow_spark.sources.fixtures import transport_path

        path = transport_path(self.fixtures_root, url)
        if path is None:
            return FetchResult(url, 404, None, "not found")
        try:
            with open(path, "rb") as fh:
                return FetchResult(url, 200, fh.read())
        except OSError as e:  # a vanished/corrupt fixture fails the row
            return FetchResult(url, -1, None, f"{type(e).__name__}: {e}")


class HttpTransport:
    """requests.Session transport with the reference's politeness
    surface: pinned User-Agent (P4), 20 s HTML / 30 s API timeouts
    (P3), one pooled session per instance (P7 connection reuse).

    ``session_factory`` is injectable so unit tests drive this class
    offline with a fake session; the default imports requests lazily
    (absent from some containers)."""

    def __init__(self, user_agent: str = "plow-spark", session_factory=None):
        if session_factory is None:
            try:
                import requests
            except ImportError as e:  # pragma: no cover - env dependent
                raise RuntimeError(
                    "HttpTransport needs the 'requests' package; use FileTransport offline"
                ) from e
            session_factory = requests.Session
        self._session = session_factory()
        self.user_agent = user_agent
        headers = getattr(self._session, "headers", None)
        if headers is not None:
            headers["User-Agent"] = user_agent

    def fetch(self, url: str, kind: str = "html") -> FetchResult:
        timeout = API_TIMEOUT_SEC if kind == "api" else HTML_TIMEOUT_SEC
        try:
            r = self._session.get(url, timeout=timeout)
            body = r.content
            return FetchResult(url, int(r.status_code), body)
        except Exception as e:  # noqa: BLE001 — row-level failure by design
            return FetchResult(url, -1, None, f"{type(e).__name__}: {e}")


# one live transport per python worker process, keyed by spec
_WORKER_TRANSPORTS: dict[tuple, object] = {}


def _transport_for(spec: tuple):
    if spec not in _WORKER_TRANSPORTS:
        kind, arg = spec
        if kind == "file":
            _WORKER_TRANSPORTS[spec] = FileTransport(arg)
        elif kind == "http":
            _WORKER_TRANSPORTS[spec] = HttpTransport(user_agent=arg)
        else:
            raise ValueError(f"unknown transport spec {spec!r}")
    return _WORKER_TRANSPORTS[spec]


def fetch_stage(
    batch: DataFrame,
    transport_spec: tuple,
    url_col: str = "url_canon",
    kind_col: str | None = None,
    offset_col: str | None = "fetch_offset_sec",
    real_sleep: bool = True,
) -> DataFrame:
    """Politeness-honoring fetch: one transport per worker, rows
    processed in offset order, each row's ``fetch_offset_sec`` waited
    out against the worker's elapsed clock before fetching.

    ``real_sleep=False`` is fake-clock mode: the wait is computed and
    emitted (``waited_sec``) but not slept — tests assert the
    politeness schedule was honored without wall-clock cost. Output:
    (url, status, body, error, waited_sec).

    Requires the batch to be partitioned so same-host rows are
    co-located (the engine's host_hash clustering) — offsets are
    per-host, and per-host seriality is what politeness means."""
    cols = [url_col] + ([kind_col] if kind_col else []) + ([offset_col] if offset_col else [])
    src = batch.select(*cols)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        transport = _transport_for(transport_spec)
        # Buffer the WHOLE partition before sorting: a partition split
        # across Arrow batches could otherwise deliver a later batch
        # with smaller offsets after `elapsed` has advanced, giving
        # wait=0 and under-spaced fetches (ADVICE r2). A partition is
        # one epoch-batch's slice — bounded by batch_size, not corpus
        # size, so buffering it is safe. `elapsed` tracks scheduled
        # offsets, not fetch duration: offsets are lower bounds on
        # spacing, and a slow fetch only ever ADDS spacing.
        parts = [pdf for pdf in batches if not pdf.empty]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True) if len(parts) > 1 else parts[0]
        if offset_col and offset_col in pdf.columns:
            pdf = pdf.sort_values(offset_col, kind="stable")
        elapsed = 0.0  # worker-local politeness clock (epoch-relative)
        urls = pdf[url_col].tolist()
        kinds = pdf[kind_col].tolist() if kind_col else ["html"] * len(urls)
        offsets = pdf[offset_col].tolist() if offset_col and offset_col in pdf.columns else [0.0] * len(urls)
        out = []
        for url, k, off in zip(urls, kinds, offsets):
            wait = max(0.0, float(off) - elapsed)
            if wait > 0:
                if real_sleep:
                    time.sleep(wait)
                elapsed = float(off)
            res = transport.fetch(url, k)
            out.append(
                {
                    "url": url,
                    "status": res.status,
                    "body": res.body,
                    "error": res.error,
                    "waited_sec": wait,
                }
            )
        yield pd.DataFrame(out)

    return src.mapInPandas(
        run, schema="url string, status int, body binary, error string, waited_sec double"
    )
