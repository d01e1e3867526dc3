"""Sequential reference crawler — the golden oracle.

A pure-Python reimplementation of the reference's crawl semantics
(``server/ingest/feeds.py:217-242`` discover loop + the queue ordering
``server/services/jobs.py:259``), extended with the politeness budget
and robots gate that the distributed engine applies. It shares the
*kernels* (canonicalizer, feed parser, robots evaluator) with the
engine — those are the frozen per-row semantics — while the
*orchestration* is a single sequential loop, which is exactly what
makes it an oracle: its crawl ordering and URL-seen set are trivially
correct, and the distributed engine must match them exactly
(BASELINE.json: "crawl ordering + URL-seen set must match reference").

Ordering contract (SURVEY.md §3.1): URLs are dequeued in
``(priority DESC, run_at ASC, seq ASC)`` order with a per-host
per-epoch cap; discovered candidates are enqueued in
``(parent_seq, entry_pos)`` order, first occurrence wins.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from urllib.parse import urlparse

from podcast_plow_spark.functions.urls import (
    canonicalize_url,
    extract_host,
    image_id_from_url,
    url_kind,
)
from podcast_plow_spark.operators.politeness import parse_robots, robots_allowed
from podcast_plow_spark.sources.feeds import _parse_one_feed
from podcast_plow_spark.sources.fixtures import transport_path

__all__ = ["OracleResult", "sequential_crawl"]


@dataclass
class OracleResult:
    crawl_order: list[str] = field(default_factory=list)   # url_canon, dequeue order
    seen: set[str] = field(default_factory=set)            # canonical URL-seen set
    fetched_images: list[str] = field(default_factory=list)  # image_ids, fetch order
    epochs: int = 0


# kind / image_id come from the SAME kernels the engine uses
# (functions/urls.py) — engine and oracle cannot drift.
_kind = url_kind


def sequential_crawl(
    fixtures_root: str,
    user_agent: str = "plow-spark",
    batch_size: int = 64,
    per_host_cap: int = 2,
    max_epochs: int = 100,
) -> OracleResult:
    res = OracleResult()

    # seeds in file order (reference server/ingest/feeds.py:17-24)
    seeds: list[str] = []
    with open(os.path.join(fixtures_root, "feeds.txt")) as fh:
        for raw in fh.read().splitlines():
            line = raw.strip()
            if line and not line.startswith("#"):
                seeds.append(line)

    robots_cache: dict[str, list[tuple[bool, str]]] = {}

    def allowed(url_canon: str, host: str) -> bool:
        if host not in robots_cache:
            path = transport_path(fixtures_root, f"https://{host}/robots.txt")
            body = ""
            if path:
                with open(path) as fh:
                    body = fh.read()
            robots_cache[host] = parse_robots(body, user_agent)
        return robots_allowed(robots_cache[host], urlparse(url_canon).path or "/")

    frontier: list[dict] = []
    next_seq = 1
    for url in seeds:
        canon = canonicalize_url(url)
        if canon is None or canon in res.seen:
            continue
        host = extract_host(canon)
        if not allowed(canon, host):
            continue
        frontier.append(
            {"url_canon": canon, "host": host, "priority": 0, "run_at": 0, "seq": next_seq, "status": "queued"}
        )
        res.seen.add(canon)
        next_seq += 1

    for epoch in range(max_epochs):
        runnable = [r for r in frontier if r["status"] == "queued" and r["run_at"] <= epoch]
        runnable.sort(key=lambda r: (-r["priority"], r["run_at"], r["seq"]))
        batch: list[dict] = []
        host_counts: dict[str, int] = {}
        for r in runnable:
            if len(batch) >= batch_size:
                break
            if host_counts.get(r["host"], 0) >= per_host_cap:
                continue
            host_counts[r["host"]] = host_counts.get(r["host"], 0) + 1
            batch.append(r)
        if not batch:
            break
        res.epochs = epoch + 1

        candidates: list[tuple[int, int, str]] = []  # (parent_seq, entry_pos, url)
        for r in batch:
            res.crawl_order.append(r["url_canon"])
            r["status"] = "finished"
            if _kind(r["url_canon"]) == "feed":
                path = transport_path(fixtures_root, r["url_canon"])
                if path is None:
                    continue
                with open(path, encoding="utf-8") as fh:
                    entries = _parse_one_feed(r["url_canon"], fh.read())
                for e in entries:
                    if e["parse_error"] is None and e["enclosure_url"]:
                        candidates.append((r["seq"], e["entry_pos"], e["enclosure_url"]))
            else:
                image_id = image_id_from_url(r["url_canon"])
                res.fetched_images.append(image_id)

        candidates.sort(key=lambda t: (t[0], t[1]))
        for _parent_seq, _pos, url in candidates:
            canon = canonicalize_url(url)
            if canon is None or canon in res.seen:
                continue
            host = extract_host(canon)
            if not allowed(canon, host):
                continue
            frontier.append(
                {"url_canon": canon, "host": host, "priority": 0, "run_at": 0, "seq": next_seq, "status": "queued"}
            )
            res.seen.add(canon)
            next_seq += 1

    return res
