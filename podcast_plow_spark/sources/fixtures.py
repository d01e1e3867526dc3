"""Deterministic crawl fixtures at parametric scale.

Mirrors the *structure* of the reference's offline fixtures
(``infra/feeds.txt``, ``infra/sample_feeds/*.xml`` — seed list + RSS
files with guid/pubDate/description/link/enclosure/itunes:duration)
without copying their content, and at any scale.

Layout::

    root/
      feeds.txt                            seed list (comments + blanks)
      sites/<host>/feed.xml                RSS per feed host
      sites/<host>/robots.txt              RFC 9309 rules per host

Feed entries reference *images*: each entry's enclosure URL points at
``https://<imghost>/images/img-<n>`` and the entry title embeds the
image caption. A deliberate share of image URLs:

- carry tracking params (exercises the canonicalizer),
- repeat across feeds (exercises the URL-seen filter),
- live under ``/images/private/`` (disallowed by robots),
- concentrate on one hot CDN host (exercises skew salting),
- alternate guid-present / guid-absent (exercises the
  guid-else-url identity key, reference server/ingest/feeds.py:154-159).

Everything is a pure function of (seed, n_feeds, entries_per_feed) —
no wall clock, no RNG state leaks.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

__all__ = ["FixtureSpec", "make_fixtures", "feed_host", "image_host", "CDN_HOST"]

CDN_HOST = "cdn0000.example.com"


def feed_host(i: int) -> str:
    return f"host{i:04d}.example.com"


def image_host(feed_idx: int, entry_idx: int, n_image_hosts: int, hot_fraction: float) -> str:
    """Image host assignment with planted skew: ``hot_fraction`` of all
    images land on CDN_HOST, the rest spread across n_image_hosts."""
    slot = (feed_idx * 131 + entry_idx * 17) % 1000
    if slot < int(hot_fraction * 1000):
        return CDN_HOST
    return f"img{(feed_idx * 7 + entry_idx) % n_image_hosts:03d}.example.com"


@dataclass
class FixtureSpec:
    root: str
    n_feeds: int = 4
    entries_per_feed: int = 6
    n_image_hosts: int = 4
    hot_fraction: float = 0.4
    dup_every: int = 5          # every 5th entry re-uses an earlier image URL
    private_every: int = 7      # every 7th entry is robots-disallowed
    crawl_delay_sec: float = 1.0
    image_ids: list[str] = field(default_factory=list)  # filled by make_fixtures


def _entry_xml(spec: FixtureSpec, feed_idx: int, entry_idx: int) -> tuple[str, str, str]:
    """Returns (xml, image_url, image_id) for one feed entry."""
    global_idx = feed_idx * spec.entries_per_feed + entry_idx
    if spec.dup_every and global_idx > 0 and global_idx % spec.dup_every == 0:
        src_idx = global_idx - spec.dup_every  # repeat an earlier image
    else:
        src_idx = global_idx
    image_id = f"img-{src_idx:08d}"
    host = image_host(src_idx // spec.entries_per_feed, src_idx % spec.entries_per_feed,
                      spec.n_image_hosts, spec.hot_fraction)
    # URL shape must be a pure function of src_idx so a repeated image
    # yields the *identical* URL (the seen-filter's job is to collapse it)
    path = "images/private" if (spec.private_every and src_idx % spec.private_every == 3) else "images"
    # tracking params + uppercase host on some URLs to exercise canonicalization
    noise = "?utm_source=rss&amp;ref=feed" if src_idx % 3 == 0 else ""
    url_host = host.upper() if src_idx % 4 == 1 else host
    image_url = f"https://{url_host}/{path}/{image_id}{noise}"
    guid = f"<guid>g-{feed_idx:04d}-{entry_idx:04d}</guid>" if global_idx % 3 != 2 else ""
    day = (global_idx % 27) + 1
    xml = f"""    <item>
      <title>caption for {image_id}</title>
      {guid}
      <pubDate>{day:02d} Jan 2024 0{global_idx % 10}:00:00 GMT</pubDate>
      <description><![CDATA[entry {entry_idx} of feed {feed_idx}]]></description>
      <link>https://{feed_host(feed_idx)}/ep/{entry_idx}</link>
      <enclosure url="{image_url}" type="image/x-synthetic" length="100" />
      <itunes:duration>00:{(global_idx % 50) + 10:02d}:00</itunes:duration>
    </item>"""
    return xml, image_url, image_id


def make_fixtures(spec: FixtureSpec) -> FixtureSpec:
    os.makedirs(spec.root, exist_ok=True)
    seed_lines = ["# synthetic seed list", ""]
    image_ids: list[str] = []
    for i in range(spec.n_feeds):
        host = feed_host(i)
        site = os.path.join(spec.root, "sites", host)
        os.makedirs(site, exist_ok=True)
        items = []
        for j in range(spec.entries_per_feed):
            xml, _url, img_id = _entry_xml(spec, i, j)
            items.append(xml)
            image_ids.append(img_id)
        feed_xml = f"""<?xml version="1.0" encoding="UTF-8"?>
<rss version="2.0" xmlns:itunes="http://www.itunes.com/dtds/podcast-1.0.dtd">
  <channel>
    <title>Synthetic Feed {i}</title>
    <link>https://{host}/</link>
    <description>fixture feed {i}</description>
{chr(10).join(items)}
  </channel>
</rss>
"""
        with open(os.path.join(site, "feed.xml"), "w") as fh:
            fh.write(feed_xml)
        seed_lines.append(f"https://{host}/feed.xml")
    # robots for every host that can appear in an image URL
    img_hosts = {CDN_HOST} | {f"img{k:03d}.example.com" for k in range(spec.n_image_hosts)}
    for host in img_hosts | {feed_host(i) for i in range(spec.n_feeds)}:
        site = os.path.join(spec.root, "sites", host)
        os.makedirs(site, exist_ok=True)
        with open(os.path.join(site, "robots.txt"), "w") as fh:
            fh.write(
                "User-agent: *\n"
                "Disallow: /images/private/\n"
                f"Crawl-delay: {spec.crawl_delay_sec}\n"
                "\n"
                "User-agent: plow-spark\n"
                "Disallow: /images/private/\n"
                "Allow: /images/private/allowed-*\n"
            )
    with open(os.path.join(spec.root, "feeds.txt"), "w") as fh:
        fh.write("\n".join(seed_lines) + "\n")
    spec.image_ids = sorted(set(image_ids))
    return spec


def transport_path(root: str, url: str) -> str | None:
    """Map a fixture URL to its local file — the test-time stand-in for
    HTTP (precedent: the reference's file:// fetch support,
    server/ingest/transcripts.py:69-100)."""
    from urllib.parse import urlparse

    p = urlparse(url)
    host = p.netloc.split(":")[0].lower()
    path = p.path.lstrip("/") or "index.html"
    candidate = os.path.join(root, "sites", host, path)
    return candidate if os.path.exists(candidate) else None
