"""Malformed-feed leniency corpus (VERDICT r4 item 6).

The reference parses with feedparser and drops ANY feed that sets
``bozo`` (server/ingest/feeds.py:221-228 — ``if feed.bozo: continue``,
even when feedparser recovered entries). Our parser is stdlib
``xml.etree`` over BYTES (sources/feeds.py::_to_xml_bytes), so the
accept/reject boundary must track feedparser's. feedparser is not in
this container; each case below documents the feedparser outcome from
its public, stable semantics (bozo on not-well-formed XML /
undeclared entities; BOM and declared-encoding handling via its
byte-level prolog sniffing) and pins which side of the boundary OUR
parser puts the document on.

Legend per case: ``ref=drop`` (feedparser sets bozo → reference skips
the whole feed) / ``ref=keep``; ``ours`` is asserted.
"""

from __future__ import annotations

from podcast_plow_spark.sources.feeds import _parse_one_feed

GOOD_ITEM = (
    "<item><guid>g1</guid><title>t</title>"
    '<enclosure url="https://x.example.com/e.mp3" type="audio/mpeg"/>'
    "</item>"
)


def _wrap(items: str, prolog: str = "") -> str:
    return f'{prolog}<rss version="2.0"><channel><title>c</title>{items}</channel></rss>'


def _is_bozo(rows: list[dict]) -> bool:
    return len(rows) == 1 and rows[0]["parse_error"] is not None


class TestBothDrop:
    """Not-well-formed XML: feedparser sets bozo → ref drops; our
    stdlib parse errors → we drop. Boundary AGREES."""

    def test_missing_closing_tag(self):
        xml = '<rss version="2.0"><channel><title>c</title>' + GOOD_ITEM  # no closers
        assert _is_bozo(_parse_one_feed("u", xml))  # ref=drop, ours=drop

    def test_undeclared_entity(self):
        # &nbsp; is not one of the five predefined XML entities and no
        # DTD declares it: feedparser bozo (SAXParseException), ET
        # ParseError — both drop.
        xml = _wrap("<item><title>a&nbsp;b</title></item>")
        assert _is_bozo(_parse_one_feed("u", xml))

    def test_empty_document(self):
        assert _is_bozo(_parse_one_feed("u", ""))
        assert _is_bozo(_parse_one_feed("u", b""))

    def test_truncated_mid_tag(self):
        assert _is_bozo(_parse_one_feed("u", _wrap(GOOD_ITEM)[:40]))

    def test_mismatched_tags(self):
        xml = "<rss><channel><title>c</wrong></channel></rss>"
        assert _is_bozo(_parse_one_feed("u", xml))

    def test_garbage_bytes(self):
        assert _is_bozo(_parse_one_feed("u", b"\x00\x01\x02 not xml"))


class TestBothKeep:
    """Well-formed documents feedparser accepts with bozo=0 — our
    parser must ALSO accept or we'd silently drop feeds the reference
    crawls. These pin the r5 bytes-based input handling."""

    def test_utf8_bom_bytes(self):
        # feedparser strips the BOM during prolog sniffing; expat on
        # bytes does too. (Pre-r5 the utf-8 TEXT read handed ET a '﻿'
        # str, which ParseError'd → silent divergence.)
        xml = _wrap(GOOD_ITEM).encode("utf-8-sig")  # utf-8-sig prepends the BOM
        assert xml.startswith(b"\xef\xbb\xbf")
        rows = _parse_one_feed("u", xml)
        assert not _is_bozo(rows) and rows[0]["guid"] == "g1"

    def test_utf8_bom_str(self):
        rows = _parse_one_feed("u", "﻿" + _wrap(GOOD_ITEM))
        assert not _is_bozo(rows) and rows[0]["guid"] == "g1"

    def test_latin1_declared_encoding_bytes(self):
        # feedparser honors the declared charset; ET-on-bytes does too.
        xml = _wrap(
            "<item><guid>g1</guid><title>caf\xe9</title></item>",
            prolog='<?xml version="1.0" encoding="iso-8859-1"?>',
        ).encode("iso-8859-1")
        rows = _parse_one_feed("u", xml)
        assert not _is_bozo(rows) and rows[0]["title"] == "café"

    def test_latin1_declared_encoding_str(self):
        # a str carrying a non-utf-8 encoding declaration made
        # ET.fromstring raise ValueError pre-r5 — crashing the executor
        # task instead of bozo-ing the row. Now it parses (re-encoded
        # with the declared charset).
        xml = _wrap(
            "<item><guid>g1</guid><title>caf\xe9</title></item>",
            prolog='<?xml version="1.0" encoding="iso-8859-1"?>',
        )
        rows = _parse_one_feed("u", xml)
        assert not _is_bozo(rows) and rows[0]["title"] == "café"

    def test_utf16_with_bom(self):
        xml = _wrap(GOOD_ITEM, prolog='<?xml version="1.0" encoding="utf-16"?>').encode(
            "utf-16"
        )
        rows = _parse_one_feed("u", xml)
        assert not _is_bozo(rows) and rows[0]["guid"] == "g1"

    def test_cdata_description(self):
        xml = _wrap("<item><guid>g1</guid><description><![CDATA[<b>hi</b> & stuff]]></description></item>")
        rows = _parse_one_feed("u", xml)
        assert rows[0]["description"] == "<b>hi</b> & stuff"

    def test_predefined_entities(self):
        xml = _wrap("<item><guid>g1</guid><title>a &amp; b &lt;c&gt;</title></item>")
        rows = _parse_one_feed("u", xml)
        assert rows[0]["title"] == "a & b <c>"

    def test_unknown_elements_ignored(self):
        xml = _wrap("<weird><nested/></weird>" + GOOD_ITEM)
        rows = _parse_one_feed("u", xml)
        assert len(rows) == 1 and rows[0]["guid"] == "g1"

    def test_unknown_codec_name_is_bozo_not_crash(self):
        # BYTES declaring a codec the parser doesn't know: expat raises
        # LookupError (not ParseError) — pre-r5 that propagated and
        # failed the executor task. Now it's a bozo row. feedparser
        # sets bozo=CharacterEncodingUnknown for the same input →
        # ref=drop, ours=drop: boundary AGREES.
        xml = _wrap(GOOD_ITEM, prolog='<?xml version="1.0" encoding="x-no-such-codec"?>')
        assert _is_bozo(_parse_one_feed("u", xml.encode("ascii")))
        # str input hits the same expat LookupError (the declaration
        # survives the utf-8 fallback re-encode) → bozo, same boundary
        assert _is_bozo(_parse_one_feed("u", xml))


class TestFixtureCorpusOnDisk:
    """End-to-end through the engine's fetch stage: a site serving a
    malformed feed is dropped (its entries never reach the frontier)
    while well-formed feeds in the same batch survive — bozo isolation
    per document, never per batch (reference: per-feed continue)."""

    def test_bozo_feed_isolated_in_batch(self, spark, tmp_path_factory):
        import os

        from podcast_plow_spark.sources.feeds import fetch_and_parse_feeds
        from podcast_plow_spark.sources.fixtures import FixtureSpec, make_fixtures

        from podcast_plow_spark.sources.fixtures import feed_host

        root = str(tmp_path_factory.mktemp("leniency_fx"))
        fx = make_fixtures(FixtureSpec(root=root, n_feeds=2, entries_per_feed=3))
        # corrupt feed 0 on disk: truncate it mid-document
        p0 = os.path.join(root, "sites", feed_host(0), "feed.xml")
        body = open(p0, encoding="utf-8").read()
        open(p0, "w", encoding="utf-8").write(body[: len(body) // 2])

        urls = [(f"https://{feed_host(i)}/feed.xml",) for i in range(2)]
        batch = spark.createDataFrame(urls, "url string")
        out = fetch_and_parse_feeds(batch, fx.root).collect()
        by_feed: dict = {}
        for r in out:
            by_feed.setdefault(r["feed_url"], []).append(r)
        bad = by_feed[urls[0][0]]
        good = by_feed[urls[1][0]]
        assert len(bad) == 1 and bad[0]["parse_error"] is not None
        assert len(good) == 3 and all(r["parse_error"] is None for r in good)
