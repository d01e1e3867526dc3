"""Unit tests for the scalar kernels — frozen semantics.

URL canonicalization + fingerprint parity scenarios mirror the
reference test strategy (tests/test_youtube_ingest.py,
tests/test_jobs_service_queue.py) without copying fixtures.
"""

from __future__ import annotations

import hashlib
import json

from podcast_plow_spark.functions.urls import (
    canonicalize_url,
    extract_host,
    fixup_scheme,
    host_hash_py,
    normalize_youtube_url,
    url_fingerprint,
)


class TestCanonicalizeUrl:
    def test_lowercases_scheme_and_host(self):
        assert canonicalize_url("HTTP://ExAmPle.COM/Path") == "http://example.com/Path"

    def test_strips_fragment(self):
        assert canonicalize_url("https://a.com/x#frag") == "https://a.com/x"

    def test_strips_tracking_params_keeps_others(self):
        got = canonicalize_url("https://a.com/x?utm_source=tw&id=3&fbclid=zz&b=2")
        assert got == "https://a.com/x?id=3&b=2"

    def test_default_port_stripped(self):
        assert canonicalize_url("https://a.com:443/x") == "https://a.com/x"
        assert canonicalize_url("http://a.com:8080/x") == "http://a.com:8080/x"

    def test_scheme_relative(self):
        assert canonicalize_url("//cdn.a.com/i.png") == "https://cdn.a.com/i.png"

    def test_percent_decode_unreserved(self):
        assert canonicalize_url("https://a.com/%7Euser/%41%2Fb") == "https://a.com/~user/A%2Fb"

    def test_empty_path_becomes_slash(self):
        assert canonicalize_url("https://a.com") == "https://a.com/"

    def test_collapses_duplicate_slashes(self):
        assert canonicalize_url("https://a.com//x///y") == "https://a.com/x/y"

    def test_none_and_blank(self):
        assert canonicalize_url(None) is None
        assert canonicalize_url("   ") is None

    def test_idempotent(self):
        u = "https://A.com:443//x/%7Ey?utm_medium=a&q=1#f"
        once = canonicalize_url(u)
        assert canonicalize_url(once) == once


class TestCanonicalizeFastPath:
    """The vectorized fixpoint fast path (_FAST_CANON_RE) must accept
    ONLY strings the canonicalizer maps to themselves — otherwise the
    UDF would silently skip a rewrite."""

    def _series(self, urls):
        import pandas as pd

        from podcast_plow_spark.functions.urls import _canonicalize_series

        return _canonicalize_series(pd.Series(urls, dtype=object))

    def test_fast_members_are_fixpoints_hypothesis(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from podcast_plow_spark.functions.urls import _FAST_CANON_RE

        seg_chars = "abcXYZ09._~!$&'()*+,=:@-"
        host_label = st.text(alphabet="abz09-", min_size=1, max_size=6)
        seg = st.text(alphabet=seg_chars, min_size=1, max_size=8)
        urls = st.builds(
            lambda scheme, labels, segs, slash: scheme
            + "://"
            + ".".join(labels)
            + "".join("/" + s for s in segs)
            + ("/" if slash else ""),
            st.sampled_from(["http", "https"]),
            st.lists(host_label, min_size=1, max_size=3),
            st.lists(seg, min_size=0, max_size=4),
            st.booleans(),
        )

        @given(urls)
        @settings(max_examples=300, deadline=None)
        def check(u):
            if _FAST_CANON_RE.fullmatch(u):
                assert canonicalize_url(u) == u

        check()

    def test_series_matches_per_row_map_on_mixed_corpus(self):
        corpus = [
            "https://a.com/x",  # fast
            "https://hot.example.com/images/img-0000000042",  # fast (bench shape)
            "https://a.com/x/",  # fast, trailing slash
            "HTTP://ExAmPle.COM/Path",  # slow: case fold
            "https://a.com/x?utm_source=tw&id=3",  # slow: query
            "https://a.com:443/x",  # slow: default port
            "https://a.com./x",  # slow: trailing host dot
            "https://user@a.com/x",  # slow: userinfo
            "https://a.com//x///y",  # slow: slash collapse
            "https://a.com/%7Euser",  # slow: percent decode
            "https://a.com/x#frag",  # slow: fragment
            "https://a.com/x;p=1",  # slow: params
            "https://a.com",  # slow: empty path
            "//cdn.a.com/i.png",  # slow: scheme-relative
            None,
            "   ",
        ]
        got = list(self._series(corpus))
        want = [canonicalize_url(u) for u in corpus]
        assert got == want

    def test_boundary_strings_route_slow(self):
        """Strings one edit away from canonical must NOT match the
        fast pattern (each needs a rewrite)."""
        from podcast_plow_spark.functions.urls import _FAST_CANON_RE

        for u in [
            "https://A.com/x",
            "https://a.com:80/x",
            "https://a.com./",
            "https://a..com/x",
            "https://a.com//x",
            "https://a.com/x%41",
            "https://a.com/x?q=1",
            "https://a.com/x#f",
            "https://a.com/x;y",
            "https://a.com",
            "ftp://a.com/x",
            "https:///x",
        ]:
            assert not _FAST_CANON_RE.fullmatch(u), u


class TestYoutubeKernel:
    # parity scenarios vs reference server/ingest/youtube.py:18-89
    def test_watch_url(self):
        assert (
            normalize_youtube_url("https://www.youtube.com/watch?v=dQw4w9WgXcQ")
            == "https://www.youtube.com/watch?v=dQw4w9WgXcQ"
        )

    def test_youtu_be(self):
        assert (
            normalize_youtube_url("https://youtu.be/dQw4w9WgXcQ?t=30")
            == "https://www.youtube.com/watch?v=dQw4w9WgXcQ"
        )

    def test_shorts_and_embed_and_live(self):
        for path in ("shorts", "embed", "live"):
            got = normalize_youtube_url(f"https://www.youtube.com/{path}/dQw4w9WgXcQ")
            assert got == "https://www.youtube.com/watch?v=dQw4w9WgXcQ", path

    def test_rejects_non_youtube_host(self):
        assert normalize_youtube_url("https://vimeo.com/watch?v=dQw4w9WgXcQ") is None

    def test_rejects_bad_id_length(self):
        assert normalize_youtube_url("https://youtu.be/short") is None

    def test_fixup_scheme_relative(self):
        assert fixup_scheme("//www.youtube.com/watch?v=x") == "https://www.youtube.com/watch?v=x"
        assert fixup_scheme("youtu.be/abc") == "https://youtu.be/abc"
        assert fixup_scheme("page.html", "https://a.com/dir/") == "https://a.com/dir/page.html"


class TestFingerprint:
    def test_byte_parity_with_reference_algorithm(self):
        # reference server/services/jobs.py:166-182
        payload = {"b": 1, "a": "ü"}
        expected = hashlib.sha256(
            ("summarize:" + json.dumps(payload, sort_keys=True, separators=(",", ":"), ensure_ascii=False)).encode()
        ).hexdigest()
        assert url_fingerprint("summarize", payload) == expected

    def test_empty_payload(self):
        assert url_fingerprint("t") == hashlib.sha256(b"t:{}").hexdigest()

    def test_type_stripped(self):
        assert url_fingerprint("  t  ", {}) == url_fingerprint("t", {})


class TestHost:
    def test_extract_host(self):
        assert extract_host("https://A.example.com:8443/x") == "a.example.com"
        assert extract_host("example.com/path") == "example.com"
        assert extract_host(None) is None

    def test_host_hash_buckets_stable(self):
        assert host_hash_py("a.com", 32) == host_hash_py("a.com", 32)
        assert 0 <= host_hash_py("a.com", 32) < 32


class TestParaphrase:
    def test_leading_phrase_fixpoint(self):
        from podcast_plow_spark.functions.text import paraphrase

        got = paraphrase("The host says that creatine improves memory")
        assert got == "The speaker maintains that creatine enhances memory."

    def test_terminal_punctuation_added(self):
        from podcast_plow_spark.functions.text import paraphrase

        assert paraphrase("Magnesium helps sleep").endswith(".")


class TestUrlKindKernelParity:
    """The engine's JVM-side kind/image_id Columns must equal the
    oracle's Python kernels on adversarial URL shapes (query strings on
    feeds, trailing slashes on images) — engine↔oracle cannot drift."""

    CORPUS = [
        "https://example.com/feed.xml",
        "https://example.com/shows/a/feed.xml",
        "https://example.com/feed.xml?page=2",          # query string — still a feed
        "https://example.com/feed.xml?page=2&x=feed.xml",
        "https://example.com/img/photo-1.png",
        "https://example.com/img/photo-2.png/",          # trailing slash
        "https://example.com/img/photo-3.png///",
        "https://example.com/notafeed.xml",
        "https://example.com/feed.xmlish",
        "https://example.com/",
        "https://example.com",
        "https://example.com/a/feed.xml/",               # slash AFTER feed.xml → image
    ]

    def test_url_kind_kernel_parity(self, spark):
        from pyspark.sql import functions as F

        from podcast_plow_spark.functions.urls import (
            image_id_col,
            image_id_from_url,
            url_kind,
            url_kind_col,
        )

        df = spark.createDataFrame([(u,) for u in self.CORPUS], "url string")
        got = {
            r["url"]: (r["kind"], r["image_id"])
            for r in df.select(
                "url",
                url_kind_col(F.col("url")).alias("kind"),
                image_id_col(F.col("url")).alias("image_id"),
            ).collect()
        }
        for u in self.CORPUS:
            assert got[u][0] == url_kind(u), u
            assert got[u][1] == image_id_from_url(u), u

    def test_python_kernel_expected_values(self):
        from podcast_plow_spark.functions.urls import image_id_from_url, url_kind

        assert url_kind("https://h/feed.xml?page=2") == "feed"
        assert url_kind("https://h/x/feed.xml") == "feed"
        assert url_kind("https://h/feed.xml/") == "image"
        assert image_id_from_url("https://h/img/a.png/") == "a.png"
        assert image_id_from_url("https://h/img/a.png?x=1") == "a.png"
        assert image_id_from_url("https://h/") == ""
