"""Frozen RFC 9309 semantics for the robots evaluator (P6 — new
capability, no reference oracle; SURVEY.md §2.10)."""

from podcast_plow_spark.operators.politeness import parse_robots, robots_allowed

BODY = """
# comment
User-agent: *
Disallow: /private/
Crawl-delay: 1

User-agent: plow-spark
Disallow: /images/private/
Allow: /images/private/allowed-*
Disallow: /tmp/*.bak$
"""


def rules(ua="plow-spark"):
    return parse_robots(BODY, ua)


def test_specific_group_wins_over_star():
    assert robots_allowed(rules(), "/private/x") is True  # star group not applied
    assert robots_allowed(rules("otherbot"), "/private/x") is False


def test_disallow_prefix():
    assert robots_allowed(rules(), "/images/private/secret.png") is False
    assert robots_allowed(rules(), "/images/public/ok.png") is True


def test_longest_match_wins_allow_override():
    assert robots_allowed(rules(), "/images/private/allowed-1.png") is True


def test_wildcard_and_anchor():
    assert robots_allowed(rules(), "/tmp/x.bak") is False
    assert robots_allowed(rules(), "/tmp/x.bak.txt") is True  # $ anchors the end


def test_no_match_is_allowed():
    assert robots_allowed(rules(), "/") is True


def test_empty_body_allows_all():
    assert robots_allowed(parse_robots("", "plow-spark"), "/anything") is True


def test_tie_prefers_allow():
    body = "User-agent: *\nDisallow: /a/b\nAllow: /a/b\n"
    assert robots_allowed(parse_robots(body, "x"), "/a/b/c") is True


def test_interior_dollar_is_literal():
    # RFC 9309: only a pattern-FINAL '$' anchors; an interior '$' is a
    # literal character. A rule like 'Disallow: /a$b' must match the
    # literal path '/a$b' (and not become an impossible regex).
    body = "User-agent: *\nDisallow: /a$b\n"
    r = parse_robots(body, "plow-spark")
    assert robots_allowed(r, "/a$b/page") is False
    assert robots_allowed(r, "/ab") is True


def test_trailing_dollar_still_anchors():
    body = "User-agent: *\nDisallow: /exact$\n"
    r = parse_robots(body, "plow-spark")
    assert robots_allowed(r, "/exact") is False
    assert robots_allowed(r, "/exactly") is True


def test_same_agent_groups_are_merged():
    # RFC 9309 §2.2.1: multiple groups naming the same user-agent are
    # combined into one group — rules from BOTH apply
    body = (
        "User-agent: plow-spark\nDisallow: /a/\n\n"
        "User-agent: other\nDisallow: /\n\n"
        "User-agent: plow-spark\nDisallow: /b/\n"
    )
    r = parse_robots(body, "plow-spark")
    assert robots_allowed(r, "/a/x") is False
    assert robots_allowed(r, "/b/x") is False
    assert robots_allowed(r, "/c/x") is True


def test_star_groups_also_merge():
    body = "User-agent: *\nDisallow: /a/\n\nUser-agent: *\nDisallow: /b/\n"
    r = parse_robots(body, "anybot")
    assert robots_allowed(r, "/a/x") is False
    assert robots_allowed(r, "/b/x") is False


class TestCrawlDelay:
    def test_parsed_for_selected_group(self):
        body = (
            "User-agent: *\nDisallow: /x/\nCrawl-delay: 2.5\n\n"
            "User-agent: plow-spark\nDisallow: /y/\nCrawl-delay: 0.5\n"
        )
        from podcast_plow_spark.operators.politeness import parse_crawl_delay

        assert parse_crawl_delay(body, "plow-spark") == 0.5
        assert parse_crawl_delay(body, "otherbot") == 2.5
        assert parse_crawl_delay("User-agent: *\nDisallow: /\n", "x") is None
        assert parse_crawl_delay("User-agent: *\nCrawl-delay: nope\n", "x") is None

    def test_scheduler_honors_per_host_delay(self, spark):
        from podcast_plow_spark.operators.politeness import schedule_fetches

        batch = spark.createDataFrame(
            [(f"u{i}", "slow.com" if i % 2 == 0 else "fast.com", i + 1) for i in range(6)],
            "url_canon string, host string, crawl_rank long",
        )
        out = schedule_fetches(
            batch, crawl_delay_sec=1.0, per_host_delay={"slow.com": 4.0}
        ).collect()
        by_host = {}
        for r in out:
            by_host.setdefault(r["host"], []).append(r["fetch_offset_sec"])
        assert sorted(by_host["slow.com"]) == [0.0, 4.0, 8.0]
        assert sorted(by_host["fast.com"]) == [0.0, 1.0, 2.0]


def test_crawl_delay_terminates_group_like_a_rule():
    """'UA: a / Crawl-delay / UA: b / Disallow' is TWO groups — agent a
    must not inherit b's Disallow (parse_robots and parse_crawl_delay
    must split groups identically; ADVICE r2)."""
    body = "User-agent: a\nCrawl-delay: 1\nUser-agent: b\nDisallow: /x\n"
    assert parse_robots(body, "a-bot") == []
    assert parse_robots(body, "b-bot") == [(False, "/x")]
    from podcast_plow_spark.operators.politeness import parse_crawl_delay
    assert parse_crawl_delay(body, "a-bot") == 1.0
    assert parse_crawl_delay(body, "b-bot") is None
