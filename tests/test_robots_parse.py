"""robots.txt parsing: RFC 9309 / Google decision semantics."""

from __future__ import annotations

from cola_spark.operators.robots import (
    parse_robots_delay,
    parse_robots_rules,
    robots_decide,
)

STAR = (
    "# comment line\n"
    "User-Agent: *\n"
    "Disallow: /private\n"
    "Allow: /private/ok\n"
    "Disallow:\n"          # empty value: the spec no-op
    "Crawl-Delay: 3\n"
    "Disallow: /t\n"
    "Allow: /t"            # equal-length tie with the line above
)
BOT = (
    "\n\nUser-agent: colabot\n"
    "User-agent: otherbot\n"   # multi-UA run shares one block
    "Disallow: /p2\n"
    "Allow: /p2/ok\n"
    "Crawl-delay: 1"
)


def _frames(spark):
    rb = spark.createDataFrame(
        [("star.com", STAR), ("both.com", STAR + BOT)],
        "host string, txt string",
    )
    fr = spark.createDataFrame(
        [
            ("star.com", "/private/x"),
            ("star.com", "/private/ok/y"),
            ("star.com", "/t/z"),
            ("star.com", "/home"),
            ("both.com", "/private/x"),
            ("both.com", "/p2/deep"),
            ("both.com", "/p2/ok/c"),
        ],
        "host string, path string",
    )
    return rb, fr


def test_decision_semantics(spark):
    rb, fr = _frames(spark)
    got = {
        (r.host, r.path): (r.matched_len, r.allowed)
        for r in robots_decide(fr, parse_robots_rules(rb)).collect()
    }
    # longest match wins
    assert got[("star.com", "/private/x")] == (8, False)
    assert got[("star.com", "/private/ok/y")] == (11, True)
    # equal-length tie: Allow beats Disallow
    assert got[("star.com", "/t/z")] == (2, True)
    # no rule: allowed
    assert got[("star.com", "/home")] == (0, True)
    # exact-agent group REPLACES the star group (no merge):
    # /private is NOT blocked for colabot on both.com
    assert got[("both.com", "/private/x")] == (0, True)
    assert got[("both.com", "/p2/deep")] == (3, False)
    assert got[("both.com", "/p2/ok/c")] == (6, True)


def test_multi_ua_block_shared_and_star_fallback(spark):
    rb, _ = _frames(spark)
    other = parse_robots_rules(rb, agent="otherbot")
    got = sorted(
        (r.prefix, r.is_allow)
        for r in other.filter("host = 'both.com'").collect()
    )
    assert got == [("/p2", False), ("/p2/ok", True)]
    # an agent with no group anywhere falls back to * on every host
    nobody = parse_robots_rules(rb, agent="nobody")
    assert nobody.filter("host = 'both.com'").count() == 4  # star rules


def test_crawl_delay_follows_the_governing_group(spark):
    rb, _ = _frames(spark)
    d = {r.host: r.delay_s for r in parse_robots_delay(rb).collect()}
    assert d == {"star.com": 3, "both.com": 1}


def test_rules_outside_any_group_are_ignored(spark):
    rb = spark.createDataFrame(
        [("x.com", "Disallow: /lost\nUser-agent: *\nDisallow: /kept")],
        "host string, txt string",
    )
    got = [(r.prefix, r.is_allow) for r in parse_robots_rules(rb).collect()]
    assert got == [("/kept", False)]


def test_crawl_policy_plan_composition(spark):
    """Every stage decides something: traps dropped everywhere, robots
    split differs between star-only and colabot-overridden hosts, and
    the calendar spacing equals the governing group's crawl-delay."""
    from cola_spark.queries import q_crawl_policy_plan

    rows = q_crawl_policy_plan(spark, "/root/testdata/sf0.001").collect()
    by_host = {}
    for r in rows:
        by_host.setdefault(r.host, []).append(r)
    assert len(by_host) == 50 and len(rows) == 200
    for host, rs in by_host.items():
        h = int(host[1:].split(".")[0])
        urls = {r.url_canon.split(".com", 1)[1] for r in rs}
        assert not any("/loop/" in u for u in urls)  # trap stage
        q = h % 5
        if h % 3 == 0:  # colabot group governs
            assert f"/p{q}0?a=1&b=2" not in urls     # Disallow /p{q}
            assert "/private/data" in urls           # star rules replaced
            assert f"/p{q}/ok/x" in urls             # Allow override
            delay = 1 + h % 4
        else:
            assert f"/p{q}0?a=1&b=2" in urls
            assert "/private/data" not in urls       # star Disallow
            assert "/private/ok/page" in urls        # Allow wins
            delay = 2 + h % 3
        # calendar: slots 1..k, offsets spaced by the parsed delay
        rs = sorted(rs, key=lambda r: r.slot)
        assert [r.slot for r in rs] == list(range(1, len(rs) + 1))
        assert all(
            r.offset_ms == (r.slot - 1) * delay * 1000 for r in rs
        )


def test_sitemap_directive_is_global(spark):
    """Sitemap: directives surface from BEFORE any group and from
    INSIDE a group alike (RFC 9309 globality), deduped per host; and
    their presence does not perturb rule/delay parsing."""
    from cola_spark.operators.robots import (
        parse_robots_delay,
        parse_robots_rules,
        parse_robots_sitemaps,
    )

    txt = (
        "Sitemap: http://a.com/sm1.xml\n"
        "User-agent: *\n"
        "Disallow: /x\n"
        "Sitemap: http://a.com/sm2.xml\n"
        "Crawl-delay: 2\n"
        "Sitemap: http://a.com/sm1.xml"   # duplicate -> one row
    )
    rb = spark.createDataFrame([("a.com", txt)], "host string, txt string")
    sm = sorted(r.sitemap_url for r in parse_robots_sitemaps(rb).collect())
    assert sm == ["http://a.com/sm1.xml", "http://a.com/sm2.xml"]
    assert [(r.prefix, r.is_allow) for r in parse_robots_rules(rb).collect()] \
        == [("/x", False)]
    assert parse_robots_delay(rb).collect()[0].delay_s == 2
