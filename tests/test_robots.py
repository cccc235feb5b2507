"""robots.txt parsing + apply semantics (RFC 9309 subset).

The oracle query (`q_robots`) verifies the end-to-end pipeline against
independently-computed expectations; these tests pin the parse edge
cases the planted corpus can't isolate: comment stripping, consecutive
User-agent lines, exact-group override of '*', empty-Disallow,
longest-prefix and Allow-on-tie precedence, and the broadcast/shuffle
join gate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from py_schemax_spark.operators.robots import apply_robots, parse_robots


def _rules(spark, body, agent="*"):
    df = spark.createDataFrame(
        [("ex.org", body)], "domain string, robots_txt string"
    )
    return {
        (r["prefix"], r["is_allow"])
        for r in parse_robots(df, user_agent=agent).collect()
    }


def test_parse_basic_star_group(spark):
    body = "User-agent: *\nDisallow: /private/\nAllow: /private/ok\n"
    assert _rules(spark, body) == {
        ("/private/", False),
        ("/private/ok", True),
    }


def test_parse_ignores_comments_and_blanks(spark):
    body = (
        "# top comment\n\n"
        "User-agent: *  # trailing\n"
        "Disallow: /a # inline comment\n"
        "# Disallow: /commented-out\n"
        "\nDisallow: /b\n"
    )
    assert _rules(spark, body) == {("/a", False), ("/b", False)}


def test_parse_consecutive_user_agents_share_group(spark):
    body = (
        "User-agent: alphabot\n"
        "User-agent: *\n"
        "Disallow: /x\n"
        "\n"
        "User-agent: betabot\n"
        "Disallow: /y\n"
    )
    # the '*' group (shared with alphabot) applies; betabot's doesn't
    assert _rules(spark, body) == {("/x", False)}
    # alphabot gets the SAME group via its exact token (not via '*')
    assert _rules(spark, body, agent="alphabot") == {("/x", False)}


def test_parse_exact_group_overrides_star(spark):
    body = (
        "User-agent: *\nDisallow: /all/\n\n"
        "User-agent: mybot\nDisallow: /mine/\n"
    )
    # RFC 9309: a host with an exact group hides the '*' groups
    assert _rules(spark, body, agent="mybot") == {("/mine/", False)}
    assert _rules(spark, body, agent="otherbot") == {("/all/", False)}


def test_parse_empty_disallow_is_no_rule(spark):
    body = "User-agent: *\nDisallow:\nDisallow: /x\n"
    assert _rules(spark, body) == {("/x", False)}


def test_parse_rules_before_any_group_are_dropped(spark):
    body = "Disallow: /orphan\nUser-agent: *\nDisallow: /x\n"
    assert _rules(spark, body) == {("/x", False)}


def test_parse_case_insensitive_directives(spark):
    body = "USER-AGENT: *\ndisallow: /a\nALLOW: /a/b\n"
    assert _rules(spark, body) == {("/a", False), ("/a/b", True)}


def _apply(spark, rules_rows, urls):
    rules = spark.createDataFrame(
        rules_rows, "domain string, prefix string, is_allow boolean"
    )
    docs = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id long, url string"
    )
    out = apply_robots(docs, rules).orderBy("doc_id").collect()
    return [(r["robots_blocked"], r["rule"]) for r in out]


def test_apply_longest_prefix_wins_allow_on_tie(spark):
    rules = [
        ("ex.org", "/p/", False),
        ("ex.org", "/p/ok", True),
        ("ex.org", "/tie", True),
        ("ex.org", "/tie", False),
    ]
    got = _apply(
        spark,
        rules,
        [
            "https://ex.org/p/1",        # disallow /p/
            "https://ex.org/p/ok/2",     # allow (longer)
            "https://ex.org/tie/3",      # tie -> allow wins
            "https://ex.org/other",      # no match
            "https://other.org/p/1",     # no robots for host
        ],
    )
    assert got == [
        (True, "disallow:/p/"),
        (False, "allow:/p/ok"),
        (False, "allow:/tie"),
        (False, None),
        (False, None),
    ]


def test_apply_root_path_and_disallow_all(spark):
    rules = [("ex.org", "/", False)]
    got = _apply(
        spark, rules, ["https://ex.org", "https://ex.org/any/x"]
    )
    assert got == [(True, "disallow:/"), (True, "disallow:/")]


def test_apply_null_url_not_blocked(spark):
    rules = [("ex.org", "/", False)]
    docs = spark.createDataFrame(
        [(0, None)], "doc_id long, url string"
    )
    row = apply_robots(docs, spark.createDataFrame(
        rules, "domain string, prefix string, is_allow boolean"
    )).collect()[0]
    assert row["robots_blocked"] is False and row["rule"] is None


def test_apply_broadcast_gate_small_vs_large(spark):
    """Small rules table -> BroadcastHashJoin; over-cap -> shuffle
    join (same verdicts either way)."""
    rules = spark.createDataFrame(
        [("ex.org", "/x", False)],
        "domain string, prefix string, is_allow boolean",
    )
    docs = spark.createDataFrame(
        [(0, "https://ex.org/x/1"), (1, "https://ex.org/y")],
        "doc_id long, url string",
    )
    small = apply_robots(docs, rules)
    assert "BroadcastHashJoin" in small._jdf.queryExecution().executedPlan().toString()
    large = apply_robots(docs, rules, max_broadcast_domains=0)
    plan = large._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan
    assert (
        [(r["robots_blocked"], r["rule"]) for r in small.orderBy("doc_id").collect()]
        == [(r["robots_blocked"], r["rule"]) for r in large.orderBy("doc_id").collect()]
        == [(True, "disallow:/x"), (False, None)]
    )


def test_end_to_end_parse_then_apply(spark):
    robots = spark.createDataFrame(
        [
            (
                "a.org",
                "User-agent: badbot\nDisallow: /\n\n"
                "User-agent: *\nDisallow: /private/\nAllow: /private/ok\n",
            ),
            ("b.org", "User-agent: *\nDisallow:\n"),
        ],
        "domain string, robots_txt string",
    )
    docs = spark.createDataFrame(
        [
            (0, "https://a.org/private/1"),
            (1, "https://a.org/private/ok/2"),
            (2, "https://a.org/pub/3"),
            (3, "https://b.org/private/4"),
        ],
        "doc_id long, url string",
    )
    out = apply_robots(docs, parse_robots(robots)).orderBy("doc_id")
    got = [(r["robots_blocked"], r["rule"]) for r in out.collect()]
    # badbot's Disallow:/ must NOT leak into the '*' verdicts
    assert got == [
        (True, "disallow:/private/"),
        (False, "allow:/private/ok"),
        (False, None),
        (False, None),
    ]


def test_apply_robots_passthrough_filters_in_one_plan(spark):
    rules = spark.createDataFrame(
        [("ex.org", "/x", False)],
        "domain string, prefix string, is_allow boolean",
    )
    docs = spark.createDataFrame(
        [(0, "https://ex.org/x/1", "keep-cols"),
         (1, "https://ex.org/y", "survive")],
        "doc_id long, url string, text string",
    )
    from py_schemax_spark.operators.robots import apply_robots

    out = apply_robots(docs, rules, passthrough=True)
    assert set(docs.columns) <= set(out.columns)
    kept = out.filter("NOT robots_blocked").collect()
    assert [(r["doc_id"], r["text"]) for r in kept] == [(1, "survive")]


def test_apply_robots_passthrough_collision_raises(spark):
    import pytest as _pytest

    rules = spark.createDataFrame(
        [("ex.org", "/x", False)],
        "domain string, prefix string, is_allow boolean",
    )
    docs = spark.createDataFrame(
        [(0, "https://ex.org/x", "h")], "doc_id long, url string, host string"
    )
    from py_schemax_spark.operators.robots import apply_robots

    with _pytest.raises(ValueError):
        apply_robots(docs, rules, passthrough=True)


# ---------------------------------------------------------------------------
# Sitemap parsing


def _sm(spark, rows, schema="host string, xml string"):
    from py_schemax_spark.operators.robots import parse_sitemaps

    df = spark.createDataFrame(rows, schema)
    return sorted(
        (r["host"], r["kind"], r["loc"], r["lastmod"])
        for r in parse_sitemaps(df).collect()
    )


def test_sitemap_urlset_entries(spark):
    xml = (
        '<?xml version="1.0"?><urlset>'
        "<url><loc>https://a.org/p?x=1&amp;y=2</loc>"
        "<lastmod>2024-01-02</lastmod></url>"
        "<url><loc> https://a.org/q </loc></url>"
        "<url><lastmod>2024-01-01</lastmod></url></urlset>"
    )
    assert _sm(spark, [("a.org", xml)]) == [
        ("a.org", "urlset", "https://a.org/p?x=1&y=2", "2024-01-02"),
        ("a.org", "urlset", "https://a.org/q", None),
    ]


def test_sitemap_index_and_case(spark):
    xml = (
        "<sitemapindex><sitemap><loc>https://b.org/sm1.xml</loc>"
        "</sitemap><SITEMAP><loc>https://b.org/sm2.xml</loc>"
        "</SITEMAP></sitemapindex>"
    )
    assert _sm(spark, [("b.org", xml)]) == [
        ("b.org", "sitemapindex", "https://b.org/sm1.xml", None),
        ("b.org", "sitemapindex", "https://b.org/sm2.xml", None),
    ]


def test_sitemap_null_and_garbage_payloads(spark):
    assert _sm(spark, [("c.org", None), ("d.org", "not xml")]) == []


def test_sitemap_entity_unescape_order(spark):
    xml = ("<urlset><url><loc>https://e.org/?q=&quot;a&quot;"
           "&amp;lt;</loc></url></urlset>")
    # &amp;lt; -> &lt; (amp unescaped LAST, no double-unescape)
    assert _sm(spark, [("e.org", xml)]) == [
        ("e.org", "urlset", 'https://e.org/?q="a"&lt;', None),
    ]


def test_sitemap_binary_payload(spark):
    xml = b"<urlset><url><loc>https://f.org/x</loc></url></urlset>"
    got = _sm(spark, [("f.org", xml)], "host string, xml binary")
    assert got == [("f.org", "urlset", "https://f.org/x", None)]


def test_sitemap_plan_shuffle_free(spark):
    from py_schemax_spark.operators.robots import parse_sitemaps

    df = spark.createDataFrame(
        [("a.org", "<urlset></urlset>")], "host string, xml string"
    )
    plan = (
        parse_sitemaps(df)._jdf.queryExecution().executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
