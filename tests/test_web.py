"""URL canonicalization / registrable-domain / URL-dedup tests (the
web-ingest front, VERDICT r7 #3)."""

import pytest
from pyspark.sql import functions as F

from featurestore_spark.operators.web import (
    PUBLIC_SUFFIXES,
    canonical_url,
    domain_rollup,
    filter_domains,
    filter_urls,
    registrable_domain,
    url_dedup,
    url_parts,
    url_word_score,
)


def _canon(spark, url, **kw):
    df = spark.createDataFrame([(url,)], "url string")
    return df.select(canonical_url("url", **kw).alias("c")).collect()[0]["c"]


def test_canonical_url_rules(spark):
    # scheme+host lowercased, default port dropped, utm params
    # stripped, remaining params sorted, fragment dropped, trailing
    # slash stripped
    assert (
        _canon(
            spark,
            "HTTP://WWW.Example.COM:80/A/b/?utm_source=x&id=3&utm_campaign=y#Frag",
        )
        == "http://www.example.com/A/b?id=3"
    )
    # non-default port kept; userinfo stripped through the LAST '@'
    assert (
        _canon(spark, "https://u:p@ss@Host.Org:8443/x") == "https://host.org:8443/x"
    )
    # https default port dropped; click-id param dropped; params sorted
    assert (
        _canon(spark, "https://a.io:443/p?b=2&a=1&gclid=z")
        == "https://a.io/p?a=1&b=2"
    )
    # missing scheme -> default_scheme; empty path -> '/'
    assert _canon(spark, "example.net") == "http://example.net/"
    # trailing host dot dropped; path case preserved
    assert _canon(spark, "http://Example.org./Case") == "http://example.org/Case"
    # all params stripped -> '?' disappears
    assert _canon(spark, "http://a.com/x?utm_a=1&utm_b=2") == "http://a.com/x"
    # '&&' / empty params dropped
    assert _canon(spark, "http://a.com/x?b=2&&a=1") == "http://a.com/x?a=1&b=2"
    assert _canon(spark, None) is None
    assert (
        _canon(spark, "http://www.a.com/x", strip_www=True) == "http://a.com/x"
    )
    # percent-encoding is NOT decoded (different resources must not merge)
    assert _canon(spark, "http://a.com/a%2Fb") == "http://a.com/a%2Fb"


def test_url_parts_fragment_and_query(spark):
    df = spark.createDataFrame(
        [("http://h.com/p?q=1#frag?notquery",)], "url string"
    )
    p = url_parts("url")
    row = df.select(
        p["scheme"].alias("s"), p["host"].alias("h"),
        p["path"].alias("pa"), p["query"].alias("q"),
    ).collect()[0]
    # the '?' inside the fragment must not be parsed as a query
    assert (row["s"], row["h"], row["pa"], row["q"]) == (
        "http", "h.com", "/p", "q=1"
    )


def test_registrable_domain(spark):
    hosts = [
        (1, "www.example.com"),
        (2, "news.example.co.uk"),  # 2-label public suffix
        (3, "blog.sub.example.github.io"),  # private-section suffix
        (4, "example.com"),  # already registrable
        (5, "com"),  # bare suffix -> NULL
        (6, "localhost"),  # single unlisted label -> NULL
        (7, "host.unlistedtld"),  # fallback: last-2-labels rule
        (8, ""),
        (9, None),
    ]
    df = spark.createDataFrame(hosts, "i long, h string")
    out = {
        r["i"]: r["d"]
        for r in df.select(
            "i", registrable_domain("h").alias("d")
        ).collect()
    }
    assert out[1] == "example.com"
    assert out[2] == "example.co.uk"
    assert out[3] == "example.github.io"
    assert out[4] == "example.com"
    assert out[5] is None
    assert out[6] is None
    assert out[7] == "host.unlistedtld"
    assert out[8] is None and out[9] is None
    # custom suffix list overrides the built-in snapshot
    custom = df.where("i = 2").select(
        registrable_domain("h", suffixes=["uk"]).alias("d")
    ).collect()[0]["d"]
    assert custom == "co.uk"
    # longest suffix wins over its own tail ('co.uk' over 'uk')
    assert "co.uk" in PUBLIC_SUFFIXES and "uk" in PUBLIC_SUFFIXES
    # suffix matching honors entries LONGER than the built-in
    # snapshot's 2 labels (full-PSL private rules reach 5): a 5-label
    # rule must win, not silently fall through to the 'com' rule
    deep = spark.createDataFrame(
        [(1, "bucket.s3.dualstack.ap-northeast-1.amazonaws.com")],
        "i long, h string",
    ).select(
        registrable_domain(
            "h",
            suffixes=["com", "s3.dualstack.ap-northeast-1.amazonaws.com"],
        ).alias("d")
    ).collect()[0]["d"]
    assert deep == "bucket.s3.dualstack.ap-northeast-1.amazonaws.com"


def test_registrable_domain_wildcard_and_exception_rules(spark):
    """PSL wildcard (`*.`) and exception (`!`) rules (VERDICT r8 #3):
    *.ck makes <label>.ck a public suffix, !www.ck carves www.ck back
    out as registrable, and the amazonaws platform wildcard keeps
    distinct customers' hosts from merging into one domain."""
    hosts = [
        (1, "shop.coral.ck"),  # *.ck: suffix coral.ck -> +1 label
        (2, "coral.ck"),  # IS a wildcard-matched suffix -> NULL
        (3, "ck"),  # bare last label -> NULL
        (4, "www.ck"),  # exception rule: itself registrable
        (5, "x.www.ck"),  # under the exception -> www.ck
        (6, "a.b.www.ck"),
        (7, "vm1.host.compute.amazonaws.com"),  # *.compute.amazonaws.com
        (8, "host.compute.amazonaws.com"),  # IS the wildcard suffix
        (9, "compute.amazonaws.com"),  # only 'com' matches -> eTLD+1
        (10, "a.foo.bd"),
        (11, "foo.bd"),
    ]
    df = spark.createDataFrame(hosts, "i long, h string")
    out = {
        r["i"]: r["d"]
        for r in df.select("i", registrable_domain("h").alias("d")).collect()
    }
    assert out[1] == "shop.coral.ck"
    assert out[2] is None
    assert out[3] is None
    assert out[4] == "www.ck"
    assert out[5] == "www.ck"
    assert out[6] == "www.ck"
    assert out[7] == "vm1.host.compute.amazonaws.com"
    assert out[8] is None
    assert out[9] == "amazonaws.com"
    assert out[10] == "a.foo.bd"
    assert out[11] is None


def test_canonical_url_empty_host_is_null(spark):
    """Schemeless path-only and empty-authority URLs canonicalize to
    NULL (ADVICE r8: 'http:///robots.txt'-style keys would merge
    distinct malformed resources in url_dedup)."""
    assert _canon(spark, "/robots.txt") is None
    assert _canon(spark, "http:///x") is None
    assert _canon(spark, "relative/path.html") is not None  # host-like
    # ...and url_dedup drops the NULL-canonical rows entirely
    df = spark.createDataFrame(
        [(1, "/robots.txt"), (2, "/favicon.ico"), (3, "http://a.com/x")],
        "doc_id long, url string",
    )
    out = url_dedup(df).collect()
    assert len(out) == 1 and out[0]["canonical_url"] == "http://a.com/x"


def test_url_word_score_and_filter_urls(spark):
    df = spark.createDataFrame(
        [
            (1, "http://ads.example.com/casino/slots?ref=spam"),
            (2, "http://docs.example.com/guide"),
            (3, None),
        ],
        "doc_id long, url string",
    )
    terms = {"casino": 2.0, "slots": 1.5, "spam": 1.0, "ads": 0.5}
    scored = df.select(
        "doc_id", url_word_score("url", terms).alias("s")
    ).collect()
    by_id = {r["doc_id"]: r["s"] for r in scored}
    assert by_id[1] == 5.0  # 0.5 + 2.0 + 1.5 + 1.0
    assert by_id[2] == 0.0
    assert by_id[3] is None
    kept = filter_urls(df, terms=terms, threshold=1.0)
    ids = sorted(r["doc_id"] for r in kept.collect())
    assert ids == [2, 3]  # NULL url kept (no evidence), spammy dropped
    with pytest.raises(ValueError):
        url_word_score("url", {})


def test_filter_domains_blocklist_anti_join(spark):
    df = spark.createDataFrame(
        [
            (1, "http://bad.example.org/x"),
            (2, "http://sub.bad.example.org/y"),  # same domain
            (3, "http://good.example.com/z"),
            (4, "/robots.txt"),  # no registrable domain
            (5, "http://coral.ck/p"),  # bare wildcard suffix -> no domain
        ],
        "doc_id long, url string",
    )
    bl = spark.createDataFrame(
        [("  Example.ORG ",), ("",)], "domain string"
    )  # entries normalized; empties dropped
    kept = filter_domains(df, bl)
    rows = {r["doc_id"]: r["domain"] for r in kept.collect()}
    assert sorted(rows) == [3, 4, 5]
    assert rows[3] == "example.com" and rows[4] is None
    strict = filter_domains(df, bl, keep_unattributed=False)
    assert sorted(r["doc_id"] for r in strict.collect()) == [3]


def test_cap_per_domain(spark):
    from featurestore_spark.operators.web import cap_per_domain

    rows = [
        # example.com: 3 pages, quality 5/9/7 -> cap 2 keeps ids 2, 3
        (1, "http://a.example.com/x", 5),
        (2, "http://b.example.com/y", 9),
        (3, "http://c.example.com/z", 7),
        # other.org: 1 page, under the cap
        (4, "http://other.org/", 1),
        # no registrable domain: bypasses the cap (both kept)
        (5, "/robots.txt", 0),
        (6, "/favicon.ico", 0),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, q int")
    out = {r["doc_id"]: r["domain"] for r in
           cap_per_domain(df, 2, order_col="q").collect()}
    assert sorted(out) == [2, 3, 4, 5, 6]
    assert out[2] == "example.com" and out[5] is None
    strict = cap_per_domain(df, 2, order_col="q", keep_unattributed=False)
    assert sorted(r["doc_id"] for r in strict.collect()) == [2, 3, 4]
    # order_col=None -> keep-first by id
    first = cap_per_domain(df, 2)
    kept = {r["doc_id"] for r in first.collect()}
    assert {1, 2}.issubset(kept) and 3 not in kept
    with pytest.raises(ValueError, match="cap must be"):
        cap_per_domain(df, 0)
    # rank-limit pushdown: the window must plan a WindowGroupLimit
    # (each map task pre-prunes to its local top-cap per domain
    # before the shuffle — the 100-TB shape)
    plan = (
        cap_per_domain(df, 2, order_col="q")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in plan


def test_parse_suffix_rules_psl_file_format():
    """A raw PSL file feeds in verbatim (ADVICE r9 #3): `//` comment
    lines and blank lines are skipped, rules read up to the first
    whitespace, and the three rule kinds still split correctly."""
    from featurestore_spark.operators.web import parse_suffix_rules

    raw = [
        "// ===BEGIN ICANN DOMAINS===",
        "",
        "   ",
        "com",
        "CO.UK  // not a real PSL comment form, but trailing ws happens",
        "*.ck",
        "!www.ck",
        "// ===END===",
    ]
    exact, wildcard, exception = parse_suffix_rules(raw)
    assert exact == ["com", "co.uk"]
    assert wildcard == ["ck"]
    assert exception == ["www.ck"]
    # ...and an empty-string rule can no longer arise from blank lines
    assert "" not in exact


def test_url_word_score_case_colliding_terms(spark):
    """Keys differing only in case must not become duplicate map keys
    (ADVICE r9 #1): equal weights merge, conflicting weights raise a
    clear ValueError instead of an opaque executor error."""
    df = spark.createDataFrame([(1, "http://x.com/casino")], "doc_id long, url string")
    merged = df.select(
        url_word_score("url", {"Casino": 2.0, "casino": 2.0}).alias("s")
    ).collect()[0]["s"]
    assert merged == 2.0  # counted once, not twice
    with pytest.raises(ValueError, match="lowercase form"):
        url_word_score("url", {"Casino": 2.0, "casino": 3.0})


def test_url_dedup_collapses_tracking_variants(spark):
    df = spark.createDataFrame(
        [
            (1, "http://A.com/x?utm_s=1"),
            (2, "HTTP://a.COM:80/x/"),
            (3, "http://a.com/x#frag"),
            (4, "http://a.com/y"),
            (5, None),
        ],
        "doc_id long, url string",
    )
    out = {r["canonical_url"]: r for r in url_dedup(df).collect()}
    assert out["http://a.com/x"]["keep_id"] == 1
    assert out["http://a.com/x"]["n_dups"] == 3
    assert out["http://a.com/y"]["n_dups"] == 1
    assert len(out) == 2  # NULL url dropped


def test_domain_rollup_counts_duplicate_mass(spark):
    df = spark.createDataFrame(
        [
            (1, "http://a.example.com/x?utm_s=1"),
            (2, "http://b.example.com/x"),
            (3, "http://a.example.com/x"),  # canonical dup of 1
            (4, "http://other.org/"),
        ],
        "doc_id long, url string",
    )
    out = {r["domain"]: r for r in domain_rollup(df).collect()}
    assert out["example.com"]["n_urls"] == 3
    assert out["example.com"]["n_canonical"] == 2
    assert out["example.com"]["min_id"] == 1
    assert out["other.org"]["n_urls"] == 1


def test_web_ops_are_shuffle_free(spark):
    """canonical_url + registrable_domain are pure projections: the
    executed plan over a parquet-free local relation must contain no
    Exchange; url_dedup adds exactly the one groupBy exchange."""
    df = spark.range(100).select(
        F.concat(F.lit("http://h"), F.col("id") % 7, F.lit(".example.com/p")).alias(
            "url"
        ),
        F.col("id").alias("doc_id"),
    )
    proj = df.select(canonical_url("url"), registrable_domain("url"))
    proj.collect()
    plan = proj._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    dd = url_dedup(df)
    dd.collect()
    plan = dd._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2  # partial+final agg of ONE groupBy


def test_refinedweb_pipeline_matches_hand_wired_chain(spark):
    """refinedweb_pipeline == the hand-wired stage chain (composition
    identity), with None knobs skipping their stages and the
    terms/threshold pairing enforced — the library preset must be
    byte-equivalent to what a user would assemble by hand (the
    q_refinedweb_e2e oracle pins the full chain end-to-end; this pins
    the knob plumbing)."""
    from featurestore_spark.operators.curation import dedup_lines
    from featurestore_spark.operators.pipelines import refinedweb_pipeline
    from featurestore_spark.operators.web import cap_per_domain

    rows = [
        # example.com: three canonical-distinct pages (one a tracking
        # dup of doc 1), one blocked-domain page, one scored-out page
        (1, "http://a.example.com/x?utm_s=1", "shared line\nkeep a1", 20),
        (2, "http://a.example.com/x", "dup of 1 by canonical", 19),
        (3, "http://a.example.com/y", "shared line\nkeep a3", 30),
        (4, "http://a.example.com/z", "keep a4 shortest", 10),
        (5, "http://bad.org/p", "blocked domain", 25),
        (6, "http://ok.net/casino/p", "scored out", 25),
        (7, None, "null url drops", 25),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, text string, n_chars int")
    bl = spark.createDataFrame([("bad.org",)], "domain string")
    terms = {"casino": 1.0}

    got = refinedweb_pipeline(
        df, blocklist=bl, terms=terms, url_threshold=0.5,
        cap=2, cap_order_col="n_chars", curate=None, dedup=None,
    )
    # hand-wired: url_dedup -> blocklist -> score -> cap -> line dedup
    from featurestore_spark.operators.web import (
        filter_domains,
        filter_urls,
        url_dedup,
    )

    dd = url_dedup(df)
    keep = dd.select(F.col("keep_id").alias("doc_id"), "canonical_url").join(
        df.select("doc_id", "text", "n_chars"), "doc_id"
    )
    keep = filter_domains(keep, bl, "canonical_url")
    keep = filter_urls(keep, "canonical_url", terms=terms, threshold=0.5)
    capped = cap_per_domain(keep, 2, "canonical_url", order_col="n_chars")
    want = dedup_lines(
        capped.select("doc_id", "text"), max_docs=1, collapse_exact=True
    ).select("doc_id", "text")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # the cap kept the two LONGEST example.com pages; the shared line
    # (2 docs) dropped from both
    out = dict(got.collect())
    assert set(out) == {1, 3}
    assert out[1] == "keep a1" and out[3] == "keep a3"

    # None knobs skip stages: no blocklist/score/cap/line-dedup ->
    # every canonical-distinct page survives with text untouched
    raw = refinedweb_pipeline(df, line_max_docs=None, curate=None, dedup=None)
    assert {r["doc_id"] for r in raw.collect()} == {1, 3, 4, 5, 6}
    assert dict(raw.collect())[1] == "shared line\nkeep a1"

    # html_col: default extraction is strip_html
    hdf = spark.createDataFrame(
        [(1, "http://a.com/x", "<p>Hello <b>world</b></p>")],
        "doc_id long, url string, page string",
    )
    stripped = refinedweb_pipeline(
        hdf, html_col="page", line_max_docs=None, curate=None, dedup=None
    )
    assert stripped.collect()[0]["text"] == "Hello world"

    # terms without threshold (and vice versa) fails fast
    with pytest.raises(ValueError, match="url_threshold"):
        refinedweb_pipeline(df, terms=terms)
    with pytest.raises(ValueError, match="url_threshold"):
        refinedweb_pipeline(df, url_threshold=0.5)


def test_refinedweb_pipeline_full_stack_gates(spark):
    """The optional trained gates (round 11): lid_model/lid_keep
    filters by lid_classify prediction right after extraction;
    quality_model/quality_threshold gates after the rules — each
    equal to the hand-wired composition; knob pairings fail fast."""
    from featurestore_spark.operators.pipelines import refinedweb_pipeline
    from featurestore_spark.operators.text import (
        lid_classify,
        lid_fit,
        quality_fit,
        quality_gate,
    )

    seeds = spark.createDataFrame(
        [
            (0, "en", "hq", "the cat and the dog and the hat then"),
            (1, "en", "lq", "click the free offer now buy cheap here"),
            (2, "fi", "hq", "kissa ja koira ja sitten katto tuli"),
            (3, "fi", "lq", "osta nyt halpa tarjous klikkaa tasta heti"),
        ],
        "doc_id long, lang string, label string, text string",
    )
    lid_m = lid_fit(seeds, "lang")
    q_m = quality_fit(seeds, "label")
    docs = spark.createDataFrame(
        [
            (10, "http://a.com/1", "the cat and the dog sat then"),
            (11, "http://a.com/2", "kissa ja koira katto sitten"),
            (12, "http://a.com/3", "click the free offer buy now"),
        ],
        "doc_id long, url string, text string",
    )
    got = refinedweb_pipeline(
        docs,
        lid_model=lid_m, lid_keep="en",
        quality_model=q_m, quality_threshold=0.0,
        line_max_docs=None, curate=None, dedup=None,
    )
    # hand-wired: url dedup is a no-op here (distinct urls); LID keeps
    # the en docs (10, 12); the quality gate then drops the spammy 12
    base = docs.select("doc_id", "text")
    lid_keep = lid_classify(base, lid_m).where("lang_pred = 'en'").select("doc_id")
    gated = quality_gate(
        base.join(lid_keep, "doc_id", "left_semi"), q_m, threshold=0.0
    ).select("doc_id", "text")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, gated.collect()))
    assert {r["doc_id"] for r in got.collect()} == {10}
    # knob pairing contracts
    with pytest.raises(ValueError, match="lid_keep"):
        refinedweb_pipeline(docs, lid_model=lid_m)
    with pytest.raises(ValueError, match="lid_keep"):
        refinedweb_pipeline(docs, lid_keep="en")
    with pytest.raises(ValueError, match="exactly one"):
        refinedweb_pipeline(docs, quality_model=q_m)
    with pytest.raises(ValueError, match="exactly one"):
        refinedweb_pipeline(
            docs, quality_model=q_m, quality_threshold=0.0,
            quality_top_frac=0.5,
        )
    with pytest.raises(ValueError, match="need quality_model"):
        refinedweb_pipeline(docs, quality_threshold=0.0)


# -- outlink graph + domain ranking -------------------------------------------


def test_extract_links_quotes_filters_and_order(spark):
    from featurestore_spark.operators.web import extract_links

    html = (
        '<a href="https://b.com/1">x</a>'
        "<A HREF='https://c.com/2'>y</A>"   # single quotes, upper attr
        '<a href="/relative">r</a>'
        '<a href="mailto:z@q.com">m</a>'
        '<a href="javascript:void(0)">j</a>'
        '<a href = "HTTPS://b.com/3">spaced eq, upper scheme</a>'
    )
    df = spark.createDataFrame([(html,)], "html string")
    [row] = df.select(extract_links("html").alias("l")).collect()
    assert row["l"] == ["https://b.com/1", "https://c.com/2", "HTTPS://b.com/3"]
    [raw] = df.select(
        extract_links("html", absolute_only=False).alias("l")
    ).collect()
    assert "/relative" in raw["l"] and "mailto:z@q.com" in raw["l"]
    # no hrefs / NULL html -> empty / NULL, never an error
    df2 = spark.createDataFrame([("<p>none</p>",), (None,)], "html string")
    got = [r["l"] for r in df2.select(extract_links("html").alias("l")).collect()]
    assert got == [[], None]


def test_link_graph_edges_weights_and_drops(spark):
    from featurestore_spark.operators.web import link_graph

    rows = [
        # a.com -> b.com twice (one edge, n_links=2), -> a.com self-loop
        (1, "https://a.com/x",
         '<a href="https://b.com/1">1</a><a href="https://sub.b.com/2">2</a>'
         '<a href="https://a.com/self">s</a>'),
        # malformed src URL -> dropped
        (2, "/robots.txt", '<a href="https://b.com/3">3</a>'),
        # dst with no registrable domain (bare suffix) -> dropped
        (3, "https://b.com/y", '<a href="https://com/">tld</a>'
         '<a href="https://a.com/back">b</a>'),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, html string")
    got = {
        (r["src_domain"], r["dst_domain"]): r["n_links"]
        for r in link_graph(df).collect()
    }
    assert got == {("a.com", "b.com"): 2, ("b.com", "a.com"): 1}
    loops = link_graph(df, drop_self_loops=False)
    assert (
        "a.com",
        "a.com",
    ) in {(r["src_domain"], r["dst_domain"]) for r in loops.collect()}


def test_link_graph_fences_domain_tree_out_of_filters(spark):
    """Codegen-blowup regression pin (VERDICT r11): the null/self-loop
    filters must see src_domain/dst_domain as plan_fence Generate
    OUTPUTS, not re-inline the registrable_domain regex/CASE tree —
    the inlined form put the tree in the Filter, the Project AND the
    FileScan DataFilters, blew janino's 64 KB method limit, and the
    whole per-page stage ran interpreted. The pin: no Filter node and
    no scan-pushed filter may contain a regexp/CASE expression."""
    from featurestore_spark.operators.web import link_graph

    df = spark.createDataFrame(
        [(1, "https://a.com/x", '<a href="https://b.com/1">1</a>')],
        "doc_id long, url string, html string",
    )
    plan = link_graph(df)._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Filter" in line or "PushedFilters" in line:
            assert "regexp" not in line, line
            assert "CASE WHEN" not in line, line
    # the fence itself is present: a Generate explode feeding the agg
    assert "Generate explode" in plan


def _pr_edges(spark):
    from featurestore_spark.operators.web import link_graph

    rows = [
        (1, "https://a.com/x",
         '<a href="https://b.com/1">1</a><a href="https://b.com/2">2</a>'
         '<a href="https://c.com/1">3</a>'),
        (2, "https://b.com/y", '<a href="https://a.com/z">back</a>'),
        (3, "https://c.com/z", "no links: dangling node"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, html string")
    return link_graph(df)


def test_domain_pagerank_conserves_mass_and_ranks_sensibly(spark):
    from featurestore_spark.operators.web import domain_pagerank

    edges = _pr_edges(spark)
    out = {
        r["domain"]: r["pr"]
        for r in domain_pagerank(edges, iterations=20).collect()
    }
    assert set(out) == {"a.com", "b.com", "c.com"}
    # dangling redistribution keeps total rank mass at exactly 1
    assert abs(sum(out.values()) - 1.0) < 1e-12
    # near the fixpoint: a.com receives b.com's WHOLE vote while
    # b.com and c.com each receive half of a.com's — so a outranks
    # both and b == c (they have identical in-link structure)
    assert out["a.com"] > out["b.com"]
    assert abs(out["b.com"] - out["c.com"]) < 1e-9
    # weighted variant splits a.com's vote 2:1 toward b.com
    w = {
        r["domain"]: r["pr"]
        for r in domain_pagerank(
            edges, weight_col="n_links", iterations=20
        ).collect()
    }
    assert w["b.com"] > w["c.com"]
    assert abs(sum(w.values()) - 1.0) < 1e-12


def test_domain_pagerank_validation_and_plan_shape(spark):
    from featurestore_spark.operators.web import domain_pagerank

    edges = _pr_edges(spark)
    with pytest.raises(ValueError, match="damping"):
        domain_pagerank(edges, damping=1.0)
    with pytest.raises(ValueError, match="iterations"):
        domain_pagerank(edges, iterations=0)
    with pytest.raises(ValueError, match="checkpoint_every"):
        domain_pagerank(edges, checkpoint_every=0)
    # one un-truncated iteration stays a pure plan: the only
    # nested-loop joins are the broadcast one-row scalar attaches
    # (N, dangling mass) — never a full cartesian product
    plan = (
        domain_pagerank(edges, iterations=1, checkpoint_every=None)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan


def test_domain_pagerank_seeded_continuation(spark):
    from featurestore_spark.operators.web import domain_pagerank

    edges = _pr_edges(spark)
    full = {
        r["domain"]: r["pr"]
        for r in domain_pagerank(edges, iterations=5).collect()
    }
    # 3 iterations, then resume with the output as the seed for 2
    # more: same trajectory as 5 in one call (up to the float
    # renormalization of the seed vector)
    stage1 = domain_pagerank(edges, iterations=3)
    resumed = {
        r["domain"]: r["pr"]
        for r in domain_pagerank(
            edges, iterations=2, seed_ranks=stage1
        ).collect()
    }
    assert set(resumed) == set(full)
    assert all(abs(resumed[v] - full[v]) < 1e-12 for v in full)
    # recrawl expansion: a new dangling node enters the graph; it
    # seeds at 1/N, the vector renormalizes, and mass stays 1
    grown = edges.unionByName(
        spark.createDataFrame(
            [("a.com", "new.org", 1)],
            "src_domain string, dst_domain string, n_links int",
        )
    )
    out = domain_pagerank(grown, iterations=1, seed_ranks=stage1).collect()
    assert {r["domain"] for r in out} >= {"new.org"}
    assert abs(sum(r["pr"] for r in out) - 1.0) < 1e-12


def test_merge_link_graphs_equals_whole_crawl(spark):
    from featurestore_spark.operators.web import link_graph, merge_link_graphs

    rows = [
        (1, "https://a.com/x", '<a href="https://b.com/1">1</a>'
         '<a href="https://b.com/2">2</a>'),
        (2, "https://b.com/y", '<a href="https://a.com/z">b</a>'),
        (3, "https://a.com/z", '<a href="https://b.com/3">3</a>'),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, html string")
    whole = {
        (r["src_domain"], r["dst_domain"]): r["n_links"]
        for r in link_graph(df).collect()
    }
    merged = merge_link_graphs(
        link_graph(df.where("doc_id < 3")),
        link_graph(df.where("doc_id >= 3")),
    )
    got = {
        (r["src_domain"], r["dst_domain"]): r["n_links"]
        for r in merged.collect()
    }
    assert got == whole
    with pytest.raises(ValueError, match="at least one"):
        merge_link_graphs()
