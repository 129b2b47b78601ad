"""robots.txt parsing + crawl-frontier filtering (RFC 9309): the
politeness gate a production crawler runs BEFORE the URL frontier —
the step upstream of everything in `operators/web.py` (Common Crawl's
CCBot honors exactly these rules; a corpus builder replaying a crawl
needs them to reproduce the fetch set).

Two halves:

- :func:`parse_robots_rules` — per-host robots.txt payloads → a
  match-ready rule frame. Parsing is a line state machine (groups of
  ``User-agent`` lines followed by ``Allow``/``Disallow`` rules), so
  it runs as an Arrow-batched ``mapInPandas`` parser, the same stance
  as the container byte walkers: a parser is not a vectorizable
  expression.
- :func:`filter_allowed` — the frontier filter as ONE broadcastable
  join + pure higher-order Column expressions: rules collected per
  host into a small array, each URL evaluated against it in place
  (no per-URL explode, no second shuffle).

Reference parity note: the reference engine has no crawl surface;
this extends the round-7+ web-ingest family.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from featurestore_spark.operators.web import url_parts

# characters escaped when a robots path rule becomes a regex ('*' and
# the trailing '$' are the rule language's only metacharacters)
_RE_SPECIALS = r"\.^$+?{}[]|()"

# internal column names the frontier operators add and drop; a caller
# frame already carrying one would be silently clobbered, so they are
# rejected up front (ADVICE r12: make the convention enforced)
_RESERVED_COLS = ("_robots_host", "_pathq", "_rules", "_robots_delay")


def _guard_reserved(df: DataFrame, op: str) -> None:
    clash = [c for c in df.columns if c in _RESERVED_COLS]
    if clash:
        raise ValueError(
            f"{op}: input frame carries reserved internal column(s) "
            f"{clash} — rename them before calling (these names are "
            "added and dropped internally and would be clobbered)"
        )


# RFC 3986 unreserved characters: percent-escapes of these decode to
# the literal; everything else stays (uppercased) percent-encoded.
_UNRESERVED = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
# characters a path-plus-query keeps literal under normalization:
# unreserved + sub-delims + path/query punctuation. '*' and '$' stay
# literal on BOTH sides — they are the robots rule language's
# metacharacters, and encoding them on one side only would break
# matching ('%2A' in a rule stays an escaped, literal star).
_KEEP_LITERAL = _UNRESERVED | set("!$&'()*+,;=:@/?")
_HEX = set("0123456789abcdefABCDEF")


def normalize_percent_encoding(s: str) -> str:
    """One canonical percent-encoded form for robots matching
    (RFC 3986 §6.2.2): escapes of UNRESERVED characters decode to the
    literal (`%7E` → `~`), every other valid escape uppercases
    (`%2f` → `%2F`), and literal characters outside the path/query
    safe set — spaces, control bytes, non-ASCII (UTF-8 escaped) — are
    percent-encoded. A bare '%' that starts no valid escape encodes
    as '%25'. Applying this to both a rule path and a frontier
    path-plus-query makes `/a%20b` and `/a b` compare equal."""
    out: list[str] = []
    i, n = 0, len(s)
    while i < n:
        ch = s[i]
        if ch == "%" and i + 2 < n and s[i + 1] in _HEX and s[i + 2] in _HEX:
            byte = int(s[i + 1 : i + 3], 16)
            lit = chr(byte)
            if lit in _UNRESERVED:
                out.append(lit)
            else:
                out.append("%" + s[i + 1 : i + 3].upper())
            i += 3
        elif ch in _KEEP_LITERAL:
            out.append(ch)
            i += 1
        else:
            out.extend(f"%{b:02X}" for b in ch.encode("utf-8"))
            i += 1
    return "".join(out)


def robots_rule_to_regex(rule: str) -> str:
    """A robots.txt path rule → an anchored RE2-portable regex:
    every char escaped except ``*`` (→ ``.*``) and a FINAL ``$``
    (→ end anchor); always anchored at the start (rules are path
    prefixes)."""
    anchored_end = rule.endswith("$")
    body = rule[:-1] if anchored_end else rule
    out = []
    for ch in body:
        if ch == "*":
            out.append(".*")
        elif ch in _RE_SPECIALS:
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "^" + "".join(out) + ("$" if anchored_end else "")


def _robots_groups(txt: str) -> list[tuple[list[str], list[tuple]]]:
    """The ONE robots.txt group state machine: [(agents, records)]
    where records are ('rule', path, allow) and ('delay', value).

    RFC 9309 semantics: ``#`` comments stripped; groups are runs of
    ``User-agent`` lines followed by records; a ``User-agent`` line
    after records starts a new group. Only ``Allow``/``Disallow``
    end a user-agent run — other fields (Crawl-delay, Sitemap,
    unknown) leave it OPEN (RFC 9309 §2.2.4 ignore-unknown-lines;
    Google's reference parser agrees), so 'User-agent: a /
    Crawl-delay: 5 / User-agent: b / Disallow: /x' is ONE group
    where a and b share both records. Ending the run on unknown
    fields used to split the group and fail OPEN (ADVICE r11).
    ``Crawl-delay`` is captured as a group record (the de-facto
    Bing/Yandex extension) but never splits a run either."""
    groups: list[tuple[list[str], list[tuple]]] = []
    cur_agents: list[str] = []
    cur_records: list[tuple] = []
    in_agent_run = False
    for raw in re.split(r"\r\n|\r|\n", txt):
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not in_agent_run:
                if cur_agents:
                    groups.append((cur_agents, cur_records))
                cur_agents, cur_records = [], []
                in_agent_run = True
            cur_agents.append(value.lower())
        elif field in ("allow", "disallow"):
            in_agent_run = False
            if not cur_agents:
                continue  # record before any user-agent line: ignored
            if value == "":
                continue  # empty Disallow/Allow = no rule
            cur_records.append(("rule", value, field == "allow"))
        elif field == "crawl-delay":
            if cur_agents:
                cur_records.append(("delay", value))
    if cur_agents:
        groups.append((cur_agents, cur_records))
    return groups


def _effective_records(txt: str | None, agent: str) -> list[tuple]:
    """The agent's effective record list: every group naming its
    token (case-insensitive exact match), falling back to every
    ``*`` group when none does; groups for the same agent merge.
    Malformed/empty payloads yield [] (allow everything — the
    fail-open direction robots.txt specifies for missing files)."""
    if not txt:
        return []
    agent = agent.lower()
    groups = _robots_groups(txt)
    if any(agent in agents for agents, _ in groups):
        return [r for agents, recs in groups if agent in agents for r in recs]
    return [r for agents, recs in groups if "*" in agents for r in recs]


def parse_robots_txt(
    txt: str | None, agent: str, *, normalize: bool = False
) -> list[tuple[str, int, bool]]:
    """Stdlib-only parse of ONE robots.txt for one crawler token:
    [(regex, rule_len, allow)] for the agent's effective group(s)
    (see :func:`_robots_groups` / :func:`_effective_records` for the
    group semantics). An empty ``Disallow:`` value is allow-all (no
    rule emitted). ``rule_len`` is the rule's UTF-8 octet length —
    the most-specific-match key. ``normalize=True`` canonicalizes the
    rule path's percent-encoding first (see
    :func:`normalize_percent_encoding`) — pair it with the same flag
    on :func:`filter_allowed`; rule_len is then the NORMALIZED
    length, so specificity stays consistent between a rule written
    `/a%20b` and one written `/a b`."""
    rules = []
    for rec in _effective_records(txt, agent):
        if rec[0] != "rule":
            continue
        path = normalize_percent_encoding(rec[1]) if normalize else rec[1]
        rules.append(
            (robots_rule_to_regex(path), len(path.encode("utf-8")), rec[2])
        )
    return rules


def parse_crawl_delay(txt: str | None, agent: str) -> float | None:
    """Crawl-delay (seconds) for one crawler token, or None when the
    agent's effective group(s) declare none. Crawl-delay is a
    de-facto extension (honored by Bing/Yandex, ignored by Google),
    group-scoped like the path rules. Non-numeric, negative, or
    non-finite values ('inf', '9e999' — robots.txt is
    attacker-controlled input, and an infinite delay would poison
    every downstream fetch_at_s) are ignored (fail toward the
    crawler's own default); multiple declarations take the MAXIMUM —
    the conservative direction for a politeness control."""
    import math

    delays = []
    for rec in _effective_records(txt, agent):
        if rec[0] != "delay":
            continue
        try:
            v = float(rec[1])
        except ValueError:
            continue
        if math.isfinite(v) and v >= 0:
            delays.append(v)
    return max(delays) if delays else None


def parse_robots_rules(
    df: DataFrame,
    *,
    agent: str = "ccbot",
    host_col: str = "host",
    robots_col: str = "robots_txt",
    normalize: bool = False,
) -> DataFrame:
    """Per-host robots.txt payloads → (host, rule_regex, rule_len,
    allow): the match-ready rule frame :func:`filter_allowed` joins
    against. Arrow-batched mapInPandas over the text only; hosts
    whose payload yields no applicable rules emit no rows (absent
    rows mean allow-all downstream, the robots fail-open default).
    At crawl scale this frame is hosts × a handful of rules — far
    smaller than the frontier, usually broadcastable.
    ``normalize=True`` canonicalizes each rule path's
    percent-encoding (pass the same flag to :func:`filter_allowed`
    so both sides compare in one form)."""
    out_schema = (
        f"{host_col} string, rule_regex string, rule_len int, allow boolean"
    )

    def batches(it):
        import pandas as pd

        for pdf in it:
            rows = []
            for _, row in pdf.iterrows():
                for regex, rlen, allow in parse_robots_txt(
                    row[robots_col], agent, normalize=normalize
                ):
                    rows.append(
                        {
                            host_col: row[host_col],
                            "rule_regex": regex,
                            "rule_len": rlen,
                            "allow": allow,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[host_col, "rule_regex", "rule_len", "allow"]
            )

    return df.select(host_col, robots_col).mapInPandas(
        batches, schema=out_schema
    )


def filter_allowed(
    urls: DataFrame,
    rules: DataFrame,
    *,
    url_col: str = "url",
    host_col: str = "host",
    keep_verdict: bool = False,
    normalize: bool = False,
) -> DataFrame:
    """Frontier politeness filter: keep the URLs robots.txt allows.

    Matching (RFC 9309 §2.2.2): a URL's path-plus-query is tested
    against every rule for its HOST (robots scope is the host, not
    the registrable domain); the MOST SPECIFIC match — longest
    ``rule_len`` — decides, an Allow winning length ties (the
    least-restrictive tie-break). No matching rule, or no rules for
    the host at all, means allowed (fail-open, as the protocol
    specifies for a missing robots.txt).

    Execution shape: rules collapse to one small array per host
    (collect_list groupBy), the frontier left-joins that frame (AQE
    broadcasts it at realistic sizes), and the per-URL decision is a
    pure higher-order fold over the array — no per-URL rule explode,
    no second exchange, nothing collects. ``keep_verdict=True``
    returns ALL rows with the boolean ``robots_allowed`` instead of
    filtering (for audit/yield accounting).

    Encoding: by default rule paths and frontier URL paths are
    compared VERBATIM — so a rule ``/a%20b`` only matches a URL whose
    stored path is also ``/a%20b``. A frontier built by this repo's
    web family satisfies this (URLs are kept in their fetched
    percent-encoded form, the same form robots.txt files publish
    rules in). For frontiers built elsewhere (decoded paths, mixed
    escape casing), pass ``normalize=True`` HERE AND on
    :func:`parse_robots_rules`: both sides are canonicalized to one
    percent-encoded form (:func:`normalize_percent_encoding`) before
    matching — ``/a b`` then matches a ``/a%20b`` rule. The URL-side
    normalization runs as an Arrow-batched pandas UDF (a per-byte
    state walk is not a Column expression), so leave it off when the
    frontier is already in fetched form — the default path stays
    whole-stage-codegen pure."""
    _guard_reserved(urls, "filter_allowed")
    _guard_reserved(rules.drop("rule_regex", "rule_len", "allow"),
                    "filter_allowed (rules)")
    p = url_parts(url_col)
    pathq = F.concat(
        F.when(p["path"] == "", F.lit("/")).otherwise(p["path"]),
        F.when(p["query"] != "", F.concat(F.lit("?"), p["query"])).otherwise(
            F.lit("")
        ),
    )
    if normalize:
        from pyspark.sql.functions import pandas_udf
        from pyspark.sql.types import StringType

        def _norm_series(s):
            return s.map(
                lambda v: None if v is None
                else normalize_percent_encoding(v)
            )

        _norm = pandas_udf(_norm_series, StringType())
        pathq = _norm(pathq)
    # the derived join key lives under a collision-proof internal
    # name so a caller's own 'host' column survives untouched
    # (ADVICE r11: withColumn(host_col, ...) used to clobber it)
    per_host = rules.groupBy(host_col).agg(
        F.collect_list(
            F.struct(
                F.col("rule_regex"), F.col("rule_len"), F.col("allow")
            )
        ).alias("_rules")
    ).withColumnRenamed(host_col, "_robots_host")
    with_host = urls.withColumn("_robots_host", p["host"]).withColumn(
        "_pathq", pathq
    )
    j = with_host.join(per_host, "_robots_host", "left")
    matched = F.filter(
        F.col("_rules"),
        lambda r: F.regexp_like(F.col("_pathq"), r["rule_regex"]),
    )
    # fold to the most specific rule: longer wins, allow wins ties
    best = F.aggregate(
        matched,
        F.struct(
            F.lit(-1).alias("rule_len"), F.lit(True).alias("allow")
        ),
        lambda acc, r: F.when(
            (r["rule_len"] > acc["rule_len"])
            | ((r["rule_len"] == acc["rule_len"]) & r["allow"]),
            F.struct(r["rule_len"].alias("rule_len"), r["allow"].alias("allow")),
        ).otherwise(acc),
    )
    verdict = F.when(F.col("_rules").isNull(), F.lit(True)).otherwise(
        best["allow"]
    )
    out = j.withColumn("robots_allowed", verdict).drop(
        "_rules", "_pathq", "_robots_host"
    )
    if keep_verdict:
        return out
    return out.where(F.col("robots_allowed")).drop("robots_allowed")


def crawl_delays(
    df: DataFrame,
    *,
    agent: str = "ccbot",
    host_col: str = "host",
    robots_col: str = "robots_txt",
) -> DataFrame:
    """Per-host robots.txt payloads → (host, crawl_delay) for the
    hosts that DECLARE a delay for this agent (absent rows mean "use
    the crawler's own default" downstream — same absent-is-default
    stance as :func:`parse_robots_rules`). Arrow-batched mapInPandas
    over the text, then a per-host max aggregate: the output is ONE
    row per delay-declaring host even when the input carries the same
    host several times (refetched robots.txt, unioned snapshots) —
    duplicate delay rows would multiply the frontier through
    :func:`schedule_fetches`'s join. Hosts-sized, broadcastable."""
    out_schema = f"{host_col} string, crawl_delay double"

    def batches(it):
        import pandas as pd

        for pdf in it:
            rows = []
            for _, row in pdf.iterrows():
                d = parse_crawl_delay(row[robots_col], agent)
                if d is not None:
                    rows.append({host_col: row[host_col], "crawl_delay": d})
            yield pd.DataFrame(rows, columns=[host_col, "crawl_delay"])

    parsed = df.select(host_col, robots_col).mapInPandas(
        batches, schema=out_schema
    )
    # max matches parse_crawl_delay's multiple-declaration rule (the
    # conservative politeness direction)
    return parsed.groupBy(host_col).agg(
        F.max("crawl_delay").alias("crawl_delay")
    )


def schedule_fetches(
    frontier: DataFrame,
    delays: DataFrame | None = None,
    *,
    url_col: str = "url",
    id_col: str = "doc_id",
    order_col: str | None = None,
    default_delay_s: float = 1.0,
    host_col: str = "host",
) -> DataFrame:
    """Politeness-budgeted fetch plan: appends per-HOST ``fetch_seq``
    (0-based position in the host's queue) and ``fetch_at_s`` (=
    fetch_seq × the host's effective delay) to the frontier — the
    step that turns an allowed URL set into a rate-limited crawl
    schedule (a crawler shards hosts over workers; within a host,
    fetches are serialized at the Crawl-delay cadence).

    ``delays`` is a :func:`crawl_delays` frame (host → seconds);
    hosts without a row get ``default_delay_s``. Within a host, rows
    rank by ``order_col`` DESCENDING (pass a priority/PageRank
    signal to fetch the best pages first; NULLs last) with ``id_col``
    ascending as the tiebreak.

    Shape at crawl scale: one broadcastable left join (the delay
    frame is hosts-sized) + ONE row_number window keyed on the host.
    The window partition is a host's frontier — the unit a scheduler
    must serialize anyway, so the partition size is the politeness
    constraint itself, not incidental skew. Rows whose URL parses to
    NO host each form their OWN singleton queue (fetch_seq 0,
    fetch_at_s 0.0) via a NUL-prefixed id surrogate — the
    `cap_per_domain` convention: funneling them into one shared
    NULL-host partition would both serialize unrelated unfetchable
    rows as if they were one site and build the exact skewed
    partition a per-host window must avoid. The derived join key
    lives under an internal collision-proof name; the caller's
    columns pass through untouched."""
    if default_delay_s < 0:
        raise ValueError(
            f"schedule_fetches: default_delay_s must be >= 0, "
            f"got {default_delay_s}"
        )
    _guard_reserved(frontier, "schedule_fetches")
    from pyspark.sql import Window

    p = url_parts(url_col)
    j = frontier.withColumn("_robots_host", p["host"])
    if delays is not None:
        d = delays.select(
            F.col(host_col).alias("_robots_host"),
            F.col("crawl_delay").alias("_robots_delay"),
        )
        j = j.join(d, "_robots_host", "left")
    else:
        j = j.withColumn("_robots_delay", F.lit(None).cast("double"))
    order = [F.col(id_col).asc()]
    if order_col is not None:
        order = [F.col(order_col).desc_nulls_last()] + order
    key = F.coalesce(
        F.when(F.col("_robots_host") != "", F.col("_robots_host")),
        F.concat(F.lit("\x00"), F.col(id_col).cast("string")),
    )
    w = Window.partitionBy(key).orderBy(*order)
    seq = (F.row_number().over(w) - 1).cast("int")
    delay = F.coalesce(F.col("_robots_delay"), F.lit(default_delay_s))
    return (
        j.withColumn("fetch_seq", seq)
        .withColumn("fetch_at_s", F.col("fetch_seq") * delay)
        .drop("_robots_host", "_robots_delay")
    )


# ---------------------------------------------------------------------------
# Sitemaps: the discovery side of the politeness protocol (robots.txt
# names them via `Sitemap:` lines; the crawler seeds its frontier from
# them). Pure Column expressions — a sitemap is XML, but the two
# fields a frontier needs (<loc>, <lastmod>) extract with RE2-portable
# regexes, so this stays a zero-exchange projection and an oracle can
# replay it.
# ---------------------------------------------------------------------------


def sitemap_urls_from_robots(txt_col: str | Column = "robots_txt") -> Column:
    """Array of `Sitemap:` URLs declared in a robots.txt payload (the
    field is group-independent per RFC 9309 — every crawler sees every
    line)."""
    c = F.col(txt_col) if isinstance(txt_col, str) else txt_col
    raw = F.regexp_extract_all(
        c, F.lit(r"(?im)^\s*sitemap\s*:\s*(\S+)"), F.lit(1)
    )
    return raw


def is_sitemap_index(xml_col: str | Column = "xml") -> Column:
    """True when the payload is a sitemap INDEX (<sitemapindex> of
    child sitemaps) rather than a urlset — the caller fetches the
    children and parses again."""
    c = F.col(xml_col) if isinstance(xml_col, str) else xml_col
    return c.rlike(r"(?is)<\s*sitemapindex[\s>]")


def extract_sitemap_entries(xml_col: str | Column = "xml") -> Column:
    """Array of struct(loc, lastmod) from a sitemap urlset (or the
    child-sitemap list of an index — both use <loc>/<lastmod> inside
    their entry elements): per-entry blocks via one
    `regexp_extract_all`, fields extracted inside a higher-order
    transform, the five XML entities decoded in `loc` (sitemap spec
    requires escaping them). Entries without a <loc> are dropped;
    `lastmod` is NULL when absent. Zero exchanges."""
    c = F.col(xml_col) if isinstance(xml_col, str) else xml_col
    blocks = F.regexp_extract_all(
        c,
        F.lit(r"(?is)<\s*(?:url|sitemap)\s*>(.*?)</\s*(?:url|sitemap)\s*>"),
        F.lit(1),
    )

    def entry(b: Column) -> Column:
        loc = F.regexp_extract(b, r"(?is)<\s*loc\s*>\s*(.*?)\s*</\s*loc\s*>", 1)
        for ent, ch in [
            ("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
            ("&quot;", '"'), ("&apos;", "'"),
        ]:
            loc = F.replace(loc, F.lit(ent), F.lit(ch))
        lastmod = F.regexp_extract(
            b, r"(?is)<\s*lastmod\s*>\s*(.*?)\s*</\s*lastmod\s*>", 1
        )
        return F.struct(
            loc.alias("loc"),
            F.when(lastmod != "", lastmod).alias("lastmod"),
        )

    return F.filter(F.transform(blocks, entry), lambda s: s["loc"] != "")


def recrawl_staleness(
    lastmod_col: str | Column = "lastmod",
    last_fetched_col: str | Column = "last_fetched",
    *,
    default_stale: bool = True,
) -> Column:
    """Boolean Column: does the sitemap claim the page changed since
    the crawler last fetched it? — the signal that turns a sitemap's
    ``lastmod`` (see :func:`extract_sitemap_entries`) into a recrawl
    DECISION instead of dead metadata (sitemaps exist so crawlers can
    skip unchanged pages; the sitemaps.org protocol's whole point).

    Both columns may be timestamp/date or the sitemap spec's string
    forms (W3C datetime: ``2026-08-16``, ``2026-08-16T10:00:00Z``,
    offset variants) — strings go through ``to_timestamp`` after
    normalizing a trailing ``Z``; dates cast. Rows where EITHER side
    is missing/unparseable fall back to ``default_stale`` (True =
    refetch when unsure, the freshness-biased default; pass False for
    a bandwidth-biased crawl). A never-fetched page (NULL
    last_fetched) is always stale.

    Pure Column expression — compose it with :func:`schedule_fetches`
    as the frontier filter (or its ``order_col``, via a cast to int,
    to just PRIORITIZE changed pages):

        frontier.where(recrawl_staleness())  # refetch changed pages
    """
    def _ts(c: str | Column) -> Column:
        col = F.col(c) if isinstance(c, str) else c
        s = col.cast("string")
        # W3C datetime: date-only parses via to_timestamp; trailing
        # 'Z' normalized to +00:00 (to_timestamp in try-mode returns
        # NULL rather than raising on garbage)
        s = F.regexp_replace(s, r"(?i)Z$", "+00:00")
        return F.try_to_timestamp(s)

    lm, lf = _ts(lastmod_col), _ts(last_fetched_col)
    lf_raw = (
        F.col(last_fetched_col)
        if isinstance(last_fetched_col, str) else last_fetched_col
    )
    return (
        F.when(lf_raw.isNull(), F.lit(True))      # never fetched
        .when(lm.isNull() | lf.isNull(), F.lit(default_stale))
        .otherwise(lm > lf)
    )
