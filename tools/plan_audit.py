#!/usr/bin/env python3
"""Plan-regression gate for the generate-filter inlining pathology.

Scans every catalog query's OPTIMIZED plan for Filter nodes that
contain HOF / regex-family expressions. Two Catalyst behaviors turn
those into real performance bugs (found round 11-12, both fixed with
`operators.materialize.plan_fence`):

1. `InferFiltersFromGenerate` inserts ``size(arr) > 0`` under every
   explode and pushes it past the projection, re-inlining the whole
   array expression into the Filter — where HOF expressions run
   INTERPRETED per row (measured 7x on the sf0.1 LID gram explode).
2. A predicate on a computed alias re-inlines its regex/CASE chain
   into Filter + Project + FileScan DataFilters — up to a janino
   64 KB blowup that drops the stage to interpreted execution
   (q_domain_pagerank, round 11).

A flagged Filter is only a BUG when the expression is duplicated
(also evaluated in a Project/Generate/scan) — a predicate that IS
the operator (a score threshold, the robots verdict fold) evaluates
once and is fine. Every currently-flagged query below was
adjudicated exactly so (PLANS.md round 12); this gate fails when a
NEW query joins the list or an adjudicated one grows MORE flagged
filters, so the pathology cannot silently return.

Usage: python3 tools/plan_audit.py   (exit 0 iff no new findings)
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

# (query -> max allowed HOF-carrying Filter lines), each adjudicated
# as a legitimate single-evaluation predicate in PLANS.md rounds
# 12-13: score-threshold folds (q_url_filter, q_web_funnel), the
# robots longest-match verdict fold (q_crawl_frontier /
# q_fetch_schedule), constraint-propagated self-similarity filters
# on already-materialized distinct-vector frames (the embedding
# family), and fixture-synthesis CASE chains re-inlined into cheap
# codegen'd filters (q_incremental_url_dedup).
ALLOWLIST = {
    # (r14: q_crawl_frontier cleared 4 -> 0 — crawl_pipeline's audit
    # mode now plan_fences the gated frame before the funnel branches,
    # so downstream filters reference the robots verdict as a computed
    # boolean instead of re-inlining the interpreted longest-match
    # fold into a Filter per branch; VERDICT r13 #6)
    # robots longest-match verdict fold, one appearance:
    # crawl_pipeline's robots gate ahead of the fetch scheduler — the
    # predicate is the operator, evaluated once; nothing upstream
    # recomputes it (fencing the single-pass path would add a Generate
    # for zero sharing gain)
    "q_fetch_schedule": 1,
    # constraint-propagated self-similarity filters on the (already
    # materialized) distinct-vector frames — one bounded interpreted
    # eval per distinct vector
    "q_embedding_near_dups": 2,
    "q_incremental_embedding_dedup": 1,
    # (r13: q_ivf_topk / q_ivf_serve cleared — as_double_array now
    # uses the NATIVE array cast instead of a per-element transform,
    # so the inferred size/notnull filters carry a codegen'd Cast, not
    # an HOF; the melt-fence alternative was measured slower and
    # rejected in r12, PLANS.md)
    # fixture-synthesis CASE chains re-inlined into cheap codegen'd
    # filters (no HOF on the hot path)
    "q_incremental_url_dedup": 4,
    # URL word-score threshold folds — the predicate IS the operator,
    # evaluated once per row over the FENCED canonical attribute
    "q_url_filter": 1,
    "q_web_funnel": 1,
    "q_refinedweb_e2e": 1,
}

HOF = re.compile(
    r"(transform|aggregate|lambdafunction|regexp_extract_all|regexp_split)"
)


def flagged_filters(plan: str) -> int:
    hits = 0
    for line in plan.splitlines():
        stripped = line.strip().lstrip(":+- ")
        if stripped.startswith("Filter ") and HOF.search(line):
            hits += 1
    return hits


def main() -> int:
    from featurestore_spark.queries import QUERIES
    from featurestore_spark.session import get_spark

    spark = get_spark("plan-audit", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.001"
    failures = []
    for name, spec in QUERIES.items():
        try:
            plan = (
                spec.spark(spark, sf)
                ._jdf.queryExecution()
                .optimizedPlan()
                .toString()
            )
        except Exception as e:  # a broken query is check_oracle's job
            print(f"SKIP {name}: {type(e).__name__}")
            continue
        hits = flagged_filters(plan)
        allowed = ALLOWLIST.get(name, 0)
        if hits:
            print(f"INFO {name}: {hits} HOF-carrying Filter(s) "
                  f"(allowlist {allowed})")
        if hits > allowed:
            failures.append((name, hits, allowed))
            print(f"FAIL {name}: {hits} HOF-carrying Filter(s), "
                  f"allowlist permits {allowed} — check for a missing "
                  f"plan_fence (see module docstring)")
    if failures:
        print(f"\nplan_audit: {len(failures)} quer"
              f"{'y' if len(failures) == 1 else 'ies'} regressed")
        return 1
    print(f"plan_audit: OK ({len(QUERIES)} plans, "
          f"{len(ALLOWLIST)} adjudicated)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
