"""Plan-regression pins for the generate-filter inlining pathology
(tools/plan_audit.py is the full-catalog gate; this is the fast
in-suite subset over the queries that were actually pathological
before their fences landed, plus exact-count pins for a sample of
the adjudicated allowlist)."""

import pytest

from featurestore_spark.queries import QUERIES
from tools.plan_audit import ALLOWLIST, flagged_filters

SF = "/root/testdata/sf0.001"

# queries whose plans carried DUPLICATED HOF evaluations before the
# r12 fences — a regression here means a fence was dropped
FENCED_CLEAN = [
    # r13: the IVF pair cleared via the native array cast (no HOF to
    # duplicate) — pinned clean alongside the fenced queries
    "q_ivf_topk",
    "q_ivf_serve",
    "q_lid_classify",
    "q_nb_classify",
    "q_quality_classify",
    "q_main_content",
    "q_sitemap",
    "q_bm25_topk",
    "q_bm25_index_topk",
    "q_domain_pagerank",
    "q_url_dedup",
    "q_decontaminate",
    "q_boilerplate",
    "q_ngram_novelty",
    "q_dsir_weights",
]

# adjudicated single-eval predicates: pinned at their exact counts so
# growth is visible (sample — the tool covers the full allowlist)
ALLOWED_SAMPLE = ["q_crawl_frontier", "q_web_funnel", "q_fetch_schedule"]


def _flags(spark, name):
    plan = (
        QUERIES[name]
        .spark(spark, SF)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    return flagged_filters(plan)


@pytest.mark.parametrize("name", FENCED_CLEAN)
def test_fenced_query_has_no_hof_filters(spark, name):
    assert _flags(spark, name) == 0, (
        f"{name}: an HOF expression re-appeared inside a Filter — "
        "a plan_fence was probably dropped (see tools/plan_audit.py)"
    )


@pytest.mark.parametrize("name", ALLOWED_SAMPLE)
def test_adjudicated_query_stays_at_allowlist_count(spark, name):
    assert _flags(spark, name) == ALLOWLIST[name], (
        f"{name}: HOF-carrying Filter count moved off its adjudicated "
        "value — re-adjudicate in tools/plan_audit.py"
    )
