"""Doc/catalog lockstep: the query counts quoted in the COVERAGE.md
and README.md headers must match the live catalog (VERDICT r6 #7 —
the "87 queries" stale-header recurred as a risk every round the
catalog grew; this pins it).

No Spark session needed: importing the catalog registers the specs.
"""

import re
from pathlib import Path

from featurestore_spark.queries import QUERIES

REPO = Path(__file__).resolve().parent.parent


def test_coverage_header_counts_match_catalog():
    text = (REPO / "COVERAGE.md").read_text()
    # "**{N}\nqueries, {M} with full value-hash oracles**" (the bold
    # span may wrap — match across whitespace).
    m = re.search(r"\*\*(\d+)\s+queries,\s+(\d+)\s+with full value-hash", text)
    assert m, "COVERAGE.md header no longer quotes the query counts"
    total, with_oracle = int(m.group(1)), int(m.group(2))
    assert total == len(QUERIES), (
        f"COVERAGE.md says {total} queries; catalog has {len(QUERIES)}"
    )
    n_oracle = sum(1 for s in QUERIES.values() if s.oracle is not None)
    assert with_oracle == n_oracle, (
        f"COVERAGE.md says {with_oracle} oracle-paired; catalog has {n_oracle}"
    )


def test_readme_count_line_matches_catalog():
    text = (REPO / "README.md").read_text()
    m = re.search(r"catalog\.py\s+(\d+) queries, (\d+) paired", text)
    assert m, "README.md tree no longer quotes the query counts"
    total, with_oracle = int(m.group(1)), int(m.group(2))
    assert total == len(QUERIES)
    assert with_oracle == sum(1 for s in QUERIES.values() if s.oracle is not None)


def test_driver_window_has_no_unknown_names():
    from featurestore_spark.queries import catalog
    from featurestore_spark.queries.catalog import _DRIVER_PRIORITY

    unknown = [n for n in _DRIVER_PRIORITY if n not in QUERIES]
    assert not unknown, f"_DRIVER_PRIORITY names absent from QUERIES: {unknown}"
    # Rotation invariant: the tail reorder rebuilds the QUERIES dict —
    # it must reorder, never drop. Count the @_register sites in the
    # source (the pre-reorder registration count) against the live
    # dict, so a reorder that silently discarded unlisted queries
    # would fail here.
    import inspect

    src = inspect.getsource(catalog)
    assert src.count("@_register(") == len(QUERIES)
