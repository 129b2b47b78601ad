"""Cheap opt-in sanity probes for invariants that are too expensive
to check exactly.

The incremental index family (BM25 postings, MinHash band index)
requires merged parts to cover DISJOINT document sets — an exact
check is a full join over the state, which would defeat the
incremental design, so the invariant is normally the caller's.
`verify_disjoint_ids` is the middle ground: three
``approx_count_distinct`` aggregates (HyperLogLog++, default relative
standard deviation 0.05) comparing the union's distinct-id estimate
against the sum of the parts'. A double-ingested batch collapses the
union estimate to ~half the sum — far outside sketch error — while
genuinely disjoint parts agree within it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# approx_count_distinct's default rsd is 0.05; three estimates each
# carry that error, so flag only when the union falls short of the
# sum by more than ~3 combined deviations. Gross misuse (full
# double-ingestion → ratio ~0.5) is far below this; small legitimate
# boundary overlaps may pass — this is a misuse tripwire, not an
# exact validator.
_TOLERANCE = 0.85


def verify_disjoint_ids(
    a: DataFrame, b: DataFrame, id_col: str, op_name: str
) -> None:
    """Raise ``ValueError`` when the distinct ``id_col`` sets of ``a``
    and ``b`` grossly overlap (sketch-based; see module docstring).
    Runs three Spark actions — call only behind an explicit
    ``verify=True`` knob."""
    ea = a.agg(F.approx_count_distinct(id_col)).collect()[0][0]
    eb = b.agg(F.approx_count_distinct(id_col)).collect()[0][0]
    eu = (
        a.select(F.col(id_col).alias("_id"))
        .unionByName(b.select(F.col(id_col).alias("_id")))
        .agg(F.approx_count_distinct("_id"))
        .collect()[0][0]
    )
    if eu < _TOLERANCE * (ea + eb):
        raise ValueError(
            f"{op_name}: the two parts' {id_col} sets overlap "
            f"(~{ea} + ~{eb} distinct ids but only ~{eu} in the "
            "union) — merging them would double-count. Each part "
            "must cover a disjoint document set; a re-ingested batch "
            "must be deduplicated (or the existing part replaced) "
            "before the merge."
        )
