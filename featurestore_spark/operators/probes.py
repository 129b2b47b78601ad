"""Cheap opt-in sanity probes for invariants that are too expensive
to check exactly.

The incremental index family (BM25 postings, MinHash band index)
requires merged parts to cover DISJOINT document sets — an exact
check is a full join over the state, which would defeat the
incremental design, so the invariant is normally the caller's.
`verify_disjoint_ids` is the middle ground, with two regimes:

* **Comparable sizes** (within 4x of each other): three
  ``approx_count_distinct`` aggregates (HyperLogLog++, default
  relative standard deviation 0.05) comparing the union's distinct-id
  estimate against the sum of the parts'. A double-ingested part
  collapses the union estimate to ~half the sum — far outside sketch
  error — while genuinely disjoint parts agree within it.
* **Asymmetric sizes** (one part > 4x the other, the incremental
  small-batch-vs-large-index shape): the sketch comparison is BLIND
  here — a fully double-ingested batch shifts the union by only ~the
  batch size, inside the sketch error of the large side — so the
  probe instead counts the overlap EXACTLY with one scan of the
  large part semi-joined against the broadcast distinct ids of the
  small part, and raises when more than ``max_overlap_frac``
  (default a quarter) of the small part's ids already exist in the
  large one.
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

# Sketch regime is valid only while the smaller part is a detectable
# fraction of the union (overlap must exceed 0.15*(ea+eb), i.e. the
# small side must be > ~0.18x the large); beyond 4x asymmetry the
# exact semi-join path runs instead.
_MAX_SKETCH_ASYMMETRY = 4

# Exact regime: raise when this fraction of the small part's distinct
# ids already exists in the large part (full double-ingestion → 1.0;
# legitimate boundary overlap → near 0).
_EXACT_OVERLAP_FRAC = 0.25

# Broadcast the small side's ids only while its ESTIMATED cardinality
# fits comfortably under Spark's broadcast limits (512M-row / 8 GB
# hard caps; long ids ≈ 8 B each → 5e7 ids ≈ 400 MB). Two large-but-
# asymmetric parts (e.g. 500M vs 2.5B ids) still take the exact path,
# as a shuffled left-semi join — the probe must never crash the merge
# it guards.
_EXACT_BROADCAST_CAP = 50_000_000


def verify_disjoint_ids(
    a: DataFrame,
    b: DataFrame,
    id_col: str,
    op_name: str,
    *,
    max_overlap_frac: float | None = None,
) -> None:
    """Raise ``ValueError`` when the distinct ``id_col`` sets of ``a``
    and ``b`` grossly overlap (see module docstring for the two
    regimes). Runs three Spark actions in the sketch regime, two plus
    one large-side scan in the asymmetric one — call only behind an
    explicit ``verify=True`` knob.

    This is a gross-misuse tripwire, NOT an exact disjointness
    validator: in the asymmetric (exact) regime it raises only when
    MORE than ``max_overlap_frac`` (default 0.25) of the smaller
    part's distinct ids already exist in the larger part — a
    partially re-ingested batch below that fraction merges silently
    and double-counts those documents. Pass ``max_overlap_frac=0.0``
    to fail on ANY overlap when the batch is known to be fully fresh
    (costs nothing extra — the overlap count is computed either way).
    The sketch regime's tolerance is HLL-error-bound (``_TOLERANCE``)
    and not configurable — so when ``max_overlap_frac`` is passed
    EXPLICITLY but the size ratio routes the call to the sketch
    regime, a ``UserWarning`` says the strict contract isn't in force
    (the regime choice depends on data sizes the caller may not
    control; the probe itself must never crash the merge it guards)."""
    explicit = max_overlap_frac is not None
    if max_overlap_frac is None:
        max_overlap_frac = _EXACT_OVERLAP_FRAC
    ea = a.agg(F.approx_count_distinct(id_col)).collect()[0][0]
    eb = b.agg(F.approx_count_distinct(id_col)).collect()[0][0]
    if min(ea, eb) * _MAX_SKETCH_ASYMMETRY < max(ea, eb):
        small, large = (a, b) if ea <= eb else (b, a)
        small_ids = small.select(F.col(id_col).alias("_id")).distinct()
        n_small = small_ids.count()
        if n_small == 0:
            return
        if min(ea, eb) <= _EXACT_BROADCAST_CAP:
            small_ids = F.broadcast(small_ids)
        overlap = (
            large.select(F.col(id_col).alias("_id"))
            .join(small_ids, "_id", "left_semi")
            .distinct()
            .count()
        )
        if overlap > max_overlap_frac * n_small:
            raise ValueError(
                f"{op_name}: {overlap} of the smaller part's "
                f"{n_small} distinct {id_col}s already exist in the "
                "larger part — merging them would double-count. Each "
                "part must cover a disjoint document set; a "
                "re-ingested batch must be deduplicated (or the "
                "existing part replaced) before the merge."
            )
        return
    if explicit:
        import warnings

        warnings.warn(
            f"{op_name}: max_overlap_frac={max_overlap_frac} was passed "
            "explicitly, but the parts are similarly sized so the "
            "HLL-sketch regime runs instead of the exact overlap count "
            "— the sketch tolerance is error-bound, not configurable, "
            "so overlap below the sketch's detection floor (~15% of "
            "the union) can pass. For a strict any-overlap guarantee, "
            "run an exact anti-join check yourself.",
            UserWarning,
            stacklevel=2,
        )
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
