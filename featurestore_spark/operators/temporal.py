"""Temporal join operators: as-of join, interval (range) join, and
multi-granularity time rollups.

Spark has no native ASOF JOIN (DuckDB does — the oracles use it) and
naively expressing either shape as an inequality join falls back to
BroadcastNestedLoopJoin / cartesian at scale. These implementations use
the two classic distributed formulations instead:

- **as-of join**: union both sides tagged, ONE shuffle on the join key,
  then a carry-forward window (`last(..., ignorenulls=True)`) — each
  left row reads the latest right row at-or-before its timestamp.
  No range condition ever reaches the planner.
- **interval join**: explode each right-side interval into the fixed
  time bins it covers, equi-join on (key, bin), then filter to the
  exact range. Join fan-out is bounded by interval_len/bin_width + 1;
  the join itself is a plain hash join on uniform keys.
- **time rollup**: `ROLLUP` grouping sets — partial aggregation on all
  levels in one pass (map-side combine keeps it one shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    tolerance_us: int | None = None,
    prefix: str = "r_",
) -> DataFrame:
    """Backward as-of join (inclusive): every left row gains the most
    recent right row with `right_ts <= left_ts` on the same key(s), or
    NULLs if none (left-outer semantics, matching DuckDB
    `ASOF LEFT JOIN ... ON l.k = r.k AND l.ts >= r.ts`).

    Right rows must be unique per (key, right_ts) — pre-aggregate if
    not (ties would make "the" latest row ambiguous in any engine).

    `tolerance_us` (optional) nulls out matches older than the given
    microseconds — pandas `merge_asof(tolerance=...)` semantics.

    Scale shape: union + single window shuffle on the key; both inputs
    stream through sorted partitions once. No range predicate, no
    nested-loop fallback, no per-key collect. The matched right row is
    carried as ONE struct through a single last(ignorenulls) — so a
    NULL inside the matched row stays NULL instead of falling back to
    an older row's value (per-column carries would mix rows).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [
            c for c in right.columns if c not in keys and c != right_ts
        ]
    reserved = {"_ts", "_is_left", "_l", "_r"}
    clash = reserved & (set(left.columns) | set(keys))
    if clash:
        raise ValueError(f"left/key columns collide with internals: {clash}")
    if "_ts_us" in right_cols:
        raise ValueError("right column '_ts_us' collides with internals")
    prefixed = {f"{prefix}{c}" for c in [right_ts, *right_cols]}
    out_clash = prefixed & set(left.columns)
    if out_clash:
        raise ValueError(
            f"prefixed right columns collide with left columns: "
            f"{sorted(out_clash)} — pass a different prefix= or rename "
            "the left columns"
        )

    # the whole candidate right row as one struct: (_ts_us, values...)
    r_struct = F.struct(
        F.unix_micros(F.col(right_ts)).alias("_ts_us"),
        *[F.col(c).alias(c) for c in right_cols],
    )
    l_tagged = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        F.lit(None).cast(
            right.select(r_struct.alias("_r")).schema["_r"].dataType
        ).alias("_r"),
    )
    r_tagged = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(l_tagged.schema["_l"].dataType).alias("_l"),
        r_struct.alias("_r"),
    )
    # right rows sort BEFORE left rows at equal timestamps (_is_left
    # ascending) -> the match is inclusive, as in DuckDB's l.ts >= r.ts
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ts"), F.col("_is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tagged.unionByName(r_tagged).select(
        "*", F.last("_r", ignorenulls=True).over(w).alias("_m")
    )
    out = carried.where(F.col("_is_left") == 1)
    m = F.col("_m")
    in_tol: Column = F.lit(True)
    if tolerance_us is not None:
        in_tol = (
            F.unix_micros(F.col("_ts")) - m.getField("_ts_us")
        ) <= F.lit(tolerance_us)
    return out.select(
        "_l.*",
        F.when(in_tol, F.timestamp_micros(m.getField("_ts_us"))).alias(
            f"{prefix}{right_ts}"
        ),
        *[
            F.when(in_tol, m.getField(c)).alias(f"{prefix}{c}")
            for c in right_cols
        ],
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    on: str | list[str],
    point_ts: str = "ts",
    start_ts: str = "start_ts",
    end_ts: str = "end_ts",
    bin_width_s: int = 3600,
) -> DataFrame:
    """Inner join of point rows onto every interval row containing them
    (`start_ts <= point_ts <= end_ts`, same key) — via time-binning:

    intervals explode to the `floor(ts/bin)` bins they cover, points
    map to exactly one bin, and the range condition is applied AFTER a
    plain (key, bin) hash equi-join. Each point falls in one bin and
    each (interval, bin) pair is distinct, so no dedup is needed.

    Pick `bin_width_s` near the typical interval length: fan-out per
    interval row is len/bin + 1 rows, and bin population bounds the
    per-task probe work. Columns from both inputs are retained
    (point's `point_ts` plus all interval columns).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if "_bin" in set(points.columns) | set(intervals.columns):
        raise ValueError("column '_bin' collides with internals")
    shared = (set(points.columns) & set(intervals.columns)) - set(keys)
    if shared:
        raise ValueError(
            f"points and intervals share non-key columns {sorted(shared)} "
            "— the join would emit ambiguous duplicate names; rename or "
            "drop them on one side first"
        )
    bw = F.lit(int(bin_width_s) * 1_000_000)

    iv = intervals.select(
        "*",
        F.explode(
            F.sequence(
                F.floor(F.unix_micros(F.col(start_ts)) / bw),
                F.floor(F.unix_micros(F.col(end_ts)) / bw),
            )
        ).alias("_bin"),
    )
    pt = points.select(
        "*", F.floor(F.unix_micros(F.col(point_ts)) / bw).alias("_bin")
    )
    cond = F.col(point_ts).between(F.col(start_ts), F.col(end_ts))
    return iv.join(pt, keys + ["_bin"]).where(cond).drop("_bin")


def time_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    group_cols: list[str] | None = None,
    aggs: list[Column] | None = None,
    *,
    day_col: str = "day",
) -> DataFrame:
    """ROLLUP over (day, *group_cols): per-group rows, per-day
    subtotals, and a grand total in one shuffle (partial aggregation
    covers every grouping set map-side). Day is a 'yyyy-MM-dd' string
    — engine-portable, no date-object ambiguity."""
    group_cols = group_cols or []
    aggs = aggs or [F.count(F.lit(1)).alias("n")]
    day = F.date_format(F.col(ts_col), "yyyy-MM-dd").alias(day_col)
    return df.rollup(day, *[F.col(c) for c in group_cols]).agg(*aggs)
