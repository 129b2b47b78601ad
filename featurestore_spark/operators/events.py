"""Event-timeline feature engineering as pure window-function dataflows.

Rebuilds diamond/transform/eventFunctions.scala (RDD combinators,
per-partition bounded heaps, driver collectAsMap) as DataFrame window
specs. Every operator here:

- partitions by the entity column only — one shuffle on the natural
  analysis key, reused across chained window ops (Spark reuses the
  exchange when the partitioning matches);
- keeps results as DataFrames (the reference's `collectAsMap()` at
  eventFunctions.scala:180,290 was a driver-memory cliff — eliminated);
- stays inside whole-stage codegen (no Python UDFs).

Column names are parameters so the same operators serve the reference's
EAVT schema and the driver's `events` table (user_id/event_type/ts).

Scale notes: window `PARTITION BY entity` is the unavoidable shuffle;
everything downstream of the first window reuses that partitioning.
Per-entity data is assumed to fit an executor (true for interaction
timelines; for pathological entities AQE skew handling applies to the
preceding exchange).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _ordered_window(entity_col: str, ts_col: str, *tiebreak: str):
    return Window.partitionBy(entity_col).orderBy(ts_col, *tiebreak)


def _as_col(v) -> Column:
    """Accept either a literal (string/timestamp) or a ready Column."""
    return v if isinstance(v, Column) else F.lit(v)


def sessionize(
    df: DataFrame,
    timeout_seconds: float,
    *,
    entity_col: str = "entity",
    ts_col: str = "ts",
    session_col: str = "session",
    tiebreak_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Assign 1-based session ids per entity; a new session starts when
    the gap to the previous event exceeds `timeout_seconds`.

    Reference: eventFunctions.scala:77-96 (per-entity sorted scanLeft).
    Spark-first: lag → gap flag → running sum, one window partition-by.
    """
    w = _ordered_window(entity_col, ts_col, *tiebreak_cols)
    ts_sec = F.col(ts_col).cast("double")
    gap = ts_sec - F.lag(ts_sec).over(w)
    new_session = F.when(gap.isNull() | (gap > timeout_seconds), 1).otherwise(0)
    return df.withColumn(
        session_col,
        F.sum(new_session)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint"),
    )


def _window_filter(
    df: DataFrame,
    event_type: str | None,
    start_time,
    end_time,
    *,
    type_col: str,
    ts_col: str,
) -> DataFrame:
    """Shared [start, end] + event-type predicate (eventFunctions.scala:28-56).

    Bounds are inclusive, matching the reference's `ts >= start && ts <= end`.
    Pushed into the scan by Catalyst (parquet min/max pruning).
    """
    out = df
    if event_type is not None:
        out = out.where(F.col(type_col) == event_type)
    if start_time is not None:
        out = out.where(F.col(ts_col) >= _as_col(start_time))
    if end_time is not None:
        out = out.where(F.col(ts_col) <= _as_col(end_time))
    return out


def count_events(
    df: DataFrame,
    event_type: str | None,
    start_time,
    end_time,
    *,
    entity_col: str = "entity",
    type_col: str = "eventType",
    ts_col: str = "ts",
    out_col: str = "n_events",
) -> DataFrame:
    """Per-entity event count in [start, end] (eventFunctions.scala:28-35)."""
    return (
        _window_filter(df, event_type, start_time, end_time, type_col=type_col, ts_col=ts_col)
        .groupBy(entity_col)
        .agg(F.count(F.lit(1)).alias(out_col))
    )


def count_unique_events(
    df: DataFrame,
    event_type: str | None,
    start_time,
    end_time,
    *,
    entity_col: str = "entity",
    type_col: str = "eventType",
    ts_col: str = "ts",
    value_col: str = "value",
    out_col: str = "n_unique",
    approx: bool = False,
) -> DataFrame:
    """Per-entity distinct-value count in window (eventFunctions.scala:37-46).

    `approx=True` swaps in HyperLogLog++ (`approx_count_distinct`) —
    at 100 TB an exact global distinct per entity is usually
    unnecessary and the sketch avoids the second shuffle.
    """
    agg = (
        F.approx_count_distinct(value_col) if approx else F.countDistinct(value_col)
    ).alias(out_col)
    return (
        _window_filter(df, event_type, start_time, end_time, type_col=type_col, ts_col=ts_col)
        .groupBy(entity_col)
        .agg(agg)
    )


def sum_events(
    df: DataFrame,
    event_type: str | None,
    start_time,
    end_time,
    *,
    entity_col: str = "entity",
    type_col: str = "eventType",
    ts_col: str = "ts",
    value_col: str = "value",
    out_col: str = "total",
) -> DataFrame:
    """Per-entity sum(value) in window (eventFunctions.scala:48-56)."""
    return (
        _window_filter(df, event_type, start_time, end_time, type_col=type_col, ts_col=ts_col)
        .groupBy(entity_col)
        .agg(F.sum(F.col(value_col).cast("double")).alias(out_col))
    )


def days_since_latest(
    df: DataFrame,
    event_type: str | None,
    as_of,
    *,
    entity_col: str = "entity",
    type_col: str = "eventType",
    ts_col: str = "ts",
    out_col: str = "days_since",
) -> DataFrame:
    """Days between each entity's latest qualifying event and `as_of`
    (eventFunctions.scala:58-63: takeOrdered(1) desc → daysBetween)."""
    return (
        _window_filter(df, event_type, None, as_of, type_col=type_col, ts_col=ts_col)
        .groupBy(entity_col)
        .agg(F.datediff(_as_col(as_of).cast("date"), F.max(ts_col).cast("date")).alias(out_col))
    )


def days_since_earliest(
    df: DataFrame,
    event_type: str | None,
    as_of,
    *,
    entity_col: str = "entity",
    type_col: str = "eventType",
    ts_col: str = "ts",
    out_col: str = "days_since",
) -> DataFrame:
    """As `days_since_latest` but earliest event (eventFunctions.scala:64-68)."""
    return (
        _window_filter(df, event_type, None, as_of, type_col=type_col, ts_col=ts_col)
        .groupBy(entity_col)
        .agg(F.datediff(_as_col(as_of).cast("date"), F.min(ts_col).cast("date")).alias(out_col))
    )


def previous_interactions(
    df: DataFrame,
    n: int,
    as_of,
    *,
    entity_col: str = "entity",
    ts_col: str = "ts",
    rank_col: str = "rn",
    tiebreak_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Latest `n` events per entity at/before `as_of` — the "event path".

    Reference: eventFunctions.scala:105-111 (MLlib topByKey with
    per-partition heaps). Spark-first: `row_number` window — Spark
    plans a partial windowed limit and AQE handles skew; no heaps.
    rank 1 = most recent.
    """
    order = [F.col(ts_col).desc()] + [F.col(c).desc() for c in tiebreak_cols]
    w = Window.partitionBy(entity_col).orderBy(*order)
    return (
        df.where(F.col(ts_col) <= _as_col(as_of))
        .withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= n)
    )


def extract_chords(
    df: DataFrame,
    event_type: str,
    *,
    entity_col: str = "entity",
    type_col: str = "eventType",
    ts_col: str = "ts",
    chord_col: str = "chord_ts",
) -> DataFrame:
    """Per entity, timestamp of the latest event of `event_type`; ALL
    entities retained (null chord when the entity never had one).

    Reference: eventFunctions.scala:319-328 (leftOuterJoin of entity
    universe with per-entity max). Spark-first: conditional max — a
    single hash aggregate, no join at all.
    """
    return df.groupBy(entity_col).agg(
        F.max(F.when(F.col(type_col) == event_type, F.col(ts_col))).alias(chord_col)
    )


def previous_interactions_chord(
    df: DataFrame,
    event_type: str,
    n: int,
    as_of,
    *,
    entity_col: str = "entity",
    type_col: str = "eventType",
    ts_col: str = "ts",
    rank_col: str = "rn",
    tiebreak_cols: tuple[str, ...] = (),
    keep_chordless: bool = False,
) -> DataFrame:
    """Chord-aligned path: per entity, the latest `n` events at/before
    that entity's latest `event_type` event ("the chord").

    `keep_chordless=True` matches the reference exactly: every entity
    in the input is retained — entities without a chord get one row of
    null event columns, the row-shaped analog of the reference's
    epoch-1970 chord ⇒ empty path (eventFunctions.scala:128-185).
    Default False drops them (the common analytics shape).

    Spark-first: chord = windowed conditional max over the SAME
    entity partitioning as the rank window — one shuffle serves both.
    """
    w_part = Window.partitionBy(entity_col)
    bounded = df.where(F.col(ts_col) <= _as_col(as_of))
    with_chord = bounded.withColumn(
        "_chord",
        F.max(F.when(F.col(type_col) == event_type, F.col(ts_col))).over(w_part),
    )
    order = [F.col(ts_col).desc()] + [F.col(c).desc() for c in tiebreak_cols]
    w_rank = Window.partitionBy(entity_col).orderBy(*order)
    out = (
        with_chord.where(F.col(ts_col) <= F.col("_chord"))
        .withColumn(rank_col, F.row_number().over(w_rank))
        .where(F.col(rank_col) <= n)
        .drop("_chord")
    )
    if keep_chordless:
        universe = df.select(entity_col).distinct()
        out = universe.join(out, entity_col, "left")
    return out


def collapse_runs(
    df: DataFrame,
    *,
    entity_col: str = "entity",
    type_col: str = "eventType",
    ts_col: str = "ts",
    count_col: str = "run_count",
    tiebreak_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Collapse contiguous runs of the same event type into one row
    (event, count, latest ts of run) per run.

    Reference: eventFunctions.scala:197-295 ("previousUniqueInteractions"
    inner collapse; 'keep latest ts in run', lines 229-235).
    Spark-first: run-length encoding — lag change-flag → running sum
    gives a run id, then one groupBy. Both windows and the groupBy
    share the entity partitioning.
    """
    w = _ordered_window(entity_col, ts_col, *tiebreak_cols)
    changed = F.when(
        F.lag(type_col).over(w).isNull() | (F.lag(type_col).over(w) != F.col(type_col)),
        1,
    ).otherwise(0)
    run_id = F.sum(changed).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        df.withColumn("_run", run_id)
        .groupBy(entity_col, "_run")
        .agg(
            F.first(type_col).alias(type_col),
            F.max(ts_col).alias(ts_col),
            F.count(F.lit(1)).cast("bigint").alias(count_col),
        )
        .drop("_run")
    )


def previous_unique_interactions(
    df: DataFrame,
    event_type: str,
    n: int,
    as_of,
    *,
    entity_col: str = "entity",
    type_col: str = "eventType",
    ts_col: str = "ts",
    rank_col: str = "rn",
    count_col: str = "run_count",
    tiebreak_cols: tuple[str, ...] = (),
    keep_chordless: bool = False,
) -> DataFrame:
    """Chord-aligned path with contiguous duplicate runs collapsed to
    (event, count) — reference eventFunctions.scala:197-295.
    `keep_chordless=True` retains chordless entities as one
    null-event row (see previous_interactions_chord)."""
    chorded = previous_interactions_chord(
        df,
        event_type,
        n=2**31 - 1,
        as_of=as_of,
        entity_col=entity_col,
        type_col=type_col,
        ts_col=ts_col,
        rank_col="_prern",
        tiebreak_cols=tiebreak_cols,
    ).drop("_prern")
    runs = collapse_runs(
        chorded,
        entity_col=entity_col,
        type_col=type_col,
        ts_col=ts_col,
        count_col=count_col,
    )
    w = Window.partitionBy(entity_col).orderBy(F.col(ts_col).desc())
    out = runs.withColumn(rank_col, F.row_number().over(w)).where(
        F.col(rank_col) <= n
    )
    if keep_chordless:
        universe = df.select(entity_col).distinct()
        out = universe.join(out, entity_col, "left")
    return out


def current_events(
    df: DataFrame,
    *,
    entity_col: str = "entity",
    type_col: str = "eventType",
    ts_col: str = "ts",
    version_col: str = "version",
) -> DataFrame:
    """Latest version per (entity, eventType, ts) — eventFunctions.scala:304-308."""
    w = Window.partitionBy(entity_col, type_col, ts_col).orderBy(F.col(version_col).desc())
    return (
        df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")
    )


def paths(
    df: DataFrame,
    *,
    entity_col: str = "entity",
    type_col: str = "eventType",
    ts_col: str = "ts",
    path_col: str = "path",
    sep: str = ",",
    ascending: bool = True,
    tiebreak_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-entity event path: event types joined in time order
    (eventFunctions.scala:338-343). `concat_ws` over an ordered
    collect — sort happens inside the per-entity group (array_sort on
    (ts, type) structs keeps it deterministic), not a global sort.

    The per-group collect is inherent here — the OUTPUT row is the
    whole path string, so its size equals the group's; unlike the
    dedup membership arrays there is no smaller representation. Bound
    pathological entities upstream (e.g. sessionize + per-session
    paths) if per-entity event counts are unbounded."""
    struct_cols = [F.col(ts_col)] + [F.col(c) for c in tiebreak_cols] + [F.col(type_col)]
    ordered = F.array_sort(F.collect_list(F.struct(*struct_cols)))
    if not ascending:
        ordered = F.reverse(ordered)
    return df.groupBy(entity_col).agg(
        F.concat_ws(sep, F.transform(ordered, lambda s: s[type_col])).alias(path_col)
    )


def unique_paths(
    df: DataFrame,
    *,
    entity_col: str = "entity",
    type_col: str = "eventType",
    ts_col: str = "ts",
    path_col: str = "path",
    sep: str = ",",
    tiebreak_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-entity path with contiguous duplicate event types collapsed
    ("web,web,call" → "web,call") — eventFunctions.scala:344-349."""
    collapsed = collapse_runs(
        df,
        entity_col=entity_col,
        type_col=type_col,
        ts_col=ts_col,
        tiebreak_cols=tiebreak_cols,
    )
    return paths(
        collapsed,
        entity_col=entity_col,
        type_col=type_col,
        ts_col=ts_col,
        path_col=path_col,
        sep=sep,
    )
