"""EAVT → wide-table pivots (the Feature Store "snapshot" reads).

Rebuilds diamond/transform/PivotFunctions.scala:27-100. The reference
pivots with Spark 1.5 `groupBy().pivot(values)`; we keep that but pass
the **explicit feature list** — with explicit values Spark skips the
extra distinct-values job, which at 100 TB is a full scan saved. The
feature list comes from the registry (small, driver-side).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_col(v) -> Column:
    return v if isinstance(v, Column) else F.lit(v)


def latest_value_per_attribute(
    df: DataFrame,
    as_of,
    *,
    entity_col: str = "entity",
    attr_col: str = "eventType",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Latest value per (entity, attribute) at time <= as_of."""
    out = df
    if as_of is not None:
        out = out.where(F.col(ts_col) <= _as_col(as_of))
    # ONE shuffle for the whole pivot: partitioning by entity alone
    # satisfies both the window's (entity, attr) clustering and the
    # downstream groupBy(entity).pivot — Spark reuses the exchange
    # instead of shuffling twice.
    out = out.repartition(entity_col)
    order = [F.col(ts_col).desc()] + [F.col(c).desc() for c in tiebreak_cols]
    w = Window.partitionBy(entity_col, attr_col).orderBy(*order)
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(entity_col, attr_col, value_col)
    )


def snapshot_pivot(
    df: DataFrame,
    features: Sequence[str],
    as_of,
    *,
    entity_col: str = "entity",
    attr_col: str = "eventType",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Wide feature vector: one row per entity, one column per feature,
    value = latest per (entity, feature) at time <= `as_of`, null if
    absent. Reference: PivotFunctions.scala:27-60 (snapshot pivot),
    tests FeatureStoreSpec.scala:62-113.
    """
    latest = latest_value_per_attribute(
        df,
        as_of,
        entity_col=entity_col,
        attr_col=attr_col,
        ts_col=ts_col,
        value_col=value_col,
        tiebreak_cols=tiebreak_cols,
    )
    return (
        latest.groupBy(entity_col)
        .pivot(attr_col, list(features))
        .agg(F.first(value_col))
    )


def chord_pivot(
    df: DataFrame,
    features: Sequence[str],
    chord_attr: str,
    *,
    entity_col: str = "entity",
    attr_col: str = "eventType",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Pivot where each entity's snapshot time is its own latest
    `chord_attr` timestamp; entities lacking the chord attribute are
    excluded. Reference: PivotFunctions.scala:63-100.

    One window partitioning (entity) computes the chord; the filter
    `ts <= chord` then feeds the same pivot as `snapshot_pivot`.
    """
    w_part = Window.partitionBy(entity_col)
    with_chord = df.withColumn(
        "_chord",
        F.max(F.when(F.col(attr_col) == chord_attr, F.col(ts_col))).over(w_part),
    )
    bounded = with_chord.where(
        F.col("_chord").isNotNull() & (F.col(ts_col) <= F.col("_chord"))
    ).drop("_chord")
    return snapshot_pivot(
        bounded,
        features,
        as_of=None,
        entity_col=entity_col,
        attr_col=attr_col,
        ts_col=ts_col,
        value_col=value_col,
        tiebreak_cols=tiebreak_cols,
    )
