"""As-of join, interval join, time rollup (operators/temporal.py;
oracle coverage in q_asof_purchase, q_interval_join, q_time_rollup)."""

import pytest
from pyspark.sql import functions as F

from featurestore_spark.operators.temporal import (
    asof_join,
    interval_join,
    time_rollup,
)


def _ts(df, *cols):
    out = df
    for c in cols:
        out = out.withColumn(c, F.to_timestamp(c))
    return out


@pytest.fixture(scope="module")
def quotes(spark):
    rows = [
        ("A", "2024-01-01 10:00:00", 100.0),
        ("A", "2024-01-01 10:05:00", 101.0),
        ("A", "2024-01-01 10:10:00", 102.0),
        ("B", "2024-01-01 10:02:00", 50.0),
    ]
    return _ts(spark.createDataFrame(rows, ["sym", "ts", "px"]), "ts")


@pytest.fixture(scope="module")
def trades(spark):
    rows = [
        ("A", "2024-01-01 09:59:00", 1),  # before any quote -> NULL
        ("A", "2024-01-01 10:05:00", 2),  # exact tie -> inclusive match
        ("A", "2024-01-01 10:07:00", 3),  # between quotes -> 10:05
        ("A", "2024-01-01 11:00:00", 4),  # long after -> 10:10
        ("B", "2024-01-01 10:03:00", 5),
        ("C", "2024-01-01 10:00:00", 6),  # key with no quotes -> NULL
    ]
    return _ts(spark.createDataFrame(rows, ["sym", "ts", "tid"]), "ts")


def test_asof_backward_inclusive(spark, quotes, trades):
    out = asof_join(
        trades, quotes, on="sym", left_ts="ts", right_ts="ts",
        right_cols=["px"], prefix="q_",
    )
    px = {r["tid"]: r["q_px"] for r in out.collect()}
    assert px[1] is None
    assert px[2] == 101.0  # equal timestamps match (>= semantics)
    assert px[3] == 101.0
    assert px[4] == 102.0
    assert px[5] == 50.0
    assert px[6] is None
    assert out.count() == trades.count()  # left-outer: all rows kept


def test_asof_tolerance(spark, quotes, trades):
    out = asof_join(
        trades, quotes, on="sym", left_ts="ts", right_ts="ts",
        right_cols=["px"], prefix="q_", tolerance_us=10 * 60 * 1_000_000,
    )
    px = {r["tid"]: r["q_px"] for r in out.collect()}
    assert px[3] == 101.0  # 2 min old: inside 10-min tolerance
    assert px[4] is None  # 50 min old: nulled out
    # matched timestamp column nulls out alongside the values
    ts4 = {r["tid"]: r["q_ts"] for r in out.collect()}[4]
    assert ts4 is None


def test_asof_no_range_join_in_plan(spark, quotes, trades):
    out = asof_join(trades, quotes, on="sym", right_cols=["px"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan
    assert "CartesianProduct" not in plan


def test_interval_join_membership(spark):
    iv = _ts(
        spark.createDataFrame(
            [
                ("u1", "i1", "2024-01-01 10:00:00", "2024-01-01 11:30:00"),
                ("u1", "i2", "2024-01-01 11:00:00", "2024-01-01 12:00:00"),
                ("u2", "i3", "2024-01-01 10:00:00", "2024-01-01 11:00:00"),
            ],
            ["uid", "iid", "start_ts", "end_ts"],
        ),
        "start_ts",
        "end_ts",
    )
    pts = _ts(
        spark.createDataFrame(
            [
                ("u1", "2024-01-01 10:30:00", 1),
                ("u1", "2024-01-01 11:15:00", 2),  # overlap: in i1 AND i2
                ("u1", "2024-01-01 12:00:00", 3),  # inclusive end of i2
                ("u1", "2024-01-01 12:00:01", 4),  # just outside
                ("u2", "2024-01-01 10:30:00", 5),  # other key
            ],
            ["uid", "ts", "pid"],
        ),
        "ts",
    )
    out = interval_join(
        pts, iv, on="uid", point_ts="ts", bin_width_s=3600
    )
    got = {(r["iid"], r["pid"]) for r in out.collect()}
    assert got == {("i1", 1), ("i1", 2), ("i2", 2), ("i2", 3), ("i3", 5)}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan
    assert "CartesianProduct" not in plan


def test_time_rollup_levels(spark):
    ev = _ts(
        spark.createDataFrame(
            [
                ("2024-01-01 10:00:00", "click"),
                ("2024-01-01 11:00:00", "click"),
                ("2024-01-01 12:00:00", "view"),
                ("2024-01-02 10:00:00", "view"),
            ],
            ["ts", "event_type"],
        ),
        "ts",
    )
    out = time_rollup(ev, group_cols=["event_type"])
    rows = {(r["day"], r["event_type"]): r["n"] for r in out.collect()}
    assert rows[("2024-01-01", "click")] == 2
    assert rows[("2024-01-01", None)] == 3  # per-day subtotal
    assert rows[(None, None)] == 4  # grand total
    assert len(rows) == 6  # 3 cells + 2 day subtotals + grand total


def test_asof_null_in_matched_row_stays_null(spark, quotes):
    """A NULL inside the matched right row must come through as NULL —
    per-column carry-forward would leak an older row's value (DuckDB
    ASOF / pandas merge_asof return the matched row atomically)."""
    q = _ts(
        spark.createDataFrame(
            [("A", "2024-01-01 10:00:00", 100.0),
             ("A", "2024-01-01 10:05:00", None)],
            ["sym", "ts", "px"],
        ),
        "ts",
    )
    t = _ts(
        spark.createDataFrame(
            [("A", "2024-01-01 10:07:00", 1)], ["sym", "ts", "tid"]
        ),
        "ts",
    )
    out = asof_join(t, q, on="sym", right_cols=["px"], prefix="q_").collect()
    assert len(out) == 1
    assert out[0]["q_ts"] is not None  # matched the 10:05 row...
    assert out[0]["q_px"] is None  # ...whose px is genuinely NULL


def test_asof_reserved_name_guard(spark, quotes, trades):
    import pytest as _pytest

    bad = trades.withColumnRenamed("tid", "_ts")
    with _pytest.raises(ValueError, match="collide"):
        asof_join(bad, quotes, on="sym", right_cols=["px"])


def test_asof_prefixed_output_collision_guard(spark, quotes, trades):
    """ADVICE r3: a left column named prefix+<right col> would silently
    produce duplicate output names — reject with a clear message."""
    import pytest as _pytest

    bad = trades.withColumnRenamed("tid", "r_px")
    with _pytest.raises(ValueError, match="prefix"):
        asof_join(bad, quotes, on="sym", right_cols=["px"])
    # a different prefix resolves it
    out = asof_join(bad, quotes, on="sym", right_cols=["px"], prefix="q_")
    assert "q_px" in out.columns and len(set(out.columns)) == len(out.columns)


def test_interval_join_shared_column_guard(spark):
    import pytest as _pytest

    from featurestore_spark.operators.temporal import interval_join

    pts = _ts(
        spark.createDataFrame(
            [("A", "2024-01-01 10:00:00", 1)], ["k", "ts", "v"]
        ),
        "ts",
    )
    iv = _ts(
        _ts(
            spark.createDataFrame(
                [("A", "2024-01-01 09:00:00", "2024-01-01 11:00:00", 2)],
                ["k", "start_ts", "end_ts", "v"],  # 'v' collides
            ),
            "start_ts",
        ),
        "end_ts",
    )
    with _pytest.raises(ValueError, match="share non-key"):
        interval_join(pts, iv, on="k")
    ok = interval_join(pts, iv.withColumnRenamed("v", "iv_v"), on="k")
    assert ok.count() == 1
