"""Event-operator behavior tests, mirroring EventAnalysisSpec golden
expectations (session numbering, path collapse, chord alignment)."""

from pyspark.sql import functions as F

from featurestore_spark.operators import (
    collapse_runs,
    count_events,
    days_since_latest,
    extract_chords,
    paths,
    previous_interactions,
    previous_interactions_chord,
    sessionize,
    sum_events,
    unique_paths,
)


def test_sessionize_day_timeout(events_df):
    out = sessionize(events_df, timeout_seconds=86400.0)
    got = {
        (r["entity"], str(r["ts"])): r["session"]
        for r in out.collect()
    }
    # 1003: gaps 2016-02-20 -> 02-22 (>1d) -> 02-25 (>1d): churn in session 3
    assert got[("1003", "2016-02-25 11:00:00")] == 3
    assert got[("1003", "2016-02-20 09:00:00")] == 1
    # 1001 all within 1 hour: one session
    assert got[("1001", "2016-02-25 09:30:00")] == 1


def test_paths_and_unique_paths(events_df):
    p = {r["entity"]: r["path"] for r in paths(events_df).collect()}
    assert "livechat" in p["1001"]
    assert p["1002"] == "web,web,call"
    up = {r["entity"]: r["path"] for r in unique_paths(events_df).collect()}
    assert up["1002"] == "web,call"


def test_collapse_runs_keeps_latest_ts(events_df):
    runs = collapse_runs(events_df.where(F.col("entity") == "1002"))
    web = [r for r in runs.collect() if r["eventType"] == "web"][0]
    assert web["run_count"] == 2
    assert str(web["ts"]) == "2016-02-26 10:05:00"  # latest ts of the run


def test_window_aggregates(events_df):
    n = count_events(
        events_df, "web", "2016-02-20 00:00:00", "2016-02-26 23:59:59"
    )
    got = {r["entity"]: r["n_events"] for r in n.collect()}
    assert got == {"1001": 1, "1002": 2, "1003": 2}

    s = sum_events(
        events_df.withColumn("value", F.lit(2.0)),
        None,
        "2016-02-25 00:00:00",
        "2016-02-27 00:00:00",
    )
    got_s = {r["entity"]: r["total"] for r in s.collect()}
    assert got_s["1002"] == 6.0

    d = days_since_latest(events_df, "web", "2016-02-28 00:00:00")
    got_d = {r["entity"]: r["days_since"] for r in d.collect()}
    assert got_d["1003"] == 6  # latest web 02-22


def test_chords_and_chord_alignment(events_df):
    chords = extract_chords(events_df, "churn")
    got = {r["entity"]: r["chord_ts"] for r in chords.collect()}
    assert got["1001"] is None and got["1003"] is not None
    assert len(got) == 3  # all entities retained

    aligned = previous_interactions_chord(
        events_df, "web", n=2, as_of="2016-03-01 00:00:00"
    )
    rows_1003 = [r for r in aligned.collect() if r["entity"] == "1003"]
    # chord = latest web (02-22 10:00); churn (02-25) excluded; top-2 kept
    assert {r["eventType"] for r in rows_1003} <= {"web", "email"}
    assert len(rows_1003) == 2
    assert all(r["eventType"] != "churn" for r in rows_1003)


def test_chord_keep_chordless_retains_all_entities(events_df):
    """keep_chordless=True matches eventFunctions.scala:177-185: every
    entity appears, chordless ones as a single null-event row."""
    aligned = previous_interactions_chord(
        events_df, "churn", n=5, as_of="2016-03-01 00:00:00", keep_chordless=True
    )
    by_entity = {}
    for r in aligned.collect():
        by_entity.setdefault(r["entity"], []).append(r)
    assert set(by_entity) == {"1001", "1002", "1003"}  # universe retained
    # 1001/1002 never churned -> one all-null row each (empty path)
    assert len(by_entity["1001"]) == 1 and by_entity["1001"][0]["eventType"] is None
    assert len(by_entity["1002"]) == 1 and by_entity["1002"][0]["rn"] is None
    # 1003 churned at 02-25: its whole history is at/before the chord
    assert len(by_entity["1003"]) == 4
    # default drops chordless entities
    assert (
        previous_interactions_chord(events_df, "churn", n=5, as_of="2016-03-01 00:00:00")
        .select("entity").distinct().count() == 1
    )


def test_previous_interactions_topn(events_df):
    top = previous_interactions(events_df, n=2, as_of="2016-03-01 00:00:00")
    per_entity = {}
    for r in top.collect():
        per_entity.setdefault(r["entity"], []).append((r["rn"], r["eventType"]))
    assert len(per_entity["1001"]) == 2
    assert sorted(per_entity["1001"])[0] == (1, "livechat")  # most recent first
