"""Snapshot / chord pivot tests, mirroring FeatureStoreSpec.scala:62-113
time-travel semantics (latest value per attribute at/before as_of)."""

from pyspark.sql import functions as F

from featurestore_spark.operators.pivot import chord_pivot, snapshot_pivot


def _eavt(spark):
    rows = [
        ("e1", "745", "2013-01-01 00:00:00", "1"),
        ("e1", "745", "2013-04-01 00:00:00", "2"),  # later version of 745
        ("e1", "931", "2013-02-01 00:00:00", "7"),
        ("e2", "745", "2013-03-01 00:00:00", "5"),
    ]
    df = spark.createDataFrame(rows, ["entity", "eventType", "ts_str", "value"])
    return df.withColumn("ts", F.to_timestamp("ts_str")).drop("ts_str")


def test_snapshot_pivot_time_travel(spark):
    df = _eavt(spark)
    now = snapshot_pivot(df, ["745", "931"], as_of="2013-12-31 00:00:00")
    got = {r["entity"]: (r["745"], r["931"]) for r in now.collect()}
    assert got["e1"] == ("2", "7")  # latest 745 value is "2"
    assert got["e2"] == ("5", None)  # missing attribute -> null

    past = snapshot_pivot(df, ["745", "931"], as_of="2013-03-31 00:00:00")
    got_past = {r["entity"]: (r["745"], r["931"]) for r in past.collect()}
    assert got_past["e1"] == ("1", "7")  # time travel: pre-April value


def test_chord_pivot_per_entity_sync(spark):
    df = _eavt(spark)
    # chord attr = 931: only e1 has it; snapshot time = 2013-02-01
    out = chord_pivot(df, ["745", "931"], chord_attr="931")
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["entity"] == "e1"
    assert rows[0]["745"] == "1"  # value as of the chord time, not "2"
