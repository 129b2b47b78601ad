import pytest

from featurestore_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("featurestore-tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def events_df(spark):
    """Micro-fixture modeled on the reference's test_events.csv
    (3 customers; hand-checkable sessionization + paths —
    EventAnalysisSpec.scala:31-117)."""
    rows = [
        ("1001", "email", "2016-02-25 08:45:00"),
        ("1001", "web", "2016-02-25 09:00:00"),
        ("1001", "livechat", "2016-02-25 09:30:00"),
        ("1002", "web", "2016-02-26 10:00:00"),
        ("1002", "web", "2016-02-26 10:05:00"),
        ("1002", "call", "2016-02-26 10:30:00"),
        ("1003", "email", "2016-02-20 08:00:00"),
        ("1003", "web", "2016-02-20 09:00:00"),
        ("1003", "web", "2016-02-22 10:00:00"),
        ("1003", "churn", "2016-02-25 11:00:00"),
    ]
    df = spark.createDataFrame(rows, ["entity", "eventType", "ts_str"])
    from pyspark.sql import functions as F

    return df.withColumn("ts", F.to_timestamp("ts_str")).drop("ts_str")
