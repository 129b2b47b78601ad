"""SparkSession construction with scale-appropriate defaults.

The defaults target both local testing (local[N]) and large clusters:
AQE handles skew joins and coalesces post-shuffle partitions at any
scale, so we turn it on unconditionally.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "featurestore-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    On a real cluster `master`/`shuffle_partitions` come from the
    environment; locally we default to all cores and a modest shuffle
    width so tests stay fast.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Read parquet TIMESTAMP(NANOS) as bigint (io.tables converts to
        # microsecond timestamps); Spark rejects nanos outright otherwise.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Arrow for any pandas_udf fallback paths (similarity, scoring).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    )
    if master:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    builder = builder.config(
        "spark.sql.shuffle.partitions", str(shuffle_partitions or int(cpus))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
