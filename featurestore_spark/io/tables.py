"""Testdata table loading, with TIMESTAMP(NANOS) parquet compatibility.

Some producers (pandas/pyarrow default) write parquet `timestamp[ns]`
columns, which Spark's vectorized reader rejects outright
(PARQUET_TYPE_ILLEGAL). With `spark.sql.legacy.parquet.nanosAsLong=true`
(set in session.py) the column arrives as a BIGINT of nanoseconds; we
convert to a proper timestamp with **integer** division (`div 1000`) —
a double division would lose precision above 2^53 ns (~1970+104 days).
Truncation toward zero matches DuckDB's ns→us handling, so oracle
comparisons agree to the microsecond.

Footer sniffing happens driver-side via pyarrow (one footer read; no
Spark job), so the conversion is applied before any plan is built and
Catalyst still sees a plain timestamp column it can push filters onto.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _nano_ts_columns(path: str) -> list[str]:
    """Column names stored as parquet timestamp[ns] (driver-side footer read)."""
    try:
        import pyarrow.dataset as ds

        schema = ds.dataset(path, format="parquet").schema
    except Exception:
        return []
    import pyarrow as pa

    return [f.name for f in schema if pa.types.is_timestamp(f.type) and f.type.unit == "ns"]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table, normalizing nano-timestamps to TimestampType.

    Self-sufficient w.r.t. session config: the driver may hand us a
    plain SparkSession, so the nanos compat flag and UTC timezone
    (naive parquet timestamps == UTC instants, matching DuckDB's naive
    semantics) are (re)applied here — both are runtime-settable.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    dtypes = dict(df.dtypes)
    # Only convert ns-columns that actually arrived as BIGINT nanos:
    # Spark reads its own ns-written files as timestamps directly, so a
    # re-materialized table (e.g. tools/gen_scale.py output) must not
    # be divided twice.
    for c in _nano_ts_columns(path):
        if dtypes.get(c) == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    # Naive (isAdjustedToUTC=false) parquet timestamps arrive as
    # TIMESTAMP_NTZ; normalize to TIMESTAMP (lossless under the UTC
    # session tz pinned above) so unix_micros & friends apply uniformly.
    for name, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(name, F.col(name).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names=TABLE_NAMES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, names=TABLE_NAMES) -> None:
    """Register each table as a temp view for the SQL surface."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
