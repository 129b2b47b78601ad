"""Latest-per-key snapshots (the vault `current` view).

Rebuilds the reference's RDD `reduceByKey((a,b) => if (b.version >
a.version) b else a)` snapshot (ParquetDataLoader.scala:983-990) as a
window `row_number() = 1` — shuffle once on the key, partial sort per
partition, no driver involvement.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str | Column],
    *,
    descending: bool = True,
) -> DataFrame:
    """Keep the single highest-ranked row per key group.

    `order_by` columns rank within the group (version, ts, ...);
    `descending=True` keeps the max (latest version).
    """
    order = [
        (F.col(c) if isinstance(c, str) else c).desc() if descending
        else (F.col(c) if isinstance(c, str) else c).asc()
        for c in order_by
    ]
    w = Window.partitionBy(*keys).orderBy(*order)
    return df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")
