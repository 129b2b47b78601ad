"""Bucketed table writes — the co-located-join primitive every
"ideally bucketed by <key>" note in this codebase points at.

At 100 TB the dominant cost of a repeated equi-join (fact↔dim
refresh, index probe, postings lookup) is re-shuffling both sides on
the key every run. Writing each side ONCE with `bucketBy(n, key)`
pins rows to hash buckets on disk; Spark's scan then reports the
bucket distribution and a later join on that key needs NO Exchange on
the bucketed side(s) — the shuffle is paid once at write time and
amortized over every subsequent join. `sortBy` additionally lets the
sort-merge join skip its per-task sort.

Bucketed output REQUIRES the table catalog (`saveAsTable` — bucket
metadata lives in the metastore, `parquet(path)` has nowhere to put
it), and both join sides must agree on the bucket count (or one be a
multiple of the other with `spark.sql.bucketing.coalesceBucketsInJoin
.enabled`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    keys: list[str] | str,
    buckets: int,
    sort_by: list[str] | str | None = None,
    format: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Persist `df` as a bucketed catalog table: `bucketBy(buckets,
    keys)` (+ optional `sortBy`) via `saveAsTable`. Pick `buckets` so
    one bucket's share of the table fits an executor's task memory at
    full scale (buckets are the parallelism FLOOR for later scans —
    too few large buckets serialize the join)."""
    if buckets < 1:
        raise ValueError(f"write_bucketed: buckets must be >= 1: {buckets}")
    keys = [keys] if isinstance(keys, str) else list(keys)
    if not keys:
        raise ValueError("write_bucketed: need at least one bucket key")
    writer = (
        df.write.mode(mode)
        .format(format)
        .bucketBy(buckets, keys[0], *keys[1:])
    )
    if sort_by:
        sort_by = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        writer = writer.sortBy(sort_by[0], *sort_by[1:])
    writer.saveAsTable(table)


class BucketedTableSink:
    """Sink-protocol wrapper over :func:`write_bucketed` (ctx keys:
    `table`, `keys`, `buckets`, optional `sort_by`/`format`/`mode`) —
    drops into `transform` pipelines like CSVSink/ParquetSink."""

    def __call__(self, df: DataFrame, ctx) -> DataFrame:
        write_bucketed(
            df,
            ctx["table"],
            keys=ctx["keys"],
            buckets=ctx["buckets"],
            sort_by=ctx.get("sort_by"),
            format=ctx.get("format", "parquet"),
            mode=ctx.get("mode", "overwrite"),
        )
        return df

    def apply(self, df, ctx):
        return self(df, ctx)


def is_bucketed_on(spark: SparkSession, table: str, keys: list[str]) -> bool:
    """True when `table`'s catalog metadata buckets by exactly `keys`
    (order-sensitive — bucket pruning and join co-location key on the
    full tuple)."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    meta = {r["col_name"]: r["data_type"] for r in rows}
    cols = meta.get("Bucket Columns", "")
    want = ", ".join(f"`{k}`" for k in keys)
    return cols.strip("[]") == want
