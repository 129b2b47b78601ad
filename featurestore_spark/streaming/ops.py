"""Structured Streaming variants of the event operators (stretch scope:
the reference is batch-only — its single streaming import is a
Duration value type for the sessionize timeout, SURVEY.md §2.13; these
are net-new, enabled by the DataFrame formulation being
streaming-compatible).

- `streaming_event_counts`: tumbling-window per-entity counts/sums with
  a watermark for late data (A3/A5 streaming analog).
- `streaming_sessionize`: `session_window` gap-based sessions — the
  built-in stateful operator matching W1's timeout semantics exactly.
- `streaming_dedup_exact`: watermarked exact dedup on a content
  fingerprint — the streaming side of `operators/dedup.exact_dedup`
  (state bounded by the watermark horizon instead of all history).

Both run identically on batch DataFrames (Spark's unified API), which
is how the tests cross-check them against the batch operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_event_stream(
    spark: SparkSession,
    path: str,
    schema,
    *,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source event stream with explicit schema (streams never
    infer — inference would stall the first micro-batch)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.format(fmt).load(path)


def streaming_event_counts(
    events: DataFrame,
    *,
    entity_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window counts + sums per (entity, window); the
    watermark bounds state for late data. Works on batch input too."""
    src = events
    if src.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    return (
        src.groupBy(F.window(F.col(ts_col), window).alias("win"), F.col(entity_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 2).alias("total"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            entity_col,
            "n_events",
            "total",
        )
    )


def streaming_dedup_exact(
    docs: DataFrame,
    *,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
    fingerprint_col: str = "_fp",
) -> DataFrame:
    """Drop exact-content duplicates from a stream: md5 fingerprint +
    `dropDuplicatesWithinWatermark`, so the dedup state store holds
    only the watermark horizon — at 100 TB/day the unbounded
    `dropDuplicates` state would never stop growing. Batch inputs fall
    back to plain `dropDuplicates` on the same fingerprint (identical
    semantics when everything fits one "horizon").
    """
    fp = F.md5(F.col(text_col).cast("string"))
    src = docs.withColumn(fingerprint_col, fp)
    if src.isStreaming:
        out = src.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            [fingerprint_col]
        )
    else:
        out = src.dropDuplicates([fingerprint_col])
    return out.drop(fingerprint_col)


def streaming_sessionize(
    events: DataFrame,
    *,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based sessions via the built-in `session_window` stateful
    operator — W1's timeout semantics in streaming form. Emits one row
    per closed session: (entity, session_start, session_end, n_events).
    """
    src = events
    if src.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    return (
        src.groupBy(
            F.session_window(F.col(ts_col), gap).alias("sess"), F.col(entity_col)
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            entity_col,
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
        )
    )


def streaming_attribution(
    clicks: DataFrame,
    purchases: DataFrame,
    *,
    entity_col: str = "user_id",
    click_ts: str = "ts",
    purchase_ts: str = "ts",
    click_id: str = "event_id",
    purchase_id: str = "event_id",
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream attribution join: every (click, purchase) pair for
    the same entity with the purchase inside [click, click + horizon].

    On streams both sides carry watermarks and the join has an explicit
    event-time range bound — the two conditions Spark needs to plan a
    StreamingSymmetricHashJoin with state EVICTION (without them the
    join state grows forever). On batch inputs the identical condition
    plans as a hash equi-join on the entity with a range post-filter,
    which is how the tests cross-check stream vs batch output.
    """
    c = clicks.select(
        F.col(entity_col),
        F.col(click_id).alias("click_id"),
        F.col(click_ts).alias("click_ts"),
    )
    p = purchases.select(
        F.col(entity_col).alias("_p_entity"),
        F.col(purchase_id).alias("purchase_id"),
        F.col(purchase_ts).alias("purchase_ts"),
    )
    if c.isStreaming:
        c = c.withWatermark("click_ts", watermark)
    if p.isStreaming:
        p = p.withWatermark("purchase_ts", watermark)
    cond = (
        (F.col(entity_col) == F.col("_p_entity"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {horizon}")
        )
    )
    return c.join(p, cond, "inner").select(
        entity_col, "click_id", "click_ts", "purchase_id", "purchase_ts"
    )
