"""Deterministic sampling / dataset splitting for training pipelines.

`split_by_hash` assigns every row to a named split (train/val/test…)
by hashing a stable key — reproducible across runs, engines, and
cluster sizes (unlike `randomSplit`, which depends on partitioning),
and stable under data growth: a row keeps its split when new rows
arrive. md5-derived buckets make the assignment portable to any
engine (the DuckDB oracle replays it exactly).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_BUCKETS = 1_000_000


def hash_bucket(key: str | Column, buckets: int = HASH_BUCKETS) -> Column:
    """Uniform bucket in [0, buckets) from md5 of the key (first 7 hex
    digits → 28-bit int, mod buckets) — engine-portable."""
    c = F.col(key) if isinstance(key, str) else key
    return (
        F.conv(F.substring(F.md5(c.cast("string")), 1, 7), 16, 10).cast("long")
        % buckets
    ).cast("int")


def split_by_hash(
    df: DataFrame,
    key: str | Column,
    fractions: dict[str, float],
    *,
    split_col: str = "split",
) -> DataFrame:
    """Append `split_col` ∈ fractions.keys(), deterministic per key.

    Fractions must sum to ≤ 1; any remainder falls into the LAST named
    split. Assignment: cumulative thresholds over the hash bucket.
    """
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1")
    bucket = hash_bucket(key)
    expr = None
    acc = 0.0
    names = list(fractions)
    for name in names[:-1]:
        acc += fractions[name]
        cond = bucket < int(acc * HASH_BUCKETS)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(names[-1])
    return df.withColumn(split_col, expr)


def stratified_sample_by_hash(
    df: DataFrame,
    key: str | Column,
    strata_cols: Sequence[str],
    fraction: float,
) -> DataFrame:
    """Deterministic per-stratum sample: within each stratum, keep the
    rows whose hash bucket falls below the fraction threshold —
    reproducible (unlike `sampleBy`) and exact-in-expectation per
    stratum. `strata_cols` participate in the hash so the same key can
    be sampled independently per stratum."""
    h = hash_bucket(
        F.concat_ws(
            "|",
            *[F.col(c).cast("string") for c in strata_cols],
            (F.col(key) if isinstance(key, str) else key).cast("string"),
        )
    )
    return df.where(h < int(fraction * HASH_BUCKETS))


def mixture_sample(
    df: DataFrame,
    rates: dict[str, float],
    *,
    source_col: str = "source",
    key: str | Column = "doc_id",
    default_rate: float = 1.0,
) -> DataFrame:
    """Pretraining data-mixture sampling: keep each row with a
    per-source probability (downsample boilerplate web, keep books),
    decided by the row's stable hash — so the sample is reproducible
    across runs/engines/cluster layouts, rows keep their fate as the
    corpus grows, and exact thresholds are integers (no float-boundary
    ambiguity: threshold = round(rate * HASH_BUCKETS) computed
    driver-side).

    Filter-only (no shuffle); composes with everything downstream.
    """
    thresholds = {s: int(round(r * HASH_BUCKETS)) for s, r in rates.items()}
    default_thr = int(round(default_rate * HASH_BUCKETS))
    thr: Column = F.lit(default_thr)
    for s, t in sorted(thresholds.items()):
        thr = F.when(F.col(source_col) == s, F.lit(t)).otherwise(thr)
    return df.where(hash_bucket(key) < thr)


def token_budget_sample(
    df: DataFrame,
    budget_tokens: int,
    *,
    source_col: str = "source",
    key: str | Column = "doc_id",
    text_col: str = "text",
    token_col: str | None = None,
) -> DataFrame:
    """Fill each source with documents until its token budget is met —
    mixtures specified in tokens rather than rates (the form real
    pretraining recipes use). Docs are taken in stable hash order
    (ties broken by the key), so the selection is reproducible across
    engines/runs and only the boundary doc changes as the budget moves.
    The doc that crosses the budget is kept ("at least budget" fill).

    Appends nothing; returns the kept rows plus `_nt` (token count).
    One window shuffle keyed on the source."""
    from pyspark.sql import Window

    from featurestore_spark.operators.text import token_count

    nt = token_count(text_col) if token_col is None else F.col(token_col)
    keyc = F.col(key) if isinstance(key, str) else key
    w = Window.partitionBy(source_col).orderBy(hash_bucket(keyc), keyc)
    out = df.withColumn("_nt", nt).withColumn("_cum", F.sum("_nt").over(w))
    return out.where(F.col("_cum") - F.col("_nt") < budget_tokens).drop("_cum")
