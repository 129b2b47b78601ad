"""Incremental corpus deduplication — dedup a NEW ingestion batch
against a persisted MinHash signature index of the already-accepted
corpus, without re-reading the corpus.

This is the rolling-ingestion shape of the LSH dedup pipeline
(`operators/dedup.py`): a 100-TB pretraining corpus is not deduped in
one shot — batches arrive continuously, and re-running the full
pairwise pipeline over corpus ∪ batch would re-shingle and re-shuffle
the whole corpus per batch. Instead:

1. `minhash_band_index(corpus)` is computed ONCE and persisted
   (parquet, ideally bucketed by `band_hash`): one melted row
   (doc_id, band_idx, band_hash) per band per DISTINCT corpus text —
   ~bands × 40 bytes per distinct document, independent of document
   length. At 10^10 docs × 4 bands that's ~2 TB — 2 % of the corpus,
   and the only thing a batch ever joins against.
2. `dedup_against_index(batch, index, base=…, threshold=…)` drops
   batch docs that are near-dups of indexed texts. The batch is
   exact-collapsed first (`_collapse_exact_texts`), so all band and
   verify work is per DISTINCT batch text; the corpus is touched only
   by the verify join, and only for the candidate rep ids — a
   semi-join that prunes to a tiny fraction of the corpus (predicate
   pushdown on the corpus table's id column).
3. `extend_index(index, kept)` appends the accepted batch's bands so
   the next batch dedups against corpus + this batch.

Within-batch duplicates are deliberately out of scope — compose
`dedup.dedup_keep_docs(batch)` BEFORE the against-index step (tested
equivalence: index-dedup ∘ within-batch-dedup == restricting the
full-corpus pipeline's keep set to the batch, when base ids precede
batch ids and no `max_bucket` cap binds).

The reference has no incremental surface (batch-only, SURVEY.md §2);
this is net-new scale scope alongside the dedup family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from featurestore_spark.operators.dedup import (
    _collapse_exact_texts,
    jaccard_pairs,
    minhash_bands,
)
from featurestore_spark.operators.materialize import materialize


def _melt_bands(bands_df: DataFrame, id_col: str, bands: int) -> DataFrame:
    """(id, band_0..band_{b-1}) → (id, band_idx, band_hash)."""
    return bands_df.selectExpr(
        id_col,
        "stack({}, {}) as (band_idx, band_hash)".format(
            bands, ", ".join(f"'{i}', band_{i}" for i in range(bands))
        ),
    )


def minhash_band_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    n: int = 3,
    k: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Melted band index over DISTINCT texts: (doc_id, band_idx,
    band_hash), where doc_id is each exact-duplicate group's minimum
    id. Persist this (parquet; bucket by band_hash for co-located
    batch joins) — it is the only corpus-derived state a future batch
    needs.

    Lazy on purpose (unlike the dedup operators' eager collapse): the
    index is built to be WRITTEN, a single linear consumer, so no
    materialization barrier is needed. Exact-duplicate groups are
    collapsed with the same verified 128-bit scalar hash as
    `dedup._collapse_exact_texts` (two seeded xxhash64 longs, ties
    checked, collision raises), inlined here without the eager
    members frame."""
    hashed = df.select(
        F.col(id_col).alias("member_id"),
        F.col(text_col).alias("_text"),
        F.xxhash64(text_col).alias("_h1"),
        F.xxhash64(F.lit(0x9E3779B9), F.col(text_col)).alias("_h2"),
    )
    reps = (
        hashed.groupBy("_h1", "_h2")
        .agg(
            F.min("member_id").alias(id_col),
            F.min("_text").alias("_text"),
            F.max("_text").alias("_tmax"),
        )
        .withColumn(
            "_text",
            F.when(
                F.col("_text").eqNullSafe(F.col("_tmax")), F.col("_text")
            ).otherwise(
                F.raise_error(
                    F.lit(
                        "minhash_band_index: 128-bit text-hash collision "
                        "on distinct texts"
                    )
                )
            ),
        )
        .select(id_col, F.col("_text").alias(text_col))
    )
    b = minhash_bands(reps, text_col, id_col, n=n, k=k, bands=bands)
    return _melt_bands(b, id_col, bands)


def dedup_against_index(
    batch: DataFrame,
    index: DataFrame,
    *,
    base: DataFrame | None = None,
    threshold: float | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    k: int = 16,
    bands: int = 4,
    max_bucket: int = 1000,
) -> DataFrame:
    """Drop batch docs that are near-duplicates of the indexed corpus;
    returns the KEPT batch rows (all columns).

    Two modes:
    - **band-only** (`threshold=None`): a batch doc drops iff its text
      shares ≥1 band hash with the index — the cheap high-recall mode
      (LSH false positives drop too; acceptable when the corpus is
      authoritative and the batch expendable).
    - **verified** (`threshold` + `base`): band collisions are
      verified with exact n-gram Jaccard against the colliding base
      documents; a batch doc drops iff some verified near-dup
      (jaccard ≥ threshold) exists. Only candidate rep ids' texts are
      read from `base` — at scale an id-pushdown semi-join, not a
      corpus scan. Exact duplicates of indexed texts drop in both
      modes (identical text ⇒ identical bands, jaccard 1).

    Shuffle pattern: exact-collapse the batch (all band/verify work per
    DISTINCT batch text) → melt reps' bands → equi-join against the
    index on (band_idx, band_hash) → [verify join] → expand dropped
    reps to members via the membership frame (linear joins, never a
    per-group array). Degenerate index buckets larger than
    `max_bucket` (boilerplate band hashes shared by >1000 distinct
    corpus texts) are dropped via a window COUNT before the join —
    the same quadratic-blowup guard as `minhash_candidate_pairs`,
    sized on the index side where the skew lives.

    Contract: `id_col` must be unique ACROSS base and batch (the
    verify join unions both sides' (id, text) rows; an id collision
    would cross-wire the shingle lookup). Any ingestion pipeline
    assigning monotone batch ids satisfies this."""
    if threshold is not None and base is None:
        raise ValueError(
            "dedup_against_index: verified mode (threshold set) requires "
            "`base` (the corpus docs) for the Jaccard verify join"
        )
    groups, members = _collapse_exact_texts(
        batch, text_col, id_col, "dedup_against_index"
    )
    reps = groups.select(F.col("rep_id").alias(id_col), F.col("_text").alias(text_col))
    melt_q = _melt_bands(
        minhash_bands(reps, text_col, id_col, n=n, k=k, bands=bands), id_col, bands
    )
    w = Window.partitionBy("band_idx", "band_hash")
    idx = (
        index.withColumn("_bn", F.count(F.lit(1)).over(w))
        .where(F.col("_bn") <= max_bucket)
        .select(F.col(id_col).alias("_base_id"), "band_idx", "band_hash")
    )
    cand = melt_q.join(idx, ["band_idx", "band_hash"]).select(
        F.col(id_col).alias("_q_id"), "_base_id"
    )
    if threshold is None:
        dropped_reps = cand.select(F.col("_q_id").alias("rep_id")).distinct()
    else:
        # Materialized: the pair list feeds BOTH the base semi-join and
        # the verify join — without the barrier the batch-bands ×
        # index join (the expensive subtree) runs once per consumer.
        pairs = materialize(cand.distinct())
        # Verify join reads only the candidate base ids' texts — keep
        # the base scan slim (id + text) so column pruning reaches the
        # corpus parquet.
        both = reps.unionByName(
            base.select(
                F.col(id_col),
                F.col(text_col),
            ).join(
                pairs.select(F.col("_base_id").alias(id_col)).distinct(), id_col
            )
        )
        verified = jaccard_pairs(
            both,
            pairs.withColumnsRenamed({"_q_id": "a_id", "_base_id": "b_id"}),
            text_col=text_col,
            id_col=id_col,
            n=n,
        ).where(F.col("jaccard") >= threshold)
        dropped_reps = verified.select(F.col("a_id").alias("rep_id")).distinct()
    drops = (
        members.join(dropped_reps, "rep_id")
        .select(F.col("member_id").alias(id_col))
        .distinct()
    )
    return batch.join(drops, id_col, "left_anti")


# -- embedding side (SRP-LSH) -----------------------------------------------


def _vector_frames(df: DataFrame, id_col: str, vec_col: str):
    """(member_id, v, _h1, _h2) over non-null vectors — the shared
    front of the vector collapse (same scalar-hash scheme as
    `similarity.embedding_near_dups`)."""
    base = df.where(F.col(vec_col).isNotNull())
    from featurestore_spark.operators.similarity import as_double_array

    return base.select(
        F.col(id_col).alias("member_id"),
        as_double_array(vec_col).alias("v"),
    ).select(
        "member_id",
        "v",
        F.xxhash64("v").alias("_h1"),
        F.xxhash64(F.lit(0x9E3779B9), F.col("v")).alias("_h2"),
    )


def _collapse_vectors(hashed: DataFrame, id_col: str, op_name: str) -> DataFrame:
    """(id_col, v) one row per DISTINCT vector; min id as rep; in-group
    collision verify identical to `similarity.embedding_near_dups`."""
    return (
        hashed.groupBy("_h1", "_h2")
        .agg(
            F.min("member_id").alias(id_col),
            F.min("v").alias("v"),
            F.max("v").alias("_vmax"),
        )
        .withColumn(
            "v",
            F.when(F.col("v").eqNullSafe(F.col("_vmax")), F.col("v")).otherwise(
                F.raise_error(
                    F.lit(f"{op_name}: 128-bit vector-hash collision")
                )
            ),
        )
        .select(id_col, "v", "_h1", "_h2")
    )


def srp_code_index(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    bits: int = 8,
    bands: int = 6,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Melted SRP band-code index over DISTINCT vectors: (vec_id,
    band_idx, code) — the embedding-side analog of
    `minhash_band_index`. ~bands × 16 bytes per distinct vector,
    independent of embedding width; persist it (bucket by code) and
    incremental batches dedup against it without re-reading the
    corpus's embeddings. Codes use the seeded integer-hyperplane SRP
    family of `similarity.srp_band_codes` (exact arithmetic,
    engine-reproducible)."""
    from featurestore_spark.operators.similarity import (
        srp_band_codes,
        srp_hyperplanes,
    )

    hashed = _vector_frames(df, id_col, vec_col)
    if dim is None:
        row = hashed.select(F.size("v")).first()
        dim = row[0] if row is not None else 1
    reps = _collapse_vectors(hashed, id_col, "srp_code_index").drop("_h1", "_h2")
    hp = srp_hyperplanes(dim, bits * bands, seed)
    coded = reps.select(
        id_col, srp_band_codes(F.col("v"), hp, bits, bands).alias("_codes")
    )
    return coded.select(id_col, F.posexplode("_codes").alias("band_idx", "code"))


def dedup_embeddings_against_index(
    batch: DataFrame,
    index: DataFrame,
    *,
    base: DataFrame | None = None,
    threshold: float | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
    bands: int = 6,
    seed: int = 42,
    dim: int | None = None,
    max_bucket: int = 1000,
) -> DataFrame:
    """Drop batch rows whose embedding is a near-duplicate (cosine ≥
    threshold) of an indexed corpus vector; returns the KEPT batch
    rows. Embedding-side analog of `dedup_against_index`:

    - band-only (`threshold=None`): any shared (band_idx, code) with
      the index drops the batch vector — cheap, high recall;
    - verified (`threshold` + `base`): code collisions are verified
      with exact cosine against only the candidate corpus ids'
      vectors (id-pushdown semi-join on `base`).

    Same scale shape as the text side: batch collapsed to DISTINCT
    vectors first (code/verify work is replication-invariant),
    degenerate index code buckets beyond `max_bucket` dropped via a
    window COUNT, drops expanded through the membership frame. Rows
    with NULL embeddings are always kept (no similarity to anything —
    the `embedding_near_dups` contract)."""
    from featurestore_spark.operators.similarity import (
        dot,
        norm,
        srp_band_codes,
        srp_hyperplanes,
    )

    if threshold is not None and base is None:
        raise ValueError(
            "dedup_embeddings_against_index: verified mode (threshold set) "
            "requires `base` (the corpus embeddings) for the cosine verify"
        )
    hashed = _vector_frames(batch, id_col, vec_col)
    if dim is None:
        row = hashed.select(F.size("v")).first()
        if row is None:
            return batch  # empty/all-null batch: nothing can collide
        dim = row[0]
    reps = materialize(_collapse_vectors(hashed, id_col, "dedup_embeddings"))
    members = materialize(
        hashed.select("member_id", "_h1", "_h2")
        .join(reps.select("_h1", "_h2", F.col(id_col).alias("rep_id")),
              ["_h1", "_h2"])
        .select("rep_id", "member_id")
    )
    reps = reps.drop("_h1", "_h2")
    hp = srp_hyperplanes(dim, bits * bands, seed)
    melt_q = reps.select(
        id_col, srp_band_codes(F.col("v"), hp, bits, bands).alias("_codes")
    ).select(id_col, F.posexplode("_codes").alias("band_idx", "code"))
    w = Window.partitionBy("band_idx", "code")
    idx = (
        index.withColumn("_bn", F.count(F.lit(1)).over(w))
        .where(F.col("_bn") <= max_bucket)
        .select(F.col(id_col).alias("_base_id"), "band_idx", "code")
    )
    cand = melt_q.join(idx, ["band_idx", "code"]).select(
        F.col(id_col).alias("_q_id"), "_base_id"
    )
    if threshold is None:
        dropped_reps = cand.select(F.col("_q_id").alias("rep_id")).distinct()
    else:
        from featurestore_spark.operators.similarity import as_double_array

        pairs = materialize(cand.distinct())
        bvec = (
            base.select(
                F.col(id_col).alias("_base_id"),
                as_double_array(vec_col).alias("bv"),
            )
            .join(pairs.select("_base_id").distinct(), "_base_id")
            .withColumn("_bn2", norm(F.col("bv")))
        )
        qvec = reps.select(
            F.col(id_col).alias("_q_id"),
            F.col("v").alias("qv"),
            norm(F.col("v")).alias("_qn"),
        )
        verified = (
            pairs.join(qvec, "_q_id")
            .join(bvec, "_base_id")
            .withColumn(
                "sim",
                F.round(
                    dot(F.col("qv"), F.col("bv"))
                    / (F.col("_qn") * F.col("_bn2")),
                    6,
                ),
            )
            .where(F.col("sim") >= threshold)
        )
        dropped_reps = verified.select(F.col("_q_id").alias("rep_id")).distinct()
    drops = (
        members.join(dropped_reps, "rep_id")
        .select(F.col("member_id").alias(id_col))
        .distinct()
    )
    return batch.join(drops, id_col, "left_anti")


def dedup_stream_against_index(
    index_path: str,
    kept_path: str,
    *,
    base_path: str | None = None,
    threshold: float | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    k: int = 16,
    bands: int = 4,
    max_bucket: int = 1000,
):
    """`foreachBatch` callback for streaming ingestion dedup: each
    micro-batch is deduped against the persisted band index, and the
    survivors' bands are added so batch N+1 dedups against everything
    accepted through batch N.

    Layout: every path is a directory of `batch=<id>` subdirectories —
    standard Hive-style partitioning, read back as one frame via
    partition discovery. Each micro-batch OVERWRITES its own
    `batch=<id>` subdir and the reads EXCLUDE the current batch id —
    so a foreachBatch retry (micro-batches carry at-least-once
    semantics; only the sink write must be idempotent) neither appends
    duplicates nor sees the failed attempt's own writes, making the
    pipeline exactly-once.

    - `index_path`: band index root. Seed it with
      `minhash_band_index(corpus).write.parquet(f"{index_path}/batch=seed")`.
    - `kept_path`: accepted (deduped) docs, the pipeline's output.
    - `base_path` (verified mode): (id, text) corpus lookup for the
      Jaccard verify join — seed with the corpus's id/text columns;
      each batch's survivors are appended (their own `batch=` subdir)
      so later batches verify against them too.

    Usage::

        cb = dedup_stream_against_index("/idx", "/kept",
                                        base_path="/base", threshold=0.8)
        stream.writeStream.foreachBatch(cb).option(
            "checkpointLocation", "/chk").start()
    """
    if threshold is not None and base_path is None:
        raise ValueError(
            "dedup_stream_against_index: verified mode requires base_path"
        )

    def _load(spark, root, exclude_batch):
        # Partition discovery surfaces `batch` as a column; the CURRENT
        # batch id is excluded so a foreachBatch RETRY does not see the
        # failed attempt's own writes (survivors would collide with
        # themselves in the index and be dropped — breaking the
        # overwrite-idempotency this layout exists for).
        df = spark.read.parquet(root)
        return df.where(
            F.col("batch").cast("string") != str(exclude_batch)
        ).drop("batch")

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        idx = _load(spark, index_path, batch_id)
        base = (
            _load(spark, base_path, batch_id).select(id_col, text_col)
            if base_path is not None
            else None
        )
        kept = dedup_against_index(
            batch_df,
            idx,
            base=base,
            threshold=threshold,
            text_col=text_col,
            id_col=id_col,
            n=n,
            k=k,
            bands=bands,
            max_bucket=max_bucket,
        )
        kept = materialize(kept)  # one pass; fans out to 2-3 writes below
        kept.write.mode("overwrite").parquet(f"{kept_path}/batch={batch_id}")
        minhash_band_index(
            kept, text_col, id_col, n=n, k=k, bands=bands
        ).write.mode("overwrite").parquet(f"{index_path}/batch={batch_id}")
        if base_path is not None:
            kept.select(id_col, text_col).write.mode("overwrite").parquet(
                f"{base_path}/batch={batch_id}"
            )

    return process


def extend_index(
    index: DataFrame,
    kept: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    n: int = 3,
    k: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Append the accepted batch's band rows to the index so the next
    batch dedups against corpus + this batch. Returns the unioned
    index frame; the caller persists it (append-mode parquet write of
    just the new rows in production — the union here is for in-session
    chaining and tests)."""
    new_rows = minhash_band_index(
        kept, text_col, id_col, n=n, k=k, bands=bands
    )
    return index.unionByName(new_rows)
