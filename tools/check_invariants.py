#!/usr/bin/env python3
"""Property-invariant validation at the 10x replication stress for the
queries whose DuckDB oracles are too expensive to run there (VERDICT
r6 #6): q_simhash_near_dups (brute-force all-pairs oracle),
q_dedup_clusters / q_embedding_clusters (recursive-CTE oracles), and
q_pack_chunks (recursive-CTE oracle).

The 10x dataset (tools/gen_scale.py) replicates every document/vector
`factor` times with ids shifted by `i * stride` and payloads kept —
so each output is determined by the base output in closed form:

* SimHash pairs: replicas are exact dups, so signatures are
  id-independent. Cross-family pairs (different base docs) must
  project (id % stride) onto EXACTLY the base pair set with the same
  Hamming distance, factor^2 member pairs per base pair; within-family
  pairs (same base doc) must all have Hamming 0 and be complete
  (C(factor, 2) per base doc).
* Connected components: exact replicas attach to their base doc's
  component and add no cross-component edges (the rep-level graph is
  unchanged), so component labels (min reachable id, with the i=0
  replica keeping the base id) restricted to i=0 members must equal
  the base labeling — plus a singleton component per base-isolated
  doc — and every replica must carry its base member's label.
* Pack chunks: conservation (the packed multiset is exactly the input
  chunk multiset) + a window-function replay of the next-fit walk
  (bin_fill is the running sum within a bin; a bin boundary happens
  IFF the previous fill plus the chunk would exceed the budget).
  These two properties uniquely determine next-fit output, so they
  are a complete value check, not a smoke test.

Usage:
    python3 tools/check_invariants.py \
        --base /root/testdata/sf0.1 --rep /tmp/sf1_derived --factor 10
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

Check = tuple[str, bool, str]


def _pair_proj(df: DataFrame, stride: int) -> DataFrame:
    """Project member-level pairs to unordered base-id pairs."""
    a = F.col("a_id") % stride
    b = F.col("b_id") % stride
    return df.select(
        F.least(a, b).alias("pa"),
        F.greatest(a, b).alias("pb"),
        "hamming",
    )


def simhash_checks(
    base_pairs: DataFrame,
    rep_pairs: DataFrame,
    n_base_docs: int,
    factor: int,
    stride: int,
) -> list[Check]:
    checks: list[Check] = []
    cross = rep_pairs.where(F.col("a_id") % stride != F.col("b_id") % stride)
    within = rep_pairs.where(F.col("a_id") % stride == F.col("b_id") % stride)

    proj = _pair_proj(cross, stride).distinct()
    base = base_pairs.select(
        F.col("a_id").alias("pa"), F.col("b_id").alias("pb"), "hamming"
    )
    extra = proj.exceptAll(base).count()
    missing = base.exceptAll(proj).count()
    checks.append(
        (
            "simhash: projected cross pairs == base pairs (with hamming)",
            extra == 0 and missing == 0,
            f"extra={extra} missing={missing}",
        )
    )
    n_cross = cross.count()
    n_base_pairs = base_pairs.count()
    checks.append(
        (
            "simhash: factor^2 member pairs per base pair",
            n_cross == factor * factor * n_base_pairs,
            f"cross={n_cross} expected={factor * factor * n_base_pairs}",
        )
    )
    n_within = within.count()
    n_within_h0 = within.where(F.col("hamming") == 0).count()
    expected_within = n_base_docs * (factor * (factor - 1) // 2)
    checks.append(
        (
            "simhash: within-family pairs complete and all Hamming 0",
            n_within == expected_within and n_within_h0 == n_within,
            f"within={n_within} h0={n_within_h0} expected={expected_within}",
        )
    )
    return checks


def cluster_checks(
    base_out: DataFrame,
    rep_out: DataFrame,
    base_ids: DataFrame,
    factor: int,
    stride: int,
    id_col: str,
    label_col: str,
) -> list[Check]:
    checks: list[Check] = []
    # Expected i=0 slice: the base labeling, plus a singleton
    # component per base doc that was isolated (absent from base_out —
    # its replicas give it edges at 10x, labeled by its own base id).
    singles = base_ids.join(base_out, id_col, "left_anti").select(
        F.col(id_col), F.col(id_col).alias(label_col)
    )
    expected = base_out.select(id_col, label_col).unionByName(singles)
    slice0 = rep_out.where(F.col(id_col) < stride).select(id_col, label_col)
    extra = slice0.exceptAll(expected).count()
    missing = expected.exceptAll(slice0).count()
    checks.append(
        (
            f"clusters[{id_col}]: i=0 slice == base labeling + singletons",
            extra == 0 and missing == 0,
            f"extra={extra} missing={missing}",
        )
    )
    # Every replica carries its base member's label, and coverage is
    # exactly factor x the base universe.
    n_rep = rep_out.count()
    n_base = base_ids.count()
    mismatched = (
        rep_out.select(
            (F.col(id_col) % stride).alias("_b"), F.col(label_col).alias("_l")
        )
        .join(
            slice0.select(
                F.col(id_col).alias("_b"), F.col(label_col).alias("_l0")
            ),
            "_b",
        )
        .where(F.col("_l") != F.col("_l0"))
        .count()
    )
    checks.append(
        (
            f"clusters[{id_col}]: replicas share base label; full coverage",
            mismatched == 0 and n_rep == factor * n_base,
            f"mismatched={mismatched} rows={n_rep} expected={factor * n_base}",
        )
    )
    return checks


def pack_checks(
    rep_out: DataFrame, rep_chunks: DataFrame, budget: int
) -> list[Check]:
    checks: list[Check] = []
    key = ["pack_group", "doc_id", "chunk_idx", "n_chunk_tokens"]
    out_chunks = rep_out.select(*key)
    extra = out_chunks.exceptAll(rep_chunks.select(*key)).count()
    missing = rep_chunks.select(*key).exceptAll(out_chunks).count()
    checks.append(
        (
            "pack: packed multiset == input chunk multiset",
            extra == 0 and missing == 0,
            f"extra={extra} missing={missing}",
        )
    )
    w = Window.partitionBy("pack_group").orderBy("doc_id", "chunk_idx")
    walked = rep_out.select(
        "pack_group",
        "n_chunk_tokens",
        "bin_id",
        "bin_fill",
        F.lag("bin_id").over(w).alias("_pb"),
        F.lag("bin_fill").over(w).alias("_pf"),
    )
    bad = walked.where(
        ~F.when(
            F.col("_pb").isNull(),  # first chunk of the group
            (F.col("bin_id") == 0) & (F.col("bin_fill") == F.col("n_chunk_tokens")),
        )
        .when(
            # next-fit boundary: previous fill + this chunk overflows
            (F.col("_pf") > 0)
            & (F.col("_pf") + F.col("n_chunk_tokens") > budget),
            (F.col("bin_id") == F.col("_pb") + 1)
            & (F.col("bin_fill") == F.col("n_chunk_tokens")),
        )
        .otherwise(  # fits: same bin, fill accumulates
            (F.col("bin_id") == F.col("_pb"))
            & (F.col("bin_fill") == F.col("_pf") + F.col("n_chunk_tokens"))
        )
    ).count()
    checks.append(
        (
            "pack: window replay of the next-fit walk (boundaries iff overflow)",
            bad == 0,
            f"violations={bad}",
        )
    )
    return checks


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--rep", default="/tmp/sf1_derived")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--cpus", default="32")
    args = ap.parse_args()

    from featurestore_spark.io import load_table
    from featurestore_spark.queries import QUERIES
    from featurestore_spark.session import get_spark

    spark = get_spark(
        "check-invariants",
        master=f"local[{args.cpus}]",
        shuffle_partitions=int(args.cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    base_docs = load_table(spark, args.base, "documents")
    doc_stride = base_docs.agg(F.max("doc_id")).first()[0] + 1
    n_base_docs = base_docs.count()
    base_vecs = load_table(spark, args.base, "embeddings")
    vec_stride = base_vecs.agg(F.max("vec_id")).first()[0] + 1

    checks: list[Check] = []

    q = QUERIES["q_simhash_near_dups"].spark
    checks += simhash_checks(
        q(spark, args.base), q(spark, args.rep),
        n_base_docs, args.factor, doc_stride,
    )

    q = QUERIES["q_dedup_clusters"].spark
    checks += cluster_checks(
        q(spark, args.base), q(spark, args.rep),
        base_docs.select("doc_id"), args.factor, doc_stride,
        "doc_id", "canonical_id",
    )

    q = QUERIES["q_embedding_clusters"].spark
    checks += cluster_checks(
        q(spark, args.base), q(spark, args.rep),
        base_vecs.select("vec_id"), args.factor, vec_stride,
        "vec_id", "canonical_id",
    )

    from featurestore_spark.operators.curation import chunk_documents

    rep_chunks = (
        chunk_documents(load_table(spark, args.rep, "documents"), window=32)
        .withColumn("pack_group", (F.col("doc_id") % 8).cast("int"))
        .select("pack_group", "doc_id", "chunk_idx", "n_chunk_tokens")
    )
    checks += pack_checks(
        QUERIES["q_pack_chunks"].spark(spark, args.rep), rep_chunks, budget=128
    )

    failed = 0
    for name, ok, detail in checks:
        print(f"{'PASS' if ok else 'FAIL'}  {name}  ({detail})")
        failed += 0 if ok else 1
    print(f"\n{len(checks) - failed}/{len(checks)} invariant checks pass")
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
