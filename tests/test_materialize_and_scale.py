"""Cluster-hardening tests (round 5): the materialization durability
knob, membership-frame collapse under extreme duplication, and
null-input safety of the 128-bit collapse verify."""

import pytest
from pyspark.sql import functions as F

from featurestore_spark.operators.dedup import (
    dedup_keep_docs,
    minhash_candidate_pairs,
    minhash_dedup_edges,
    simhash_near_dups,
)
from featurestore_spark.operators.materialize import MATERIALIZE_CONF, materialize


@pytest.fixture()
def small_docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog today"),
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "completely different content about query engines"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_materialize_unknown_mode_raises(spark, small_docs):
    spark.conf.set(MATERIALIZE_CONF, "bogus")
    try:
        with pytest.raises(ValueError, match="bogus"):
            materialize(small_docs)
    finally:
        spark.conf.unset(MATERIALIZE_CONF)


def test_materialize_reliable_requires_checkpoint_dir(spark, small_docs):
    if spark.sparkContext.getCheckpointDir() is not None:
        pytest.skip("checkpoint dir already set by another test")
    spark.conf.set(MATERIALIZE_CONF, "reliable")
    try:
        with pytest.raises(ValueError, match="setCheckpointDir"):
            materialize(small_docs)
    finally:
        spark.conf.unset(MATERIALIZE_CONF)


def test_materialize_modes_equivalent(spark, small_docs, tmp_path):
    """Every durability mode must produce identical operator results —
    the knob changes WHERE blocks live, never what is computed."""
    from featurestore_spark.operators.sampling import global_ntile

    def run():
        from featurestore_spark.operators.curation import (
            dedup_lines,
            remove_shared_spans,
        )

        kept = sorted(
            r["doc_id"] for r in dedup_keep_docs(small_docs, bands=8).collect()
        )
        buckets = {
            r["doc_id"]: r["b"]
            for r in global_ntile(
                small_docs.select("doc_id"), ["doc_id"], 2, bucket_col="b"
            ).collect()
        }
        lines = {
            r["doc_id"]: (r["text"], r["n_lines_kept"])
            for r in dedup_lines(small_docs, max_docs=1).collect()
        }
        spans = {
            r["doc_id"]: (r["text"], r["n_spans"])
            for r in remove_shared_spans(small_docs, n=5, min_df=2).collect()
        }
        return kept, buckets, lines, spans

    baseline = run()
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    spark.conf.set(MATERIALIZE_CONF, "reliable")
    try:
        assert run() == baseline
    finally:
        spark.conf.unset(MATERIALIZE_CONF)


def test_connected_components_reliable_mode(spark, tmp_path):
    """The iterative CC loop materializes per round — in `reliable`
    mode every round checkpoints to the checkpoint dir and the labels
    must be identical to local mode (the 100-TB long-job shape)."""
    from featurestore_spark.operators.resolve import connected_components

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (3, 4), (5, 5), (6, 7), (7, 8), (8, 9)],
        ["src", "dst"],
    )
    want = {
        r["id"]: r["component"] for r in connected_components(edges).collect()
    }
    spark.sparkContext.setCheckpointDir(str(tmp_path / "cc_ckpt"))
    spark.conf.set(MATERIALIZE_CONF, "reliable")
    try:
        got = {
            r["id"]: r["component"]
            for r in connected_components(edges).collect()
        }
    finally:
        spark.conf.unset(MATERIALIZE_CONF)
    assert got == want
    # the reliable run actually wrote checkpoint data
    ckpts = list((tmp_path / "cc_ckpt").rglob("*"))
    assert ckpts, "no reliable checkpoint files written"


def test_materialize_truncates_lineage_for_iteration(spark):
    """Both modes must TRUNCATE lineage: an iterative consumer whose
    rounds self-join (CC pointer jumping) grows the logical plan
    geometrically otherwise — a persist()-based mode OOMed the driver
    during analysis on exactly this shape (review r5). A 30-round
    chain must keep the final plan tiny."""
    from featurestore_spark.operators.resolve import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], ["src", "dst"]
    )
    out = connected_components(edges, max_iterations=40)
    assert {r["component"] for r in out.collect()} == {0}
    # post-materialization plan is rooted at the checkpoint, not the
    # 30-round join tree
    n_lines = len(out._jdf.queryExecution().analyzed().toString().splitlines())
    assert n_lines < 20, n_lines


def test_collapse_handles_null_texts(spark, small_docs):
    """A corpus containing null texts must not trip the hash-collision
    guard (null-safe min/max compare, ADVICE r4): the null rows form
    their own exact-duplicate group."""
    with_nulls = small_docs.unionByName(
        spark.createDataFrame([(100, None), (101, None)], "doc_id long, text string")
    )
    pairs = {
        (r["a_id"], r["b_id"])
        for r in minhash_candidate_pairs(
            with_nulls, bands=8, collapse_exact=True
        ).collect()
    }
    assert (100, 101) in pairs  # identical (null) texts are exact dups
    assert (0, 1) in pairs
    sh = {
        (r["a_id"], r["b_id"]): r["hamming"]
        for r in simhash_near_dups(with_nulls, max_hamming=3).collect()
    }
    assert sh[(100, 101)] == 0


def test_collapse_handles_null_vectors(spark):
    from featurestore_spark.operators.similarity import embedding_near_dups

    vecs = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [1.0, 2.0]), (2, None), (3, None)],
        "vec_id long, embedding array<double>",
    )
    rows = {
        (r["a_id"], r["b_id"]): r["sim"]
        for r in embedding_near_dups(vecs, threshold=0.99, dim=2).collect()
    }
    # null vectors have null similarity -> no pair, but no crash either
    assert rows == {(0, 1): 1.0}


def test_giant_duplicate_group_streams(spark):
    """ONE text replicated 10^6 times (VERDICT r4 #1): membership is a
    (rep_id, member_id) frame, so no single aggregation row carries the
    group. The linear-output operators must complete with exact
    counts."""
    n = 1_000_000
    replicas = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("boilerplate cookie banner text accepted by everyone").alias("text"),
    )
    distinct = spark.createDataFrame(
        [
            (n + 1, "a genuinely unique document about spark internals"),
            (n + 2, "another unique document entirely unrelated to it"),
        ],
        ["doc_id", "text"],
    )
    d = replicas.unionByName(distinct)

    # star edges: one per non-representative member of the giant group
    edges = minhash_dedup_edges(d, bands=8)
    assert edges.count() == n - 1

    # keep set: one doc per distinct text (no verified near-dups here)
    kept = dedup_keep_docs(d, bands=8)
    assert sorted(r["doc_id"] for r in kept.collect()) == [0, n + 1, n + 2]


def test_global_ntile_joinback_with_payload_columns(spark):
    """When df carries columns beyond the order key (the wide-corpus
    case), only the slim order-key frame materializes and buckets join
    back — result must still equal window ntile row for row, payload
    intact."""
    from pyspark.sql import Window

    from featurestore_spark.operators.sampling import global_ntile

    df = spark.range(997).select(
        F.col("id"),
        (F.col("id") * 13 % 100).alias("score"),
        F.concat(F.lit("payload-"), F.col("id")).alias("text"),
    )
    w = Window.orderBy("score", "id")
    want = {
        (r["id"], r["text"]): r["b"]
        for r in df.withColumn("b", F.ntile(5).over(w)).collect()
    }
    got = {
        (r["id"], r["text"]): r["b"]
        for r in global_ntile(df, ["score", "id"], 5, bucket_col="b").collect()
    }
    assert got == want


def test_global_ntile_rejects_bucket_col_clash(spark):
    from featurestore_spark.operators.sampling import global_ntile

    df = spark.range(10).select(F.col("id"), F.lit(1).alias("b"))
    with pytest.raises(ValueError, match="collide"):
        global_ntile(df, ["id"], 2, bucket_col="b")


def test_token_budget_sample_exposes_n_tokens(spark):
    """Public output column is `n_tokens`, not an underscore-internal
    name (VERDICT r4 #5)."""
    from featurestore_spark.operators.sampling import token_budget_sample

    df = spark.createDataFrame(
        [(1, "web", "one two three"), (2, "web", "four five six")],
        ["doc_id", "source", "text"],
    )
    out = token_budget_sample(df, 100)
    assert "n_tokens" in out.columns
    assert not any(c.startswith("_") for c in out.columns)
    assert {r["n_tokens"] for r in out.collect()} == {3}


def test_global_ntile_rejects_sort_order_expressions(spark):
    """F.col(...).desc() crashes codegen inside the slim projection
    (Spark 4 cannot decompose SortOrder) — reject with guidance
    instead of an INTERNAL_ERROR at execution (review r5)."""
    from featurestore_spark.operators.sampling import global_ntile

    df = spark.range(10).select(F.col("id"), (F.col("id") % 3).alias("score"))
    with pytest.raises(ValueError, match="sort order"):
        global_ntile(df, [F.col("score").desc(), "id"], 2)
    # the documented workaround: inverse sort key
    from pyspark.sql import Window

    want = {
        r["id"]: r["b"]
        for r in df.withColumn(
            "b", F.ntile(2).over(Window.orderBy(F.col("score").desc(), "id"))
        ).collect()
    }
    inv = df.withColumn("_negscore", F.col("score") * -1)
    got = {
        r["id"]: r["b"]
        for r in global_ntile(inv, ["_negscore", "id"], 2, bucket_col="b")
        .collect()
    }
    assert got == want


def test_global_ntile_joinback_rejects_duplicate_keys(spark):
    """Duplicate order keys would silently multiply rows through the
    join-back — must raise instead (review r5)."""
    from featurestore_spark.operators.sampling import global_ntile

    df = spark.createDataFrame(
        [(1, 5, "a"), (2, 5, "b"), (3, 6, "c")], ["id", "score", "payload"]
    )
    with pytest.raises(ValueError, match="uniquely"):
        global_ntile(df, ["score"], 2)


def test_universal_line_narrow_counting(spark):
    """A line present in EVERY document (10^5 docs): line-frequency
    counting must stay a narrow (hash, id) shuffle with map-side
    partial aggregation — no single row ever carries the membership —
    and the collapse keeps rebuild work at distinct-text cardinality.
    Exact counts asserted."""
    from featurestore_spark.operators.curation import dedup_lines

    n = 100_000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("universal cookie banner\nunique payload "),
            F.col("id").cast("string"),
        ).alias("text"),
    )
    out = dedup_lines(docs, max_docs=10)
    agg = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_lines_kept").alias("kept"),
        F.sum("n_lines").alias("total"),
    ).collect()[0]
    assert agg["n"] == n
    # the universal line (freq 10^5 > 10) dropped everywhere; each
    # doc keeps exactly its unique payload line
    assert agg["total"] == 2 * n and agg["kept"] == n
    sample = out.where(F.col("doc_id") == 7).collect()[0]
    assert sample["text"] == "unique payload 7"


@pytest.mark.slow  # multi-batch/sweep twin — slow tier (r15)
def test_dedup_ladder_pipeline_reliable_mode_end_to_end(spark, tmp_path):
    """The 100-TB durability story, end-to-end (VERDICT r5 #6): the
    full q_dedup_ladder pipeline (line dedup chained into span removal
    over the real sf0.001 parquet — every materialize() site in the
    collapse/frequent-set/interval machinery engaged) must produce
    byte-identical output under `reliable` checkpointing vs the
    `local` default, and must actually write to the checkpoint dir."""
    from featurestore_spark.queries import QUERIES

    sf_dir = "/root/testdata/sf0.001"

    def run():
        return sorted(
            tuple(r) for r in QUERIES["q_dedup_ladder"].spark(spark, sf_dir).collect()
        )

    baseline = run()
    assert baseline, "ladder produced no rows at sf0.001"
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ladder_ckpt"))
    spark.conf.set(MATERIALIZE_CONF, "reliable")
    try:
        assert run() == baseline
    finally:
        spark.conf.unset(MATERIALIZE_CONF)
    ckpts = [p for p in (tmp_path / "ladder_ckpt").rglob("*") if p.is_file()]
    assert ckpts, "no reliable checkpoint files written"


@pytest.mark.slow  # multi-batch/sweep twin — slow tier (r15)
def test_gen_scale_distinct_text_contract(spark, tmp_path):
    """VERDICT r13 #2: --distinct-text replicas must be genuinely
    distinct documents (fuzzy-dedup exponents measure growth, not
    replication invariance) while replica 0 keeps the source rows and
    the fixture's n_chars == length(text) invariant holds. Pinned via
    subprocess so the tool's CLI contract is what's tested."""
    import subprocess
    import sys

    out = str(tmp_path / "d")
    r = subprocess.run(
        [sys.executable, "tools/gen_scale.py", "--src",
         "/root/testdata/sf0.001", "--out", out, "--factor", "2",
         "--distinct-text"],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    docs = spark.read.parquet(f"{out}/documents.parquet")
    n_src = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).count()
    assert docs.count() == 2 * n_src
    a = docs.where(F.col("doc_id") < n_src).selectExpr(
        "doc_id", "text AS t0")
    b = docs.where(F.col("doc_id") >= n_src).selectExpr(
        f"doc_id - {n_src} AS doc_id", "text AS t1")
    j = a.join(b, "doc_id")
    # no replica text equals its source text
    assert j.where("t0 = t1").count() == 0
    # ...but replicas share the vocabulary-statistics shape (within
    # 2x length) — they are variations, not unrelated noise
    assert j.where("length(t1) > 2 * length(t0) + 16").count() == 0
    # fixture invariant holds everywhere
    assert docs.where("n_chars <> length(text)").count() == 0
    # replica 0 is the source corpus verbatim
    src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert a.join(
        src.selectExpr("doc_id", "text AS ts"), "doc_id"
    ).where("t0 <> ts").count() == 0
