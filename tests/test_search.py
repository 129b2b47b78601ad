"""BM25 lexical retrieval + bigram-LM cross-entropy (operators/search.py)."""

import math

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the dog sat"),
            (3, "cat cat cat"),
            (4, ""),
            (5, None),
            (6, "solo"),
        ],
        "doc_id long, text string",
    )


def _idf(n, df):
    return math.log(1 + (n - df + 0.5) / (df + 0.5))


def _sat(tf, dl, avgdl, k1=1.2, b=0.75):
    return tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))


def test_bm25_hand_computed(spark, corpus):
    from featurestore_spark.operators.search import bm25_topk

    q = spark.createDataFrame(
        [(0, "cat"), (0, "dog"), (1, "mat")], "query_id long, term string"
    )
    out = {
        (r["query_id"], r["rank"]): (r["doc_id"], r["score"])
        for r in bm25_topk(corpus, q, k=3).collect()
    }
    # N = 6 docs (empty/NULL count toward N and avgdl), dls 6,3,3,0,0,1
    n, avgdl = 6.0, 13 / 6
    expected0 = sorted(
        [
            (1, round(_idf(n, 2) * _sat(1, 6, avgdl), 6)),  # cat in doc1
            (3, round(_idf(n, 2) * _sat(3, 3, avgdl), 6)),  # cat x3 in doc3
            (2, round(_idf(n, 1) * _sat(1, 3, avgdl), 6)),  # dog in doc2
        ],
        key=lambda x: (-x[1], x[0]),
    )
    assert [out[(0, i + 1)] for i in range(3)] == expected0
    assert out[(1, 1)] == (1, round(_idf(n, 1) * _sat(1, 6, avgdl), 6))
    # only matching docs appear; query 1 has exactly one
    assert len(out) == 4


def test_bm25_multi_term_sum_and_k_cutoff(spark, corpus):
    from featurestore_spark.operators.search import bm25_topk

    # duplicate query terms collapse; absent terms contribute nothing
    q = spark.createDataFrame(
        [(7, "the"), (7, "the"), (7, "cat"), (7, "zzz-absent")],
        "query_id long, term string",
    )
    rows = bm25_topk(corpus, q, k=2).orderBy("rank").collect()
    assert len(rows) == 2 and [r["rank"] for r in rows] == [1, 2]
    n, avgdl = 6.0, 13 / 6
    # doc1: the x2 (df 2) + cat x1 (df 2)
    exp_doc1 = round(
        _idf(n, 2) * _sat(2, 6, avgdl) + _idf(n, 2) * _sat(1, 6, avgdl), 6
    )
    by_doc = {r["doc_id"]: r["score"] for r in rows}
    assert by_doc[1] == pytest.approx(exp_doc1, abs=2e-6)


def test_bm25_validates_k(spark, corpus):
    from featurestore_spark.operators.search import bm25_topk

    q = spark.createDataFrame([(0, "cat")], "query_id long, term string")
    with pytest.raises(ValueError, match="k must be >= 1"):
        bm25_topk(corpus, q, k=0)


def test_lm_self_fit_hand_computed(spark, corpus):
    from featurestore_spark.operators.search import lm_cross_entropy

    out = {r["doc_id"]: r for r in lm_cross_entropy(corpus).collect()}
    assert set(out) == {1, 2, 3, 4, 5, 6}
    # V = {the, cat, sat, on, mat, dog, solo} = 7
    # doc2 bigrams: (the,dog) c=1 ctx(the)=3 -> p=2/10; (dog,sat) c=1
    # ctx(dog)=1 -> p=2/8
    exp2 = round((-math.log(0.2) - math.log(0.25)) / 2, 6)
    assert out[2]["n_bigrams"] == 2 and out[2]["cross_entropy"] == exp2
    # doc3: (cat,cat) x2, c=2, ctx(cat)=3 -> p=3/10
    assert out[3]["cross_entropy"] == round(-math.log(0.3), 6)
    assert out[3]["perplexity"] == round(math.exp(round(-math.log(0.3), 6)), 6)
    # short/empty/NULL docs: no bigrams, NULL scores
    for did in (4, 5, 6):
        assert out[did]["n_bigrams"] == 0
        assert out[did]["cross_entropy"] is None
        assert out[did]["perplexity"] is None


def test_lm_external_model_unseen_floor(spark, corpus):
    from featurestore_spark.operators.search import (
        fit_bigram_lm,
        lm_cross_entropy,
    )

    lm = fit_bigram_lm(corpus)
    target = spark.createDataFrame(
        [(10, "the cat"), (11, "zebra quagga")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in lm_cross_entropy(target, lm, vocab_size=7).collect()
    }
    # (the,cat): c=1, ctx(the)=3 -> p=2/10
    assert out[10]["cross_entropy"] == round(-math.log(0.2), 6)
    # unseen context degrades to the uniform floor 1/V
    assert out[11]["cross_entropy"] == round(-math.log(1 / 7), 6)


def test_lm_validates_args(spark, corpus):
    from featurestore_spark.operators.search import (
        fit_bigram_lm,
        lm_cross_entropy,
    )

    with pytest.raises(ValueError, match="vocab_size is required"):
        lm_cross_entropy(corpus, fit_bigram_lm(corpus))
    with pytest.raises(ValueError, match="add_k must be > 0"):
        lm_cross_entropy(corpus, add_k=0)


def test_bm25_postings_only_shuffle_is_query_terms(spark, corpus):
    """The corpus-sized side never shuffles: the exploded token stream
    is semi-joined against the broadcast term set before the tf
    aggregate, so the plan's first exchange keys on the (id, dl, term)
    postings frame, not raw tokens."""
    from featurestore_spark.operators.search import bm25_topk

    q = spark.createDataFrame([(0, "cat")], "query_id long, term string")
    plan = bm25_topk(corpus, q, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # term filter + dfreq/stats joins


def test_bm25_index_paths_equal_direct(spark, corpus):
    """direct == against-index == merged-half-indexes, row for row."""
    from featurestore_spark.operators.search import (
        bm25_index,
        bm25_topk,
        bm25_topk_against_index,
        merge_bm25_index,
    )

    q = spark.createDataFrame(
        [(0, "cat"), (0, "dog"), (1, "mat"), (1, "the")],
        "query_id long, term string",
    )
    direct = sorted(map(tuple, bm25_topk(corpus, q, k=5).collect()))
    whole = sorted(
        map(tuple, bm25_topk_against_index(bm25_index(corpus), q, k=5).collect())
    )
    merged_idx = merge_bm25_index(
        bm25_index(corpus.where(F.col("doc_id") <= 3)),
        bm25_index(corpus.where(F.col("doc_id") > 3)),
    )
    merged = sorted(
        map(tuple, bm25_topk_against_index(merged_idx, q, k=5).collect())
    )
    assert direct == whole == merged and len(direct) > 0


def test_bm25_index_stats_are_exact_sums(spark, corpus):
    from featurestore_spark.operators.search import bm25_index, merge_bm25_index

    _, stats = bm25_index(corpus)
    row = stats.collect()[0]
    assert (row["n_docs"], row["sum_dl"]) == (6, 13.0)
    _, merged = merge_bm25_index(
        bm25_index(corpus.where(F.col("doc_id") <= 3)),
        bm25_index(corpus.where(F.col("doc_id") > 3)),
    )
    mrow = merged.collect()[0]
    assert (mrow["n_docs"], mrow["sum_dl"]) == (6, 13.0)


def test_bm25_stream_index_accumulates_and_serves(spark, tmp_path, corpus):
    """Real file-source stream maintaining the index; served results
    equal the direct path over the full corpus."""
    from featurestore_spark.operators.search import (
        bm25_stream_index,
        bm25_topk,
        bm25_topk_against_index,
        read_bm25_index,
    )

    root = str(tmp_path / "bm25_idx")
    src = str(tmp_path / "incoming")
    corpus.write.parquet(src)
    cb = bm25_stream_index(root)
    q = (
        spark.readStream.schema("doc_id bigint, text string")
        .parquet(src)
        .writeStream.foreachBatch(cb)
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    queries = spark.createDataFrame(
        [(0, "cat"), (0, "dog"), (1, "the")], "query_id long, term string"
    )
    served = sorted(
        map(
            tuple,
            bm25_topk_against_index(
                read_bm25_index(spark, root), queries, k=5
            ).collect(),
        )
    )
    direct = sorted(map(tuple, bm25_topk(corpus, queries, k=5).collect()))
    assert served == direct and len(served) > 0


def test_bm25_stream_index_restart_guard(spark, tmp_path, corpus):
    from featurestore_spark.operators.search import bm25_stream_index

    root = str(tmp_path / "idx")
    cb = bm25_stream_index(root)
    cb(corpus, 3)
    cb(corpus.limit(1), 3)  # retry of the SAME id: allowed (overwrite)
    with pytest.raises(RuntimeError, match="fresh checkpoint"):
        cb(corpus, 1)  # lower id = new checkpoint lineage


def test_merge_bigram_lm_equals_whole_fit(spark, corpus):
    from featurestore_spark.operators.search import (
        fit_bigram_lm,
        lm_cross_entropy,
        merge_bigram_lm,
    )

    whole = {
        (r["w1"], r["w2"]): r["c"] for r in fit_bigram_lm(corpus).collect()
    }
    merged_lm = merge_bigram_lm(
        fit_bigram_lm(corpus.where(F.col("doc_id") <= 2)),
        fit_bigram_lm(corpus.where(F.col("doc_id") > 2)),
    )
    merged = {(r["w1"], r["w2"]): r["c"] for r in merged_lm.collect()}
    assert merged == whole and len(whole) > 0
    # scoring with the merged model + the corpus V reproduces self-fit
    self_fit = sorted(map(tuple, lm_cross_entropy(corpus).collect()))
    ext = sorted(
        map(tuple, lm_cross_entropy(corpus, merged_lm, vocab_size=7).collect())
    )
    assert ext == self_fit
    with pytest.raises(ValueError, match="at least one lm"):
        merge_bigram_lm()


def test_bm25_query_terms_are_normalized(spark, corpus):
    """Uppercase / padded query terms match the lowercased corpus
    tokens instead of silently returning nothing."""
    from featurestore_spark.operators.search import bm25_topk

    q = spark.createDataFrame(
        [(0, "CAT"), (0, " dog ")], "query_id long, term string"
    )
    got = sorted(map(tuple, bm25_topk(corpus, q, k=5).collect()))
    plain = spark.createDataFrame(
        [(0, "cat"), (0, "dog")], "query_id long, term string"
    )
    assert got == sorted(map(tuple, bm25_topk(corpus, plain, k=5).collect()))
    assert len(got) == 3


def test_lm_preserves_null_id_aggregate(spark):
    from featurestore_spark.operators.search import lm_cross_entropy

    df = spark.createDataFrame(
        [(None, "a b c"), (2, "a b")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in lm_cross_entropy(df).collect()}
    # the NULL-id row keeps its computed aggregate (eqNullSafe join)
    assert out[None]["n_bigrams"] == 2
    assert out[None]["cross_entropy"] is not None
    assert out[2]["n_bigrams"] == 1


def test_merge_bm25_index_verify_probe(spark, corpus):
    """Disjoint halves pass the sketch probe; a double-ingested part
    raises (VERDICT r6 #5). Oracles/queries never pass verify=True, so
    the default path is unchanged."""
    from featurestore_spark.operators.search import bm25_index, merge_bm25_index

    lo = bm25_index(corpus.where(F.col("doc_id") <= 3))
    hi = bm25_index(corpus.where(F.col("doc_id") > 3))
    postings, stats = merge_bm25_index(lo, hi, verify=True)
    assert stats.collect()[0]["n_docs"] == 6
    whole = bm25_index(corpus)
    with pytest.raises(ValueError, match="overlap"):
        merge_bm25_index(whole, bm25_index(corpus), verify=True)


def test_nb_classifier_learns_separable_classes(spark):
    """Fit on a tiny labeled corpus, classify held-out docs from the
    same vocabularies; also pin the zero-token and NULL-label rules."""
    from featurestore_spark.operators.search import fit_nb_classifier, nb_classify

    train = spark.createDataFrame(
        [
            (1, "goal striker midfield penalty football", "sport"),
            (2, "striker penalty referee football stadium", "sport"),
            (3, "election parliament minister policy vote", "politics"),
            (4, "vote policy coalition parliament debate", "politics"),
            (5, "ignored unlabeled row with words", None),
        ],
        "doc_id long, text string, topic string",
    )
    model = fit_nb_classifier(train, "topic")
    wc, cs = model
    assert {r["label"] for r in cs.collect()} == {"sport", "politics"}
    test = spark.createDataFrame(
        [
            (10, "penalty for the striker"),
            (11, "parliament passed the policy"),
            (12, ""),  # zero tokens -> max-prior class (tie -> label order)
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["label_pred"] for r in nb_classify(test, model).collect()}
    assert out[10] == "sport"
    assert out[11] == "politics"
    # equal priors (2 docs each): tie breaks to the lexicographically
    # first label
    assert out[12] == "politics"


def test_mine_hard_negatives_excludes_positives(spark, corpus):
    from featurestore_spark.operators.search import bm25_topk, mine_hard_negatives

    q = spark.createDataFrame(
        [(0, "cat"), (0, "mat"), (1, "the")], "query_id long, term string"
    )
    all_hits = bm25_topk(corpus, q, k=10)
    positives = all_hits.where("rank = 1").select("query_id", "doc_id")
    negs = mine_hard_negatives(corpus, q, positives, k=3, depth=10)
    got = {(r["query_id"], r["doc_id"]) for r in negs.collect()}
    pos = {(r["query_id"], r["doc_id"]) for r in positives.collect()}
    assert got and not (got & pos)  # positives never reappear
    # negatives are exactly the next hits in rank order
    expected = {
        (r["query_id"], r["doc_id"])
        for r in all_hits.where("rank > 1 AND rank <= 4").collect()
    }
    assert got == expected
    # neg_rank is dense 1..k per query
    for qid in {g[0] for g in got}:
        ranks = [r["neg_rank"] for r in negs.where(F.col("query_id") == qid).collect()]
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
    with pytest.raises(ValueError, match="depth"):
        mine_hard_negatives(corpus, q, positives, k=5, depth=3)


def test_mine_hard_negatives_shared_hits_matches_internal_retrieval(spark, corpus):
    """hits= (a precomputed bm25_topk frame) must mine the identical
    negatives as the internal retrieval — including when the shared
    frame is ranked DEEPER than depth (the function cuts it to the
    contract)."""
    from featurestore_spark.operators.search import bm25_topk, mine_hard_negatives

    q = spark.createDataFrame(
        [(0, "cat"), (0, "mat"), (1, "the")], "query_id long, term string"
    )
    all_hits = bm25_topk(corpus, q, k=10)
    positives = all_hits.where("rank = 1").select("query_id", "doc_id")
    internal = mine_hard_negatives(corpus, q, positives, k=3, depth=5)
    shared = mine_hard_negatives(
        corpus, q, positives, k=3, depth=5, hits=all_hits
    )
    assert sorted(map(tuple, shared.collect())) == sorted(
        map(tuple, internal.collect())
    )


def test_ccnet_perplexity_buckets(spark):
    """CCNet thirds-by-token-mass: hand-computable histogram walk,
    value-level assignment (equal scores share a bucket), unscoreable
    docs land in tail, every input doc returned exactly once."""
    from featurestore_spark.operators.search import ccnet_perplexity_buckets

    # one group; self-fit LM makes the repeated phrase fluent (low
    # xent) and the shuffled one rare (high xent)
    # three structurally DIFFERENT 60-token docs -> three distinct
    # self-fit scores (a doc with the same bigram structure would
    # share the score and, by design, the bucket — asserted below)
    fluent = "the cat sat on the mat " * 10        # repeated context word
    medium = "big dogs run fast every day " * 10   # unique contexts
    weird = "zx qv plo wk rr tt yy uu ii oo " * 6  # 10-word pattern
    docs = spark.createDataFrame(
        [
            (1, "s", fluent),
            (2, "s", medium),
            (3, "s", weird),
            (4, "s", "solo"),   # 1 token -> NULL score -> tail
            (5, "s", None),     # 0 tokens -> tail
        ],
        "doc_id long, source string, text string",
    )
    out = {r["doc_id"]: r for r in ccnet_perplexity_buckets(docs).collect()}
    assert len(out) == 5
    # three scored 60-token docs, cum walk: 60<=60 head, 120<=120
    # middle, 180 tail — one per third, in score order
    scored = sorted(
        (out[i]["cross_entropy"], out[i]["bucket"]) for i in (1, 2, 3)
    )
    assert [b for _, b in scored] == ["head", "middle", "tail"]
    assert out[4]["bucket"] == "tail" and out[4]["cross_entropy"] is None
    assert out[5]["bucket"] == "tail" and out[5]["n_tokens"] == 0

    # value-level assignment: an exact duplicate of the fluent doc
    # shares its score, so BOTH land in the same bucket even though
    # their combined mass overflows the first third
    docs2 = docs.union(
        spark.createDataFrame([(6, "s", fluent)], docs.schema)
    )
    out2 = {r["doc_id"]: r for r in ccnet_perplexity_buckets(docs2).collect()}
    assert out2[1]["bucket"] == out2[6]["bucket"]


def test_ccnet_buckets_null_keys(spark):
    """NULL doc ids come back out (scored via the null-safe join, like
    lm_cross_entropy's own contract) and a NULL group is a REAL
    partition — its fluent docs bucket normally instead of being
    silently forced to tail."""
    from featurestore_spark.operators.search import ccnet_perplexity_buckets

    docs = spark.createDataFrame(
        [
            (None, "g", "the cat sat on the mat " * 10),
            # NULL group: three structurally different 60-token docs
            (2, None, "the cat sat on the mat " * 10),
            (3, None, "big dogs run fast every day " * 10),
            (4, None, "zx qv plo wk rr tt yy uu ii oo " * 6),
        ],
        "doc_id long, source string, text string",
    )
    rows = ccnet_perplexity_buckets(docs).collect()
    assert len(rows) == 4  # the NULL-id doc did not vanish
    null_id = [r for r in rows if r["doc_id"] is None][0]
    assert null_id["cross_entropy"] is not None
    null_group = sorted(
        (r["cross_entropy"], r["bucket"]) for r in rows if r["source"] is None
    )
    assert [b for _, b in null_group] == ["head", "middle", "tail"]


def test_nb_scores_memoizes_model_materialization(spark):
    """ADVICE r12: nb_scores' eager model materialization is memoized
    per model-frame object — the second scoring call against the same
    fitted model reuses the first call's checkpoint (same underlying
    plan object), and eager=False skips the copy entirely for
    table-backed models."""
    from featurestore_spark.operators.search import (
        fit_nb_classifier,
        nb_scores,
    )

    docs = spark.createDataFrame(
        [(1, "good fine great", "hq"), (2, "bad awful spam", "lq"),
         (3, "fine spam good", "hq"), (4, "awful bad bad", "lq")],
        "doc_id long, text string, label string",
    )
    model = fit_nb_classifier(docs, label_col="label")
    a = nb_scores(docs, model)
    # the stamp exists after the first call and is reused by the next
    wc_copy = getattr(model[0], "_fs_eager_copy", None)
    assert wc_copy is not None
    b = nb_scores(docs, model)
    assert getattr(model[0], "_fs_eager_copy") is wc_copy
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # eager=False produces identical scores without materializing
    model2 = fit_nb_classifier(docs, label_col="label")
    c = nb_scores(docs, model2, eager=False)
    assert getattr(model2[0], "_fs_eager_copy", None) is None
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, c.collect()))


def test_nb_scores_multiplicity_matches_closed_form(spark):
    """r15: the correction sum is aggregated once per (doc, class)
    over gram OCCURRENCES (the former per-(doc, gram) multiplicity
    pass collapsed into it — one exchange fewer). A doc with a
    repeated token must still contribute m * ln((c+k)/k) per distinct
    gram: pinned against the closed form computed in Python."""
    import math

    from featurestore_spark.operators.search import (
        fit_nb_classifier,
        nb_scores,
    )

    train = spark.createDataFrame(
        [(1, "a a b", "x"), (2, "b c", "y")],
        "doc_id long, text string, lab string",
    )
    model = fit_nb_classifier(train, "lab")
    test = spark.createDataFrame(
        [(10, "a a a b b zzz")], "doc_id long, text string"
    )
    got = {
        r["label"]: r["score"]
        for r in nb_scores(test, model).collect()
    }
    # model: V=3 (a,b,c); class x: n_tokens=3, counts a:2 b:1;
    # class y: n_tokens=2, counts b:1 c:1; priors 1/2 each; k=1.
    # doc: t_d=6, m_a=3, m_b=2 (zzz unseen: only the base term).
    def score(n_c, counts):
        base = math.log(1.0 / (n_c + 3.0))
        corr = sum(m * math.log(c + 1.0) for c, m in counts)
        return round(math.log(0.5) + 6 * base + corr, 4)

    assert got["x"] == score(3, [(2, 3), (1, 2)])
    assert got["y"] == score(2, [(0, 3), (1, 2)])
