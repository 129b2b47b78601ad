#!/usr/bin/env python3
"""Interleaved A/B for the r14 q_hard_negatives / q_dsir_weights
single-extraction restructures: OLD and NEW compositions built from
the same library in ONE JVM, alternated so host drift hits both arms.
Also dumps before/after formatted plans to plans/r14/.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from featurestore_spark.io import load_table
from featurestore_spark.operators.materialize import materialize
from featurestore_spark.operators.sampling import (
    dsir_log_weights,
    hashed_ngram_features,
    hashed_ngram_model,
)
from featurestore_spark.operators.search import bm25_topk, mine_hard_negatives
from featurestore_spark.queries.catalog import _bm25_queries
from featurestore_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

spark = get_spark(
    "ab-r14-searchdsir",
    master=f"local[{CPUS}]",
    shuffle_partitions=int(CPUS),
    extra_conf={
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"),
        "spark.ui.showConsoleProgress": "false",
    },
)
spark.sparkContext.setLogLevel("ERROR")


def hn_old():
    docs = load_table(spark, SF_DIR, "documents")
    q = _bm25_queries(spark)
    positives = bm25_topk(docs, q, k=1).select("query_id", "doc_id")
    return mine_hard_negatives(docs, q, positives, k=5, depth=10)


def hn_new():
    docs = load_table(spark, SF_DIR, "documents")
    q = _bm25_queries(spark)
    hits = materialize(bm25_topk(docs, q, k=10))
    positives = hits.where(F.col("rank") == 1).select("query_id", "doc_id")
    return mine_hard_negatives(docs, q, positives, k=5, depth=10, hits=hits)


def dsir_old():
    docs = load_table(spark, SF_DIR, "documents")
    target = docs.where(F.col("source") == "src0")
    return dsir_log_weights(
        docs, hashed_ngram_model(target), hashed_ngram_model(docs)
    )


def dsir_new():
    docs = load_table(spark, SF_DIR, "documents")
    feats = materialize(hashed_ngram_features(docs, carry_cols=("source",)))
    return dsir_log_weights(
        docs,
        hashed_ngram_model(docs, features=feats.where(F.col("source") == "src0")),
        hashed_ngram_model(docs, features=feats),
        features=feats.select("doc_id", "bucket"),
    )


def run(fn):
    # time the CONSTRUCTION too: materialize() runs jobs eagerly at
    # construction, exactly as bench.py's timed window sees it
    t0 = time.perf_counter()
    fn().write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def ab(name, old_fn, new_fn, rounds=5):
    # warmups
    run(old_fn)
    run(new_fn)
    olds, news = [], []
    for i in range(rounds):
        spark.sparkContext.setJobDescription(f"{name} old r{i}")
        olds.append(run(old_fn))
        spark.sparkContext.setJobDescription(f"{name} new r{i}")
        news.append(run(new_fn))
        spark.catalog.clearCache()
    print(
        f"{name}: old min={min(olds):.2f} runs={[round(x,2) for x in olds]}"
    )
    print(
        f"{name}: new min={min(news):.2f} runs={[round(x,2) for x in news]}"
    )


def check_equal(name, old_fn, new_fn):
    a = sorted(map(tuple, old_fn().collect()))
    b = sorted(map(tuple, new_fn().collect()))
    print(f"{name}: rows old={len(a)} new={len(b)} equal={a == b}")


os.makedirs("plans/r14", exist_ok=True)


def dump_plan(path, df):
    with open(path, "w") as f:
        f.write(df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"))


dump_plan("plans/r14/q_hard_negatives_before.txt", hn_old())
dump_plan("plans/r14/q_hard_negatives_after.txt", hn_new())
dump_plan("plans/r14/q_dsir_weights_before.txt", dsir_old())
dump_plan("plans/r14/q_dsir_weights_after.txt", dsir_new())
print("plans dumped")

check_equal("q_hard_negatives", hn_old, hn_new)
check_equal("q_dsir_weights", dsir_old, dsir_new)

ab("q_hard_negatives", hn_old, hn_new)
ab("q_dsir_weights", dsir_old, dsir_new)
spark.stop()
