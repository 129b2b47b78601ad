#!/usr/bin/env python3
"""Benchmark headline queries; prints ONE JSON line for the driver.

Runs each headline query from the catalog at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], forcing
full execution through the `noop` sink (no driver-collect overhead),
and reports per-query wall seconds.
"""

from __future__ import annotations

import gc
import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q_tpch_q1",
    "q_tpch_q3",
    "q_tpch_q5",
    "q_sessionize",
    "q_session_stats",
    "q_pivot_snapshot",
    "q_pivot_chord",
    "q_chord_path",
    "q_unique_path",
    "q_current_events",
    "q_previous_interactions",
    "q_hub_customer",
    "q_link_customer_order",
    "q_star_fact_order_counts",
    "q_dedup_exact",
    "q_text_quality",
    "q_token_count",
    "q_lang_id",
    "q_minhash_bands",
    "q_minhash_pairs",
    "q_embedding_topk",
    "q_embedding_ann_lsh",
    "q_tpch_q6",
    "q_tpch_q10",
    "q_tpch_q12",
    "q_tpch_q14",
    "q_tpch_q4",
    "q_tpch_q13",
    "q_tpch_q15",
    "q_tpch_q18",
    "q_tpch_q19",
    "q_tpch_q22",
    "q_tpch_q2",
    "q_tpch_q7",
    "q_tpch_q8",
    "q_tpch_q9",
    "q_tpch_q11",
    "q_tpch_q16",
    "q_tpch_q17",
    "q_tpch_q20",
    "q_tpch_q21",
    "q_embedding_near_dups",
    "q_dedup_clusters",
    "q_repetition",
    "q_decontaminate",
    "q_redact_pii",
    "q_quality_filter",
    "q_asof_purchase",
    "q_interval_join",
    "q_time_rollup",
    "q_attribution",
    "q_boilerplate",
    "q_corpus_stats",
    "q_vocab_topk",
    "q_ivf_assign",
    "q_mixture_sample",
    "q_quality_buckets",
    "q_chunk_documents",
    "q_token_budget_sample",
    "q_embedding_clusters",
    "q_pack_chunks",
    "q_image_meta",
    "q_simhash_near_dups",
    "q_dedup_pipeline",
    "q_incremental_dedup",
    "q_incremental_embedding_dedup",
    "q_pq_encode",
    "q_pq_topk",
    "q_ivf_pq_topk",
    "q_semantic_dedup",
    "q_dedup_lines",
    "q_shared_spans",
    "q_shard_corpus",
    "q_incremental_line_dedup",
    "q_decontaminate_spans",
    "q_incremental_spans",
    "q_cluster_balance",
    "q_normalize_text",
    "q_dedup_ladder",
    "q_top_customers",
    "q_vault_full_cycle",  # write-path throughput (real loader)
    # Round 6: complete the catalog — every registered query is now
    # benched (the stdout line stays short regardless; the full map
    # goes to the bench_full.json sidecar).
    "q_chords",
    "q_chord_path_all",
    "q_collapse_runs",
    "q_days_since_earliest",
    "q_days_since_latest",
    "q_event_count_window",
    "q_event_distinct_window",
    "q_event_sum_window",
    "q_full_paths",
    "q_binary_meta",
    "q_doc_fingerprint",
    "q_ngram_jaccard",
    "q_entity_resolution",
    "q_dq_assertion",
    "q_hash_split",
    "q_pivot_registry",
    "q_satellite_classify",
    "q_sniff_csv",
    "q_star_dim_order_priority",
    # Round 6: lexical retrieval + LM quality scoring
    "q_bm25_topk",
    "q_bm25_index_topk",
    "q_lm_perplexity",
    "q_source_divergence",
    # Round 7: rows-only (non-SQL-expressible) end-to-end paths
    "q_bpe_segment",
    "q_ivf_topk",
    # Round 7: published curation rule sets + corpus novelty + DSIR
    "q_gopher_rules",
    "q_c4_filter",
    "q_ngram_novelty",
    "q_dsir_weights",
    "q_strip_html",
    "q_ngram_containment",
    "q_temperature_mixture",
    "q_repeat_epochs",
    "q_nb_classify",
    "q_curation_funnel",
    "q_hard_negatives",
    # Round 8: web-ingest URL front + the value-checked IVF serving
    # stage split out of q_ivf_topk
    "q_canonical_url",
    "q_url_dedup",
    "q_web_funnel",
    "q_ivf_serve",
    "q_fineweb_rules",
    "q_ccnet_buckets",
    "q_ccnet_external",
    "q_dedup_best",
    # Round 9: URL/domain filtering, the Gopher repetition half, the
    # fineweb dedup preset, the BPE-apply value oracle
    "q_url_filter",
    "q_domain_rollup",
    "q_domain_cap",
    "q_gopher_repetition",
    "q_curate_gopher",
    "q_dedup_preset",
    "q_bpe_apply",
    # Round 10: the end-to-end published-pipeline capstone, the
    # paper-exact positional repetition variant, the trained
    # char-ngram language-ID, the bytes-level image dedup
    "q_refinedweb_e2e",
    "q_gopher_positional",
    "q_lid_classify",
    "q_image_dedup",
    "q_gif_frames",
    "q_incremental_url_dedup",
    # Round 11: the trained quality-classifier gate, the incremental
    # media-dedup rung, the MP4 sample-table walker
    "q_quality_classify",
    "q_incremental_media_dedup",
    "q_mp4_frames",
    # ...and the outlink-graph + domain-PageRank capstone
    "q_domain_pagerank",
    # Round 12: the jusText-lite main-content extractor and the
    # crawl-stack front door (robots politeness gate, sitemap
    # discovery, WARC record walk + HTTP split, WAV chunk walk)
    "q_main_content",
    "q_robots_filter",
    "q_sitemap",
    "q_warc_extract",
    "q_wav",
    # ...and the crawl-planning pair composing them: the frontier
    # capstone and the politeness fetch scheduler
    "q_crawl_frontier",
    "q_fetch_schedule",
    # Round 14: the normalized robots gate + sitemap-lastmod recrawl
    # decision (the two r13 operators' driver-oracle home)
    "q_recrawl_policy",
]

# Zero-code-change drift control (VERDICT r6 #8): the TPC-H block has
# been byte-identical since r4, so its subtotal separates host drift
# from code-attributable movement — `tpch_control_wall` in the output
# makes the r(N) vs r(N-1) regression call one subtraction.
TPCH_CONTROL = [q for q in HEADLINE if q.startswith("q_tpch_")]


def flag_for_solo(
    timings: dict[str, float],
    suite_noise: dict[str, float],
    prev_map: dict[str, float],
    threshold: float = 1.2,
) -> list[str]:
    """VERDICT r13 #3 selection rule: queries needing an automatic
    solo steady-state re-measurement — moved >`threshold`x against
    the previous committed sidecar AND position-noise-suspect this
    run (their two passes disagreed >25%). A genuine code regression
    shows in both passes and carries no suite_noise entry, so it is
    deliberately NOT re-measured away."""
    return [
        q for q, t in timings.items()
        if q in suite_noise and prev_map.get(q, 0) > 0
        and t > threshold * prev_map[q]
    ]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from featurestore_spark.queries import QUERIES
    from featurestore_spark.session import get_spark

    # In local mode the driver JVM hosts every executor thread; the 1g
    # default heap forced MemoryManager >95% warnings and parquet
    # row-group scaling during the r2 62-query run, inflating timings.
    # Size the heap to the machine (env-overridable for smaller hosts).
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g")
    spark = get_spark(
        "featurestore-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={
            "spark.driver.memory": driver_mem,
            # The driver captures a bounded stdout tail; the r5 bench
            # artifact failed to parse because console-progress bytes +
            # a 3.4 KB per-query JSON line overflowed that window. Keep
            # stdout to exactly one short, final JSON line.
            "spark.ui.showConsoleProgress": "false",
        },
    )
    # The r6 bench tail was ~90% repeated `WARN WindowExec` lines from
    # the annotated tiny global windows — the same flood-the-finite-
    # tail failure mode that nulled the r5 artifact parse. The bench
    # session needs no WARNs; keep stderr near-silent so the driver's
    # tail capture always contains the final JSON line.
    spark.sparkContext.setLogLevel("ERROR")
    # Warm the JVM + parquet footers once (excluded from timings).
    QUERIES["q_tpch_q1"].spark(spark, sf_dir).write.format("noop").mode("overwrite").save()

    # Median of N runs per query (N >= 3 by default): the r2->r3 bench
    # comparison flagged two "regressions" that were pure single-run
    # noise (q_chunk_documents 4.5x) — a no-repeat harness cannot tell
    # noise from regression. Median (not min) still reflects steady
    # per-run costs like localCheckpoint materialization.
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")))

    def run_pass(
        order: list[str], deadline: float | None = None
    ) -> tuple[dict[str, float], dict[str, float]]:
        medians: dict[str, float] = {}
        mins: dict[str, float] = {}
        for name in order:
            # Pass-2 self-time-box: the second pass exists to remove
            # suite-position noise, not to risk the artifact — if the
            # whole bench would outgrow its budget, stop re-measuring
            # and keep pass-1 readings for the rest (recorded in the
            # sidecar). The final JSON line must always print.
            if deadline is not None and time.perf_counter() > deadline:
                break
            spec = QUERIES.get(name)
            if spec is None:
                continue
            # Discarded per-query warm-up run (VERDICT r8 #5): with
            # repeats=3 the cold first run sits one slot from the
            # median, which is how q_minhash_pairs printed a 2x
            # "regression" in r8 while its steady state was FASTER
            # (judge's A/B). The warm-up takes codegen/broadcast/
            # page-cache cold costs outside the timed window, so the
            # median is a steady-state statistic and the min stays
            # the regression-call default.
            spec.spark(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs = []
            # Adaptive repeats for the sub-second tier (VERDICT r14
            # #10): on a noisy host the <1s queries dominate the
            # suite_noise count (their readings are mostly scheduling
            # jitter), so they get two extra repeats to tighten the
            # median — the whole tier sums to ~20s, so the extra cost
            # is bounded while the >=1s queries keep the exact r4-r14
            # repeat protocol.
            n_runs = repeats
            while len(runs) < n_runs:
                t0 = time.perf_counter()
                spec.spark(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                runs.append(time.perf_counter() - t0)
                if len(runs) == 1 and runs[0] < 1.0:
                    n_runs = repeats + 2
            medians[name] = round(statistics.median(runs), 3)
            # Min-of-repeats alongside the median (VERDICT r7 #4):
            # the median still carries steady per-run costs, but the
            # min is the drift-stable statistic (PLANS.md's solo-warm
            # convention, now mechanical) — round-over-round
            # regression calls compare the mins, normalized by the
            # control subtotal below.
            mins[name] = round(min(runs), 3)
            # Drop references so ContextCleaner can free
            # localCheckpoint blocks (token-budget / component-loop
            # queries materialize them each run); across 60+ queries
            # x repeats the retained blocks otherwise build heap
            # pressure that bleeds GC pauses into later queries'
            # timings.
            gc.collect()
            spark.catalog.clearCache()
            # ...and collect the JVM heap between queries when it is
            # getting full — never mid-query: Python's gc only drops
            # the py4j handles; the 32g old-gen then fills with dead
            # checkpoint/shuffle blocks until a full GC lands inside
            # whichever query is running. Measured: q_boilerplate
            # (the big string-shingle SMJ, most GC-sensitive plan)
            # intermittently spiked 8-18s mid-bench; with
            # between-query collection it holds ~3s. Collecting after
            # EVERY query over-corrects (~+150ms warm-up on each
            # following query, +20% whole-bench) — so gate on actual
            # heap pressure. The call sits OUTSIDE the timed window
            # either way.
            rt = spark._jvm.Runtime.getRuntime()
            if (rt.totalMemory() - rt.freeMemory()) > 12 * (1 << 30):
                spark._jvm.System.gc()
        return medians, mins

    # Two passes, second in REVERSE suite order (VERDICT r12 #1): a
    # query's reading can be inflated by whatever ran before it (heap/
    # code-cache/page-cache state the per-query hygiene above cannot
    # fully reset) — q_bm25_topk printed 2.08s in-suite vs 1.47s solo
    # in r12, a phantom 1.8x "regression" that burned an adjudication
    # round (q_entity_resolution did the same in r11). Running the
    # suite twice with opposite neighbor sets and reporting the
    # SMALLER of the two pass medians per query removes the
    # position-dependent component: a genuine code regression shows in
    # both passes, suite-position pollution in only one. The full
    # per-pass maps land in the sidecar (`queries_by_pass`), and
    # `suite_noise` lists the queries whose two readings disagree by
    # >25% — making future "in-suite vs solo" adjudications a lookup
    # instead of a re-run. SPARK_GRAFT_BENCH_PASSES=1 restores the
    # single-pass protocol (halves wall time when iterating locally).
    passes = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2")))
    budget_s = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET_S", "2700"))
    t_start = time.perf_counter()
    med1, min1 = run_pass(HEADLINE)
    by_pass = {"pass1": med1}
    timings, timings_min = dict(med1), dict(min1)
    pass2_truncated = 0
    if passes > 1:
        med2, min2 = run_pass(
            list(reversed(HEADLINE)), deadline=t_start + budget_s
        )
        by_pass["pass2"] = med2
        pass2_truncated = len(med1) - len(med2)
        for q in timings:
            if q in med2:
                timings[q] = min(timings[q], med2[q])
                timings_min[q] = min(timings_min[q], min2[q])
    suite_noise = {
        q: round(max(m.get(q, timings[q]) for m in by_pass.values())
                 / max(timings[q], 1e-9), 3)
        for q in timings
        if len(by_pass) > 1
        and max(m.get(q, timings[q]) for m in by_pass.values())
        > 1.25 * timings[q]
    }

    # Mechanized suite-noise adjudication (VERDICT r13 #3): a query
    # whose reading moved >1.2x against the PREVIOUS committed
    # sidecar AND which carries a suite_noise entry this run (its two
    # passes disagree — the position-pollution signature) gets an
    # automatic solo steady-state re-measurement at the end of the
    # bench: full GC, discarded warm-up, then the usual repeats. The
    # next round's regression call reads `solo_rerun[q].solo_min`
    # from the sidecar instead of re-running by hand (the
    # q_bm25_topk r12 / q_entity_resolution r11 adjudications, now a
    # lookup). Reading the sidecar BEFORE it is overwritten below is
    # what makes this round-over-round.
    sidecar = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_full.json"
    )
    prev_map: dict[str, float] = {}
    prev_control = 0.0
    try:
        with open(sidecar) as f:
            _prev_sidecar = json.load(f)
        prev_map = _prev_sidecar.get("queries", {}) or {}
        prev_control = float(_prev_sidecar.get("tpch_control_wall") or 0.0)
    except (OSError, ValueError):
        prev_map = {}
    flagged = flag_for_solo(timings, suite_noise, prev_map)
    solo_rerun: dict[str, dict] = {}
    # bounded: the solo block may use up to 15% beyond the pass-2
    # budget — the artifact's final JSON line still always prints
    solo_deadline = t_start + budget_s * 1.15
    for q in flagged:
        if time.perf_counter() > solo_deadline:
            break
        spark._jvm.System.gc()
        spec = QUERIES[q]
        spec.spark(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        runs = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            spec.spark(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(time.perf_counter() - t0)
        solo_rerun[q] = {
            "solo_median": round(statistics.median(runs), 3),
            "solo_min": round(min(runs), 3),
            "suite": timings[q],
            "prev": prev_map[q],
        }
        gc.collect()
        spark.catalog.clearCache()

    # Self-verification fields (VERDICT r14 #2): the actual
    # parallelism the session ran with — the driver's scaling probe
    # can now confirm $SPARK_GRAFT_CPUS took effect instead of
    # inferring it from core-insensitive ratios (the r14
    # suspect_cpus_ignored false positive).
    default_parallelism = spark.sparkContext.defaultParallelism

    total = round(sum(timings.values()), 3)
    tpch_control = round(
        sum(t for q, t in timings.items() if q in set(TPCH_CONTROL)), 3
    )
    tpch_control_min = round(
        sum(t for q, t in timings_min.items() if q in set(TPCH_CONTROL)), 3
    )
    total_min = round(sum(timings_min.values()), 3)
    # Headline expressed in units of the zero-code-change control
    # block: same-host drift moves numerator and denominator together
    # (five same-code control readings spanned 12.3-17.2s in r7), so
    # r(N) vs r(N-1) regression-vs-drift is one comparison of this
    # field instead of a hand normalization. The _min variant pairs
    # the min-of-repeats statistics end to end — that is the
    # drift-stable comparison; the median one carries steady per-run
    # costs.
    control_normalized = round(total / tpch_control, 3) if tpch_control else None
    control_normalized_min = (
        round(total_min / tpch_control_min, 3) if tpch_control_min else None
    )
    # Worst-movers digest (VERDICT r14 #2): the one-line JSON's top-5
    # made the driver's round-over-round per_query comparison top-5
    # churn (n_common=1 in PERF_r14). Emit the 10 worst HOST-ADJUSTED
    # movers vs the previous committed sidecar — ratio = (now ÷
    # control-drift) ÷ prev, so a host 2x slower overall reads ~1.0,
    # not 2.0. Additions only: the headline `value` semantics are
    # untouched, and the digest is empty on a first run (no sidecar).
    worst_movers: dict[str, float] = {}
    if prev_map and prev_control > 0 and tpch_control > 0:
        drift = tpch_control / prev_control
        movers = {
            q: round(t / drift / prev_map[q], 2)
            for q, t in timings.items()
            if prev_map.get(q, 0) > 0
        }
        worst_movers = dict(
            sorted(movers.items(), key=lambda kv: -kv[1])[:10]
        )

    # Full per-query map goes to a sidecar file: at 80+ queries the
    # inline map outgrew the driver's stdout tail-capture window and
    # BENCH_r05.json recorded parsed:null. The stdout line stays short
    # (total + the 5 slowest) and is printed LAST. (`sidecar` path
    # defined above — the previous round's map is read from it before
    # this overwrite.)
    with open(sidecar, "w") as f:
        json.dump(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_min": timings_min,
                "value_min": total_min,
                "tpch_control_wall": tpch_control,
                "tpch_control_wall_min": tpch_control_min,
                "control_normalized_total": control_normalized,
                "control_normalized_total_min": control_normalized_min,
                "sf": sf,
                "repeats": repeats,
                "passes": passes,
                "default_parallelism": default_parallelism,
                "pass2_skipped_queries": pass2_truncated,
                "worst_movers_vs_prev": worst_movers,
                "prev_tpch_control_wall": prev_control,
                "queries_by_pass": by_pass,
                "suite_noise": suite_noise,
                "solo_rerun": solo_rerun,
            },
            f,
            indent=1,
        )
    top5 = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:5])
    spark.stop()
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": top5,
                "n_queries": len(timings),
                "suite_noise_count": len(suite_noise),
                "solo_rerun_count": len(solo_rerun),
                "tpch_control_wall": tpch_control,
                "control_normalized_total": control_normalized,
                "control_normalized_total_min": control_normalized_min,
                "sf": sf,
                "repeats": repeats,
                "default_parallelism": default_parallelism,
                "pass2_skipped_queries": pass2_truncated,
                "worst_movers_vs_prev": worst_movers,
                "prev_tpch_control_wall": prev_control,
                "full_map": "bench_full.json",
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
