"""BPE tokenizer induction at corpus scale (Sennrich et al. 2016).

No reference counterpart (LLM-pipeline surface). The Spark-first
insight: the WORD-FREQUENCY TABLE is the exact sufficient statistic
for corpus-level BPE — every pair count is a sum of per-word pair
counts weighted by word frequency, so fitting on (word, count) is
EQUAL to fitting on the raw corpus, not an approximation. One corpus
scan therefore reduces 100 TB of text to a vocabulary-bounded
aggregate; the inherently sequential merge loop then runs driver-side
over that bounded frame (capped at ``max_words`` rows by descending
count — the same bounded-collect discipline as the sniffer's 50-row
sample and the star loader's 256-bucket histogram; coverage loss from
the cap is the tail words' counts — opt into ``cap_diagnostics=True``
to measure and log the excluded occurrence share).

The merge loop maintains pair statistics INCREMENTALLY (the optimized
form of the published algorithm): a pair→word inverted index plus a
lazy max-heap means each merge touches only the words containing the
merged pair, O(affected words) instead of a full vocabulary rescan —
a 32k-merge production fit over the 1M-word cap is tractable where
the naive per-merge rescan (~10^11 driver ops) is not. Deltas are
computed by fully recounting each AFFECTED word's pairs before/after
the merge, which sidesteps the overlapping-occurrence edge cases of
hand-written neighbour updates while remaining exactly equal to the
rescan (pinned by the fuzz test against an independent
implementation).

Application is the reverse shape: an Arrow-batched UDF with a
per-batch cache keyed by distinct word, so each distinct word is
segmented once per batch regardless of how often it appears —
Zipf-distributed text makes the cache hit rate extreme.

Scale shape: `word_frequencies` is one explode + map-side-combined
count (the same plan as q_vocab_topk); `learn_bpe` touches only the
capped aggregate; `apply_bpe` is one corpus pass with no shuffle at
all (a projection through a pandas UDF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from featurestore_spark.operators.text import clean_tokens

END_OF_WORD = "</w>"


def word_frequencies(
    docs: DataFrame, text_col: str = "text", *, min_count: int = 1
) -> DataFrame:
    """(word, count) over whitespace-split lowercased text — the
    sufficient statistic for :func:`learn_bpe`. One scan, map-side
    combined; ``min_count`` prunes the long tail at the source."""
    from featurestore_spark.operators.materialize import plan_fence

    out = (
        plan_fence(docs.select(clean_tokens(text_col).alias("_toks")))
        .select(F.explode("_toks").alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("count"))
    )
    if min_count > 1:
        out = out.where(F.col("count") >= min_count)
    return out


def _merge_word(
    syms: list[str], best: tuple[str, str], merged: str
) -> list[str]:
    """Left-to-right non-overlapping replacement of ``best`` with its
    concatenation — the merge step shared by fit and (semantically)
    :func:`segment_word`."""
    out, i = [], 0
    n = len(syms)
    while i < n:
        if i + 1 < n and syms[i] == best[0] and syms[i + 1] == best[1]:
            out.append(merged)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _count_pairs(syms: list[str]) -> dict[tuple[str, str], int]:
    """Adjacent-pair occurrence counts within one word (overlapping
    occurrences each count, matching the definitional statistic)."""
    pc: dict[tuple[str, str], int] = {}
    for a, b in zip(syms, syms[1:]):
        p = (a, b)
        pc[p] = pc.get(p, 0) + 1
    return pc


def learn_bpe(
    word_freqs: DataFrame,
    num_merges: int,
    *,
    max_words: int = 1_000_000,
    end_of_word: str = END_OF_WORD,
    cap_diagnostics: bool = False,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merge rules from a (word, count)
    frame. Deterministic: the merge chosen each round is the pair with
    the highest weighted count, ties broken lexicographically.

    The collect is bounded: the top ``max_words`` rows by (count desc,
    word asc). With a Zipf corpus the excluded tail carries a
    vanishing share of total occurrences; raise ``max_words`` (or
    pre-filter with ``min_count``) when the vocabulary is pathological.
    ``cap_diagnostics=True`` runs ONE extra aggregate over
    ``word_freqs`` (a second pass over its lineage — opt-in for that
    reason) and logs the excluded tail's word count and occurrence
    share whenever the cap actually truncated.
    Stops early (returning fewer merges) if no pair remains.

    Complexity: each merge touches only the words that contain the
    merged pair — a pair→word-index inverted index tracks membership
    and a lazily-invalidated max-heap yields the argmax pair without
    scanning all pair counts. Per affected word the delta is computed
    by recounting its pairs before and after the merge (O(word len)),
    so the maintained statistics are exactly the statistics a full
    rescan would produce.
    """
    if num_merges < 1:
        raise ValueError(f"learn_bpe: num_merges must be >= 1, got {num_merges}")
    import heapq

    rows = (
        word_freqs.orderBy(F.col("count").desc(), F.col("word"))
        .limit(max_words)
        .collect()
    )
    if cap_diagnostics and len(rows) >= max_words:
        tot = word_freqs.agg(
            F.count("*").alias("n_words"),
            F.sum("count").alias("n_occ"),
        ).collect()[0]
        kept_occ = sum(int(r["count"]) for r in rows)
        n_words, n_occ = int(tot["n_words"]), int(tot["n_occ"])
        if n_words > max_words:
            import logging

            logging.getLogger(__name__).warning(
                "learn_bpe: max_words=%d cap dropped %d tail words "
                "carrying %.4f%% of occurrences",
                max_words,
                n_words - max_words,
                100.0 * (n_occ - kept_occ) / max(n_occ, 1),
            )

    # Parallel arrays, one entry per collected word (identical symbol
    # sequences are NOT coalesced — pair totals are sums either way,
    # so selection is unchanged vs the coalesced form).
    words: list[list[str]] = [list(r["word"]) + [end_of_word] for r in rows]
    freqs: list[int] = [int(r["count"]) for r in rows]

    stats: dict[tuple[str, str], int] = {}
    index: dict[tuple[str, str], set[int]] = {}
    for j, syms in enumerate(words):
        f = freqs[j]
        for p, c in _count_pairs(syms).items():
            stats[p] = stats.get(p, 0) + c * f
            index.setdefault(p, set()).add(j)

    # Lazy max-heap: (-count, pair) tuples; every count CHANGE pushes
    # the new value, stale entries are discarded on pop by comparing
    # against the live stats. Tuple order gives max count then
    # lexicographically smallest pair — the documented tie-break.
    heap: list[tuple[int, tuple[str, str]]] = [
        (-c, p) for p, c in stats.items()
    ]
    heapq.heapify(heap)

    merges: list[tuple[str, str]] = []
    while len(merges) < num_merges:
        best = None
        while heap:
            negc, p = heapq.heappop(heap)
            if stats.get(p, 0) == -negc:
                best = p
                break
        if best is None:
            break
        merges.append(best)
        merged = best[0] + best[1]
        affected = index.get(best, set())
        for j in sorted(affected):
            old = words[j]
            new = _merge_word(old, best, merged)
            words[j] = new
            f = freqs[j]
            old_pc = _count_pairs(old)
            new_pc = _count_pairs(new)
            for p in old_pc.keys() | new_pc.keys():
                delta = new_pc.get(p, 0) - old_pc.get(p, 0)
                if delta == 0:
                    continue
                c = stats.get(p, 0) + delta * f
                if c > 0:
                    stats[p] = c
                    heapq.heappush(heap, (-c, p))
                    if new_pc.get(p, 0) > 0:
                        index.setdefault(p, set()).add(j)
                    else:
                        s = index.get(p)
                        if s is not None:
                            s.discard(j)
                else:
                    stats.pop(p, None)
                    index.pop(p, None)
        # The merged pair can no longer occur in any word (left-to-
        # right replacement removes every occurrence), so its count
        # always reaches exactly 0 above; make the invariant explicit.
        stats.pop(best, None)
        index.pop(best, None)
    return merges


def segment_word(word: str, ranks: dict[tuple[str, str], int],
                 end_of_word: str = END_OF_WORD) -> list[str]:
    """Apply learned merges to one word: repeatedly merge the
    present pair with the LOWEST merge rank (the order the rules were
    learned), exactly as in the reference BPE implementation."""
    syms = list(word) + [end_of_word]
    while len(syms) > 1:
        ranked = [
            (ranks[p], i)
            for i, p in enumerate(zip(syms, syms[1:]))
            if p in ranks
        ]
        if not ranked:
            break
        best_rank = min(r for r, _ in ranked)
        pair_positions = [i for r, i in ranked if r == best_rank]
        out, i = [], 0
        while i < len(syms):
            if i in pair_positions and i + 1 < len(syms):
                out.append(syms[i] + syms[i + 1])
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def apply_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    *,
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    end_of_word: str = END_OF_WORD,
) -> DataFrame:
    """Segment every document with the learned merges: adds ``out_col``
    (array<string> of BPE symbols; word-final symbols carry the
    ``</w>`` marker) and ``n_bpe_tokens``. NULL text → NULL tokens.

    Shuffle-free: one corpus pass through an Arrow-batched UDF whose
    per-batch cache segments each DISTINCT word once (Zipf text makes
    the hit rate extreme); the merge table rides the closure (a few
    hundred KB for a realistic merge count), not a join.
    """
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    from pyspark.sql.functions import pandas_udf

    # no type annotations: `from __future__ import annotations`
    # stringifies them and breaks pandas_udf inference (see text.py)
    @pandas_udf("array<string>")
    def _seg(s):
        import re

        # ASCII \s to match Spark's Java-regex split in clean_tokens()
        # exactly — Python's default Unicode \s also matches U+00A0
        # etc., which would segment words the model never saw as such
        ws = re.compile(r"\s+", re.ASCII)
        cache: dict[str, list[str]] = {}

        def one(text):
            if text is None:
                return None
            out = []
            # no .strip(): Python's strip is Unicode-aware and would
            # remove edge characters (nbsp) that Spark's trim keeps;
            # the empty-string filter below handles ASCII edges.
            # No .lower() either — lowercasing happens JVM-side below
            # so fit (clean_tokens' `lower`) and apply share the same
            # Unicode case mapping; only the \s split is Python-side.
            for w in ws.split(text):
                if not w:
                    continue
                if w not in cache:
                    cache[w] = segment_word(w, ranks, end_of_word)
                out.extend(cache[w])
            return out

        return s.map(one)

    out = docs.withColumn(out_col, _seg(F.lower(F.col(text_col))))
    return out.withColumn("n_bpe_tokens", F.size(out_col))
