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
the cap is the tail words' counts, reported by the cap diagnostics).

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
    out = (
        docs.select(F.explode(clean_tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("count"))
    )
    if min_count > 1:
        out = out.where(F.col("count") >= min_count)
    return out


def learn_bpe(
    word_freqs: DataFrame,
    num_merges: int,
    *,
    max_words: int = 1_000_000,
    end_of_word: str = END_OF_WORD,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merge rules from a (word, count)
    frame. Deterministic: the merge chosen each round is the pair with
    the highest weighted count, ties broken lexicographically.

    The collect is bounded: the top ``max_words`` rows by (count desc,
    word asc). With a Zipf corpus the excluded tail carries a
    vanishing share of total occurrences; raise ``max_words`` (or
    pre-filter with ``min_count``) when the vocabulary is pathological.
    Stops early (returning fewer merges) if no pair remains.
    """
    if num_merges < 1:
        raise ValueError(f"learn_bpe: num_merges must be >= 1, got {num_merges}")
    rows = (
        word_freqs.orderBy(F.col("count").desc(), F.col("word"))
        .limit(max_words)
        .collect()
    )
    vocab: dict[tuple[str, ...], int] = {
        tuple(r["word"]) + (end_of_word,): int(r["count"]) for r in rows
    }
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, cnt in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + cnt
        if not pairs:
            break
        # max by count, ties broken by the lexicographically smallest
        # pair (max on count then min on pair — two explicit steps)
        top = max(pairs.values())
        best = min(p for p, c in pairs.items() if c == top)
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, cnt in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + cnt
        vocab = new_vocab
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
            # the empty-string filter below handles ASCII edges
            for w in ws.split(text.lower()):
                if not w:
                    continue
                if w not in cache:
                    cache[w] = segment_word(w, ranks, end_of_word)
                out.extend(cache[w])
            return out

        return s.map(one)

    out = docs.withColumn(out_col, _seg(F.col(text_col)))
    return out.withColumn("n_bpe_tokens", F.size(out_col))
