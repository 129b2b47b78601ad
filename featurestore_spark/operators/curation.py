"""Corpus-curation operators for training-data pipelines: repetition
metrics (Gopher-style quality filters), benchmark decontamination, and
PII/URL redaction.

Beyond-the-reference functionality (SURVEY §2 has no analog; the
reference is a feature-store ETL engine) — these are the document-level
operations a 100 TB pretraining corpus pipeline runs between ingest and
dedup. Scale design:

- **Repetition metrics are computed WITHOUT a shuffle**: the classic
  formulation explodes every n-gram occurrence and double-aggregates
  (two shuffles, |docs|x|tokens| intermediate rows). Here the n-gram
  array is sorted per row and run-lengths are folded in ONE
  `F.aggregate` pass — per-document metrics come out of a single
  projection, all JVM-side (same philosophy as the shuffle-free MinHash
  signatures in operators/dedup.py).
- **Decontamination** joins document shingles against a broadcast
  probe-shingle set — benchmark suites are tiny relative to the corpus,
  so the corpus side never shuffles; each task streams its partition
  against the in-memory probe hash map.
- **Redaction** is pure `regexp_replace`/`regexp_extract_all` Column
  expressions (whole-stage codegen; patterns chosen to be portable
  between Java regex and RE2 so oracles reproduce them).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from featurestore_spark.operators.dedup import (
    _SLICE_REST,
    hash128,
    shingles,
    zipped_ngrams,
)
from featurestore_spark.operators.materialize import (
    fan_out,
    materialize,
    plan_fence,
)
from featurestore_spark.operators.text import clean_tokens, tokens

# -- exact-collapse auto probe -------------------------------------------------


def _should_collapse(
    docs: DataFrame, text_col: str, collapse_exact: bool | str
) -> bool:
    """Resolve a ``collapse_exact`` of True / False / ``'auto'``.

    The exact-duplicate collapse makes shingle-family operators
    replication-invariant (a 10x-duplicated corpus costs ~1x), but on
    a duplicate-free corpus it is pure overhead: an extra hash
    aggregate + two membership joins bought nothing (measured: the r5
    collapse-factoring of boilerplate/decontaminate regressed the
    no-dup sf0.1 fixture 1.28-1.39x while flattening the 10x stress
    28.6s -> 2.6s).

    ``'auto'`` probes the duplicate factor with ONE map-side-combined
    aggregate over the text hash (`approx_count_distinct`, default
    rsd=0.05 — the exchange carries a single HLL sketch per task) and
    skips the collapse when rows <= 1.1 * distinct-estimate: a no-dup
    corpus lands under the threshold even at the sketch's worst-case
    underestimate, while any corpus with >~10% exact duplicates (the
    regime the collapse exists for) triggers it. NULL texts share one
    hash and can only push the factor UP — i.e. toward the collapse,
    never away from correctness (the collapse is an optimization; both
    paths produce identical output).

    CHAINED-PIPELINE callers should pass an explicit True instead of
    'auto': the probe is an ACTION over `docs`, so on an
    unmaterialized upstream stage it re-executes that stage's whole
    lineage just to count duplicates, and skipping the collapse also
    forfeits its second role as the stage boundary's materialization
    barrier (without it every downstream consumer re-executes the
    upstream stage). Measured on the sf0.1 line+span ladder
    (idle host, median-of-5): explicit True/True 4.80s vs auto/auto
    6.66s. Standalone over a raw scan, 'auto' wins instead
    (dedup_lines 1.56s vs True 1.73s; boilerplate 2.29s vs 2.78s) —
    re-scanning parquet is cheaper than materializing a collapse that
    buys nothing."""
    if isinstance(collapse_exact, str):
        if collapse_exact != "auto":
            # a typo like 'Auto' would otherwise coerce to bool(str)
            # = True and silently force the collapse the caller was
            # trying to avoid
            raise ValueError(
                f"collapse_exact: expected True, False, or 'auto'; "
                f"got {collapse_exact!r}"
            )
    else:
        return bool(collapse_exact)
    n, d = docs.agg(
        F.count(F.lit(1)), F.approx_count_distinct(F.xxhash64(text_col))
    ).first()
    return n > 1.1 * max(d, 1)


# -- repetition metrics -------------------------------------------------------


def ngrams_all(text_col: str | Column = "text", n: int = 2) -> Column:
    """ALL word n-gram occurrences (duplicates retained — unlike
    `dedup.shingles`, which is a distinct set). Docs with fewer than
    n tokens yield an empty array. Shares `dedup.zipped_ngrams` (the
    zip_with build that avoids per-element re-evaluation of the token
    split)."""
    toks = tokens(text_col)
    return F.when(F.size(toks) >= n, zipped_ngrams(toks, n)).otherwise(
        F.array().cast("array<string>")
    )


def _run_length_metrics(gram_col: Column) -> Column:
    """Fold a SORTED n-gram array into (n_ngrams, top_ngram_count,
    dup_ngram_count) in one pass: equal neighbours form runs; run
    length == occurrence count of that n-gram."""
    zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("maxrun"),
        F.lit(0).cast("long").alias("dup"),
        F.lit(0).cast("long").alias("total"),
    )

    def step(acc: Column, g: Column) -> Column:
        same = acc.getField("prev").eqNullSafe(g)
        run = F.when(same, acc.getField("run") + 1).otherwise(F.lit(1).cast("long"))
        dup = F.when(
            ~same & (acc.getField("run") >= 2),
            acc.getField("dup") + acc.getField("run"),
        ).otherwise(acc.getField("dup"))
        return F.struct(
            g.alias("prev"),
            run.alias("run"),
            F.greatest(acc.getField("maxrun"), run).alias("maxrun"),
            dup.alias("dup"),
            (acc.getField("total") + 1).alias("total"),
        )

    def finish(acc: Column) -> Column:
        dup = F.when(
            acc.getField("run") >= 2, acc.getField("dup") + acc.getField("run")
        ).otherwise(acc.getField("dup"))
        return F.struct(
            acc.getField("total").alias("n_ngrams"),
            acc.getField("maxrun").alias("top_ngram_count"),
            dup.alias("dup_ngram_count"),
        )

    return F.aggregate(F.array_sort(gram_col), zero, step, finish)


def repetition_metrics(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", *, n: int = 2
) -> DataFrame:
    """Gopher-style within-document repetition metrics, per doc:

    - `n_ngrams`: total n-gram occurrences;
    - `top_ngram_count`: occurrences of the most frequent n-gram;
    - `top_ngram_frac` = top/total (coverage of the single most
      repeated n-gram — boilerplate/spam signal);
    - `dup_ngram_count` / `dup_ngram_frac`: occurrences belonging to
      n-grams seen more than once.

    Fractions are NULL for docs with no n-grams (< n tokens). Zero
    shuffles: one projection per row (see module docstring).
    """
    m = _run_length_metrics(ngrams_all(text_col, n))
    df = fan_out(df)  # per-row-heavy fold; no-op on multi-split inputs
    out = df.select(F.col(id_col), m.alias("_m")).select(
        F.col(id_col),
        F.col("_m.n_ngrams").alias("n_ngrams"),
        F.col("_m.top_ngram_count").alias("top_ngram_count"),
        F.col("_m.dup_ngram_count").alias("dup_ngram_count"),
    )
    total = F.col("n_ngrams")
    return out.withColumns(
        {
            "top_ngram_frac": F.when(
                total > 0,
                F.round(F.col("top_ngram_count").cast("double") / total, 3),
            ),
            "dup_ngram_frac": F.when(
                total > 0,
                F.round(F.col("dup_ngram_count").cast("double") / total, 3),
            ),
        }
    )


def _dup_mass_fold(arr: Column) -> Column:
    """Fold a unit array (lines, paragraphs, or n-grams) into
    (n_units, dup_units, dup_chars, top_chars, total_chars) in one
    pass over its SORTED form: equal neighbours form runs; a run of
    length c contributes c-1 duplicate units and (c-1)*len(unit)
    duplicate chars ("occurrences beyond the first"), and the top
    char mass is max(c*len(unit)). Same run-walk as
    `_run_length_metrics`, extended with char masses."""
    zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("n"),
        F.lit(0).cast("long").alias("dup_n"),
        F.lit(0).cast("long").alias("dup_chars"),
        F.lit(0).cast("long").alias("top_chars"),
        F.lit(0).cast("long").alias("total_chars"),
    )

    def step(acc: Column, g: Column) -> Column:
        same = acc.getField("prev").eqNullSafe(g)
        run = F.when(same, acc.getField("run") + 1).otherwise(
            F.lit(1).cast("long")
        )
        ended = ~same & (acc.getField("run") >= 2)
        dup_n = F.when(
            ended, acc.getField("dup_n") + acc.getField("run") - 1
        ).otherwise(acc.getField("dup_n"))
        dup_chars = F.when(
            ended,
            acc.getField("dup_chars")
            + (acc.getField("run") - 1) * F.length(acc.getField("prev")),
        ).otherwise(acc.getField("dup_chars"))
        return F.struct(
            g.alias("prev"),
            run.alias("run"),
            (acc.getField("n") + 1).alias("n"),
            dup_n.alias("dup_n"),
            dup_chars.alias("dup_chars"),
            F.greatest(
                acc.getField("top_chars"), run * F.length(g)
            ).alias("top_chars"),
            (acc.getField("total_chars") + F.length(g)).alias("total_chars"),
        )

    def finish(acc: Column) -> Column:
        open_dup = acc.getField("run") >= 2
        dup_n = F.when(
            open_dup, acc.getField("dup_n") + acc.getField("run") - 1
        ).otherwise(acc.getField("dup_n"))
        dup_chars = F.when(
            open_dup,
            acc.getField("dup_chars")
            + (acc.getField("run") - 1) * F.length(acc.getField("prev")),
        ).otherwise(acc.getField("dup_chars"))
        return F.struct(
            acc.getField("n").alias("n"),
            dup_n.alias("dup_n"),
            dup_chars.alias("dup_chars"),
            acc.getField("top_chars").alias("top_chars"),
            acc.getField("total_chars").alias("total_chars"),
        )

    return F.aggregate(F.array_sort(arr), zero, step, finish)


def _top_mass_fold(arr: Column) -> Column:
    """max over runs of run*len(unit) — the top-n-gram char mass —
    over the SORTED array, with a 3-field accumulator. HOF lambdas
    are interpreted (not codegen'd), so accumulator width is the
    direct per-element cost: the slim fold exists because
    `gopher_repetition_rules` runs nine of these per document (the
    full `_dup_mass_fold` carries 7 fields; measured ~35% of the
    operator's wall time back)."""
    zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("top"),
    )

    def step(acc: Column, g: Column) -> Column:
        run = F.when(
            acc.getField("prev").eqNullSafe(g), acc.getField("run") + 1
        ).otherwise(F.lit(1).cast("long"))
        return F.struct(
            g.alias("prev"),
            run.alias("run"),
            F.greatest(acc.getField("top"), run * F.length(g)).alias("top"),
        )

    return F.aggregate(
        F.array_sort(arr), zero, step, lambda acc: acc.getField("top")
    )


def _dup_chars_fold(arr: Column) -> Column:
    """sum over runs of (run-1)*len(unit) — duplicate char mass
    (occurrences beyond the first) — over the SORTED array; slim
    3-field accumulator (see `_top_mass_fold`)."""
    zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("dup"),
    )

    def step(acc: Column, g: Column) -> Column:
        same = acc.getField("prev").eqNullSafe(g)
        run = F.when(same, acc.getField("run") + 1).otherwise(
            F.lit(1).cast("long")
        )
        dup = F.when(
            ~same & (acc.getField("run") >= 2),
            acc.getField("dup")
            + (acc.getField("run") - 1) * F.length(acc.getField("prev")),
        ).otherwise(acc.getField("dup"))
        return F.struct(g.alias("prev"), run.alias("run"), dup.alias("dup"))

    def finish(acc: Column) -> Column:
        return F.when(
            acc.getField("run") >= 2,
            acc.getField("dup")
            + (acc.getField("run") - 1) * F.length(acc.getField("prev")),
        ).otherwise(acc.getField("dup"))

    return F.aggregate(F.array_sort(arr), zero, step, finish)


def _top_value_fold(arr: Column) -> Column:
    """The most frequent value of the array (ties broken toward the
    lexicographically SMALLEST, deterministically in both engines):
    run-walk over the sorted array keeping the first run that is
    strictly longest."""
    zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best_run"),
        F.lit(None).cast("string").alias("best"),
    )

    def step(acc: Column, g: Column) -> Column:
        run = F.when(
            acc.getField("prev").eqNullSafe(g), acc.getField("run") + 1
        ).otherwise(F.lit(1).cast("long"))
        better = run > acc.getField("best_run")
        return F.struct(
            g.alias("prev"),
            run.alias("run"),
            F.when(better, run).otherwise(acc.getField("best_run")).alias(
                "best_run"
            ),
            F.when(better, g).otherwise(acc.getField("best")).alias("best"),
        )

    return F.aggregate(
        F.array_sort(arr), zero, step, lambda acc: acc.getField("best")
    )


def _dup_values_fold(arr: Column) -> Column:
    """The DISTINCT values occurring >= 2 times, as a sorted array:
    run-walk over the sorted array appending each value once, the
    moment its run reaches 2. The result is bounded by the number of
    duplicated distinct values (on natural text a handful), not the
    array length."""
    zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.array().cast("array<string>").alias("vals"),
    )

    def step(acc: Column, g: Column) -> Column:
        run = F.when(
            acc.getField("prev").eqNullSafe(g), acc.getField("run") + 1
        ).otherwise(F.lit(1).cast("long"))
        return F.struct(
            g.alias("prev"),
            run.alias("run"),
            F.when(
                run == 2, F.array_append(acc.getField("vals"), g)
            ).otherwise(acc.getField("vals")).alias("vals"),
        )

    return F.aggregate(
        F.array_sort(arr), zero, step, lambda acc: acc.getField("vals")
    )


def _positional_coverage_fold(toks: Column, grams: Column, target) -> Column:
    """Characters of the normalized text (the space-joined token
    string) covered by at least one TARGET n-gram occurrence, each
    position counted ONCE — Rae et al.'s positional char coverage.

    ``grams`` must be positionally aligned with ``toks`` (gram at
    index i starts at token i; shorter tails are fine — `arrays_zip`
    pads with NULL and NULL grams never hit). ``target(g)`` is a
    boolean Column predicate selecting the occurrences to cover.

    One left-to-right fold: occurrence intervals [pos, pos+len(gram))
    have non-decreasing starts (token order), so the union length is
    the classic sweep — add the part of each interval beyond the
    running max end. Zero exchanges, zero UDFs, O(L) per doc plus the
    per-element cost of ``target``."""
    zero = F.struct(
        F.lit(0).cast("long").alias("pos"),
        F.lit(0).cast("long").alias("last"),
        F.lit(0).cast("long").alias("cov"),
    )
    zipped = F.arrays_zip(toks.alias("t"), grams.alias("g"))

    def step(acc: Column, e: Column) -> Column:
        g = e.getField("g")
        hit = g.isNotNull() & target(g)
        newend = acc.getField("pos") + F.length(g)
        clipped_start = F.greatest(acc.getField("last"), acc.getField("pos"))
        cov = F.when(
            hit & (newend > clipped_start),
            acc.getField("cov") + newend - clipped_start,
        ).otherwise(acc.getField("cov"))
        last = F.when(hit, F.greatest(acc.getField("last"), newend)).otherwise(
            acc.getField("last")
        )
        pos = acc.getField("pos") + F.length(e.getField("t")) + 1
        return F.struct(pos.alias("pos"), last.alias("last"), cov.alias("cov"))

    return F.aggregate(
        zipped, zero, step, lambda acc: acc.getField("cov")
    )


_GOPHER_KERNEL_CONF = "spark.featurestore.gopher.kernel"

_GOPHER_COUNTS_SCHEMA = (
    "ln bigint, ldup bigint, ldc bigint, ltc bigint, "
    "pn bigint, pdup bigint, pdc bigint, ptc bigint, "
    "norm_len bigint, "
    "gm2 bigint, gm3 bigint, gm4 bigint, gm5 bigint, gm6 bigint, "
    "gm7 bigint, gm8 bigint, gm9 bigint, gm10 bigint"
)

_GOPHER_UDF_CACHE: dict[bool, object] = {}


def _gopher_counts_udf(positional: bool):
    """Arrow-vectorized kernel for the Gopher repetition INTEGER
    counts (guide §4.2): tokenization/unit splitting stays JVM-side
    (`clean_tokens` / the trim-split `units`), so the only Python work
    is gram assembly + run counting over JVM-produced strings — the
    part the Column formulation runs as interpreted per-element HOF
    folds (9 per document). Fractions, rounding, thresholds and the
    keep conjunction remain the SAME JVM expressions, so the operator's
    values are unchanged (oracle-checked; fold-twin property test).

    Count semantics replicated exactly:
    - unit masses: per distinct unit with count c, c-1 duplicate units
      and (c-1)*len duplicate chars; totals over occurrences;
    - gm2..gm4 default: max over distinct grams of count*len;
    - gm5..gm10 default: sum over distinct grams of (count-1)*len;
    - positional: Rae et al. interval sweep over token positions, the
      target being THE most frequent gram (ties to the
      lexicographically smallest — UTF-8 byte order == code-point
      order, so Python `min` agrees with UTF8String comparison) for
      2-4 and the duplicated-gram set for 5-10;
    - gm is NULL when the doc has no n-grams (fewer than n tokens).
    """
    if positional in _GOPHER_UDF_CACHE:
        return _GOPHER_UDF_CACHE[positional]
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from collections import Counter

    def _unit_mass(units: list) -> tuple:
        c = Counter(units)
        dup_n = dup_c = total = 0
        for u, v in c.items():
            lu = len(u)
            total += lu * v
            if v >= 2:
                dup_n += v - 1
                dup_c += (v - 1) * lu
        return len(units), dup_n, dup_c, total

    # hint-less signature (scalar eval type): see _minhash_sig_udf's
    # note on `from __future__ import annotations` vs pandas_udf
    @pandas_udf(_GOPHER_COUNTS_SCHEMA)
    def counts(toks_s, lines_s, paras_s):
        rows = []
        for toks, lines, paras in zip(toks_s, lines_s, paras_s):
            toks = list(toks) if toks is not None else []
            ln, ldup, ldc, ltc = _unit_mass(
                lines if lines is not None else []
            )
            pn, pdup, pdc, ptc = _unit_mass(
                paras if paras is not None else []
            )
            L = len(toks)
            norm_len = sum(map(len, toks)) + L - 1 if L else 0
            gms = []
            grams = toks
            for n in range(2, 11):
                # incremental extension — same construction as the
                # JVM zip chain, one pass per n
                grams = [
                    a + " " + b for a, b in zip(grams, toks[n - 1 :])
                ]
                if not grams:
                    gms.append(None)
                    continue
                c = Counter(grams)
                if not positional:
                    if n <= 4:
                        gm = max(v * len(g) for g, v in c.items())
                    else:
                        gm = sum(
                            (v - 1) * len(g)
                            for g, v in c.items()
                            if v >= 2
                        )
                else:
                    if n <= 4:
                        mx = max(c.values())
                        target = min(
                            g for g, v in c.items() if v == mx
                        )
                        dups = None
                    else:
                        target = None
                        dups = {g for g, v in c.items() if v >= 2}
                    pos = last = cov = 0
                    ng = len(grams)
                    for i, t in enumerate(toks):
                        if i < ng:
                            g = grams[i]
                            if (g == target) if dups is None else (g in dups):
                                newend = pos + len(g)
                                cs = last if last > pos else pos
                                if newend > cs:
                                    cov += newend - cs
                                if newend > last:
                                    last = newend
                        pos += len(t) + 1
                    gm = cov
                gms.append(gm)
            rows.append(
                (ln, ldup, ldc, ltc, pn, pdup, pdc, ptc, norm_len, *gms)
            )
        return pd.DataFrame(
            rows,
            columns=[f.split()[0] for f in _GOPHER_COUNTS_SCHEMA.split(", ")],
            dtype=object,
        )

    _GOPHER_UDF_CACHE[positional] = counts
    return counts


# Rae et al. 2021, Appendix A1.1 (Table A1), repetition half: the
# published maximum fractions. Keys are the output column names.
GOPHER_REPETITION_THRESHOLDS = {
    "dup_line_frac": 0.30,
    "dup_para_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "dup_para_char_frac": 0.20,
    "top_2gram_char_frac": 0.20,
    "top_3gram_char_frac": 0.18,
    "top_4gram_char_frac": 0.16,
    "dup_5gram_char_frac": 0.15,
    "dup_6gram_char_frac": 0.14,
    "dup_7gram_char_frac": 0.13,
    "dup_8gram_char_frac": 0.12,
    "dup_9gram_char_frac": 0.11,
    "dup_10gram_char_frac": 0.10,
}


def gopher_repetition_rules(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    thresholds: dict[str, float] | None = None,
    passthrough: tuple[str, ...] = (),
    positional: bool = False,
) -> DataFrame:
    """The REPETITION half of the Gopher filter table (Rae et al.
    2021, Appendix A1.1) — the complement of `text.gopher_doc_rules`'
    quality half. Emits all 13 published signals plus the conjunction
    ``keep`` (every signal <= its threshold), at the paper's
    thresholds by default (:data:`GOPHER_REPETITION_THRESHOLDS`;
    pass ``thresholds=`` to re-cut):

    - ``dup_line_frac`` / ``dup_para_frac``: unit occurrences beyond
      the first over total units. Units are space-trimmed non-empty
      segments of a ``\\n`` (lines) / ``\\n\\n`` (paragraphs) split —
      blank-heavy layouts don't self-duplicate.
    - ``dup_line_char_frac`` / ``dup_para_char_frac``: characters of
      those beyond-first occurrences over total unit characters.
    - ``top_{2,3,4}gram_char_frac``: the maximal char mass of one
      word n-gram — max over distinct grams of count*len(gram) — over
      the normalized text length (the space-joined token string).
    - ``dup_{5..10}gram_char_frac``: char mass of beyond-first n-gram
      occurrences over the normalized text length.

    The paper computes the n-gram char coverage positionally (each
    character position counted once); by default this implementation
    counts each occurrence's characters declaratively — no
    per-position scan, replays exactly in SQL (grams are the
    space-joined `clean_tokens`; char masses use the gram string's
    length). ``positional=True`` computes the paper-exact coverage
    instead: for ``top_{2,3,4}gram`` the characters covered by
    occurrences of THE most frequent gram (ties broken toward the
    lexicographically smallest), for ``dup_{5..10}gram`` the
    characters covered by any gram occurring more than once — each
    character position counted once even under overlapping
    occurrences (one extra left-to-right interval-sweep fold per n;
    still zero exchanges). How the two modes relate (fuzz-pinned in
    test_properties_spark): for the top grams the default mass
    ``count*len`` is a true upper bound of positional coverage; for
    the dup grams the default counts occurrences BEYOND the first
    (``(count-1)*len`` — the same convention as the line/paragraph
    char fractions) while the paper covers ALL occurrences of a
    duplicated gram, so the two sit on EITHER side of each other
    (a clean two-copy duplication: default len vs paper 2*len; heavy
    overlapped repetition: default (c-1)*len vs paper ~len). Users
    validating against published keep-rates should pass
    ``positional=True``. Docs whose signals are undefined (no
    non-empty lines, or fewer than 10 tokens — no 10-grams) get NULL
    fractions and keep=false; the Gopher preset's >= 50-word rule
    already excludes them upstream.

    Scale shape: pure Column folds over one scan — the tokens and
    unit arrays are projected to attribute columns once (HOF-lambda
    re-evaluation trap), each n-gram size is one in-plan
    sort+run-walk over that doc's grams (O(L log L) per doc, never a
    corpus aggregate); zero exchanges, zero UDFs."""
    thr = dict(GOPHER_REPETITION_THRESHOLDS)
    if thresholds:
        unknown = set(thresholds) - set(thr)
        if unknown:
            raise ValueError(
                f"gopher_repetition_rules: unknown thresholds {sorted(unknown)}"
            )
        thr.update(thresholds)
    # per-row-heavy operator: un-starve single-split inputs (no-op on
    # real multi-split tables — see materialize.fan_out)
    df = fan_out(df)
    text = F.coalesce(F.col(text_col), F.lit(""))

    def units(sep: str) -> Column:
        return F.filter(
            F.transform(F.split(text, sep), lambda u: F.trim(u)),
            lambda u: u != F.lit(""),
        )

    # Arrow kernel (default): tokenization and unit splitting stay
    # JVM-side; the per-gram run counting — interpreted per element in
    # the fold formulation below — runs as one batched Python kernel,
    # and every downstream fraction/threshold expression is IDENTICAL.
    # `spark.featurestore.gopher.kernel=fold` pins the pure-Column
    # path (portability / property-test twin). The kernel needs
    # pandas/pyarrow on the workers (ADVICE r14) — when the driver
    # import fails, degrade to the fold path instead of erroring.
    use_arrow = (
        df.sparkSession.conf.get(_GOPHER_KERNEL_CONF, "arrow") == "arrow"
    )
    if use_arrow:
        try:
            _gopher_counts_udf(positional)
        except ImportError:
            use_arrow = False  # no pandas: pure-Column fold below
    if use_arrow:
        g = F.col("_gc")
        out = df.withColumn(
            "_gc",
            _gopher_counts_udf(positional)(
                clean_tokens(text_col), units("\n"), units("\n\n")
            ),
        )
        cols = {}
        for unit, pre in (("line", "l"), ("para", "p")):
            cols[f"dup_{unit}_frac"] = F.round(
                F.try_divide(g.getField(f"{pre}dup"), g.getField(f"{pre}n")),
                4,
            )
            cols[f"dup_{unit}_char_frac"] = F.round(
                F.try_divide(g.getField(f"{pre}dc"), g.getField(f"{pre}tc")),
                4,
            )
        for n in (2, 3, 4):
            cols[f"top_{n}gram_char_frac"] = F.round(
                F.try_divide(g.getField(f"gm{n}"), g.getField("norm_len")),
                4,
            )
        for n in range(5, 11):
            cols[f"dup_{n}gram_char_frac"] = F.round(
                F.try_divide(g.getField(f"gm{n}"), g.getField("norm_len")),
                4,
            )
        out = out.withColumns(cols)
        keep = None
        for name, t in thr.items():
            c = F.col(name) <= F.lit(t)
            keep = c if keep is None else (keep & c)
        return plan_fence(
            out.select(
                id_col,
                *passthrough,
                *cols.keys(),
                F.coalesce(keep, F.lit(False)).alias("keep"),
            )
        )

    out = df.withColumns(
        {
            "_toks": clean_tokens(text_col),
            "_lines": units("\n"),
            "_paras": units("\n\n"),
        }
    )
    out = out.withColumns(
        {
            "_lm": _dup_mass_fold(F.col("_lines")),
            "_pm": _dup_mass_fold(F.col("_paras")),
            "_norm_len": F.length(F.array_join("_toks", " ")),
        }
    )
    cols: dict[str, Column] = {}
    for unit, m in (("line", "_lm"), ("para", "_pm")):
        g = F.col(m)
        cols[f"dup_{unit}_frac"] = F.round(
            F.try_divide(g.getField("dup_n"), g.getField("n")), 4
        )
        cols[f"dup_{unit}_char_frac"] = F.round(
            F.try_divide(g.getField("dup_chars"), g.getField("total_chars")),
            4,
        )
    # Build the nine gram arrays INCREMENTALLY — each n extends the
    # (n-1)-gram column with one more zip against the n-shifted token
    # slice — so the whole family costs 9 zip passes instead of the
    # 44 (=1+2+..+8) that nine independent zipped_ngrams() calls
    # spend re-deriving shared prefixes (measured: gram construction
    # was ~60% of the operator's wall time). Each _g{n} is projected
    # to an attribute column before the next references it, so
    # nothing re-evaluates inline.
    prev = F.col("_toks")
    for n in range(2, 11):
        ext = F.zip_with(
            prev,
            F.slice(F.col("_toks"), n, _SLICE_REST),
            lambda a, b: F.when(
                a.isNotNull() & b.isNotNull(), F.concat(a, F.lit(" "), b)
            ),
        )
        out = out.withColumn(f"_g{n}", F.filter(ext, lambda x: x.isNotNull()))
        prev = F.col(f"_g{n}")
    # each n uses only ONE statistic, so run the slim single-purpose
    # fold for it (top mass for 2-4, dup mass for 5-10) instead of the
    # 7-field combined walk — HOF folds are interpreted per element,
    # so accumulator width is per-element cost
    if positional:
        # paper-exact coverage: first extract the target grams per n
        # (top value for 2-4, duplicated-value set for 5-10) as
        # ATTRIBUTE columns (they're referenced once per element in
        # the coverage sweep — the HOF inlining trap), then sweep the
        # positionally-aligned gram array once per n
        tcols = {}
        for n in range(2, 11):
            g = F.col(f"_g{n}")
            tcols[f"_t{n}"] = (
                _top_value_fold(g) if n <= 4 else _dup_values_fold(g)
            )
        out = out.withColumns(tcols)
        gram_cols = {}
        for n in range(2, 11):
            g = F.col(f"_g{n}")
            if n <= 4:
                target = lambda x, n=n: x == F.col(f"_t{n}")
            else:
                target = lambda x, n=n: F.array_contains(F.col(f"_t{n}"), x)
            fold = _positional_coverage_fold(F.col("_toks"), g, target)
            gram_cols[f"_gm{n}"] = F.when(F.size(g) > 0, fold)
    else:
        gram_cols = {}
        for n in range(2, 11):
            g = F.col(f"_g{n}")
            fold = _top_mass_fold(g) if n <= 4 else _dup_chars_fold(g)
            gram_cols[f"_gm{n}"] = F.when(F.size(g) > 0, fold)
    out = out.withColumns(gram_cols)
    for n in (2, 3, 4):
        cols[f"top_{n}gram_char_frac"] = F.round(
            F.try_divide(F.col(f"_gm{n}"), F.col("_norm_len")), 4
        )
    for n in range(5, 11):
        cols[f"dup_{n}gram_char_frac"] = F.round(
            F.try_divide(F.col(f"_gm{n}"), F.col("_norm_len")), 4
        )
    out = out.withColumns(cols)
    keep = None
    for name, t in thr.items():
        c = F.col(name) <= F.lit(t)
        keep = c if keep is None else (keep & c)
    # plan_fence: a downstream .where("keep") must evaluate the
    # computed conjunction, not inline 13 HOF-fold trees into the
    # predicate (measured 5x; see materialize.plan_fence)
    return plan_fence(out.select(
        id_col,
        *passthrough,
        *cols.keys(),
        F.coalesce(keep, F.lit(False)).alias("keep"),
    ))


# -- benchmark decontamination ------------------------------------------------


def decontaminate(
    docs: DataFrame,
    probes: DataFrame,
    *,
    n: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    probe_text_col: str = "text",
    probe_id_col: str = "probe_id",
    collapse_exact: bool | str = "auto",
) -> DataFrame:
    """Benchmark-overlap detection: flag corpus documents sharing at
    least one word n-gram shingle with any probe (test-set) document —
    the standard pretraining decontamination sweep.

    Returns (id, n_probes_hit, n_shared_shingles) for contaminated
    docs only. The probe side (benchmark suites: thousands of rows vs
    a 100 TB corpus) is exploded to (shingle, probe_id) and BROADCAST;
    the corpus side streams partition-local against the in-memory map
    — no corpus shuffle until the tiny per-doc aggregate.

    `collapse_exact=True` shingles and probes each DISTINCT corpus
    text once, expanding hits to duplicate documents with a join —
    identical output (contamination is a property of the text),
    replication-invariant cost. The `'auto'` default probes the
    duplicate factor first and skips the collapse on duplicate-free
    corpora (see `_should_collapse`)."""
    collapse_exact = _should_collapse(docs, text_col, collapse_exact)
    if collapse_exact:
        from featurestore_spark.operators.dedup import _collapse_exact_texts

        # members feeds the single expansion join below — lazy
        reps, members = _collapse_exact_texts(
            docs.select(id_col, text_col), text_col, id_col,
            "decontaminate", materialize_members=False,
        )
        doc_sh = plan_fence(
            reps.select(
                F.col("rep_id").alias("_uid"),
                shingles(F.col("_text"), n).alias("_shl"),
            )
        ).select("_uid", F.explode("_shl").alias("_sh"))
    else:
        doc_sh = plan_fence(
            docs.select(
                F.col(id_col).alias("_uid"),
                shingles(text_col, n).alias("_shl"),
            )
        ).select("_uid", F.explode("_shl").alias("_sh"))
    probe_sh = plan_fence(
        probes.select(
            F.col(probe_id_col), shingles(probe_text_col, n).alias("_shl")
        )
    ).select(probe_id_col, F.explode("_shl").alias("_sh"))
    per_unit = (
        doc_sh.join(F.broadcast(probe_sh), "_sh")
        .groupBy("_uid")
        .agg(
            F.countDistinct(probe_id_col).alias("n_probes_hit"),
            F.countDistinct("_sh").alias("n_shared_shingles"),
        )
    )
    if collapse_exact:
        return per_unit.join(
            members.withColumnRenamed("rep_id", "_uid"), "_uid"
        ).select(
            F.col("member_id").alias(id_col),
            "n_probes_hit",
            "n_shared_shingles",
        )
    return per_unit.withColumnRenamed("_uid", id_col)


# -- PII / URL redaction ------------------------------------------------------

# Portable between Java regex (Spark) and RE2 (DuckDB oracles): no
# backrefs, no lookaround, no possessive quantifiers.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_PATTERN = r"https?://[^\s]+"


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    *,
    out_col: str = "text_redacted",
    email_token: str = "<EMAIL>",
    url_token: str = "<URL>",
) -> DataFrame:
    """Replace URLs then emails with placeholder tokens and count the
    matches (`n_urls`, `n_emails`). URL replacement runs first so an
    email embedded in a URL query string is redacted once, as part of
    the URL. Pure Column expressions — codegen'd, no Python."""
    text = F.col(text_col)
    counted = df.withColumns(
        {
            "n_urls": F.size(F.regexp_extract_all(text, F.lit(URL_PATTERN), 0)),
            "n_emails": F.size(
                F.regexp_extract_all(
                    F.regexp_replace(text, URL_PATTERN, url_token),
                    F.lit(EMAIL_PATTERN),
                    0,
                )
            ),
        }
    )
    return counted.withColumn(
        out_col,
        F.regexp_replace(
            F.regexp_replace(text, URL_PATTERN, url_token),
            EMAIL_PATTERN,
            email_token,
        ),
    )


# -- boilerplate span detection ----------------------------------------------


def boilerplate_flags(
    docs: DataFrame,
    *,
    n: int = 5,
    min_df: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    collapse_exact: bool | str = "auto",
) -> DataFrame:
    """Cross-document boilerplate: word n-gram spans appearing in at
    least `min_df` DISTINCT documents (headers, footers, licence
    blocks, templated spam). Returns, per document containing any:
    (id, n_shingles, n_boilerplate, boilerplate_frac, max_span_df).

    Scale shape: shingles are distinct per doc, so span document-
    frequency is a plain count per shingle — one shuffle keyed on the
    shingle (uniform md5-like distribution). The join back is a
    SORT-MERGE join on the same shingle key (hint below): both sides
    share the partitioning, no broadcast of the boilerplate vocabulary
    (which can be large on web corpora), and measured 40% faster than
    the broadcast variant at sf0.1 (2.5s vs 3.9s) because the span
    aggregate is not a blocking broadcast build.

    `collapse_exact=True` shingles each DISTINCT text once; a
    shingle's document frequency is the weight-sum of the reps
    containing it and per-rep metrics expand to members by a join —
    identical output (replicas are distinct documents and count as
    such), replication-invariant cost like the rest of the collapse
    family. Measured: the 10x replication stress dropped 28.6s ->
    ~flat vs the sf0.1 base. The `'auto'` default probes the duplicate
    factor first and skips the collapse on duplicate-free corpora (see
    `_should_collapse`).
    """
    collapse_exact = _should_collapse(docs, text_col, collapse_exact)
    if collapse_exact:
        from featurestore_spark.operators.dedup import _collapse_exact_texts

        # members feeds the single expansion join below — lazy
        reps, members = _collapse_exact_texts(
            docs.select(id_col, text_col), text_col, id_col,
            "boilerplate_flags", materialize_members=False,
        )
        base = reps.select(
            F.col("rep_id").alias("_uid"),
            F.col("n_members").alias("_w"),
            shingles(F.col("_text"), n).alias("_shl"),
        )
    else:
        base = docs.select(
            F.col(id_col).alias("_uid"),
            F.lit(1).cast("long").alias("_w"),
            shingles(text_col, n).alias("_shl"),
        )
    # materialize the shingle array ONCE: size() lives in a Project and
    # explode() in a Generate, and CSE does not span the two operators —
    # inlining shingles() twice would build every doc's array twice
    sh = plan_fence(base).select(
        "_uid",
        "_w",
        F.size("_shl").alias("_n_sh"),
        F.explode("_shl").alias("_sh"),
    )
    # ONE shuffle serves both consumers: the explicit repartition on
    # the shingle key satisfies the groupBy's clustering AND the merge
    # join's, so the scan+shingle+explode runs once and both branches
    # read the same shuffle output (without this, the aggregate's
    # partial-agg sits below its exchange, the two exchange subtrees
    # differ, and the exploded frame is computed twice). Measured at
    # sf0.1: 5.4s -> 2.5s median-of-3.
    sh = sh.repartition(F.col("_sh"))
    span_df = sh.groupBy("_sh").agg(F.sum("_w").alias("span_df"))
    boiler = span_df.where(F.col("span_df") >= min_df)
    per_unit = (
        sh.join(boiler.hint("merge"), "_sh")
        .groupBy("_uid", "_n_sh")
        .agg(
            F.count(F.lit(1)).alias("n_boilerplate"),
            F.max("span_df").alias("max_span_df"),
        )
    )
    if collapse_exact:
        per_unit = per_unit.join(
            members.withColumnRenamed("rep_id", "_uid"), "_uid"
        ).withColumn("_out_id", F.col("member_id"))
    else:
        per_unit = per_unit.withColumn("_out_id", F.col("_uid"))
    return per_unit.select(
        F.col("_out_id").alias(id_col),
        F.col("_n_sh").alias("n_shingles"),
        "n_boilerplate",
        F.round(
            F.col("n_boilerplate").cast("double") / F.col("_n_sh"), 3
        ).alias("boilerplate_frac"),
        "max_span_df",
    )


def c4_line_filter(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    min_words_per_line: int = 5,
    min_kept_lines: int = 1,
    min_sentences: int = 3,
    require_terminal_punct: bool = True,
) -> DataFrame:
    """C4-style line-level cleaning (Raffel et al. 2020, §2.2): keep
    only lines that end in terminal punctuation (``. ! ? "``), contain
    at least ``min_words_per_line`` words (paper default 5), and do
    not mention "javascript"; drop the whole page when it contains
    "lorem ipsum" or a curly brace (code), when fewer than
    ``min_kept_lines`` lines survive, or when the CLEANED text has
    fewer than ``min_sentences`` sentences (paper default 3;
    sentences counted as ``[.!?]`` terminators in the kept lines).
    The paper's bad-words-list page rule (the "List of Dirty, Naughty
    ... Words") is deliberately omitted — shipping the list is out of
    scope; apply it as a downstream filter over the returned text if
    needed. Returns

    (id, text [kept lines re-joined], n_lines, n_kept_lines,
     n_sentences, keep)

    with the original text REPLACED by the cleaned text, so the
    operator composes directly with the dedup ladder downstream.

    Scale shape: pure Column expressions, one scan, no shuffle — the
    line array is built once per row (projected to an attribute so HOF
    lambdas don't re-split per element) and folded with filter/size.
    NULL text → empty output text, keep=false."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    base = docs.withColumn(
        "_lines",
        F.filter(
            F.transform(F.split(text, "\n"), lambda l: F.trim(l)),
            lambda l: l != F.lit(""),
        ),
    )
    line_words = lambda l: F.size(  # noqa: E731
        F.filter(F.split(l, r"\s+"), lambda t: t != F.lit(""))
    )
    def _line_ok(l: Column) -> Column:
        ok = (line_words(l) >= min_words_per_line) & ~F.lower(l).contains(
            "javascript"
        )
        # FineWeb runs the C4 line cleaning with the terminal-punct
        # line rule DISABLED (it thresholds the punct-line FRACTION
        # doc-level instead — fineweb_doc_rules); default True is the
        # C4 paper rule and the pinned-oracle behavior.
        if require_terminal_punct:
            ok = l.rlike('[.!?"]$') & ok
        return ok

    kept = F.filter(F.col("_lines"), _line_ok)
    base = base.withColumn("_kept", kept).withColumn(
        "_cleaned", F.concat_ws("\n", "_kept")
    )
    lowered = F.lower(text)
    n_sentences = F.regexp_count(F.col("_cleaned"), F.lit(r"[.!?]"))
    keep = (
        (F.size("_kept") >= min_kept_lines)
        & (n_sentences >= min_sentences)
        & ~lowered.contains("lorem ipsum")
        & ~lowered.contains("{")
    )
    # plan_fence: .where("keep") downstream must not inline the line
    # machinery into the predicate (see materialize.plan_fence)
    return plan_fence(base.select(
        id_col,
        F.col("_cleaned").alias(text_col),
        F.size("_lines").cast("int").alias("n_lines"),
        F.size("_kept").cast("int").alias("n_kept_lines"),
        n_sentences.cast("int").alias("n_sentences"),
        keep.alias("keep"),
    ))


def curate_corpus(
    docs: DataFrame,
    preset: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    positional: bool = False,
) -> DataFrame:
    """One-call rule-based curation at a PUBLISHED recipe's filters —
    the `dedup_corpus` counterpart for the quality-rule surface.
    Returns the KEPT rows as (id, text), with the text CLEANED where
    the preset's pipeline cleans (C4/FineWeb), so the output feeds the
    dedup ladder directly. Pure composition of the existing operators
    (test-asserted against the hand-wired chains):

    * ``'c4'`` — `c4_line_filter` (Raffel et al. 2020 §2.2): line
      cleaning + the page rules, published defaults.
    * ``'gopher'`` — BOTH halves of the paper's filter table (Rae et
      al. 2021 A1.1): `gopher_doc_rules` (document quality) AND
      `gopher_repetition_rules` (the 13 repetition signals), each at
      the published thresholds; text unchanged. (Its dedup stage is
      ``dedup_corpus(df, 'gopher')``.)
    * ``'fineweb'`` — the FineWeb rule stack (Penedo et al. 2024)
      approximated with this repo's operators, in pipeline order:
      C4 line cleaning with the terminal-punctuation line rule
      DISABLED (FineWeb thresholds the punct-line fraction doc-level
      instead), then the MassiveText base filtering the paper
      inherits (`gopher_doc_rules` + `gopher_repetition_rules`) AND
      `fineweb_doc_rules`, all over the CLEANED text; a doc survives
      only if every stage keeps it.

    Threshold-fidelity note (ADVICE r9): the repetition half's n-gram
    char fractions default to occurrence-counted masses, which
    diverge from the papers' positional coverage near the thresholds
    (stricter on the top-gram signals; either direction on the
    dup-gram signals — see `gopher_repetition_rules`), so keep-rates
    at the published thresholds won't exactly reproduce the papers'.
    ``positional=True`` switches the repetition stage to the
    paper-exact positional coverage.

    Out of scope here, available separately: URL filtering (web.py),
    language id (`language_scores`), PII (`redact_pii`), dedup
    (`dedup_corpus`).

    Scale shape: ONE linear plan over ONE corpus scan — every stage
    is a zero-exchange projection and the text column is passed
    THROUGH each rule operator (`passthrough=`) so the next stage
    chains on the previous projection; no id-joins, no recomputed
    lineage, no materialization barrier needed."""
    from featurestore_spark.operators.text import (
        fineweb_doc_rules,
        gopher_doc_rules,
    )

    def _gopher_both(frame: DataFrame) -> DataFrame:
        q = (
            gopher_doc_rules(frame, text_col, id_col, passthrough=(text_col,))
            .where("keep")
            .select(id_col, text_col)
        )
        return (
            gopher_repetition_rules(
                q,
                text_col,
                id_col,
                passthrough=(text_col,),
                positional=positional,
            )
            .where("keep")
            .select(id_col, text_col)
        )

    if preset == "c4":
        c4 = c4_line_filter(docs, text_col, id_col)
        return c4.where("keep").select(id_col, text_col)
    if preset == "gopher":
        return _gopher_both(docs)
    if preset == "fineweb":
        cleaned = (
            c4_line_filter(docs, text_col, id_col, require_terminal_punct=False)
            .where("keep")
            .select(id_col, text_col)
        )
        g = _gopher_both(cleaned)
        return (
            fineweb_doc_rules(g, text_col, id_col, passthrough=(text_col,))
            .where("keep")
            .select(id_col, text_col)
        )
    raise ValueError(
        f"curate_corpus: unknown preset {preset!r} "
        "(available: ['c4', 'fineweb', 'gopher'])"
    )


def ngram_novelty(
    docs: DataFrame,
    *,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document novelty: the fraction of the doc's DISTINCT word
    n-grams whose first corpus occurrence (minimum ``id_col``) is this
    document. Duplicated/templated content scores near 0; fresh
    content near 1 — the corpus-level complement of the per-doc
    repetition metrics, useful for ordering ingestion batches and
    spotting scraped mirrors. Returns (id, n_grams, n_novel,
    novel_frac); docs with no tokens are omitted (no grams to score).

    Scale shape (the `boilerplate_flags` pattern): one scan shingles
    each doc, the exploded (md5(gram), id) frame is repartitioned ONCE
    on the gram key so the first-occurrence aggregate and the
    merge-join back both reuse a single shuffle; the gram key is the
    16-byte md5, never the gram text. First-occurrence is min(id) —
    deterministic, and exact duplicates credit only the minimum id
    (their replicas score 0, which is the point)."""
    sh = (
        plan_fence(
            docs.select(
                F.col(id_col).alias("_uid"),
                shingles(text_col, n).alias("_shl"),
            )
        )
        .select("_uid", F.explode("_shl").alias("_g"))
        # blank/NULL docs shingle to [""] — not a gram, not scored
        .where(F.col("_g") != "")
        .select("_uid", F.md5("_g").alias("_gh"))
    )
    sh = sh.repartition(F.col("_gh"))
    first = sh.groupBy("_gh").agg(F.min("_uid").alias("_first"))
    return (
        sh.join(first.hint("merge"), "_gh")
        .groupBy("_uid")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(
                F.when(F.col("_first") == F.col("_uid"), 1).otherwise(0)
            ).alias("n_novel"),
        )
        .select(
            F.col("_uid").alias(id_col),
            F.col("n_grams").cast("long").alias("n_grams"),
            F.col("n_novel").cast("long").alias("n_novel"),
            F.round(F.col("n_novel") / F.col("n_grams"), 4).alias("novel_frac"),
        )
    )


# -- fixed-window chunking ----------------------------------------------------


def chunk_documents(
    docs: DataFrame,
    *,
    window: int = 512,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split every document into fixed-size token windows — the
    pretraining chunking step that turns variable-length docs into
    context-window-sized training rows. Returns (id, chunk_idx,
    n_chunk_tokens, chunk_text); the final chunk is the remainder
    (no padding — packing/padding is the trainer's concern).

    Pure Column expressions, no Python, no shuffle. Row fan-out is
    ceil(tokens/window) — bounded and linear in corpus size. The token
    array is materialized in a first select so the split runs once per
    DOCUMENT, not once per chunk (CSE does not span Project/Generate —
    same trap as boilerplate_flags). NULL-text docs emit no rows (a
    null upper bound makes sequence, hence explode, produce nothing).
    """
    base = docs.select(F.col(id_col), tokens(text_col).alias("_toks"))
    n_chunks = F.ceil(F.size("_toks") / F.lit(window)).cast("int")
    last_idx = F.when(n_chunks.isNotNull(), F.greatest(n_chunks, F.lit(1)) - 1)
    out = base.select(
        F.col(id_col),
        F.col("_toks"),
        F.explode(F.sequence(F.lit(0), last_idx)).alias("chunk_idx"),
    )
    chunk = F.slice(F.col("_toks"), F.col("chunk_idx") * window + 1, window)
    return out.select(
        F.col(id_col),
        "chunk_idx",
        F.size(chunk).alias("n_chunk_tokens"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
    )


# -- sequence packing ---------------------------------------------------------


def pack_chunks(
    chunks: DataFrame,
    *,
    budget: int = 2048,
    group_col: str = "pack_group",
    len_col: str = "n_chunk_tokens",
    order_cols: tuple[str, ...] = ("doc_id", "chunk_idx"),
) -> DataFrame:
    """Greedy next-fit packing of chunk rows into token-budget bins —
    the final pretraining step (chunk → packed training sequence).
    Appends `bin_id` (unique within each `group_col` value) and
    `bin_fill` (running token count of the bin after this chunk).

    Packing is inherently sequential, so it runs as an Arrow-batched
    `applyInPandas` per pack group; choose `group_col` with enough
    cardinality to spread work (e.g. a hash bucket or source shard) —
    each group's chunks are processed in deterministic `order_cols`
    order, so reruns and task retries produce identical bins. That
    guarantee requires `order_cols` to be UNIQUE within each group
    (tie order would otherwise depend on partitioning); both that and
    null chunk lengths are validated with clear errors rather than
    packed arbitrarily. Chunks longer than the budget get their own
    bin (never split here; the chunking step controls max chunk size).
    """
    from pyspark.sql.types import LongType, StructField, StructType

    order = list(order_cols)
    # fresh StructType: StructType.add mutates in place, which would
    # corrupt the input DataFrame's cached schema object
    out_schema = StructType(
        list(chunks.schema.fields)
        + [StructField("bin_id", LongType()), StructField("bin_fill", LongType())]
    )

    def _pack(pdf):
        import pandas as pd

        if pdf[len_col].isna().any():
            raise ValueError(
                f"pack_chunks: null {len_col!r} in pack group "
                f"{pdf[group_col].iloc[0]!r} — filter or fix chunking first"
            )
        pdf = pdf.sort_values(order, kind="mergesort").reset_index(drop=True)
        if pdf.duplicated(order).any():
            raise ValueError(
                f"pack_chunks: order_cols {order!r} not unique within pack "
                f"group {pdf[group_col].iloc[0]!r} — bins would depend on "
                "partition order"
            )
        bins, fills = [], []
        cur_bin, cur_fill = 0, 0
        for n in pdf[len_col]:
            n = int(n)
            if cur_fill > 0 and cur_fill + n > budget:
                cur_bin += 1
                cur_fill = 0
            cur_fill += n
            bins.append(cur_bin)
            fills.append(cur_fill)
        pdf["bin_id"] = pd.Series(bins, dtype="int64")
        pdf["bin_fill"] = pd.Series(fills, dtype="int64")
        return pdf

    return chunks.groupBy(group_col).applyInPandas(_pack, out_schema)


# -- line-level dedup ---------------------------------------------------------


def line_doc_frequency(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    delimiter: str = "\n",
    normalize: bool = True,
) -> DataFrame:
    """Document frequency of every distinct (normalized) line:
    (line, doc_freq). Diagnostic companion to `dedup_lines` — inspect
    the boilerplate vocabulary before picking `max_docs`.

    `delimiter` is a Java regex (default literal newline). Empty
    normalized lines are excluded (they are document structure, not
    content). Two shuffles, both with map-side partial aggregation:
    distinct (line, id) pairs, then a count per line.
    """
    line = F.explode(F.split(F.col(text_col), delimiter)).alias("line")
    norm = F.lower(F.trim(F.col("line"))) if normalize else F.col("line")
    return (
        df.select(F.col(id_col), line)
        .select(norm.alias("line"), id_col)
        .where(F.col("line") != "")
        .distinct()
        .groupBy("line")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
    )


def dedup_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    max_docs: int = 1,
    delimiter: str = "\n",
    output_delimiter: str = "\n",
    normalize: bool = True,
    collapse_exact: bool | str = "auto",
    index: DataFrame | None = None,
    include_batch: bool = True,
) -> DataFrame:
    """CCNet / RefinedWeb-style line-level dedup: drop every line whose
    normalized form appears in MORE than `max_docs` distinct documents
    (navigation menus, cookie banners, licence footers — the dominant
    boilerplate class in web corpora). Returns the input columns with
    `text_col` rewritten (kept lines rejoined in original order with
    `output_delimiter`) plus `n_lines` / `n_lines_kept` counts.

    Empty normalized lines are never counted and never dropped
    (paragraph structure survives). NULL text passes through with NULL
    counts. `delimiter` is a Java regex.

    Scale shape (the 100 TB path, where most bytes are line text):

    - **Counting pass carries no line text.** The exploded frame for
      doc-frequency is (hash128(line), id) only — two narrow shuffles
      (distinct pairs, then count-per-hash), both with map-side partial
      aggregation, so even a line present in every document reduces to
      at most one row per upstream partition at the final count.
    - **Only affected documents are rebuilt.** Docs containing at least
      one over-frequent line are found with a semi-join on the slim
      frame; every other document passes through byte-identical with
      NO explode/regroup of its text. On web corpora the affected
      fraction is well under 1, and untouched docs skip the one
      shuffle that carries line strings (the per-doc reassembly
      groupBy, which is bounded by lines-per-doc, not corpus skew).
    - The over-frequent line set joins by hash (left_anti), never
      broadcast unconditionally — on a real web corpus the boilerplate
      vocabulary can be millions of lines.
    - EAGER: the (unit, frequent-line) hit frame fans out to two
      consumers each of the frequent-line and affected-id sets, so it
      is materialized ONCE (see operators/materialize.py and
      docs/usage.md "Eager operators") and both sets re-aggregate the
      checkpointed slim frame — without the barrier Catalyst
      re-derives the full counting pipeline once per consumer
      (measured 4 redundant corpus explodes in the unmaterialized
      plan; the former two-barrier form paid a second action + driver
      gap for the same protection, r15).
    - `collapse_exact=True` factors the whole operator through the
      exact-duplicate collapse (`_collapse_exact_texts`): exploding,
      counting, and rebuilding run once per DISTINCT text, with a
      line's document frequency recovered as the sum of its reps'
      duplicate counts — identical output (replicas each count as a
      document), replication-invariant cost. Measured at the 10x
      replication stress: 29s -> near-flat vs the sf0.1 base. The
      `'auto'` default probes the duplicate factor first and skips
      the collapse on duplicate-free corpora (see `_should_collapse`).
    - `index` (optional): a persisted `(line_hash, doc_freq)` frame
      from `incremental.line_frequency_index` — the rolling-ingestion
      shape. A line's effective frequency becomes index + this-batch
      counts (`include_batch=True`, the corpus-wide CCNet semantic) or
      index counts alone (`include_batch=False`: within-batch
      repetition is ignored). The index joins by hash (equi-join,
      never broadcast unconditionally); only hashes present in the
      batch are probed.
    """
    from featurestore_spark.operators.dedup import _collapse_exact_texts
    from featurestore_spark.operators.materialize import materialize

    if index is None and not include_batch:
        raise ValueError(
            "dedup_lines: include_batch=False is only meaningful against "
            "an index (it means 'count corpus frequencies only'); without "
            "one there would be NO frequency source at all — pass index= "
            "or drop include_batch"
        )
    text = F.col(text_col)
    split_lines = F.split(text, delimiter)

    def _norm(c: Column) -> Column:
        return F.lower(F.trim(c)) if normalize else c

    # dedup unit: one row per distinct text (collapse) or per doc
    collapse_exact = _should_collapse(df, text_col, collapse_exact)
    if collapse_exact:
        # members feeds the final attach join ONCE — lazy membership
        # skips its checkpoint job (equal passes, one fewer action)
        reps, members = _collapse_exact_texts(
            df.select(id_col, text_col), text_col, id_col, "dedup_lines",
            materialize_members=False,
        )
        unit = reps.select(
            F.col("rep_id").alias("_uid"), F.col("_text").alias("_utext")
        )
        weights = reps.select(
            F.col("rep_id").alias("_uid"), F.col("n_members").alias("_w")
        )
    else:
        unit = df.select(
            F.col(id_col).alias("_uid"), F.col(text_col).alias("_utext")
        )
        weights = None
    split_unit = F.split(F.col("_utext"), delimiter)

    # slim counting frame: (line-hash, unit id); empty lines excluded
    per_line = (
        unit.select("_uid", F.explode(split_unit).alias("_line"))
        .select("_uid", _norm(F.col("_line")).alias("_nl"))
        .where(F.col("_nl") != "")
        .select("_uid", hash128(F.col("_nl")).alias("_lh"))
        .distinct()
    )
    doc_freq = (
        per_line.join(weights, "_uid").groupBy("_lh").agg(F.sum("_w").alias("_df"))
        if collapse_exact
        else per_line.groupBy("_lh").agg(F.count(F.lit(1)).alias("_df"))
    )
    if index is not None:
        idx = index.select(
            F.col("line_hash").alias("_lh"),
            F.col("doc_freq").cast("long").alias("_idf"),
        )
        if include_batch:
            doc_freq = doc_freq.join(idx, "_lh", "left").select(
                "_lh",
                (F.col("_df") + F.coalesce(F.col("_idf"), F.lit(0))).alias(
                    "_df"
                ),
            )
        else:
            doc_freq = (
                per_line.select("_lh")
                .distinct()
                .join(idx, "_lh", "left")
                .select("_lh", F.coalesce(F.col("_idf"), F.lit(0)).alias("_df"))
            )
    # ONE barrier for the whole counting pass (r15, VERDICT r14 #3
    # "one barrier per stage boundary, not per operator"): `hot` is
    # every (unit, line-hash) pair of an over-frequent line — tiny
    # (affected units × their frequent lines). The former separate
    # `frequent` and `affected` materializations each executed the
    # per_line pipeline once (two jobs, two driver gaps); here both
    # sides of the semi-join hang off per_line's distinct exchange in
    # a single job, and `frequent` / `affected` become cheap
    # re-aggregations of the checkpointed slim frame.
    hot = materialize(
        per_line.join(
            doc_freq.where(F.col("_df") > max_docs).select("_lh"),
            "_lh",
            "left_semi",
        )
    )
    frequent = hot.select("_lh").distinct()
    affected = hot.select("_uid").distinct()

    # rebuild ONLY affected units; line strings shuffle once (regroup).
    # A plain left_anti suffices for empty lines too: they are excluded
    # from counting, so their hash can never be in `frequent`.
    rebuilt = (
        unit.join(affected, "_uid", "left_semi")
        .select("_uid", F.posexplode(split_unit).alias("_pos", "_line"))
        .withColumn("_lh", hash128(_norm(F.col("_line"))))
        .join(frequent, "_lh", "left_anti")
        .groupBy("_uid")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_pos", "_line"))),
                    lambda s: s["_line"],
                ),
                output_delimiter,
            ).alias("_new_text"),
            F.count(F.lit(1)).alias("_n_kept"),
        )
    )

    # Expand back to documents. rebuilt has no row for an affected unit
    # whose EVERY line was dropped (groupBy over zero kept lines) — the
    # _aff flag from the materialized affected set distinguishes it
    # from an untouched one.
    if collapse_exact:
        attach = df.join(
            members.withColumnRenamed("rep_id", "_uid"),
            F.col(id_col) == F.col("member_id"),
        ).drop("member_id")
    else:
        attach = df.withColumn("_uid", F.col(id_col))
    out = attach.join(rebuilt, "_uid", "left").join(
        affected.withColumn("_aff", F.lit(True)), "_uid", "left"
    )
    return out.withColumns(
        {
            "n_lines": F.size(split_lines),
            "n_lines_kept": F.when(F.col("_aff").isNull(), F.size(split_lines))
            .when(F.col("_n_kept").isNotNull(), F.col("_n_kept"))
            .otherwise(F.lit(0)),
            text_col: F.when(F.col("_aff").isNull(), text)
            .when(F.col("_n_kept").isNotNull(), F.col("_new_text"))
            .otherwise(F.lit("")),
        }
    ).drop("_uid", "_new_text", "_n_kept", "_aff")


# -- cross-document shared-span removal --------------------------------------


def remove_shared_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    n: int = 10,
    min_df: int = 2,
    collapse_exact: bool | str = "auto",
) -> DataFrame:
    """Exact-substring dedup, Spark-native (the RefinedWeb / "Deduplicating
    Training Data Makes Language Models Better" span-removal step):
    remove every token span whose length-`n` windows ALL appear in at
    least `min_df` distinct documents. A verbatim span of L >= n tokens
    shared between documents contributes L-n+1 over-frequent windows
    whose coverage union is exactly the span — so shared spans are
    removed from every copy without any suffix-array build. Lee et
    al.'s published ExactSubstr setting removes duplicate substrings
    of >= 50 TOKENS — pass ``n=50`` for it (the n=10 default suits
    short documents and the test fixtures).

    (Approximation note, shared with the reference algorithm's other
    scalable ports: adjacent windows frequent via DIFFERENT partner
    docs chain into one removed span even if the full span appears
    verbatim nowhere — the standard n-gram relaxation. Within-document
    repetition alone never triggers removal: frequency counts DISTINCT
    documents. Spans are removed from EVERY copy, like `dedup_lines` —
    so run `exact_dedup` first: exact-duplicate documents make the
    whole text a shared span and all copies would be emptied.)

    Returns the input columns with `text_col` rewritten for affected
    docs (kept tokens space-joined — i.e. re-tokenized: lowercased,
    whitespace-normalized, same normalization as `text.tokens`) plus
    `n_tokens`, `n_tokens_removed`, `n_spans`. UNAFFECTED docs pass
    through byte-identical; NULL text passes through with NULL counts.

    Scale shape:

    - Window doc-frequency shuffles only (hash128, unit id) — never
      gram text; map-side partial aggregation bounds any universal
      window (same design as `dedup_lines`). The key is the 128-bit
      two-seeded struct (`dedup.hash128`): at the documented
      O(corpus-tokens) distinct-window scale, 64-bit collisions are
      expected and would silently remove unrelated spans.
    - Positional windows come from `zipped_ngrams` (n zips total), not
      a per-element slice lambda (which re-evaluates the token split
      per window — the boilerplate_flags trap).
    - Covered positions are merged into per-doc INTERVALS with one
      `aggregate` fold over the sorted start set; token filtering is
      O(tokens x merged-intervals) per doc — a fully-covered doc
      collapses to ONE interval, so degenerate coverage gets cheaper,
      not quadratic.
    - `collapse_exact=True` runs window extraction, counting, and
      span-merging once per DISTINCT text (a replica counts toward
      frequency via its rep's duplicate weight) — replication-invariant
      like the rest of the collapse family. The `'auto'` default
      probes the duplicate factor first and skips the collapse on
      duplicate-free corpora (see `_should_collapse`).
    - LAZY end to end past the exact-collapse barrier (r15): the
      frequent-window set, membership frame and per-unit interval
      frame each feed exactly ONE consumer, so the whole
      count→merge→rebuild tail runs as a single job — the former
      three materializations paid checkpoint round-trips + driver
      gaps without removing any re-execution (the gram pass runs
      twice either way; see `_merged_interval_spans`).
    """
    from featurestore_spark.operators.dedup import _collapse_exact_texts

    collapse_exact = _should_collapse(df, text_col, collapse_exact)
    if collapse_exact:
        # members feeds _apply_span_removal's attach join ONCE — lazy
        reps, members = _collapse_exact_texts(
            df.select(id_col, text_col), text_col, id_col,
            "remove_shared_spans", materialize_members=False,
        )
        unit = reps.select(
            F.col("rep_id").alias("_uid"), F.col("_text").alias("_utext")
        )
        weights = reps.select(
            F.col("rep_id").alias("_uid"), F.col("n_members").alias("_w")
        )
    else:
        unit = df.select(
            F.col(id_col).alias("_uid"), F.col(text_col).alias("_utext")
        )
        weights = None
        members = None

    grams = _positional_gram_hashes(unit, n)
    per_unit = grams.select("_uid", "_gh").distinct()
    doc_freq = (
        per_unit.join(weights, "_uid").groupBy("_gh").agg(F.sum("_w").alias("_df"))
        if collapse_exact
        else per_unit.groupBy("_gh").agg(F.count(F.lit(1)).alias("_df"))
    )
    # frequent feeds the hit semi-join ONCE, and the gram pass it
    # shares with the hits side re-executes either way (grams is not
    # a barrier) — lazy merges the counting pipeline into the single
    # span job instead of paying a checkpoint round-trip + driver gap
    # for the same two gram passes (r15, VERDICT r14 #3)
    frequent = doc_freq.where(F.col("_df") >= min_df).select("_gh")
    spans = _merged_interval_spans(
        grams.join(frequent, "_gh", "left_semi"), n
    )
    return _apply_span_removal(df, spans, members, text_col, id_col)


def decontaminate_spans(
    docs: DataFrame,
    probes: DataFrame,
    *,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    probe_text_col: str = "text",
    collapse_exact: bool | str = "auto",
) -> DataFrame:
    """Surgical decontamination: REMOVE every token span whose
    length-`n` windows all appear verbatim in the probe (benchmark)
    set, keeping the rest of the document — the span-level complement
    of `decontaminate` (which only flags whole documents). Use it when
    benchmark overlap is embedded in otherwise-good documents.

    Same output contract as `remove_shared_spans` (text rewritten for
    affected docs, `n_tokens` / `n_tokens_removed` / `n_spans`;
    unaffected docs byte-identical, NULL text -> NULL counts) and the
    same interval-merge machinery — the only difference is the
    frequent-window source: the probe set's positional windows,
    DISTINCT and BROADCAST (benchmark suites are tiny vs the corpus),
    so the corpus side never shuffles to discover hits.
    `collapse_exact=True` runs window extraction and span merging once
    per DISTINCT corpus text; the `'auto'` default probes the
    duplicate factor and skips the collapse on duplicate-free
    corpora."""
    from featurestore_spark.operators.dedup import _collapse_exact_texts

    collapse_exact = _should_collapse(docs, text_col, collapse_exact)
    if collapse_exact:
        # members feeds _apply_span_removal's attach join ONCE — lazy
        reps, members = _collapse_exact_texts(
            docs.select(id_col, text_col), text_col, id_col,
            "decontaminate_spans", materialize_members=False,
        )
        unit = reps.select(
            F.col("rep_id").alias("_uid"), F.col("_text").alias("_utext")
        )
    else:
        unit = docs.select(
            F.col(id_col).alias("_uid"), F.col(text_col).alias("_utext")
        )
        members = None

    grams = _positional_gram_hashes(unit, n)
    probe_unit = probes.select(
        F.lit(0).alias("_uid"), F.col(probe_text_col).alias("_utext")
    )
    probe_set = _positional_gram_hashes(probe_unit, n).select("_gh").distinct()
    spans = _merged_interval_spans(
        grams.join(F.broadcast(probe_set), "_gh", "left_semi"), n
    )
    return _apply_span_removal(docs, spans, members, text_col, id_col)


def _positional_gram_hashes(unit: DataFrame, n: int) -> DataFrame:
    """(_uid, _utext) -> (_uid, _pos, _gh): 128-bit hash struct
    (`dedup.hash128`) of every positional length-n token window. The
    token array is projected to an ATTRIBUTE first (not inlined into
    the window lambda — the re-evaluation trap), and windows come from
    `zipped_ngrams` (n zips total, not a per-element slice)."""
    toked = unit.select("_uid", tokens("_utext").alias("_toks"))
    return toked.select(
        "_uid",
        F.posexplode(
            F.when(F.size("_toks") >= n, zipped_ngrams(F.col("_toks"), n))
            .otherwise(F.array().cast("array<string>"))
        ).alias("_pos", "_g"),
    ).select("_uid", "_pos", hash128(F.col("_g")).alias("_gh"))


def _merged_interval_spans(hits: DataFrame, n: int) -> DataFrame:
    """Per-unit merged removal intervals from hit windows (_uid, _pos):
    fold the sorted start set into [s, e) intervals with e = s + n,
    merging overlapping/touching runs. LAZY (r15): the span frame has
    exactly one consumer — `_apply_span_removal`'s left join (the
    affected-flag logic reads `_ivs` from the same joined row) — so
    the former materialization was a checkpoint round-trip + driver
    gap protecting nothing."""
    iv_type = "array<struct<s:int,e:int>>"
    zero = F.struct(
        F.array().cast(iv_type).alias("ivs"),
        F.lit(None).cast("int").alias("cs"),
        F.lit(None).cast("int").alias("ce"),
    )

    def _step(acc, p):
        fresh = acc["cs"].isNull()
        extend = p <= acc["ce"]
        closed = F.concat(
            acc["ivs"], F.array(F.struct(acc["cs"].alias("s"), acc["ce"].alias("e")))
        )
        return F.struct(
            F.when(fresh | extend, acc["ivs"]).otherwise(closed).alias("ivs"),
            F.when(extend, acc["cs"]).otherwise(p).alias("cs"),
            F.when(extend, F.greatest(acc["ce"], p + n))
            .otherwise(p + n)
            .alias("ce"),
        )

    def _finish(acc):
        return F.when(acc["cs"].isNull(), acc["ivs"]).otherwise(
            F.concat(
                acc["ivs"],
                F.array(F.struct(acc["cs"].alias("s"), acc["ce"].alias("e"))),
            )
        )

    return (
        hits.groupBy("_uid")
        .agg(F.sort_array(F.collect_set("_pos")).alias("_starts"))
        .select(
            "_uid",
            F.aggregate(F.col("_starts"), zero, _step, _finish).alias("_ivs"),
        )
    )


def _apply_span_removal(
    df: DataFrame,
    spans: DataFrame,
    members: DataFrame | None,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """Join per-unit intervals back to documents (via the membership
    frame when exact-collapsed) and rebuild affected texts: token
    filtering is O(tokens x merged-intervals) per doc."""
    text = F.col(text_col)
    if members is not None:
        attach = df.join(
            members.withColumnRenamed("rep_id", "_uid"),
            F.col(id_col) == F.col("member_id"),
        ).drop("member_id")
    else:
        attach = df.withColumn("_uid", F.col(id_col))

    out = attach.join(spans, "_uid", "left").withColumn(
        "_dtoks", tokens(text_col)
    )
    ivs = F.col("_ivs")
    kept = F.filter(
        F.col("_dtoks"),
        lambda t, i: ~F.exists(ivs, lambda iv: (i >= iv["s"]) & (i < iv["e"])),
    )
    return out.withColumns(
        {
            "n_tokens": F.size("_dtoks"),
            "n_tokens_removed": F.when(text.isNull(), F.lit(None).cast("int"))
            .when(
                ivs.isNotNull(),
                F.aggregate(
                    ivs, F.lit(0), lambda a, iv: a + iv["e"] - iv["s"]
                ),
            )
            .otherwise(F.lit(0)),
            "n_spans": F.when(text.isNull(), F.lit(None).cast("int"))
            .when(ivs.isNotNull(), F.size(ivs))
            .otherwise(F.lit(0)),
            text_col: F.when(ivs.isNull(), text).otherwise(
                F.array_join(kept, " ")
            ),
        }
    ).drop("_uid", "_ivs", "_dtoks")
