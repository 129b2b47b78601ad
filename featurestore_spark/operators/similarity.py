"""Similarity search over embedding columns (`array<float>`).

- `cosine_topk`: brute-force exact top-k — the correctness baseline.
  Queries broadcast (they're the small side by construction);
  candidates stream. Dot products via `zip_with`+`aggregate`
  (JVM-side); per-query top-k via window `row_number`.
- `bucketed_ann_topk`: the scale path — sign-bit LSH bucketing on
  leading dimensions restricts each query to its own bucket
  (equi-join instead of cross product). With b bucket bits the
  candidate set shrinks ~2^b×; `multi_probe=True` raises recall by
  also probing every Hamming-1 neighbor bucket.
- `vector_norms` / `normalize`: shared helpers.

At 100 TB of embeddings the brute-force path is O(Q×N) — usable only
for small Q; the bucketed path is the default for pipeline-scale
joins. Corpus-scale near-dup pairs (`embedding_near_dups`) use seeded
random-hyperplane SRP-LSH banding (`srp_hyperplanes` /
`srp_band_codes`) with a `max_bucket` guard — the leading-sign-bit
`sign_bucket` stays as the cheap variant for query-bounded ANN and
centroid seeding, where candidate work is bounded by the broadcast
query side rather than quadratic in the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from featurestore_spark.operators.dedup import member_side
from featurestore_spark.operators.materialize import materialize


def as_double_array(col: str | Column) -> Column:
    """array<numeric> → array<double> via the NATIVE array cast, not
    a per-element `transform`: Cast is codegen'd and — unlike an HOF
    — stays cheap even when Catalyst duplicates it into inferred
    size/notnull filters under a Generate (the q_ivf_topk/q_ivf_serve
    plan_audit entries this replaced, VERDICT r12 #8; the melt FENCE
    was measured slower, PLANS.md r12 — de-HOFing the expression
    clears the flag without adding a Generate)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column, decimals: int | None = 6) -> Column:
    c = dot(a, b) / (norm(a) * norm(b))
    return F.round(c, decimals) if decimals is not None else c


def cosine_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int,
    *,
    query_id: str = "query_id",
    cand_id: str = "neighbor_id",
    query_vec: str = "qv",
    cand_vec: str = "cv",
) -> DataFrame:
    """Exact brute-force cosine top-k; queries broadcast.

    Norms are hoisted to each side before the cross join (bit-identical
    to per-pair cosine: sqrt(dot(v,v)) has the same input either way)."""
    q = queries.withColumn("_qn", norm(F.col(query_vec)))
    c = candidates.withColumn("_cn", norm(F.col(cand_vec)))
    sims = c.crossJoin(F.broadcast(q)).select(
        query_id,
        cand_id,
        F.round(
            dot(F.col(query_vec), F.col(cand_vec)) / (F.col("_qn") * F.col("_cn")), 6
        ).alias("sim"),
    )
    w = Window.partitionBy(query_id).orderBy(F.col("sim").desc(), F.col(cand_id))
    return (
        sims.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select(query_id, "rnk", cand_id, "sim")
    )


SRP_QUANT_SCALE = 1000


def srp_hyperplanes(dim: int, n: int, seed: int = 42) -> list[list[int]]:
    """`n` deterministic pseudo-random hyperplanes with INTEGER
    components in [-100, 100], from a hand-rolled LCG — identical
    constants are reproducible in any engine (the DuckDB oracles
    inline them as literals), and integer components make the SRP
    sign test exact arithmetic (see `srp_band_codes`)."""
    s = seed & 0x7FFFFFFF
    out: list[list[int]] = []
    for _ in range(n):
        h = []
        for _ in range(dim):
            s = (1103515245 * s + 12345) % (1 << 31)
            h.append((s % 201) - 100)
        out.append(h)
    return out


def srp_band_codes(
    vec: Column, hyperplanes: list[list[int]], bits: int, bands: int
) -> Column:
    """array<int> of `bands` SRP (signed-random-projection) band codes
    for an array<float/double> column. Band b's code packs the sign
    bits of dot(quantize(v), h) over its `bits` hyperplanes:
    Σ_j (dot(q, h_{b·bits+j}) > 0) · 2^j, with q = round(v·1000).

    Arrow-batched numpy pandas_udf, same justification as SimHash
    (VERDICT r1): the pure-Column formulation is a ~3,000-literal
    nested higher-order-function tree that costs ~10s of driver-side
    plan processing per query (measured at sf0.1) — the numpy matmul
    is milliseconds. Exactness is engine-portable either way: the
    quantized vectors and integer hyperplanes make every dot product a
    sum of integer-valued float64 products bounded far below 2^53, so
    the result is EXACT (order-independent) and the DuckDB oracle
    reproduces the identical sign bits from inlined literals."""
    import numpy as np
    import pandas as pd

    if len(hyperplanes) != bits * bands:
        raise ValueError(f"need {bits * bands} hyperplanes, got {len(hyperplanes)}")
    hp = np.array(hyperplanes, dtype=np.float64)  # (bits*bands, dim)
    powers = 1 << np.arange(bits, dtype=np.int64)
    scale = SRP_QUANT_SCALE

    def codes(v):
        m = np.asarray(v.tolist(), dtype=np.float64)  # (n, dim)
        # HALF_UP rounding (away from zero) to match Spark/DuckDB round()
        x = m * scale
        q = np.sign(x) * np.floor(np.abs(x) + 0.5)
        d = q @ hp.T  # exact: integer-valued float64, |d| « 2^53
        b = (d > 0).astype(np.int64).reshape(len(m), bands, bits)
        out = (b @ powers).astype(np.int32)
        return pd.Series(list(out))

    # no type hints: the module's postponed annotations (PEP 563) are
    # strings pyspark's hint inference can't resolve; explicit Series
    # eval type via the legacy (function, returnType) form
    return F.pandas_udf(codes, "array<int>")(vec)


def sign_bucket(vec: Column, bits: int = 3) -> Column:
    """LSH bucket id from the sign bits of the first `bits` dims.

    Deterministic, engine-agnostic (SQL: (v[0]>0)*4 + (v[1]>0)*2 + …);
    for isotropic embeddings buckets are near-uniform.
    """
    out = F.lit(0)
    for i in range(bits):
        out = out + F.when(vec.getItem(i) > 0, F.lit(2 ** (bits - 1 - i))).otherwise(
            F.lit(0)
        )
    return out.cast("int")


def bucketed_ann_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int,
    *,
    bits: int = 3,
    multi_probe: bool = False,
    query_id: str = "query_id",
    cand_id: str = "neighbor_id",
    query_vec: str = "qv",
    cand_vec: str = "cv",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's sign
    bucket (equi-join on bucket id — shuffle keyed by bucket, no cross
    product).

    `multi_probe=True` is the recall knob (VERDICT r1): each query
    also probes every Hamming-1 neighbor bucket (one sign bit flipped
    — the buckets a near-boundary neighbor most likely fell into), so
    the candidate set grows (bits+1)× while staying bucket-bounded.
    Probe buckets are distinct, so no (query, candidate) pair repeats.
    """
    q = queries.withColumn("_bkt", sign_bucket(F.col(query_vec), bits)).withColumn(
        "_qn", norm(F.col(query_vec))
    )
    if multi_probe:
        probes = F.array(
            F.col("_bkt"),
            *[F.col("_bkt").bitwiseXOR(F.lit(1 << i)) for i in range(bits)],
        )
        q = q.withColumn("_bkt", F.explode(probes))
    c = candidates.withColumn("_bkt", sign_bucket(F.col(cand_vec), bits)).withColumn(
        "_cn", norm(F.col(cand_vec))
    )
    sims = c.join(F.broadcast(q), "_bkt").select(
        query_id,
        cand_id,
        F.round(
            dot(F.col(query_vec), F.col(cand_vec)) / (F.col("_qn") * F.col("_cn")), 6
        ).alias("sim"),
    )
    w = Window.partitionBy(query_id).orderBy(F.col("sim").desc(), F.col(cand_id))
    return (
        sims.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select(query_id, "rnk", cand_id, "sim")
    )


def train_centroids(
    df: DataFrame,
    n_centroids: int = 16,
    *,
    vec_col: str = "embedding",
    iterations: int = 3,
    round_decimals: int | None = None,
) -> DataFrame:
    """Deterministic Lloyd-style centroids for IVF: seed from sign
    buckets (engine-agnostic), refine with mean-per-cluster rounds.

    All DataFrame ops: assignment = argmin over broadcast centroids;
    mean = `aggregate` element-wise sums / counts. Returns
    (centroid_id, centroid array<double>).

    ``round_decimals`` rounds each mean coordinate and each argmin
    distance — the cross-engine determinism knob (the
    q_temperature_mixture in-plan-thresholds pattern): float
    aggregation order differs between engines/partitionings by
    ~1 ulp, and rounding at 6 decimals makes the whole iterative fit
    replayable bit-for-bit by a SQL oracle with the iterations
    unrolled. No effect on recall at realistic embedding scales;
    leave None when no oracle is in the loop.
    """
    bits = max(1, (n_centroids - 1).bit_length())
    # Row id only disambiguates duplicate vectors in the argmin group
    # key — each row's assignment depends solely on its vector, so the
    # resulting means are id-independent (safe under task retry).
    base = df.select(as_double_array(vec_col).alias("v")).withColumn(
        "_rid", F.monotonically_increasing_id()
    )
    seeded = base.withColumn(
        "centroid_id", sign_bucket(F.col("v"), bits) % n_centroids
    )
    for _ in range(iterations):
        cents = _mean_vectors(seeded, "centroid_id", "v", round_decimals)
        seeded = _assign_nearest(
            base, cents, "_rid", round_decimals=round_decimals
        )
    return _mean_vectors(seeded, "centroid_id", "v", round_decimals)


def _mean_vectors(
    df: DataFrame,
    key_col: str,
    vec_col: str,
    round_decimals: int | None = None,
) -> DataFrame:
    """Element-wise mean vector per key. posexplode → per-(key, dim)
    partial sums → reassemble ordered array: bounded memory per group
    (a collect_list-of-vectors fold would buffer whole clusters)."""
    ex = df.select(key_col, F.posexplode(vec_col).alias("pos", "val"))
    mean = F.avg("val")
    if round_decimals is not None:
        mean = F.round(mean, round_decimals)
    per_dim = ex.groupBy(key_col, "pos").agg(mean.alias("mean"))
    return per_dim.groupBy(key_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "mean"))),
            lambda s: s.getField("mean"),
        ).alias("centroid")
    )


def _assign_nearest(
    base: DataFrame,
    centroids: DataFrame,
    id_col: str,
    *,
    round_decimals: int | None = None,
) -> DataFrame:
    """argmin centroid per row: broadcast cross join + `min_by` keyed
    on `id_col` — the shuffle key is the scalar row id, never the
    vector array (r1 windowed `PARTITION BY v`, VERDICT §wrong #3).
    Returns (id_col, v, centroid_id); ties break on centroid_id."""
    d = F.aggregate(
        F.zip_with(F.col("v"), F.col("centroid"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    if round_decimals is not None:
        d = F.round(d, round_decimals)
    sims = base.crossJoin(F.broadcast(centroids)).withColumn("_d", d)
    best = sims.groupBy(id_col).agg(
        F.min_by(
            F.struct(F.col("centroid_id"), F.col("v")),
            F.struct(F.col("_d"), F.col("centroid_id")),
        ).alias("_best")
    )
    return best.select(
        id_col,
        F.col("_best.v").alias("v"),
        F.col("_best.centroid_id").alias("centroid_id"),
    )


def ivf_topk(
    queries: DataFrame,
    candidates: DataFrame,
    centroids: DataFrame,
    k: int,
    *,
    n_probe: int = 1,
    query_id: str = "query_id",
    cand_id: str = "neighbor_id",
    query_vec: str = "qv",
    cand_vec: str = "cv",
    round_decimals: int | None = None,
) -> DataFrame:
    """IVF search: candidates pre-assigned to their nearest centroid;
    each query probes its `n_probe` nearest centroid lists only. The
    join is an equi-join on centroid_id — at 100 TB the candidate side
    is bucketed/partitioned by centroid_id on disk and only probed
    lists are scanned. ``round_decimals`` rounds the assignment/probe
    distances (see `train_centroids` — the oracle-replay knob)."""
    # id threaded through the assignment — the vector rides along, so
    # no re-join (r1 re-joined on array equality; duplicate vectors
    # cross-multiplied, VERDICT §wrong #3).
    qd = F.aggregate(
        F.zip_with(
            F.col(query_vec), F.col("centroid"), lambda a, b: (a - b) * (a - b)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    if round_decimals is not None:
        qd = F.round(qd, round_decimals)
    cand_assigned = _assign_nearest(
        candidates.select(F.col(cand_id), F.col(cand_vec).alias("v")),
        centroids,
        cand_id,
        round_decimals=round_decimals,
    ).withColumnRenamed("v", cand_vec)
    q_assigned = (
        queries.crossJoin(F.broadcast(centroids))
        .withColumn("_d", qd)
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy(query_id).orderBy(F.col("_d"), F.col("centroid_id"))
            ),
        )
        .where(F.col("_rn") <= n_probe)
        .select(query_id, query_vec, "centroid_id")
    )
    sims = cand_assigned.join(F.broadcast(q_assigned), "centroid_id").select(
        query_id,
        cand_id,
        cosine(F.col(query_vec), F.col(cand_vec)).alias("sim"),
    )
    w = Window.partitionBy(query_id).orderBy(F.col("sim").desc(), F.col(cand_id))
    return (
        sims.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select(query_id, "rnk", cand_id, "sim")
    )


def vector_hash_frames(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(member_id, v, _h1, _h2) over non-null vectors — the shared
    front of the exact-vector collapse (two seeded xxhash64 longs over
    the double array; the exchange carries two longs, not the array).
    Null vectors are dropped: they have no similarity to anything."""
    return (
        df.where(F.col(vec_col).isNotNull())
        .select(
            F.col(id_col).alias("member_id"),
            as_double_array(vec_col).alias("v"),
        )
        .select(
            "member_id",
            "v",
            F.xxhash64("v").alias("_h1"),
            F.xxhash64(F.lit(0x9E3779B9), F.col("v")).alias("_h2"),
        )
    )


def collapse_exact_vectors(
    hashed: DataFrame, op_name: str, *, rep_col: str = "rep_id"
) -> DataFrame:
    """(rep_col, v, _h1, _h2): one row per DISTINCT vector, minimum
    member id as representative. The 128-bit scalar-hash group is
    VERIFIED in-group (min ⇔ max over the orderable array, null-safe);
    a cross-vector collision — ~n²/2^129, never in practice — raises
    rather than silently merging distinct vectors. Shared by
    `embedding_near_dups` and the incremental against-index operators
    (`operators/incremental.py`) so the hash scheme cannot drift
    between them."""
    return (
        hashed.groupBy("_h1", "_h2")
        .agg(
            F.min("member_id").alias(rep_col),
            F.min("v").alias("v"),
            F.max("v").alias("_vmax"),
        )
        .withColumn(
            "v",
            F.when(F.col("v").eqNullSafe(F.col("_vmax")), F.col("v")).otherwise(
                F.raise_error(
                    F.lit(
                        f"{op_name}: 128-bit vector-hash collision "
                        "on distinct vectors"
                    )
                )
            ),
        )
        .drop("_vmax")
    )


def embedding_near_dups(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    bits: int = 8,
    bands: int = 6,
    seed: int = 42,
    max_bucket: int = 1000,
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via seeded random-
    hyperplane (SRP) LSH banding: a pair is a candidate when it shares
    all `bits` projection signs in at least one of `bands` bands —
    P(candidate) = 1 - (1 - p^bits)^bands with p = 1 - θ/π, so high-
    cosine pairs survive (cos ≥ 0.95 → ~0.97 at 8×6) while the bucket
    count per band is 2^bits (256), keeping in-bucket pair work
    ~bands/2^bits of the all-pairs product. Buckets larger than
    `max_bucket` are dropped — the same quadratic-blowup guard as
    MinHash banding (`dedup.py` minhash_candidate_pairs). Sign bits
    use integer-quantized vectors × integer hyperplanes: exact
    arithmetic, reproducible in any engine (the oracle inlines the
    same constants).

    Scale design (the 10x key-shifted stress exposed this): real
    corpora are dominated by EXACT duplicates, which make the in-bucket
    pair count quadratic in the duplication factor. So the pair join
    runs over DISTINCT vectors only (grouped by a 128-bit scalar hash
    of the vector — ties verified in-group, min id as
    representative), and member ids are expanded back afterwards —
    pair work shrinks by the square of the duplication factor. The
    banding melt carries only (rep_id, band_idx, code); vectors join
    back on the scalar rep_id. Exact-duplicate (intra-group) pairs are
    emitted unconditionally — identical vectors are near-dups by
    definition and must not depend on bucket caps."""
    # null vectors have no similarity to anything — drop them up front
    # (they would otherwise reach the SRP UDF and crash batch-wide)
    base = df.where(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("member_id"), as_double_array(vec_col).alias("v")
    )
    if dim is None:
        row = base.select(F.size("v")).first()
        dim = row[0] if row is not None else 1  # empty corpus: any dim
    # Exact-dup collapse keyed by a 128-bit scalar hash of the vector
    # (two independently-seeded xxhash64 longs) instead of the full
    # array: the exchange and hash-agg comparisons carry two longs,
    # not an arbitrary-width array, while map-side partial aggregation
    # still collapses duplicates before the shuffle. A cross-vector
    # collision needs both 64-bit hashes to agree (~n^2/2^129 — never
    # at any corpus size) and is still VERIFIED inside each group
    # (min ⇔ max over the orderable array, null-safe) — a violation
    # raises rather than silently merging distinct vectors. Membership
    # is a (rep_id, member_id) FRAME, not a per-group collect_list
    # array (VERDICT r4 #1): a corpus with 10^6+ copies of one vector
    # would otherwise put the whole group into a single aggregation
    # row; as a frame it streams through joins.
    hashed = base.select(
        "member_id",
        "v",
        F.xxhash64("v").alias("_h1"),
        F.xxhash64(F.lit(0x9E3779B9), F.col("v")).alias("_h2"),
    )
    # reps feeds FOUR consumers (band coding, both pair-join sides,
    # intra-group pairs) and the executed plan shows no exchange
    # reuse across them — materialize once instead of recomputing
    # the scan+hash+collapse per consumer. Measured at sf0.1:
    # near_dups 2.15s -> 1.36s, clusters 4.19s -> 3.42s. Makes the
    # operator eager at construction (same pattern as
    # sampling.token_budget_sample's slim frame).
    reps = materialize(
        collapse_exact_vectors(hashed, "embedding_near_dups").withColumn(
            "_nrm", norm(F.col("v"))
        )
    )
    members = materialize(
        hashed.select("member_id", "_h1", "_h2")
        .join(reps.select("_h1", "_h2", "rep_id"), ["_h1", "_h2"])
        .select("rep_id", "member_id")
    )
    reps = reps.drop("_h1", "_h2")
    hp = srp_hyperplanes(dim, bits * bands, seed)
    # The reps checkpoint freezes AQE's one-partition coalescing at
    # small scale, so the SRP UDF runs single-task — but re-widening
    # here (fan_out(reps), the dedup-family pattern) was MEASURED as a
    # 2x regression at sf0.1 (near_dups 2.40 -> 5.39s median, clusters
    # 6.11 -> 6.32s, quiet host, r15): the numpy matmul is milliseconds
    # and everything downstream (posexplode + bucket window + banding
    # self-join) is shuffle-bound, exactly the profile where the
    # refinedweb re-widener also lost. Rule: re-widen a frozen
    # checkpoint only when per-row compute dominates downstream.
    coded = reps.select(
        "rep_id", srp_band_codes(F.col("v"), hp, bits, bands).alias("_codes")
    )
    melted = coded.select("rep_id", F.posexplode("_codes").alias("band_idx", "_code"))
    # window COUNT + self-join, never a collect_list bucket array (see
    # minhash_candidate_pairs: the array would materialize in one row
    # BEFORE the size filter); materialized so the SRP UDF runs once —
    # ReuseExchange does not fire across the self-join's sides.
    wb = Window.partitionBy("band_idx", "_code")
    inb = materialize(
        melted.withColumn("_bn", F.count(F.lit(1)).over(wb)).where(
            (F.col("_bn") >= 2) & (F.col("_bn") <= max_bucket)
        )
    )
    cand = (
        inb.select("band_idx", "_code", F.col("rep_id").alias("ra"))
        .join(inb.select("band_idx", "_code", F.col("rep_id").alias("rb")),
              ["band_idx", "_code"])
        .where(F.col("ra") < F.col("rb"))
        .select("ra", "rb")
        .distinct()
    )
    a = reps.select(
        F.col("rep_id").alias("ra"),
        F.col("v").alias("va"),
        F.col("_nrm").alias("na"),
    )
    b = reps.select(
        F.col("rep_id").alias("rb"),
        F.col("v").alias("vb"),
        F.col("_nrm").alias("nb"),
    )
    inter = (
        cand.join(a, "ra")
        .join(b, "rb")
        .withColumn(
            "sim",
            F.round(dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6),
        )
        .where(F.col("sim") >= threshold)
        .select("ra", "rb", "sim")
        .join(member_side(members, "ra", "xa"), "ra")
        .join(member_side(members, "rb", "xb"), "rb")
        .select(
            F.least("xa", "xb").alias("a_id"),
            F.greatest("xa", "xb").alias("b_id"),
            "sim",
        )
    )
    # pairs WITHIN an exact-duplicate group: same expression the naive
    # join would evaluate for two identical vectors (≈1.0, NaN-safe);
    # expanded by a membership self-join, never a per-group array
    intra_sims = reps.withColumn(
        "sim",
        F.round(dot(F.col("v"), F.col("v")) / (F.col("_nrm") * F.col("_nrm")), 6),
    ).where(F.col("sim") >= threshold)
    intra = (
        member_side(members, "rep_id", "xa")
        .join(intra_sims.select("rep_id", "sim"), "rep_id")
        .join(member_side(members, "rep_id", "xb"), "rep_id")
        .where(F.col("xa") < F.col("xb"))
        .select(F.col("xa").alias("a_id"), F.col("xb").alias("b_id"), "sim")
    )
    return inter.unionByName(intra)


def assign_to_centroids(
    df: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
    centroid_vec_col: str = "centroid",
    decimals: int = 6,
) -> DataFrame:
    """Nearest-centroid assignment against a FIXED centroid table:
    (id, centroid_id, dist2). Squared-L2 distances are rounded to
    `decimals` before the argmin and ties break on the lowest centroid
    id — making the assignment reproducible in any engine (the
    q_ivf_assign oracle recomputes it in SQL), where raw-float argmin
    would be summation-order sensitive.

    Scale shape: centroid table broadcast, argmin = one `min(struct)`
    aggregate keyed on the scalar row id (never the vector array)."""
    base = df.select(F.col(id_col), as_double_array(vec_col).alias("_v"))
    cents = centroids.select(
        F.col(centroid_id_col).alias("_cid"),
        as_double_array(centroid_vec_col).alias("_cv"),
    )
    d2 = F.round(
        F.aggregate(
            F.zip_with(F.col("_v"), F.col("_cv"), lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        decimals,
    )
    best = (
        base.crossJoin(F.broadcast(cents))
        .withColumn("_d2", d2)
        .groupBy(id_col)
        .agg(
            F.min(
                F.struct(F.col("_d2").alias("d2"), F.col("_cid").alias("cid"))
            ).alias("_b")
        )
    )
    return best.select(
        F.col(id_col),
        F.col("_b.cid").alias(centroid_id_col),
        F.col("_b.d2").alias("dist2"),
    )
