"""Entity resolution over id-mapping graphs (J12).

The reference attempted a GraphX Pregel walk over the id-mapping graph
(star/CustomerResolver.scala:26-100) and shipped it self-described as
"not ready" (line 14). Rebuild implements the *intent* — resolve every
id to a canonical entity across mapping tables — as iterative
DataFrame joins (connected components via label propagation to the
minimum id), which needs no graph library and scales as a sequence of
shuffles on uniformly-hashed keys.

Convergence: components' diameters in id-crosswalk graphs are tiny
(id→email→phone chains), so the loop usually terminates in 3-5
rounds; `max_iterations` bounds the worst case. Each round is one
join + aggregate; intermediate results are eagerly materialized (see
`operators.materialize` for the local-vs-reliable durability knob) to
cut the exponentially growing lineage.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from featurestore_spark.operators.materialize import materialize


def connected_components(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    max_iterations: int = 20,
    checkpoint_every: int = 2,
    probe_every: int = 2,
    shortcut_after: int = 5,
) -> DataFrame:
    """(id, component) — component = min id reachable (label
    propagation / "small-star" style contraction).

    `probe_every`: run the convergence-probe job only every k rounds.
    Labels are monotone non-increasing under min-propagation, so
    "unchanged since the last probe" ⇔ "no round in between changed
    anything" — probing across k rounds is exact, not a heuristic.
    Each skipped probe saves one Spark job; rounds still materialize
    every `checkpoint_every` so lineage stays flat either way. The
    default (2, matching probe_every) materializes exactly on probe
    rounds: per-round materialization was measured pure overhead
    (q_dedup_clusters 4.4s -> 3.6s at sf0.1), and the un-materialized
    lineage between probes is bounded at checkpoint_every rounds.

    `shortcut_after`: plain min-propagation advances labels ONE hop
    per round — a path of diameter D needs D rounds (measured: a
    10^4-node chain would run for hours; PLANS.md r5). From round
    `shortcut_after` onward each round adds a pointer-jumping step,
    comp(u) ← comp(comp(u)) — one extra self-join on the slim label
    frame that HALVES the remaining depth, so convergence is
    O(shortcut_after + log D). The threshold exists because the
    near-dup/crosswalk graphs this serves have tiny diameters and
    converge in 2-4 rounds — they never pay for the extra join
    (path-halving from round 0 was measured slower on exactly those
    graphs) — while anything still unconverged after `shortcut_after`
    rounds is deep and needs the logarithmic gear. 0 = always jump;
    a value ≥ max_iterations restores pure one-hop propagation.
    Jumps keep labels within the component and monotone
    non-increasing, so convergence probes and the fixed point are
    unchanged.

    Warns if `max_iterations` is exhausted while labels were still
    changing (component diameter > max_iterations): the returned
    labels are then PARTIAL — ids in one component may carry
    different labels. Raise `max_iterations` for deep graphs. The
    exhaustion probe compares the LAST round against the round before
    it (an iteration with no change is a fixed point), so a graph that
    converges exactly on the final round is not misreported as partial
    even when the change landed mid-probe-window (ADVICE r3).
    """
    if probe_every < 1:
        raise ValueError(f"probe_every must be >= 1, got {probe_every}")
    if checkpoint_every < 1:
        raise ValueError(
            f"checkpoint_every must be >= 1, got {checkpoint_every}"
        )
    # undirected: symmetrize once, then MATERIALIZE — every iteration
    # (and every convergence probe) joins against the edge list, and an
    # unmaterialized lineage would re-run the whole upstream pipeline
    # (e.g. shingle→minhash→LSH for dedup clustering) once per job.
    # Measured on q_dedup_clusters at sf0.1: 7.7s → materialized edges
    # make each round touch only the (tiny) vertex/edge frames.
    # Symmetrize with ONE pass over the edge lineage: a self-union's
    # two branches each execute the full upstream plan (ReuseExchange
    # does not fire across union branches), so when `edges` is a
    # computed pair list (LSH candidates + verify) the verify tail ran
    # twice inside the materialization job. explode(array(fwd, rev))
    # reads each input row once and emits both directions (r14).
    sym = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(src_col).alias("a"), F.col(dst_col).alias("b")
                    ),
                    F.struct(
                        F.col(dst_col).alias("a"), F.col(src_col).alias("b")
                    ),
                )
            ).alias("_e")
        )
        .select("_e.a", "_e.b")
        .distinct()
    )
    sym = materialize(sym)
    # Round 1 FUSED into initialization (r15, guide §2.4 "remove
    # shuffles outright"): labels₁(u) = min(u, min over neighbors) is
    # one groupBy over the symmetrized edges — the separate
    # node-distinct pass plus a full union+groupBy round the old
    # init+round-1 pair paid are gone. NULL ids keep a NULL label (a
    # NULL never joins as a neighbor, matching the old propagation).
    # `_chg` carries the round's convergence bit IN the frame: the
    # probe becomes a limit-1 scan of the materialized labels instead
    # of a labels⋈labels join job per probe (the r14 profile showed
    # the CC family spends ~half its wall in per-job driver gaps).
    labels = materialize(
        sym.groupBy("a")
        .agg(F.min("b").alias("_mb"))
        .select(
            F.col("a").alias("id"),
            F.when(
                F.col("a").isNotNull(), F.least("a", "_mb")
            ).alias("component"),
            (F.least("a", "_mb") < F.col("a")).alias("_chg"),
        )
    )

    def _changed(frame: DataFrame) -> bool:
        # one-round-exact under monotone min-propagation: "no label
        # changed in round k" ⇔ fixed point, regardless of earlier
        # rounds — so a per-round flag makes every probe exact.
        return bool(frame.where(F.col("_chg")).limit(1).count())

    converged = not _changed(labels)
    i = 1  # the fused init IS iteration 1
    while not converged and i < max_iterations:
        i += 1
        # each node adopts the min component among itself + neighbors;
        # the self rows carry their current component in `_old` so the
        # round's change flag falls out of the same aggregation
        neighbor_labels = (
            sym.join(
                labels.select(F.col("id").alias("b"), "component"), "b"
            )
            .select(
                F.col("a").alias("id"),
                "component",
                F.lit(None).cast(labels.schema["component"].dataType)
                .alias("_old"),
            )
        )
        new_labels = (
            labels.select("id", "component", F.col("component").alias("_old"))
            .unionByName(neighbor_labels)
            .groupBy("id")
            .agg(
                F.min("component").alias("component"),
                F.min("_old").alias("_old"),
            )
        )
        if i > shortcut_after:
            # pointer jump: comp(u) ← comp(comp(u)). Every label value
            # is itself a node id with a label row, so the mapping
            # join is total; the jump target is in u's component and
            # ≤ the current label (monotone). Halves remaining depth.
            new_labels = (
                new_labels.join(
                    new_labels.select(
                        F.col("id").alias("component"),
                        F.col("component").alias("_jump"),
                    ),
                    "component",
                )
                .select("id", F.col("_jump").alias("component"), "_old")
            )
        new_labels = new_labels.select(
            "id",
            "component",
            (F.col("component") < F.col("_old")).alias("_chg"),
        )
        final = i == max_iterations
        probing = i % probe_every == 0 or final
        # materialize BEFORE any probe so the probe job reads this
        # round's result instead of recomputing the join; the probe
        # itself is then a limit-1 scan of checkpointed partitions
        if i % checkpoint_every == 0 or probing:
            new_labels = materialize(new_labels)
        labels = new_labels
        if probing and not _changed(labels):
            converged = True
    labels = labels.select("id", "component")
    if not converged:
        warnings.warn(
            f"connected_components: max_iterations={max_iterations} "
            "exhausted before convergence — returned labels are partial "
            "(some components carry multiple labels); raise "
            "max_iterations for graphs with larger diameter",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels


def resolve_entities(
    mappings: DataFrame,
    *,
    src_col: str = "src_entity_id",
    dst_col: str = "dst_entity_id",
    confidence_col: str | None = "confidence",
    min_confidence: float = 0.0,
    max_iterations: int = 20,
    shortcut_after: int = 5,
) -> DataFrame:
    """Canonical entity per id across mapping tables: edges above the
    confidence floor, components labeled by min entity id.

    Returns (entity_id, canonical_id) for every id seen in a mapping
    (CustomerResolver intent: find the target id of type X reachable
    with confidence ≥ c; here: canonical representative + join back).
    `shortcut_after` forwards to `connected_components` (pointer
    jumping for deep crosswalk chains).
    """
    edges = mappings
    if confidence_col is not None and confidence_col in mappings.columns:
        edges = edges.where(F.col(confidence_col) >= min_confidence)
    comp = connected_components(
        edges.select(src_col, dst_col), src_col=src_col, dst_col=dst_col,
        max_iterations=max_iterations, shortcut_after=shortcut_after,
    )
    return comp.select(
        F.col("id").alias("entity_id"), F.col("component").alias("canonical_id")
    )
