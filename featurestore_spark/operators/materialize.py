"""Eager materialization barrier with a cluster-durability knob.

Several operators (exact-dup collapse, SRP rep frames, global_ntile's
ranked frame, connected-components rounds, token_budget_sample's slim
frame) materialize an intermediate DataFrame because it fans out to
multiple consumers, feeds an iterative loop, or must yield CONSISTENT
nondeterministic values (`monotonically_increasing_id`) across two
jobs. `materialize()` is the single switch point for HOW that happens,
selected by the Spark conf `spark.featurestore.materialize`:

- ``local`` (default): `localCheckpoint(eager=True)`. Fastest — blocks
  live in executor storage — but NON-REPLICATED and lineage-truncating:
  on a real cluster, losing one executor mid-operator makes the blocks
  unrecoverable and fails the job. The right default for local[*]
  testing and short-lived jobs.
- ``reliable``: `checkpoint(eager=True)` to the SparkContext checkpoint
  directory (call `sc.setCheckpointDir("hdfs://...")` first). Survives
  any executor loss; costs a write to distributed storage. The right
  mode for 100-TB runs where an operator holds materialized state for
  minutes-to-hours.
- ``disk``: `persist(StorageLevel.DISK_ONLY_2)` + a forcing count.
  Two on-cluster replicas AND intact lineage — a lost block is served
  from the replica or recomputed — with no external storage dependency.
  Note lineage is NOT truncated, so iterative callers (connected
  components) re-analyze a growing plan each round; fine for the
  bounded round counts used here.

Set once on the session::

    spark.conf.set("spark.featurestore.materialize", "reliable")
    spark.sparkContext.setCheckpointDir("hdfs:///tmp/fs_ckpt")

Every mode runs Spark jobs AT CALL TIME — see docs/usage.md
("Eager operators") for which operators trigger this.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

MATERIALIZE_CONF = "spark.featurestore.materialize"
_MODES = ("local", "reliable", "disk")


def materialize(df: DataFrame) -> DataFrame:
    """Eagerly materialize `df` per the session's durability mode."""
    mode = df.sparkSession.conf.get(MATERIALIZE_CONF, "local")
    if mode == "local":
        return df.localCheckpoint(eager=True)
    if mode == "reliable":
        sc = df.sparkSession.sparkContext
        if sc.getCheckpointDir() is None:
            raise ValueError(
                f"{MATERIALIZE_CONF}=reliable requires "
                "SparkContext.setCheckpointDir(...) to be set"
            )
        return df.checkpoint(eager=True)
    if mode == "disk":
        from pyspark import StorageLevel

        persisted = df.persist(StorageLevel.DISK_ONLY_2)
        persisted.count()  # force the blocks to exist now
        return persisted
    raise ValueError(
        f"unknown {MATERIALIZE_CONF}={mode!r}; expected one of {_MODES}"
    )
