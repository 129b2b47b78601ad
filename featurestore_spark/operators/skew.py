"""Skew and co-location utilities for cluster-scale joins.

- `salted_join`: explicit salting for power-law keys — replicate the
  small side `salt` ways, scatter the big side uniformly; the join key
  becomes (key, salt) so one hot key spreads over `salt` reducers.
  AQE's skew-join split handles *detected* skew after a shuffle
  materializes; salting prevents the hot partition from ever being
  built, and works for aggregations too (`salted_count`).
- `write_bucketed` / `read_bucketed`: persist a table bucketed by its
  join key so repeated joins/aggregations on that key are
  exchange-free (bucketing survives restarts; a `repartition` doesn't).

At 100 TB these are the difference between a straggler task holding
the job for hours and uniform completion.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _salt_column(df: DataFrame, salt: int) -> Column:
    """Uniform salt in [0, salt): hash of (row position, row content).

    `monotonically_increasing_id` = (partition id << 33) | row index —
    per-row entropy that differs even across identical duplicate rows.
    Content columns are mixed in so the salt stays well-spread even
    under single-partition inputs.

    Retry caveat: a position-derived salt replays identically on task
    retry ONLY when intra-partition row order is deterministic (file
    scans, narrow deterministic pipelines). Immediately downstream of a
    shuffle whose read order is not stable (`repartition()`, shuffled
    joins), a fetch-failure recomputation can reassign salts — the
    SPARK-23207 hazard class, which a pure content hash is immune to.
    Materialize the input (see `operators.materialize`) before salting
    if its order is not deterministic; the identical-duplicate
    scattering is worth that constraint (a content-only salt sends all
    copies of a hot duplicate row to one reducer, silently disabling
    the mitigation)."""
    return F.pmod(
        F.xxhash64(
            F.monotonically_increasing_id(),
            *[F.col(c) for c in df.columns],
        ),
        F.lit(salt),
    ).cast("int")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    *,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join with the big side's hot keys scattered over `salt` buckets.

    `small` is replicated `salt`× (explode over the salt range) — use
    only when small is genuinely small or the skew is worth the
    replication. Output matches a plain `big.join(small, on)` for
    `how` in (inner, left, left_semi): exactly one of the small side's
    replicas matches each big row. Right/full outer would emit each
    UNMATCHED small row salt× (every replica survives), so those modes
    are rejected rather than silently wrong (ADVICE r1).

    The salt mixes the row's physical position (partition id + row
    index via `monotonically_increasing_id`) with its content — never
    `rand()` — so a hot key scatters even when its rows are IDENTICAL
    duplicates, the dominant shape in dedup-bound corpora (a
    content-only salt sent all copies to one reducer, silently
    disabling the mitigation). Which salt a row draws never affects
    results: every small-side key exists at every salt value. The
    position term is deterministic under retry only when `big`'s
    intra-partition order is — see `_salt_column`'s retry caveat; for
    inputs straight out of a nondeterministic shuffle, materialize
    first.
    """
    if how not in ("inner", "left", "left_outer", "left_semi"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi, not {how!r}: "
            "outer-replicated small rows would duplicate"
        )
    salted_big = big.withColumn("_salt", _salt_column(big, salt))
    salted_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return salted_big.join(salted_small, [on, "_salt"], how).drop("_salt")


def salted_count(
    df: DataFrame,
    keys: list[str],
    *,
    salt: int = 16,
    count_col: str = "n",
) -> DataFrame:
    """Two-phase count for skewed group keys: partial count per
    (key, salt), then final sum per key — the hot key's rows are
    pre-combined across `salt` reducers before the final (small)
    shuffle. Spark's hash aggregate already does map-side partials;
    salting additionally splits the REDUCE side of a hot key."""
    partial = (
        df.withColumn("_salt", _salt_column(df, salt))
        .groupBy(*keys, "_salt")
        .agg(F.count(F.lit(1)).alias("_pc"))
    )
    return partial.groupBy(*keys).agg(F.sum("_pc").cast("bigint").alias(count_col))


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    *,
    sort_cols: list[str] | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist bucketed (and optionally sorted) by the join key:
    subsequent equi-joins / groupBys on `bucket_cols` between tables
    with matching bucketing run with NO exchange — the shuffle is
    paid once at write time and amortized over every later join
    (this is the primitive the against-index docstrings' "persist
    bucketed by <key>" notes point at). Requires `saveAsTable`:
    bucket metadata lives in the catalog, `parquet(path)` has
    nowhere to put it. Pick `n_buckets` so one bucket's share fits
    task memory at full scale — buckets are the parallelism FLOOR
    for later scans."""
    if n_buckets < 1:
        raise ValueError(
            f"write_bucketed: n_buckets must be >= 1: {n_buckets}"
        )
    if not bucket_cols:
        raise ValueError("write_bucketed: need at least one bucket column")
    writer = df.write.mode(mode).format(fmt).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        # external table at a caller-owned location: the data lives
        # where the caller can provably clean it up (BucketedMirror
        # keeps its mirrors under the loader's own base instead of a
        # GUESSED warehouse location — ADVICE r12)
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


class BucketedTableSink:
    """Sink-protocol wrapper over :func:`write_bucketed` (ctx keys:
    `table`, `bucket_cols`, `n_buckets`, optional `sort_cols` /
    `fmt` / `mode`) — drops into transform pipelines like
    CSVSink/ParquetSink."""

    def __call__(self, df: DataFrame, ctx) -> DataFrame:
        write_bucketed(
            df,
            ctx["table"],
            ctx["bucket_cols"],
            ctx["n_buckets"],
            sort_cols=ctx.get("sort_cols"),
            fmt=ctx.get("fmt", "parquet"),
            mode=ctx.get("mode", "overwrite"),
        )
        return df

    def apply(self, df, ctx):
        return self(df, ctx)


class BucketedMirror:
    """Shared bucketed-mirror machinery for the merge loaders
    (VaultLoader.bucket_current / StarLoader.bucket_dims): a catalog
    table bucketed+sorted by the merge join key, maintained alongside
    a path-based source of truth so repeated merge batches get
    co-located joins.

    Crash-safety contract (one place, both loaders): the mirror is
    DROPPED before the caller swaps its path data and REWRITTEN after
    — so at every crash point an EXISTING mirror written by a
    mirror-enabled loader is in sync with the path (a missing mirror
    just falls back to the path read, never a stale snapshot). The
    drop also clears the mirror's data location, so a crash
    mid-`saveAsTable` cannot orphan files that would fail every later
    refresh.

    That drop-before-swap discipline only covers writers that HAVE
    the knob enabled — a plain loader over the same base, or any
    external job rewriting the path, updates the source of truth
    without touching the mirror. So `refresh` additionally stamps a
    snapshot FINGERPRINT of the path data (mtime + byte count, see
    `HadoopFS.fingerprint`) into the mirror's table properties, and
    `read` verifies it against the path's current value before
    serving — a mirror that no longer matches is skipped (path read
    wins), never silently served stale (ADVICE r12, medium).

    The mirror data lives UNDER THE LOADER'S OWN BASE
    (`{base}/_mirror/{table}`, an external table) — not at a guessed
    warehouse location — so `drop`'s cleanup provably owns what it
    deletes and works under any current database / custom warehouse
    layout (ADVICE r12, low). Table names additionally embed an 8-hex
    digest of the base path — two loaders over different vaults in
    one metastore can never clobber (or silently serve) each other's
    mirror.

    `read` caches the bucket-layout verification per table name (the
    layout only changes through `refresh`/`drop` on this instance, so
    the DESCRIBE round-trip runs once); the fingerprint check runs on
    EVERY read — the path can change under any cache."""

    FINGERPRINT_PROP = "featurestore.mirror.fingerprint"

    def __init__(
        self,
        spark: SparkSession,
        prefix: str,
        base_path: str,
        n_buckets: int,
        fmt: str = "parquet",
    ):
        import hashlib
        import re as _re

        if n_buckets < 1:
            raise ValueError(
                f"BucketedMirror: n_buckets must be >= 1, got {n_buckets}"
            )
        self.spark = spark
        self.prefix = prefix
        self.base = base_path.rstrip("/")
        self.digest = hashlib.md5(base_path.encode()).hexdigest()[:8]
        self.n_buckets = n_buckets
        self.fmt = fmt
        self._sanitize = lambda s: _re.sub(r"[^A-Za-z0-9_]", "_", s)
        self._verified: dict[str, bool] = {}

    def table_for(self, name: str) -> str:
        return f"{self.prefix}{self._sanitize(name)}_{self.digest}_current"

    def _location(self, t: str) -> str:
        # loader-owned, not warehouse-guessed: cleanup targets a path
        # this mirror provably created (ADVICE r12)
        return f"{self.base}/_mirror/{t.lower()}"

    def drop(self, name: str) -> None:
        from featurestore_spark.io.fs import HadoopFS

        t = self.table_for(name)
        self._verified.pop(t, None)
        self.spark.sql(f"DROP TABLE IF EXISTS {t}")
        # the mirror is an EXTERNAL table (drop leaves its files), and
        # a crash mid-saveAsTable leaves files with no catalog entry;
        # clearing the loader-owned location here keeps refresh
        # retryable instead of failing 'location already exists'
        fs = HadoopFS(self.spark)
        loc = self._location(t)
        if fs.exists(loc):
            fs.delete(loc)

    def refresh(
        self,
        name: str,
        frame: DataFrame,
        keys: list[str],
        fingerprint: str | None = None,
    ) -> None:
        """Rebuild the mirror from `frame` and stamp `fingerprint`
        (the path source of truth's snapshot identity at refresh
        time) into the table properties — `read` refuses to serve a
        mirror whose stamp no longer matches the path."""
        t = self.table_for(name)
        self.drop(name)
        write_bucketed(
            frame, t, keys, self.n_buckets,
            sort_cols=keys, fmt=self.fmt, mode="errorifexists",
            path=self._location(t),
        )
        if fingerprint is not None:
            self.spark.sql(
                f"ALTER TABLE {t} SET TBLPROPERTIES "
                f"('{self.FINGERPRINT_PROP}'='{fingerprint}')"
            )
        self._verified[t] = True

    def _stamped(self, t: str) -> str | None:
        rows = self.spark.sql(f"SHOW TBLPROPERTIES {t}").collect()
        props = {r["key"]: r["value"] for r in rows}
        return props.get(self.FINGERPRINT_PROP)

    def read(self, name: str, keys_of, fingerprint: str | None = None) -> DataFrame | None:
        """The mirror frame when it exists, carries the expected
        bucket layout, AND (when `fingerprint` is given) its stamped
        snapshot identity matches the path source of truth's current
        one — else None (caller falls back to its path read).
        ``keys_of(columns)`` maps the mirror's columns to the expected
        bucket keys (or None for un-mirrorable frames). The layout
        check is cached per table; the fingerprint check runs every
        read (an external writer can change the path at any time)."""
        t = self.table_for(name)
        if not self._verified.get(t):
            if not self.spark.catalog.tableExists(t):
                return None
            keys = keys_of(self.spark.table(t).columns)
            if keys is None or not is_bucketed_on(self.spark, t, keys):
                return None
            self._verified[t] = True
        if fingerprint is not None and self._stamped(t) != fingerprint:
            return None
        return self.spark.table(t)


def is_bucketed_on(
    spark: SparkSession, table: str, bucket_cols: list[str]
) -> bool:
    """True when `table`'s catalog metadata buckets by exactly
    `bucket_cols` (order-sensitive — bucket pruning and join
    co-location key on the full tuple). Guard an against-index
    table's probe with this before assuming its layout."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    meta = {r["col_name"]: r["data_type"] for r in rows}
    cols = meta.get("Bucket Columns", "")
    want = ", ".join(f"`{c}`" for c in bucket_cols)
    return cols.strip("[]") == want
