"""Query catalog: every operator exposed as (Spark dataflow, DuckDB oracle).

This is the correctness surface the driver checks (SURVEY.md §2): each
entry pairs a PySpark implementation (built on the library operators)
with an equivalent ANSI-SQL string DuckDB runs on the same parquet
tables. Conventions keeping the two engines hash-identical:

- timestamps exported as `unix_micros` BIGINTs (`*_us` columns) —
  no timezone/format ambiguity (Spark `unix_micros` ≡ DuckDB `epoch_us`);
- literal time bounds are integer-micros (`timestamp_micros(lit)`), so
  the session timezone never parses a string;
- double aggregates rounded (2–6 dp) to absorb summation-order ulps;
- DuckDB `SUM(int)` → HUGEINT is cast to BIGINT; `row_number()` cast
  to INT to match Spark;
- every computed column aliased identically on both sides;
- SIGNED scores that can round to zero get `+ 0.0` after the final
  round on BOTH sides: a tiny negative value rounds to -0.0, the
  engines format signed zero differently ("0" vs "-0"), and IEEE
  `-0.0 + 0.0 == +0.0` normalizes it (first hit: q_quality_classify
  log-odds at sf0.1).
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timezone
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from featurestore_spark.functions.hashing import hash_key
from featurestore_spark.io import load_table
from featurestore_spark.operators import (
    count_events,
    count_unique_events,
    days_since_latest,
    extract_chords,
    paths,
    previous_interactions,
    previous_interactions_chord,
    sessionize,
    sum_events,
    unique_paths,
)
from featurestore_spark.operators.pivot import chord_pivot, snapshot_pivot
from featurestore_spark.operators.snapshot import latest_per_key


def _us(s: str) -> int:
    return int(datetime.fromisoformat(s).replace(tzinfo=timezone.utc).timestamp()) * 1_000_000


AS_OF = "2024-01-15 00:00:00"
WIN_START = "2024-01-10 00:00:00"
WIN_END = "2024-01-20 00:00:00"
FEB1 = "2024-02-01 00:00:00"
SESSION_TIMEOUT_S = 1800.0
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@dataclass
class QuerySpec:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    description: str = ""


QUERIES: dict[str, QuerySpec] = {}


def _register(name: str, oracle: str | None, description: str = ""):
    def deco(fn):
        QUERIES[name] = QuerySpec(name, fn, oracle, description)
        return fn

    return deco


def _events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


def _ts_lit(s: str):
    return F.timestamp_micros(F.lit(_us(s)))


# ---------------------------------------------------------------------------
# Event feature engineering (SURVEY.md §2.5, eventFunctions.scala)
# ---------------------------------------------------------------------------


@_register(
    "q_sessionize",
    f"""
    SELECT user_id, event_id, CAST(sess AS BIGINT) AS sess FROM (
      SELECT user_id, event_id,
             SUM(CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > {int(SESSION_TIMEOUT_S * 1e6)}
                 THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sess
      FROM (SELECT user_id, event_id, ts,
                   lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
            FROM events))
    """,
    "W1 sessionize: 30-min-timeout session ids per event",
)
def q_sessionize(spark, sf_dir):
    ev = _events(spark, sf_dir)
    out = sessionize(
        ev, SESSION_TIMEOUT_S, entity_col="user_id", ts_col="ts", tiebreak_cols=("event_id",)
    )
    return out.select("user_id", "event_id", F.col("session").alias("sess"))


@_register(
    "q_session_stats",
    f"""
    SELECT user_id, CAST(max(sess) AS BIGINT) AS n_sessions, count(*) AS n_events FROM (
      SELECT user_id,
             SUM(CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > {int(SESSION_TIMEOUT_S * 1e6)}
                 THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sess
      FROM (SELECT user_id, event_id, ts,
                   lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
            FROM events))
    GROUP BY user_id
    """,
    "W1 sessionize rollup: sessions + events per user",
)
def q_session_stats(spark, sf_dir):
    ev = _events(spark, sf_dir)
    s = sessionize(
        ev, SESSION_TIMEOUT_S, entity_col="user_id", ts_col="ts", tiebreak_cols=("event_id",)
    )
    return s.groupBy("user_id").agg(
        F.max("session").alias("n_sessions"), F.count(F.lit(1)).alias("n_events")
    )


@_register(
    "q_event_count_window",
    f"""
    SELECT user_id, count(*) AS n_purchases
    FROM events
    WHERE event_type = 'purchase'
      AND ts >= TIMESTAMP '{WIN_START}' AND ts <= TIMESTAMP '{WIN_END}'
    GROUP BY user_id
    """,
    "A3 count(eventType, start, end) per entity",
)
def q_event_count_window(spark, sf_dir):
    ev = _events(spark, sf_dir)
    return count_events(
        ev,
        "purchase",
        _ts_lit(WIN_START),
        _ts_lit(WIN_END),
        entity_col="user_id",
        type_col="event_type",
        ts_col="ts",
        out_col="n_purchases",
    )


@_register(
    "q_event_distinct_window",
    f"""
    SELECT user_id, count(DISTINCT value) AS n_unique
    FROM events
    WHERE event_type = 'view'
      AND ts >= TIMESTAMP '{WIN_START}' AND ts <= TIMESTAMP '{WIN_END}'
    GROUP BY user_id
    """,
    "A4 countUnique(eventType, start, end) per entity",
)
def q_event_distinct_window(spark, sf_dir):
    ev = _events(spark, sf_dir)
    return count_unique_events(
        ev,
        "view",
        _ts_lit(WIN_START),
        _ts_lit(WIN_END),
        entity_col="user_id",
        type_col="event_type",
        ts_col="ts",
        value_col="value",
        out_col="n_unique",
    )


@_register(
    "q_event_sum_window",
    f"""
    SELECT user_id, round(CAST(sum(value) AS DOUBLE), 2) AS total
    FROM events
    WHERE event_type = 'purchase'
      AND ts >= TIMESTAMP '{WIN_START}' AND ts <= TIMESTAMP '{WIN_END}'
    GROUP BY user_id
    """,
    "A5 sum(value) in window per entity",
)
def q_event_sum_window(spark, sf_dir):
    ev = _events(spark, sf_dir)
    out = sum_events(
        ev,
        "purchase",
        _ts_lit(WIN_START),
        _ts_lit(WIN_END),
        entity_col="user_id",
        type_col="event_type",
        ts_col="ts",
        value_col="value",
        out_col="_total",
    )
    return out.select("user_id", F.round("_total", 2).alias("total"))


@_register(
    "q_days_since_latest",
    f"""
    SELECT user_id,
           CAST(datediff('day', CAST(max(ts) AS DATE), DATE '{FEB1[:10]}') AS INTEGER) AS days_since
    FROM events
    WHERE event_type = 'purchase' AND ts <= TIMESTAMP '{FEB1}'
    GROUP BY user_id
    """,
    "A6 days since latest event per entity",
)
def q_days_since_latest(spark, sf_dir):
    ev = _events(spark, sf_dir)
    return days_since_latest(
        ev,
        "purchase",
        _ts_lit(FEB1),
        entity_col="user_id",
        type_col="event_type",
        ts_col="ts",
        out_col="days_since",
    )


@_register(
    "q_previous_interactions",
    f"""
    SELECT user_id, CAST(rn AS INTEGER) AS rn, event_id, event_type, epoch_us(ts) AS ts_us
    FROM (SELECT user_id, event_id, event_type, ts,
                 row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
          FROM events WHERE ts <= TIMESTAMP '{AS_OF}')
    WHERE rn <= 5
    """,
    "W2 previousInteractions(n=5, asof): latest-n event path",
)
def q_previous_interactions(spark, sf_dir):
    ev = _events(spark, sf_dir)
    out = previous_interactions(
        ev,
        n=5,
        as_of=_ts_lit(AS_OF),
        entity_col="user_id",
        ts_col="ts",
        tiebreak_cols=("event_id",),
    )
    return out.select(
        "user_id", "rn", "event_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )


@_register(
    "q_chords",
    """
    SELECT user_id,
           epoch_us(max(CASE WHEN event_type = 'purchase' THEN ts END)) AS chord_ts_us
    FROM events GROUP BY user_id
    """,
    "W6 extractChords: latest 'purchase' ts per entity, all entities kept",
)
def q_chords(spark, sf_dir):
    ev = _events(spark, sf_dir)
    out = extract_chords(
        ev, "purchase", entity_col="user_id", type_col="event_type", ts_col="ts"
    )
    return out.select("user_id", F.unix_micros("chord_ts").alias("chord_ts_us"))


@_register(
    "q_chord_path",
    f"""
    WITH bounded AS (SELECT * FROM events WHERE ts <= TIMESTAMP '{AS_OF}'),
    chord AS (SELECT user_id, max(ts) AS ch FROM bounded
              WHERE event_type = 'purchase' GROUP BY user_id),
    ranked AS (
      SELECT e.user_id, e.event_type, e.ts, e.event_id,
             row_number() OVER (PARTITION BY e.user_id ORDER BY e.ts DESC, e.event_id DESC) AS rn
      FROM bounded e JOIN chord c ON e.user_id = c.user_id AND e.ts <= c.ch)
    SELECT user_id, string_agg(event_type, ',' ORDER BY ts, event_id) AS path
    FROM ranked WHERE rn <= 10 GROUP BY user_id
    """,
    "W3+W7 chord-aligned top-10 path as comma-joined string",
)
def q_chord_path(spark, sf_dir):
    ev = _events(spark, sf_dir)
    aligned = previous_interactions_chord(
        ev,
        "purchase",
        n=10,
        as_of=_ts_lit(AS_OF),
        entity_col="user_id",
        type_col="event_type",
        ts_col="ts",
        tiebreak_cols=("event_id",),
    )
    return paths(
        aligned,
        entity_col="user_id",
        type_col="event_type",
        ts_col="ts",
        tiebreak_cols=("event_id",),
    )


@_register(
    "q_chord_path_all",
    f"""
    WITH bounded AS (SELECT * FROM events WHERE ts <= TIMESTAMP '{AS_OF}'),
    chord AS (SELECT user_id, max(ts) AS ch FROM bounded
              WHERE event_type = 'purchase' GROUP BY user_id),
    ranked AS (
      SELECT e.user_id, e.event_type, e.ts, e.event_id,
             row_number() OVER (PARTITION BY e.user_id ORDER BY e.ts DESC, e.event_id DESC) AS rn
      FROM bounded e JOIN chord c ON e.user_id = c.user_id AND e.ts <= c.ch),
    kept AS (
      SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
             CAST(rn AS INT) AS rn
      FROM ranked WHERE rn <= 10)
    SELECT u.user_id, k.event_type, k.ts_us, k.event_id, k.rn
    FROM (SELECT DISTINCT user_id FROM events) u
    LEFT JOIN kept k USING (user_id)
    """,
    "W3 keep_chordless: chord-aligned events, ALL entities retained",
)
def q_chord_path_all(spark, sf_dir):
    ev = _events(spark, sf_dir)
    aligned = previous_interactions_chord(
        ev,
        "purchase",
        n=10,
        as_of=_ts_lit(AS_OF),
        entity_col="user_id",
        type_col="event_type",
        ts_col="ts",
        tiebreak_cols=("event_id",),
        keep_chordless=True,
    )
    return aligned.select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        "rn",
    )


@_register(
    "q_unique_path",
    """
    WITH flagged AS (
      SELECT user_id, event_type, ts, event_id,
             CASE WHEN lag(event_type) OVER w IS NULL
                       OR lag(event_type) OVER w <> event_type
                  THEN 1 ELSE 0 END AS chg
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT user_id, string_agg(event_type, ',' ORDER BY ts, event_id) AS path
    FROM flagged WHERE chg = 1 GROUP BY user_id
    """,
    "W4/W7 uniquePaths: contiguous duplicate runs collapsed",
)
def q_unique_path(spark, sf_dir):
    ev = _events(spark, sf_dir)
    return unique_paths(
        ev,
        entity_col="user_id",
        type_col="event_type",
        ts_col="ts",
        tiebreak_cols=("event_id",),
    )


@_register(
    "q_current_events",
    """
    SELECT user_id, event_type, epoch_us(ts) AS ts_us, value
    FROM (SELECT user_id, event_type, ts, value,
                 row_number() OVER (PARTITION BY user_id, event_type
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
    WHERE rn = 1
    """,
    "W5/A2 latest state per (entity, attribute)",
)
def q_current_events(spark, sf_dir):
    ev = _events(spark, sf_dir)
    out = latest_per_key(ev, ["user_id", "event_type"], ["ts", "event_id"])
    return out.select("user_id", "event_type", F.unix_micros("ts").alias("ts_us"), "value")


def _pivot_oracle(bound_sql: str, features=None) -> str:
    cases = ",\n      ".join(
        f"max(CASE WHEN event_type = '{t}' THEN value END) AS {t}"
        for t in (features or EVENT_TYPES)
    )
    return f"""
    WITH latest AS (
      SELECT user_id, event_type, value
      FROM (SELECT user_id, event_type, value,
                   row_number() OVER (PARTITION BY user_id, event_type
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM ({bound_sql}))
      WHERE rn = 1)
    SELECT user_id, {cases}
    FROM latest GROUP BY user_id
    """


@_register(
    "q_pivot_snapshot",
    _pivot_oracle(f"SELECT * FROM events WHERE ts <= TIMESTAMP '{AS_OF}'"),
    "W8 EAVT->wide snapshot pivot at as_of",
)
def q_pivot_snapshot(spark, sf_dir):
    ev = _events(spark, sf_dir)
    return snapshot_pivot(
        ev,
        EVENT_TYPES,
        as_of=_ts_lit(AS_OF),
        entity_col="user_id",
        attr_col="event_type",
        ts_col="ts",
        value_col="value",
        tiebreak_cols=("event_id",),
    )


@_register(
    "q_pivot_chord",
    _pivot_oracle(
        """
        SELECT e.* FROM events e
        JOIN (SELECT user_id, max(ts) AS ch FROM events
              WHERE event_type = 'signup' GROUP BY user_id) c
          ON e.user_id = c.user_id AND e.ts <= c.ch
        """
    ),
    "W9 chord pivot: per-entity sync time = latest 'signup'",
)
def q_pivot_chord(spark, sf_dir):
    ev = _events(spark, sf_dir)
    return chord_pivot(
        ev,
        EVENT_TYPES,
        chord_attr="signup",
        entity_col="user_id",
        attr_col="event_type",
        ts_col="ts",
        value_col="value",
        tiebreak_cols=("event_id",),
    )


@_register(
    "q_days_since_earliest",
    f"""
    SELECT user_id,
           CAST(datediff('day', CAST(min(ts) AS DATE), DATE '{FEB1[:10]}') AS INTEGER) AS days_since
    FROM events
    WHERE event_type = 'signup' AND ts <= TIMESTAMP '{FEB1}'
    GROUP BY user_id
    """,
    "A6 days since earliest event per entity",
)
def q_days_since_earliest(spark, sf_dir):
    from featurestore_spark.operators import days_since_earliest

    ev = _events(spark, sf_dir)
    return days_since_earliest(
        ev,
        "signup",
        _ts_lit(FEB1),
        entity_col="user_id",
        type_col="event_type",
        ts_col="ts",
        out_col="days_since",
    )


@_register(
    "q_full_paths",
    """
    SELECT user_id, string_agg(event_type, ',' ORDER BY ts, event_id) AS path
    FROM events GROUP BY user_id
    """,
    "W7 paths: full per-entity event path, time-ordered",
)
def q_full_paths(spark, sf_dir):
    ev = _events(spark, sf_dir)
    return paths(
        ev,
        entity_col="user_id",
        type_col="event_type",
        ts_col="ts",
        tiebreak_cols=("event_id",),
    )


@_register(
    "q_collapse_runs",
    """
    WITH flagged AS (
      SELECT user_id, event_type, ts, event_id,
             CASE WHEN lag(event_type) OVER w IS NULL
                       OR lag(event_type) OVER w <> event_type
                  THEN 1 ELSE 0 END AS chg
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    runs AS (
      SELECT user_id, event_type, ts,
             SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS run_id
      FROM flagged)
    SELECT user_id, event_type, epoch_us(max(ts)) AS ts_us,
           count(*) AS run_count
    FROM runs GROUP BY user_id, event_type, run_id
    """,
    "W4 inner op: run-length encoding of contiguous event-type runs",
)
def q_collapse_runs(spark, sf_dir):
    from featurestore_spark.operators import collapse_runs

    ev = _events(spark, sf_dir)
    out = collapse_runs(
        ev,
        entity_col="user_id",
        type_col="event_type",
        ts_col="ts",
        tiebreak_cols=("event_id",),
    )
    return out.select(
        "user_id", "event_type", F.unix_micros("ts").alias("ts_us"), "run_count"
    )


@_register(
    "q_tpch_q6",
    """
    SELECT round(CAST(sum(l_extendedprice * l_discount) AS DOUBLE), 2) AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.02 AND 0.09
      AND l_quantity < 25
    """,
    "Forecast-revenue filter aggregate (pure scan + pushdown)",
)
def q_tpch_q6(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= _ts_lit("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < _ts_lit("1997-01-01 00:00:00"))
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.09)
            & (F.col("l_quantity") < 25)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@_register(
    "q_top_customers",
    """
    SELECT c_custkey, c_name,
           round(CAST(sum(o_totalprice) AS DOUBLE), 2) AS total_spend,
           count(*) AS n_orders
    FROM customer JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey, c_name
    ORDER BY total_spend DESC, c_custkey
    LIMIT 20
    """,
    "Top-k revenue entities (join + agg + ordered limit)",
)
def q_top_customers(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("total_spend"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy(F.col("total_spend").desc(), F.col("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Vault key-hash builds (SURVEY.md §2.8 M1/M3 core dataflows)
# ---------------------------------------------------------------------------


@_register(
    "q_hub_customer",
    """
    SELECT DISTINCT md5('customer' || CAST(c_custkey AS VARCHAR)) AS entity_id,
           'customer' AS id_type, c_custkey AS customer_id
    FROM customer
    """,
    "M1 loadHub key derivation: entity_id = md5(idType ++ naturalKey)",
)
def q_hub_customer(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        hash_key(F.lit("customer"), "c_custkey").alias("entity_id"),
        F.lit("customer").alias("id_type"),
        F.col("c_custkey").alias("customer_id"),
    ).distinct()


@_register(
    "q_link_customer_order",
    """
    SELECT DISTINCT md5('customer' || CAST(o_custkey AS VARCHAR)) AS src_entity_id,
           md5('order' || CAST(o_orderkey AS VARCHAR)) AS dst_entity_id
    FROM orders
    """,
    "M3 loadLink key derivation: hashed src/dst entity ids",
)
def q_link_customer_order(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        hash_key(F.lit("customer"), "o_custkey").alias("src_entity_id"),
        hash_key(F.lit("order"), "o_orderkey").alias("dst_entity_id"),
    ).distinct()


# fingerprint rendering: unit-separator field boundaries, record
# separator for nulls (functions/hashing.py FP_FIELD_SEP/FP_NULL_SENTINEL)
_SAT_VALUE_RENDER = (
    "concat_ws(chr(31), coalesce(CAST(c_name AS VARCHAR), chr(30)),"
    " coalesce(CAST(c_nationkey AS VARCHAR), chr(30)),"
    " coalesce(CAST({acctbal} AS VARCHAR), chr(30)),"
    " coalesce(CAST(c_mktsegment AS VARCHAR), chr(30)))"
)


@_register(
    "q_satellite_classify",
    f"""
    WITH incoming AS (
      SELECT md5('customer' || CAST(c_custkey AS VARCHAR)) AS entity_id,
             md5({_SAT_VALUE_RENDER.format(acctbal="c_acctbal")}) AS hashed_value
      FROM customer),
    existing AS (
      SELECT md5('customer' || CAST(c_custkey AS VARCHAR)) AS entity_id,
             md5({_SAT_VALUE_RENDER.format(
                 acctbal="c_acctbal + CASE WHEN c_custkey % 5 = 0 THEN 10.0 ELSE 0.0 END")}) AS hashed_value,
             1 AS version
      FROM customer WHERE c_custkey % 7 <> 0)
    SELECT i.entity_id, 'I' AS rectype, CAST(1 AS INTEGER) AS version
    FROM incoming i LEFT JOIN existing e ON i.entity_id = e.entity_id
    WHERE e.entity_id IS NULL
    UNION ALL
    SELECT i.entity_id, 'U' AS rectype, CAST(e.version + 1 AS INTEGER) AS version
    FROM incoming i JOIN existing e ON i.entity_id = e.entity_id
    WHERE i.hashed_value <> e.hashed_value
    """,
    "M2 satellite change classification (J1 inserts + J3 updates) on a "
    "simulated drifted current; exercises library classify_upserts",
)
def q_satellite_classify(spark, sf_dir):
    from featurestore_spark.functions.hashing import fingerprint
    from featurestore_spark.load import classify_upserts

    cust = load_table(spark, sf_dir, "customer")
    value_cols = ["c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]

    def enrich(df):
        return df.select(
            hash_key(F.lit("customer"), "c_custkey").alias("entity_id"),
            fingerprint(value_cols, "md5").alias("hashed_value"),
        )

    incoming = enrich(cust)
    # Simulated "current": key 0 mod 7 missing (→ inserts), acctbal
    # drifted for key 0 mod 5 (→ updates).
    existing = enrich(
        cust.where(F.col("c_custkey") % 7 != 0).withColumn(
            "c_acctbal",
            F.col("c_acctbal")
            + F.when(F.col("c_custkey") % 5 == 0, F.lit(10.0)).otherwise(F.lit(0.0)),
        )
    ).withColumn("version", F.lit(1))
    inserts, updates = classify_upserts(
        incoming,
        existing,
        key_col="entity_id",
        hash_col="hashed_value",
        version_col="version",
        rectype_col="rectype",
    )
    cols = ["entity_id", "rectype", "version"]
    return inserts.select(*cols).unionByName(updates.select(*cols))


@_register(
    "q_vault_full_cycle",
    """
    SELECT md5('customer' || CAST(c_custkey AS VARCHAR)) AS entity_id,
           CASE WHEN c_custkey % 5 = 0 THEN 'U' ELSE 'I' END AS rectype,
           CAST(CASE WHEN c_custkey % 5 = 0 THEN 2 ELSE 1 END AS INTEGER) AS version,
           round(CAST(c_acctbal
                 + CASE WHEN c_custkey % 5 = 0 THEN 10.0 ELSE 0.0 END AS DOUBLE), 2) AS acctbal,
           epoch_us(CASE WHEN c_custkey % 5 = 0
                    THEN TIMESTAMP '2024-01-02 00:00:00'
                    ELSE TIMESTAMP '2024-01-01 00:00:00' END) AS start_us
    FROM customer
    """,
    "M2 end-to-end: satellite full load + drifted delta through the real "
    "VaultLoader write path; current snapshot read back and checked",
)
def q_vault_full_cycle(spark, sf_dir):
    import tempfile

    from featurestore_spark.load import VaultLoader

    base = tempfile.mkdtemp(prefix="vault_cycle_")
    vl = VaultLoader(spark, base, fingerprint_method="md5", collect_counts=False)
    cust = load_table(spark, sf_dir, "customer")
    kwargs = dict(
        table="sat",
        entity_type="customer",
        id_fields=["c_custkey"],
        id_type="customer",
    )
    vl.load_satellite(cust, process_time="2024-01-01 00:00:00", **kwargs)
    drifted = cust.withColumn(
        "c_acctbal",
        F.col("c_acctbal")
        + F.when(F.col("c_custkey") % 5 == 0, F.lit(10.0)).otherwise(F.lit(0.0)),
    )
    vl.load_satellite(drifted, process_time="2024-01-02 00:00:00", **kwargs)
    return vl.read_current("sat").select(
        "entity_id",
        "rectype",
        "version",
        F.round("c_acctbal", 2).alias("acctbal"),
        F.unix_micros("start_time").alias("start_us"),
    )


# ---------------------------------------------------------------------------
# Analytics / star schema (SURVEY.md §2.4, §2.8 M8-M9)
# ---------------------------------------------------------------------------


@_register(
    "q_tpch_q1",
    """
    SELECT l_returnflag, l_linestatus,
           round(CAST(sum(l_quantity) AS DOUBLE), 2) AS sum_qty,
           round(CAST(sum(l_extendedprice) AS DOUBLE), 2) AS sum_base_price,
           round(CAST(sum(l_extendedprice * (1 - l_discount)) AS DOUBLE), 2) AS sum_disc_price,
           round(CAST(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS DOUBLE), 2) AS sum_charge,
           round(CAST(avg(l_quantity) AS DOUBLE), 4) AS avg_qty,
           round(CAST(avg(l_extendedprice) AS DOUBLE), 4) AS avg_price,
           round(CAST(avg(l_discount) AS DOUBLE), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    "Pricing-summary aggregate (map-side partial agg, no join)",
)
def q_tpch_q1(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= _ts_lit("2001-09-01 00:00:00"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@_register(
    "q_tpch_q3",
    """
    SELECT l_orderkey,
           round(CAST(sum(l_extendedprice * (1 - l_discount)) AS DOUBLE), 2) AS revenue,
           epoch_us(o_orderdate) AS o_orderdate_us, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    "Shipping-priority top-10 (3-way join + agg + ordered limit)",
)
def q_tpch_q3(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cutoff = _ts_lit("1998-01-01 00:00:00")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .where((F.col("o_orderdate") < cutoff) & (F.col("l_shipdate") > cutoff))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select(
            "l_orderkey",
            "revenue",
            F.unix_micros("o_orderdate").alias("o_orderdate_us"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@_register(
    "q_tpch_q5",
    """
    SELECT n_name, round(CAST(sum(l_extendedprice * (1 - l_discount)) AS DOUBLE), 2) AS revenue
    FROM region JOIN nation ON n_regionkey = r_regionkey
                JOIN customer ON c_nationkey = n_nationkey
                JOIN orders ON o_custkey = c_custkey
                JOIN lineitem ON l_orderkey = o_orderkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
    "Local-supplier-volume style 5-way join; small dims broadcast",
)
def q_tpch_q5(spark, sf_dir):
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    dims = F.broadcast(
        region.where(F.col("r_name") == "ASIA").join(
            nation, nation.n_regionkey == region.r_regionkey
        )
    )
    return (
        cust.join(dims, cust.c_nationkey == dims.n_nationkey)
        .join(orders, orders.o_custkey == cust.c_custkey)
        .where(
            (F.col("o_orderdate") >= _ts_lit("1996-01-01 00:00:00"))
            & (F.col("o_orderdate") < _ts_lit("1998-01-01 00:00:00"))
        )
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


@_register(
    "q_star_dim_order_priority",
    """
    SELECT CAST(row_number() OVER (ORDER BY o_orderpriority) AS INTEGER) AS dim_id,
           o_orderpriority AS order_priority
    FROM (SELECT DISTINCT o_orderpriority FROM orders)
    """,
    "M8 star dim build: distinct values + deterministic surrogate id",
)
def q_star_dim_order_priority(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    from pyspark.sql import Window

    # global window is safe HERE: it runs over the post-distinct dim
    # values (5 rows; low-cardinality by definition of a dimension).
    # Large dims take the bucketed surrogate-id path in star/loader.py.
    w = Window.orderBy("o_orderpriority")
    return (
        orders.select("o_orderpriority")
        .distinct()
        .withColumn("dim_id", F.row_number().over(w))
        .select("dim_id", F.col("o_orderpriority").alias("order_priority"))
    )


@_register(
    "q_star_fact_order_counts",
    """
    WITH dim AS (
      SELECT CAST(row_number() OVER (ORDER BY o_orderpriority) AS INTEGER) AS dim_id,
             o_orderpriority AS order_priority
      FROM (SELECT DISTINCT o_orderpriority FROM orders))
    SELECT dim_id, count(*) AS n_orders,
           round(CAST(sum(o_totalprice) AS DOUBLE), 2) AS total_price
    FROM orders JOIN dim ON orders.o_orderpriority = dim.order_priority
    GROUP BY dim_id
    """,
    "M9 star fact FK resolution via broadcast dim join",
)
def q_star_fact_order_counts(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    dim = q_star_dim_order_priority(spark, sf_dir)
    return (
        orders.join(
            F.broadcast(dim), orders.o_orderpriority == dim.order_priority
        )
        .groupBy("dim_id")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


@_register(
    "q_pivot_registry",
    _pivot_oracle(
        f"SELECT * FROM events WHERE ts <= TIMESTAMP '{AS_OF}'",
        features=["click", "error", "purchase"],
    ),
    "T11+W8: snapshot pivot with columns driven by the feature registry",
)
def q_pivot_registry(spark, sf_dir):
    from featurestore_spark.store import Feature, FeatureStore

    fs = FeatureStore()
    for attr in ["click", "error", "purchase"]:
        fs.register_feature(Feature(attr, "Base", "events"))
    fs.register_feature(Feature("signup", "Base", "events", active=False))  # excluded
    ev = _events(spark, sf_dir)
    return snapshot_pivot(
        ev,
        fs.attribute_names("events"),
        as_of=_ts_lit(AS_OF),
        entity_col="user_id",
        attr_col="event_type",
        ts_col="ts",
        value_col="value",
        tiebreak_cols=("event_id",),
    )


@_register(
    "q_sniff_csv",
    """
    SELECT ',' AS delimiter, true AS has_header, 4 AS n_cols,
           'bigint' AS c0_type, 'double' AS c1_type, 'string' AS c2_type,
           'date' AS c3_type, 'dd/MM/yyyy' AS date_format
    """,
    "I1-I5: sniff a generated CSV head sample (incl. multi-format date"
    " detection); expected metadata as oracle",
)
def q_sniff_csv(spark, sf_dir):
    import tempfile

    from featurestore_spark.inference import sniff_file

    docs = load_table(spark, sf_dir, "documents").orderBy("doc_id").limit(50)
    rows = docs.select("doc_id", "n_chars", "lang").collect()
    tmp = tempfile.NamedTemporaryFile(
        suffix=".csv", mode="w", delete=False
    )
    tmp.close()
    path = tmp.name
    with open(path, "w") as f:
        f.write("doc_id,score,lang,loaded\n")
        for i, r in enumerate(rows):
            day, month = (i % 28) + 1, (i % 12) + 1
            f.write(
                f"{r['doc_id']},{r['n_chars'] / 7.0},{r['lang']},"
                f"{day:02d}/{month:02d}/202{i % 4}\n"
            )
    md = sniff_file(path)
    return spark.createDataFrame(
        [
            (
                md.delimiter,
                md.has_header,
                len(md.column_types),
                md.column_types[0],
                md.column_types[1],
                md.column_types[2],
                md.column_types[3],
                md.date_format,
            )
        ],
        "delimiter string, has_header boolean, n_cols int, c0_type string,"
        " c1_type string, c2_type string, c3_type string, date_format string",
    )


@_register(
    "q_hash_split",
    """
    WITH bucketed AS (
      SELECT doc_id,
             CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7)) AS UBIGINT)
                  % 1000000 AS INTEGER) AS b
      FROM documents)
    SELECT CASE WHEN b < 800000 THEN 'train'
                WHEN b < 900000 THEN 'val'
                ELSE 'test' END AS split,
           count(*) AS n, min(doc_id) AS min_id
    FROM bucketed GROUP BY 1
    """,
    "Deterministic hash-based train/val/test split (portable buckets)",
)
def q_hash_split(spark, sf_dir):
    from featurestore_spark.operators.sampling import split_by_hash

    docs = load_table(spark, sf_dir, "documents")
    out = split_by_hash(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    return out.groupBy("split").agg(
        F.count(F.lit(1)).alias("n"), F.min("doc_id").alias("min_id")
    )


@_register(
    "q_dq_assertion",
    """
    SELECT 'discount_range' AS name, count(*) AS total,
           CAST(sum(CASE WHEN NOT (l_discount >= 0.0 AND l_discount <= 0.08)
                         OR l_discount IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS invalid,
           CAST(sum(CASE WHEN NOT (l_discount >= 0.0 AND l_discount <= 0.08)
                         OR l_discount IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*) <= 0.35 AS passed
    FROM lineitem
    """,
    "D1 DQ assertion: valid-fraction check through the real DQRunner",
)
def q_dq_assertion(spark, sf_dir):
    from featurestore_spark.dq import DQRunner

    li = load_table(spark, sf_dir, "lineitem")
    res, _invalid = DQRunner(spark).run_assertion(
        li, "discount_range", "l_discount >= 0.0 AND l_discount <= 0.08", 0.35
    )
    return spark.createDataFrame(
        [(res.name, res.total, res.invalid, res.passed)],
        "name string, total bigint, invalid bigint, passed boolean",
    )


@_register(
    "q_entity_resolution",
    """
    WITH e AS (SELECT DISTINCT
                 md5('customer' || CAST(o_custkey AS VARCHAR)) AS c,
                 md5('order' || CAST(o_orderkey AS VARCHAR)) AS o
               FROM orders),
    canon AS (SELECT c, least(c, min(o)) AS m FROM e GROUP BY c)
    SELECT c AS entity_id, m AS canonical_id FROM canon
    UNION ALL
    SELECT e.o AS entity_id, canon.m AS canonical_id
    FROM e JOIN canon ON e.c = canon.c
    """,
    "J12 entity resolution: iterative connected components over the "
    "customer-order mapping graph (star components -> min-id labels)",
)
def q_entity_resolution(spark, sf_dir):
    from featurestore_spark.operators.resolve import resolve_entities

    orders = load_table(spark, sf_dir, "orders")
    mappings = orders.select(
        hash_key(F.lit("customer"), "o_custkey").alias("src_entity_id"),
        hash_key(F.lit("order"), "o_orderkey").alias("dst_entity_id"),
    ).distinct()
    return resolve_entities(mappings, confidence_col=None)


@_register(
    "q_tpch_q10",
    """
    SELECT c_custkey, c_name, n_name,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT))
                AS BIGINT) AS revenue_cents
    FROM customer JOIN nation ON c_nationkey = n_nationkey
                  JOIN orders ON o_custkey = c_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue_cents DESC, c_custkey
    LIMIT 20
    """,
    "Returned-item revenue ranking (4-way join + agg + ordered limit)",
)
def q_tpch_q10(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(orders, orders.o_custkey == cust.c_custkey)
        .where(
            (F.col("o_orderdate") >= _ts_lit("1997-01-01 00:00:00"))
            & (F.col("o_orderdate") < _ts_lit("1998-01-01 00:00:00"))
        )
        .join(
            li.where(F.col("l_returnflag") == "R"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            # exact integer-cents sum: per-row products are bit-identical
            # across engines; summing bigints is order-independent,
            # unlike rounding a float sum (boundary flips)
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0)
                .cast("bigint")
            ).alias("revenue_cents")
        )
        .orderBy(F.col("revenue_cents").desc(), F.col("c_custkey"))
        .limit(20)
    )


@_register(
    "q_tpch_q12",
    """
    SELECT o_orderpriority,
           CAST(sum(CASE WHEN l_quantity >= 25 THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN l_quantity < 25 THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY o_orderpriority
    """,
    "Conditional-count aggregation by priority (q12 shape)",
)
def q_tpch_q12(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        orders.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(
            (F.col("l_shipdate") >= _ts_lit("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < _ts_lit("1997-01-01 00:00:00"))
        )
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.when(F.col("l_quantity") >= 25, 1).otherwise(0))
            .cast("bigint")
            .alias("high_line_count"),
            F.sum(F.when(F.col("l_quantity") < 25, 1).otherwise(0))
            .cast("bigint")
            .alias("low_line_count"),
        )
    )


@_register(
    "q_tpch_q14",
    """
    SELECT round(CAST(100.0 * sum(CASE WHEN p_type LIKE 'PROMO%'
                      THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
                 / sum(l_extendedprice * (1 - l_discount)) AS DOUBLE), 4) AS promo_revenue_pct
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-06-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-07-01 00:00:00'
    """,
    "Promo-revenue ratio (ratio-of-conditional-sums, broadcast part dim)",
)
def q_tpch_q14(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(
            (F.col("l_shipdate") >= _ts_lit("1996-06-01 00:00:00"))
            & (F.col("l_shipdate") < _ts_lit("1996-07-01 00:00:00"))
        )
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type").like("PROMO%"), disc).otherwise(F.lit(0.0)))
                / F.sum(disc),
                4,
            ).alias("promo_revenue_pct")
        )
    )


@_register(
    "q_tpch_q4",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_quantity > 45)
    GROUP BY o_orderpriority
    """,
    "EXISTS semi-join + grouped count (q4 shape; planned as LeftSemi)",
)
def q_tpch_q4(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    heavy = li.where(F.col("l_quantity") > 45).select("l_orderkey")
    return (
        orders.where(
            (F.col("o_orderdate") >= _ts_lit("1996-01-01 00:00:00"))
            & (F.col("o_orderdate") < _ts_lit("1996-07-01 00:00:00"))
        )
        .join(heavy, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@_register(
    "q_tpch_q13",
    """
    SELECT c_count, count(*) AS custdist
    FROM (SELECT c.c_custkey, count(o.o_orderkey) AS c_count
          FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
          GROUP BY c.c_custkey)
    GROUP BY c_count
    """,
    "Customer-order-count distribution incl. zero-order customers "
    "(q13 shape: outer join + double aggregation)",
)
def q_tpch_q13(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@_register(
    "q_tpch_q18",
    """
    SELECT c_name, c.c_custkey, o.o_orderkey, epoch_us(o_orderdate) AS odate_us,
           o_totalprice, big.total_qty
    FROM (SELECT l_orderkey, CAST(sum(l_quantity) AS BIGINT) AS total_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING sum(l_quantity) > 250) big
    JOIN orders o ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    """,
    "Large-volume orders: HAVING-filtered agg driving a 3-way join "
    "(q18 shape; agg output is the small build side)",
)
def q_tpch_q18(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > 250)
        .withColumn("total_qty", F.col("total_qty").cast("bigint"))
    )
    return (
        F.broadcast(big)
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.unix_micros("o_orderdate").alias("odate_us"),
            "o_totalprice",
            "total_qty",
        )
    )


@_register(
    "q_tpch_q19",
    """
    SELECT CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)
                    AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size <= 15 AND l_quantity >= 10)
       OR (p_brand = 'Brand#3' AND p_size <= 30 AND l_quantity >= 20)
       OR (p_type LIKE 'PROMO%' AND l_quantity < 5)
    """,
    "Disjunctive predicate revenue (q19 shape; OR-of-conjunctions must "
    "still prune/push partially). Integer-cents sum for engine parity.",
)
def q_tpch_q19(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 15) & (F.col("l_quantity") >= 10))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size") <= 30) & (F.col("l_quantity") >= 20))
        | (F.col("p_type").like("PROMO%") & (F.col("l_quantity") < 5))
    )
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("bigint")
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .where(cond)
        .agg(F.sum(cents).cast("bigint").alias("revenue_cents"))
    )


@_register(
    "q_tpch_q22",
    """
    SELECT substr(c_name, 10, 1) AS cseg, count(*) AS numcust,
           CAST(sum(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
             AS totacctbal_cents
    FROM customer c
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
    GROUP BY substr(c_name, 10, 1)
    """,
    "Above-average-balance customers dormant since 2001 (q22 shape: "
    "scalar subquery + anti-join). Integer-cents sum for engine parity.",
)
def q_tpch_q22(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    avg_bal = cust.where(F.col("c_acctbal") > 0.0).agg(F.avg("c_acctbal")).first()[0]
    recent = orders.where(F.col("o_orderdate") >= _ts_lit("2001-01-01 00:00:00"))
    cents = F.round(F.col("c_acctbal") * 100, 0).cast("bigint")
    return (
        cust.where(F.col("c_acctbal") > avg_bal)
        .join(recent, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy(F.substring("c_name", 10, 1).alias("cseg"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(cents).cast("bigint").alias("totacctbal_cents"),
        )
    )


@_register(
    "q_tpch_q15",
    """
    WITH rev AS (
      SELECT l_suppkey,
             CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)
                      AS BIGINT)) AS BIGINT) AS revenue_cents
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, r.revenue_cents
    FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE r.revenue_cents = (SELECT max(revenue_cents) FROM rev)
    """,
    "Top supplier by quarterly revenue (q15 shape: agg view + scalar "
    "max subquery; ties all kept)",
)
def q_tpch_q15(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("bigint")
    rev = (
        li.where(
            (F.col("l_shipdate") >= _ts_lit("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < _ts_lit("1996-04-01 00:00:00"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(cents).cast("bigint").alias("revenue_cents"))
    )
    # max-then-filter instead of rank() over a bare global window: the
    # window would sort every supplier's aggregate through ONE task;
    # the scalar max broadcasts and the filter stays distributed
    # (ties preserved either way — TPC-H Q15's revenue = max formulation)
    mx = rev.agg(F.max("revenue_cents").alias("_mx"))
    top = rev.join(
        F.broadcast(mx), F.col("revenue_cents") == F.col("_mx")
    ).drop("_mx")
    return top.join(
        F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey")
    ).select("s_suppkey", "s_name", "revenue_cents")


@_register(
    "q_tpch_q7",
    """
    SELECT supp_nation, cust_nation, l_year,
           CAST(sum(cents) AS BIGINT) AS revenue_cents
    FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 CAST(year(l_shipdate) AS INT) AS l_year,
                 CAST(round(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT) AS cents
          FROM lineitem
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN orders ON o_orderkey = l_orderkey
          JOIN customer ON c_custkey = o_custkey
          JOIN nation n1 ON n1.n_nationkey = s_nationkey
          JOIN nation n2 ON n2.n_nationkey = c_nationkey
          WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
              OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
            AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00')
    GROUP BY supp_nation, cust_nation, l_year
    """,
    "Cross-nation shipping volume by year (q7 shape: the nation-pair "
    "disjunction becomes per-dim IN-filters pushed below the join, "
    "plus supp_nation<>cust_nation after)",
)
def q_tpch_q7(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    pair = ["NATION_1", "NATION_2"]
    npair = nation.where(F.col("n_name").isin(pair))
    sn = supp.join(
        F.broadcast(npair), F.col("n_nationkey") == F.col("s_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cn = cust.join(
        F.broadcast(npair), F.col("n_nationkey") == F.col("c_nationkey")
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("bigint")
    return (
        li.where(
            (F.col("l_shipdate") >= _ts_lit("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < _ts_lit("1998-01-01 00:00:00"))
        )
        .join(F.broadcast(sn), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cn, F.col("c_custkey") == F.col("o_custkey"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            cents.alias("cents"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("cents").cast("bigint").alias("revenue_cents"))
    )


@_register(
    "q_tpch_q8",
    """
    SELECT o_year,
           CAST(round(CAST(sum(CASE WHEN supp_nation = 'NATION_2' THEN cents ELSE 0 END)
                           AS DOUBLE) / CAST(sum(cents) AS DOUBLE), 6) AS DOUBLE)
             AS mkt_share
    FROM (SELECT CAST(year(o_orderdate) AS INT) AS o_year,
                 CAST(round(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT) AS cents,
                 n2.n_name AS supp_nation
          FROM lineitem
          JOIN part ON p_partkey = l_partkey
          JOIN orders ON o_orderkey = l_orderkey
          JOIN customer ON c_custkey = o_custkey
          JOIN nation n1 ON n1.n_nationkey = c_nationkey
          JOIN region ON r_regionkey = n1.n_regionkey
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN nation n2 ON n2.n_nationkey = s_nationkey
          WHERE r_name = 'ASIA' AND p_type = 'PROMO')
    GROUP BY o_year
    """,
    "National market share within a region (q8 shape: conditional-sum "
    "ratio; exact integer-cents sums, one rounded division at the end)",
)
def q_tpch_q8(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    asia_nk = nation.join(
        F.broadcast(region.where(F.col("r_name") == "ASIA")),
        F.col("r_regionkey") == F.col("n_regionkey"),
    ).select("n_nationkey")
    cust_asia = cust.join(
        F.broadcast(asia_nk), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey")
    supp_n = supp.join(
        F.broadcast(nation.select("n_nationkey", F.col("n_name").alias("supp_nation"))),
        F.col("n_nationkey") == F.col("s_nationkey"),
    ).select("s_suppkey", "supp_nation")
    promo = load_table(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("bigint")
    base = (
        li.join(F.broadcast(promo.select("p_partkey")), F.col("p_partkey") == F.col("l_partkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust_asia, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(supp_n), F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            cents.alias("cents"),
            "supp_nation",
        )
    )
    share = (
        F.sum(
            F.when(F.col("supp_nation") == "NATION_2", F.col("cents")).otherwise(F.lit(0))
        ).cast("double")
        / F.sum("cents").cast("double")
    )
    return base.groupBy("o_year").agg(
        F.round(share, 6).cast("double").alias("mkt_share")
    )


@_register(
    "q_tpch_q9",
    """
    SELECT n_name AS nation, o_year, CAST(sum(cents) AS BIGINT) AS profit_cents
    FROM (SELECT n.n_name, CAST(year(o_orderdate) AS INT) AS o_year,
                 CAST(round(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT) AS cents
          FROM lineitem
          JOIN part ON p_partkey = l_partkey
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN nation n ON n.n_nationkey = s_nationkey
          JOIN orders ON o_orderkey = l_orderkey
          WHERE p_name LIKE '%widget%')
    GROUP BY n_name, o_year
    """,
    "Product-line profit by supplier nation and year (q9 shape: "
    "substring LIKE over part drives a 5-way join; dims broadcast)",
)
def q_tpch_q9(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part")
    widget = part.where(F.col("p_name").like("%widget%")).select("p_partkey")
    sn = supp.join(
        F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey")
    ).select("s_suppkey", "n_name")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("bigint")
    return (
        li.join(F.broadcast(widget), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(sn), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            cents.alias("cents"),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("cents").cast("bigint").alias("profit_cents"))
    )


@_register(
    "q_tpch_q2",
    """
    WITH pc AS (SELECT l_partkey, l_suppkey,
                       CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS price_c
                FROM lineitem),
    mn AS (SELECT l_partkey, min(price_c) AS min_price_cents FROM pc GROUP BY l_partkey),
    w AS (SELECT pc.l_partkey, mn.min_price_cents, min(pc.l_suppkey) AS s_key
          FROM pc JOIN mn ON pc.l_partkey = mn.l_partkey AND pc.price_c = mn.min_price_cents
          GROUP BY pc.l_partkey, mn.min_price_cents)
    SELECT p_partkey, p_name, s_name, n_name, min_price_cents
    FROM w
    JOIN part ON p_partkey = w.l_partkey
    JOIN supplier ON s_suppkey = w.s_key
    JOIN nation ON n_nationkey = s_nationkey
    WHERE p_size <= 3
    """,
    "Cheapest supplier per small part (q2 shape: min-per-group with "
    "join-back; Spark does it in ONE shuffle via min(struct(price, "
    "suppkey)) lexicographic agg, dims broadcast)",
)
def q_tpch_q2(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    pc = li.select(
        "l_partkey",
        "l_suppkey",
        F.round(F.col("l_extendedprice") * 100, 0).cast("bigint").alias("price_c"),
    )
    best = (
        pc.groupBy("l_partkey")
        .agg(F.min(F.struct(F.col("price_c"), F.col("l_suppkey"))).alias("b"))
        .select(
            "l_partkey",
            F.col("b.price_c").alias("min_price_cents"),
            F.col("b.l_suppkey").alias("s_key"),
        )
    )
    small = part.where(F.col("p_size") <= 3)
    return (
        best.join(F.broadcast(small), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("s_key"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .select("p_partkey", "p_name", "s_name", "n_name", "min_price_cents")
    )


@_register(
    "q_tpch_q11",
    """
    WITH v AS (SELECT l_partkey,
                      CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
                        AS value_cents
               FROM lineitem GROUP BY l_partkey),
    t AS (SELECT CAST(sum(value_cents) AS BIGINT) AS total_c FROM v)
    SELECT l_partkey, value_cents FROM v, t WHERE value_cents * 1600 > total_c
    """,
    "High-value parts above a global-total fraction (q11 shape: HAVING "
    "vs scalar subquery; all-integer math so the threshold compare is "
    "engine-exact)",
)
def q_tpch_q11(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
    v = li.groupBy("l_partkey").agg(F.sum(cents).cast("bigint").alias("value_cents"))
    total = v.agg(F.sum("value_cents").cast("bigint")).first()[0]
    return v.where(F.col("value_cents") * 1600 > F.lit(total))


@_register(
    "q_tpch_q16",
    """
    SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_size IN (1, 5, 9, 13, 17, 21)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_name LIKE '%3%')
    GROUP BY p_brand, p_type, p_size
    """,
    "Supplier variety per part attribute (q16 shape: NOT-IN exclusion "
    "as broadcast anti-join + count distinct)",
)
def q_tpch_q16(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    bad = supp.where(F.col("s_name").like("%3%")).select("s_suppkey")
    pf = part.where(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin([1, 5, 9, 13, 17, 21])
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        li.join(F.broadcast(bad), F.col("s_suppkey") == F.col("l_suppkey"), "left_anti")
        .join(F.broadcast(pf), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@_register(
    "q_tpch_q17",
    """
    SELECT CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS rev_cents
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p_brand = 'Brand#2'
      AND l_quantity < (SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
                        WHERE l2.l_partkey = l.l_partkey)
    """,
    "Small-quantity revenue vs per-part average (q17 shape: correlated "
    "AVG subquery becomes a window avg over the part key — one shuffle, "
    "no self-join; the part-level brand filter commutes with the avg)",
)
def q_tpch_q17(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    b2 = part.where(F.col("p_brand") == "Brand#2").select("p_partkey")
    lif = li.join(F.broadcast(b2), F.col("p_partkey") == F.col("l_partkey"))
    w = Window.partitionBy("l_partkey")
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
    return (
        lif.withColumn("_avg_qty", F.avg("l_quantity").over(w))
        .where(F.col("l_quantity") < 0.5 * F.col("_avg_qty"))
        .agg(F.sum(cents).cast("bigint").alias("rev_cents"))
    )


@_register(
    "q_tpch_q20",
    """
    SELECT s_suppkey, s_name, n_name
    FROM supplier JOIN nation ON n_nationkey = s_nationkey
    WHERE n_name IN ('NATION_3', 'NATION_4', 'NATION_5')
      AND s_suppkey IN (SELECT l_suppkey
                        FROM lineitem JOIN part ON p_partkey = l_partkey
                        WHERE p_name LIKE 'small%'
                          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
                        GROUP BY l_suppkey, l_partkey
                        HAVING sum(l_quantity) > 50)
    """,
    "Suppliers with heavy volume of a part family (q20 shape: nested "
    "IN-subquery chain as agg -> left_semi join)",
)
def q_tpch_q20(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    fam = part.where(F.col("p_name").like("small%")).select("p_partkey")
    heavy = (
        li.where(
            (F.col("l_shipdate") >= _ts_lit("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < _ts_lit("1997-01-01 00:00:00"))
        )
        .join(F.broadcast(fam), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 50)
        .select("l_suppkey")
        .distinct()
    )
    return (
        supp.join(
            F.broadcast(nation.where(F.col("n_name").isin(["NATION_3", "NATION_4", "NATION_5"]))),
            F.col("n_nationkey") == F.col("s_nationkey"),
        )
        .join(heavy, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", "n_name")
    )


@_register(
    "q_tpch_q21",
    """
    WITH li AS (SELECT l_orderkey, l_suppkey,
                       max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                                THEN 1 ELSE 0 END) AS late
                FROM lineitem JOIN orders ON o_orderkey = l_orderkey
                WHERE o_orderstatus = 'F'
                GROUP BY l_orderkey, l_suppkey)
    SELECT s_name, count(*) AS numwait
    FROM li l1 JOIN supplier ON s_suppkey = l1.l_suppkey
    WHERE l1.late = 1
      AND EXISTS (SELECT 1 FROM li l2
                  WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM li l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey AND l3.late = 1)
    GROUP BY s_name
    """,
    "Sole-late supplier in multi-supplier orders (q21 shape: the "
    "EXISTS / NOT EXISTS pair becomes ONE window over the order key "
    "computing n_supp/n_late — no self-joins; late = shipped >90 days "
    "after order date, adapted to this schema's columns)",
)
def q_tpch_q21(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    lo = li.join(
        orders.where(F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderdate"),
        F.col("o_orderkey") == F.col("l_orderkey"),
    )
    late = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
        F.lit(1),
    ).otherwise(F.lit(0))
    per = lo.groupBy("l_orderkey", "l_suppkey").agg(F.max(late).alias("late"))
    w = Window.partitionBy("l_orderkey")
    flagged = (
        per.withColumn("n_supp", F.count(F.lit(1)).over(w))
        .withColumn("n_late", F.sum("late").over(w))
        .where((F.col("late") == 1) & (F.col("n_supp") > 1) & (F.col("n_late") == 1))
    )
    return (
        flagged.join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# ---------------------------------------------------------------------------
# Training-data pipeline: text analysis / dedup / similarity
# ---------------------------------------------------------------------------


@_register(
    "q_doc_fingerprint",
    """
    SELECT doc_id, md5(lower(trim(text))) AS fp FROM documents
    """,
    "Document fingerprint: md5 of normalized text",
)
def q_doc_fingerprint(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", F.md5(F.lower(F.trim("text"))).alias("fp"))


@_register(
    "q_dedup_exact",
    """
    SELECT md5(lower(trim(text))) AS fp, min(doc_id) AS keep_id, count(*) AS n_dups
    FROM documents GROUP BY 1
    """,
    "Exact dedup: hash-groupBy keep-first (map-side combine)",
)
def q_dedup_exact(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("fp", F.md5(F.lower(F.trim("text"))))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
    )


@_register(
    "q_token_count",
    r"""
    SELECT doc_id, CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INTEGER) AS n_tokens
    FROM documents
    """,
    "Whitespace token count per document",
)
def q_token_count(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens")
    )


@_register(
    "q_text_quality",
    r"""
    SELECT doc_id,
           CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INTEGER) AS n_tokens,
           round(CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
                 / length(text), 3) AS alpha_ratio,
           round(CAST(length(text) AS DOUBLE)
                 / len(regexp_split_to_array(trim(text), '\s+')), 3) AS chars_per_token
    FROM documents
    """,
    "Quality scoring: token count, alphabetic ratio, chars/token",
)
def q_text_quality(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.trim("text"), r"\s+"))
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.round(
            F.length(F.regexp_replace("text", "[^a-zA-Z]", "")).cast("double")
            / F.length("text"),
            3,
        ).alias("alpha_ratio"),
        F.round(F.length("text").cast("double") / n_tokens, 3).alias("chars_per_token"),
    )


# -- language ID --------------------------------------------------------------


def _lang_oracle() -> str:
    from featurestore_spark.operators.text import LANG_LEXICONS

    score_cols = []
    for lang, lex in LANG_LEXICONS.items():
        arr = "[" + ", ".join(f"'{w}'" for w in lex) + "]"
        score_cols.append(
            f"CAST(len(list_filter(toks, t -> list_contains({arr}, t))) AS INTEGER)"
            f" AS {lang}_score"
        )
    langs = list(LANG_LEXICONS)
    cases = []
    for lang in langs:
        conds = " AND ".join(
            f"{lang}_score >= {o}_score" for o in langs if o != lang
        )
        cases.append(f"WHEN {conds} THEN '{lang}'")
    pred = "CASE " + " ".join(cases) + f" ELSE '{langs[-1]}' END"
    return rf"""
    WITH toked AS (
      SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
      FROM documents),
    scored AS (SELECT doc_id, {", ".join(score_cols)} FROM toked)
    SELECT doc_id, {", ".join(f"{lang}_score" for lang in langs)},
           {pred} AS lang_pred
    FROM scored
    """


@_register(
    "q_lang_id",
    _lang_oracle(),
    "Language ID: stopword-lexicon scores + fixed-priority argmax",
)
def q_lang_id(spark, sf_dir):
    from featurestore_spark.operators.text import LANG_LEXICONS, language_scores

    docs = load_table(spark, sf_dir, "documents")
    out = language_scores(docs)
    return out.select(
        "doc_id", *[f"{lang}_score" for lang in LANG_LEXICONS], "lang_pred"
    )


# -- MinHash / LSH dedup -------------------------------------------------------

_MH_K, _MH_BANDS, _MH_N = 16, 4, 3

_DUCK_SHINGLES_BODY = r"""toked{sfx} AS (
      SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
      FROM {src}),
    shingled{sfx} AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(toks) >= {n}
               THEN list_transform(generate_series(1, len(toks) - {nm1}),
                                   i -> array_to_string(toks[i:i+{nm1}], ' '))
               ELSE [array_to_string(toks, ' ')] END) AS sh
      FROM toked{sfx})
"""

_DUCK_SHINGLES = "\n    WITH " + _DUCK_SHINGLES_BODY.format(
    src="documents", n=_MH_N, nm1=_MH_N - 1, sfx=""
)


def _melt_cte(name: str, bands_cte: str, bands: int = _MH_BANDS) -> str:
    return (
        f"\n {name} AS ("
        + " UNION ALL ".join(
            f"SELECT doc_id, {i} AS band_idx, band_{i} AS band_hash"
            f" FROM {bands_cte}"
            for i in range(bands)
        )
        + ")"
    )


def _duck_minhash_bands(
    src: str = "documents",
    prelude: str = "",
    sfx: str = "",
    lead: bool = True,
    n: int = _MH_N,
    k: int = _MH_K,
    bands: int = _MH_BANDS,
) -> str:
    """Shingle→signature→band CTE chain over `src` (any CTE or table
    with doc_id + text). `prelude` = extra CTEs injected right after
    WITH (so callers can define `src` itself). `sfx` suffixes every
    CTE name so two chains (e.g. base corpus + incoming batch) can
    share one WITH clause; `lead=False` emits a continuation (no WITH
    keyword) for the second chain. `n`/`k`/`bands` default to the
    fixture constants; preset queries pass the published recipe's
    values — seeds come from `_minhash_seeds(k)` (the pinned 32-prime
    prefix plus the Knuth/Weyl extension), embedded as literals."""
    from featurestore_spark.operators.dedup import MINHASH_P, _minhash_seeds

    seeds_a, seeds_b = _minhash_seeds(k)
    # Same affine family as operators.dedup: h = first 7 md5 hex digits,
    # mh_i = min((A[i]*h + B[i]) mod P).
    hs = (
        "list_transform(sh, s -> "
        "CAST(CAST(('0x' || substr(md5(s), 1, 7)) AS UBIGINT) AS BIGINT))"
    )
    sigs = ", ".join(
        f"list_min(list_transform(hs, h -> ({seeds_a[i]} * h + {seeds_b[i]})"
        f" % {MINHASH_P})) AS mh_{i}"
        for i in range(k)
    )
    r = k // bands
    band_exprs = ", ".join(
        "md5("
        + " || '|' || ".join(f"CAST(mh_{b * r + j} AS VARCHAR)" for j in range(r))
        + f") AS band_{b}"
        for b in range(bands)
    )
    shingles = (
        ("\n    WITH " if lead else "\n    ")
        + (f"{prelude},\n    " if prelude else "")
        + _DUCK_SHINGLES_BODY.format(src=src, n=n, nm1=n - 1, sfx=sfx)
    )
    return (
        f"{shingles}, hashed{sfx} AS (SELECT doc_id, {hs} AS hs FROM shingled{sfx}),"
        f" sigs{sfx} AS (SELECT doc_id, {sigs} FROM hashed{sfx}),"
        f" bands{sfx} AS (SELECT doc_id, {band_exprs} FROM sigs{sfx})"
    )


@_register(
    "q_minhash_bands",
    _duck_minhash_bands() + "\nSELECT * FROM bands",
    "MinHash LSH band digests per document (shuffle-free signatures)",
)
def q_minhash_bands(spark, sf_dir):
    from featurestore_spark.operators.dedup import minhash_bands

    docs = load_table(spark, sf_dir, "documents")
    return minhash_bands(docs, n=_MH_N, k=_MH_K, bands=_MH_BANDS)


_MH_MAX_BUCKET = 1000  # production skew guard, modeled on BOTH sides


@_register(
    "q_minhash_pairs",
    _duck_minhash_bands(
        src="rep_docs",
        prelude="""grp AS (
      SELECT text, min(doc_id) AS rep_id FROM documents GROUP BY text),
    rep_docs AS (SELECT rep_id AS doc_id, text FROM grp)""",
    )
    + ","
    + _melt_cte("melted", "bands")
    + f""",
    kept AS (  -- max_bucket guard over DISTINCT-text buckets, mirrored
      SELECT band_idx, band_hash FROM melted
      GROUP BY band_idx, band_hash HAVING count(*) <= {_MH_MAX_BUCKET}),
    rep_pairs AS (
      SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
      FROM melted a JOIN melted b USING (band_idx, band_hash)
      JOIN kept USING (band_idx, band_hash)
      WHERE a.doc_id < b.doc_id)
    -- rep pairs expanded through exact-duplicate groups...
    SELECT DISTINCT least(da.doc_id, db.doc_id) AS a_id,
           greatest(da.doc_id, db.doc_id) AS b_id
    FROM rep_pairs p
      JOIN grp ga ON ga.rep_id = p.a_id
      JOIN documents da ON da.text IS NOT DISTINCT FROM ga.text
      JOIN grp gb ON gb.rep_id = p.b_id
      JOIN documents db ON db.text IS NOT DISTINCT FROM gb.text
    UNION
    -- ...plus unconditional intra-group (exact duplicate) pairs
    SELECT a.doc_id, b.doc_id
    FROM documents a JOIN documents b
      ON a.text IS NOT DISTINCT FROM b.text AND a.doc_id < b.doc_id
    """,
    "MinHash LSH near-dup candidate pairs with exact-duplicate "
    "collapse (band bucket join over distinct texts, guarded; member "
    "pairs re-expanded)",
)
def q_minhash_pairs(spark, sf_dir):
    from featurestore_spark.operators.dedup import minhash_candidate_pairs

    docs = load_table(spark, sf_dir, "documents")
    return minhash_candidate_pairs(
        docs,
        n=_MH_N,
        k=_MH_K,
        bands=_MH_BANDS,
        max_bucket=_MH_MAX_BUCKET,
        collapse_exact=True,
    )


@_register(
    "q_dedup_clusters",
    _duck_minhash_bands(
        src="rep_docs",
        prelude="""grp AS (
      SELECT text, min(doc_id) AS rep_id FROM documents GROUP BY text),
    rep_docs AS (SELECT rep_id AS doc_id, text FROM grp)""",
    )
    + ","
    + _melt_cte("melted", "bands")
    + f""",
    kept AS (
      SELECT band_idx, band_hash FROM melted
      GROUP BY band_idx, band_hash HAVING count(*) <= {_MH_MAX_BUCKET}),
    pairs AS (
      SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
      FROM melted a JOIN melted b USING (band_idx, band_hash)
      JOIN kept USING (band_idx, band_hash)
      WHERE a.doc_id < b.doc_id),
    star AS (
      SELECT g.rep_id AS a_id, d.doc_id AS b_id
      FROM documents d JOIN grp g
        ON g.text IS NOT DISTINCT FROM d.text
      WHERE d.doc_id <> g.rep_id),
    edges AS (SELECT a_id AS a, b_id AS b FROM pairs
              UNION SELECT b_id, a_id FROM pairs
              UNION SELECT a_id, b_id FROM star
              UNION SELECT b_id, a_id FROM star)
    SELECT id AS doc_id, min(lab) AS canonical_id
    FROM (WITH RECURSIVE r(id, lab) AS (
            SELECT DISTINCT a, a FROM edges
            UNION
            SELECT e.a, r.lab FROM edges e JOIN r ON r.id = e.b)
          SELECT id, lab FROM r)
    GROUP BY id
    """,
    "Transitive dedup clustering with exact-duplicate collapse: LSH "
    "candidate pairs over DISTINCT texts + linear rep->member star "
    "edges -> connected components (min-doc_id label). Oracle walks "
    "the same collapsed graph with a recursive CTE.",
)
def q_dedup_clusters(spark, sf_dir):
    """Near-dup CLUSTERS, not just pairs: LSH pair graph contracted to
    components so a whole family of mutual near-dups keeps exactly one
    canonical doc (pairwise keep-lists over-delete on chains A-B, B-C).
    Exact-duplicate texts are collapsed BEFORE the pair join (pair
    work shrinks by the square of the duplication factor; each group
    re-attaches via linear star edges — see
    dedup.minhash_dedup_edges). Label propagation is iterative
    DataFrame joins (operators/resolve.py) — shuffles on
    uniformly-hashed doc ids."""
    from featurestore_spark.operators.dedup import minhash_dedup_edges
    from featurestore_spark.operators.resolve import connected_components

    docs = load_table(spark, sf_dir, "documents")
    edges = minhash_dedup_edges(
        docs, n=_MH_N, k=_MH_K, bands=_MH_BANDS, max_bucket=_MH_MAX_BUCKET
    )
    comp = connected_components(edges, src_col="a_id", dst_col="b_id")
    return comp.select(
        F.col("id").alias("doc_id"), F.col("component").alias("canonical_id")
    )


@_register(
    "q_ngram_jaccard",
    _DUCK_SHINGLES
    + """
    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.sh, b.sh))), 4) AS jaccard
    FROM shingled a JOIN shingled b ON a.doc_id < b.doc_id
    WHERE a.doc_id < 15 AND b.doc_id < 15
    """,
    "Exact n-gram Jaccard similarity over a pair sample (LSH verify step)",
)
def q_ngram_jaccard(spark, sf_dir):
    from featurestore_spark.operators.dedup import jaccard_pairs

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 15)
    ids = docs.select(F.col("doc_id").alias("a_id"))
    pairs = ids.crossJoin(docs.select(F.col("doc_id").alias("b_id"))).where(
        F.col("a_id") < F.col("b_id")
    )
    return jaccard_pairs(docs, pairs, n=_MH_N)


@_register(
    "q_ngram_containment",
    _DUCK_SHINGLES
    + """
    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                 / len(a.sh), 4) AS containment_a,
           round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                 / len(b.sh), 4) AS containment_b,
           round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.sh, b.sh))), 4) AS jaccard
    FROM shingled a JOIN shingled b ON a.doc_id < b.doc_id
    WHERE a.doc_id < 15 AND b.doc_id < 15
    """,
    "Asymmetric n-gram containment (|A∩B|/|A|, |A∩B|/|B|) + Jaccard "
    "over a pair sample — the verify step for SUB-document "
    "duplication (quotes/partial mirrors), where Jaccard alone "
    "under-scores a short doc embedded in a long one.",
)
def q_ngram_containment(spark, sf_dir):
    from featurestore_spark.operators.dedup import containment_pairs

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 15)
    ids = docs.select(F.col("doc_id").alias("a_id"))
    pairs = ids.crossJoin(docs.select(F.col("doc_id").alias("b_id"))).where(
        F.col("a_id") < F.col("b_id")
    )
    return containment_pairs(docs, pairs, n=_MH_N)


@_register(
    "q_dedup_pipeline",
    _duck_minhash_bands(
        src="rep_docs",
        prelude="""grp AS (
      SELECT text, min(doc_id) AS rep_id FROM documents GROUP BY text),
    rep_docs AS (SELECT rep_id AS doc_id, text FROM grp)""",
    )
    + ","
    + _melt_cte("melted", "bands")
    + f""",
    kept AS (
      SELECT band_idx, band_hash FROM melted
      GROUP BY band_idx, band_hash HAVING count(*) <= {_MH_MAX_BUCKET}),
    cand AS (
      SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
      FROM melted a JOIN melted b USING (band_idx, band_hash)
      JOIN kept USING (band_idx, band_hash)
      WHERE a.doc_id < b.doc_id),
    verified AS (
      SELECT c.a_id, c.b_id
      FROM cand c JOIN shingled sa ON sa.doc_id = c.a_id
                  JOIN shingled sb ON sb.doc_id = c.b_id
      WHERE round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
            / len(list_distinct(list_concat(sa.sh, sb.sh))), 4) >= 0.8),
    drops AS (
      -- B-side members greater than min(A) (= A's rep id)
      SELECT db.doc_id AS d FROM verified v
        JOIN grp gb ON gb.rep_id = v.b_id
        JOIN documents db ON db.text IS NOT DISTINCT FROM gb.text
      WHERE db.doc_id > v.a_id
      UNION
      -- A-side members greater than min(B)
      SELECT da.doc_id FROM verified v
        JOIN grp ga ON ga.rep_id = v.a_id
        JOIN documents da ON da.text IS NOT DISTINCT FROM ga.text
      WHERE da.doc_id > v.b_id
      UNION
      -- intra-group: every exact duplicate but the group minimum
      SELECT d.doc_id FROM documents d
        JOIN grp g ON g.text IS NOT DISTINCT FROM d.text
      WHERE d.doc_id > g.rep_id)
    SELECT d.doc_id FROM documents d
    LEFT JOIN drops ON d.doc_id = drops.d
    WHERE drops.d IS NULL
    """,
    "End-to-end dedup pipeline with exact-duplicate collapse: LSH "
    "candidates over DISTINCT texts -> Jaccard>=0.8 verify -> drop "
    "set expanded linearly through duplicate groups (identical "
    "keep-set to the raw pipeline: bands and Jaccard depend only on "
    "the text)",
)
def q_dedup_pipeline(spark, sf_dir):
    from featurestore_spark.operators.dedup import dedup_keep_docs

    docs = load_table(spark, sf_dir, "documents")
    return dedup_keep_docs(
        docs, n=_MH_N, k=_MH_K, bands=_MH_BANDS, max_bucket=_MH_MAX_BUCKET
    ).select("doc_id")


# FineWeb fuzzy-dedup preset constants (Penedo et al. 2024 §3.4) —
# mirrored from DEDUP_PRESETS['fineweb'] (asserted equal in tests):
# 5-grams, 112 hashes in 14 bands of 8, verify threshold 0.75.
_FW_N, _FW_K, _FW_BANDS, _FW_THR = 5, 112, 14, 0.75


@_register(
    "q_dedup_preset",
    _duck_minhash_bands(
        src="rep_docs",
        prelude="""grp AS (
      SELECT text, min(doc_id) AS rep_id FROM documents GROUP BY text),
    rep_docs AS (SELECT rep_id AS doc_id, text FROM grp)""",
        n=_FW_N,
        k=_FW_K,
        bands=_FW_BANDS,
    )
    + ","
    + _melt_cte("melted", "bands", bands=_FW_BANDS)
    + f""",
    kept AS (
      SELECT band_idx, band_hash FROM melted
      GROUP BY band_idx, band_hash HAVING count(*) <= {_MH_MAX_BUCKET}),
    cand AS (
      SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
      FROM melted a JOIN melted b USING (band_idx, band_hash)
      JOIN kept USING (band_idx, band_hash)
      WHERE a.doc_id < b.doc_id),
    verified AS (
      SELECT c.a_id, c.b_id
      FROM cand c JOIN shingled sa ON sa.doc_id = c.a_id
                  JOIN shingled sb ON sb.doc_id = c.b_id
      WHERE round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
            / len(list_distinct(list_concat(sa.sh, sb.sh))), 4)
            >= {_FW_THR}),
    drops AS (
      SELECT db.doc_id AS d FROM verified v
        JOIN grp gb ON gb.rep_id = v.b_id
        JOIN documents db ON db.text IS NOT DISTINCT FROM gb.text
      WHERE db.doc_id > v.a_id
      UNION
      SELECT da.doc_id FROM verified v
        JOIN grp ga ON ga.rep_id = v.a_id
        JOIN documents da ON da.text IS NOT DISTINCT FROM ga.text
      WHERE da.doc_id > v.b_id
      UNION
      SELECT d.doc_id FROM documents d
        JOIN grp g ON g.text IS NOT DISTINCT FROM d.text
      WHERE d.doc_id > g.rep_id)
    SELECT d.doc_id FROM documents d
    LEFT JOIN drops ON d.doc_id = drops.d
    WHERE drops.d IS NULL
    """,
    "One-call published-recipe dedup: dedup_corpus('fineweb') — the "
    "full collapse->LSH->verify->keep ladder at Penedo et al. 2024 "
    "§3.4 constants (5-grams, 112 hashes / 14 bands of 8, Jaccard "
    ">= 0.75), exercising the MinHash seed extension past the 32 "
    "pinned primes with a value oracle (the 'refinedweb' k=9000 "
    "preset shares the code path and stays pytest-pinned; VERDICT r8 "
    "#7). Oracle replays the identical pipeline with the same "
    "Knuth/Weyl-extended seed literals.",
)
def q_dedup_preset(spark, sf_dir):
    from featurestore_spark.operators.dedup import dedup_corpus

    docs = load_table(spark, sf_dir, "documents")
    return dedup_corpus(docs, "fineweb").select("doc_id")


@_register(
    "q_dedup_best",
    _duck_minhash_bands(
        src="rep_docs",
        prelude="""grp AS (
      SELECT text, min(doc_id) AS rep_id FROM documents GROUP BY text),
    rep_docs AS (SELECT rep_id AS doc_id, text FROM grp)""",
    )
    + ","
    + _melt_cte("melted", "bands")
    + f""",
    kept AS (
      SELECT band_idx, band_hash FROM melted
      GROUP BY band_idx, band_hash HAVING count(*) <= {_MH_MAX_BUCKET}),
    cand AS (
      SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
      FROM melted a JOIN melted b USING (band_idx, band_hash)
      JOIN kept USING (band_idx, band_hash)
      WHERE a.doc_id < b.doc_id),
    verified AS (
      SELECT c.a_id, c.b_id
      FROM cand c JOIN shingled sa ON sa.doc_id = c.a_id
                  JOIN shingled sb ON sb.doc_id = c.b_id
      WHERE round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
            / len(list_distinct(list_concat(sa.sh, sb.sh))), 4) >= 0.8),
    star AS (
      SELECT g.rep_id AS a_id, d.doc_id AS b_id
      FROM documents d JOIN grp g
        ON g.text IS NOT DISTINCT FROM d.text
      WHERE d.doc_id <> g.rep_id),
    edges AS (SELECT a_id AS a, b_id AS b FROM verified
              UNION SELECT b_id, a_id FROM verified
              UNION SELECT a_id, b_id FROM star
              UNION SELECT b_id, a_id FROM star),
    comp AS (
      SELECT id AS doc_id, min(lab) AS component
      FROM (WITH RECURSIVE r(id, lab) AS (
              SELECT DISTINCT a, a FROM edges
              UNION
              SELECT e.a, r.lab FROM edges e JOIN r ON r.id = e.b)
            SELECT id, lab FROM r)
      GROUP BY id),
    lab AS (
      SELECT d.doc_id, coalesce(c.component, d.doc_id) AS cluster_id,
             d.n_chars
      FROM documents d LEFT JOIN comp c USING (doc_id)),
    rn AS (
      SELECT doc_id, cluster_id,
             row_number() OVER (PARTITION BY cluster_id
                                ORDER BY n_chars DESC NULLS LAST,
                                         doc_id ASC) AS r
      FROM lab WHERE doc_id IS NOT NULL)
    SELECT doc_id, cluster_id FROM rn WHERE r = 1
    UNION ALL  -- NULL-id rows are kept unconditionally (no graph id)
    SELECT doc_id, cluster_id FROM lab WHERE doc_id IS NULL
    """,
    "Keep-BEST cluster dedup: LSH candidates + Jaccard>=0.8 verify "
    "over distinct texts, verified pairs + star edges contracted to "
    "connected components, then ONE argmax window per cluster keeps "
    "the longest member (n_chars desc, id tie-break) — the RefinedWeb "
    "keep-the-canonical-document rule, vs dedup_keep_docs's "
    "keep-lowest-id. Oracle walks the same graph with a recursive CTE.",
)
def q_dedup_best(spark, sf_dir):
    from featurestore_spark.operators.dedup import dedup_keep_best

    docs = load_table(spark, sf_dir, "documents")
    return dedup_keep_best(
        docs,
        "n_chars",
        n=_MH_N,
        k=_MH_K,
        bands=_MH_BANDS,
        max_bucket=_MH_MAX_BUCKET,
    ).select("doc_id", "cluster_id")


@_register(
    "q_incremental_dedup",
    _duck_minhash_bands(
        src="base_docs",
        prelude="""grpb AS (
      SELECT text, min(doc_id) AS rep_id FROM documents
      WHERE doc_id % 3 <> 0 GROUP BY text),
    base_docs AS (SELECT rep_id AS doc_id, text FROM grpb)""",
        sfx="_b",
    )
    + ","
    + _duck_minhash_bands(
        src="batch_docs",
        prelude="""grpq AS (
      SELECT text, min(doc_id) AS rep_id FROM documents
      WHERE doc_id % 3 = 0 GROUP BY text),
    batch_docs AS (SELECT rep_id AS doc_id, text FROM grpq)""",
        sfx="_q",
        lead=False,
    )
    + ","
    + _melt_cte("melt_b", "bands_b")
    + ","
    + _melt_cte("melt_q", "bands_q")
    + f""",
    kept_k AS (
      SELECT band_idx, band_hash FROM melt_b
      GROUP BY band_idx, band_hash HAVING count(*) <= {_MH_MAX_BUCKET}),
    cand AS (
      SELECT DISTINCT q.doc_id AS q_id, b.doc_id AS b_id
      FROM melt_q q JOIN melt_b b USING (band_idx, band_hash)
      JOIN kept_k USING (band_idx, band_hash)),
    verified AS (
      SELECT DISTINCT c.q_id FROM cand c
        JOIN shingled_q sq ON sq.doc_id = c.q_id
        JOIN shingled_b sb ON sb.doc_id = c.b_id
      WHERE round(CAST(len(list_intersect(sq.sh, sb.sh)) AS DOUBLE)
            / len(list_distinct(list_concat(sq.sh, sb.sh))), 4) >= 0.8),
    -- cap-independent exact stage: batch groups whose text exists
    -- verbatim in the corpus drop unconditionally (mirrors the
    -- text_h1/text_h2 semi-join)
    exact_q AS (
      SELECT DISTINCT g.rep_id FROM grpq g
        JOIN grpb b ON b.text IS NOT DISTINCT FROM g.text),
    drops AS (
      SELECT d.doc_id AS d FROM documents d
        JOIN grpq g ON g.text IS NOT DISTINCT FROM d.text
      WHERE d.doc_id % 3 = 0
        AND (g.rep_id IN (SELECT q_id FROM verified)
             OR g.rep_id IN (SELECT rep_id FROM exact_q)))
    SELECT d.doc_id FROM documents d LEFT JOIN drops ON d.doc_id = drops.d
    WHERE d.doc_id % 3 = 0 AND drops.d IS NULL
    """,
    "Incremental dedup: the incoming batch (doc_id % 3 = 0) deduped "
    "against a persisted MinHash band index of the accepted corpus "
    "(doc_id % 3 <> 0) without re-reading the corpus — band collide, "
    "Jaccard>=0.8 verify against only the candidate corpus reps, drop "
    "set expanded through the batch's exact-duplicate groups",
)
def q_incremental_dedup(spark, sf_dir):
    from featurestore_spark.operators.incremental import (
        dedup_against_index,
        minhash_band_index,
    )

    docs = load_table(spark, sf_dir, "documents")
    base = docs.where(F.col("doc_id") % 3 != 0)
    batch = docs.where(F.col("doc_id") % 3 == 0)
    idx = minhash_band_index(base, n=_MH_N, k=_MH_K, bands=_MH_BANDS)
    return dedup_against_index(
        batch,
        idx,
        base=base,
        threshold=0.8,
        n=_MH_N,
        k=_MH_K,
        bands=_MH_BANDS,
        max_bucket=_MH_MAX_BUCKET,
    ).select("doc_id")


@_register(
    "q_simhash_near_dups",
    # Brute-force all-pairs oracle: pigeonhole blocking is EXACT within
    # max_hamming, so ground truth is simply every pair with
    # bit_count(xor) <= 8. Signature replicated bit-for-bit in SQL
    # (md5-prefix token hashes, per-bit majority; empty docs -> 0).
    r"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok
      FROM documents
    ), tok2 AS (
      SELECT doc_id, ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS h
      FROM toks WHERE tok <> ''
    ), bits AS (
      SELECT doc_id, b.b,
             CASE WHEN 2 * SUM((h >> b.b) & 1) >= COUNT(*) THEN 1 ELSE 0 END AS maj
      FROM tok2, (SELECT unnest(range(64)) AS b) b
      GROUP BY doc_id, b.b
    ), sigp AS (
      SELECT doc_id, SUM(maj::HUGEINT * (1::HUGEINT << b)) AS u
      FROM bits GROUP BY doc_id
    ), sig AS (
      SELECT d.doc_id,
             COALESCE(CAST(s.u - CASE WHEN s.u >= 9223372036854775808
                 THEN 18446744073709551616::HUGEINT ELSE 0 END AS BIGINT), 0)
               AS simhash
      FROM documents d LEFT JOIN sigp s USING (doc_id)
    )
    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 8
    """,
    "SimHash near-dup pairs: pigeonhole blocking + Hamming<=8 verify",
)
def q_simhash_near_dups(spark, sf_dir):
    from featurestore_spark.operators.dedup import simhash_near_dups

    docs = load_table(spark, sf_dir, "documents")
    return simhash_near_dups(docs, max_hamming=8)


# -- binary / multimodal plumbing ---------------------------------------------


@_register(
    "q_binary_meta",
    """
    SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5  -- md5(VARCHAR) hashes the UTF-8 bytes
    FROM documents
    """,
    "Opaque-binary column metadata (size + digest) — multimodal base",
)
def q_binary_meta(spark, sf_dir):
    from featurestore_spark.operators.multimodal import (
        attach_binary_metadata,
        text_as_binary,
    )

    docs = load_table(spark, sf_dir, "documents")
    with_bin = attach_binary_metadata(text_as_binary(docs), "content")
    return with_bin.select("doc_id", "n_bytes", "content_md5")


@_register(
    "q_image_meta",
    """
    SELECT doc_id,
           CASE WHEN doc_id % 31 = 0 THEN NULL
                WHEN doc_id % 3 = 0 THEN 'png'
                WHEN doc_id % 3 = 1 THEN 'jpeg'
                ELSE 'gif' END AS format,
           CASE WHEN doc_id % 31 = 0 THEN NULL
                ELSE CAST(16 + (doc_id * 7) % 240 AS INTEGER) END AS width,
           CASE WHEN doc_id % 31 = 0 THEN NULL
                ELSE CAST(16 + (doc_id * 13) % 240 AS INTEGER) END AS height,
           CASE WHEN doc_id % 31 = 0 THEN NULL
                WHEN doc_id % 3 = 0 THEN CAST(3 + doc_id % 2 AS INTEGER)
                WHEN doc_id % 3 = 1 THEN
                     CAST(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 3 END AS INTEGER)
                ELSE 3 END AS channels
    FROM documents
    """,
    "REAL image header decode round-trip: spec-correct PNG/JPEG/GIF "
    "payloads synthesized per doc_id (every 31st doc corrupt on "
    "purpose), then parsed back by the stdlib header decoder inside "
    "mapInPandas — the oracle recomputes the expected dims "
    "arithmetically, so any parse drift (endianness, marker walk, "
    "channel mapping, null contract) hash-mismatches.",
)
def q_image_meta(spark, sf_dir):
    from featurestore_spark.operators.multimodal import build_image, decode_images

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def synth(it):
        for pdf in it:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                if did % 31 == 0:
                    payloads.append(b"\x00corrupt-payload")
                    continue
                fmt = ("png", "jpeg", "gif")[did % 3]
                w, h = 16 + (did * 7) % 240, 16 + (did * 13) % 240
                if fmt == "png":
                    c = 3 + did % 2
                elif fmt == "jpeg":
                    c = 1 if did % 5 == 0 else 3
                else:
                    c = 3
                payloads.append(build_image(fmt, w, h, c))
            yield pdf.assign(content=payloads)

    with_img = docs.mapInPandas(synth, schema="doc_id long, content binary")
    return decode_images(with_img, "content").select(
        "doc_id", "format", "width", "height", "channels"
    )


@_register(
    "q_image_dedup",
    """
    WITH eligible AS (
      SELECT doc_id, doc_id % 97 AS g FROM documents
      WHERE doc_id % 31 <> 0),
    par AS (
      SELECT doc_id, g,
             CASE WHEN g % 3 = 0 THEN 3 + g % 2
                  WHEN g % 3 = 1 THEN
                       CASE WHEN g % 5 = 0 THEN 1 ELSE 3 END
                  ELSE 3 END AS ch
      FROM eligible)
    SELECT min(doc_id) AS keep_id,
           CAST(CASE g % 3 WHEN 0 THEN 33
                           WHEN 1 THEN 30 + 3 * ch
                           ELSE 13 END AS BIGINT) AS n_bytes,
           CAST(count(*) AS BIGINT) AS n_dups
    FROM par GROUP BY g, ch
    """,
    "Bytes-level exact image dedup (the multimodal analog of "
    "url_dedup/exact_dedup): spec-correct PNG/JPEG/GIF payloads "
    "synthesized in 97 duplicate groups (every 31st doc carries a "
    "NULL payload and must drop), then deduped on the md5 digest — "
    "one narrow groupBy, the multi-MB bytes never shuffle. The "
    "oracle can't build the binary (PNG CRC), so it verifies the "
    "exact group structure arithmetically: keeper id, duplicate "
    "count, and the payload byte length (header math: PNG 33, JPEG "
    "30+3*channels, GIF 13) per distinct payload. The perceptual "
    "half (byte-dhash + pigeonhole banding, media_near_dups) is "
    "pytest/invariant-covered — its signature has no SQL form.",
)
def q_image_dedup(spark, sf_dir):
    from featurestore_spark.operators.multimodal import dedup_media_exact

    with_img = _grouped_image_payloads(spark, sf_dir)
    return dedup_media_exact(with_img).select("keep_id", "n_bytes", "n_dups")


def _grouped_image_payloads(spark, sf_dir):
    """Shared media-dedup fixture (q_image_dedup +
    q_incremental_media_dedup — one definition, one oracle constant):
    spec-correct PNG/JPEG/GIF payloads in 97 duplicate groups
    (g = doc_id % 97 fully determines the bytes), every 31st doc a
    NULL payload. The oracles verify the group structure
    arithmetically (header math: PNG 33 B, JPEG 30+3*channels,
    GIF 13) since they cannot build the binary (PNG CRC)."""
    from featurestore_spark.operators.multimodal import build_image

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def synth(it):
        for pdf in it:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                if did % 31 == 0:
                    payloads.append(None)
                    continue
                g = did % 97
                fmt = ("png", "jpeg", "gif")[g % 3]
                w, h = 16 + (g * 7) % 240, 16 + (g * 13) % 240
                if fmt == "png":
                    c = 3 + g % 2
                elif fmt == "jpeg":
                    c = 1 if g % 5 == 0 else 3
                else:
                    c = 3
                payloads.append(build_image(fmt, w, h, c))
            yield pdf.assign(content=payloads)

    return docs.mapInPandas(synth, schema="doc_id long, content binary")


@_register(
    "q_incremental_media_dedup",
    """
    WITH batch AS (
      SELECT doc_id, doc_id % 97 AS g FROM documents
      WHERE doc_id % 7 <> 0 AND doc_id % 31 <> 0),
    corpus_g AS (
      SELECT DISTINCT doc_id % 97 AS g FROM documents
      WHERE doc_id % 7 = 0 AND doc_id % 31 <> 0),
    firsts AS (SELECT g, min(doc_id) AS doc_id FROM batch GROUP BY g)
    SELECT f.doc_id,
           CAST(CASE f.g % 3
                WHEN 0 THEN 33
                WHEN 1 THEN 30 + 3 * (CASE WHEN f.g % 5 = 0
                                           THEN 1 ELSE 3 END)
                ELSE 13 END AS BIGINT) AS n_bytes
    FROM firsts f
    WHERE f.g NOT IN (SELECT g FROM corpus_g)
    """,
    "Incremental recrawl MEDIA dedup (VERDICT r10 #4 — completes the "
    "against-index family for the multimodal surface; re-hosted "
    "byte-identical images are the dominant media-dup class): "
    "media_index on the corpus slice (doc_id%7=0), then "
    "dedup_media_against_index keeps each batch payload that is new "
    "to the index (md5 anti-join) and first within the batch. Same "
    "97-group synthesized payload fixture as q_image_dedup (one "
    "definition); the oracle replays the keep-set arithmetically "
    "(group membership + header byte math) since it cannot build "
    "the binary. The perceptual probe (byte-dhash banding vs the "
    "index, banded_hamming_probe) is pytest-covered — its signature "
    "has no SQL form. Index probe = equi-anti-join on the digest; "
    "payloads never shuffle.",
)
def q_incremental_media_dedup(spark, sf_dir):
    from featurestore_spark.operators.incremental import (
        dedup_media_against_index,
        media_index,
    )

    with_img = _grouped_image_payloads(spark, sf_dir)
    corpus = with_img.where(F.col("doc_id") % 7 == 0)
    batch = with_img.where(F.col("doc_id") % 7 != 0)
    idx = media_index(corpus)
    kept = dedup_media_against_index(batch, idx)
    return kept.select(
        "doc_id", F.length("content").cast("long").alias("n_bytes")
    )


@_register(
    "q_gif_frames",
    """
    WITH f AS (
      SELECT doc_id, unnest(generate_series(0, doc_id % 4)) AS fi
      FROM documents)
    SELECT doc_id, CAST(fi AS INTEGER) AS frame_idx,
           CAST(21 + 28 * fi AS BIGINT) AS frame_offset,
           CAST(fi AS INTEGER) AS frame_left,
           CAST((doc_id + fi) % 7 AS INTEGER) AS frame_top,
           CAST(4 + (doc_id + fi) % 9 AS INTEGER) AS frame_width,
           CAST(3 + (doc_id + 2 * fi) % 5 AS INTEGER) AS frame_height
    FROM f
    """,
    "REAL multi-frame GIF walk round-trip (closes the r9 "
    "sample_frames-is-a-stub residual for the one multi-frame format "
    "parseable without a codec): spec-correct GIF89a animations "
    "synthesized per doc_id (1 + doc_id%4 frames, graphic-control "
    "extension + 2-color local table + minimal LZW stream per "
    "frame), then sample_gif_frames walks the block stream inside "
    "mapInPandas emitting per-frame (offset, left, top, w, h). The "
    "oracle recomputes every descriptor arithmetically (frame k "
    "starts at byte 21 + 28k in this fixture), so any walker drift — "
    "extension skip, local-color-table sizing, sub-block walk — "
    "hash-mismatches. Video containers stay on the documented "
    "byte-offset stub (codec-bound).",
)
def q_gif_frames(spark, sf_dir):
    from featurestore_spark.operators.multimodal import (
        build_gif_animation,
        sample_gif_frames,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def synth(it):
        for pdf in it:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                frames = [
                    (
                        i,
                        (did + i) % 7,
                        4 + (did + i) % 9,
                        3 + (did + 2 * i) % 5,
                    )
                    for i in range(1 + did % 4)
                ]
                payloads.append(build_gif_animation(16, 12, frames))
            yield pdf.assign(content=payloads)

    with_gif = docs.mapInPandas(synth, schema="doc_id long, content binary")
    return sample_gif_frames(with_gif).select(
        "doc_id",
        "frame_idx",
        "frame_offset",
        "frame_left",
        "frame_top",
        "frame_width",
        "frame_height",
    )


@_register(
    "q_mp4_frames",
    """
    WITH f AS (
      SELECT doc_id, unnest(generate_series(0, doc_id % 4)) AS fi
      FROM documents),
    sized AS (
      SELECT doc_id, fi,
             10 + (doc_id + fi) % 5 AS sz,
             1 + (doc_id + 2 * fi) % 3 AS dlt
      FROM f)
    SELECT doc_id, CAST(fi AS INTEGER) AS frame_idx,
           CAST(24 + coalesce(sum(sz) OVER w, 0) AS BIGINT) AS frame_offset,
           CAST(sz AS BIGINT) AS frame_bytes,
           CAST(coalesce(sum(dlt) OVER w, 0) AS BIGINT) AS frame_dts,
           CAST(600 + doc_id % 10 AS BIGINT) AS timescale
    FROM sized
    WINDOW w AS (PARTITION BY doc_id ORDER BY fi
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    """,
    "REAL MP4/ISO-BMFF sample-table walk round-trip (VERDICT r10 #6 "
    "— retires the video byte-offset stub the way q_gif_frames did "
    "for animations): spec-correct fixtures built per doc_id "
    "(1 + doc_id%4 samples, arithmetic sizes/deltas, samples "
    "chunked in PAIRS so the stsc/stco resolution is genuinely "
    "exercised), walked back by parse_mp4_frames inside "
    "mapInPandas. The oracle recomputes every sample arithmetically "
    "— contiguous layout puts sample i at 24 + Σ sizes<i with DTS "
    "Σ deltas<i — so any drift in the box walk, stts/stsc run "
    "expansion, stsz table, or chunk-offset math hash-mismatches. "
    "Pure header arithmetic, no codec; payload bytes never shuffle "
    "(frames carry six small ints).",
)
def q_mp4_frames(spark, sf_dir):
    from featurestore_spark.operators.multimodal import (
        build_mp4_fixture,
        sample_mp4_frames,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def synth(it):
        for pdf in it:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                n = 1 + did % 4
                samples = [
                    (10 + (did + i) % 5, 1 + (did + 2 * i) % 3)
                    for i in range(n)
                ]
                chunk_lens = [2] * (n // 2) + ([1] if n % 2 else [])
                payloads.append(
                    build_mp4_fixture(
                        600 + did % 10, samples, chunk_lens=chunk_lens
                    )
                )
            yield pdf.assign(content=payloads)

    with_mp4 = docs.mapInPandas(synth, schema="doc_id long, content binary")
    return sample_mp4_frames(with_mp4).select(
        "doc_id",
        "frame_idx",
        "frame_offset",
        "frame_bytes",
        "frame_dts",
        "timescale",
    )


@_register(
    "q_wav",
    """
    SELECT doc_id,
      CASE WHEN doc_id % 7 = 0 THEN NULL
           ELSE CAST(1 + doc_id % 2 AS INTEGER) END AS n_channels,
      CASE WHEN doc_id % 7 = 0 THEN NULL
           ELSE CAST(8000 + (doc_id % 5) * 1000 AS INTEGER)
           END AS sample_rate,
      CASE WHEN doc_id % 7 = 0 THEN NULL
           ELSE CAST(8 * (1 + doc_id % 3) AS INTEGER)
           END AS bits_per_sample,
      CASE WHEN doc_id % 7 = 0 THEN NULL
           ELSE CAST(100 + doc_id % 50 AS BIGINT) END AS n_frames,
      CASE WHEN doc_id % 7 = 0 THEN NULL
           ELSE CAST(100 + doc_id % 50 AS DOUBLE)
                / (8000 + (doc_id % 5) * 1000) END AS duration_s
    FROM documents
    """,
    "REAL RIFF/WAVE chunk-walk round-trip — the audio row of the "
    "container-metadata family (image headers / GIF / MP4), closing "
    "the r11 evidence gap: spec-correct PCM WAV fixtures synthesized "
    "per doc_id (arithmetic channels/rate/bits/frames, plus a LIST "
    "metadata pre-chunk whose varying odd/even body length exercises "
    "the walker's even-offset pad path), walked back by "
    "with_wav_metadata inside Arrow mapInPandas; every 7th row is "
    "deliberately non-WAV and must yield NULLs (the family's "
    "nulls-not-failures contract). The oracle recomputes every field "
    "arithmetically, so drift in the chunk walk, fmt unpack, "
    "frame-count (data_size // block_align) or duration math "
    "hash-mismatches. Header bytes only — samples never decode, "
    "payloads never shuffle.",
)
def q_wav(spark, sf_dir):
    from featurestore_spark.operators.multimodal import (
        build_wav_fixture,
        with_wav_metadata,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def synth(it):
        for pdf in it:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                if did % 7 == 0:
                    payloads.append(b"ID3\x03notawav" + bytes(8))
                else:
                    payloads.append(
                        build_wav_fixture(
                            1 + did % 2,
                            8000 + (did % 5) * 1000,
                            8 * (1 + did % 3),
                            100 + did % 50,
                            pre_chunks=[(b"LIST", b"x" * (3 + did % 4))],
                        )
                    )
            yield pdf.assign(content=payloads)

    with_wav = docs.mapInPandas(synth, schema="doc_id long, content binary")
    return with_wav_metadata(with_wav).select(
        "doc_id",
        "n_channels",
        "sample_rate",
        "bits_per_sample",
        "n_frames",
        "duration_s",
    )


@_register(
    "q_embedding_topk",
    """
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 3),
    c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings WHERE vec_id >= 3),
    sims AS (
      SELECT query_id, neighbor_id,
             round(list_dot_product(qv, cv)
                   / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 6) AS sim
      FROM q CROSS JOIN c)
    SELECT query_id, CAST(rnk AS INTEGER) AS rnk, neighbor_id, sim
    FROM (SELECT query_id, neighbor_id, sim,
                 row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rnk
          FROM sims)
    WHERE rnk <= 5
    """,
    "Brute-force cosine top-k ANN baseline over embedding column",
)
def q_embedding_topk(spark, sf_dir):
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    as_double = F.col("embedding").cast("array<double>")
    base = emb.select("vec_id", as_double.alias("v"))
    q = base.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    c = base.where(F.col("vec_id") >= 3).select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv")
    )

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
        )

    sims = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "neighbor_id",
        F.round(
            dot(F.col("qv"), F.col("cv"))
            / (
                F.sqrt(dot(F.col("qv"), F.col("qv")))
                * F.sqrt(dot(F.col("cv"), F.col("cv")))
            ),
            6,
        ).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        sims.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 5)
        .select("query_id", "rnk", "neighbor_id", "sim")
    )


@_register(
    "q_embedding_ann_lsh",
    """
    WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    bucketed AS (
      SELECT vec_id, v,
             (CASE WHEN v[1] > 0 THEN 4 ELSE 0 END
              + CASE WHEN v[2] > 0 THEN 2 ELSE 0 END
              + CASE WHEN v[3] > 0 THEN 1 ELSE 0 END) AS bkt
      FROM base),
    q AS (SELECT vec_id AS query_id, v AS qv, bkt FROM bucketed WHERE vec_id < 5),
    c AS (SELECT vec_id AS neighbor_id, v AS cv, bkt FROM bucketed WHERE vec_id >= 5),
    sims AS (
      SELECT query_id, neighbor_id,
             round(list_dot_product(qv, cv)
                   / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 6) AS sim
      FROM q JOIN c USING (bkt))
    SELECT query_id, CAST(rnk AS INTEGER) AS rnk, neighbor_id, sim
    FROM (SELECT query_id, neighbor_id, sim,
                 row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rnk
          FROM sims)
    WHERE rnk <= 3
    """,
    "Sign-bucket LSH ANN: equi-join on bucket id instead of cross product",
)
def q_embedding_ann_lsh(spark, sf_dir):
    from featurestore_spark.operators.similarity import (
        as_double_array,
        bucketed_ann_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select("vec_id", as_double_array("embedding").alias("v"))
    q = base.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    c = base.where(F.col("vec_id") >= 5).select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv")
    )
    return bucketed_ann_topk(q, c, k=3, bits=3)


def _srp_pairs_oracle(
    threshold: float,
    *,
    dim: int = 64,
    bits: int = 8,
    bands: int = 6,
    seed: int = 42,
    max_bucket: int = 1000,
) -> str:
    """DuckDB replay of `embedding_near_dups`' SRP-LSH blocking: the
    SAME LCG hyperplane constants are inlined as literals, vectors are
    integer-quantized identically (round(x*1000) — exact arithmetic,
    so the sign bits cannot diverge between engines), and the
    max_bucket guard counts distinct vectors per (band, code) exactly
    as the Spark side does."""
    from featurestore_spark.operators.similarity import srp_hyperplanes

    hp = srp_hyperplanes(dim, bits * bands, seed)

    def band_code(b: int) -> str:
        terms = []
        for j in range(bits):
            arr = "[" + ", ".join(f"{w}.0" for w in hp[b * bits + j]) + "]"
            terms.append(f"(list_dot_product(q, {arr}) > 0)::INT * {1 << j}")
        return " + ".join(terms)

    codes_union = "\n      UNION ALL\n      ".join(
        f"SELECT rep_id, {b} AS band_idx, {band_code(b)} AS code FROM reps_q"
        for b in range(bands)
    )
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    reps AS (SELECT v, min(vec_id) AS rep_id, list_sort(list(vec_id)) AS members,
                    sqrt(list_dot_product(v, v)) AS nrm
             FROM e GROUP BY v),
    reps_q AS (SELECT rep_id, list_transform(v, x -> round(x * 1000)) AS q
               FROM reps),
    codes AS (
      {codes_union}),
    sizes AS (SELECT band_idx, code, count(*) AS n FROM codes
              GROUP BY band_idx, code),
    cand AS (SELECT DISTINCT a.rep_id AS ra, b.rep_id AS rb
             FROM codes a
             JOIN codes b ON a.band_idx = b.band_idx AND a.code = b.code
                          AND a.rep_id < b.rep_id
             JOIN sizes s ON s.band_idx = a.band_idx AND s.code = a.code
             WHERE s.n >= 2 AND s.n <= {max_bucket}),
    inter_hits AS (SELECT pa.members AS ma, pb.members AS mb,
                          round(list_dot_product(pa.v, pb.v)
                                / (pa.nrm * pb.nrm), 6) AS sim
                   FROM cand
                   JOIN reps pa ON pa.rep_id = cand.ra
                   JOIN reps pb ON pb.rep_id = cand.rb
                   WHERE round(list_dot_product(pa.v, pb.v)
                               / (pa.nrm * pb.nrm), 6) >= {threshold}),
    inter_pairs AS (
      SELECT least(xa, xb) AS a_id, greatest(xa, xb) AS b_id, sim
      FROM (SELECT xa, unnest(mb) AS xb, sim
            FROM (SELECT unnest(ma) AS xa, mb, sim FROM inter_hits))),
    intra_hits AS (SELECT members,
                          round(list_dot_product(v, v) / (nrm * nrm), 6) AS sim
                   FROM reps
                   WHERE len(members) > 1
                     AND round(list_dot_product(v, v) / (nrm * nrm), 6)
                         >= {threshold}),
    intra_pairs AS (
      SELECT xa AS a_id, xb AS b_id, sim
      FROM (SELECT xa, unnest(members) AS xb, sim
            FROM (SELECT unnest(members) AS xa, members, sim FROM intra_hits))
      WHERE xa < xb)
    SELECT a_id, b_id, sim FROM inter_pairs
    UNION ALL
    SELECT a_id, b_id, sim FROM intra_pairs
    """


@_register(
    "q_embedding_near_dups",
    _srp_pairs_oracle(0.35),
    "Embedding-cosine near-dup pairs via seeded random-hyperplane "
    "SRP-LSH banding (8 bits x 6 bands, max_bucket guard) over "
    "distinct vectors — corpus-scale blocking, not the 8-bucket "
    "leading-sign join; the oracle replays the identical hyperplanes "
    "and integer-quantized sign bits.",
)
def q_embedding_near_dups(spark, sf_dir):
    from featurestore_spark.operators.similarity import embedding_near_dups

    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_near_dups(emb, threshold=0.35, dim=64)


def _srp_incremental_oracle(
    threshold: float,
    *,
    dim: int = 64,
    bits: int = 8,
    bands: int = 6,
    seed: int = 42,
    max_bucket: int = 1000,
) -> str:
    """Two-corpus replay of `incremental.dedup_embeddings_against_index`:
    SRP band codes (same inlined hyperplanes as `_srp_pairs_oracle`)
    for base (vec_id % 3 <> 0) and batch (vec_id % 3 = 0) distinct
    vectors, code-collision candidates capped on the index side,
    cosine verify, drops expanded through the batch's exact-duplicate
    vector groups."""
    from featurestore_spark.operators.similarity import srp_hyperplanes

    hp = srp_hyperplanes(dim, bits * bands, seed)

    def band_code(b: int) -> str:
        terms = []
        for j in range(bits):
            arr = "[" + ", ".join(f"{w}.0" for w in hp[b * bits + j]) + "]"
            terms.append(f"(list_dot_product(q, {arr}) > 0)::INT * {1 << j}")
        return " + ".join(terms)

    def codes_union(src: str) -> str:
        return "\n      UNION ALL\n      ".join(
            f"SELECT rep_id, {b} AS band_idx, {band_code(b)} AS code FROM {src}"
            for b in range(bands)
        )

    return f"""
    WITH eb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
                WHERE vec_id % 3 <> 0),
    reps_b AS (SELECT v, min(vec_id) AS rep_id,
                      sqrt(list_dot_product(v, v)) AS nrm
               FROM eb GROUP BY v),
    repsq_b AS (SELECT rep_id, list_transform(v, x -> round(x * 1000)) AS q
                FROM reps_b),
    codes_b AS (
      {codes_union("repsq_b")}),
    eq AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
           WHERE vec_id % 3 = 0),
    grp_q AS (SELECT v, min(vec_id) AS rep_id FROM eq GROUP BY v),
    repsq_q AS (SELECT rep_id, list_transform(v, x -> round(x * 1000)) AS q
                FROM grp_q),
    codes_q AS (
      {codes_union("repsq_q")}),
    sizes AS (SELECT band_idx, code, count(*) AS n FROM codes_b
              GROUP BY band_idx, code),
    cand AS (SELECT DISTINCT cq.rep_id AS q_id, cb.rep_id AS b_id
             FROM codes_q cq
             JOIN codes_b cb ON cq.band_idx = cb.band_idx
                            AND cq.code = cb.code
             JOIN sizes s ON s.band_idx = cq.band_idx AND s.code = cq.code
             WHERE s.n <= {max_bucket}),
    verified AS (SELECT DISTINCT c.q_id
                 FROM cand c
                 JOIN grp_q gq ON gq.rep_id = c.q_id
                 JOIN reps_b rb ON rb.rep_id = c.b_id
                 WHERE round(list_dot_product(gq.v, rb.v)
                       / (sqrt(list_dot_product(gq.v, gq.v)) * rb.nrm), 6)
                       >= {threshold}),
    -- cap-independent exact stage (mirrors the vec_h1/vec_h2
    -- semi-join; null vectors excluded — they are never hashed)
    exact_q AS (SELECT DISTINCT gq.rep_id FROM grp_q gq
                JOIN reps_b rb ON rb.v = gq.v
                WHERE gq.v IS NOT NULL),
    drops AS (SELECT e.vec_id AS d FROM eq e
              JOIN grp_q g ON g.v = e.v
              WHERE g.rep_id IN (SELECT q_id FROM verified)
                 OR g.rep_id IN (SELECT rep_id FROM exact_q))
    SELECT e.vec_id FROM embeddings e
    LEFT JOIN drops ON e.vec_id = drops.d
    WHERE e.vec_id % 3 = 0 AND drops.d IS NULL
    """


@_register(
    "q_incremental_embedding_dedup",
    _srp_incremental_oracle(0.35),
    "Incremental embedding dedup: the incoming batch (vec_id % 3 = 0) "
    "deduped against a persisted SRP band-code index of the accepted "
    "corpus (vec_id % 3 <> 0) — code collide, cosine>=0.35 verify "
    "against only the candidate corpus reps, drops expanded through "
    "the batch's exact-duplicate vector groups",
)
def q_incremental_embedding_dedup(spark, sf_dir):
    from featurestore_spark.operators.incremental import (
        dedup_embeddings_against_index,
        srp_code_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.where(F.col("vec_id") % 3 != 0)
    batch = emb.where(F.col("vec_id") % 3 == 0)
    idx = srp_code_index(base, dim=64)
    return dedup_embeddings_against_index(
        batch, idx, base=base, threshold=0.35, dim=64
    ).select("vec_id")


# ---------------------------------------------------------------------------
# Corpus curation (beyond-the-reference: repetition, decontamination, PII)
# ---------------------------------------------------------------------------

_DUCK_BIGRAM_COUNTS = r"""
    WITH toked AS (
      SELECT doc_id, text,
             regexp_split_to_array(trim(lower(text)), '\s+') AS toks
      FROM documents),
    grams AS (
      SELECT doc_id, CASE WHEN len(toks) >= 2
               THEN list_transform(generate_series(1, len(toks) - 1),
                                   i -> toks[i] || ' ' || toks[i+1])
               ELSE [] END AS g
      FROM toked),
    counts AS (
      SELECT doc_id, gram, count(*) AS c
      FROM (SELECT doc_id, unnest(g) AS gram FROM grams)
      GROUP BY doc_id, gram)
"""


@_register(
    "q_repetition",
    _DUCK_BIGRAM_COUNTS
    + """,
    agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_ngrams,
                   CAST(max(c) AS BIGINT) AS top_ngram_count,
                   CAST(coalesce(sum(c) FILTER (WHERE c > 1), 0) AS BIGINT)
                     AS dup_ngram_count
            FROM counts GROUP BY doc_id)
    SELECT t.doc_id,
           coalesce(a.n_ngrams, 0) AS n_ngrams,
           coalesce(a.top_ngram_count, 0) AS top_ngram_count,
           coalesce(a.dup_ngram_count, 0) AS dup_ngram_count,
           round(CAST(a.top_ngram_count AS DOUBLE) / a.n_ngrams, 3)
             AS top_ngram_frac,
           round(CAST(a.dup_ngram_count AS DOUBLE) / a.n_ngrams, 3)
             AS dup_ngram_frac
    FROM toked t LEFT JOIN agg a USING (doc_id)
    """,
    "Gopher-style repetition metrics per doc (bigram totals, top-gram "
    "coverage, duplicated-gram fraction). Spark side is shuffle-FREE "
    "(sorted-array run-length fold in one projection); the oracle uses "
    "the classic unnest + double group-by.",
)
def q_repetition(spark, sf_dir):
    """Within-document repetition: the oracle explodes every bigram and
    aggregates twice (the formulation that shuffles |docs|x|tokens| rows
    at corpus scale); the Spark operator folds run-lengths over the
    per-row sorted bigram array — identical numbers, zero shuffles."""
    from featurestore_spark.operators.curation import repetition_metrics

    docs = load_table(spark, sf_dir, "documents")
    return repetition_metrics(docs, n=2)


@_register(
    "q_decontaminate",
    r"""
    WITH toked AS (
      SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
      FROM documents),
    sh AS (
      SELECT doc_id, unnest(list_distinct(CASE WHEN len(toks) >= 4
               THEN list_transform(generate_series(1, len(toks) - 3),
                                   i -> array_to_string(toks[i:i+3], ' '))
               ELSE [array_to_string(toks, ' ')] END)) AS s
      FROM toked),
    probes AS (SELECT doc_id AS probe_id, s FROM sh WHERE doc_id % 29 = 0),
    corpus AS (SELECT doc_id, s FROM sh WHERE doc_id % 29 <> 0)
    SELECT doc_id,
           CAST(count(DISTINCT probe_id) AS BIGINT) AS n_probes_hit,
           CAST(count(DISTINCT s) AS BIGINT) AS n_shared_shingles
    FROM corpus JOIN probes USING (s)
    GROUP BY doc_id
    """,
    "Benchmark decontamination: corpus docs sharing a 4-gram shingle "
    "with the probe set (docs where doc_id % 29 = 0 stand in for a "
    "held-out benchmark). Probe side broadcast; corpus never shuffles "
    "before the per-doc aggregate.",
)
def q_decontaminate(spark, sf_dir):
    from featurestore_spark.operators.curation import decontaminate

    docs = load_table(spark, sf_dir, "documents")
    probes = docs.where(F.col("doc_id") % 29 == 0).select(
        F.col("doc_id").alias("probe_id"), "text"
    )
    corpus = docs.where(F.col("doc_id") % 29 != 0)
    return decontaminate(corpus, probes, n=4)


@_register(
    "q_redact_pii",
    r"""
    WITH aug AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN text || ' contact user'
                    || CAST(doc_id AS VARCHAR)
                    || '@example.com or admin@test.org'
                  WHEN doc_id % 3 = 1 THEN text || ' see https://example.com/d/'
                    || CAST(doc_id AS VARCHAR) || '?u=x@y.io now'
                  ELSE text END AS t
      FROM documents),
    red AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(t, 'https?://[^\s]+')) AS INTEGER)
               AS n_urls,
             regexp_replace(t, 'https?://[^\s]+', '<URL>', 'g') AS t_url
      FROM aug)
    SELECT doc_id, n_urls,
           CAST(len(regexp_extract_all(t_url,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER)
             AS n_emails,
           md5(regexp_replace(t_url,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'))
             AS red_md5
    FROM red
    """,
    "PII/URL redaction: deterministic synthetic emails/URLs injected "
    "per doc_id band, then regex-redacted with counts; URL pass runs "
    "first so a URL-embedded email redacts once. md5 of the redacted "
    "text makes the compare engine-exact.",
)
def q_redact_pii(spark, sf_dir):
    from featurestore_spark.operators.curation import redact_pii

    docs = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    aug = docs.withColumn(
        "t",
        F.when(
            did % 3 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                did.cast("string"),
                F.lit("@example.com or admin@test.org"),
            ),
        )
        .when(
            did % 3 == 1,
            F.concat(
                F.col("text"),
                F.lit(" see https://example.com/d/"),
                did.cast("string"),
                F.lit("?u=x@y.io now"),
            ),
        )
        .otherwise(F.col("text")),
    )
    out = redact_pii(aug, "t", out_col="t_red")
    return out.select(
        "doc_id", "n_urls", "n_emails", F.md5(F.col("t_red")).alias("red_md5")
    )


def _quality_filter_oracle() -> str:
    from featurestore_spark.operators.text import LANG_LEXICONS

    score_exprs = []
    for lang, lex in LANG_LEXICONS.items():
        arr = "[" + ", ".join(f"'{w}'" for w in lex) + "]"
        score_exprs.append(
            f"len(list_filter(toks, t -> list_contains({arr}, t)))"
            f" AS {lang}_score"
        )
    langs = list(LANG_LEXICONS)
    cases = []
    for lang in langs:
        conds = " AND ".join(f"{lang}_score >= {o}_score" for o in langs if o != lang)
        cases.append(f"WHEN {conds} THEN '{lang}'")
    pred = "CASE " + " ".join(cases) + f" ELSE '{langs[-1]}' END"
    return rf"""
    WITH toked AS (
      SELECT doc_id, text,
             regexp_split_to_array(trim(lower(text)), '\s+') AS toks
      FROM documents),
    base AS (
      SELECT doc_id, CAST(len(toks) AS INTEGER) AS n_tokens,
             round(CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                        AS DOUBLE) / length(text), 3) AS alpha_ratio,
             {", ".join(score_exprs)}
      FROM toked),
    lang AS (SELECT doc_id, n_tokens, alpha_ratio, {pred} AS lang_pred FROM base),
    grams AS (
      SELECT doc_id, CASE WHEN len(toks) >= 2
               THEN list_transform(generate_series(1, len(toks) - 1),
                                   i -> toks[i] || ' ' || toks[i+1])
               ELSE [] END AS g
      FROM toked),
    counts AS (
      SELECT doc_id, gram, count(*) AS c
      FROM (SELECT doc_id, unnest(g) AS gram FROM grams)
      GROUP BY doc_id, gram),
    rep AS (SELECT doc_id, round(CAST(max(c) AS DOUBLE) / sum(c), 3)
                     AS top_ngram_frac
            FROM counts GROUP BY doc_id),
    flagged AS (
      SELECT l.doc_id, n_tokens, alpha_ratio, top_ngram_frac, lang_pred,
             concat_ws(',',
               CASE WHEN n_tokens < 25 THEN 'too_short' END,
               CASE WHEN alpha_ratio < 0.81 THEN 'low_alpha' END,
               CASE WHEN top_ngram_frac > 0.08 THEN 'repetitive' END,
               CASE WHEN lang_pred <> 'en' THEN 'non_english' END)
               AS fail_reasons
      FROM lang l LEFT JOIN rep USING (doc_id))
    SELECT doc_id, n_tokens, alpha_ratio, top_ngram_frac, lang_pred,
           fail_reasons, fail_reasons = '' AS keep
    FROM flagged
    """


@_register(
    "q_quality_filter",
    _quality_filter_oracle(),
    "Composite C4/Gopher-style keep/drop gate: token-count floor, "
    "alpha-ratio floor, top-bigram repetition ceiling, language gate — "
    "fail reasons concatenated, keep = no failures. Composes "
    "quality_metrics + language_scores + repetition_metrics.",
)
def q_quality_filter(spark, sf_dir):
    from featurestore_spark.operators.curation import repetition_metrics
    from featurestore_spark.operators.text import language_scores, quality_metrics

    docs = load_table(spark, sf_dir, "documents")
    base = language_scores(quality_metrics(docs))
    rep = repetition_metrics(docs, n=2).select("doc_id", "top_ngram_frac")
    j = base.join(rep, "doc_id")
    reasons = F.concat_ws(
        ",",
        F.when(F.col("n_tokens") < 25, "too_short"),
        F.when(F.col("alpha_ratio") < 0.81, "low_alpha"),
        F.when(F.col("top_ngram_frac") > 0.08, "repetitive"),
        F.when(F.col("lang_pred") != "en", "non_english"),
    )
    return j.select(
        "doc_id",
        "n_tokens",
        "alpha_ratio",
        "top_ngram_frac",
        "lang_pred",
        reasons.alias("fail_reasons"),
        (reasons == "").alias("keep"),
    )


# ---------------------------------------------------------------------------
# Temporal joins (as-of / interval / rollup — operators/temporal.py)
# ---------------------------------------------------------------------------


@_register(
    "q_asof_purchase",
    """
    WITH p AS (SELECT user_id, ts, max(event_id) AS eid
               FROM events WHERE event_type = 'purchase'
               GROUP BY user_id, ts)
    SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us, p.eid AS p_eid,
           epoch_us(e.ts) - epoch_us(p.ts) AS us_since
    FROM events e ASOF LEFT JOIN p
      ON e.user_id = p.user_id AND e.ts >= p.ts
    """,
    "Backward as-of join: every event gains the latest same-user "
    "purchase at-or-before it. Spark side is union + carry-forward "
    "window (one shuffle, no range predicate); oracle is DuckDB's "
    "native ASOF LEFT JOIN.",
)
def q_asof_purchase(spark, sf_dir):
    """As-of join re-expressed for Spark (no native ASOF): tag-union
    both sides, single window shuffle on user_id, last(ignorenulls)
    carry-forward. A naive l.ts >= r.ts join would plan as
    BroadcastNestedLoop — this never creates a range condition."""
    from featurestore_spark.operators.temporal import asof_join

    ev = _events(spark, sf_dir)
    p = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("eid"))
    )
    out = asof_join(
        ev, p, on="user_id", left_ts="ts", right_ts="ts",
        right_cols=["eid"], prefix="p_",
    )
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.col("p_eid"),
        (F.unix_micros("ts") - F.unix_micros("p_ts")).alias("us_since"),
    )


@_register(
    "q_interval_join",
    """
    WITH p AS (SELECT event_id AS p_eid, user_id, epoch_us(ts) AS s_us,
                      epoch_us(ts) + 3600000000 AS e_us
               FROM events WHERE event_type = 'purchase')
    SELECT p_eid, CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(round(e.value * 100, 0) AS BIGINT)) AS BIGINT)
             AS sum_value_cents
    FROM p JOIN events e
      ON p.user_id = e.user_id AND epoch_us(e.ts) BETWEEN p.s_us AND p.e_us
    GROUP BY p_eid
    """,
    "Interval join: same-user events inside [purchase, purchase+1h], "
    "aggregated per purchase. Spark side explodes intervals into hour "
    "bins and hash-joins on (user, bin) — a plain equi-join, never a "
    "nested loop; oracle uses the direct range predicate.",
)
def q_interval_join(spark, sf_dir):
    from featurestore_spark.operators.temporal import interval_join

    ev = _events(spark, sf_dir)
    hour_us = 3600 * 1_000_000
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_eid"),
        "user_id",
        F.col("ts").alias("start_ts"),
        F.timestamp_micros(F.unix_micros("ts") + hour_us).alias("end_ts"),
    )
    pts = ev.select("user_id", "ts", "value")
    j = interval_join(
        pts, p, on="user_id", point_ts="ts",
        start_ts="start_ts", end_ts="end_ts", bin_width_s=3600,
    )
    return j.groupBy("p_eid").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias(
            "sum_value_cents"
        ),
    )


@_register(
    "q_time_rollup",
    """
    SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
             AS sum_value_cents
    FROM events
    GROUP BY ROLLUP(strftime(ts, '%Y-%m-%d'), event_type)
    """,
    "Hypertable-style rollup: (day, event_type) cells, per-day "
    "subtotals, grand total — ROLLUP grouping sets, one shuffle with "
    "map-side partial aggregation of every level.",
)
def q_time_rollup(spark, sf_dir):
    from featurestore_spark.operators.temporal import time_rollup

    ev = _events(spark, sf_dir)
    return time_rollup(
        ev,
        ts_col="ts",
        group_cols=["event_type"],
        aggs=[
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias(
                "sum_value_cents"
            ),
        ],
    )


@_register(
    "q_attribution",
    """
    SELECT c.user_id, c.event_id AS click_id, epoch_us(c.ts) AS click_us,
           p.event_id AS purchase_id, epoch_us(p.ts) AS purchase_us
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND epoch_us(p.ts) BETWEEN epoch_us(c.ts) AND epoch_us(c.ts) + 3600000000
    """,
    "Click-to-purchase attribution pairs within a 1h horizon — the "
    "batch twin of streaming/ops.streaming_attribution (the streaming "
    "form adds watermarks + state eviction; test_streaming_attribution "
    "asserts stream == batch).",
)
def q_attribution(spark, sf_dir):
    from featurestore_spark.streaming import streaming_attribution

    ev = _events(spark, sf_dir)
    out = streaming_attribution(
        ev.where(F.col("event_type") == "click"),
        ev.where(F.col("event_type") == "purchase"),
        horizon="1 hour",
    )
    return out.select(
        "user_id",
        "click_id",
        F.unix_micros("click_ts").alias("click_us"),
        "purchase_id",
        F.unix_micros("purchase_ts").alias("purchase_us"),
    )


@_register(
    "q_ivf_assign",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    c AS (SELECT vec_id AS centroid_id, v AS cv FROM e WHERE vec_id < 8),
    d AS (SELECT e.vec_id, c.centroid_id,
                 round(list_sum(list_transform(generate_series(1, len(e.v)),
                         i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i]))), 6)
                   AS d2
          FROM e CROSS JOIN c)
    SELECT vec_id, centroid_id, d2 AS dist2
    FROM (SELECT vec_id, centroid_id, d2,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY d2, centroid_id) AS rn
          FROM d)
    WHERE rn = 1
    """,
    "IVF nearest-centroid assignment against fixed centroids (vec_id "
    "< 8 as the codebook): broadcast argmin keyed on the scalar row "
    "id. Distances rounded before the argmin so the assignment is "
    "engine-exact; ties break on centroid id.",
)
def q_ivf_assign(spark, sf_dir):
    from featurestore_spark.operators.similarity import (
        as_double_array,
        assign_to_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"),
        as_double_array("embedding").alias("centroid"),
    )
    return assign_to_centroids(emb, cents)


@_register(
    "q_boilerplate",
    r"""
    WITH toked AS (
      SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
      FROM documents),
    sh AS (
      SELECT doc_id, len(shl) AS n_shingles, unnest(shl) AS s
      FROM (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 5
               THEN list_transform(generate_series(1, len(toks) - 4),
                                   i -> array_to_string(toks[i:i+4], ' '))
               ELSE [array_to_string(toks, ' ')] END) AS shl
            FROM toked)),
    span AS (SELECT s, CAST(count(*) AS BIGINT) AS span_df FROM sh
             GROUP BY s HAVING count(*) >= 2)
    SELECT doc_id,
           CAST(any_value(n_shingles) AS INTEGER) AS n_shingles,
           CAST(count(*) AS BIGINT) AS n_boilerplate,
           round(CAST(count(*) AS DOUBLE) / any_value(n_shingles), 3)
             AS boilerplate_frac,
           max(span_df) AS max_span_df
    FROM sh JOIN span USING (s)
    GROUP BY doc_id
    """,
    "Cross-document boilerplate: 5-gram spans present in >= 2 distinct "
    "docs (C4-style repeated-span removal signal); per-doc span "
    "counts and fraction. One shuffle on the span key + broadcast of "
    "the boilerplate vocabulary.",
)
def q_boilerplate(spark, sf_dir):
    from featurestore_spark.operators.curation import boilerplate_flags

    docs = load_table(spark, sf_dir, "documents")
    return boilerplate_flags(docs, n=5, min_df=2)


@_register(
    "q_corpus_stats",
    r"""
    WITH t AS (SELECT len(regexp_split_to_array(trim(lower(text)), '\s+'))
                 AS nt FROM documents)
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(nt) AS BIGINT) AS total_tokens,
           round(avg(nt), 3) AS mean_tokens,
           round(quantile_cont(nt, 0.5), 4) AS p50,
           round(quantile_cont(nt, 0.9), 4) AS p90,
           round(quantile_cont(nt, 0.99), 4) AS p99
    FROM t
    """,
    "Corpus size/length profile: doc count, token totals, exact "
    "token-count percentiles (R-7 interpolation in both engines, "
    "rounded to absorb ulps). Single-pass aggregate.",
)
def q_corpus_stats(spark, sf_dir):
    from featurestore_spark.operators.text import token_count

    docs = load_table(spark, sf_dir, "documents")
    # exact percentile() is safe at scale HERE because nt is a small
    # integer: the aggregation buffer is a value->count map (merged
    # map-side), O(distinct token counts) = O(max doc length), not
    # O(rows). For unbounded-cardinality columns use approx_percentile.
    return docs.select(token_count("text").alias("nt")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("nt").cast("bigint").alias("total_tokens"),
        F.round(F.avg("nt"), 3).alias("mean_tokens"),
        F.round(F.expr("percentile(nt, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(nt, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(nt, 0.99)"), 4).alias("p99"),
    )


@_register(
    "q_vocab_topk",
    r"""
    SELECT tok, CAST(count(*) AS BIGINT) AS n
    FROM (SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+'))
            AS tok FROM documents)
    GROUP BY tok
    ORDER BY n DESC, tok
    LIMIT 20
    """,
    "Corpus vocabulary head: top-20 tokens by frequency "
    "(deterministic total order: count desc, token asc). Explode + "
    "one map-side-combined shuffle + global top-k.",
)
def q_vocab_topk(spark, sf_dir):
    from featurestore_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "tok")
        .limit(20)
    )


@_register(
    "q_mixture_sample",
    """
    WITH kept AS (
      SELECT doc_id, source
      FROM documents
      WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7))
                 AS UBIGINT) % 1000000
            < CASE WHEN source = 'src0' THEN 100000
                   WHEN source = 'src1' THEN 500000
                   ELSE 900000 END)
    SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
           CAST(min(doc_id) AS BIGINT) AS min_doc,
           CAST(max(doc_id) AS BIGINT) AS max_doc
    FROM kept GROUP BY source
    """,
    "Pretraining mixture sampling: per-source keep rates (src0 10%, "
    "src1 50%, rest 90%) decided by each row's stable md5 bucket — "
    "reproducible across engines and stable under corpus growth. "
    "Filter-only, no shuffle before the audit aggregate.",
)
def q_mixture_sample(spark, sf_dir):
    from featurestore_spark.operators.sampling import mixture_sample

    docs = load_table(spark, sf_dir, "documents")
    kept = mixture_sample(
        docs, {"src0": 0.1, "src1": 0.5}, default_rate=0.9
    )
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


@_register(
    "q_quality_buckets",
    r"""
    WITH scored AS (
      SELECT doc_id,
             round(CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                        AS DOUBLE) / length(text), 3) AS alpha_ratio
      FROM documents)
    SELECT doc_id, alpha_ratio,
           CAST(ntile(4) OVER (ORDER BY alpha_ratio, doc_id) AS INTEGER)
             AS quality_bucket
    FROM scored
    """,
    "Curriculum bucketing: quartile assignment over a quality score "
    "(ntile on a deterministic total order — rounded score, then "
    "doc_id). Single global sort; at corpus scale ntile over a "
    "pre-aggregated histogram replaces the sort.",
)
def q_quality_buckets(spark, sf_dir):
    """Curriculum quartiles over the whole corpus. A bare
    `Window.orderBy` ntile funnels 100 TB through ONE task; the
    distributed `global_ntile` (range partition + per-partition
    offsets) produces the identical bucket assignment with every
    partition working."""
    from featurestore_spark.operators.sampling import global_ntile
    from featurestore_spark.operators.text import quality_metrics

    docs = load_table(spark, sf_dir, "documents")
    return global_ntile(
        quality_metrics(docs).select("doc_id", "alpha_ratio"),
        ["alpha_ratio", "doc_id"],
        4,
        bucket_col="quality_bucket",
    )


@_register(
    "q_chunk_documents",
    r"""
    WITH toked AS (
      SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
      FROM documents),
    chunks AS (
      SELECT doc_id, toks,
             unnest(generate_series(0,
               greatest(CAST(ceil(len(toks) / 32.0) AS INTEGER), 1) - 1))
               AS chunk_idx
      FROM toked)
    SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
           CAST(len(toks[chunk_idx * 32 + 1 : chunk_idx * 32 + 32])
                AS INTEGER) AS n_chunk_tokens,
           md5(array_to_string(toks[chunk_idx * 32 + 1 : chunk_idx * 32 + 32],
               ' ')) AS chunk_md5
    FROM chunks
    """,
    "Fixed-window chunking: each doc split into 32-token training "
    "chunks (final chunk = remainder). Pure projection + bounded "
    "explode; chunk text compared by md5.",
)
def q_chunk_documents(spark, sf_dir):
    from featurestore_spark.operators.curation import chunk_documents

    docs = load_table(spark, sf_dir, "documents")
    out = chunk_documents(docs, window=32)
    return out.select(
        "doc_id",
        "chunk_idx",
        "n_chunk_tokens",
        F.md5(F.col("chunk_text")).alias("chunk_md5"),
    )


@_register(
    "q_pack_chunks",
    r"""
    WITH RECURSIVE toked AS (
      SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
      FROM documents),
    chunks AS (
      SELECT doc_id, toks,
             unnest(generate_series(0,
               greatest(CAST(ceil(len(toks) / 32.0) AS INTEGER), 1) - 1))
               AS chunk_idx
      FROM toked),
    sized AS (
      SELECT CAST(doc_id % 8 AS INTEGER) AS pack_group, doc_id,
             CAST(chunk_idx AS INTEGER) AS chunk_idx,
             CAST(len(toks[chunk_idx * 32 + 1 : chunk_idx * 32 + 32])
                  AS INTEGER) AS n_chunk_tokens
      FROM chunks),
    ordered AS (
      SELECT *, row_number() OVER (PARTITION BY pack_group
                                   ORDER BY doc_id, chunk_idx) AS rn
      FROM sized),
    walk AS (
      SELECT pack_group, rn, doc_id, chunk_idx, n_chunk_tokens,
             CAST(0 AS BIGINT) AS bin_id,
             CAST(n_chunk_tokens AS BIGINT) AS bin_fill
      FROM ordered WHERE rn = 1
      UNION ALL
      SELECT o.pack_group, o.rn, o.doc_id, o.chunk_idx, o.n_chunk_tokens,
             CASE WHEN w.bin_fill > 0 AND w.bin_fill + o.n_chunk_tokens > 128
                  THEN w.bin_id + 1 ELSE w.bin_id END,
             CASE WHEN w.bin_fill > 0 AND w.bin_fill + o.n_chunk_tokens > 128
                  THEN CAST(o.n_chunk_tokens AS BIGINT)
                  ELSE w.bin_fill + o.n_chunk_tokens END
      FROM walk w
      JOIN ordered o ON o.pack_group = w.pack_group AND o.rn = w.rn + 1)
    SELECT pack_group, doc_id, chunk_idx, n_chunk_tokens, bin_id, bin_fill
    FROM walk
    """,
    "Greedy next-fit sequence packing into 128-token bins per pack "
    "group (doc_id % 8), chunks taken in (doc_id, chunk_idx) order — "
    "the packing loop is inherently sequential, so the oracle replays "
    "it as a recursive CTE walking each group row by row (the "
    "previously pytest-only LLM op, now driver-checkable).",
)
def q_pack_chunks(spark, sf_dir):
    from featurestore_spark.operators.curation import chunk_documents, pack_chunks

    docs = load_table(spark, sf_dir, "documents")
    chunks = chunk_documents(docs, window=32).withColumn(
        "pack_group", (F.col("doc_id") % 8).cast("int")
    )
    packed = pack_chunks(
        chunks.select("pack_group", "doc_id", "chunk_idx", "n_chunk_tokens"),
        budget=128,
    )
    return packed.select(
        "pack_group", "doc_id", "chunk_idx", "n_chunk_tokens", "bin_id", "bin_fill"
    )


@_register(
    "q_dedup_lines",
    r"""
    WITH toked AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
      FROM documents),
    chunked AS (
      SELECT doc_id, toks,
             unnest(generate_series(0,
               greatest(CAST(ceil(len(toks) / 5.0) AS INTEGER), 1) - 1)) AS i
      FROM toked),
    lines AS (
      SELECT doc_id, i AS pos,
             array_to_string(toks[i * 5 + 1 : i * 5 + 5], ' ') AS line
      FROM chunked),
    freq AS (
      SELECT lower(trim(line)) AS norm
      FROM lines WHERE lower(trim(line)) <> ''
      GROUP BY 1 HAVING count(DISTINCT doc_id) > 1),
    kept AS (
      SELECT l.doc_id, l.pos, l.line FROM lines l
      LEFT JOIN freq f ON lower(trim(l.line)) = f.norm
      WHERE f.norm IS NULL),
    counts AS (SELECT doc_id, count(*) AS n_lines FROM lines GROUP BY doc_id),
    rebuilt AS (
      SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text,
             count(*) AS n_kept
      FROM kept GROUP BY doc_id)
    SELECT c.doc_id, md5(coalesce(r.text, '')) AS text_md5,
           CAST(c.n_lines AS INTEGER) AS n_lines,
           CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_lines_kept
    FROM counts c LEFT JOIN rebuilt r USING (doc_id)
    """,
    "CCNet/RefinedWeb line-level dedup: documents recast as 5-token "
    "lines, then every line appearing in >1 distinct docs dropped "
    "corpus-wide and texts rebuilt in order (md5-compared). The "
    "counting pass shuffles only (xxhash64, doc_id); only affected "
    "docs are exploded and rebuilt.",
)
def q_dedup_lines(spark, sf_dir):
    from featurestore_spark.operators.curation import dedup_lines

    docs = load_table(spark, sf_dir, "documents")
    built = _built_lines(docs)
    out = dedup_lines(built, max_docs=1)
    return out.select(
        "doc_id",
        F.md5(F.col("text")).alias("text_md5"),
        "n_lines",
        F.col("n_lines_kept").cast("long").alias("n_lines_kept"),
    )


def _built_lines(docs):
    """Documents recast as 5-token lines joined with newlines (the
    synthetic corpus has no newlines). The token array is projected to
    an ATTRIBUTE before the per-chunk transform: an inlined `split`
    expression re-evaluates the regex split once per chunk per row
    (measured 9.5s vs 0.9s for this construction alone at the 10x
    stress)."""
    toks = F.col("_toks")
    n_chunks = F.greatest(
        F.ceil(F.size(toks) / F.lit(5.0)).cast("int"), F.lit(1)
    )
    return docs.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("_toks")
    ).select(
        "doc_id",
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.array_join(F.slice(toks, i * 5 + 1, 5), " "),
            ),
            "\n",
        ).alias("text"),
    )


@_register(
    "q_incremental_line_dedup",
    r"""
    WITH toked AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
      FROM documents),
    chunked AS (
      SELECT doc_id, toks,
             unnest(generate_series(0,
               greatest(CAST(ceil(len(toks) / 5.0) AS INTEGER), 1) - 1)) AS i
      FROM toked),
    lines AS (
      SELECT doc_id, i AS pos,
             array_to_string(toks[i * 5 + 1 : i * 5 + 5], ' ') AS line
      FROM chunked),
    norm AS (
      SELECT doc_id, pos, line, lower(trim(line)) AS nl FROM lines),
    corpus_freq AS (
      SELECT nl, count(DISTINCT doc_id) AS cf FROM norm
      WHERE doc_id % 3 <> 0 AND nl <> '' GROUP BY nl),
    batch_freq AS (
      SELECT nl, count(DISTINCT doc_id) AS bf FROM norm
      WHERE doc_id % 3 = 0 AND nl <> '' GROUP BY nl),
    freq AS (
      SELECT b.nl FROM batch_freq b LEFT JOIN corpus_freq c USING (nl)
      WHERE b.bf + coalesce(c.cf, 0) > 1),
    kept AS (
      SELECT n.doc_id, n.pos, n.line FROM norm n
      LEFT JOIN freq f ON n.nl = f.nl
      WHERE n.doc_id % 3 = 0 AND f.nl IS NULL),
    counts AS (
      SELECT doc_id, count(*) AS n_lines FROM lines
      WHERE doc_id % 3 = 0 GROUP BY doc_id),
    rebuilt AS (
      SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text,
             count(*) AS n_kept
      FROM kept GROUP BY doc_id)
    SELECT c.doc_id, md5(coalesce(r.text, '')) AS text_md5,
           CAST(c.n_lines AS INTEGER) AS n_lines,
           CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_lines_kept
    FROM counts c LEFT JOIN rebuilt r USING (doc_id)
    """,
    "Incremental line-level dedup: the batch (doc_id % 3 = 0) deduped "
    "against a persisted (line_hash, doc_freq) index of the accepted "
    "corpus (doc_id % 3 <> 0) — corpus text never re-split; a line "
    "drops when corpus + batch frequency exceeds max_docs.",
)
def q_incremental_line_dedup(spark, sf_dir):
    from featurestore_spark.operators.incremental import (
        dedup_lines_against_index,
        line_frequency_index,
    )

    built = _built_lines(load_table(spark, sf_dir, "documents"))
    corpus = built.where(F.col("doc_id") % 3 != 0)
    batch = built.where(F.col("doc_id") % 3 == 0)
    idx = line_frequency_index(corpus)
    out = dedup_lines_against_index(batch, idx, max_docs=1)
    return out.select(
        "doc_id",
        F.md5(F.col("text")).alias("text_md5"),
        "n_lines",
        F.col("n_lines_kept").cast("long").alias("n_lines_kept"),
    )


@_register(
    "q_shared_spans",
    r"""
    WITH toked AS (
      SELECT doc_id, text,
             regexp_split_to_array(trim(lower(text)), '\s+') AS toks
      FROM documents),
    grams AS (
      SELECT doc_id, i AS pos, array_to_string(toks[i + 1 : i + 5], ' ') AS g
      FROM (SELECT doc_id, toks,
                   unnest(generate_series(0, len(toks) - 5)) AS i
            FROM toked WHERE len(toks) >= 5)),
    freq AS (
      SELECT g FROM grams GROUP BY g HAVING count(DISTINCT doc_id) >= 2),
    starts AS (SELECT DISTINCT doc_id, pos FROM grams JOIN freq USING (g)),
    isl AS (
      SELECT doc_id, pos,
             SUM(CASE WHEN prev_end IS NULL OR pos > prev_end
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos) AS island
      FROM (SELECT doc_id, pos,
                   max(pos + 5) OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                     AS prev_end
            FROM starts)),
    ivs AS (
      SELECT doc_id, island, min(pos) AS s, max(pos) + 5 AS e
      FROM isl GROUP BY doc_id, island),
    agg AS (
      SELECT doc_id, SUM(e - s) AS removed, count(*) AS nspans
      FROM ivs GROUP BY doc_id),
    toks_pos AS (
      SELECT doc_id, i AS tpos, toks[i + 1] AS tok
      FROM (SELECT doc_id, toks, unnest(generate_series(0, len(toks) - 1)) AS i
            FROM toked)),
    kept AS (
      SELECT tp.doc_id, tp.tpos, tp.tok FROM toks_pos tp
      WHERE NOT EXISTS (SELECT 1 FROM ivs v WHERE v.doc_id = tp.doc_id
                        AND tp.tpos >= v.s AND tp.tpos < v.e)),
    rebuilt AS (
      SELECT doc_id, string_agg(tok, ' ' ORDER BY tpos) AS new_text
      FROM kept GROUP BY doc_id)
    SELECT t.doc_id,
           md5(CASE WHEN a.doc_id IS NULL THEN t.text
                    ELSE coalesce(r.new_text, '') END) AS text_md5,
           CAST(len(t.toks) AS INTEGER) AS n_tokens,
           CAST(coalesce(a.removed, 0) AS INTEGER) AS n_tokens_removed,
           CAST(coalesce(a.nspans, 0) AS INTEGER) AS n_spans
    FROM toked t
    LEFT JOIN agg a USING (doc_id)
    LEFT JOIN rebuilt r USING (doc_id)
    """,
    "Exact-substring dedup analog (RefinedWeb span removal): token "
    "spans whose every 5-token window appears in >=2 distinct docs are "
    "removed from every copy; per-doc interval merge replayed in SQL "
    "as gaps-and-islands. Affected docs re-tokenized; unaffected "
    "byte-identical (md5-compared).",
)
def q_shared_spans(spark, sf_dir):
    from featurestore_spark.operators.curation import remove_shared_spans

    docs = load_table(spark, sf_dir, "documents")
    out = remove_shared_spans(docs, n=5, min_df=2)
    return out.select(
        "doc_id",
        F.md5(F.col("text")).alias("text_md5"),
        "n_tokens",
        "n_tokens_removed",
        "n_spans",
    )


@_register(
    "q_shard_corpus",
    """
    SELECT doc_id,
           CAST(CAST(('0x' || substr(md5('42:' || CAST(doc_id AS VARCHAR)), 1, 7))
                AS UBIGINT) % 8 AS INTEGER) AS shard_id,
           md5('42:' || CAST(doc_id AS VARCHAR)) AS shard_order
    FROM documents
    """,
    "Deterministic training-export sharding: md5(seed:key)-derived "
    "shard in [0,8) + pseudo-random within-shard sort key. Pure "
    "projection (zero shuffle); ordering is enforced at write time by "
    "write_shards.",
)
def q_shard_corpus(spark, sf_dir):
    from featurestore_spark.operators.sampling import shard_corpus

    docs = load_table(spark, sf_dir, "documents")
    return shard_corpus(docs, n_shards=8, seed=42).select(
        "doc_id", "shard_id", "shard_order"
    )


@_register(
    "q_incremental_spans",
    r"""
    WITH toked AS (
      SELECT doc_id, text,
             regexp_split_to_array(trim(lower(text)), '\s+') AS toks
      FROM documents),
    grams AS (
      SELECT doc_id, i AS pos, array_to_string(toks[i + 1 : i + 5], ' ') AS g
      FROM (SELECT doc_id, toks,
                   unnest(generate_series(0, len(toks) - 5)) AS i
            FROM toked WHERE len(toks) >= 5)),
    freq AS (
      SELECT g FROM grams GROUP BY g HAVING count(DISTINCT doc_id) >= 2),
    starts AS (
      SELECT DISTINCT doc_id, pos FROM grams JOIN freq USING (g)
      WHERE doc_id % 3 = 0),
    isl AS (
      SELECT doc_id, pos,
             SUM(CASE WHEN prev_end IS NULL OR pos > prev_end
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos) AS island
      FROM (SELECT doc_id, pos,
                   max(pos + 5) OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                     AS prev_end
            FROM starts)),
    ivs AS (
      SELECT doc_id, island, min(pos) AS s, max(pos) + 5 AS e
      FROM isl GROUP BY doc_id, island),
    agg AS (
      SELECT doc_id, SUM(e - s) AS removed, count(*) AS nspans
      FROM ivs GROUP BY doc_id),
    toks_pos AS (
      SELECT doc_id, i AS tpos, toks[i + 1] AS tok
      FROM (SELECT doc_id, toks, unnest(generate_series(0, len(toks) - 1)) AS i
            FROM toked WHERE doc_id % 3 = 0)),
    kept AS (
      SELECT tp.doc_id, tp.tpos, tp.tok FROM toks_pos tp
      WHERE NOT EXISTS (SELECT 1 FROM ivs v WHERE v.doc_id = tp.doc_id
                        AND tp.tpos >= v.s AND tp.tpos < v.e)),
    rebuilt AS (
      SELECT doc_id, string_agg(tok, ' ' ORDER BY tpos) AS new_text
      FROM kept GROUP BY doc_id)
    SELECT t.doc_id,
           md5(CASE WHEN a.doc_id IS NULL THEN t.text
                    ELSE coalesce(r.new_text, '') END) AS text_md5,
           CAST(len(t.toks) AS INTEGER) AS n_tokens,
           CAST(coalesce(a.removed, 0) AS INTEGER) AS n_tokens_removed,
           CAST(coalesce(a.nspans, 0) AS INTEGER) AS n_spans
    FROM toked t
    LEFT JOIN agg a USING (doc_id)
    LEFT JOIN rebuilt r USING (doc_id)
    WHERE t.doc_id % 3 = 0
    """,
    "Incremental span removal: the batch (doc_id % 3 = 0) has shared "
    "spans removed against a persisted (window_hash, doc_freq) index "
    "of the corpus (doc_id % 3 <> 0) — window frequency = corpus + "
    "batch counts, equal to full-corpus remove_shared_spans restricted "
    "to batch rows (the oracle replays the full-corpus form).",
)
def q_incremental_spans(spark, sf_dir):
    from featurestore_spark.operators.incremental import (
        remove_spans_against_index,
        span_window_index,
    )

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 3 != 0)
    batch = docs.where(F.col("doc_id") % 3 == 0)
    idx = span_window_index(corpus, n=5)
    out = remove_spans_against_index(batch, idx, n=5, min_df=2)
    return out.select(
        "doc_id",
        F.md5(F.col("text")).alias("text_md5"),
        "n_tokens",
        "n_tokens_removed",
        "n_spans",
    )


@_register(
    "q_dedup_ladder",
    r"""
    WITH toked0 AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
      FROM documents),
    chunked AS (
      SELECT doc_id, toks,
             unnest(generate_series(0,
               greatest(CAST(ceil(len(toks) / 5.0) AS INTEGER), 1) - 1)) AS i
      FROM toked0),
    lines AS (
      SELECT doc_id, i AS pos,
             array_to_string(toks[i * 5 + 1 : i * 5 + 5], ' ') AS line
      FROM chunked),
    freq_l AS (
      SELECT lower(trim(line)) AS norm
      FROM lines WHERE lower(trim(line)) <> ''
      GROUP BY 1 HAVING count(DISTINCT doc_id) > 1),
    kept_l AS (
      SELECT l.doc_id, l.pos, l.line FROM lines l
      LEFT JOIN freq_l f ON lower(trim(l.line)) = f.norm
      WHERE f.norm IS NULL),
    docs2 AS (
      SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text
      FROM kept_l GROUP BY doc_id),
    toked2 AS (
      SELECT doc_id, text,
             regexp_split_to_array(trim(lower(text)), '\s+') AS toks
      FROM docs2),
    grams2 AS (
      SELECT doc_id, i AS pos, array_to_string(toks[i + 1 : i + 5], ' ') AS g
      FROM (SELECT doc_id, toks,
                   unnest(generate_series(0, len(toks) - 5)) AS i
            FROM toked2 WHERE len(toks) >= 5)),
    freq2 AS (
      SELECT g FROM grams2 GROUP BY g HAVING count(DISTINCT doc_id) >= 2),
    starts2 AS (SELECT DISTINCT doc_id, pos FROM grams2 JOIN freq2 USING (g)),
    isl2 AS (
      SELECT doc_id, pos,
             SUM(CASE WHEN prev_end IS NULL OR pos > prev_end
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos) AS island
      FROM (SELECT doc_id, pos,
                   max(pos + 5) OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                     AS prev_end
            FROM starts2)),
    ivs2 AS (
      SELECT doc_id, island, min(pos) AS s, max(pos) + 5 AS e
      FROM isl2 GROUP BY doc_id, island),
    agg2 AS (
      SELECT doc_id, SUM(e - s) AS removed, count(*) AS nspans
      FROM ivs2 GROUP BY doc_id),
    toks_pos2 AS (
      SELECT doc_id, i AS tpos, toks[i + 1] AS tok
      FROM (SELECT doc_id, toks, unnest(generate_series(0, len(toks) - 1)) AS i
            FROM toked2)),
    kept2 AS (
      SELECT tp.doc_id, tp.tpos, tp.tok FROM toks_pos2 tp
      WHERE NOT EXISTS (SELECT 1 FROM ivs2 v WHERE v.doc_id = tp.doc_id
                        AND tp.tpos >= v.s AND tp.tpos < v.e)),
    rebuilt2 AS (
      SELECT doc_id, string_agg(tok, ' ' ORDER BY tpos) AS new_text
      FROM kept2 GROUP BY doc_id)
    SELECT t.doc_id,
           md5(CASE WHEN a.doc_id IS NULL THEN t.text
                    ELSE coalesce(r.new_text, '') END) AS text_md5,
           CAST(len(t.toks) AS INTEGER) AS n_tokens,
           CAST(coalesce(a.removed, 0) AS INTEGER) AS n_tokens_removed
    FROM toked2 t
    LEFT JOIN agg2 a USING (doc_id)
    LEFT JOIN rebuilt2 r USING (doc_id)
    """,
    "End-to-end dedup ladder (docs/usage.md §11): 5-token line recast "
    "-> CCNet line dedup (max_docs=1) -> docs with surviving lines -> "
    "shared-span removal (n=5, min_df=2) over the REBUILT text. Both "
    "stages chained in one plan; the oracle replays the full "
    "composition.",
)
def q_dedup_ladder(spark, sf_dir):
    from featurestore_spark.operators.curation import (
        dedup_lines,
        remove_shared_spans,
    )
    from featurestore_spark.operators.materialize import materialize

    built = _built_lines(load_table(spark, sf_dir, "documents"))
    # chained pipeline: explicit collapse_exact=True on BOTH stages
    # (the chain guidance in _should_collapse) — the stage-2 'auto'
    # probe would re-execute the whole line-dedup lineage just to
    # count duplicates, and True doubles as the stage boundary's
    # materialization barrier. Measured at sf0.1 (idle host,
    # median-of-5): True/True 4.80s vs auto/auto 6.66s.
    ld = dedup_lines(built, max_docs=1, collapse_exact=True).where(
        F.col("n_lines_kept") > 0
    )
    # the collapse barrier protects the COUNTING side only; stage 2
    # reads its input frame 3x (collapse groups + members passes,
    # final re-attach), and each read would re-execute stage 1's
    # rebuild shuffle — fence the slim inter-stage frame (docs/usage
    # §11 chain guidance; measured at sf0.1 r14: 9.6s -> 6.6s warm)
    sp = remove_shared_spans(
        materialize(ld.select("doc_id", "text")),
        n=5, min_df=2, collapse_exact=True,
    )
    return sp.select(
        "doc_id",
        F.md5(F.col("text")).alias("text_md5"),
        "n_tokens",
        "n_tokens_removed",
    )


@_register(
    "q_normalize_text",
    """
    WITH dirty AS (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 0 THEN text || ' cafe' || chr(769)
                  WHEN doc_id % 7 = 0 THEN text || chr(7) || 'bell'
                  ELSE text END AS text
      FROM documents),
    norm AS (
      SELECT doc_id, text,
             regexp_replace(nfc_normalize(text),
               '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F-\\x9F]', '', 'g')
               AS text_norm
      FROM dirty)
    SELECT doc_id, md5(text_norm) AS norm_md5,
           (text_norm <> text) AS text_changed
    FROM norm
    """,
    "Unicode NFC normalization + C0/C1 control stripping (ingest "
    "cleanup so byte-level dedup hashes agree across encodings): "
    "combining-accent and control-char dirt injected on a doc_id "
    "schedule, normalized by an Arrow-batched UDF, replayed exactly "
    "by DuckDB nfc_normalize.",
)
def q_normalize_text(spark, sf_dir):
    from featurestore_spark.operators.text import normalize_text

    docs = load_table(spark, sf_dir, "documents")
    dirty = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.col("text"), F.lit(" cafe\u0301")),
        )
        .when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.col("text"), F.lit("\x07bell")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    out = normalize_text(dirty)
    return out.select(
        "doc_id", F.md5(F.col("text_norm")).alias("norm_md5"), "text_changed"
    )


@_register(
    "q_cluster_balance",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    c AS (SELECT vec_id AS centroid_id, v AS cv FROM e WHERE vec_id < 8),
    d AS (SELECT e.vec_id, c.centroid_id,
                 round(list_sum(list_transform(generate_series(1, len(e.v)),
                         i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i]))), 6)
                   AS d2
          FROM e CROSS JOIN c),
    assigned AS (
      SELECT vec_id, centroid_id
      FROM (SELECT vec_id, centroid_id,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY d2, centroid_id) AS rn
            FROM d)
      WHERE rn = 1),
    sizes AS (SELECT centroid_id, count(*) AS n FROM assigned GROUP BY 1),
    thr AS (
      SELECT centroid_id,
             CAST(round(least(1.0, 40.0 / n) * 1000000) AS BIGINT) AS t
      FROM sizes)
    SELECT a.vec_id, a.centroid_id
    FROM assigned a JOIN thr USING (centroid_id)
    WHERE CAST(('0x' || substr(md5(CAST(a.vec_id AS VARCHAR)), 1, 7))
               AS UBIGINT) % 1000000 < t
    """,
    "Topic-rebalancing sample: rows assigned to nearest centroid "
    "(vec_id < 8 as codebook), each cluster downsampled toward "
    "target_per_cluster=40 by a stable md5 threshold (rate = "
    "min(1, target/n)); thresholds computed in-plan, nothing "
    "collected to the driver.",
)
def q_cluster_balance(spark, sf_dir):
    from featurestore_spark.operators.sampling import cluster_balance_sample

    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("centroid"),
    )
    out = cluster_balance_sample(emb, cents, target_per_cluster=40)
    return out.select("vec_id", "centroid_id")


@_register(
    "q_decontaminate_spans",
    r"""
    WITH toked AS (
      SELECT doc_id, text,
             regexp_split_to_array(trim(lower(text)), '\s+') AS toks
      FROM documents),
    grams AS (
      SELECT doc_id, i AS pos, array_to_string(toks[i + 1 : i + 5], ' ') AS g
      FROM (SELECT doc_id, toks,
                   unnest(generate_series(0, len(toks) - 5)) AS i
            FROM toked WHERE len(toks) >= 5)),
    probe_set AS (SELECT DISTINCT g FROM grams WHERE doc_id % 29 = 0),
    starts AS (
      SELECT DISTINCT doc_id, pos FROM grams JOIN probe_set USING (g)
      WHERE doc_id % 29 <> 0),
    isl AS (
      SELECT doc_id, pos,
             SUM(CASE WHEN prev_end IS NULL OR pos > prev_end
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos) AS island
      FROM (SELECT doc_id, pos,
                   max(pos + 5) OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                     AS prev_end
            FROM starts)),
    ivs AS (
      SELECT doc_id, island, min(pos) AS s, max(pos) + 5 AS e
      FROM isl GROUP BY doc_id, island),
    agg AS (
      SELECT doc_id, SUM(e - s) AS removed, count(*) AS nspans
      FROM ivs GROUP BY doc_id),
    toks_pos AS (
      SELECT doc_id, i AS tpos, toks[i + 1] AS tok
      FROM (SELECT doc_id, toks, unnest(generate_series(0, len(toks) - 1)) AS i
            FROM toked WHERE doc_id % 29 <> 0)),
    kept AS (
      SELECT tp.doc_id, tp.tpos, tp.tok FROM toks_pos tp
      WHERE NOT EXISTS (SELECT 1 FROM ivs v WHERE v.doc_id = tp.doc_id
                        AND tp.tpos >= v.s AND tp.tpos < v.e)),
    rebuilt AS (
      SELECT doc_id, string_agg(tok, ' ' ORDER BY tpos) AS new_text
      FROM kept GROUP BY doc_id)
    SELECT t.doc_id,
           md5(CASE WHEN a.doc_id IS NULL THEN t.text
                    ELSE coalesce(r.new_text, '') END) AS text_md5,
           CAST(len(t.toks) AS INTEGER) AS n_tokens,
           CAST(coalesce(a.removed, 0) AS INTEGER) AS n_tokens_removed,
           CAST(coalesce(a.nspans, 0) AS INTEGER) AS n_spans
    FROM toked t
    LEFT JOIN agg a USING (doc_id)
    LEFT JOIN rebuilt r USING (doc_id)
    WHERE t.doc_id % 29 <> 0
    """,
    "Surgical decontamination: token spans whose every 5-token window "
    "appears verbatim in the probe set (doc_id % 29 = 0 stands in for "
    "a benchmark) are REMOVED from corpus docs, rest of the document "
    "kept. Probe window set broadcast; same interval-merge as "
    "q_shared_spans.",
)
def q_decontaminate_spans(spark, sf_dir):
    from featurestore_spark.operators.curation import decontaminate_spans

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 29 != 0)
    probes = docs.where(F.col("doc_id") % 29 == 0).select(
        F.col("doc_id").alias("probe_id"), "text"
    )
    out = decontaminate_spans(corpus, probes, n=5)
    return out.select(
        "doc_id",
        F.md5(F.col("text")).alias("text_md5"),
        "n_tokens",
        "n_tokens_removed",
        "n_spans",
    )


@_register(
    "q_token_budget_sample",
    r"""
    WITH t AS (
      SELECT doc_id, source,
             len(regexp_split_to_array(trim(lower(text)), '\s+')) AS nt,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7))
                  AS UBIGINT) % 1000000 AS hb
      FROM documents),
    c AS (SELECT doc_id, source, nt,
                 sum(nt) OVER (PARTITION BY source ORDER BY hb, doc_id)
                   AS cum
          FROM t)
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs_kept,
           CAST(sum(nt) AS BIGINT) AS n_tokens_kept
    FROM c WHERE cum - nt < 1000
    GROUP BY source
    """,
    "Token-budget mixture: fill each source to 1000 tokens in stable "
    "hash order (boundary doc kept). Two-phase bucketed prefix sum — "
    "per-bucket totals windowed on a tiny frame, broadcast back; only "
    "the straddling bucket pays a row window (never one reducer per "
    "source). Audit aggregate per source.",
)
def q_token_budget_sample(spark, sf_dir):
    from featurestore_spark.operators.sampling import token_budget_sample

    docs = load_table(spark, sf_dir, "documents")
    kept = token_budget_sample(docs, 1000)
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs_kept"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens_kept"),
    )


@_register(
    "q_embedding_clusters",
    f"""
    WITH p AS ({_srp_pairs_oracle(0.35)}),
    edges AS (SELECT a_id AS a, b_id AS b FROM p
              UNION SELECT b_id, a_id FROM p)
    SELECT id AS vec_id, min(lab) AS canonical_id
    FROM (WITH RECURSIVE r(id, lab) AS (
            SELECT DISTINCT a, a FROM edges
            UNION
            SELECT e2.a, r.lab FROM edges e2 JOIN r ON r.id = e2.b)
          SELECT id, lab FROM r)
    GROUP BY id
    """,
    "Embedding near-dup CLUSTERS: SRP-LSH cosine pairs contracted "
    "to connected components (min-vec_id canonical) — semantic dedup "
    "keeps one vector per near-dup family, not pairwise keep-lists. "
    "Same materialized-edge label propagation as q_dedup_clusters.",
)
def q_embedding_clusters(spark, sf_dir):
    from featurestore_spark.operators.resolve import connected_components
    from featurestore_spark.operators.similarity import embedding_near_dups

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = embedding_near_dups(emb, threshold=0.35, dim=64).select("a_id", "b_id")
    comp = connected_components(pairs, src_col="a_id", dst_col="b_id")
    return comp.select(
        F.col("id").alias("vec_id"), F.col("component").alias("canonical_id")
    )


# Shared CTE fragment for the PQ oracles: 8 subspaces × 8 dims over
# the 64-dim embeddings; codebook = sub-slices of vectors vec_id < 16
# (fixed data-derived codewords — the oracled path checks the
# encode/ADC machinery; Lloyd TRAINING determinism is pytest-asserted
# separately, mirroring the train_centroids/assign_to_centroids split).
_PQ_SUB_CTES = """
    e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
          WHERE embedding IS NOT NULL),
    s AS (SELECT CAST(unnest(generate_series(0, 7)) AS INTEGER) AS sub_id),
    sub AS (SELECT e.vec_id, s.sub_id,
                   list_slice(e.v, s.sub_id * 8 + 1, s.sub_id * 8 + 8) AS sv
            FROM e CROSS JOIN s),
    cb AS (SELECT sub_id, CAST(vec_id AS INTEGER) AS code_id, sv AS cw
           FROM sub WHERE vec_id < 16),
    sd AS (SELECT t.vec_id, t.sub_id, cb.code_id,
                  round(list_sum(list_transform(generate_series(1, 8),
                          i -> (t.sv[i] - cb.cw[i]) * (t.sv[i] - cb.cw[i]))), 6)
                    AS d2
           FROM sub t JOIN cb USING (sub_id))
"""


@_register(
    "q_pq_encode",
    f"""
    WITH {_PQ_SUB_CTES}
    SELECT vec_id, sub_id, code_id
    FROM (SELECT vec_id, sub_id, code_id,
                 row_number() OVER (PARTITION BY vec_id, sub_id
                                    ORDER BY d2, code_id) AS rn
          FROM sd)
    WHERE rn = 1
    """,
    "Product-quantization encode: each 64-dim vector compressed to 8 "
    "subspace code ids (nearest codeword per sub, rounded-argmin, "
    "ties on code id). Codebook broadcast; the melt is a projection "
    "and the only shuffle keys on the scalar (vec_id, sub_id). At "
    "100 TB this is the one-time compression pass that shrinks the "
    "corpus ~32x for ADC search.",
)
def q_pq_encode(spark, sf_dir):
    from featurestore_spark.operators.quantize import explode_subvectors, pq_encode

    emb = load_table(spark, sf_dir, "embeddings")
    cb = explode_subvectors(emb.where(F.col("vec_id") < 16), 8, dim=64).select(
        "sub_id",
        F.col("vec_id").cast("int").alias("code_id"),
        F.col("sv").alias("codeword"),
    )
    enc = pq_encode(emb, cb, dim=64)
    return enc.select("vec_id", F.posexplode("codes").alias("sub_id", "code_id"))


@_register(
    "q_pq_topk",
    f"""
    WITH {_PQ_SUB_CTES},
    enc AS (SELECT vec_id, sub_id, code_id
            FROM (SELECT vec_id, sub_id, code_id,
                         row_number() OVER (PARTITION BY vec_id, sub_id
                                            ORDER BY d2, code_id) AS rn
                  FROM sd)
            WHERE rn = 1),
    lut AS (SELECT vec_id AS query_id, sub_id, code_id, d2
            FROM sd WHERE vec_id < 5),
    dist AS (SELECT l.query_id, e.vec_id AS neighbor_id,
                    round(list_sum(list(l.d2 ORDER BY l.sub_id)), 6) AS adist
             FROM enc e JOIN lut l
               ON e.sub_id = l.sub_id AND e.code_id = l.code_id
             GROUP BY 1, 2)
    SELECT query_id, CAST(rnk AS INTEGER) AS rnk, neighbor_id, adist
    FROM (SELECT query_id, neighbor_id, adist,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY adist, neighbor_id) AS rnk
          FROM dist)
    WHERE rnk <= 10
    """,
    "PQ asymmetric-distance top-10: per query an 8x16 lookup table of "
    "rounded subspace distances is precomputed and broadcast; each "
    "candidate's distance is 8 array lookups summed in sub order "
    "(zip_with + left fold — engine-exact, so the oracle reproduces "
    "the ranking). The corpus side streams its codes column; no "
    "shuffle carries a vector.",
)
def q_pq_topk(spark, sf_dir):
    from featurestore_spark.operators.quantize import (
        explode_subvectors,
        pq_adc_topk,
        pq_encode,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cb = explode_subvectors(emb.where(F.col("vec_id") < 16), 8, dim=64).select(
        "sub_id",
        F.col("vec_id").cast("int").alias("code_id"),
        F.col("sv").alias("codeword"),
    )
    enc = pq_encode(emb, cb, dim=64)
    q = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    return pq_adc_topk(q, enc, cb, 10, dim=64)


@_register(
    "q_ivf_pq_topk",
    f"""
    WITH {_PQ_SUB_CTES},
    c AS (SELECT vec_id AS centroid_id, v AS cv FROM e WHERE vec_id < 8),
    asg AS (SELECT vec_id, centroid_id
            FROM (SELECT e.vec_id, c.centroid_id,
                         row_number() OVER (PARTITION BY e.vec_id ORDER BY
                           round(list_sum(list_transform(generate_series(1, 64),
                               i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i]))), 6),
                           c.centroid_id) AS rn
                  FROM e CROSS JOIN c)
            WHERE rn = 1),
    enc AS (SELECT vec_id, sub_id, code_id
            FROM (SELECT vec_id, sub_id, code_id,
                         row_number() OVER (PARTITION BY vec_id, sub_id
                                            ORDER BY d2, code_id) AS rn
                  FROM sd)
            WHERE rn = 1),
    probes AS (SELECT query_id, centroid_id
               FROM (SELECT e.vec_id AS query_id, c.centroid_id,
                            row_number() OVER (PARTITION BY e.vec_id ORDER BY
                              round(list_sum(list_transform(generate_series(1, 64),
                                  i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i]))), 6),
                              c.centroid_id) AS rn
                     FROM e CROSS JOIN c WHERE e.vec_id < 5)
               WHERE rn <= 2),
    lut AS (SELECT vec_id AS query_id, sub_id, code_id, d2
            FROM sd WHERE vec_id < 5),
    dist AS (SELECT l.query_id, en.vec_id AS neighbor_id,
                    round(list_sum(list(l.d2 ORDER BY l.sub_id)), 6) AS adist
             FROM enc en
             JOIN asg ON asg.vec_id = en.vec_id
             JOIN probes p ON p.centroid_id = asg.centroid_id
             JOIN lut l ON l.query_id = p.query_id
                       AND l.sub_id = en.sub_id AND l.code_id = en.code_id
             GROUP BY 1, 2)
    SELECT query_id, CAST(rnk AS INTEGER) AS rnk, neighbor_id, adist
    FROM (SELECT query_id, neighbor_id, adist,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY adist, neighbor_id) AS rnk
          FROM dist)
    WHERE rnk <= 10
    """,
    "IVF-PQ top-10: the canonical billion-scale ANN shape — corpus "
    "pre-assigned to coarse centroids AND PQ-compressed; each query "
    "probes its 2 nearest lists and evaluates ADC lookups only "
    "there. At 100 TB the encoded table is partitioned by "
    "centroid_id so probes prune to their lists' files; the "
    "probe+LUT side broadcasts with the query set.",
)
def q_ivf_pq_topk(spark, sf_dir):
    from featurestore_spark.operators.quantize import (
        explode_subvectors,
        ivf_pq_topk,
        pq_encode,
    )
    from featurestore_spark.operators.similarity import assign_to_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    cb = explode_subvectors(emb.where(F.col("vec_id") < 16), 8, dim=64).select(
        "sub_id",
        F.col("vec_id").cast("int").alias("code_id"),
        F.col("sv").alias("codeword"),
    )
    cents = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("centroid")
    )
    enc = pq_encode(emb, cb, dim=64)
    asg = assign_to_centroids(emb, cents).select("vec_id", "centroid_id")
    encoded = enc.join(asg, "vec_id")
    q = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    return ivf_pq_topk(q, encoded, cb, cents, 10, n_probe=2, dim=64)


@_register(
    "q_semantic_dedup",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
               WHERE embedding IS NOT NULL),
    c AS (SELECT vec_id AS centroid_id, v AS cv FROM e WHERE vec_id < 8),
    a AS (SELECT vec_id, v, centroid_id
          FROM (SELECT e.vec_id, e.v, c.centroid_id,
                       row_number() OVER (PARTITION BY e.vec_id ORDER BY
                         round(list_sum(list_transform(generate_series(1, 64),
                             i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i]))), 6),
                         c.centroid_id) AS rn
                FROM e CROSS JOIN c)
          WHERE rn = 1),
    p AS (SELECT x.vec_id, min(y.vec_id) AS smaller_dup
          FROM a x JOIN a y
            ON x.centroid_id = y.centroid_id AND y.vec_id < x.vec_id
          WHERE round(
                  list_sum(list_transform(generate_series(1, 64),
                                          i -> x.v[i] * y.v[i])) /
                  (sqrt(list_sum(list_transform(generate_series(1, 64),
                                                i -> x.v[i] * x.v[i]))) *
                   sqrt(list_sum(list_transform(generate_series(1, 64),
                                                i -> y.v[i] * y.v[i])))), 6)
                >= 0.3
          GROUP BY x.vec_id)
    SELECT a.vec_id, a.centroid_id, (p.smaller_dup IS NULL) AS keep
    FROM a LEFT JOIN p ON a.vec_id = p.vec_id
    """,
    "SemDeDup-style semantic dedup: nearest-centroid clustering, then "
    "within each cluster drop any vector with a lower-id near-dup "
    "(rounded cosine >= 0.3). The oracle states the naive member-"
    "pairwise rule; the Spark plan factors it through the exact-dup "
    "collapse (pairs over DISTINCT vectors + membership joins) so it "
    "is replication-invariant — the hash-match proves the factoring "
    "exact.",
)
def q_semantic_dedup(spark, sf_dir):
    from featurestore_spark.operators.quantize import semantic_dedup

    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("centroid")
    )
    return semantic_dedup(emb, cents, threshold=0.3)


# Shared by q_bm25_topk (direct) and q_bm25_index_topk (build two
# half-indexes, merge, query): both paths hash-matching the SAME
# oracle proves direct == against-index == merged-index row-for-row.
# Shared BM25 scoring CTE chain (through `sc`): the three headline
# queries and the hard-negative miner all rank from the same scores.
_BM25_SC = r"""
    WITH q(query_id, term) AS (
      SELECT * FROM (VALUES (0, 'hash'), (0, 'join'),
                            (1, 'vector'), (1, 'scan'), (1, 'batch'),
                            (2, 'customer'), (2, 'slow'), (2, 'quantum'))),
    toked AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(lower(coalesce(text, ''))),
                                               '\s+'), t -> t <> '') AS toks
      FROM documents),
    dl AS (SELECT doc_id, len(toks)::DOUBLE AS dl FROM toked),
    stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
    tf AS (SELECT doc_id, tok AS term, count(*)::DOUBLE AS tf
           FROM (SELECT doc_id, unnest(toks) AS tok FROM toked)
           WHERE tok IN (SELECT DISTINCT term FROM q)
           GROUP BY doc_id, tok),
    dfreq AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
    sc AS (SELECT q.query_id, t.doc_id,
             round(sum( ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))
                      * t.tf * (1.2 + 1)
                      / (t.tf + 1.2 * (1 - 0.75 + 0.75 * l.dl / s.avgdl)) ),
                   6) AS score
           FROM tf t JOIN q USING (term) JOIN dfreq d USING (term)
                JOIN dl l USING (doc_id) CROSS JOIN stats s
           GROUP BY q.query_id, t.doc_id)"""

_BM25_ORACLE = _BM25_SC + r"""
    SELECT query_id, CAST(rnk AS INTEGER) AS rnk, doc_id, score
    FROM (SELECT query_id, doc_id, score,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY score DESC, doc_id) AS rnk
          FROM sc)
    WHERE rnk <= 10
    """


def _bm25_queries(spark):
    return spark.createDataFrame(
        [(0, "hash"), (0, "join"),
         (1, "vector"), (1, "scan"), (1, "batch"),
         (2, "customer"), (2, "slow"), (2, "quantum")],
        "query_id long, term string",
    )


@_register(
    "q_bm25_topk",
    _BM25_ORACLE,
    "Okapi BM25 lexical top-10 for three multi-term queries (one term "
    "absent from the corpus). The Spark plan filters the exploded "
    "tokens against the broadcast query-term set BEFORE aggregating, "
    "so only query-term postings shuffle; scores rounded to 6 before "
    "ranking, ties by doc_id.",
)
def q_bm25_topk(spark, sf_dir):
    from featurestore_spark.operators.search import bm25_topk

    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(docs, _bm25_queries(spark), k=10).withColumnRenamed(
        "rank", "rnk"
    )


@_register(
    "q_bm25_index_topk",
    _BM25_ORACLE,
    "BM25 against the prebuilt inverted index — built as TWO "
    "half-corpus indexes merged with merge_bm25_index (the rolling "
    "incremental build), then queried without touching the corpus. "
    "Same oracle as q_bm25_topk: the hash match proves direct == "
    "merged-index exactly (sum-of-dl stats keep avgdl exact under "
    "merge).",
)
def q_bm25_index_topk(spark, sf_dir):
    from featurestore_spark.operators.search import (
        bm25_index,
        bm25_topk_against_index,
        merge_bm25_index,
    )

    docs = load_table(spark, sf_dir, "documents")
    half_a = bm25_index(docs.where(F.col("doc_id") % 2 == 0))
    half_b = bm25_index(docs.where(F.col("doc_id") % 2 == 1))
    idx = merge_bm25_index(half_a, half_b)
    return bm25_topk_against_index(idx, _bm25_queries(spark), k=10).withColumnRenamed(
        "rank", "rnk"
    )


@_register(
    "q_lm_perplexity",
    r"""
    WITH toked AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(lower(coalesce(text, ''))),
                                               '\s+'), t -> t <> '') AS toks
      FROM documents),
    big AS (
      SELECT doc_id, toks[i + 1] AS w1, toks[i + 2] AS w2
      FROM (SELECT doc_id, toks, unnest(generate_series(0, len(toks) - 2)) AS i
            FROM toked WHERE len(toks) >= 2)),
    lm AS (SELECT w1, w2, count(*) AS c FROM big GROUP BY w1, w2),
    ctx AS (SELECT w1, sum(c) AS c1 FROM lm GROUP BY w1),
    voc AS (SELECT count(DISTINCT t)::DOUBLE AS v
            FROM (SELECT unnest(toks) AS t FROM toked)),
    sc AS (
      SELECT b.doc_id, -ln((c.c + 1.0) / (x.c1 + 1.0 * v.v)) AS nl
      FROM big b JOIN lm c USING (w1, w2) JOIN ctx x USING (w1)
           CROSS JOIN voc v),
    agg AS (SELECT doc_id, count(*) AS nb, avg(nl) AS xent
            FROM sc GROUP BY doc_id)
    SELECT t.doc_id,
           CAST(coalesce(a.nb, 0) AS BIGINT) AS n_bigrams,
           round(a.xent, 6) AS cross_entropy
    FROM toked t LEFT JOIN agg a USING (doc_id)
    """,
    "CCNet-style LM quality signal: per-doc bigram cross-entropy under "
    "an add-1-smoothed model self-fit on the corpus (fit = one "
    "vocabulary-bounded aggregation, scoring = join on (w1, w2)). "
    "Docs with < 2 tokens score NULL with n_bigrams 0.",
)
def q_lm_perplexity(spark, sf_dir):
    from featurestore_spark.operators.search import lm_cross_entropy

    docs = load_table(spark, sf_dir, "documents")
    return lm_cross_entropy(docs).select("doc_id", "n_bigrams", "cross_entropy")


@_register(
    "q_ccnet_buckets",
    r"""
    WITH toked AS (
      SELECT doc_id, source,
             list_filter(regexp_split_to_array(trim(lower(coalesce(text, ''))),
                                               '\s+'), t -> t <> '') AS toks
      FROM documents),
    big AS (
      SELECT doc_id, toks[i + 1] AS w1, toks[i + 2] AS w2
      FROM (SELECT doc_id, toks, unnest(generate_series(0, len(toks) - 2)) AS i
            FROM toked WHERE len(toks) >= 2)),
    lm AS (SELECT w1, w2, count(*) AS c FROM big GROUP BY w1, w2),
    ctx AS (SELECT w1, sum(c) AS c1 FROM lm GROUP BY w1),
    voc AS (SELECT count(DISTINCT t)::DOUBLE AS v
            FROM (SELECT unnest(toks) AS t FROM toked)),
    sc AS (
      SELECT b.doc_id, -ln((c.c + 1.0) / (x.c1 + 1.0 * v.v)) AS nl
      FROM big b JOIN lm c USING (w1, w2) JOIN ctx x USING (w1)
           CROSS JOIN voc v),
    agg AS (SELECT doc_id, round(avg(nl), 6) AS xent
            FROM sc GROUP BY doc_id),
    d AS (
      SELECT t.doc_id, t.source,
             CAST(len(t.toks) AS BIGINT) AS n_tokens,
             a.xent AS cross_entropy
      FROM toked t LEFT JOIN agg a
        ON a.doc_id IS NOT DISTINCT FROM t.doc_id),
    hist AS (
      SELECT source, cross_entropy, sum(n_tokens) AS w
      FROM d WHERE cross_entropy IS NOT NULL GROUP BY source, cross_entropy),
    cum AS (
      SELECT source, cross_entropy,
             sum(w) OVER (PARTITION BY source ORDER BY cross_entropy
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS cw,
             sum(w) OVER (PARTITION BY source) AS tot
      FROM hist),
    bk AS (
      SELECT source, cross_entropy,
             CASE WHEN 3 * cw <= tot THEN 'head'
                  WHEN 3 * cw <= 2 * tot THEN 'middle'
                  ELSE 'tail' END AS bucket
      FROM cum)
    SELECT d.doc_id, d.source, d.n_tokens, d.cross_entropy,
           coalesce(bk.bucket, 'tail') AS bucket
    FROM d LEFT JOIN bk
      ON bk.source IS NOT DISTINCT FROM d.source
     AND bk.cross_entropy IS NOT DISTINCT FROM d.cross_entropy
    """,
    "CCNet head/middle/tail perplexity split (Wenzek et al. 2020 "
    "§4.3): per source, thirds by TOKEN MASS in LM-score order. "
    "Bucket assigned at the rounded-score-value level via a "
    "histogram cumulative walk (3*cum <= total integer arithmetic), "
    "so the corpus is never sorted whole — the window runs over "
    "distinct (source, score) pairs and docs join their bucket back.",
)
def q_ccnet_buckets(spark, sf_dir):
    from featurestore_spark.operators.search import ccnet_perplexity_buckets

    docs = load_table(spark, sf_dir, "documents")
    return ccnet_perplexity_buckets(docs)


@_register(
    "q_ccnet_external",
    r"""
    WITH toked AS (
      SELECT doc_id, source,
             list_filter(regexp_split_to_array(trim(lower(coalesce(text, ''))),
                                               '\s+'), t -> t <> '') AS toks
      FROM documents),
    ref AS (SELECT * FROM toked WHERE source = 'src0'),
    refbig AS (
      SELECT toks[i + 1] AS w1, toks[i + 2] AS w2
      FROM (SELECT toks, unnest(generate_series(0, len(toks) - 2)) AS i
            FROM ref WHERE len(toks) >= 2)),
    lm AS (SELECT w1, w2, count(*) AS c FROM refbig GROUP BY w1, w2),
    ctx AS (SELECT w1, sum(c) AS c1 FROM lm GROUP BY w1),
    voc AS (SELECT count(DISTINCT t)::DOUBLE AS v
            FROM (SELECT unnest(toks) AS t FROM ref)),
    big AS (
      SELECT doc_id, toks[i + 1] AS w1, toks[i + 2] AS w2
      FROM (SELECT doc_id, toks, unnest(generate_series(0, len(toks) - 2)) AS i
            FROM toked WHERE len(toks) >= 2)),
    sc AS (
      SELECT b.doc_id,
             -ln((coalesce(c.c, 0) + 1.0)
                 / (coalesce(x.c1, 0) + 1.0 * v.v)) AS nl
      FROM big b LEFT JOIN lm c USING (w1, w2)
                 LEFT JOIN ctx x USING (w1)
           CROSS JOIN voc v),
    agg AS (SELECT doc_id, round(avg(nl), 6) AS xent
            FROM sc GROUP BY doc_id),
    d AS (
      SELECT t.doc_id, t.source,
             CAST(len(t.toks) AS BIGINT) AS n_tokens,
             a.xent AS cross_entropy
      FROM toked t LEFT JOIN agg a
        ON a.doc_id IS NOT DISTINCT FROM t.doc_id),
    hist AS (
      SELECT source, cross_entropy, sum(n_tokens) AS w
      FROM d WHERE cross_entropy IS NOT NULL GROUP BY source, cross_entropy),
    cum AS (
      SELECT source, cross_entropy,
             sum(w) OVER (PARTITION BY source ORDER BY cross_entropy
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS cw,
             sum(w) OVER (PARTITION BY source) AS tot
      FROM hist),
    bk AS (
      SELECT source, cross_entropy,
             CASE WHEN 3 * cw <= tot THEN 'head'
                  WHEN 3 * cw <= 2 * tot THEN 'middle'
                  ELSE 'tail' END AS bucket
      FROM cum)
    SELECT d.doc_id, d.source, d.n_tokens, d.cross_entropy,
           coalesce(bk.bucket, 'tail') AS bucket
    FROM d LEFT JOIN bk
      ON bk.source IS NOT DISTINCT FROM d.source
     AND bk.cross_entropy IS NOT DISTINCT FROM d.cross_entropy
    """,
    "CCNet's PUBLISHED configuration (Wenzek et al. 2020): the LM is "
    "fit on a reference domain (source='src0' standing in for "
    "Wikipedia) and the whole crawl is scored with it — unseen "
    "contexts degrade to the uniform 1/V floor (the external-lm "
    "vocab_size path, LEFT-join smoothing) — then head/middle/tail "
    "thirds by token mass per source. The self-fit q_ccnet_buckets "
    "twin covers the fit-on-itself configuration.",
)
def q_ccnet_external(spark, sf_dir):
    from featurestore_spark.operators.search import (
        ccnet_perplexity_buckets,
        fit_bigram_lm,
    )
    from featurestore_spark.operators.text import clean_tokens

    docs = load_table(spark, sf_dir, "documents")
    ref = docs.where(F.col("source") == "src0")
    lm = fit_bigram_lm(ref)
    # one-row driver collect (documented bounded-collect list): V of
    # the FITTING corpus is a required scalar of the published recipe
    v = (
        ref.select(F.explode(clean_tokens("text")).alias("_t"))
        .agg(F.count_distinct("_t"))
        .collect()[0][0]
    )
    return ccnet_perplexity_buckets(docs, lm, vocab_size=int(v))


@_register(
    "q_source_divergence",
    r"""
    WITH toks AS (
      SELECT source AS g,
             unnest(list_filter(regexp_split_to_array(trim(lower(coalesce(text, ''))),
                                                      '\s+'), t -> t <> '')) AS t
      FROM documents WHERE source IS NOT NULL),
    cs AS (SELECT g, t, count(*)::DOUBLE AS c_s FROM toks GROUP BY g, t),
    c AS (SELECT t, sum(c_s) AS c FROM cs GROUP BY t),
    ns AS (SELECT g, sum(c_s) AS n_s FROM cs GROUP BY g),
    tot AS (SELECT sum(c) AS n, count(*)::DOUBLE AS v FROM c),
    grid AS (
      SELECT gs.g, c.t, c.c, coalesce(cs.c_s, 0) AS c_s
      FROM c CROSS JOIN (SELECT DISTINCT g FROM cs) gs
      LEFT JOIN cs ON cs.g = gs.g AND cs.t = c.t),
    kl AS (
      SELECT grid.g,
             sum( ((c_s + 1.0) / (ns.n_s + 1.0 * tot.v))
                  * ln( ((c_s + 1.0) / (ns.n_s + 1.0 * tot.v))
                        / ((c + 1.0) / (tot.n + 1.0 * tot.v)) ) ) AS kl
      FROM grid JOIN ns USING (g) CROSS JOIN tot
      GROUP BY grid.g)
    SELECT kl.g AS source,
           CAST(ns.n_s AS BIGINT) AS n_tokens,
           round(kl.kl, 6) AS kl_divergence
    FROM kl JOIN ns USING (g)
    """,
    "Mixture-drift monitor: per-source KL divergence between the "
    "source's add-1-smoothed unigram distribution and the whole "
    "corpus's. One corpus scan into a (source, token) count frame; "
    "the KL grid is vocab x sources (zero-count cells included — "
    "their smoothed mass depends on Q), never per-document.",
)
def q_source_divergence(spark, sf_dir):
    from featurestore_spark.operators.text import unigram_kl_divergence

    docs = load_table(spark, sf_dir, "documents")
    return unigram_kl_divergence(docs, "source")


# Gopher doc-quality keep conjunction (published thresholds) over the
# `sig` CTE's columns — shared by q_gopher_rules and q_curate_gopher.
_GDR_KEEP = """n_words BETWEEN 50 AND 100000
                    AND mean_word_len BETWEEN 3.0 AND 10.0
                    AND hash_word_ratio <= 0.1
                    AND ellipsis_word_ratio <= 0.1
                    AND bullet_line_frac <= 0.9
                    AND ellipsis_line_frac <= 0.3
                    AND alpha_word_frac >= 0.8
                    AND stop_hits >= 2"""

# Gopher doc-quality signal CTE chain (toked -> lined -> sig), ending
# unterminated so callers append their own final SELECT; __SRC__ is
# the text expression (q_gopher_rules: the raw column; q_curate_gopher
# substitutes its synthesized long-form text).
_GDR_CTES_TMPL = r"""toked AS (
      SELECT doc_id, __SRC__ AS t,
             list_filter(string_split_regex(trim(lower(__SRC__)),
                                            '\s+'), x -> x <> '') AS toks
      FROM __TBL__),
    lined AS (
      SELECT doc_id, t, toks,
             list_filter(list_transform(string_split(t, chr(10)),
                                        l -> trim(l)), l -> l <> '') AS lines
      FROM toked),
    sig AS (
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_words,
             CASE WHEN len(toks) > 0 THEN round(
               list_sum(list_transform(toks, x -> len(x)))::DOUBLE
                 / len(toks), 4) END AS mean_word_len,
             CASE WHEN len(toks) > 0 THEN round(
               (len(t) - len(replace(t, '#', '')))::DOUBLE / len(toks), 4)
               END AS hash_word_ratio,
             CASE WHEN len(toks) > 0 THEN round(
               (len(regexp_extract_all(t, '\.\.\.'))
                + len(regexp_extract_all(t, '…')))::DOUBLE / len(toks), 4)
               END AS ellipsis_word_ratio,
             CASE WHEN len(lines) > 0 THEN round(
               len(list_filter(lines, l -> substr(l, 1, 1) IN ('•','-','*')))
                 ::DOUBLE / len(lines), 4) END AS bullet_line_frac,
             CASE WHEN len(lines) > 0 THEN round(
               len(list_filter(lines, l -> l LIKE '%...' OR l LIKE '%…'))
                 ::DOUBLE / len(lines), 4) END AS ellipsis_line_frac,
             CASE WHEN len(toks) > 0 THEN round(
               len(list_filter(toks, x -> regexp_matches(x, '[a-z]')))::DOUBLE
                 / len(toks), 4) END AS alpha_word_frac,
             CAST(len(list_filter(
               ['the','be','to','of','and','that','have','with'],
               s -> list_contains(toks, s))) AS INTEGER) AS stop_hits
      FROM lined)"""


def _gdr_ctes(
    src_text_expr: str = "coalesce(text, '')",
    src_table: str = "documents",
) -> str:
    return _GDR_CTES_TMPL.replace("__SRC__", src_text_expr).replace(
        "__TBL__", src_table
    )


@_register(
    "q_gopher_rules",
    "\n    WITH "
    + _gdr_ctes()
    + f"""
    SELECT doc_id, n_words, mean_word_len, hash_word_ratio,
           ellipsis_word_ratio,
           bullet_line_frac, ellipsis_line_frac, alpha_word_frac, stop_hits,
           coalesce({_GDR_KEEP}, false) AS keep
    FROM sig
    """,
    "Gopher document-quality rules (Rae et al. 2021 A1.1): word-count "
    "/ word-length / hash+ellipsis symbol ratios (thresholded "
    "SEPARATELY, per the paper's 'either') / bullet / ellipsis-line / "
    "alpha / stopword signals + the published-threshold keep "
    "conjunction. Pure Column expressions, one scan, no shuffle.",
)
def q_gopher_rules(spark, sf_dir):
    from featurestore_spark.operators.text import gopher_doc_rules

    docs = load_table(spark, sf_dir, "documents")
    return gopher_doc_rules(docs)


def _grt_keep() -> str:
    """The 13-threshold keep conjunction rendered from the SAME dict
    the operator defaults to (GOPHER_REPETITION_THRESHOLDS) so the
    two can never drift."""
    from featurestore_spark.operators.curation import (
        GOPHER_REPETITION_THRESHOLDS as _T,
    )

    return " AND ".join(f"{name} <= {t}" for name, t in _T.items())


def _grt_ctes(src_text_expr: str, src_table: str = "documents") -> str:
    """Gopher-repetition signal CTE chain over ``src_table`` with the
    text column given by ``src_text_expr`` (q_gopher_repetition
    synthesizes line/paragraph structure; q_curate_gopher runs the
    raw text; q_refinedweb_e2e feeds its line-deduped stage CTE).
    Ends with the 13-frac ``final`` CTE, unterminated — callers
    append their own final SELECT."""
    tops = ",\n           ".join(
        f"max(CASE WHEN gn = {n} THEN top_chars END) AS top{n}"
        for n in (2, 3, 4)
    )
    dups = ",\n           ".join(
        f"max(CASE WHEN gn = {n} THEN dup_chars END) AS dup{n}"
        for n in range(5, 11)
    )
    top_cols = ",\n           ".join(
        f"round(gp.top{n} / CAST(nm.norm_len AS DOUBLE), 4)"
        f" AS top_{n}gram_char_frac"
        for n in (2, 3, 4)
    )
    dup_cols = ",\n           ".join(
        f"round(gp.dup{n} / CAST(nm.norm_len AS DOUBLE), 4)"
        f" AS dup_{n}gram_char_frac"
        for n in range(5, 11)
    )
    return rf"""src AS (
      SELECT doc_id, {src_text_expr} AS text
      FROM {src_table}),
    toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\s+'),
                         t -> t <> '') AS tk
      FROM src),
    nm AS (SELECT doc_id, len(array_to_string(tk, ' ')) AS norm_len
           FROM toks),
    lines AS (
      SELECT doc_id, u FROM (
        SELECT doc_id, trim(unnest(string_split(text, chr(10)))) AS u
        FROM src)
      WHERE u <> ''),
    paras AS (
      SELECT doc_id, u FROM (
        SELECT doc_id,
               trim(unnest(string_split(text, chr(10) || chr(10)))) AS u
        FROM src)
      WHERE u <> ''),
    lstats AS (
      SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
             CAST(sum(c - 1) AS BIGINT) AS dup_n,
             CAST(sum((c - 1) * l) AS BIGINT) AS dup_chars,
             CAST(sum(c * l) AS BIGINT) AS total_chars
      FROM (SELECT doc_id, count(*) AS c, len(u) AS l
            FROM lines GROUP BY doc_id, u)
      GROUP BY doc_id),
    pstats AS (
      SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
             CAST(sum(c - 1) AS BIGINT) AS dup_n,
             CAST(sum((c - 1) * l) AS BIGINT) AS dup_chars,
             CAST(sum(c * l) AS BIGINT) AS total_chars
      FROM (SELECT doc_id, count(*) AS c, len(u) AS l
            FROM paras GROUP BY doc_id, u)
      GROUP BY doc_id),
    glist AS (
      SELECT t.doc_id, ns.n AS gn,
             CASE WHEN len(tk) >= ns.n
                  THEN list_transform(
                         generate_series(1, len(tk) - ns.n + 1),
                         i -> array_to_string(tk[i:i+ns.n-1], ' '))
                  ELSE CAST([] AS VARCHAR[]) END AS gs
      FROM toks t CROSS JOIN
           (SELECT unnest([2,3,4,5,6,7,8,9,10]) AS n) ns),
    grams AS (SELECT doc_id, gn, unnest(gs) AS g FROM glist),
    gstats AS (
      SELECT doc_id, gn,
             CAST(max(c * l) AS BIGINT) AS top_chars,
             CAST(sum((c - 1) * l) AS BIGINT) AS dup_chars
      FROM (SELECT doc_id, gn, count(*) AS c, len(g) AS l
            FROM grams GROUP BY doc_id, gn, g)
      GROUP BY doc_id, gn),
    gp AS (
      SELECT doc_id,
           {tops},
           {dups}
      FROM gstats GROUP BY doc_id),
    final AS (
      SELECT d.doc_id,
           round(ls.dup_n / CAST(ls.n AS DOUBLE), 4) AS dup_line_frac,
           round(ls.dup_chars / CAST(ls.total_chars AS DOUBLE), 4)
             AS dup_line_char_frac,
           round(ps.dup_n / CAST(ps.n AS DOUBLE), 4) AS dup_para_frac,
           round(ps.dup_chars / CAST(ps.total_chars AS DOUBLE), 4)
             AS dup_para_char_frac,
           {top_cols},
           {dup_cols}
      FROM {src_table} d
      LEFT JOIN lstats ls USING (doc_id)
      LEFT JOIN pstats ps USING (doc_id)
      LEFT JOIN gp USING (doc_id)
      LEFT JOIN nm USING (doc_id))"""


# q_gopher_repetition's synthesized line/paragraph structure
# (' table ' -> newline, ' batch ' -> blank line)
_GRT_SYNTH = (
    "replace(replace(coalesce(text, ''), ' table ', chr(10)), "
    "' batch ', chr(10) || chr(10))"
)


@_register(
    "q_gopher_repetition",
    "\n    WITH "
    + _grt_ctes(_GRT_SYNTH)
    + f"""
    SELECT *, coalesce({_grt_keep()}, FALSE) AS keep FROM final
    """,
    "The repetition half of the Gopher filter table (Rae et al. 2021 "
    "A1.1): dup line/paragraph fractions by count and char mass, top "
    "2/3/4-gram char mass, dup 5..10-gram char mass, conjunction "
    "keep at the paper's 13 thresholds. Line/paragraph structure is "
    "synthesized from the fixture text (' table ' -> newline, "
    "' batch ' -> blank line) identically in both engines. Spark side "
    "is one zero-exchange scan: per-doc in-plan sort+run-walk folds, "
    "never a corpus aggregate; the oracle recomputes every signal "
    "relationally (unnest -> per-unit counts -> char masses).",
)
def q_gopher_repetition(spark, sf_dir):
    from featurestore_spark.operators.curation import gopher_repetition_rules

    docs = load_table(spark, sf_dir, "documents")
    src = docs.select(
        "doc_id",  # (synth continues below)
        F.replace(
            F.replace(F.col("text"), F.lit(" table "), F.lit("\n")),
            F.lit(" batch "),
            F.lit("\n\n"),
        ).alias("text"),
    )
    return gopher_repetition_rules(src)


def _grt_pos_ctes() -> str:
    """Positional-coverage continuation of `_grt_ctes` (appended after
    its `final` CTE): per (doc, n), the characters of the normalized
    text covered by occurrences of the TARGET grams — the top gram by
    count (ties toward the lexicographically smallest) for n in 2..4,
    every gram occurring >= 2 times for n in 5..10 — each position
    counted ONCE. Classic gaps-and-islands: occurrence intervals
    [token-char-start, start+len(gram)) have non-decreasing starts in
    token order, so the union length sums each interval's part beyond
    the running max end."""
    return r"""
    tokpos AS (  -- 0-based char start of each token in the normalized text
      SELECT doc_id, i,
             coalesce(sum(l + 1) OVER (PARTITION BY doc_id ORDER BY i
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS st
      FROM (SELECT doc_id,
                   unnest(generate_series(1, len(tk))) AS i,
                   unnest(list_transform(tk, x -> len(x))) AS l
            FROM toks)),
    pgrams AS (  -- positionally-indexed grams, all 9 sizes
      SELECT doc_id, gn, unnest(generate_series(1, ni)) AS i, tk
      FROM (SELECT t.doc_id, ns.n AS gn, t.tk,
                   len(t.tk) - ns.n + 1 AS ni
            FROM toks t CROSS JOIN
                 (SELECT unnest([2,3,4,5,6,7,8,9,10]) AS n) ns)
      WHERE ni >= 1),
    pg AS (
      SELECT doc_id, gn, i,
             array_to_string(tk[i:i+gn-1], ' ') AS g
      FROM pgrams),
    tsel AS (  -- target grams per (doc, n)
      SELECT doc_id, gn, g FROM (
        SELECT doc_id, gn, g, cnt,
               row_number() OVER (PARTITION BY doc_id, gn
                                  ORDER BY cnt DESC, g ASC) AS rn
        FROM (SELECT doc_id, gn, g, count(*) AS cnt
              FROM pg GROUP BY doc_id, gn, g))
      WHERE (gn <= 4 AND rn = 1) OR (gn >= 5 AND cnt >= 2)),
    occ AS (
      SELECT p.doc_id, p.gn, p.i, tp.st AS s, tp.st + len(p.g) AS e
      FROM pg p
      JOIN tsel USING (doc_id, gn, g)
      JOIN tokpos tp ON tp.doc_id = p.doc_id AND tp.i = p.i),
    covp AS (  -- union length of the occurrence intervals
      SELECT doc_id, gn,
             CAST(sum(greatest(0, e - greatest(s, coalesce(pmax, s))))
                  AS BIGINT) AS cov
      FROM (SELECT *, max(e) OVER (PARTITION BY doc_id, gn ORDER BY i
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
            FROM occ)
      GROUP BY doc_id, gn),
    gpp AS (
      SELECT doc_id,
           """ + ",\n           ".join(
        f"max(CASE WHEN gn = {n} THEN cov END) AS cov{n}"
        for n in range(2, 11)
    ) + r"""
      FROM covp GROUP BY doc_id),
    ntk AS (SELECT doc_id, len(tk) AS ntk FROM toks),
    posfinal AS (
      SELECT f.doc_id, f.dup_line_frac, f.dup_line_char_frac,
             f.dup_para_frac, f.dup_para_char_frac,
           """ + ",\n           ".join(
        f"CASE WHEN nt.ntk >= {n} THEN round(coalesce(gpp.cov{n}, 0)"
        f" / CAST(nm.norm_len AS DOUBLE), 4) END AS "
        + (f"top_{n}gram_char_frac" if n <= 4 else f"dup_{n}gram_char_frac")
        for n in range(2, 11)
    ) + r"""
      FROM final f
      JOIN ntk nt USING (doc_id)
      JOIN nm USING (doc_id)
      LEFT JOIN gpp USING (doc_id))"""


@_register(
    "q_gopher_positional",
    "\n    WITH "
    + _grt_ctes(_GRT_SYNTH)
    + ","
    + _grt_pos_ctes()
    + f"""
    SELECT *, coalesce({_grt_keep()}, FALSE) AS keep FROM posfinal
    """,
    "gopher_repetition_rules(positional=True): the PAPER-EXACT n-gram "
    "char coverage (Rae et al. count each character position once; "
    "the default occurrence-counted masses are a documented upper "
    "bound, so the default filter is slightly stricter near the "
    "thresholds — this variant closes that divergence, VERDICT r9 "
    "#4). top_{2,3,4}: characters covered by THE most frequent gram "
    "(ties toward the lexicographically smallest); dup_{5..10}: "
    "characters covered by any gram occurring twice — overlapping "
    "occurrences counted once, via one left-to-right interval-sweep "
    "fold per n (zero exchanges). Oracle replays the union length "
    "with gaps-and-islands over token char positions.",
)
def q_gopher_positional(spark, sf_dir):
    from featurestore_spark.operators.curation import gopher_repetition_rules

    docs = load_table(spark, sf_dir, "documents")
    src = docs.select(
        "doc_id",
        F.replace(
            F.replace(F.col("text"), F.lit(" table "), F.lit("\n")),
            F.lit(" batch "),
            F.lit("\n\n"),
        ).alias("text"),
    )
    return gopher_repetition_rules(src, positional=True)


# q_curate_gopher's long-form fixture text: the raw docs are under
# Gopher's 50-word minimum, so both engines synthesize "text + a
# position-suffixed copy + a stopword tail" — doubles the word count
# past the minimum with UNIQUE tokens in the second half (so the
# corpus-vocabulary repetition stays moderate) while the first half
# keeps the raw text's natural repetition for the signals to see.
_CURATE_SYNTH = (
    "coalesce(text, '') || ' ' || array_to_string(list_transform("
    "generate_series(1, len(string_split(coalesce(text, ''), ' '))), "
    "i -> string_split(coalesce(text, ''), ' ')[i] || '_' || i), ' ')"
    " || ' of and that have with'"
)


def _curate_synth_col():
    """The Spark Column equivalent of `_CURATE_SYNTH` (raw text + a
    position-suffixed copy + a stopword tail) — ONE definition shared
    by q_curate_gopher and q_refinedweb_e2e so the two Spark fixtures
    can never drift from the oracle constant."""
    raw = F.coalesce(F.col("text"), F.lit(""))
    toks = F.split(raw, " ")
    pos = F.array_join(
        F.transform(
            toks,
            lambda t, i: F.concat(t, F.lit("_"), (i + F.lit(1)).cast("string")),
        ),
        " ",
    )
    return F.concat(raw, F.lit(" "), pos, F.lit(" of and that have with"))


@_register(
    "q_curate_gopher",
    "\n    WITH "
    + _gdr_ctes(_CURATE_SYNTH)
    + ",\n    "
    + _grt_ctes(_CURATE_SYNTH)
    + f""",
    dkeep AS (SELECT doc_id FROM sig WHERE {_GDR_KEEP}),
    rkeep AS (SELECT doc_id FROM final WHERE {_grt_keep()})
    SELECT t.doc_id, t.t AS text FROM toked t
    JOIN dkeep USING (doc_id) JOIN rkeep USING (doc_id)
    """,
    "curate_corpus('gopher') END TO END: BOTH halves of the Gopher "
    "filter table (doc-quality rules AND the 13 repetition rules) "
    "conjoined at the published thresholds — the one-call preset "
    "path itself carries hash evidence, not just its components "
    "(VERDICT r8 #6). Text is the shared long-form synthesis (raw + "
    "position-suffixed copy + stopword tail: past the 50-word "
    "minimum, moderate repetition). The oracle shares the "
    "q_gopher_rules and q_gopher_repetition CTE chains verbatim "
    "(generated from the same threshold constants), so the preset "
    "can never drift from the pieces. Spark side is ONE linear "
    "zero-exchange scan (passthrough chaining).",
)
def q_curate_gopher(spark, sf_dir):
    from featurestore_spark.operators.curation import curate_corpus

    docs = load_table(spark, sf_dir, "documents")
    synth = docs.select("doc_id", _curate_synth_col().alias("text"))
    return curate_corpus(synth, "gopher")


@_register(
    "q_fineweb_rules",
    r"""
    WITH src AS (
      SELECT doc_id,
             replace(text, ' table ', '.' || chr(10))
             || CASE WHEN doc_id % 4 = 0
                     THEN chr(10) || 'spark spark spark.'
                          || chr(10) || 'spark spark spark.'
                     ELSE '' END AS text
      FROM documents),
    lined AS (
      SELECT doc_id,
             list_filter(list_transform(string_split(coalesce(text, ''),
                                                     chr(10)),
                                        l -> trim(l)), l -> l <> '') AS lines
      FROM src),
    arr AS (
      SELECT doc_id, lines, list_sort(lines) AS srt, len(lines) AS nl
      FROM lined),
    sig AS (
      SELECT doc_id,
             CAST(nl AS INTEGER) AS n_lines,
             CASE WHEN nl > 0 THEN round(
               len(list_filter(lines, l -> regexp_matches(l, '[.!?"]$')))
                 ::DOUBLE / nl, 4) END AS punct_line_frac,
             CASE WHEN nl > 0 THEN round(
               coalesce(list_sum(list_transform(range(2, nl + 1),
                 i -> CASE WHEN srt[i] = srt[i-1]
                           THEN len(srt[i]) ELSE 0 END)), 0)::DOUBLE
                 / list_sum(list_transform(lines, l -> len(l))), 4)
               END AS dup_line_char_frac,
             CASE WHEN nl > 0 THEN round(
               len(list_filter(lines, l -> len(l) < 30))::DOUBLE / nl, 4)
               END AS short_line_frac
      FROM arr)
    SELECT doc_id, n_lines, punct_line_frac, dup_line_char_frac,
           short_line_frac,
           coalesce(punct_line_frac > 0.12
                    AND dup_line_char_frac < 0.1
                    AND short_line_frac < 0.67, false) AS keep
    FROM sig
    """,
    "FineWeb custom quality filters (Penedo et al. 2024 §3.3): "
    "terminal-punctuation line fraction > 0.12, duplicated-line "
    "character fraction < 0.1 (occurrences beyond first, computed by "
    "an in-plan array sort — duplicate mass needs line identity only "
    "WITHIN a doc, never a corpus group-by), short-line fraction "
    "< 0.67. Pure Column expressions, one scan, zero exchanges. "
    "Fixture synthesizes lines like q_c4_filter and appends a "
    "duplicated line pair to every fourth doc so the dup signal has "
    "real spread.",
)
def q_fineweb_rules(spark, sf_dir):
    from featurestore_spark.operators.text import fineweb_doc_rules

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "text",
        F.concat(
            F.replace(F.col("text"), F.lit(" table "), F.lit(".\n")),
            F.when(
                F.col("doc_id") % 4 == 0,
                F.lit("\nspark spark spark.\nspark spark spark."),
            ).otherwise(F.lit("")),
        ),
    )
    return fineweb_doc_rules(docs)


@_register(
    "q_c4_filter",
    r"""
    WITH src AS (
      SELECT doc_id,
             replace(text, ' table ', '.' || chr(10)) AS text
      FROM documents),
    lined AS (
      SELECT doc_id,
             list_filter(list_transform(string_split(coalesce(text, ''),
                                                     chr(10)),
                                        l -> trim(l)), l -> l <> '') AS lines,
             lower(coalesce(text, '')) AS lowered
      FROM src),
    keptl AS (
      SELECT doc_id, lines, lowered,
             list_filter(lines, l ->
               regexp_matches(l, '[.!?"]$')
               AND len(list_filter(string_split_regex(l, '\s+'),
                                   w -> w <> '')) >= 5
               AND NOT contains(lower(l), 'javascript')) AS kept
      FROM lined),
    cl AS (
      SELECT doc_id, lines, lowered, kept,
             -- array_to_string([]) is NULL in DuckDB; Spark concat_ws is ''
             coalesce(array_to_string(kept, chr(10)), '') AS cleaned
      FROM keptl)
    SELECT doc_id,
           cleaned AS text,
           CAST(len(lines) AS INTEGER) AS n_lines,
           CAST(len(kept) AS INTEGER) AS n_kept_lines,
           CAST(len(regexp_extract_all(cleaned, '[.!?]')) AS INTEGER)
             AS n_sentences,
           (len(kept) >= 1
            AND len(regexp_extract_all(cleaned, '[.!?]')) >= 3
            AND NOT contains(lowered, 'lorem ipsum')
            AND NOT contains(lowered, '{')) AS keep
    FROM cl
    """,
    "C4 line-level cleaning (Raffel et al. 2020 §2.2) at the PAPER's "
    "published defaults: terminal-punctuation / >=5-words / "
    "javascript line rules + lorem-ipsum / curly-brace / >=3-sentence "
    "page rules (bad-words list deliberately omitted, see docstring). "
    "The fixture corpus has no line structure, so both engines first "
    "synthesize lines by replacing ' table ' with '.\\n' (identical "
    "non-overlapping left-to-right replace in both).",
)
def q_c4_filter(spark, sf_dir):
    from featurestore_spark.operators.curation import c4_line_filter

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "text", F.replace(F.col("text"), F.lit(" table "), F.lit(".\n"))
    )
    return c4_line_filter(docs)


@_register(
    "q_ngram_novelty",
    r"""
    WITH toked AS (
      SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
      FROM documents),
    shingled AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(toks) >= 3
               THEN list_transform(generate_series(1, len(toks) - 2),
                                   i -> array_to_string(toks[i:i+2], ' '))
               ELSE [array_to_string(toks, ' ')] END) AS sh
      FROM toked),
    grams AS (
      SELECT doc_id, g FROM (SELECT doc_id, unnest(sh) AS g FROM shingled)
      WHERE g <> ''),
    firsts AS (SELECT g, min(doc_id) AS first_id FROM grams GROUP BY g)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN first_id = doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           round(sum(CASE WHEN first_id = doc_id THEN 1 ELSE 0 END)::DOUBLE
                 / count(*), 4) AS novel_frac
    FROM grams JOIN firsts USING (g)
    GROUP BY doc_id
    """,
    "Per-document n-gram novelty: fraction of the doc's distinct "
    "trigrams first seen (min doc_id) in this doc — templated/mirror "
    "content scores ~0. One shuffle on the md5 gram key, reused by "
    "the first-occurrence aggregate and the merge-join back.",
)
def q_ngram_novelty(spark, sf_dir):
    from featurestore_spark.operators.curation import ngram_novelty

    docs = load_table(spark, sf_dir, "documents")
    return ngram_novelty(docs, n=3)


@_register(
    "q_dsir_weights",
    r"""
    WITH toked AS (
      SELECT doc_id, source,
             list_filter(string_split_regex(trim(lower(coalesce(text, ''))),
                                            '\s+'), t -> t <> '') AS toks
      FROM documents),
    grams AS (
      SELECT doc_id, source, g
      FROM (SELECT doc_id, source, unnest(toks) AS g FROM toked)
      UNION ALL
      SELECT doc_id, source, g
      FROM (SELECT doc_id, source,
                   unnest(list_transform(generate_series(1, len(toks) - 1),
                                         i -> toks[i] || ' ' || toks[i+1]))
                     AS g
            FROM toked WHERE len(toks) >= 2)),
    b AS (
      SELECT doc_id, source,
             CAST(CAST(('0x' || substr(md5(g), 1, 7)) AS UBIGINT) % 10000
                  AS INTEGER) AS bucket
      FROM grams),
    tm AS (SELECT bucket, count(*) AS ct FROM b WHERE source = 'src0'
           GROUP BY bucket),
    rm AS (SELECT bucket, count(*) AS cr FROM b GROUP BY bucket),
    tot AS (SELECT (SELECT sum(ct) FROM tm) AS nt,
                   (SELECT sum(cr) FROM rm) AS nr),
    ratio AS (
      SELECT rm.bucket,
             ln((coalesce(tm.ct, 0) + 1.0) / (tot.nt + 1.0 * 10000))
             - ln((rm.cr + 1.0) / (tot.nr + 1.0 * 10000)) AS lr
      FROM rm LEFT JOIN tm USING (bucket) CROSS JOIN tot)
    SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_feats,
           round(sum(lr), 4) AS log_weight
    FROM b JOIN ratio USING (bucket)
    GROUP BY b.doc_id
    """,
    "DSIR importance weights (Xie et al. 2023): per-doc log-likelihood "
    "ratio of the hashed uni+bigram bag under a target-domain model "
    "(source='src0') vs the raw-corpus model, add-1 smoothed over 10k "
    "md5 buckets. Model fit is two bucket-bounded aggregates; scoring "
    "joins the corpus feature stream against the BROADCAST ratio "
    "table, so the corpus shuffles only on the per-doc sum.",
)
def q_dsir_weights(spark, sf_dir):
    from featurestore_spark.operators.materialize import materialize
    from featurestore_spark.operators.sampling import (
        dsir_log_weights,
        hashed_ngram_features,
        hashed_ngram_model,
    )

    docs = load_table(spark, sf_dir, "documents")
    # tokenize+hash the corpus ONCE (carrying the domain label) and
    # derive all three consumers — target model, raw model, scoring
    # stream — from the materialized feature frame; the naive
    # composition re-extracts the corpus three times (target model,
    # raw model, scoring). Filter-after-extract is count-identical to
    # extract-after-filter (per-row projection+explode commutes).
    feats = materialize(hashed_ngram_features(docs, carry_cols=("source",)))
    return dsir_log_weights(
        docs,
        hashed_ngram_model(docs, features=feats.where(F.col("source") == "src0")),
        hashed_ngram_model(docs, features=feats),
        features=feats.select("doc_id", "bucket"),
    )


def _strip_html_sql(expr: str) -> str:
    """The strip_html replay (script/style/comment removal, tag
    strip, entity decode, whitespace collapse) over an arbitrary SQL
    expression — ONE definition shared by q_strip_html, q_web_funnel
    and the q_refinedweb_e2e capstone, so a change to the operator
    has exactly one oracle site to update in lockstep."""
    return (
        r"""trim(regexp_replace(
               replace(replace(replace(replace(replace(replace(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(
                         __E__,
                         '(?is)<script[^>]*>.*?</script\s*>', ' ', 'g'),
                       '(?is)<style[^>]*>.*?</style\s*>', ' ', 'g'),
                     '(?s)<!--.*?-->', ' ', 'g'),
                   '<[^>]*>', ' ', 'g'),
                 '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
                 '&quot;', '"'), '&#39;', chr(39)), '&amp;', '&'),
               '\s+', ' ', 'g'))"""
    ).replace("__E__", expr)


@_register(
    "q_strip_html",
    r"""
    WITH src AS (
      SELECT doc_id,
             '<html><head><style>p{color:red}</style></head><body>'
             || '<!-- generated -->'
             || '<p class="x">' || replace(text, ' value ', '</p><p>')
             || '</p><script>var x = "<b>";</script>&amp;lt; &nbsp;done'
             || '</body></html>' AS html
      FROM documents),
    stripped AS (
      SELECT doc_id, """
    + _strip_html_sql("html")
    + r""" AS text
      FROM src)
    SELECT doc_id, text,
           CAST(length(text) AS INTEGER) AS n_chars
    FROM stripped
    """,
    "HTML → plain text (web-ingest front of the curation pipeline): "
    "script/style/comment/tag removal + entity decode + whitespace "
    "collapse, all RE2-portable regexes. Both engines first wrap the "
    "fixture text in identical synthesized markup (incl. a script "
    "whose string literal contains a tag, and a double-encoded "
    "entity).",
)
def q_strip_html(spark, sf_dir):
    from featurestore_spark.operators.text import strip_html

    docs = load_table(spark, sf_dir, "documents")
    html = F.concat(
        F.lit('<html><head><style>p{color:red}</style></head><body>'),
        F.lit("<!-- generated -->"),
        F.lit('<p class="x">'),
        F.replace(F.col("text"), F.lit(" value "), F.lit("</p><p>")),
        F.lit('</p><script>var x = "<b>";</script>&amp;lt; &nbsp;done'),
        F.lit("</body></html>"),
    )
    out = docs.select("doc_id", strip_html(html).alias("text"))
    return out.withColumn("n_chars", F.length("text").cast("int"))


def _strip_block_sql(expr: str) -> str:
    """DuckDB replay of text._strip_tags_collapse (the PER-BLOCK half
    of strip_html: tag strip + entity decode + whitespace collapse —
    script/style/comments are removed once GLOBALLY before the block
    split, so they must not be re-removed per block)."""
    return (
        r"""trim(regexp_replace(
               replace(replace(replace(replace(replace(replace(
                 regexp_replace(__E__, '<[^>]*>', ' ', 'g'),
                 '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
                 '&quot;', '"'), '&#39;', chr(39)), '&amp;', '&'),
               '\s+', ' ', 'g'))"""
    ).replace("__E__", expr)


def _stop_density_sql(expr: str) -> str:
    """DuckDB replay of main_content_blocks' stop_density over an
    already-stripped block text expression: fraction of the [a-z]+
    tokens in EN_STOPWORDS (0.0 for token-less blocks). The token
    pipeline is inlined three times because SQL lambdas cannot bind
    intermediates — the list is identical in all three spots."""
    from featurestore_spark.operators.text import EN_STOPWORDS

    stops = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
    toks = (
        "list_filter(string_split_regex(lower(__E__), '[^a-z]+'), "
        "t -> t <> '')"
    ).replace("__E__", expr)
    return (
        f"CASE WHEN len({toks}) > 0 THEN "
        f"CAST(len(list_filter({toks}, t -> list_contains([{stops}], t)))"
        f" AS DOUBLE) / len({toks}) ELSE 0.0 END"
    )


def _main_content_oracle() -> str:
    """q_main_content oracle, rendered from the operator's OWN
    constants (BLOCK_TAG_SPLIT, EN_STOPWORDS, the jusText-lite gate
    defaults) so the two engines cannot drift. Recipe pre-validated
    r11 (PLANS.md): struct-building list_transform stages because SQL
    lambdas cannot bind intermediates, and coalesce(list_sum(...), 0)
    where Spark's aggregate seed gives 0 on an empty anchor list but
    DuckDB's list_sum gives NULL."""
    import inspect

    from featurestore_spark.operators.text import (
        BLOCK_TAG_SPLIT,
        extract_main_content,
    )

    # the jusText gates come from the FUNCTION DEFAULTS (not literals)
    # so a tuned default moves both engines in lockstep
    gate = {
        k: p.default
        for k, p in inspect.signature(extract_main_content).parameters.items()
    }
    min_chars = gate["min_chars"]
    max_ld = gate["max_link_density"]
    min_sd = gate["min_stop_density"]
    split = BLOCK_TAG_SPLIT.replace("'", "''")
    strip_b = _strip_block_sql("b")
    strip_x = _strip_block_sql("x")
    return rf"""
    WITH src AS (
      SELECT doc_id,
             '<html><head><title>t</title><style>p{{color:red}}</style>'
             || '</head><body><nav><a href="/h">Home</a> '
             || '<a href="/a">About</a> | <a href="/c">Contact</a></nav>'
             || '<h1>Doc ' || CAST(doc_id AS VARCHAR) || '</h1>'
             || '<p>' || text || '</p>'
             || '<div>See <a href="/m">more of the archive</a>'
             || ' for details of all of the rest of it</div>'
             || '<!-- boilerplate --><script>var x = "<p>no</p>";</script>'
             || '<footer>(c) 2024 Example</footer></body></html>' AS html
      FROM documents),
    scrub AS (
      SELECT doc_id,
             regexp_replace(
               regexp_replace(
                 regexp_replace(html,
                   '(?is)<script[^>]*>.*?</script\s*>', ' ', 'g'),
                 '(?is)<style[^>]*>.*?</style\s*>', ' ', 'g'),
               '(?s)<!--.*?-->', ' ', 'g') AS c
      FROM src),
    blk AS (
      SELECT doc_id,
             list_filter(
               list_transform(regexp_split_to_array(c, '{split}'),
                 b -> struct_pack(
                   text := {strip_b},
                   linked_len := coalesce(list_sum(list_transform(
                     regexp_extract_all(b,
                       '(?is)<a\b[^>]*>(.*?)</a\s*>', 1),
                     x -> length({strip_x}))), 0))),
               s -> length(s.text) > 0) AS bl
      FROM scrub),
    mt AS (
      SELECT doc_id, bl,
             array_to_string(list_transform(list_filter(bl, s ->
               length(s.text) >= {min_chars}
               AND CAST(s.linked_len AS DOUBLE) / length(s.text) <= {max_ld}
               AND {_stop_density_sql("s.text")} >= {min_sd}),
               s -> s.text), ' ') AS main_text
      FROM blk),
    ex AS (
      SELECT doc_id, main_text, bl,
             unnest(generate_series(1, len(bl))) AS i
      FROM mt)
    SELECT doc_id,
           CAST(i - 1 AS INTEGER) AS block_idx,
           bl[i].text AS block_text,
           CAST(length(bl[i].text) AS INTEGER) AS n_chars,
           CAST(bl[i].linked_len AS DOUBLE) / length(bl[i].text)
             AS link_density,
           {_stop_density_sql("bl[i].text")} AS stop_density,
           main_text
    FROM ex
    """


@_register(
    "q_main_content",
    _main_content_oracle(),
    "jusText-lite main-content extraction (the boilerplate-removal "
    "stage between the WARC payload and every text rule — RefinedWeb "
    "uses trafilatura here): both engines wrap the fixture text in "
    "identical synthesized markup (nav/footer link boilerplate, a "
    "prose block, a mixed link+prose div, script/style/comment "
    "noise), split on block-level tags, and score each non-empty "
    "block (n_chars, anchor-text link_density, EN-stopword "
    "stop_density) — plus the gated, space-joined main_text per doc. "
    "Densities are exact small-integer ratios, identical IEEE "
    "doubles in both engines (pre-validated r11), so no rounding. "
    "Spark side is pure nested higher-order Column expressions: one "
    "codegen'd projection + one posexplode, no UDF, no exchange "
    "before the driver's comparison sort.",
)
def q_main_content(spark, sf_dir):
    from featurestore_spark.operators.text import (
        extract_main_content,
        main_content_blocks,
    )

    from featurestore_spark.operators.materialize import fan_out

    # block scoring is per-row-heavy regex/HOF work with no exchange:
    # un-starve the one-row-group testdata scan (no-op at scale)
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    html = F.concat(
        F.lit(
            '<html><head><title>t</title><style>p{color:red}</style>'
            '</head><body><nav><a href="/h">Home</a> '
            '<a href="/a">About</a> | <a href="/c">Contact</a></nav>'
            "<h1>Doc "
        ),
        F.col("doc_id").cast("string"),
        F.lit("</h1><p>"),
        F.col("text"),
        F.lit(
            '</p><div>See <a href="/m">more of the archive</a>'
            " for details of all of the rest of it</div>"
            '<!-- boilerplate --><script>var x = "<p>no</p>";</script>'
            "<footer>(c) 2024 Example</footer></body></html>"
        ),
    )
    from featurestore_spark.operators.materialize import plan_fence

    base = docs.select(
        "doc_id",
        main_content_blocks(html).alias("bl"),
        extract_main_content(html).alias("main_text"),
    )
    # fence before the posexplode: the inferred size(bl)>0 filter
    # otherwise re-inlines the whole nested block-scoring chain as an
    # interpreted per-row re-evaluation (PLANS r12)
    out = plan_fence(base).select(
        "doc_id",
        "main_text",
        F.posexplode("bl").alias("block_idx", "b"),
    )
    return out.select(
        "doc_id",
        F.col("block_idx").cast("int").alias("block_idx"),
        F.col("b.text").alias("block_text"),
        F.col("b.n_chars").cast("int").alias("n_chars"),
        F.col("b.link_density").alias("link_density"),
        F.col("b.stop_density").alias("stop_density"),
        "main_text",
    )


@_register(
    "q_temperature_mixture",
    r"""
    WITH c AS (SELECT source, count(*) AS n FROM documents
               WHERE source IS NOT NULL GROUP BY source),
    t AS (SELECT sum(n) AS nt FROM c),
    w AS (SELECT source, n, nt, pow(n::DOUBLE / nt, 1.0 / 3.0) AS w
          FROM c CROSS JOIN t),
    z AS (SELECT sum(w) AS z FROM w),
    thr AS (SELECT source,
                   CAST(round(least(1.0, (w.w / z.z) * 0.5 * nt / n)
                              * 1000000, 0) AS BIGINT) AS thr
            FROM w CROSS JOIN z)
    SELECT d.doc_id, d.source
    FROM documents d JOIN thr USING (source)
    WHERE CAST(CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 7))
               AS UBIGINT) % 1000000 AS BIGINT) < thr
    """,
    "mT5 temperature mixture sampling (T=3, target half the corpus): "
    "per-source share p_i^(1/T) normalized into sampling weights, "
    "materialized as capped per-source keep fractions over the stable "
    "md5 hash. Source-bounded aggregates + a broadcast threshold "
    "join; the corpus never shuffles.",
)
def q_temperature_mixture(spark, sf_dir):
    from featurestore_spark.operators.sampling import temperature_mixture_sample

    docs = load_table(spark, sf_dir, "documents")
    out = temperature_mixture_sample(docs, temperature=3.0, target_frac=0.5)
    return out.select("doc_id", "source")


@_register(
    "q_repeat_epochs",
    r"""
    WITH planned AS (
      SELECT doc_id, source,
             (CASE source WHEN 'src0' THEN 2 WHEN 'src1' THEN 0 ELSE 1 END)
             + (CASE WHEN CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                     1, 7)) AS UBIGINT) % 1000000 AS BIGINT)
                     < (CASE source WHEN 'src0' THEN 500000
                                    WHEN 'src1' THEN 250000 ELSE 0 END)
                THEN 1 ELSE 0 END) AS nc
      FROM documents)
    SELECT doc_id, source, CAST(e AS INTEGER) AS epoch
    FROM (SELECT doc_id, source, unnest(generate_series(0, nc - 1)) AS e
          FROM planned WHERE nc > 0)
    """,
    "Deterministic fractional-epoch repetition (data-recipe "
    "upsampling: src0 x2.5, src1 x0.25, rest x1): floor(e) copies per "
    "row plus one more for the stable-hash fraction, numbered by "
    "epoch. Projection + explode, no shuffle.",
)
def q_repeat_epochs(spark, sf_dir):
    from featurestore_spark.operators.sampling import repeat_epochs

    docs = load_table(spark, sf_dir, "documents")
    out = repeat_epochs(docs, {"src0": 2.5, "src1": 0.25})
    return out.select("doc_id", "source", F.col("epoch").cast("int").alias("epoch"))


@_register(
    "q_nb_classify",
    r"""
    WITH toked AS (
      SELECT doc_id, lang,
             list_filter(string_split_regex(trim(lower(coalesce(text, ''))),
                                            '\s+'), t -> t <> '') AS toks
      FROM documents),
    tok AS (
      SELECT doc_id, w, count(*) AS m
      FROM (SELECT doc_id, unnest(toks) AS w FROM toked)
      GROUP BY doc_id, w),
    wc AS (
      SELECT lang AS label, w, count(*) AS c
      FROM (SELECT lang, unnest(toks) AS w FROM toked WHERE lang IS NOT NULL)
      GROUP BY lang, w),
    cs AS (SELECT lang AS label, count(*) AS n_docs,
                  sum(len(toks)) AS n_tokens
           FROM toked WHERE lang IS NOT NULL GROUP BY lang),
    v AS (SELECT count(DISTINCT w)::DOUBLE AS v FROM wc),
    nd AS (SELECT sum(n_docs)::DOUBLE AS nd FROM cs),
    consts AS (SELECT label, ln(n_docs / nd.nd) AS prior,
                      ln(1.0 / (n_tokens + 1.0 * v.v)) AS base
               FROM cs CROSS JOIN v CROSS JOIN nd),
    td AS (SELECT doc_id, len(toks) AS td FROM toked),
    corr AS (SELECT t.doc_id, wc.label,
                    sum(t.m * ln((wc.c + 1.0) / 1.0)) AS corr
             FROM tok t JOIN wc USING (w) GROUP BY t.doc_id, wc.label),
    scored AS (
      SELECT td.doc_id, consts.label,
             round(consts.prior + td.td * consts.base
                   + coalesce(corr.corr, 0.0), 4) AS score
      FROM td CROSS JOIN consts
      LEFT JOIN corr ON corr.doc_id = td.doc_id
                    AND corr.label = consts.label)
    SELECT doc_id, label AS label_pred, score
    FROM (SELECT doc_id, label, score,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY score DESC, label) AS rn
          FROM scored)
    WHERE rn = 1
    """,
    "Multinomial Naive Bayes text classification (the SQL-expressible "
    "stand-in for fastText-style quality/domain filters): fit = pure "
    "counting over the labeled corpus (lang as the label), classify = "
    "sparse (word, class) join with the smoothed-default mass factored "
    "out per class, scores rounded before the argmax.",
)
def q_nb_classify(spark, sf_dir):
    from featurestore_spark.operators.search import fit_nb_classifier, nb_classify

    docs = load_table(spark, sf_dir, "documents")
    model = fit_nb_classifier(docs, "lang")
    return nb_classify(docs, model)


@_register(
    "q_lid_classify",
    r"""
    WITH normed AS (
      SELECT doc_id, lang,
             trim(regexp_replace(lower(coalesce(text, '')), '\s+', ' ',
                                 'g')) AS s
      FROM documents),
    toked AS (
      SELECT doc_id, lang,
             CASE WHEN len(s) >= 3
                  THEN list_transform(generate_series(1, len(s) - 2),
                                      i -> s[i:i+2])
                  ELSE CAST([] AS VARCHAR[]) END AS toks
      FROM normed),
    tok AS (
      SELECT doc_id, w, count(*) AS m
      FROM (SELECT doc_id, unnest(toks) AS w FROM toked)
      GROUP BY doc_id, w),
    wc AS (
      SELECT lang AS label, w, count(*) AS c
      FROM (SELECT lang, unnest(toks) AS w FROM toked WHERE lang IS NOT NULL)
      GROUP BY lang, w),
    cs AS (SELECT lang AS label, count(*) AS n_docs,
                  sum(len(toks)) AS n_tokens
           FROM toked WHERE lang IS NOT NULL GROUP BY lang),
    v AS (SELECT count(DISTINCT w)::DOUBLE AS v FROM wc),
    nd AS (SELECT sum(n_docs)::DOUBLE AS nd FROM cs),
    consts AS (SELECT label, ln(n_docs / nd.nd) AS prior,
                      ln(1.0 / (n_tokens + 1.0 * v.v)) AS base
               FROM cs CROSS JOIN v CROSS JOIN nd),
    td AS (SELECT doc_id, len(toks) AS td FROM toked),
    corr AS (SELECT t.doc_id, wc.label,
                    sum(t.m * ln((wc.c + 1.0) / 1.0)) AS corr
             FROM tok t JOIN wc USING (w) GROUP BY t.doc_id, wc.label),
    scored AS (
      SELECT td.doc_id, consts.label,
             round(consts.prior + td.td * consts.base
                   + coalesce(corr.corr, 0.0), 4) AS score
      FROM td CROSS JOIN consts
      LEFT JOIN corr ON corr.doc_id = td.doc_id
                    AND corr.label = consts.label)
    SELECT doc_id, label AS lang_pred, score
    FROM (SELECT doc_id, label, score,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY score DESC, label) AS rn
          FROM scored)
    WHERE rn = 1
    """,
    "TRAINED language-ID (VERDICT r9 #3): lid_fit/lid_classify — "
    "multinomial Naive Bayes over character 3-grams of the "
    "normalized text (lowercase, whitespace collapsed), the "
    "CLD/fastText classifier shape CCNet/RefinedWeb run as the first "
    "multilingual gate; language_scores stays as the train-free "
    "heuristic fallback. Pure composition over fit_nb_classifier/"
    "nb_classify with a char-ngram feature Column: fit is one "
    "counting scan, classify a sparse gram-keyed join, scores "
    "rounded before the argmax (ties on the language code).",
)
def q_lid_classify(spark, sf_dir):
    from featurestore_spark.operators.text import lid_classify, lid_fit

    docs = load_table(spark, sf_dir, "documents")
    model = lid_fit(docs, "lang")
    return lid_classify(docs, model)


@_register(
    "q_quality_classify",
    r"""
    WITH toked AS (
      SELECT doc_id,
             CASE WHEN lang = 'en' THEN 'hq' ELSE 'lq' END AS label,
             list_filter(string_split_regex(trim(lower(coalesce(text, ''))),
                                            '\s+'), t -> t <> '') AS uni
      FROM documents),
    feats AS (
      SELECT doc_id, label,
             list_concat(
               uni,
               CASE WHEN len(uni) >= 2
                    THEN list_transform(generate_series(1, len(uni) - 1),
                                        i -> uni[i] || ' ' || uni[i+1])
                    ELSE CAST([] AS VARCHAR[]) END) AS toks
      FROM toked),
    tok AS (
      SELECT doc_id, w, count(*) AS m
      FROM (SELECT doc_id, unnest(toks) AS w FROM feats)
      GROUP BY doc_id, w),
    wc AS (
      SELECT label, w, count(*) AS c
      FROM (SELECT label, unnest(toks) AS w FROM feats
            WHERE label IS NOT NULL)
      GROUP BY label, w),
    cs AS (SELECT label, count(*) AS n_docs, sum(len(toks)) AS n_tokens
           FROM feats WHERE label IS NOT NULL GROUP BY label),
    v AS (SELECT count(DISTINCT w)::DOUBLE AS v FROM wc),
    nd AS (SELECT sum(n_docs)::DOUBLE AS nd FROM cs),
    consts AS (SELECT label, ln(n_docs / nd.nd) AS prior,
                      ln(1.0 / (n_tokens + 1.0 * v.v)) AS base
               FROM cs CROSS JOIN v CROSS JOIN nd),
    td AS (SELECT doc_id, len(toks) AS td FROM feats),
    corr AS (SELECT t.doc_id, wc.label,
                    sum(t.m * ln((wc.c + 1.0) / 1.0)) AS corr
             FROM tok t JOIN wc USING (w) GROUP BY t.doc_id, wc.label),
    scored AS (
      SELECT td.doc_id, consts.label,
             round(consts.prior + td.td * consts.base
                   + coalesce(corr.corr, 0.0), 4) AS score,
             td.td
      FROM td CROSS JOIN consts
      LEFT JOIN corr ON corr.doc_id = td.doc_id
                    AND corr.label = consts.label)
    SELECT doc_id,
           round((max(CASE WHEN label = 'hq' THEN score END)
                  - max(CASE WHEN label = 'lq' THEN score END))
                 / greatest(max(td), 1), 4) + 0.0 AS quality_score,
           CAST(max(td) AS BIGINT) AS n_features
    FROM scored GROUP BY doc_id
    """,
    "TRAINED model-based quality gate (VERDICT r10 #3 — the DCLM / "
    "FineWeb-Edu stage of the modern stack: rules -> LID -> model "
    "quality filter -> dedup): quality_fit = binary multinomial NB "
    "over word unigrams + adjacent bigrams (fastText's feature "
    "shape) of labeled seeds, quality_classify = per-feature "
    "log-odds (ln p(hq|d) - ln p(lq|d)) / features — "
    "length-normalized so a calibrated threshold transfers across "
    "doc lengths. Fixture label: lang='en' as the positive seed "
    "class. Composed over fit_nb_classifier/nb_scores: one counting "
    "scan to fit, a sparse feature-keyed model join + one "
    "(docs x 2)-bounded pivot groupBy to score.",
)
def q_quality_classify(spark, sf_dir):
    from featurestore_spark.operators.text import (
        quality_classify,
        quality_fit,
    )

    docs = load_table(spark, sf_dir, "documents")
    seeds = docs.select(
        "doc_id",
        "text",
        F.when(F.col("lang") == "en", F.lit("hq"))
        .otherwise(F.lit("lq"))
        .alias("label"),
    )
    model = quality_fit(seeds, "label")
    out = quality_classify(docs, model)
    return out.select(
        "doc_id", "quality_score", F.col("n_features").cast("long")
    )


@_register(
    "q_curation_funnel",
    r"""
    WITH src AS (
      SELECT doc_id, source,
             replace(text, ' table ', '.' || chr(10)) AS text
      FROM documents),
    lined AS (
      SELECT doc_id, source,
             list_filter(list_transform(string_split(coalesce(text, ''),
                                                     chr(10)),
                                        l -> trim(l)), l -> l <> '') AS lines,
             lower(coalesce(text, '')) AS lowered
      FROM src),
    keptl AS (
      SELECT doc_id, source, lines, lowered,
             list_filter(lines, l ->
               regexp_matches(l, '[.!?"]$')
               AND len(list_filter(string_split_regex(l, '\s+'),
                                   w -> w <> '')) >= 5
               AND NOT contains(lower(l), 'javascript')) AS kept
      FROM lined),
    c4 AS (
      SELECT doc_id, source, text
      FROM (SELECT doc_id, source, lowered, kept,
                   coalesce(array_to_string(kept, chr(10)), '') AS text
            FROM keptl)
      WHERE len(kept) >= 1
        AND len(regexp_extract_all(text, '[.!?]')) >= 3
        AND NOT contains(lowered, 'lorem ipsum')
        AND NOT contains(lowered, '{')),
    toked AS (
      SELECT doc_id, source, text,
             list_filter(string_split_regex(trim(lower(text)), '\s+'),
                         t -> t <> '') AS toks
      FROM c4),
    survivors AS (
      SELECT doc_id, source, len(toks) AS n_toks
      FROM toked
      WHERE len(toks) BETWEEN 20 AND 100000
        AND round(list_sum(list_transform(toks, x -> len(x)))::DOUBLE
                  / len(toks), 4) BETWEEN 2.0 AND 10.0
        AND round(len(list_filter(toks, x -> regexp_matches(x, '[a-z]')))
                  ::DOUBLE / len(toks), 4) >= 0.8)
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_toks) AS BIGINT) AS n_tokens,
           min(doc_id) AS min_id
    FROM survivors GROUP BY source
    """,
    "Curation funnel capstone: C4 line cleaning (over engine-identical "
    "synthesized lines) chained into relaxed Gopher document rules "
    "over the CLEANED text, aggregated per source — one plan proving "
    "the round-7 rule operators compose (the q_dedup_ladder role for "
    "the filter surface). Thresholds relaxed to fit the fixture "
    "corpus (min_words=20, word length 2-10, alpha>=0.8; the "
    "stopword/symbol/line rules are exercised by q_gopher_rules "
    "itself).",
)
def q_curation_funnel(spark, sf_dir):
    from featurestore_spark.operators.curation import c4_line_filter
    from featurestore_spark.operators.text import gopher_doc_rules

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "text", F.replace(F.col("text"), F.lit(" table "), F.lit(".\n"))
    )
    cleaned = c4_line_filter(docs.select("doc_id", "source", "text"))
    # c4_line_filter returns (doc_id, text, ...) — re-attach source and
    # keep only surviving pages, then apply the doc-level rules to the
    # CLEANED text
    cleaned = cleaned.where("keep").join(
        docs.select("doc_id", "source"), "doc_id"
    )
    sig = gopher_doc_rules(
        cleaned,
        min_words=20,
        min_mean_word_len=2.0,
        min_stop_hits=0,
        max_symbol_word_ratio=1e9,
        max_bullet_line_frac=1.0,
        max_ellipsis_line_frac=1.0,
    )
    survivors = sig.where("keep").join(
        cleaned.select("doc_id", "source"), "doc_id"
    )
    return survivors.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").alias("n_tokens"),
        F.min("doc_id").alias("min_id"),
    )


@_register(
    "q_hard_negatives",
    _BM25_SC
    + r""",
    ranked AS (SELECT query_id, doc_id, score,
                      row_number() OVER (PARTITION BY query_id
                                         ORDER BY score DESC, doc_id) AS rnk
               FROM sc),
    pos AS (SELECT query_id, doc_id FROM ranked WHERE rnk = 1),
    negs AS (SELECT r.query_id, r.doc_id, r.score, r.rnk
             FROM ranked r
             LEFT JOIN pos p ON p.query_id = r.query_id
                            AND p.doc_id = r.doc_id
             WHERE r.rnk <= 10 AND p.doc_id IS NULL)
    SELECT query_id, CAST(neg_rank AS INTEGER) AS neg_rank, doc_id, score
    FROM (SELECT query_id, doc_id, score,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY rnk) AS neg_rank
          FROM negs)
    WHERE neg_rank <= 5
    """,
    "BM25 hard-negative mining (retriever-training recipe): top-10 "
    "hits per query minus the known positive (here the top-1 hit, "
    "simulating the labeled relevant doc), re-ranked 1..5 — "
    "lexically-close-but-not-relevant docs. Shares the BM25 scoring "
    "CTE with q_bm25_topk; the Spark side composes bm25_topk with an "
    "anti-join and a per-query window.",
)
def q_hard_negatives(spark, sf_dir):
    from featurestore_spark.operators.materialize import materialize
    from featurestore_spark.operators.search import bm25_topk, mine_hard_negatives

    docs = load_table(spark, sf_dir, "documents")
    q = _bm25_queries(spark)
    # the simulated positive IS rank 1 of the same ranking the miner
    # retrieves from — score the corpus once at depth and share the
    # materialized ranking (tiny: <= depth rows/query) between the
    # positive derivation and the mining pass, instead of running the
    # full BM25 corpus scan + postings shuffle twice
    hits = materialize(bm25_topk(docs, q, k=10))
    positives = hits.where(F.col("rank") == 1).select("query_id", "doc_id")
    return mine_hard_negatives(docs, q, positives, k=5, depth=10, hits=hits)


# ---------------------------------------------------------------------------
# Rows-only entries (oracle=None → the driver's weaker rows-check):
# the two operators whose fit stage is inherently iterative and not
# SQL-expressible (VERDICT r6 #4). Their VALUE correctness is pinned
# by pytest (fuzz vs an independent BPE implementation; IVF recall
# vs brute force); these entries give the driver artifact visibility
# that the end-to-end paths run and produce rows.
# ---------------------------------------------------------------------------


@_register(
    "q_bpe_segment",
    None,
    "BPE end-to-end: word-frequency sufficient statistic -> "
    "incremental merge induction (driver-side over the capped "
    "aggregate) -> shuffle-free Arrow segmentation pass. The "
    "CORPUS-fit loop is the one remaining rows-only stage (iterative "
    "global-argmax over data-dependent counts is not static-SQL-"
    "expressible); the fit algorithm and the apply stage both carry "
    "value evidence elsewhere — q_bpe_apply hash-checks fit+apply on "
    "a fixed fixture, and the hypothesis fuzz checks both vs an "
    "independent implementation (tests/test_properties_spark.py::"
    "test_bpe_learn_and_apply_match_reference).",
)
def q_bpe_segment(spark, sf_dir):
    from featurestore_spark.operators.tokenize import (
        apply_bpe,
        learn_bpe,
        word_frequencies,
    )

    docs = load_table(spark, sf_dir, "documents")
    merges = learn_bpe(word_frequencies(docs), 50)
    seg = apply_bpe(docs, merges)
    return seg.select(
        "doc_id",
        F.col("n_bpe_tokens").cast("int").alias("n_bpe_tokens"),
        F.concat_ws(" ", F.slice("bpe_tokens", 1, 8)).alias("head_tokens"),
    )


# ---------------------------------------------------------------------------
# BPE APPLY with a value oracle (VERDICT r8 #4): the fit runs on a
# FIXED literal word-frequency fixture (deterministic, so the learned
# ranks embed in static SQL), on the Spark side through the
# PRODUCTION incremental heap fit (learn_bpe) and on the oracle side
# through an independent naive rescan-argmax fit — if the two fits
# ever disagree, the downstream segmentation hashes differ, so this
# query value-checks BOTH the fit (on the fixture) and the apply
# stage (on the corpus). Segmentation replays in a recursive CTE:
# per distinct word, repeatedly merge the lowest-ranked present pair
# left-to-right non-overlapping (run parity), exactly segment_word's
# greedy rule.
# ---------------------------------------------------------------------------

# Counts chosen to force cascades (multi-step merges through 'the',
# 'table', 'a</w>') and count ties (lexicographic tie-break on the
# pair) over the documents fixture's actual vocabulary.
_BPE_FIX_FREQS = [
    ("a", 70), ("the", 58), ("table", 44), ("value", 40), ("batch", 33),
    ("scan", 30), ("spark", 28), ("stream", 25), ("sort", 24),
    ("slow", 22), ("small", 21), ("fast", 20), ("hash", 18),
    ("row", 16), ("group", 14), ("order", 12), ("data", 11), ("agg", 9),
]
_BPE_FIX_MERGES = 24
_BPE_EOW = "</w>"


def _bpe_fit_naive(
    freqs: list[tuple[str, int]], num_merges: int
) -> list[tuple[str, str]]:
    """Independent BPE fit for the oracle: full rescan argmax each
    round (highest weighted pair count, ties to the lexicographically
    smallest pair), left-to-right non-overlapping merge — the
    textbook Sennrich et al. loop, sharing NO code with learn_bpe's
    incremental heap implementation."""
    syms_list = [(list(w) + [_BPE_EOW], c) for w, c in freqs]
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, c in syms_list:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + c
        if not counts:
            break
        maxc = max(counts.values())
        best = min(p for p, c in counts.items() if c == maxc)
        merges.append(best)
        merged = best[0] + best[1]
        for j, (syms, c) in enumerate(syms_list):
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and (syms[i], syms[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms_list[j] = (out, c)
    return merges


def _bpe_apply_sql() -> str:
    ranks = _bpe_fit_naive(_BPE_FIX_FREQS, _BPE_FIX_MERGES)
    arms = " ".join(
        f"WHEN '{l} {r}' THEN {i}" for i, (l, r) in enumerate(ranks)
    )
    # rank of the pair at position i (symbols never contain spaces —
    # words come from a whitespace split — so ' ' is a safe joiner)
    rank_i = f"(CASE syms[i] || ' ' || syms[i+1] {arms} END)"
    rank_j = f"(CASE syms[j] || ' ' || syms[j+1] {arms} END)"
    return rf"""
    WITH RECURSIVE dws AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(coalesce(text, '')),
                                            '\s+'), t -> t <> '') AS ws
      FROM documents),
    vocab AS (SELECT DISTINCT unnest(ws) AS word FROM dws),
    seg(word, syms) AS (
      SELECT word,
             list_transform(generate_series(1, len(word)),
                            i -> word[i:i]) || ['</w>']
      FROM vocab
      UNION ALL
      SELECT word,
             list_filter(list_transform(generate_series(1, len(syms)), i ->
               CASE WHEN mg[i] THEN syms[i] || syms[i+1]
                    WHEN i > 1 AND mg[i-1] THEN NULL
                    ELSE syms[i] END), x -> x IS NOT NULL)
      FROM (
        SELECT word, syms,
               -- merge flag: position holds the best pair AND sits at
               -- an even offset from its run start (left-to-right
               -- non-overlapping within runs of identical pairs)
               list_transform(generate_series(1, len(syms)), i ->
                 i < len(syms)
                 AND pr[i] IS NOT DISTINCT FROM best
                 AND (i - (coalesce(list_max(list_filter(
                        generate_series(1, i - 1),
                        j -> pr[j] IS DISTINCT FROM best)), 0) + 1))
                     % 2 = 0) AS mg
        FROM (
          SELECT word, syms, pr,
                 list_min(list_filter(pr, x -> x IS NOT NULL)) AS best
          FROM (SELECT word, syms,
                  list_transform(generate_series(1, len(syms) - 1),
                                 i -> {rank_i}) AS pr
                FROM seg))
        WHERE best IS NOT NULL)),
    final AS (
      SELECT word, syms FROM (
        SELECT word, syms,
               list_transform(generate_series(1, len(syms) - 1),
                              j -> {rank_j}) AS pr
        FROM seg)
      WHERE len(list_filter(pr, x -> x IS NOT NULL)) = 0),
    doc_syms AS (
      SELECT doc_id, flatten(list(f.syms ORDER BY w.pos)) AS toks
      FROM (SELECT doc_id, u.p AS pos, u.w AS word
            FROM (SELECT doc_id,
                    unnest(list_transform(generate_series(1, len(ws)),
                      i -> struct_pack(p := i, w := ws[i]))) AS u
                  FROM dws)) w
      JOIN final f USING (word)
      GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(coalesce(len(s.toks), 0) AS INTEGER) AS n_bpe_tokens,
           coalesce(array_to_string(s.toks[1:8], ' '), '') AS head_tokens
    FROM documents d LEFT JOIN doc_syms s USING (doc_id)
    """


@_register(
    "q_bpe_apply",
    _bpe_apply_sql(),
    "BPE segmentation with a VALUE oracle: merges learned from a "
    "fixed literal word-frequency fixture (Spark: the production "
    "incremental heap fit; oracle: an independent naive rescan-argmax "
    "fit — a fit divergence would hash-mismatch downstream), then the "
    "full-corpus Arrow segmentation pass vs a recursive-CTE replay of "
    "the greedy lowest-rank merge rule per distinct word. Upgrades "
    "the BPE apply stage from rows-only evidence (q_bpe_segment "
    "remains the corpus-fit production twin).",
)
def q_bpe_apply(spark, sf_dir):
    from featurestore_spark.operators.tokenize import apply_bpe, learn_bpe

    freqs = spark.createDataFrame(_BPE_FIX_FREQS, "word string, count long")
    merges = learn_bpe(freqs, _BPE_FIX_MERGES)
    docs = load_table(spark, sf_dir, "documents")
    seg = apply_bpe(docs, merges)
    return seg.select(
        "doc_id",
        F.col("n_bpe_tokens").cast("int").alias("n_bpe_tokens"),
        F.concat_ws(" ", F.slice("bpe_tokens", 1, 8)).alias("head_tokens"),
    )


@_register(
    "q_ivf_topk",
    None,
    "IVF approximate top-k: deterministic Lloyd centroids (iterative "
    "fit, not SQL-expressible), candidates equi-joined on probed "
    "centroid lists only — the scale path where brute-force cosine "
    "(q_embedding_topk) is the baseline. Recall vs brute force is "
    "pinned in tests/test_training_data_ops.py.",
)
def q_ivf_topk(spark, sf_dir):
    from featurestore_spark.operators.similarity import (
        as_double_array,
        ivf_topk,
        train_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select("vec_id", as_double_array("embedding").alias("v"))
    q = base.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    c = base.where(F.col("vec_id") >= 3).select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv")
    )
    cents = train_centroids(emb, n_centroids=8, iterations=2)
    return ivf_topk(q, c, cents, k=5, n_probe=2)


# One Lloyd round: mean-per-cluster (6-dp rounded), then rounded-argmin
# reassignment, ties on centroid id — iterations UNROLL as repeated
# CTE pairs (see q_ivf_serve).
_IVF_MEAN = """
    {out} AS (SELECT cid, list(mu ORDER BY pos) AS cv
       FROM (SELECT cid, pos, round(avg(val), 6) AS mu
             FROM (SELECT cid, unnest(v) AS val,
                          unnest(generate_series(1, len(v))) AS pos
                   FROM {src})
             GROUP BY cid, pos)
       GROUP BY cid)"""
_IVF_ASSIGN = """
    {out} AS (SELECT vec_id, v, cid
       FROM (SELECT e.vec_id, e.v, c.cid,
                    row_number() OVER (PARTITION BY e.vec_id ORDER BY
                      round(list_sum(list_transform(
                        generate_series(1, len(e.v)),
                        i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i]))), 6),
                      c.cid) AS rn
             FROM e CROSS JOIN {cents} c)
       WHERE rn = 1)"""


@_register(
    "q_ivf_serve",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    s0 AS (SELECT vec_id, v,
            ((CASE WHEN v[1] > 0 THEN 4 ELSE 0 END)
             + (CASE WHEN v[2] > 0 THEN 2 ELSE 0 END)
             + (CASE WHEN v[3] > 0 THEN 1 ELSE 0 END)) AS cid
           FROM e),"""
    + _IVF_MEAN.format(out="c0", src="s0") + ","
    + _IVF_ASSIGN.format(out="a1", cents="c0") + ","
    + _IVF_MEAN.format(out="c1", src="a1") + ","
    + _IVF_ASSIGN.format(out="a2", cents="c1") + ","
    + _IVF_MEAN.format(out="c2", src="a2") + ","
    + _IVF_ASSIGN.format(out="ca0", cents="c2").replace(
        "FROM e CROSS JOIN",
        "FROM (SELECT vec_id, v FROM e WHERE vec_id >= 3) e CROSS JOIN",
    ) + ","
    + """
    qa AS (SELECT query_id, qv, cid
       FROM (SELECT q.vec_id AS query_id, q.v AS qv, c.cid,
                    row_number() OVER (PARTITION BY q.vec_id ORDER BY
                      round(list_sum(list_transform(
                        generate_series(1, len(q.v)),
                        i -> (q.v[i] - c.cv[i]) * (q.v[i] - c.cv[i]))), 6),
                      c.cid) AS rn
             FROM (SELECT vec_id, v FROM e WHERE vec_id < 3) q
             CROSS JOIN c2 c)
       WHERE rn <= 2),
    sims AS (
      SELECT qa.query_id, ca0.vec_id AS neighbor_id,
             round(list_dot_product(qa.qv, ca0.v)
                   / (sqrt(list_dot_product(qa.qv, qa.qv))
                      * sqrt(list_dot_product(ca0.v, ca0.v))), 6) AS sim
      FROM ca0 JOIN qa USING (cid))
    SELECT query_id, CAST(rnk AS INTEGER) AS rnk, neighbor_id, sim
    FROM (SELECT query_id, neighbor_id, sim,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY sim DESC, neighbor_id) AS rnk
          FROM sims)
    WHERE rnk <= 5
    """,
    "IVF SERVING stage with full value evidence (VERDICT r7 #5): the "
    "same deterministic Lloyd fit as q_ivf_topk but with "
    "round_decimals=6 (means and argmin distances rounded in-plan — "
    "the cross-engine determinism knob), so the oracle replays the "
    "ENTIRE fit+assign+probe+top-k chain with the two iterations "
    "unrolled as SQL CTE pairs. q_ivf_topk stays as the "
    "production-default (unrounded) rows-only twin.",
)
def q_ivf_serve(spark, sf_dir):
    from featurestore_spark.operators.similarity import (
        as_double_array,
        ivf_topk,
        train_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select("vec_id", as_double_array("embedding").alias("v"))
    q = base.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    c = base.where(F.col("vec_id") >= 3).select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv")
    )
    cents = train_centroids(emb, n_centroids=8, iterations=2, round_decimals=6)
    return ivf_topk(q, c, cents, k=5, n_probe=2, round_decimals=6)


# ---------------------------------------------------------------------------
# Web-ingest front (operators/web.py): the documents fixture has no
# URL column, so both engines synthesize the same messy URL from
# doc_id (mixed-case scheme/host, default + non-default ports,
# utm/click-id params, unsorted params, fragments, trailing slashes —
# every rule canonical_url normalizes). The _WEB_SQL prefix carries
# the synthesized url through the full canonicalization +
# registrable-domain chain shared by the three queries below.
# ---------------------------------------------------------------------------


def _web_url_col():
    """The synthesized crawl URL as a Spark Column (engine-identical
    to the `u` CTE of `_WEB_SQL`). Hosts exercise the exact,
    wildcard (*.ck, *.compute.amazonaws.com) and exception (!www.ck)
    PSL rule kinds; every 11th-ish row is a schemeless path-only URL
    (no host → NULL canonical form, dropped by url_dedup)."""
    d = F.col("doc_id")
    host = (
        F.when(d % 8 == 0, F.lit("WWW.Example.COM"))
        .when(d % 8 == 1, F.lit("news.Site.co.uk"))
        .when(d % 8 == 2, F.lit("Blog.Example.GitHub.IO"))
        .when(d % 8 == 3, F.lit("example.org."))
        .when(d % 8 == 4, F.lit("sub.domain.example.net"))
        .when(d % 8 == 5, F.lit("Shop.Coral.CK"))
        .when(d % 8 == 6, F.lit("WWW.CK"))
        .otherwise(F.lit("vm-7.host.Compute.AmazonAWS.com"))
    )
    scheme = F.when(d % 2 == 0, F.lit("HTTP")).otherwise(F.lit("https"))
    port = (
        F.when(d % 4 == 0, F.lit(":80"))
        .when(d % 4 == 1, F.lit(":8080"))
        .otherwise(F.lit(""))
    )
    path = F.concat(
        F.lit("/Articles/"),
        (d % 13).cast("string"),
        F.when(d % 3 == 0, F.lit("/")).otherwise(F.lit("")),
    )
    query = (
        F.when(d % 3 == 0, F.lit("?utm_source=feed&utm_campaign=x"))
        .when(d % 3 == 1, F.lit("?b=2&a=1&gclid=track"))
        .otherwise(F.lit(""))
    )
    frag = F.when(
        d % 2 == 1, F.concat(F.lit("#Section-"), d.cast("string"))
    ).otherwise(F.lit(""))
    full = F.concat(scheme, F.lit("://"), host, port, path, query, frag)
    return F.when(d % 11 == 7, F.lit("/robots.txt")).otherwise(full)


def _web_matched_sql() -> str:
    """The PSL `matched` suffix-length expression in DuckDB SQL,
    generated from the same parsed rule sets the Spark operator
    embeds (exception rules prevail, then longest match across exact
    rules and wildcard stems, then the last-label default) — over
    `labels` / `n` columns. `labels[n-k+1:n]` is DuckDB's 1-based
    inclusive tail-of-k slice; every arm guards `n >= k` first, so a
    clamped short slice can never satisfy a longer rule."""
    from featurestore_spark.operators.web import (
        PUBLIC_SUFFIXES,
        parse_suffix_rules,
    )

    exact, wildcard, exception = parse_suffix_rules(PUBLIC_SUFFIXES)

    def lit(xs: list[str]) -> str:
        return "[" + ", ".join(f"'{x}'" for x in xs) + "]"

    def tail(k: int) -> str:
        return f"array_to_string(labels[n-{k - 1}:n], '.')"

    arms = []
    for ke in sorted({len(e.split(".")) for e in exception}, reverse=True):
        arms.append(
            f"CASE WHEN n >= {ke} AND list_contains({lit(exception)}, "
            f"{tail(ke)}) THEN {ke - 1} END"
        )
    max_l = max(
        [len(s.split(".")) for s in exact]
        + [len(w.split(".")) + 1 for w in wildcard]
        or [1]
    )
    for k in range(max_l, 0, -1):
        conds = []
        if exact:
            conds.append(f"list_contains({lit(exact)}, {tail(k)})")
        if wildcard and k >= 2:
            conds.append(f"list_contains({lit(wildcard)}, {tail(k - 1)})")
        arms.append(
            f"CASE WHEN n >= {k} AND ({' OR '.join(conds)}) THEN {k} END"
        )
    joined = ",\n               ".join(arms + ["1"])
    return f"coalesce({joined})"

_WEB_SQL = r"""
    WITH u AS (
      SELECT doc_id, text,
             CASE WHEN doc_id % 11 = 7 THEN '/robots.txt' ELSE
             (CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END)
             || '://'
             || (CASE doc_id % 8 WHEN 0 THEN 'WWW.Example.COM'
                                 WHEN 1 THEN 'news.Site.co.uk'
                                 WHEN 2 THEN 'Blog.Example.GitHub.IO'
                                 WHEN 3 THEN 'example.org.'
                                 WHEN 4 THEN 'sub.domain.example.net'
                                 WHEN 5 THEN 'Shop.Coral.CK'
                                 WHEN 6 THEN 'WWW.CK'
                                 ELSE 'vm-7.host.Compute.AmazonAWS.com'
                  END)
             || (CASE doc_id % 4 WHEN 0 THEN ':80'
                                 WHEN 1 THEN ':8080' ELSE '' END)
             || '/Articles/' || CAST(doc_id % 13 AS VARCHAR)
             || (CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END)
             || (CASE doc_id % 3
                   WHEN 0 THEN '?utm_source=feed&utm_campaign=x'
                   WHEN 1 THEN '?b=2&a=1&gclid=track' ELSE '' END)
             || (CASE WHEN doc_id % 2 = 1
                   THEN '#Section-' || CAST(doc_id AS VARCHAR)
                   ELSE '' END) END AS url
      FROM documents),
    pp AS (
      SELECT doc_id, text, url,
             lower(regexp_extract(sf, '^([^:/?#]+)://', 1)) AS scheme,
             regexp_replace(sf, '^[^:/?#]+://', '') AS rest
      FROM (SELECT *, regexp_replace(url, '#.*$', '') AS sf FROM u)),
    parts AS (
      SELECT doc_id, text, url, scheme,
             regexp_replace(lower(regexp_replace(hostport, ':[0-9]*$', '')),
                            '\.$', '') AS host,
             regexp_extract(hostport, ':([0-9]+)$', 1) AS port,
             regexp_extract(pathq, '^([^?]*)', 1) AS path,
             regexp_extract(pathq, '\?(.*)$', 1) AS query
      FROM (SELECT *,
              regexp_replace(regexp_extract(rest, '^([^/?#]*)', 1),
                             '^.*@', '') AS hostport,
              regexp_replace(rest, '^[^/?#]*', '') AS pathq
            FROM pp)),
    canon AS (
      SELECT doc_id, text, url, host,
             CASE WHEN host <> ''
                  THEN sch || '://' || host || prt || pth || qry
             END AS canonical_url
      FROM (
        SELECT doc_id, text, url, host, sch,
               CASE WHEN port = '' OR (sch = 'http' AND port = '80')
                     OR (sch = 'https' AND port = '443')
                    THEN '' ELSE ':' || port END AS prt,
               CASE WHEN regexp_replace(path, '/+$', '') = '' THEN '/'
                    ELSE regexp_replace(path, '/+$', '') END AS pth,
               CASE WHEN len(prm) > 0
                    THEN '?' || array_to_string(prm, '&')
                    ELSE '' END AS qry
        FROM (SELECT *,
                CASE WHEN scheme = '' THEN 'http' ELSE scheme END AS sch,
                list_sort(list_filter(string_split(query, '&'), kv ->
                  kv <> ''
                  AND NOT starts_with(regexp_extract(kv, '^([^=]*)', 1),
                                      'utm_')
                  AND NOT list_contains(
                        ['gclid','fbclid','msclkid','igshid','mc_eid'],
                        regexp_extract(kv, '^([^=]*)', 1)))) AS prm
              FROM parts))),
    dom AS (
      SELECT doc_id, text, url, canonical_url, host,
             CASE WHEN n > matched AND host <> ''
                  THEN array_to_string(labels[n-matched:n], '.') END AS domain
      FROM (
        SELECT *,
               __MATCHED__ AS matched
        FROM (SELECT *, string_split(host, '.') AS labels,
                     len(string_split(host, '.')) AS n
              FROM canon)))
""".replace("__MATCHED__", _web_matched_sql())


@_register(
    "q_canonical_url",
    _WEB_SQL
    + """
    SELECT doc_id, url, canonical_url, domain FROM dom
    """,
    "URL canonicalization + registrable-domain extraction (the "
    "C4/RefinedWeb step BEFORE any text rule): scheme/host lowercase, "
    "userinfo/fragment strip, default-port drop, trailing-slash "
    "policy, utm/click-id param removal with the remainder sorted, "
    "eTLD+1 via the embedded public-suffix snapshot. Pure Column "
    "expressions — zero exchanges, RE2-portable regexes replayed "
    "identically by the oracle.",
)
def q_canonical_url(spark, sf_dir):
    from featurestore_spark.operators.web import (
        canonical_url,
        registrable_domain,
        url_parts,
    )

    docs = load_table(spark, sf_dir, "documents")
    u = docs.select("doc_id", _web_url_col().alias("url"))
    return u.select(
        "doc_id",
        "url",
        canonical_url("url").alias("canonical_url"),
        registrable_domain(url_parts("url")["host"]).alias("domain"),
    )


@_register(
    "q_url_dedup",
    _WEB_SQL
    + """
    SELECT canonical_url, min(doc_id) AS keep_id,
           CAST(count(*) AS BIGINT) AS n_dups
    FROM dom WHERE canonical_url IS NOT NULL
    GROUP BY canonical_url
    """,
    "URL-level exact dedup keyed on the canonical form — the cheapest "
    "dedup in the ladder (fragments, utm tags, param order, case and "
    "default ports all collapse before a single byte of page text is "
    "read). Malformed no-host URLs canonicalize to NULL and are "
    "dropped (never merged). One hash-groupBy on the canonical "
    "string; map-side combine collapses the duplicate mass "
    "pre-exchange.",
)
def q_url_dedup(spark, sf_dir):
    from featurestore_spark.operators.web import url_dedup

    docs = load_table(spark, sf_dir, "documents")
    return url_dedup(docs.select("doc_id", _web_url_col().alias("url")))


@_register(
    "q_incremental_url_dedup",
    _WEB_SQL
    + """
    , corpus AS (
      SELECT DISTINCT canonical_url FROM dom
      WHERE doc_id % 7 = 0 AND canonical_url IS NOT NULL),
    batch AS (
      SELECT doc_id, canonical_url FROM dom
      WHERE doc_id % 7 <> 0 AND canonical_url IS NOT NULL),
    keepers AS (
      SELECT canonical_url, min(doc_id) AS doc_id FROM batch
      GROUP BY canonical_url)
    SELECT k.doc_id, k.canonical_url
    FROM keepers k LEFT JOIN corpus c USING (canonical_url)
    WHERE c.canonical_url IS NULL
    """,
    "Incremental recrawl URL dedup: the batch (doc_id % 7 <> 0) "
    "deduped against a persisted distinct-canonical-URL index of the "
    "accepted corpus (doc_id % 7 = 0) — the corpus URLs are never "
    "re-canonicalized; a batch row survives when its canonical form "
    "is new to the index AND first within the batch. Index rows are "
    "16-byte 128-bit hashes (billions of frontier URLs make 64-bit "
    "collisions expected, and each one silently drops a never-"
    "fetched page); the probe is an equi-anti-join on the hash — "
    "the index never broadcasts, only hashes move.",
)
def q_incremental_url_dedup(spark, sf_dir):
    from featurestore_spark.operators.incremental import (
        dedup_urls_against_index,
        url_index,
    )

    docs = load_table(spark, sf_dir, "documents")
    u = docs.select("doc_id", _web_url_col().alias("url"))
    idx = url_index(u.where(F.col("doc_id") % 7 == 0))
    out = dedup_urls_against_index(u.where(F.col("doc_id") % 7 != 0), idx)
    return out.select("doc_id", "canonical_url")



# -- outlink graph + domain ranking -------------------------------------------


def _pagerank_iter_sql(prev: str, cur: str) -> str:
    """One PageRank iteration as a DuckDB CTE over the previous rank
    CTE — the exact recurrence domain_pagerank unrolls (same operand
    order and grouping, `(1.0 - 0.85)` left for the engine to fold so
    both sides use the identical double). AS MATERIALIZED because each
    iteration references its predecessor twice (contribution join +
    dangling mass) — the r10 oracle lesson: DuckDB inlines CTEs, so an
    un-materialized 5-deep chain re-evaluates exponentially."""
    return f"""
    {cur} AS MATERIALIZED (
      SELECT b.domain, b.outw, b.n,
             (1.0 - 0.85) / b.n
             + 0.85 * (coalesce(c.c, 0.0) + dg.dang / b.n) AS pr
      FROM base b
      LEFT JOIN (SELECT e.dst_domain AS domain,
                        sum((r.pr / r.outw) * CAST(e.n_links AS DOUBLE)) AS c
                 FROM edges e JOIN {prev} r ON r.domain = e.src_domain
                 GROUP BY e.dst_domain) c USING (domain)
      CROSS JOIN (SELECT coalesce(sum(pr), 0.0) AS dang
                  FROM {prev} WHERE outw = 0.0) dg),"""


@_register(
    "q_domain_pagerank",
    _WEB_SQL
    + """
    , outlinks AS (
      SELECT domain AS src_domain,
             unnest(
               ['out' || CAST(doc_id % 7 AS VARCHAR) || '-rank.com']
               || (CASE WHEN doc_id % 2 = 0
                   THEN ['out' || CAST((doc_id * 3 + 1) % 7 AS VARCHAR)
                         || '-rank.com']
                   ELSE CAST([] AS VARCHAR[]) END)
               || (CASE WHEN doc_id % 5 = 0 THEN ['example.com']
                   ELSE CAST([] AS VARCHAR[]) END)
             ) AS dst_domain
      FROM dom
      WHERE domain IS NOT NULL),
    edges AS MATERIALIZED (
      SELECT src_domain, dst_domain, count(*) AS n_links
      FROM outlinks
      WHERE src_domain <> dst_domain
      GROUP BY src_domain, dst_domain),
    nodes AS MATERIALIZED (
      SELECT src_domain AS domain FROM edges
      UNION
      SELECT dst_domain FROM edges),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
    base AS MATERIALIZED (
      SELECT nodes.domain, coalesce(ow.outw, 0.0) AS outw, nn.n
      FROM nodes
      LEFT JOIN (SELECT src_domain AS domain,
                        CAST(sum(n_links) AS DOUBLE) AS outw
                 FROM edges GROUP BY src_domain) ow USING (domain)
      CROSS JOIN nn),
    r0 AS MATERIALIZED (SELECT domain, outw, n, 1.0 / n AS pr FROM base),"""
    + "".join(
        _pagerank_iter_sql(f"r{k}", f"r{k + 1}") for k in range(5)
    ).rstrip(",")
    + """
    SELECT domain, round(pr, 6) AS pr FROM r5
    """,
    "Domain-ranking capstone (the Common-Crawl-published artifact a "
    "crawler allocates fetch budget by): outlink extraction from "
    "synthesized per-doc HTML (both quote kinds, a relative href and "
    "a mailto that the absolute-URL filter drops), domain-level "
    "weighted edges through the SAME PSL registrable-domain chain "
    "the other web queries pin (self-loops dropped), then 5 "
    "iterations of weighted PageRank with uniform dangling-mass "
    "redistribution. The oracle replays the recurrence as unrolled "
    "MATERIALIZED CTEs; dst domains are closed-form (2-label .com "
    "hosts are their own registrable domain) while src domains ride "
    "the shared _WEB_SQL dom CTE. Per iteration the plan is one "
    "src-keyed join + one dst-keyed groupBy + two broadcast one-row "
    "scalar attaches; rank lineage is localCheckpoint-truncated so "
    "the analyzed plan stays linear in the iteration count.",
)
def q_domain_pagerank(spark, sf_dir):
    from featurestore_spark.operators.web import domain_pagerank, link_graph

    docs = load_table(spark, sf_dir, "documents")
    d = F.col("doc_id")
    html = F.concat(
        F.lit('<p><a href="https://out'),
        (d % 7).cast("string"),
        F.lit('-rank.com/a?x=1">one</a>'),
        F.when(
            d % 2 == 0,
            F.concat(
                F.lit("<a href='http://out"),
                ((d * 3 + 1) % 7).cast("string"),
                F.lit("-rank.com/b'>two</a>"),
            ),
        ).otherwise(F.lit('<a href="/relative">rel</a>')),
        F.when(
            d % 5 == 0,
            F.lit('<a href="https://WWW.Example.COM/x">home</a>'),
        ).otherwise(F.lit('<a href="mailto:a@b.c">m</a>')),
        F.lit("</p>"),
    )
    crawl = docs.select(
        "doc_id", _web_url_col().alias("url"), html.alias("html")
    )
    edges = link_graph(crawl)
    pr = domain_pagerank(edges, weight_col="n_links", iterations=5)
    return pr.select("domain", F.round("pr", 6).alias("pr"))


@_register(
    "q_robots_filter",
    r"""
    WITH u AS (
      SELECT doc_id, doc_id % 20 AS k,
        CASE CAST(doc_id % 7 AS INTEGER)
          WHEN 0 THEN '/private/x'
          WHEN 1 THEN '/private/ok-page'
          WHEN 2 THEN '/open/a'
          WHEN 3 THEN '/t123.php'
          WHEN 4 THEN '/t.php?x=1'
          WHEN 5 THEN ''
          ELSE '/private/ok' END AS path
      FROM documents),
    r AS (
      SELECT doc_id,
        'https://h' || CAST(k AS VARCHAR) || '.com' || path AS url,
        CASE WHEN path = '' THEN '/' ELSE path END AS pathq,
        CASE WHEN k % 3 = 0 THEN
          [struct_pack(rx := '^/private/', l := 9, a := false),
           struct_pack(rx := '^/private/ok', l := 11, a := true),
           struct_pack(rx := '^/t.*\.php$', l := 8, a := false)]
        ELSE
          [struct_pack(rx := '^/private/', l := 9, a := false),
           struct_pack(rx := '^/private/ok', l := 11, a := true)]
        END AS rules
      FROM u),
    m AS (
      SELECT doc_id, url,
             list_filter(rules,
               s -> regexp_matches(pathq, s.rx)) AS matched
      FROM r)
    SELECT doc_id, url,
      CASE WHEN len(matched) = 0 THEN true
           ELSE len(list_filter(matched,
                  s -> s.l = list_max(list_transform(matched, t -> t.l))
                       AND s.a)) > 0 END AS robots_allowed
    FROM m
    """,
    "robots.txt politeness gate (RFC 9309) end-to-end: per-host "
    "robots.txt payloads synthesized from doc_id % 20 (20 hosts, a "
    "third carrying an extra '$'-anchored wildcard Disallow), parsed "
    "by the Arrow line-state-machine parser, then filter_allowed's "
    "ONE broadcastable per-host rule-array join + higher-order "
    "longest-match fold over a 7-shape frontier (prefix disallow, "
    "longer-allow override, no-match, wildcard-$ hit, query string "
    "that defeats the $ anchor, empty path → '/', exact allow tie). "
    "Oracle design per PLANS r11: the MATCHER is replayed (rules "
    "synthesized closed-form in SQL, regexp list-filter + "
    "longest-match-allow-ties fold in DuckDB — rule_len as UTF-8 "
    "octets); the parser itself stays fuzz-pinned against an "
    "independent Python matcher in tests/test_robots.py.",
)
def q_robots_filter(spark, sf_dir):
    from featurestore_spark.operators.robots import (
        filter_allowed,
        parse_robots_rules,
    )

    docs = load_table(spark, sf_dir, "documents")
    k = (F.col("doc_id") % 20).alias("k")
    hosts = docs.select(k).distinct()
    txt = F.concat(
        F.lit("User-agent: *\nDisallow: /private/\nAllow: /private/ok\n"),
        F.when(F.col("k") % 3 == 0, F.lit("Disallow: /t*.php$\n")).otherwise(
            F.lit("")
        ),
    )
    robots = hosts.select(
        F.concat(F.lit("h"), F.col("k").cast("string"), F.lit(".com")).alias(
            "host"
        ),
        txt.alias("robots_txt"),
    )
    rules = parse_robots_rules(robots, agent="ccbot")
    path = (
        F.when(F.col("doc_id") % 7 == 0, F.lit("/private/x"))
        .when(F.col("doc_id") % 7 == 1, F.lit("/private/ok-page"))
        .when(F.col("doc_id") % 7 == 2, F.lit("/open/a"))
        .when(F.col("doc_id") % 7 == 3, F.lit("/t123.php"))
        .when(F.col("doc_id") % 7 == 4, F.lit("/t.php?x=1"))
        .when(F.col("doc_id") % 7 == 5, F.lit(""))
        .otherwise(F.lit("/private/ok"))
    )
    urls = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://h"),
            (F.col("doc_id") % 20).cast("string"),
            F.lit(".com"),
            path,
        ).alias("url"),
    )
    return filter_allowed(urls, rules, keep_verdict=True).select(
        "doc_id", "url", "robots_allowed"
    )


@_register(
    "q_recrawl_policy",
    r"""
    WITH u AS (
      SELECT doc_id, doc_id % 12 AS k,
        CASE CAST(doc_id % 8 AS INTEGER)
          WHEN 0 THEN '/a b/x'
          WHEN 1 THEN '/a%20b/ok-page'
          WHEN 2 THEN '/~secret/x'
          WHEN 3 THEN '/%7esecret/y'
          WHEN 4 THEN '/open/z'
          WHEN 5 THEN '/q1.html'
          WHEN 6 THEN '/q2.html?x=1'
          ELSE '' END AS rawpath,
        CASE CAST(doc_id % 8 AS INTEGER)
          WHEN 0 THEN '/a%20b/x'
          WHEN 1 THEN '/a%20b/ok-page'
          WHEN 2 THEN '/~secret/x'
          WHEN 3 THEN '/~secret/y'
          WHEN 4 THEN '/open/z'
          WHEN 5 THEN '/q1.html'
          WHEN 6 THEN '/q2.html?x=1'
          ELSE '/' END AS npath,
        CASE CAST(doc_id % 6 AS INTEGER)
          WHEN 0 THEN '2024-03-09'
          WHEN 1 THEN '2024-03-05T10:00:00Z'
          WHEN 2 THEN '2024-03-05T10:00:00+02:00'
          WHEN 3 THEN 'not a lastmod'
          WHEN 5 THEN '2023-01-01T00:00:00Z' END AS lastmod,
        CASE CAST(doc_id % 4 AS INTEGER)
          WHEN 1 THEN '2024-01-01T00:00:00Z'
          WHEN 2 THEN '2024-06-01'
          WHEN 3 THEN '2024-03-05T09:59:59Z' END AS last_fetched
      FROM documents),
    r AS (
      SELECT *, 'https://h' || CAST(k AS VARCHAR) || '.com' || rawpath AS url,
        k % 5 <> 4 AS has_rules,
        CASE WHEN k % 2 = 0 THEN
          [struct_pack(rx := '^/a%20b/', l := 7, a := false),
           struct_pack(rx := '^/a%20b/ok', l := 9, a := true),
           struct_pack(rx := '^/~secret/', l := 9, a := false),
           struct_pack(rx := '^/q.*\.html$', l := 9, a := false)]
        ELSE
          [struct_pack(rx := '^/a%20b/', l := 7, a := false),
           struct_pack(rx := '^/a%20b/ok', l := 9, a := true),
           struct_pack(rx := '^/~secret/', l := 9, a := false)]
        END AS rules
      FROM u),
    m AS (
      SELECT *, list_filter(rules,
               s -> regexp_matches(npath, s.rx)) AS matched
      FROM r),
    v AS (
      SELECT doc_id, url,
        CASE WHEN NOT has_rules OR len(matched) = 0 THEN true
             ELSE len(list_filter(matched,
                    s -> s.l = list_max(list_transform(matched, t -> t.l))
                         AND s.a)) > 0 END AS robots_allowed,
        try_cast(lastmod AS TIMESTAMPTZ) AS lm,
        try_cast(last_fetched AS TIMESTAMPTZ) AS lf,
        last_fetched IS NULL AS never
      FROM m)
    SELECT doc_id, url, robots_allowed,
      CASE WHEN never THEN true
           WHEN lm IS NULL OR lf IS NULL THEN true
           ELSE lm > lf END AS refetch,
      CASE WHEN never THEN true
           WHEN lm IS NULL OR lf IS NULL THEN false
           ELSE lm > lf END AS refetch_bw
    FROM v
    """,
    "Recrawl policy end-to-end (VERDICT r13 #1, both r13 oracle gaps "
    "in ONE product-path query — the 50-slot driver window x 2-round "
    "staleness cadence caps the catalog at 150 oracled queries, so "
    "the normalize=True robots gate and recrawl_staleness land "
    "together, exactly the order a polite recrawl runs them): "
    "per-host robots.txt parsed with normalize=True (rule '/%7esecret/' "
    "canonicalizes to '/~secret/', rule_len = NORMALIZED octets), a "
    "mixed-encoding frontier gated by filter_allowed(normalize=True) "
    "(literal-space '/a b/x' matches the '/a%20b/' rule; lowercase "
    "'%7e' escapes decode; allow-override, $-anchor and "
    "query-defeats-$ shapes carried over from q_robots_filter; a "
    "fifth of hosts publish an EMPTY robots.txt -> fail-open), then "
    "recrawl_staleness() over sitemap-spec W3C datetime forms "
    "(date-only, trailing-Z, +02:00 offset, garbage, NULL) vs "
    "last-fetch stamps, in BOTH bias modes (refetch = "
    "default_stale=True freshness bias, refetch_bw = bandwidth bias; "
    "the two differ exactly on unparseable/missing lastmod with a "
    "known fetch). Oracle replays the matcher on hand-derived "
    "RFC-3986 canonical forms and the staleness decision via "
    "TIMESTAMPTZ try_cast; all cross-form timestamp pairs sit >=2 "
    "days apart so engine session-timezone differences cannot flip a "
    "verdict (the 1-second edge pair is Z-form vs Z-form). "
    "robots.py:228,276,552.",
)
def q_recrawl_policy(spark, sf_dir):
    from featurestore_spark.operators.robots import (
        filter_allowed,
        parse_robots_rules,
        recrawl_staleness,
    )

    docs = load_table(spark, sf_dir, "documents")
    k = (F.col("doc_id") % 12).alias("k")
    hosts = docs.select(k).distinct()
    txt = F.when(F.col("k") % 5 == 4, F.lit("")).otherwise(
        F.concat(
            F.lit(
                "User-agent: *\nDisallow: /a%20b/\nAllow: /a%20b/ok\n"
                "Disallow: /%7esecret/\n"
            ),
            F.when(
                F.col("k") % 2 == 0, F.lit("Disallow: /q*.html$\n")
            ).otherwise(F.lit("")),
        )
    )
    robots = hosts.select(
        F.concat(F.lit("h"), F.col("k").cast("string"), F.lit(".com")).alias(
            "host"
        ),
        txt.alias("robots_txt"),
    )
    rules = parse_robots_rules(robots, agent="ccbot", normalize=True)
    m8 = F.col("doc_id") % 8
    path = (
        F.when(m8 == 0, F.lit("/a b/x"))
        .when(m8 == 1, F.lit("/a%20b/ok-page"))
        .when(m8 == 2, F.lit("/~secret/x"))
        .when(m8 == 3, F.lit("/%7esecret/y"))
        .when(m8 == 4, F.lit("/open/z"))
        .when(m8 == 5, F.lit("/q1.html"))
        .when(m8 == 6, F.lit("/q2.html?x=1"))
        .otherwise(F.lit(""))
    )
    m6 = F.col("doc_id") % 6
    lastmod = (
        F.when(m6 == 0, F.lit("2024-03-09"))
        .when(m6 == 1, F.lit("2024-03-05T10:00:00Z"))
        .when(m6 == 2, F.lit("2024-03-05T10:00:00+02:00"))
        .when(m6 == 3, F.lit("not a lastmod"))
        .when(m6 == 5, F.lit("2023-01-01T00:00:00Z"))
    )
    m4 = F.col("doc_id") % 4
    last_fetched = (
        F.when(m4 == 1, F.lit("2024-01-01T00:00:00Z"))
        .when(m4 == 2, F.lit("2024-06-01"))
        .when(m4 == 3, F.lit("2024-03-05T09:59:59Z"))
    )
    frontier = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://h"),
            (F.col("doc_id") % 12).cast("string"),
            F.lit(".com"),
            path,
        ).alias("url"),
        lastmod.alias("lastmod"),
        last_fetched.alias("last_fetched"),
    )
    gated = filter_allowed(
        frontier, rules, keep_verdict=True, normalize=True
    )
    return gated.select(
        "doc_id",
        "url",
        "robots_allowed",
        recrawl_staleness().alias("refetch"),
        recrawl_staleness(default_stale=False).alias("refetch_bw"),
    )


@_register(
    "q_sitemap",
    r"""
    WITH f AS (
      SELECT doc_id,
             unnest(generate_series(0,
               CASE WHEN doc_id % 5 = 0 THEN doc_id % 3
                    ELSE doc_id % 4 END)) AS j
      FROM documents)
    SELECT doc_id, CAST(j AS INTEGER) AS entry_idx,
      CASE WHEN doc_id % 5 = 0
           THEN 'https://s' || CAST(doc_id AS VARCHAR) || '.com/child'
                || CAST(j AS VARCHAR) || '.xml'
           ELSE 'https://s' || CAST(doc_id AS VARCHAR) || '.com/p'
                || CAST(j AS VARCHAR) || '?a=1&b=' || CAST(j AS VARCHAR)
           END AS loc,
      CASE WHEN doc_id % 5 <> 0 AND (doc_id + j) % 2 = 0
           THEN '2024-01-0' || CAST(1 + j % 9 AS VARCHAR) END AS lastmod,
      doc_id % 5 = 0 AS is_index,
      'https://s' || CAST(doc_id AS VARCHAR) || '.com/sm.xml'
        AS robots_sitemap
    FROM f
    """,
    "Sitemap discovery (the frontier-seeding side of the politeness "
    "protocol): per-doc sitemap XML synthesized from doc_id — every "
    "5th doc a <sitemapindex> of child sitemaps, the rest urlsets "
    "with 1 + doc_id%4 <url> entries carrying &amp;-escaped query "
    "strings (entity decode pinned), optional <lastmod>, and "
    "whitespace/case variance on a third of the <loc> tags (trim + "
    "(?i) pinned without touching the oracle value) — walked back by "
    "extract_sitemap_entries/is_sitemap_index, plus the robots.txt "
    "'Sitemap:' line via sitemap_urls_from_robots. All RE2-portable "
    "regex + higher-order Column expressions, zero exchanges before "
    "the driver's comparison; the oracle recomputes every entry "
    "arithmetically.",
)
def q_sitemap(spark, sf_dir):
    from featurestore_spark.operators.robots import (
        extract_sitemap_entries,
        is_sitemap_index,
        sitemap_urls_from_robots,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    sid = d.cast("string")
    # one <url>/<sitemap> block per j; loc gets padding whitespace on
    # a third of the entries and the urlset locs carry an &amp; entity
    j_end = F.when(d % 5 == 0, d % 3).otherwise(d % 4)
    blocks = F.transform(
        F.sequence(F.lit(0), j_end),
        lambda j: F.concat(
            F.when(d % 5 == 0, F.lit("<sitemap>")).otherwise(F.lit("<url>")),
            F.lit("<loc>"),
            F.when((d + j) % 3 == 0, F.lit(" ")).otherwise(F.lit("")),
            F.when(
                d % 5 == 0,
                F.concat(
                    F.lit("https://s"), sid, F.lit(".com/child"),
                    j.cast("string"), F.lit(".xml"),
                ),
            ).otherwise(
                F.concat(
                    F.lit("https://s"), sid, F.lit(".com/p"),
                    j.cast("string"), F.lit("?a=1&amp;b="), j.cast("string"),
                ),
            ),
            F.when((d + j) % 3 == 0, F.lit(" ")).otherwise(F.lit("")),
            F.lit("</loc>"),
            F.when(
                (d % 5 != 0) & ((d + j) % 2 == 0),
                F.concat(
                    F.lit("<lastmod>2024-01-0"),
                    (1 + j % 9).cast("string"),
                    F.lit("</lastmod>"),
                ),
            ).otherwise(F.lit("")),
            F.when(d % 5 == 0, F.lit("</sitemap>")).otherwise(
                F.lit("</url>")
            ),
        ),
    )
    xml = F.concat(
        F.lit('<?xml version="1.0"?>'),
        F.when(d % 5 == 0, F.lit("<SitemapIndex>")).otherwise(
            F.lit('<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">')
        ),
        F.array_join(blocks, "\n"),
        F.when(d % 5 == 0, F.lit("</sitemapindex>")).otherwise(
            F.lit("</urlset>")
        ),
    )
    robots_txt = F.concat(
        F.lit("User-agent: *\nSitemap: https://s"),
        sid,
        F.lit(".com/sm.xml\nDisallow: /x\n"),
    )
    base = docs.select(
        "doc_id",
        extract_sitemap_entries(xml).alias("entries"),
        is_sitemap_index(xml).alias("is_index"),
        F.element_at(sitemap_urls_from_robots(robots_txt), 1).alias(
            "robots_sitemap"
        ),
    )
    from featurestore_spark.operators.materialize import plan_fence

    out = plan_fence(base).select(
        "doc_id",
        "is_index",
        "robots_sitemap",
        F.posexplode("entries").alias("entry_idx", "e"),
    )
    return out.select(
        "doc_id",
        F.col("entry_idx").cast("int").alias("entry_idx"),
        F.col("e.loc").alias("loc"),
        F.col("e.lastmod").alias("lastmod"),
        "is_index",
        "robots_sitemap",
    )


@_register(
    "q_warc_extract",
    """
    WITH resp AS (
      SELECT doc_id, CAST(1 AS INTEGER) AS record_idx,
             'response' AS warc_type,
             'https://ex.com/' || CAST(doc_id AS VARCHAR) AS target_uri,
             CAST(CASE WHEN doc_id % 4 = 1 THEN 404 ELSE 200 END
                  AS INTEGER) AS http_status,
             'text/html; charset=utf-8' AS content_type,
             '<html><body><p>payload ' || CAST(doc_id AS VARCHAR)
               || ' of the</p></body></html>' AS text_content
      FROM documents),
    conv AS (
      SELECT doc_id, CAST(2 AS INTEGER) AS record_idx,
             'conversion' AS warc_type,
             'https://ex.com/' || CAST(doc_id AS VARCHAR) AS target_uri,
             CAST(NULL AS INTEGER) AS http_status,
             CAST(NULL AS VARCHAR) AS content_type,
             'extracted text ' || CAST(doc_id AS VARCHAR)
               || ' of doc' AS text_content
      FROM documents WHERE doc_id % 2 = 0)
    SELECT * FROM resp UNION ALL SELECT * FROM conv
    """,
    "WARC ingest front door (the container crawl corpora ship in — "
    "Common Crawl WARC/WET): spec-correct plain-WARC payloads "
    "synthesized per doc_id (a warcinfo record that consumes "
    "record_idx 0 but is filtered, an HTTP response whose status "
    "flips 200/404, and a WET-style conversion record on even docs), "
    "walked by the Content-Length-driven record walker inside Arrow "
    "mapInPandas, then with_http_split peels (status, content-type, "
    "body) off the response bytes. text_content decodes the HTTP "
    "body for responses and the raw payload for conversions — the "
    "exact bytes extract_main_content feeds on. The oracle "
    "recomputes every record closed-form, so drift in the record "
    "walk, header parse, Content-Length arithmetic, separator "
    "consumption, or HTTP split hash-mismatches.",
)
def q_warc_extract(spark, sf_dir):
    from featurestore_spark.operators.multimodal import (
        build_warc_fixture,
        extract_warc_payloads,
        with_http_split,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def synth(it):
        for pdf in it:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                status = 404 if did % 4 == 1 else 200
                html = (
                    f"<html><body><p>payload {did} of the</p></body></html>"
                )
                http = (
                    f"HTTP/1.1 {status} OK\r\n"
                    "Content-Type: text/html; charset=utf-8\r\n\r\n"
                    f"{html}"
                ).encode()
                recs = [
                    ("warcinfo", "https://ex.com/info", b"software: fs\r\n"),
                    ("response", f"https://ex.com/{did}", http),
                ]
                if did % 2 == 0:
                    recs.append(
                        (
                            "conversion",
                            f"https://ex.com/{did}",
                            f"extracted text {did} of doc".encode(),
                        )
                    )
                payloads.append(build_warc_fixture(recs))
            yield pdf.assign(content=payloads)

    with_warc = docs.mapInPandas(synth, schema="doc_id long, content binary")
    recs = extract_warc_payloads(with_warc)
    out = with_http_split(recs)
    text_content = F.when(
        F.col("warc_type") == "conversion", F.col("payload").cast("string")
    ).otherwise(F.col("body").cast("string"))
    return out.select(
        "doc_id",
        F.col("record_idx").cast("int").alias("record_idx"),
        "warc_type",
        "target_uri",
        "http_status",
        "content_type",
        text_content.alias("text_content"),
    )


@_register(
    "q_crawl_frontier",
    """
    SELECT doc_id,
      CAST(1 + doc_id % 4 AS BIGINT) AS n_seeded,
      CAST(CASE CAST(doc_id % 4 AS INTEGER)
             WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 2
             ELSE 3 END AS BIGINT) AS n_allowed,
      CAST(CASE WHEN doc_id % 4 = 3 THEN 2 ELSE 1 END
           AS BIGINT) AS n_canonical,
      CAST(1 AS BIGINT) AS n_kept,
      'https://h' || CAST(doc_id AS VARCHAR) || '.com/a?b=1'
        AS fetch_url
    FROM documents
    """,
    "Crawl-frontier planning capstone — the PRE-fetch half of the "
    "web pipeline, composing this round's crawl stack exactly as a "
    "crawler runs it: sitemap seed (extract_sitemap_entries over "
    "per-host urlsets whose candidate mix varies by doc_id%4: a "
    "utm-tagged trailing-slash URL, its clean canonical twin, a "
    "robots-blocked path, a second distinct page) → robots "
    "politeness gate (parse_robots_rules + filter_allowed) → "
    "canonical URL dedup (url_dedup keep-min-id) → per-domain cap "
    "(cap_per_domain rank-limit, cap=1). Per-host funnel counts pin "
    "every stage and fetch_url pins WHICH candidate survived "
    "(canonicalization must merge the utm twin, the cap must rank "
    "the min-id page first). The oracle recomputes the funnel "
    "closed-form; the stage internals are value-pinned by "
    "q_sitemap / q_robots_filter / q_canonical_url / q_domain_cap.",
)
def q_crawl_frontier(spark, sf_dir):
    # Since r13 this query calls the LIBRARY preset (VERDICT r12 #3 —
    # the refinedweb_pipeline precedent): the sitemap-seed -> robots
    # gate -> canonical dedup -> per-domain cap chain lives in
    # operators/pipelines.py as crawl_pipeline, and this closed-form
    # oracle pins the library path (stage order, the pre-explode
    # fence, and the audit verdicts included).
    from featurestore_spark.operators.pipelines import crawl_pipeline

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    sid = d.cast("string")
    host = F.concat(F.lit("h"), sid, F.lit(".com"))

    def cand_path(j):
        return (
            F.when(j == 0, F.lit("/a/?utm_source=x&amp;b=1"))
            .when(j == 1, F.lit("/a?b=1"))
            .when(j == 2, F.lit("/private/x"))
            .otherwise(F.lit("/b"))
        )

    blocks = F.transform(
        F.sequence(F.lit(0), d % 4),
        lambda j: F.concat(
            F.lit("<url><loc>https://h"), sid, F.lit(".com"),
            cand_path(j), F.lit("</loc></url>"),
        ),
    )
    xml = F.concat(
        F.lit("<urlset>"), F.array_join(blocks, ""), F.lit("</urlset>")
    )
    robots_txt = F.concat(
        F.lit("User-agent: *\nDisallow: /private/\nSitemap: https://h"),
        sid,
        F.lit(".com/sm.xml\n"),
    )
    sites = docs.select(
        "doc_id",
        host.alias("host"),
        robots_txt.alias("robots_txt"),
        xml.alias("sitemap_xml"),
    )
    audit = crawl_pipeline(
        sites,
        agent="ccbot",
        seed_id=d * 4 + F.col("seed_pos"),
        cap=1,
        keep_stages=True,
    )
    return audit.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_seeded"),
        F.count_if(F.col("robots_allowed")).alias("n_allowed"),
        F.count_if(F.col("url_keeper")).alias("n_canonical"),
        F.count_if(F.col("kept")).alias("n_kept"),
        F.min(F.when(F.col("kept"), F.col("canonical_url"))).alias(
            "fetch_url"
        ),
    ).select(
        "doc_id", "n_seeded", "n_allowed", "n_canonical",
        "n_kept", "fetch_url",
    )


@_register(
    "q_fetch_schedule",
    """
    WITH u AS (
      SELECT doc_id, doc_id % 20 AS k,
             CAST(doc_id % 7 AS DOUBLE) AS prio
      FROM documents),
    r AS (
      SELECT u.*,
             row_number() OVER (PARTITION BY k ORDER BY prio DESC, doc_id)
               - 1 AS seq
      FROM u)
    SELECT doc_id,
           'https://h' || CAST(k AS VARCHAR) || '.com/p'
             || CAST(doc_id AS VARCHAR) AS url,
           prio,
           CAST(seq AS INTEGER) AS fetch_seq,
           seq * (CASE CAST(k % 3 AS INTEGER)
                    WHEN 0 THEN 2.0 WHEN 1 THEN 0.5
                    ELSE 1.0 END) AS fetch_at_s
    FROM r
    """,
    "Politeness-budgeted fetch scheduling (the step after the "
    "frontier filter turns allowed URLs into a rate-limited crawl "
    "plan): per-host Crawl-delay parsed from synthesized robots.txt "
    "(2s / 0.5s / undeclared by host class — the undeclared third "
    "falls back to the crawler default, pinning the absent-row "
    "contract), then schedule_fetches ranks each host's queue by a "
    "priority signal (doc_id%7, ties on doc_id) and assigns "
    "fetch_seq x delay timestamps. One broadcastable host-delay join "
    "+ one per-host row_number window — the partition is the unit a "
    "polite crawler must serialize anyway. Oracle replays the "
    "ranking and cadence arithmetic closed-form.",
)
def q_fetch_schedule(spark, sf_dir):
    # Since r13 this query drives the LIBRARY preset (VERDICT r12 #3)
    # in its pre-built-frontier form: crawl_pipeline applies the
    # robots gate (no rule matches the /p paths -- the fail-open
    # contract is part of what the oracle pins) and the Crawl-delay
    # schedule; dedup/cap are off, exactly a re-crawl scheduler.
    from featurestore_spark.operators.pipelines import crawl_pipeline

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    k = (d % 20).alias("k")
    hosts = docs.select(k).distinct()
    robots_txt = F.concat(
        F.lit("User-agent: *\nDisallow: /x\n"),
        F.when(F.col("k") % 3 == 0, F.lit("Crawl-delay: 2\n"))
        .when(F.col("k") % 3 == 1, F.lit("Crawl-delay: 0.5\n"))
        .otherwise(F.lit("")),
    )
    sites = hosts.select(
        F.concat(F.lit("h"), F.col("k").cast("string"), F.lit(".com")).alias(
            "host"
        ),
        robots_txt.alias("robots_txt"),
    )
    frontier = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://h"), (d % 20).cast("string"), F.lit(".com/p"),
            d.cast("string"),
        ).alias("url"),
        (d % 7).cast("double").alias("prio"),
    )
    out = crawl_pipeline(
        sites,
        frontier=frontier,
        agent="ccbot",
        id_col="doc_id",
        dedup=False,
        schedule=True,
        order_col="prio",
        default_delay_s=1.0,
    )
    return out.select(
        "doc_id", "url", "prio", "fetch_seq", "fetch_at_s"
    )


# Shared URL-filtering fixture constants: the term weights and
# threshold of the soft URL score, and the domain blocklists — kept
# in one place so the Spark queries and the oracle SQL can never
# drift. `_url_score_sql(col)` renders the identical fold in DuckDB.
_URL_TERMS = {"amazonaws": 2.0, "ck": 1.0, "articles": 0.5}
_URL_SCORE_THRESHOLD = 2.5
_URL_BLOCKLIST = ["example.org", "site.co.uk"]
_FUNNEL_BLOCKLIST = ["example.org"]


def _url_score_sql(col: str) -> str:
    arms = " ".join(
        f"WHEN '{t}' THEN {w}" for t, w in _URL_TERMS.items()
    )
    return (
        "round(list_sum(list_transform("
        f"list_filter(string_split_regex(lower({col}), '[^a-z0-9]+'), "
        "t -> t <> ''), "
        f"t -> CASE t {arms} ELSE 0.0 END)), 4)"
    )


@_register(
    "q_url_filter",
    _WEB_SQL
    + f"""
    SELECT doc_id, url, domain, {_url_score_sql('url')} AS url_score
    FROM dom
    WHERE (domain IS NULL
           OR domain NOT IN ({", ".join(f"'{d}'" for d in _URL_BLOCKLIST)}))
      AND {_url_score_sql('url')} < {_URL_SCORE_THRESHOLD}
    """,
    "URL/domain filtering (the RefinedWeb §3.1 step between URL dedup "
    "and text extraction): a registrable-domain BLOCKLIST applied as "
    "a broadcast anti-join (blocklists are millions of rows — a "
    "table, never a literal), then the soft word-based URL score "
    "(weighted term hits over the tokenized URL) thresholded. "
    "Unattributable rows (no registrable domain) survive the domain "
    "stage — no evidence against them.",
)
def q_url_filter(spark, sf_dir):
    from featurestore_spark.operators.web import filter_domains, filter_urls

    docs = load_table(spark, sf_dir, "documents")
    u = docs.select("doc_id", _web_url_col().alias("url"))
    bl = spark.createDataFrame(
        [(d,) for d in _URL_BLOCKLIST], "domain string"
    )
    kept = filter_domains(u, bl, "url")
    kept = filter_urls(
        kept, "url", terms=_URL_TERMS, threshold=_URL_SCORE_THRESHOLD
    )
    return kept.select("doc_id", "url", "domain", "url_score")


@_register(
    "q_domain_rollup",
    _WEB_SQL
    + """
    SELECT domain, CAST(count(*) AS BIGINT) AS n_urls,
           CAST(count(DISTINCT canonical_url) AS BIGINT) AS n_canonical,
           min(doc_id) AS min_id
    FROM dom GROUP BY domain
    """,
    "Per-registrable-domain corpus profile (the signal behind "
    "domain-level quality decisions: blocklists, per-domain caps, "
    "crawl-budget allocation): raw URL count, distinct canonical "
    "count (the gap is the crawl's per-domain duplicate mass), min "
    "id. One groupBy on the domain key; hosts with no registrable "
    "domain land in the NULL group.",
)
def q_domain_rollup(spark, sf_dir):
    from featurestore_spark.operators.web import domain_rollup

    docs = load_table(spark, sf_dir, "documents")
    return domain_rollup(docs.select("doc_id", _web_url_col().alias("url")))


@_register(
    "q_domain_cap",
    _WEB_SQL
    + """
    , ranked AS (
      SELECT doc_id, domain, n_chars,
             row_number() OVER (PARTITION BY domain
                                ORDER BY n_chars DESC NULLS LAST,
                                         doc_id ASC) AS rn
      FROM (SELECT d.doc_id, d.domain, o.n_chars
            FROM dom d JOIN documents o USING (doc_id))
      WHERE domain IS NOT NULL)
    SELECT doc_id, domain FROM ranked WHERE rn <= 20
    UNION ALL  -- unattributable rows bypass the cap
    SELECT d.doc_id, d.domain FROM dom d
    WHERE d.domain IS NULL
    """,
    "Per-domain cap (the RefinedWeb/C4 step after URL dedup: no "
    "single site floods the corpus): keep the top-20 pages per "
    "registrable domain by length (n_chars desc, id tiebreak); rows "
    "with no registrable domain bypass the cap. ONE row_number "
    "window on the domain key — Spark plans a WindowGroupLimit below "
    "the exchange, so each map task pre-prunes to its local top-20 "
    "per domain before shuffling.",
)
def q_domain_cap(spark, sf_dir):
    from featurestore_spark.operators.web import cap_per_domain

    docs = load_table(spark, sf_dir, "documents")
    u = docs.select("doc_id", "n_chars", _web_url_col().alias("url"))
    return cap_per_domain(u, 20, order_col="n_chars").select(
        "doc_id", "domain"
    )


@_register(
    "q_web_funnel",
    _WEB_SQL
    + r"""
    , grp AS (
      SELECT canonical_url, min(doc_id) AS keep_id,
             CAST(count(*) AS BIGINT) AS n_dups
      FROM dom WHERE canonical_url IS NOT NULL
      GROUP BY canonical_url),
    keep AS (
      SELECT d.doc_id, d.text, d.domain, d.canonical_url, g.n_dups
      FROM grp g JOIN dom d ON d.doc_id = g.keep_id),
    filt AS (
      SELECT * FROM keep
      WHERE (domain IS NULL OR domain NOT IN (__FUNNEL_BLOCK__))
        AND __CANON_SCORE__ < __SCORE_THRESHOLD__),
    stripped AS (
      SELECT doc_id, domain, n_dups, __STRIP_PAGE__ AS text
      FROM filt)
    SELECT domain, CAST(count(*) AS BIGINT) AS n_pages,
           CAST(sum(n_dups) AS BIGINT) AS n_raw_urls,
           CAST(sum(len(list_filter(string_split_regex(trim(text), '\s+'),
                                    t -> t <> ''))) AS BIGINT) AS n_tokens,
           min(doc_id) AS min_id
    FROM stripped GROUP BY domain
    """.replace(
        "__FUNNEL_BLOCK__",
        ", ".join(f"'{d}'" for d in _FUNNEL_BLOCKLIST),
    ).replace(
        "__CANON_SCORE__", _url_score_sql("canonical_url")
    ).replace(
        "__SCORE_THRESHOLD__", str(_URL_SCORE_THRESHOLD)
    ).replace(
        "__STRIP_PAGE__",
        _strip_html_sql(
            "'<html><body><p>'"
            " || replace(text, ' value ', '</p><p>')"
            " || '</p><script>var x = 1;</script></body></html>'"
        ),
    ),
    "Web-ingest funnel capstone: URL canonical dedup FIRST (cheapest "
    "— no page text read), then the URL filters over the keepers "
    "(domain blocklist anti-join + soft word-score threshold on the "
    "canonical URL), then HTML→text over the survivors only, rolled "
    "up per registrable domain (pages, raw-crawl dup mass, token "
    "yield). Proves the web front composes ahead of strip_html "
    "exactly as a crawl pipeline runs it.",
)
def q_web_funnel(spark, sf_dir):
    from featurestore_spark.operators.text import strip_html
    from featurestore_spark.operators.web import (
        filter_domains,
        filter_urls,
        url_dedup,
    )

    docs = load_table(spark, sf_dir, "documents")
    u = docs.select("doc_id", "text", _web_url_col().alias("url"))
    dd = url_dedup(u)
    keep = dd.select(
        F.col("keep_id").alias("doc_id"),
        F.col("canonical_url"),
        "n_dups",
    ).join(u.select("doc_id", "text"), "doc_id")
    bl = spark.createDataFrame(
        [(d,) for d in _FUNNEL_BLOCKLIST], "domain string"
    )
    keep = filter_domains(keep, bl, "canonical_url")
    keep = filter_urls(
        keep,
        "canonical_url",
        terms=_URL_TERMS,
        threshold=_URL_SCORE_THRESHOLD,
    )
    html = F.concat(
        F.lit("<html><body><p>"),
        F.replace(F.col("text"), F.lit(" value "), F.lit("</p><p>")),
        F.lit("</p><script>var x = 1;</script></body></html>"),
    )
    stripped = keep.select(
        "doc_id",
        "n_dups",
        "domain",
        strip_html(html).alias("text"),
    )
    n_tok = F.size(
        F.filter(
            F.split(F.trim(F.col("text")), r"\s+"), lambda t: t != F.lit("")
        )
    )
    return stripped.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.sum("n_dups").alias("n_raw_urls"),
        F.sum(n_tok).alias("n_tokens"),
        F.min("doc_id").alias("min_id"),
    )


# The capstone's published-pipeline constants: per-domain cap and the
# html page template shared by the Spark query and the oracle.
_E2E_CAP = 20
_E2E_HTML_PRE = "<html><body><p>"
_E2E_HTML_POST = "</p><script>var x = 1;</script></body></html>"


def _e2e_sql() -> str:
    """Assemble the capstone oracle from the shared stage builders
    (web chain, curate CTE generators, parameterized minhash chain) —
    the same constants the component queries pin, so the capstone can
    never drift from the pieces."""
    body = r"""
    , ugrp AS (
      SELECT canonical_url, min(doc_id) AS keep_id
      FROM dom WHERE canonical_url IS NOT NULL
      GROUP BY canonical_url),
    ukeep AS (
      SELECT d.doc_id, d.text, d.domain, d.canonical_url
      FROM ugrp g JOIN dom d ON d.doc_id = g.keep_id),
    filt AS (
      SELECT * FROM ukeep
      WHERE (domain IS NULL OR domain NOT IN (__FUNNEL_BLOCK__))
        AND __CANON_SCORE__ < __SCORE_THRESHOLD__),
    ranked AS (
      SELECT f.doc_id, f.text, f.domain,
             row_number() OVER (PARTITION BY f.domain
                                ORDER BY o.n_chars DESC NULLS LAST,
                                         f.doc_id ASC) AS rn
      FROM filt f JOIN documents o USING (doc_id)
      WHERE f.domain IS NOT NULL),
    capped AS (
      SELECT doc_id, text, domain FROM ranked WHERE rn <= __CAP__
      UNION ALL
      SELECT doc_id, text, domain FROM filt WHERE domain IS NULL),
    synth AS (  -- long-form page body (the q_curate_gopher synthesis)
      SELECT doc_id, domain, __CURATE_SYNTH__ AS t FROM capped),
    page AS (
      SELECT doc_id, domain,
             '__HTML_PRE__' || replace(t, ' value ', '</p><p>')
             || '__HTML_POST__' AS html
      FROM synth),
    strp AS (
      SELECT doc_id, domain, __STRIP__ AS s FROM page),
    lsynth AS (  -- line structure for the line-dedup stage
      SELECT doc_id, domain, replace(s, ' table ', chr(10)) AS text
      FROM strp),
    lns AS (
      SELECT doc_id, pos, ls[pos] AS line
      FROM (SELECT doc_id, ls, unnest(generate_series(1, len(ls))) AS pos
            FROM (SELECT doc_id, string_split(text, chr(10)) AS ls
                  FROM lsynth))),
    lfreq AS (
      SELECT lower(trim(line)) AS norm
      FROM lns WHERE lower(trim(line)) <> ''
      GROUP BY 1 HAVING count(DISTINCT doc_id) > 1),
    keptln AS (
      SELECT l.doc_id, l.pos, l.line FROM lns l
      LEFT JOIN lfreq f ON lower(trim(l.line)) = f.norm
      WHERE f.norm IS NULL),
    rebuilt AS (
      SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text
      FROM keptln GROUP BY doc_id),
    ld AS (
      SELECT c.doc_id, coalesce(r.text, '') AS text
      FROM lsynth c LEFT JOIN rebuilt r USING (doc_id)),
    __GDR__,
    __GRT__,
    dkeep AS (SELECT doc_id FROM sig WHERE __GDR_KEEP__),
    rkeep AS (SELECT doc_id FROM final WHERE __GRT_KEEP__),
    cur AS (SELECT t.doc_id, t.t AS text FROM toked t
            JOIN dkeep USING (doc_id) JOIN rkeep USING (doc_id)),
    __MINHASH__,
    __MELT__,
    bkept_f AS (
      SELECT band_idx, band_hash FROM melted_f
      GROUP BY band_idx, band_hash HAVING count(*) <= __MAX_BUCKET__),
    cand_f AS (
      SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
      FROM melted_f a JOIN melted_f b USING (band_idx, band_hash)
      JOIN bkept_f USING (band_idx, band_hash)
      WHERE a.doc_id < b.doc_id),
    verified_f AS (
      SELECT c.a_id, c.b_id
      FROM cand_f c JOIN shingled_f sa ON sa.doc_id = c.a_id
                    JOIN shingled_f sb ON sb.doc_id = c.b_id
      WHERE round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
            / len(list_distinct(list_concat(sa.sh, sb.sh))), 4)
            >= __FW_THR__),
    drops_f AS (
      SELECT db.doc_id AS d FROM verified_f v
        JOIN grpx gb ON gb.rep_id = v.b_id
        JOIN cur db ON db.text IS NOT DISTINCT FROM gb.text
      WHERE db.doc_id > v.a_id
      UNION
      SELECT da.doc_id FROM verified_f v
        JOIN grpx ga ON ga.rep_id = v.a_id
        JOIN cur da ON da.text IS NOT DISTINCT FROM ga.text
      WHERE da.doc_id > v.b_id
      UNION
      SELECT c.doc_id FROM cur c
        JOIN grpx g ON g.text IS NOT DISTINCT FROM c.text
      WHERE c.doc_id > g.rep_id),
    surv AS (
      SELECT c.doc_id, c.text FROM cur c
      LEFT JOIN drops_f ON c.doc_id = drops_f.d
      WHERE drops_f.d IS NULL)
    SELECT o.source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(list_filter(string_split_regex(trim(s.text),
                                                       '\s+'),
                                    x -> x <> ''))) AS BIGINT) AS n_tokens,
           min(s.doc_id) AS min_id
    FROM surv s JOIN documents o USING (doc_id)
    GROUP BY o.source
    """
    body = (
        body.replace(
            "__FUNNEL_BLOCK__",
            ", ".join(f"'{d}'" for d in _FUNNEL_BLOCKLIST),
        )
        .replace("__CANON_SCORE__", _url_score_sql("canonical_url"))
        .replace("__SCORE_THRESHOLD__", str(_URL_SCORE_THRESHOLD))
        .replace("__CAP__", str(_E2E_CAP))
        .replace("__CURATE_SYNTH__", _CURATE_SYNTH)
        .replace("__HTML_PRE__", _E2E_HTML_PRE)
        .replace("__HTML_POST__", _E2E_HTML_POST)
        .replace("__STRIP__", _strip_html_sql("html"))
        .replace("__GDR__", _gdr_ctes(src_table="ld"))
        .replace("__GRT__", _grt_ctes("coalesce(text, '')", src_table="ld"))
        .replace("__GDR_KEEP__", _GDR_KEEP)
        .replace("__GRT_KEEP__", _grt_keep())
        .replace(
            "__MINHASH__",
            _duck_minhash_bands(
                src="rep_docs",
                prelude="""grpx AS (
      SELECT text, min(doc_id) AS rep_id FROM cur GROUP BY text),
    rep_docs AS (SELECT rep_id AS doc_id, text FROM grpx)""",
                sfx="_f",
                lead=False,
                n=_FW_N,
                k=_FW_K,
                bands=_FW_BANDS,
            ),
        )
        .replace("__MELT__", _melt_cte("melted_f", "bands_f", bands=_FW_BANDS))
        .replace("__MAX_BUCKET__", str(_MH_MAX_BUCKET))
        .replace("__FW_THR__", str(_FW_THR))
    )
    # DuckDB 1.0 INLINES every CTE reference — with this depth of
    # chain, a multi-referenced CTE re-executes the entire upstream
    # funnel per reference (measured: the un-hinted oracle ran >10
    # minutes at sf0.001). Materialize each multi-referenced stage
    # boundary so the oracle evaluates each stage once, like the
    # engine does.
    for cte in (
        "filt", "lsynth", "lns", "ld", "cur", "shingled_f", "bands_f"
    ):
        body = body.replace(f"{cte} AS (", f"{cte} AS MATERIALIZED (", 1)
    return _WEB_SQL + body


@_register(
    "q_refinedweb_e2e",
    _e2e_sql(),
    "END-TO-END published-pipeline capstone (VERDICT r9 #2): the "
    "FULL RefinedWeb-shaped recipe in ONE oracled plan — URL "
    "canonical dedup -> domain blocklist anti-join -> soft URL word "
    "score -> per-domain cap (WindowGroupLimit) -> HTML strip -> "
    "corpus-wide line dedup -> curate_corpus('gopher') (BOTH Gopher "
    "halves at published thresholds) -> dedup_corpus('fineweb') "
    "(published MinHash constants) -> per-source yield. Every stage "
    "is individually oracled elsewhere; this query exists because "
    "composition bugs (column collisions, passthrough breaks, "
    "fence/collapse interactions across SEVEN operators) are what "
    "per-stage oracles cannot see. Fixture: the q_canonical_url "
    "synthesized crawl URL; the page body is the q_curate_gopher "
    "long-form synthesis (raw + position-suffixed copy + stopword "
    "tail — past Gopher's 50-word minimum) html-wrapped, with "
    "' value ' as the paragraph boundary and ' table ' as the "
    "line boundary.",
)
def q_refinedweb_e2e(spark, sf_dir):
    # Since r11 this query calls the LIBRARY preset (VERDICT r10 #2):
    # the eight-stage chain lives in operators/pipelines.py as the
    # product artifact, and the same end-to-end oracle now pins the
    # library path (stage order, fence/collapse placements included).
    from featurestore_spark.operators.pipelines import refinedweb_pipeline
    from featurestore_spark.operators.text import strip_html

    docs = load_table(spark, sf_dir, "documents")
    u = docs.select(
        "doc_id", "text", "n_chars", _web_url_col().alias("url")
    )
    bl = spark.createDataFrame(
        [(d,) for d in _FUNNEL_BLOCKLIST], "domain string"
    )

    def _extract(_c):
        # fixture-only extraction: the shared q_curate_gopher
        # long-form synthesis (one definition, one oracle constant),
        # html-wrapped with ' value ' as the paragraph boundary, then
        # stripped, with ' table ' as the line boundary — runs at the
        # pipeline's extraction slot, i.e. only on capped survivors
        html = F.concat(
            F.lit(_E2E_HTML_PRE),
            F.replace(
                _curate_synth_col(), F.lit(" value "), F.lit("</p><p>")
            ),
            F.lit(_E2E_HTML_POST),
        )
        return F.replace(strip_html(html), F.lit(" table "), F.lit("\n"))

    # stages 1-8: URL dedup -> blocklist -> URL score -> per-domain
    # cap -> extraction -> line dedup -> gopher curation -> fineweb
    # fuzzy dedup, all inside the one-call preset
    ded = refinedweb_pipeline(
        u,
        blocklist=bl,
        terms=_URL_TERMS,
        url_threshold=_URL_SCORE_THRESHOLD,
        cap=_E2E_CAP,
        cap_order_col="n_chars",
        extract=_extract,
        curate="gopher",
        dedup="fineweb",
    )
    # 9. per-source yield
    n_tok = F.size(
        F.filter(
            F.split(F.trim(F.col("text")), r"\s+"), lambda t: t != F.lit("")
        )
    )
    return (
        ded.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(n_tok).alias("n_tokens"),
            F.min("doc_id").alias("min_id"),
        )
    )


# ---------------------------------------------------------------------------
# Driver-gate registration order.
#
# The correctness driver verifies the FIRST 50 queries in registration
# (dict-insertion) order, so the window ROTATES each round (VERDICT r3
# #9): the least-recently-driver-verified queries go first, plus every
# query whose code path changed this round, plus one fresh
# representative per remaining operator family.  r2 verified the
# event/vault/TPC-H block, r3 the LLM-pipeline surface, r4 swaps back
# to event/TPC-H + this round's rewrites — so across consecutive
# artifacts the whole 85-query surface carries recent driver evidence.
# (`tools/check_oracle.py` runs all 85 regardless; the rotation is
# about what lands in the driver's own CORRECTNESS_r{N}.json.)
# Mutating the existing dict keeps `from ... import QUERIES` bindings
# valid.
# ---------------------------------------------------------------------------

_DRIVER_PRIORITY = [
    # Round-15 rotation. Two forces compete for the 50 slots this
    # round: the staleness cadence says the window is the r12-only
    # block (r12 \ (r13 ∪ r14), exactly 50 — the zero-slack capacity
    # note from r14 still holds), but VERDICT r14 #5 explicitly
    # requires driver-grade evidence AT HEAD for the six queries
    # whose kernels r14 rewrote AFTER their last driver check
    # (q_gopher_{repetition,positional}, q_curate_gopher,
    # q_lid_classify, q_dsir_weights, q_hard_negatives), and this
    # optimization round restructured the dedup/curation barrier
    # placements, the crawl audit fence, and the incremental restart
    # guard — touched queries outrank untouched stale ones after an
    # optimization round (the same verdict's rotation guidance).
    # Resolution: the 28 non-TPC-H members of the stale block + the 6
    # r14-kernel queries + 16 queries this round's optimizations flow
    # through. The 22 TPC-H members yield their slots: byte-identical
    # code since r4, value-checked by the local 150/150 check_oracle
    # sweep every round, and serving as the bench's drift control —
    # the lowest-information driver checks in the catalog.
    #
    # the six r14 Arrow-kernel queries (VERDICT r14 #5)
    "q_gopher_repetition",
    "q_gopher_positional",
    "q_curate_gopher",
    "q_lid_classify",
    "q_dsir_weights",
    "q_hard_negatives",
    # r15-touched: barrier fusion / re-widening / guard memo paths
    "q_refinedweb_e2e",
    "q_dedup_ladder",
    "q_dedup_lines",
    "q_shared_spans",
    "q_decontaminate_spans",
    "q_decontaminate",
    "q_dedup_clusters",
    "q_dedup_pipeline",
    "q_simhash_near_dups",
    "q_nb_classify",
    "q_quality_classify",
    "q_incremental_dedup",
    "q_incremental_spans",
    "q_incremental_line_dedup",
    "q_incremental_url_dedup",
    "q_incremental_media_dedup",
    # the r12-only stale block, minus its TPC-H members (28)
    "q_boilerplate",
    "q_bpe_apply",
    "q_crawl_frontier",
    "q_days_since_earliest",
    "q_days_since_latest",
    "q_dedup_best",
    "q_dedup_preset",
    "q_domain_pagerank",
    "q_dq_assertion",
    "q_entity_resolution",
    "q_event_count_window",
    "q_event_distinct_window",
    "q_event_sum_window",
    "q_fetch_schedule",
    "q_full_paths",
    "q_hash_split",
    "q_image_meta",
    "q_link_customer_order",
    "q_main_content",
    "q_pack_chunks",
    "q_pivot_chord",
    "q_previous_interactions",
    "q_robots_filter",
    "q_sitemap",
    "q_sniff_csv",
    "q_top_customers",
    "q_warc_extract",
    "q_wav",
    # --- driver window ends here (first 50).
]


_ordered = {n: QUERIES[n] for n in _DRIVER_PRIORITY if n in QUERIES}
_ordered.update({n: s for n, s in QUERIES.items() if n not in _ordered})
QUERIES.clear()
QUERIES.update(_ordered)
