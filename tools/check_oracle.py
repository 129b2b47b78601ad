#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs every `queries()` entry on Spark at the given SF dir, runs the
matching `oracle_sql()` in DuckDB over the same parquet files, and
compares row count, sorted-by-name schema, and (order-insensitive)
values. Exit 0 iff everything matches.

Usage:
  python3 tools/check_oracle.py [--sf /root/testdata/sf0.01] [-q name ...]
"""

from __future__ import annotations

import argparse
import os
import math
import sys

sys.path.insert(0, ".")


def normalize(df):  # pandas df -> canonical sorted structure
    import pandas as pd

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    rows = []
    for tup in df.itertuples(index=False):
        key = []
        for v in tup:
            if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
                key.append("\x00NULL")
            elif isinstance(v, float):
                # exact double repr — mimics a strict value hash
                key.append(f"{v:.17g}")
            else:
                key.append(str(v))
        rows.append("\x01".join(key))
    rows.sort()
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("-q", "--query", action="append", default=None)
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as entrymod
    from featurestore_spark.session import get_spark

    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=8)

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        # driver testdata ships flat <table>.parquet files; derived
        # sets (tools/gen_scale.py) are Spark-written DIRECTORIES of
        # part files — glob those
        path = f"{args.sf}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{path}'"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args.query or list(queries)
    failed = []
    for name in names:
        fn = queries[name]
        try:
            sdf = fn(spark, args.sf).toPandas()
        except Exception as e:
            print(f"✗ {name}: SPARK ERROR {type(e).__name__}: {str(e)[:300]}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"~ {name}: no oracle (rows-only): {len(sdf)} rows")
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"✗ {name}: DUCKDB ERROR {type(e).__name__}: {str(e)[:300]}")
            failed.append(name)
            continue
        problems = []
        if len(sdf) != len(ddf):
            problems.append(f"rowcount spark={len(sdf)} duck={len(ddf)}")
        if sorted(sdf.columns) != sorted(ddf.columns):
            problems.append(f"schema spark={sorted(sdf.columns)} duck={sorted(ddf.columns)}")
        if not problems:
            s_rows, d_rows = normalize(sdf), normalize(ddf)
            if s_rows != d_rows:
                diff = [
                    (a, b) for a, b in zip(s_rows, d_rows) if a != b
                ][:3]
                problems.append(f"values differ; first diffs: {diff}")
        if problems:
            print(f"✗ {name}: " + "; ".join(problems))
            failed.append(name)
        else:
            print(f"✓ {name}: {len(sdf)} rows match")
    print(f"\n{len(names) - len(failed)}/{len(names)} queries match")
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    import pandas as pd  # noqa: F401  (normalize uses pd.NaT)

    sys.exit(main())
