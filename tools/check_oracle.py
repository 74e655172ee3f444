"""Parity harness: run each __spark_entry__ query against its DuckDB
oracle at a given sf and report row-count / schema / value mismatches —
a local mirror of the driver's CORRECTNESS check.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

import __spark_entry__ as entrymod
from veranda_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            try:
                df[c] = pd.to_numeric(df[c])
            except (ValueError, TypeError):
                pass
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    errs = []
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        errs.append(f"schema: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}")
        return errs
    if len(spark_pdf) != len(duck_pdf):
        errs.append(f"rows: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c], b[c]
            if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
                av = pd.to_numeric(av, errors="coerce").astype(float)
                bv = pd.to_numeric(bv, errors="coerce").astype(float)
                bad = ~(
                    (av.isna() & bv.isna())
                    | ((av - bv).abs() <= 1e-9 + 1e-9 * bv.abs())
                )
            else:
                bad = av.astype(str) != bv.astype(str)
            n_bad = int(bad.sum())
            if n_bad:
                i = bad[bad].index[0]
                errs.append(f"col {c}: {n_bad} mismatches, first: spark={a[c][i]!r} duck={b[c][i]!r}")
    return errs


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    spark = get_spark(master="local[16]", shuffle_partitions=16)
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:
            print(f"FAIL {name}: spark error: {exc}")
            n_fail += 1
            continue
        dt = time.monotonic() - t0
        if name not in oracles:
            print(f"ok   {name}: rows-only, {len(sdf)} rows ({dt:.1f}s)")
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception as exc:
            print(f"FAIL {name}: duckdb error: {exc}")
            n_fail += 1
            continue
        errs = compare(name, sdf, ddf)
        if errs:
            n_fail += 1
            print(f"FAIL {name} ({dt:.1f}s): " + "; ".join(errs))
        else:
            print(f"OK   {name}: {len(sdf)} rows match ({dt:.1f}s)")
    spark.stop()
    print("FAILURES:", n_fail)
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
