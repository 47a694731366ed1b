#!/usr/bin/env python
"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB over the same parquet, compare
row-count, schema (column names), and order-insensitive values.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(
            f"schema mismatch: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"
        )
        return problems
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c], b[c]
            if av.dtype.kind != bv.dtype.kind and "f" in (av.dtype.kind, bv.dtype.kind):
                # The driver hashes raw values: 908 vs 908.0 is a mismatch
                # even when numerically equal (seen in round 2's f1_report).
                problems.append(
                    f"col {c}: dtype kind mismatch spark={av.dtype} duck={bv.dtype}"
                )
                continue
            if av.dtype.kind == "f" or bv.dtype.kind == "f":
                ok = np.allclose(
                    av.astype(float), bv.astype(float), rtol=0, atol=0, equal_nan=True
                )
                if not ok:
                    diff = (av.astype(float) - bv.astype(float)).abs()
                    problems.append(
                        f"col {c}: {int((diff > 0).sum())} float diffs, max={diff.max():.3e}"
                    )
            else:
                neq = (av.astype(str) != bv.astype(str))
                if neq.any():
                    i = int(neq.idxmax())
                    problems.append(
                        f"col {c}: {int(neq.sum())} value diffs, first at row {i}: "
                        f"spark={av.iloc[i]!r} duck={bv.iloc[i]!r}"
                    )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from text_extensions_for_pandas_spark import get_spark

    spark = get_spark("check-oracle")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {str(e)[:200]}")
            n_fail += 1
            continue
        t1 = time.time()
        if name not in oracles:
            print(f"weak  {name}: rows={len(spark_pdf)} ({t1-t0:.1f}s, no oracle)")
            continue
        try:
            duck_pdf = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {str(e)[:200]}")
            n_fail += 1
            continue
        problems = compare(spark_pdf, duck_pdf)
        if problems:
            n_fail += 1
            print(f"FAIL  {name}: rows={len(spark_pdf)}/{len(duck_pdf)} ({t1-t0:.1f}s)")
            for p in problems:
                print(f"      - {p}")
        else:
            print(f"ok    {name}: rows={len(spark_pdf)} ({t1-t0:.1f}s)")
    spark.stop()
    print("ALL OK" if n_fail == 0 else f"{n_fail} FAILURES")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
