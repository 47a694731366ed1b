#!/usr/bin/env python
"""Per-query measurement harness for the optimization rounds.

Times selected queries (default: all) with the bench's exact timed action,
optionally repeated (median + all runs reported), and optionally dumps
``explain("formatted")`` to ``plans/$SPARK_GRAFT_PLAN_DIR/<name>_<tag>.txt``
(default ``plans/r11``).

Usage:
    python scripts/measure.py [--repeats N] [--plans TAG] [--sf DIR] [query ...]

Prints one JSON line {"queries": {name: {"median": s, "runs": [...]}}} at the
end (stderr carries progress).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--repeats", type=int, default=1)
    ap.add_argument("--plans", default=None, help="dump plans with this tag")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--no-matviews", action="store_true")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F

    from text_extensions_for_pandas_spark import get_spark
    from text_extensions_for_pandas_spark import queries as Q

    spark = get_spark("measure")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{args.sf}/lineitem.parquet").count()

    if not args.no_matviews:
        t0 = time.time()
        for b in (Q._tokens, Q._shingles, Q._term_freqs):
            b(spark, args.sf).count()
        print(f"# matviews: {time.time()-t0:.2f}s", file=sys.stderr)

    reg = entrymod.queries()
    names = args.queries or list(reg)
    out: dict[str, dict] = {}
    for name in names:
        fn = reg[name]
        if args.plans:
            plandir = os.environ.get("SPARK_GRAFT_PLAN_DIR", "plans/r11")
            os.makedirs(plandir, exist_ok=True)
            df = fn(spark, args.sf)
            with open(f"{plandir}/{name}_{args.plans}.txt", "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        runs = []
        try:
            for _ in range(args.repeats):
                spark.sparkContext.setJobDescription(f"measure:{name}")
                t0 = time.time()
                df = fn(spark, args.sf)
                n, _ = df.agg(
                    F.count(F.lit(1)), F.bit_xor(F.xxhash64(*df.columns))
                ).collect()[0]
                runs.append(round(time.time() - t0, 3))
        except Exception as e:  # noqa: BLE001
            out[name] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
            print(f"# {name}: ERROR {out[name]['error']}", file=sys.stderr)
            continue
        med = sorted(runs)[len(runs) // 2]
        out[name] = {"median": med, "runs": runs}
        print(f"# {name}: {med:.2f}s  runs={runs}", file=sys.stderr)
    print(json.dumps({"sf": args.sf, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
