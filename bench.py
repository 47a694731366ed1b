#!/usr/bin/env python
"""Benchmark harness: runs the registered queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entrymod
    from text_extensions_for_pandas_spark import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/parquet footers so per-query numbers measure the queries.
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    from pyspark.sql import functions as F

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}

    # Materialize the session matviews up front, as their own timed line
    # item: otherwise whichever query first touches a view pays the whole
    # build inside its own timing and per-query attribution is skewed
    # (production materializes these once, not per query).  The build cost
    # still counts toward the benchmark total.
    try:
        from concurrent.futures import ThreadPoolExecutor

        from text_extensions_for_pandas_spark import queries as Q

        t0 = time.time()
        # the three builds are independent jobs; running them from three
        # threads lets the scheduler overlap their stages on idle cores
        with ThreadPoolExecutor(3) as pool:
            list(
                pool.map(
                    lambda b: b(spark, sf_dir).count(),
                    (Q._tokens, Q._shingles, Q._term_freqs),
                )
            )
        timings["_matview_build"] = round(time.time() - t0, 3)
        print(f"# _matview_build: {timings['_matview_build']:.2f}s", file=sys.stderr)
    except Exception as e:  # noqa: BLE001
        errors["_matview_build"] = f"{type(e).__name__}: {str(e)[:200]}"
    for name, fn in entrymod.queries().items():
        # One broken query must not take down the whole benchmark (round 2
        # lost its BENCH record to a single AnalysisException): record the
        # error and keep going — the JSON line always prints.
        # SPARK_GRAFT_BENCH_REPEATS>1 switches to the warm-median
        # methodology BASELINE.md uses for regression triage: run each
        # query N times, report the median (first run absorbs cache /
        # matview warm-up; the median is the steady-state number).  The
        # driver's per-round record uses the default single cold run.
        repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "1")))
        runs = []
        try:
            for _ in range(repeats):
                t0 = time.time()
                df = fn(spark, sf_dir)
                # Evaluate every column of every row JVM-side (xxhash64 over
                # the full row defeats projection pruning, which a bare
                # count() would allow), without the driver-side Python
                # deserialization cost of collect() — the engine's work is
                # what's being measured.
                n, _ = df.agg(
                    F.count(F.lit(1)), F.bit_xor(F.xxhash64(*df.columns))
                ).collect()[0]
                runs.append(time.time() - t0)
        except Exception as e:  # noqa: BLE001
            errors[name] = f"{type(e).__name__}: {str(e)[:200]}"
            print(f"# {name}: ERROR {errors[name]}", file=sys.stderr)
            continue
        timings[name] = round(sorted(runs)[len(runs) // 2], 3)
        print(f"# {name}: {timings[name]:.2f}s rows={n}", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").split("sf")[-1]
    line = json.dumps(
        {
            "metric": "total_query_seconds",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "errors": errors,
            "sf": float(sf) if sf else None,
        }
    )
    print(line)
    # Stall-proof record (r10 VERDICT #7): round 9's bench was lost to a
    # truncated tty capture, so ALSO persist the identical JSON line to a
    # file.  The printed contract above is unchanged.
    out_path = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL_last.json"),
    )
    try:
        with open(out_path, "w") as fh:
            fh.write(line + "\n")
    except OSError as e:
        print(f"# bench record write failed: {e}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
