"""Event-time normalization.

The synthetic ``events.parquet`` has shipped with two different physical
types for ``ts`` across testdata generations:

* ``TIMESTAMP(NANOS)`` — Spark 4 reads it as ``long`` (nanos since epoch)
  under ``spark.sql.legacy.parquet.nanosAsLong`` (set in session.py);
* ``timestamp[us]`` with ``isAdjustedToUTC=false`` — Spark 4 reads it as
  ``TIMESTAMP_NTZ``, a type it refuses to cast to any numeric and whose
  epoch interpretation depends on the session timezone.

Every consumer (batch loader, streaming source, tests) goes through
:func:`normalize_event_ts` so the rest of the engine always sees one shape:
a session-UTC ``TIMESTAMP`` at µs precision, whose epoch arithmetic matches
DuckDB's naive-timestamp semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Return ``df`` with ``col`` as a UTC-session TIMESTAMP (µs).

    Handles ``long`` (nanos), ``timestamp_ntz`` (wall clock), and
    passthrough for an already-correct ``timestamp``.  Pins the session
    timezone to UTC when an NTZ cast is involved — the caller's session
    (e.g. the correctness driver's) may not have it set, and the NTZ→LTZ
    cast must be the identity on the wall clock.
    """
    dtype = dict(df.dtypes).get(col)
    if dtype == "bigint":
        return df.withColumn(
            col, F.timestamp_micros(F.floor(F.col(col) / 1000).cast("long"))
        )
    if dtype == "timestamp_ntz":
        df.sparkSession.conf.set("spark.sql.session.timeZone", "UTC")
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df
