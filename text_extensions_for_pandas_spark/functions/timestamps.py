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
    """Return ``df`` with ``col`` as a TIMESTAMP whose instant equals the
    source wall clock read as UTC.

    Handles ``long`` (nanos), ``timestamp_ntz`` (wall clock), and
    passthrough for an already-correct ``timestamp``.  The NTZ path is an
    *expression-level* conversion: ``timestampdiff`` between two NTZ values
    is pure wall-clock arithmetic, so the result is identical in any
    caller session timezone (e.g. the correctness driver's, which makes no
    UTC guarantee) — no session state is read or mutated, and the lazy
    plan can execute under whatever timezone is current without changing
    meaning."""
    dtype = dict(df.dtypes).get(col)
    if dtype == "bigint":
        return df.withColumn(
            col, F.timestamp_micros(F.floor(F.col(col) / 1000).cast("long"))
        )
    if dtype == "timestamp_ntz":
        epoch_us = F.expr(
            f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', `{col}`)"
        )
        return df.withColumn(col, F.timestamp_micros(epoch_us))
    return df
