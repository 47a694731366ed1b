"""SparkSession factory with scale-oriented defaults.

Test/bench runs use ``local[N]``; the same configuration keys are the ones
that matter on a real cluster (AQE, shuffle partitions, Arrow batch size).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "text_extensions_for_pandas_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    Defaults are chosen for correctness-at-scale:

    * AQE on (runtime coalescing + skew-join splitting — big documents are
      the natural skew source for span workloads).
    * Arrow enabled for the pandas-UDF islands (tokenizers, consolidate).
    * UTC session timezone so timestamp semantics match the DuckDB oracle.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", cpus))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        # testdata events.parquet stores TIMESTAMP(NANOS); Spark 4 rejects it
        # unless read as long (we convert back to timestamp in the loader)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # Long-running sessions accumulate persisted/checkpointed blocks from
        # completed queries (operators persist small internal tables — banded
        # signatures, candidate pairs); the blocks are freed by the
        # ContextCleaner only when the JVM garbage-collects the RDD handle,
        # and the default periodic-GC interval is 30 MINUTES — far longer
        # than a whole bench run, so storage fills and execution memory
        # shrinks as a session ages.  One forced GC a minute is noise-level
        # CPU and keeps block-manager residency proportional to the LIVE
        # queries; same reasoning applies to a production driver that
        # plans thousands of queries per hour.
        .config(
            "spark.cleaner.periodicGC.interval",
            os.environ.get("SPARK_PERIODIC_GC", "60s"),
        )
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
