"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``text_extensions_for_pandas_spark.queries``;
this module is a thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from text_extensions_for_pandas_spark import queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the SURVEY.md §7 step-3
    slice — tokenize → dictionary extraction → consolidate → spans with
    covered text, over the documents corpus."""
    import pyspark.sql.functions as F

    from text_extensions_for_pandas_spark.operators.consolidate import consolidate
    from text_extensions_for_pandas_spark.operators.extract import (
        create_dict,
        extract_dict,
    )
    from text_extensions_for_pandas_spark.functions.text import tokenize_whitespace

    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = tokenize_whitespace(docs)
    d = create_dict(spark, Q.OVERLAP_ENTRIES)
    matches = extract_dict(toks, d)
    kept = consolidate(matches.select("doc_id", "span", "entry_id"), on="span")
    return (
        kept.join(docs.select("doc_id", "text"), "doc_id")
        .select(
            "doc_id",
            F.col("span")["begin"].alias("begin"),
            F.col("span")["end"].alias("end"),
            F.expr("substring(text, span.begin + 1, span.end - span.begin)").alias(
                "match"
            ),
        )
        .orderBy("doc_id", "begin")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return Q.queries()


def oracle_sql() -> dict[str, str]:
    return Q.oracle_sql()
