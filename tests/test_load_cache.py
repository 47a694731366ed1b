"""The schema-cached ``queries.load()`` must behave exactly like a plain
``spark.read.parquet``: same schema and rows on every call, fresh
expression ids per call (self-joins of two ``load()`` results of the same
table stay unambiguous), and the events-timestamp normalization intact.
"""

from pyspark.sql import functions as F

from text_extensions_for_pandas_spark import queries as Q


def test_load_schema_and_rows_stable(spark, sf_dir):
    plain = spark.read.parquet(f"{sf_dir}/documents.parquet")
    first = Q.load(spark, sf_dir, "documents")
    second = Q.load(spark, sf_dir, "documents")  # cache-hit path
    assert first.schema == plain.schema
    assert second.schema == plain.schema
    n = plain.count()
    assert first.count() == n
    assert second.count() == n


def test_load_results_are_self_join_safe(spark, sf_dir):
    # two load() calls of the same table joined on different filters — the
    # corpus_diff shape; must not raise ambiguous-reference errors and must
    # compute the true intersection count
    a = Q.load(spark, sf_dir, "documents").filter(F.col("doc_id") % 2 == 0)
    b = Q.load(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 0)
    joined = a.select("doc_id").join(b.select("doc_id"), "doc_id")
    expect = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") % 6 == 0)
        .count()
    )
    assert joined.count() == expect


def test_load_events_normalization_applies_on_cache_hit(spark, sf_dir):
    Q.load(spark, sf_dir, "events")  # prime the cache
    ev = Q.load(spark, sf_dir, "events")
    # normalize_event_ts yields a real TIMESTAMP column (the raw parquet
    # arrives as TIMESTAMP(NANOS) → long under nanosAsLong)
    assert dict(ev.dtypes)["ts"] == "timestamp"
    assert ev.select(F.date_trunc("hour", "ts")).first() is not None
