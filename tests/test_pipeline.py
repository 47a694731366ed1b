"""Training-corpus preparation pipeline tests."""

import pyspark.sql.functions as F
import pytest

from text_extensions_for_pandas_spark.operators.pipeline import (
    corpus_funnel,
    prepare_training_corpus,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet").cache()


def test_funnel_monotone(docs):
    rows = {r.stage: r.n_docs for r in corpus_funnel(docs).collect()}
    assert list(rows) == sorted(rows)
    counts = [rows[s] for s in sorted(rows)]
    assert all(a >= b for a, b in zip(counts, counts[1:]))
    assert counts[0] == docs.count() and counts[-1] > 0


def test_prepare_training_corpus(docs):
    out = prepare_training_corpus(docs).cache()
    n_funnel = {r.stage: r.n_docs for r in corpus_funnel(docs).collect()}
    assert out.count() == n_funnel["4_near_dedup"]
    # split covers every surviving doc, deterministically
    assert out.filter(F.col("split").isNull()).count() == 0
    a = {r.doc_id: r.split for r in out.collect()}
    b = {r.doc_id: r.split for r in prepare_training_corpus(docs).collect()}
    assert a == b
    # no exact duplicates survive
    assert out.select("text").distinct().count() == out.count()
