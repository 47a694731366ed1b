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


def test_cluster_strategy_drops_transitive_duplicates(spark):
    # docs 1, 2, 5 are near-identical; 1-5 and 2-5 pair up via LSH, and
    # (with identical texts) 1-2 does too, but the synthetic case that
    # matters is: cluster strategy keeps ONLY the component minimum,
    # pairwise keeps every doc that never shows up as the higher id.
    base = "the quick brown fox jumps over the lazy dog again and again " * 3
    rows = [
        (1, base + "tail one"),
        (2, base + "tail two"),
        (5, base + "tail tre"),
        (9, "the totally different content of another and unrelated story is here " * 3),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    kept_pairs = {
        r.doc_id
        for r in prepare_training_corpus(
            docs, min_words=5, near_dup_strategy="pairs"
        ).collect()
    }
    kept_clusters = {
        r.doc_id
        for r in prepare_training_corpus(
            docs, min_words=5, near_dup_strategy="clusters"
        ).collect()
    }
    assert kept_clusters <= kept_pairs
    assert 1 in kept_clusters and 9 in kept_clusters
    assert kept_clusters == {1, 9}
