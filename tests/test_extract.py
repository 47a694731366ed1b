"""Extract operator tests — fixtures modeled on the reference's
(``spanner/test_extract.py``: dict load/create/match, regex_tok, regex,
split)."""

import pyspark.sql.functions as F
import pytest

from text_extensions_for_pandas_spark.functions.text import tokenize_whitespace
from text_extensions_for_pandas_spark.operators.extract import (
    create_dict,
    extract_dict,
    extract_regex,
    extract_regex_tok,
    extract_split,
)

CORPUS = [
    (0, "hash join beats sort merge join on small tables"),
    (1, "the sort merge strategy needs a sort first"),
    (2, "no matches here"),
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


@pytest.fixture(scope="module")
def corpus_tokens(corpus):
    return tokenize_whitespace(corpus)


def test_extract_regex(corpus):
    out = extract_regex(corpus, r"so\w+")
    rows = sorted((r.doc_id, r.span.begin, r.span.end, r.match) for r in out.collect())
    assert rows == [(0, 16, 20, "sort"), (1, 4, 8, "sort"), (1, 32, 36, "sort")]


def test_extract_regex_covered_text_is_exact(docs):
    out = extract_regex(docs, r"\bsp\w+")
    bad = out.filter(~F.col("match").startswith("sp")).count()
    assert bad == 0 and out.count() > 0


def test_extract_dict_single_and_multi_token(spark, corpus, corpus_tokens):
    d = create_dict(spark, ["Sort Merge", "hash join", "sort"])
    toks = corpus_tokens
    out = extract_dict(toks, d)
    got = sorted(
        (r.doc_id, r.token_span.begin_token, r.token_span.end_token) for r in out.collect()
    )
    # doc0: 'hash join'@[0,2), 'sort merge'@[3,5), 'sort'@[3,4)
    # doc1: 'sort merge'@[1,3), 'sort'@[1,2), 'sort'@[6,7)
    assert got == sorted([(0, 0, 2), (0, 3, 5), (0, 3, 4), (1, 1, 3), (1, 1, 2), (1, 6, 7)])


def test_extract_dict_char_spans(spark, corpus, corpus_tokens):
    d = create_dict(spark, ["sort merge"])
    out = extract_dict(corpus_tokens, d).join(corpus, "doc_id").select(
        "doc_id",
        F.expr("substring(text, span.begin+1, span.end - span.begin)").alias("cut"),
    )
    for r in out.collect():
        assert r.cut.lower() == "sort merge"


def test_extract_dict_repeated_token_entry(spark):
    docs = spark.createDataFrame([(0, "go go go stop")], "doc_id long, text string")
    toks = tokenize_whitespace(docs)
    d = create_dict(spark, ["go go"])
    got = sorted(
        (r.token_span.begin_token, r.token_span.end_token)
        for r in extract_dict(toks, d).collect()
    )
    assert got == [(0, 2), (1, 3)]  # overlapping matches both found


def test_extract_regex_tok_windows(spark, corpus, corpus_tokens):
    toks = corpus_tokens.join(corpus.select("doc_id", "text"), "doc_id")
    out = extract_regex_tok(toks, r"sort( \w+)?", min_len=1, max_len=2)
    got = sorted((r.doc_id, r.match) for r in out.collect())
    assert (0, "sort") in got and (0, "sort merge") in got
    assert (1, "sort first") in got
    # overlapping matches allowed (reference semantics)
    assert len(got) >= 5


def test_extract_split(spark):
    docs = spark.createDataFrame(
        [(0, "aaa SPLIT bbb SPLIT ccc"), (1, "no split points")],
        "doc_id long, text string",
    )
    points = extract_regex(docs, r"SPLIT").select("doc_id", "span")
    out = extract_split(docs, points).join(docs, "doc_id").select(
        "doc_id",
        F.expr("substring(text, span.begin+1, span.end - span.begin)").alias("cut"),
    )
    got = sorted((r.doc_id, r.cut) for r in out.collect())
    assert got == [(0, "aaa "), (0, " bbb "), (0, " ccc"), (1, "no split points")] or \
           got == sorted([(0, "aaa "), (0, " bbb "), (0, " ccc"), (1, "no split points")])


def test_person_names_example(spark):
    """The examples/ walkthrough (reference Market Intelligence tutorial
    shape) end-to-end: full names beat their component matches."""
    import os
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "examples")
    )
    from person_names import person_names

    out = person_names(
        spark, os.path.join(os.path.dirname(__file__), "data", "sample.conll")
    ).collect()
    got = {(r.doc_id, r.person) for r in out}
    assert got == {(0, "Alice Jones"), (1, "Bob")}


def test_extract_regex_native_matches_udf_twin(spark):
    """The JVM-side offset-recovery variant must agree exactly with the
    Python-re UDF implementation on a real corpus (ASCII pattern, where
    the Java and Python dialects coincide), and every span must satisfy
    the covered-text invariant."""
    from text_extensions_for_pandas_spark.operators.extract import (
        extract_regex,
        extract_regex_native,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pat = r"\bsp\w+"
    udf_rows = sorted(
        (r.doc_id, r.span.begin, r.span.end, r.match)
        for r in extract_regex(docs, pat).collect()
    )
    native_rows = sorted(
        (r.doc_id, r.span.begin, r.span.end, r.match)
        for r in extract_regex_native(docs, pat).collect()
    )
    assert native_rows == udf_rows and len(native_rows) > 0
    # covered-text invariant: substring(text, begin+1, end-begin) == match
    out = extract_regex_native(docs, pat)
    bad = (
        out.join(docs, "doc_id")
        .where(
            F.expr(
                "substring(text, span.begin + 1, span.end - span.begin) != match"
            )
        )
        .count()
    )
    assert bad == 0
