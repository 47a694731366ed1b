"""ExactSubstr removal (Lee et al. ACL'22): keep-first semantics, island
merging, and text-rebuild invariants of
``dedup.remove_repeated_substrings``."""

from pyspark.sql import functions as F

from text_extensions_for_pandas_spark.operators.dedup import (
    remove_repeated_substrings,
    repeated_ngram_spans,
)


def _clean(spark, rows, k=20):
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    return {
        r["doc_id"]: r
        for r in remove_repeated_substrings(docs, k=k).collect()
    }


def test_canonical_first_occurrence_is_kept_intact(spark):
    shared = "THIS IS A SHARED PASSAGE OF TEXT"
    rows = [
        (1, f"unique alpha text {shared} tail one"),
        (2, f"other beta body {shared} tail two"),
        (3, "totally unrelated content with no duplicate passage at all"),
    ]
    got = _clean(spark, rows)
    # doc 1 holds every gram's first occurrence: untouched
    assert got[1]["clean_text"] == rows[0][1]
    assert got[1]["n_cut_spans"] == 0 and got[1]["n_cut_chars"] == 0
    # doc 2 loses the shared passage (k-gram granularity may widen the
    # cut into the divergence boundary, never past it)
    assert shared not in got[2]["clean_text"]
    assert got[2]["n_cut_spans"] == 1
    assert got[2]["clean_text"].startswith("other beta body")
    # doc 3 shares nothing: untouched
    assert got[3]["clean_text"] == rows[2][1]


def test_within_document_repetition_is_cut(spark):
    passage = "abcdefghijklmnopqrstuvwxyz"  # 26 chars > k=20
    rows = [(1, f"{passage} filler middle {passage} done")]
    got = _clean(spark, rows)
    # the second occurrence is non-canonical even inside the same doc
    assert got[1]["n_cut_spans"] == 1
    assert got[1]["clean_text"].count(passage) == 1


def test_cut_chars_match_text_shrinkage(spark):
    rows = [
        (1, "AAAA BBBB CCCC DDDD EEEE FFFF GGGG unique-one suffix-a"),
        (2, "AAAA BBBB CCCC DDDD EEEE FFFF GGGG unique-two suffix-b"),
        (3, "AAAA BBBB CCCC DDDD EEEE FFFF GGGG unique-three last"),
    ]
    got = _clean(spark, rows)
    for doc_id, text in rows:
        r = got[doc_id]
        assert len(text) - len(r["clean_text"]) == r["n_cut_chars"]
        assert r["n_cut_spans"] <= 1 or r["n_cut_chars"] >= 20


def test_every_doc_returns_exactly_once(spark):
    rows = [(i, f"doc number {i} with some distinct words {i}") for i in range(8)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = remove_repeated_substrings(docs, k=20)
    assert out.count() == 8
    assert out.select("doc_id").distinct().count() == 8


def test_cuts_cover_the_reported_repeated_spans(spark):
    """Positions flagged by the removal are a superset relationship with
    repeated_ngram_spans' cross-doc report: every cross-doc repeated span
    in a NON-canonical doc is inside some cut."""
    shared = "THE COMMON LICENSE HEADER BLOCK USED EVERYWHERE"
    rows = [
        (1, f"{shared} body one of the first document"),
        (2, f"{shared} body two of the second document"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    cleaned = {
        r["doc_id"]: r for r in remove_repeated_substrings(docs, k=20).collect()
    }
    spans = repeated_ngram_spans(docs, k=20, min_docs=2).collect()
    # doc 2's reported repeated span chars must be gone from its clean text
    doc2_spans = [(r["begin"], r["end"]) for r in spans if r["doc_id"] == 2]
    assert doc2_spans, "fixture must produce a cross-doc repeated span"
    assert shared not in cleaned[2]["clean_text"]
    assert cleaned[2]["n_cut_chars"] > 0
