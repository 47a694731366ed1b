"""Tests for connected components, repetition metrics, decontamination,
and TF-IDF top terms (beyond-reference training-pipeline surface)."""

import pytest
import pyspark.sql.functions as F

from tests.conftest import rows_to_tuples
from text_extensions_for_pandas_spark.functions.text import repetition_metrics
from text_extensions_for_pandas_spark.operators.dedup import (
    contamination_overlap,
)
from text_extensions_for_pandas_spark.operators.graph import (
    connected_components,
)
from text_extensions_for_pandas_spark.operators.search import tfidf_top_terms


def test_connected_components_two_clusters_and_chain(spark):
    # chain 1-2-3-4 (diameter > 1 forces multiple propagation rounds)
    # plus a separate pair 10-11
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11)], ["doc_a", "doc_b"]
    )
    got = rows_to_tuples(connected_components(edges), "node", "component")
    assert got == [(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10)]


def test_connected_components_self_loop_and_duplicate_edges(spark):
    edges = spark.createDataFrame(
        [(5, 5), (7, 8), (8, 7), (7, 8)], ["doc_a", "doc_b"]
    )
    got = rows_to_tuples(connected_components(edges), "node", "component")
    assert got == [(5, 5), (7, 7), (8, 7)]


def test_repetition_metrics_hand_computed(spark):
    # bigrams of "a b a b a": [a b, b a, a b, b a] -> counts {a b:2, b a:2}
    # top fraction 2/4, duplicate fraction 4/4
    docs = spark.createDataFrame(
        [(1, "a b a b a"), (2, "x y z"), (3, "solo")], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: (r["n_ngrams"], r["top_ngram_frac"], r["dup_ngram_frac"])
        for r in repetition_metrics(docs, n=2).collect()
    }
    assert got[1] == (4, 0.5, 1.0)
    assert got[2] == (2, 0.5, 0.0)
    assert 3 not in got  # single word: no bigrams, no row


def test_contamination_overlap_flags_leaked_ngrams(spark):
    eval_docs = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        ["doc_id", "text"],
    )
    train = spark.createDataFrame(
        [
            (1, "preamble the quick brown fox jumps afterwards"),
            (2, "totally unrelated content with no overlap at all"),
        ],
        ["doc_id", "text"],
    )
    got = rows_to_tuples(
        contamination_overlap(train, eval_docs, shingle_n=5),
        "doc_id",
        "n_shared_ngrams",
        "n_eval_docs",
    )
    # doc 1 shares exactly one 5-gram: "the quick brown fox jumps"
    assert got == [(1, 1, 1)]


def test_tfidf_top_terms_ranks_distinctive_terms_first(spark):
    docs = spark.createDataFrame(
        [
            (1, "common common zebra"),
            (2, "common common yak"),
            (3, "common common common"),
        ],
        ["doc_id", "text"],
    )
    out = tfidf_top_terms(docs, top_k=2)
    top = {
        r["doc_id"]: r["term"]
        for r in out.filter(F.col("rank") == 1).collect()
    }
    # the doc-unique term must outrank the corpus-wide one
    assert top[1] == "zebra" and top[2] == "yak"
    # doc 3 has only "common" (idf = ln(1) = 0) -> still emitted, rank 1
    assert top[3] == "common"


def test_read_text_and_jsonl_corpus(spark, tmp_path):
    from text_extensions_for_pandas_spark.sources import corpus as docs

    p = tmp_path / "shard1.txt"
    p.write_text("hello world\n\nsecond doc here\nhello world\n")
    out = docs.read_text_corpus(spark, str(p)).collect()
    texts = sorted(r.text for r in out)
    assert texts == ["hello world", "hello world", "second doc here"]
    # content-hash ids: identical lines share an id, all non-negative
    assert all(r.doc_id >= 0 for r in out)
    assert len({r.doc_id for r in out}) == 2
    # unique_ids salts with in-file position
    uniq = docs.read_text_corpus(spark, str(p), unique_ids=True).collect()
    assert len({r.doc_id for r in uniq}) == 3
    # reruns are deterministic
    again = {r.doc_id for r in docs.read_text_corpus(spark, str(p), unique_ids=True).collect()}
    assert {r.doc_id for r in uniq} == again

    j = tmp_path / "shard2.jsonl"
    j.write_text('{"text": "json doc one", "lang": "en"}\n{"text": "json doc two", "lang": "de"}\n')
    jout = docs.read_jsonl_corpus(spark, str(j), keep_fields=["lang"]).collect()
    assert sorted(r.text for r in jout) == ["json doc one", "json doc two"]
    assert sorted(r.lang for r in jout) == ["de", "en"]
    assert all(r.n_chars == len(r.text) for r in jout)


def _wet_record(warc_type, text, url="", rec_id="<urn:uuid:1>"):
    payload = text.encode("utf-8")
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {warc_type}\r\n"
        + (f"WARC-Target-URI: {url}\r\n" if url else "")
        + f"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        f"WARC-Record-ID: {rec_id}\r\n"
        f"Content-Length: {len(payload)}\r\n"
        f"\r\n"
    ).encode("utf-8")
    return head + payload + b"\r\n\r\n"


def test_read_wet_corpus(spark, tmp_path):
    """Common Crawl WET shards: conversion records become documents
    (warcinfo skipped), gzipped and plain shards both parse, malformed
    tails are tolerated, and doc ids are deterministic content hashes."""
    import gzip

    from text_extensions_for_pandas_spark.sources import corpus as docs

    wet = (
        _wet_record("warcinfo", "robots: obey\r\n")
        + _wet_record(
            "conversion",
            "First page text.\nSecond line.",
            url="http://a.example/x",
            rec_id="<urn:uuid:a>",
        )
        + _wet_record(
            "conversion",
            "Another document body",
            url="http://b.example/y",
            rec_id="<urn:uuid:b>",
        )
        + b"TRAILING GARBAGE NOT A RECORD"
    )
    (tmp_path / "shard0.warc.wet").write_bytes(wet)
    # gzipped shard with one more record
    gz = _wet_record(
        "conversion", "Gzipped shard doc", url="http://c.example/z",
        rec_id="<urn:uuid:c>",
    )
    (tmp_path / "shard1.warc.wet.gz").write_bytes(gzip.compress(gz))

    out = docs.read_wet_corpus(spark, str(tmp_path)).collect()
    by_url = {r.url: r for r in out}
    assert set(by_url) == {
        "http://a.example/x", "http://b.example/y", "http://c.example/z"
    }
    a = by_url["http://a.example/x"]
    assert a.text == "First page text.\nSecond line."
    assert a.n_chars == len(a.text)
    assert a.warc_date == "2024-01-01T00:00:00Z"
    assert a.record_id == "<urn:uuid:a>"
    assert by_url["http://c.example/z"].text == "Gzipped shard doc"
    assert all(r.doc_id >= 0 for r in out)
    # deterministic across reruns
    again = {r.doc_id for r in docs.read_wet_corpus(spark, str(tmp_path)).collect()}
    assert {r.doc_id for r in out} == again
    # a truncated final record yields its available prefix, earlier
    # records unharmed
    cut = wet[: len(wet) - len(b"TRAILING GARBAGE NOT A RECORD") - 30]
    (tmp_path / "shard0.warc.wet").write_bytes(cut)
    (tmp_path / "shard1.warc.wet.gz").unlink()
    cut_out = docs.read_wet_corpus(spark, str(tmp_path)).collect()
    assert "http://a.example/x" in {r.url for r in cut_out}


def test_incremental_candidates_match_full_recompute(spark, tmp_path):
    from text_extensions_for_pandas_spark.operators.dedup import (
        doc_shingles,
        incremental_candidates,
        lsh_bands,
        minhash_candidates,
        minhash_signatures,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    existing = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)

    # build + persist the index for the existing half, as an append
    # pipeline would
    idx_path = str(tmp_path / "band_index")
    lsh_bands(
        minhash_signatures(doc_shingles(existing, distinct=False))
    ).write.parquet(idx_path)
    idx = spark.read.parquet(idx_path)

    got = {
        (r.new_doc, r.existing_doc)
        for r in incremental_candidates(new, idx).collect()
    }
    # ground truth: full-corpus LSH candidates restricted to cross pairs
    full = minhash_candidates(docs)
    want = {
        (r.doc_a, r.doc_b) if r.doc_a % 2 == 1 else (r.doc_b, r.doc_a)
        for r in full.collect()
        if (r.doc_a % 2) != (r.doc_b % 2)
    }
    assert got == want and len(got) > 0


def test_repeated_ngram_spans_merge_and_boundaries(spark):
    from text_extensions_for_pandas_spark.operators.dedup import (
        repeated_ngram_spans,
    )

    shared = "0123456789abcdefghij"  # exactly k=20 chars, shared by 1 and 2
    docs = spark.createDataFrame(
        [
            (1, "XX" + shared + "YYY"),
            (2, "AAAA" + shared + "B" + shared),
            (3, "completely unique text with nothing repeated at all"),
        ],
        ["doc_id", "text"],
    )
    got = rows_to_tuples(
        repeated_ngram_spans(docs, k=20, min_docs=2),
        "doc_id",
        "begin",
        "end",
        "n_grams",
    )
    # doc 1: one hit at pos 2 -> [2, 22); doc 2: hits at 4 and 25 — the
    # second starts after end(4+20=24)? no: 25 > 24 so two islands
    assert got == [(1, 2, 22, 1), (2, 4, 24, 1), (2, 25, 45, 1)]


def test_repeated_ngram_spans_overlapping_hits_union(spark):
    from text_extensions_for_pandas_spark.operators.dedup import (
        repeated_ngram_spans,
    )

    # 21-char shared substring -> two overlapping 20-gram hits (pos 0, 1)
    # in each doc, merging into one span of length 21
    shared = "0123456789abcdefghijK"
    docs = spark.createDataFrame(
        [(1, shared), (2, shared + "zz")], ["doc_id", "text"]
    )
    got = rows_to_tuples(
        repeated_ngram_spans(docs, k=20, min_docs=2),
        "doc_id",
        "begin",
        "end",
        "n_grams",
    )
    assert got == [(1, 0, 21, 2), (2, 0, 21, 2)]


def test_kmeans_fit_converges_and_is_deterministic(spark):
    import math

    from text_extensions_for_pandas_spark.operators.similarity import (
        ivf_assign,
        kmeans_fit,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

    def sse(centroids):
        a = ivf_assign(emb, centroids)
        joined = a.join(
            centroids.select(
                F.col("centroid_id").alias("cluster_id"),
                F.col("embedding").alias("__c"),
            ),
            "cluster_id",
        )
        row = joined.select(
            F.aggregate(
                F.zip_with(
                    "embedding",
                    "__c",
                    lambda x, y: (x.cast("double") - y)
                    * (x.cast("double") - y),
                ),
                F.lit(0.0),
                lambda acc, z: acc + z,
            ).alias("d")
        ).agg(F.sum("d")).collect()[0]
        return row[0]

    c1 = kmeans_fit(emb, k=8, iterations=1)
    c5 = kmeans_fit(emb, k=8, iterations=5)
    assert sse(c5) <= sse(c1) + 1e-9  # Lloyd's never increases SSE
    # deterministic across runs (decimal sums, fixed init)
    a = sorted(map(tuple, (r.embedding for r in c5.collect())))
    b = sorted(
        map(tuple, (r.embedding for r in kmeans_fit(emb, k=8, iterations=5).collect()))
    )
    assert a == b
    assert c5.count() == 8


def test_near_dup_pairs_validates_precomputed_shingles(spark, docs):
    import pytest

    from text_extensions_for_pandas_spark.operators.dedup import (
        doc_shingles,
        near_dup_pairs,
    )

    sample = docs.limit(20)
    sh5 = doc_shingles(sample, shingle_n=5)
    with pytest.raises(ValueError, match="shingle_n=5"):
        near_dup_pairs(sample, shingle_n=3, shingles=sh5)
    with pytest.raises(ValueError, match="missing columns"):
        near_dup_pairs(sample, shingles=sample.select("doc_id"))
    # matching width passes validation and runs
    near_dup_pairs(sample, shingle_n=5, shingles=sh5).count()


def test_dedup_paragraphs_keep_first_and_rebuild(spark):
    # doc 1 owns paragraphs A, B; doc 2 repeats B (deleted) around its own
    # C; doc 3 is entirely paragraphs seen earlier (empty rebuild); doc 4
    # repeats its own first paragraph within the same document.
    from text_extensions_for_pandas_spark.operators.dedup import (
        dedup_paragraphs,
    )

    docs = spark.createDataFrame(
        [
            (1, "aaa\nbbb"),
            (2, "bbb\nccc"),
            (3, "aaa\nccc"),
            (4, "ddd\nddd\neee"),
        ],
        ["doc_id", "text"],
    )
    got = rows_to_tuples(
        dedup_paragraphs(docs),
        "doc_id", "n_paras", "n_kept", "dedup_text",
    )
    assert got == [
        (1, 2, 2, "aaa\nbbb"),
        (2, 2, 1, "ccc"),
        (3, 2, 0, ""),
        (4, 3, 2, "ddd\neee"),
    ]


def test_dedup_paragraphs_blank_runs_and_empty_doc(spark):
    from text_extensions_for_pandas_spark.operators.dedup import (
        dedup_paragraphs,
    )

    docs = spark.createDataFrame(
        [(1, "x\n\n\ny"), (2, "")], ["doc_id", "text"]
    )
    got = rows_to_tuples(
        dedup_paragraphs(docs),
        "doc_id", "n_paras", "n_kept", "dedup_text",
    )
    # \n+ collapses blank runs; the empty doc yields zero paragraphs but
    # still gets its output row
    assert got == [(1, 2, 2, "x\ny"), (2, 0, 0, "")]


def test_dedup_paragraphs_incremental_matches_full_recompute(spark):
    """Processing the corpus in doc-id-ordered batches through the
    persisted-index variant must reproduce the one-shot batch operator
    exactly (keep-first is global because earlier batches own smaller
    doc ids)."""
    from text_extensions_for_pandas_spark.operators.dedup import (
        dedup_paragraphs,
        dedup_paragraphs_incremental,
    )

    rows = [
        (1, "aaa\nbbb"),
        (2, "bbb\nccc"),
        (3, "aaa\nccc"),
        (4, "ddd\nddd\neee"),
        (5, "eee\nfff\nbbb"),
        (6, ""),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    want = sorted(
        rows_to_tuples(
            dedup_paragraphs(docs), "doc_id", "n_paras", "n_kept", "dedup_text"
        )
    )
    got, index = [], None
    for lo, hi in [(1, 2), (3, 4), (5, 6)]:
        batch = docs.filter(F.col("doc_id").between(lo, hi))
        out, delta = dedup_paragraphs_incremental(batch, index)
        # append-only index maintenance, as the parquet ingest path does
        index = (
            delta if index is None else index.union(delta)
        ).localCheckpoint()
        got += rows_to_tuples(out, "doc_id", "n_paras", "n_kept", "dedup_text")
    assert sorted(got) == want


def test_dedup_paragraphs_randomized_differential(spark):
    """200 random documents built from a tiny paragraph alphabet (high
    collision rate) against a pure-Python keep-first transcription."""
    import random

    rng = random.Random(7)
    alphabet = [f"p{i}" for i in range(12)]
    rows = [
        (i, "\n".join(rng.choice(alphabet) for _ in range(rng.randint(0, 6))))
        for i in range(200)
    ]

    seen, want = set(), {}
    for doc_id, text in rows:  # rows are in doc_id order
        paras = [p for p in text.split("\n") if p]
        kept = []
        for p in paras:
            if p not in seen:
                seen.add(p)
                kept.append(p)
        want[doc_id] = (len(paras), len(kept), "\n".join(kept))

    from text_extensions_for_pandas_spark.operators.dedup import (
        dedup_paragraphs,
    )

    got = {
        r["doc_id"]: (r["n_paras"], r["n_kept"], r["dedup_text"])
        for r in dedup_paragraphs(
            spark.createDataFrame(rows, ["doc_id", "text"])
        ).collect()
    }
    assert got == want


def test_soft_dedup_weights(spark):
    docs = spark.createDataFrame(
        [(i,) for i in range(1, 8)], ["doc_id"]
    )
    # cluster {1,2,3} and pair {5,6}; 4 and 7 are singletons
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], ["doc_a", "doc_b"]
    )
    from text_extensions_for_pandas_spark.operators.graph import (
        soft_dedup_weights,
    )

    got = {
        r["doc_id"]: (r["component"], r["cluster_size"], r["weight"])
        for r in soft_dedup_weights(docs, pairs).collect()
    }
    assert got[1] == (1, 3, pytest.approx(1 / 3))
    assert got[2] == (1, 3, pytest.approx(1 / 3))
    assert got[3] == (1, 3, pytest.approx(1 / 3))
    assert got[5] == (5, 2, pytest.approx(0.5))
    assert got[6] == (5, 2, pytest.approx(0.5))
    assert got[4] == (4, 1, 1.0) and got[7] == (7, 1, 1.0)
    # total training mass = number of distinct contents
    assert sum(w for _, _, w in got.values()) == pytest.approx(4.0)


def test_lsh_tuning_matches_scurve_intuition():
    from text_extensions_for_pandas_spark.operators.dedup import lsh_tuning

    # higher thresholds want more rows per band (sharper S-curve knee)
    (_, r_low), (_, r_high) = lsh_tuning(0.5, 16), lsh_tuning(0.9, 16)
    assert r_high > r_low
    # the product always factorizes n_hashes exactly
    for t in (0.3, 0.5, 0.7, 0.9):
        b, r = lsh_tuning(t, 128)
        assert b * r == 128
    # recall bias flattens the curve: more bands, fewer rows
    b_bal, r_bal = lsh_tuning(0.8, 64)
    b_rec, r_rec = lsh_tuning(0.8, 64, fn_weight=20.0)
    assert r_rec <= r_bal and b_rec >= b_bal
    # invalid thresholds rejected
    import pytest as _pt
    with _pt.raises(ValueError):
        lsh_tuning(1.0, 16)


def test_remove_boilerplate_group_scoped(spark):
    # "nav" repeats across docs 1+2 of source s1 -> removed EVERYWHERE in
    # s1, including its first occurrence (contrast dedup_paragraphs'
    # keep-first); the same line in source s2 appears in only one doc
    # there, so s2 keeps it.  Repeats within a SINGLE doc (doc 4) don't
    # cross the distinct-doc threshold.
    from text_extensions_for_pandas_spark.operators.dedup import (
        boilerplate_lines,
        remove_boilerplate,
    )

    docs = spark.createDataFrame(
        [
            (1, "s1", "nav\nalpha"),
            (2, "s1", "nav\nbeta"),
            (3, "s2", "nav\ngamma"),
            (4, "s2", "dup\ndup\ndelta"),
        ],
        ["doc_id", "source", "text"],
    )
    bp = rows_to_tuples(
        boilerplate_lines(docs, min_docs=2, group_col="source"),
        "source", "n_docs",
    )
    assert bp == [("s1", 2)]
    got = rows_to_tuples(
        remove_boilerplate(docs, min_docs=2, group_col="source"),
        "doc_id", "n_lines", "n_kept", "clean_text",
    )
    assert got == [
        (1, 2, 1, "alpha"),
        (2, 2, 1, "beta"),
        (3, 2, 2, "nav\ngamma"),
        (4, 3, 3, "dup\ndup\ndelta"),
    ]


def test_remove_boilerplate_corpus_wide_and_precomputed(spark):
    from text_extensions_for_pandas_spark.operators.dedup import (
        boilerplate_lines,
        remove_boilerplate,
    )

    docs = spark.createDataFrame(
        [(1, "footer\na"), (2, "footer\nb"), (3, "footer")],
        ["doc_id", "text"],
    )
    # corpus-wide (no group): footer hits 3 distinct docs; doc 3 empties
    got = rows_to_tuples(
        remove_boilerplate(docs, min_docs=3),
        "doc_id", "n_lines", "n_kept", "clean_text",
    )
    assert got == [(1, 2, 1, "a"), (2, 2, 1, "b"), (3, 1, 0, "")]
    # a precomputed static table produces the identical result (the
    # stream-static split: build once, apply as a join)
    bp = boilerplate_lines(docs, min_docs=3)
    again = rows_to_tuples(
        remove_boilerplate(docs, boilerplate=bp),
        "doc_id", "n_lines", "n_kept", "clean_text",
    )
    assert again == got


def test_containment_catches_subset_duplication(spark):
    # doc 2 is doc 1's opening quoted whole inside much longer text:
    # Jaccard is small, but containment of the short side is 1.0
    from text_extensions_for_pandas_spark.operators.dedup import (
        containment_for_pairs,
        doc_shingles,
    )

    long_text = "a b c d " + " ".join(f"w{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, long_text), (2, "a b c d")], ["doc_id", "text"]
    )
    sh = doc_shingles(docs, shingle_n=3)
    pairs = spark.createDataFrame([(1, 2)], ["doc_a", "doc_b"])
    row = containment_for_pairs(pairs, sh).collect()[0]
    assert row["containment_b"] == 1.0          # all of B's shingles in A
    assert row["containment_a"] < 0.1           # A barely overlaps
    assert row["jaccard"] < 0.1                 # symmetric score misses it
    # and the jaccard column agrees with jaccard_for_pairs exactly
    from text_extensions_for_pandas_spark.operators.dedup import jaccard_for_pairs

    j = jaccard_for_pairs(pairs, sh).collect()[0]
    assert j["jaccard"] == row["jaccard"]


def test_dedup_paragraphs_document_scope(spark):
    # doc 1 repeats its own paragraph (collapses); doc 2 repeats doc 1's
    # paragraph (SURVIVES under document scope, unlike corpus scope)
    from text_extensions_for_pandas_spark.operators.dedup import (
        dedup_paragraphs,
    )

    docs = spark.createDataFrame(
        [(1, "aaa\nbbb\naaa"), (2, "aaa\nccc")], ["doc_id", "text"]
    )
    got = rows_to_tuples(
        dedup_paragraphs(docs, scope="document"),
        "doc_id", "n_paras", "n_kept", "dedup_text",
    )
    assert got == [(1, 3, 2, "aaa\nbbb"), (2, 2, 2, "aaa\nccc")]
    # corpus scope on the same input removes doc 2's repeat
    corpus = rows_to_tuples(
        dedup_paragraphs(docs),
        "doc_id", "n_paras", "n_kept", "dedup_text",
    )
    assert corpus == [(1, 3, 2, "aaa\nbbb"), (2, 2, 1, "ccc")]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="scope"):
        dedup_paragraphs(docs, scope="line")


def test_fingerprint_overlap_detects_copied_run(spark):
    # doc 2 contains doc 1's exact 60-char run inside unrelated text:
    # winnowing guarantees shared fingerprints from the copied run, and
    # the ubiquitous-fingerprint filter must not kill the real signal
    from text_extensions_for_pandas_spark.operators.dedup import (
        fingerprint_overlap_pairs,
    )

    copied = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            (1, copied + " unique first tail xyzzy"),
            (2, "totally different opening here " + copied),
            (3, "no shared content with anyone at all whatsoever plugh"),
        ],
        ["doc_id", "text"],
    )
    out = fingerprint_overlap_pairs(docs, min_shared=3, max_docs_per_fp=10)
    rows = out.collect()
    assert [(r["doc_a"], r["doc_b"]) for r in rows] == [(1, 2)]
    assert rows[0]["shared"] >= 3
    assert 0 < rows[0]["overlap"] <= 1.0


def test_contamination_report_multi_benchmark(spark):
    from text_extensions_for_pandas_spark.operators.dedup import (
        contamination_overlap,
        contamination_report,
    )

    leak_a = "alpha beta gamma delta epsilon zeta"
    leak_b = "one two three four five six"
    ev = spark.createDataFrame(
        [(100, leak_a, "benchA"), (101, leak_b, "benchB"),
         (102, "nothing shared here at all folks", "benchB")],
        ["doc_id", "text", "benchmark"],
    )
    docs = spark.createDataFrame(
        [
            (1, f"intro {leak_a} outro words here"),      # hits benchA only
            (2, f"start {leak_b} finish {leak_a} end"),   # hits both
            (3, "completely clean document text body"),   # hits none
        ],
        ["doc_id", "text"],
    )
    out = {
        (r["doc_id"], r["benchmark"]): (r["n_shared_ngrams"], r["n_eval_docs"])
        for r in contamination_report(docs, ev, shingle_n=5).collect()
    }
    assert set(out) == {(1, "benchA"), (2, "benchA"), (2, "benchB")}
    assert out[(1, "benchA")][1] == 1
    # single-set operator agrees when restricted to one benchmark
    single = {
        r["doc_id"]: (r["n_shared_ngrams"], r["n_eval_docs"])
        for r in contamination_overlap(
            docs, ev.filter("benchmark = 'benchA'"), shingle_n=5
        ).collect()
    }
    assert single == {1: out[(1, "benchA")], 2: out[(2, "benchA")]}


# ---------------------------------------------------------------------------
# pagerank
# ---------------------------------------------------------------------------

def _numpy_pagerank(edges, damping, iterations):
    """Dense reference: same semantics as operators.graph.pagerank
    (weighted out-edge split, dangling mass redistributed uniformly)."""
    import numpy as np

    nodes = sorted({u for u, _, _ in edges} | {v for _, v, _ in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    w = np.zeros((n, n))
    for u, v, wt in edges:
        w[idx[u], idx[v]] += wt
    out = w.sum(axis=1)
    r = np.full(n, 1.0 / n)
    for _ in range(iterations):
        contrib = np.zeros(n)
        dang = 0.0
        for i in range(n):
            if out[i] > 0:
                contrib += r[i] * w[i] / out[i]
            else:
                dang += r[i]
        r = (1 - damping) / n + damping * (contrib + dang / n)
    return {nodes[i]: r[i] for i in range(n)}


def test_pagerank_matches_numpy_power_iteration(spark):
    import random

    from text_extensions_for_pandas_spark.operators.graph import pagerank

    rng = random.Random(42)
    hosts = [f"h{i}" for i in range(12)]
    edges = []
    for _ in range(40):
        u, v = rng.sample(hosts, 2)
        edges.append((u, v, float(rng.randint(1, 5))))
    df = spark.createDataFrame(edges, "src string, dst string, w double")
    got = dict(
        rows_to_tuples(
            pagerank(df, weight_col="w", damping=0.85, iterations=8),
            "node",
            "pagerank",
        )
    )
    want = _numpy_pagerank(edges, 0.85, 8)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, k
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_dangling_and_unweighted(spark):
    from text_extensions_for_pandas_spark.operators.graph import pagerank

    # star into a sink: the sink is dangling, mass must still sum to 1
    edges = [("a", "z", 1.0), ("b", "z", 1.0), ("c", "z", 1.0)]
    df = spark.createDataFrame(edges, "src string, dst string, w double")
    got = dict(rows_to_tuples(pagerank(df, iterations=6), "node", "pagerank"))
    want = _numpy_pagerank(edges, 0.85, 6)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12, k
    assert got["z"] > got["a"] == got["b"] == got["c"]
    assert abs(sum(got.values()) - 1.0) < 1e-12


def test_pagerank_multi_edge_collapse_and_determinism(spark):
    from text_extensions_for_pandas_spark.operators.graph import pagerank

    # duplicate unweighted edges collapse to one (src,dst) pair whose
    # weight is the multiplicity — same as the numpy model's += path
    edges = [("a", "b", 1.0), ("a", "b", 1.0), ("a", "c", 1.0),
             ("b", "a", 1.0), ("c", "b", 1.0)]
    df = spark.createDataFrame(edges, "src string, dst string, w double")
    r1 = dict(rows_to_tuples(pagerank(df, iterations=9), "node", "pagerank"))
    r2 = dict(rows_to_tuples(pagerank(df, iterations=9), "node", "pagerank"))
    assert r1 == r2  # bit-identical across runs
    want = _numpy_pagerank(edges, 0.85, 9)
    for k in want:
        assert abs(r1[k] - want[k]) < 1e-12, k


def test_pagerank_validates_params(spark):
    from text_extensions_for_pandas_spark.operators.graph import pagerank

    df = spark.createDataFrame([("a", "b", 1.0)], "src string, dst string, w double")
    with pytest.raises(ValueError):
        pagerank(df, damping=1.0)
    with pytest.raises(ValueError):
        pagerank(df, iterations=0)


def test_durable_band_index_probe_append_cycle(spark, tmp_path):
    """write -> probe -> append -> probe again: the durable artifact's
    probe must equal the in-memory incremental_candidates path, the
    appended index must equal a from-scratch rebuild byte-for-row, and
    parameters must come from the stored meta (not caller kwargs)."""
    from text_extensions_for_pandas_spark.operators.dedup import (
        append_to_band_index,
        incremental_candidates,
        probe_band_index,
        write_band_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    existing = docs.filter(F.col("doc_id") % 3 != 0)
    batch = docs.filter(F.col("doc_id") % 3 == 0)
    path = str(tmp_path / "bidx")

    write_band_index(existing, path)
    got = {
        (r.new_doc, r.existing_doc)
        for r in probe_band_index(spark, batch, path).collect()
    }
    want = {
        (r.new_doc, r.existing_doc)
        for r in incremental_candidates(
            batch, spark.read.parquet(f"{path}/bands")
        ).collect()
    }
    assert got == want and len(got) > 0

    # append, then the index must equal a full rebuild over the union
    append_to_band_index(spark, batch, path)
    path2 = str(tmp_path / "bidx_rebuild")
    write_band_index(docs, path2)
    appended = sorted(
        tuple(r)
        for r in spark.read.parquet(f"{path}/bands")
        .select("doc_id", "band", "band_hash")
        .collect()
    )
    rebuilt = sorted(
        tuple(r)
        for r in spark.read.parquet(f"{path2}/bands")
        .select("doc_id", "band", "band_hash")
        .collect()
    )
    assert appended == rebuilt

    # a post-append probe sees the union (self-pairs filtered)
    probe2 = probe_band_index(
        spark, docs.filter(F.col("doc_id") % 7 == 0), path
    )
    assert probe2.filter(F.col("new_doc") == F.col("existing_doc")).count() == 0

    # partition layout: one directory per band
    import os

    bands_dirs = [
        d for d in os.listdir(f"{path}/bands") if d.startswith("band=")
    ]
    assert sorted(bands_dirs) == ["band=0", "band=1"]


def test_band_index_precomputed_bands_parity(spark, tmp_path):
    """The probe-then-append composition's shared hash pass: a persisted
    compute_band_signatures frame handed to BOTH probe and append must
    reproduce the compute-internally results exactly, and a frame built
    under different parameters must be rejected (silent parameter drift
    would join as noise)."""
    import pytest

    from text_extensions_for_pandas_spark.operators.dedup import (
        append_to_band_index,
        compute_band_signatures,
        probe_band_index,
        write_band_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    existing = docs.filter(F.col("doc_id") % 3 != 0)
    batch = docs.filter(F.col("doc_id") % 3 == 0)
    path = str(tmp_path / "bidx_pre")
    path_ref = str(tmp_path / "bidx_ref")
    write_band_index(existing, path)
    write_band_index(existing, path_ref)

    bands = compute_band_signatures(spark, batch, path).localCheckpoint()
    got = {
        (r.new_doc, r.existing_doc)
        for r in probe_band_index(spark, batch, path, bands=bands).collect()
    }
    want = {
        (r.new_doc, r.existing_doc)
        for r in probe_band_index(spark, batch, path_ref).collect()
    }
    assert got == want and len(got) > 0

    append_to_band_index(spark, batch, path, bands=bands)
    append_to_band_index(spark, batch, path_ref)
    a = sorted(
        tuple(r)
        for r in spark.read.parquet(f"{path}/bands")
        .select("doc_id", "band", "band_hash")
        .collect()
    )
    b = sorted(
        tuple(r)
        for r in spark.read.parquet(f"{path_ref}/bands")
        .select("doc_id", "band", "band_hash")
        .collect()
    )
    assert a == b

    # parameter drift must be rejected, not silently joined as noise
    path_other = str(tmp_path / "bidx_other_params")
    write_band_index(existing, path_other, shingle_n=4)
    wrong = compute_band_signatures(spark, batch, path_other)
    with pytest.raises(ValueError, match="precomputed bands"):
        probe_band_index(spark, batch, path, bands=wrong)


def test_dedup_keep_best_picks_highest_score(spark):
    from text_extensions_for_pandas_spark.operators.graph import (
        dedup_keep_best,
    )

    docs = spark.createDataFrame(
        [(i, float(s)) for i, s in enumerate([5, 9, 7, 3, 3, 1, 8])],
        "doc_id long, quality double",
    )
    # cluster A = {0,1,2} (winner 1, score 9); cluster B = {3,4}
    # (tie at 3.0 -> lowest id 3); 5 and 6 unclustered
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (3, 4)], "doc_a long, doc_b long"
    )
    kept = sorted(
        r["doc_id"]
        for r in dedup_keep_best(docs, pairs, "quality").collect()
    )
    assert kept == [1, 3, 5, 6]
    # contrast: keep-lowest-id would keep 0, not the best copy 1

    # STRING doc ids: the tie-break must not assume numeric ids (the
    # r9 advice finding — unary minus on a string id throws under ANSI)
    sdocs = spark.createDataFrame(
        [(f"u{i}", float(s)) for i, s in enumerate([5, 9, 7, 3, 3, 1, 8])],
        "doc_id string, quality double",
    )
    spairs = spark.createDataFrame(
        [("u0", "u1"), ("u1", "u2"), ("u3", "u4")],
        "doc_a string, doc_b string",
    )
    skept = sorted(
        r["doc_id"]
        for r in dedup_keep_best(sdocs, spairs, "quality").collect()
    )
    assert skept == ["u1", "u3", "u5", "u6"]


def test_band_index_bucket_layout_and_legacy_compat(spark, tmp_path):
    """New indexes carry band=X/bucket=Y partitions (the DPP handle for
    small-batch probes); probe results are identical to an unbucketed
    legacy index, and a legacy meta (no n_hash_buckets field) still
    probes correctly."""
    import os

    from text_extensions_for_pandas_spark.operators.dedup import (
        doc_shingles,
        lsh_bands,
        minhash_signatures,
        probe_band_index,
        write_band_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    existing = docs.filter(F.col("doc_id") % 3 != 0)
    batch = docs.filter(F.col("doc_id") % 3 == 0)

    path = str(tmp_path / "bucketed")
    write_band_index(existing, path, n_hash_buckets=8)
    band_dirs = sorted(
        d for d in os.listdir(f"{path}/bands") if d.startswith("band=")
    )
    assert band_dirs == ["band=0", "band=1"]
    buckets = [
        d
        for d in os.listdir(f"{path}/bands/band=0")
        if d.startswith("bucket=")
    ]
    assert 1 < len(buckets) <= 8
    got = {
        (r.new_doc, r.existing_doc)
        for r in probe_band_index(spark, batch, path).collect()
    }

    # legacy layout: flat bands + 3-field meta
    legacy = str(tmp_path / "legacy")
    lsh_bands(
        minhash_signatures(doc_shingles(existing, distinct=False))
    ).write.partitionBy("band").parquet(f"{legacy}/bands")
    spark.createDataFrame(
        [(3, 8, 4)], "shingle_n int, n_hashes int, rows_per_band int"
    ).write.parquet(f"{legacy}/meta")
    legacy_got = {
        (r.new_doc, r.existing_doc)
        for r in probe_band_index(spark, batch, legacy).collect()
    }
    assert got == legacy_got and len(got) > 0
