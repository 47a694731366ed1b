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


def test_csv_prep_roundtrip(spark, tmp_path):
    """csv_prep: flat hand-labeling layout (offsets + covered text + vote
    stats + empty correct? column), one re-readable CSV per category."""
    import pyspark.sql.functions as F

    from text_extensions_for_pandas_spark.operators.cleaning import csv_prep

    docs = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "delta epsilon")],
        "doc_id long, text string",
    )
    flagged = spark.createDataFrame(
        [
            (0, (0, 5), "X", 2, True, "in_gold_low_agreement", ["m1", "m2"]),
            (0, (6, 10), "Y", 3, False, "not_in_gold_high_agreement", ["m3"]),
            (1, (0, 5), "X", 1, True, "in_gold_low_agreement", ["m1"]),
        ],
        "doc_id long, span struct<begin:int,end:int>, ent_type string, "
        "count long, in_gold boolean, category string, models array<string>",
    )
    out_dir = str(tmp_path / "csvs")
    out = csv_prep(flagged, docs, output_dir=out_dir)
    rows = out.collect()
    assert [r.covered_text for r in rows] == ["alpha", "beta", "delta"]
    assert all(r["correct?"] == "" for r in rows)
    assert rows[0].models == "m1;m2"  # array flattened for the CSV
    # one directory of CSVs per category, re-readable, row counts add up
    back = spark.read.option("header", "true").csv(f"{out_dir}/*")
    assert back.count() == 3
    assert set(back.columns) == set(out.columns) - {"in_gold"} | {"in_gold"}


def test_prep_and_shard_invariants(spark):
    from text_extensions_for_pandas_spark.operators.pipeline import (
        prep_and_shard,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "source", "text"
    )
    out = prep_and_shard(
        docs,
        sep_regex=" table ",
        join_sep=" ",
        min_words=30,
        required_words=("the", "a", "data", "key", "line", "row"),
        max_docs_per_domain=20,
        max_chars_per_domain=50_000,
        n_shards=4,
        salt="e0",
    ).cache()
    rows = out.collect()
    assert 0 < len(rows) < docs.count()
    # per-domain doc cap holds
    per_src = {}
    for r in rows:
        per_src[r["source"]] = per_src.get(r["source"], 0) + 1
    assert max(per_src.values()) <= 20
    # shard/pos form a dense training order
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) <= {0, 1, 2, 3}
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # emitted text is unique (exact dedup did its job downstream of rebuilds)
    texts = [r["text"] for r in rows]
    assert len(set(texts)) == len(texts)
    # the whole pipeline is a pure function of the input
    again = prep_and_shard(
        docs.repartition(7),
        sep_regex=" table ",
        join_sep=" ",
        min_words=30,
        required_words=("the", "a", "data", "key", "line", "row"),
        max_docs_per_domain=20,
        max_chars_per_domain=50_000,
        n_shards=4,
        salt="e0",
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_prep_and_shard_lang_aware_keeps_multilingual_prose(spark):
    """With lang_aware=True the gate stage dispatches per detected
    language: good Russian and Vietnamese prose SURVIVES the pipeline
    that the default English-list gopher gate silently drops — the
    multilingual cliff closed at the composite level, not just in the
    column function."""
    from text_extensions_for_pandas_spark.operators.pipeline import (
        prep_and_shard,
    )
    from tests.test_search import EN_PROSE_FOR_PIPELINE, RU_PROSE, VI_PROSE

    docs = spark.createDataFrame(
        [
            (1, "ru.example", RU_PROSE),
            (2, "vi.example", VI_PROSE),
            (3, "en.example", EN_PROSE_FOR_PIPELINE),
        ],
        "doc_id long, source string, text string",
    )
    kw = dict(
        sep_regex=" zzz ",
        join_sep=" ",
        min_words=30,
        boiler_min_docs=99,  # nothing boilerplate in a 3-doc corpus
        n_shards=2,
        checkpoint=False,
    )
    default_ids = sorted(
        r["doc_id"] for r in prep_and_shard(docs, **kw).collect()
    )
    aware_ids = sorted(
        r["doc_id"]
        for r in prep_and_shard(docs, lang_aware=True, **kw).collect()
    )
    assert default_ids == [3]  # English-only gate drops ru + vi
    assert aware_ids == [1, 2, 3]  # dispatcher keeps all three


def test_prepare_training_corpus_repair_encoding_collapses_mojibake(spark):
    """With repair_encoding=True, two crawls of the same page that
    differ only in decode damage become exact duplicates and collapse;
    without it they survive as distinct documents."""
    from text_extensions_for_pandas_spark.operators.pipeline import (
        prepare_training_corpus,
    )

    base = (
        "the quick brown fox jumps over the lazy dog and the cat "
        "and a bird in a tree is that ok yes it is fine today"
    )
    damaged = base.replace("fine", "finÃ©")  # é mangled to Ã©
    clean = base.replace("fine", "finé")
    rows = [(1, clean, "s"), (2, damaged, "s")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")

    # near-dup disabled (threshold > 1) to isolate the exact-dedup stage
    plain = prepare_training_corpus(df, min_words=5, near_dup_threshold=1.1)
    assert plain.count() == 2  # decode damage defeats exact dedup

    repaired = prepare_training_corpus(
        df, min_words=5, near_dup_threshold=1.1, repair_encoding=True
    )
    out = repaired.collect()
    assert len(out) == 1 and out[0].doc_id == 1
    assert "finé" in out[0].text
