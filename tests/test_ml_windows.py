"""Ensemble training (spark.ml) + BERT-style windowing tests."""

import pyspark.sql.functions as F
import pytest

from text_extensions_for_pandas_spark.operators.ml import (
    infer_on_df,
    train_model_ensemble,
    train_reduced_model,
)
from text_extensions_for_pandas_spark.operators.windows import (
    seq_to_windows,
    windows_to_seq,
)


@pytest.fixture(scope="module")
def embeddings(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_train_and_infer(embeddings):
    trained = train_reduced_model(embeddings, out_dim=8, seed=0, max_iter=20)
    out = infer_on_df(trained, embeddings)
    rows = out.select("vec_id", "predicted_id", "raw_output").limit(20).collect()
    n_classes = embeddings.select("label").distinct().count()
    for r in rows:
        assert 0 <= r.predicted_id < n_classes
        assert abs(sum(r.raw_output) - 1.0) < 1e-9  # probability vector


def test_inference_deterministic(embeddings):
    trained = train_reduced_model(embeddings, out_dim=8, seed=0, max_iter=20)
    a = {r.vec_id: r.predicted_id for r in infer_on_df(trained, embeddings).collect()}
    b = {r.vec_id: r.predicted_id for r in infer_on_df(trained, embeddings).collect()}
    assert a == b


def test_ensemble_grid(embeddings):
    models = train_model_ensemble(
        embeddings.limit(200), out_dims=[4, 8], seeds=[0, 1]
    )
    assert len(models) == 4
    assert {(m["out_dim"], m["seed"]) for m in models} == {
        (4, 0), (4, 1), (8, 0), (8, 1)
    }


@pytest.fixture(scope="module")
def token_seq(spark):
    rows = [(0, i, float(i) * 2) for i in range(50)] + [(1, i, float(i)) for i in range(5)]
    return spark.createDataFrame(rows, "doc_id long, token_idx int, val double")


def test_seq_to_windows_shapes(token_seq):
    w = seq_to_windows(token_seq, window_size=16, overlap=4, value_cols=["val"])
    rows = w.collect()
    for r in rows:
        assert len(r.token_idxs) == 16 and len(r.attention_mask) == 16
        n_real = sum(r.attention_mask)
        assert [i for i in r.token_idxs[:n_real]] == sorted(
            i for i in r.token_idxs if i is not None
        )
    # doc 0: 50 tokens, stride 12 -> windows 0..4; doc 1: 1 window
    assert {(r.doc_id, r.window_id) for r in rows} == {
        (0, 0), (0, 1), (0, 2), (0, 3), (0, 4), (1, 0)
    }


def test_windows_roundtrip(token_seq):
    w = seq_to_windows(token_seq, window_size=16, overlap=4, value_cols=["val"])
    back = windows_to_seq(w, "vals", window_size=16, overlap=4)
    got = {(r.doc_id, r.token_idx): r.vals for r in back.collect()}
    orig = {(r.doc_id, r.token_idx): r.val for r in token_seq.collect()}
    assert got == orig  # every token recovered exactly once with its value


def test_token_classes_round_trip(spark):
    from text_extensions_for_pandas_spark.operators.iob import (
        add_token_classes,
        decode_class_labels,
        make_iob_tag_categories,
    )

    labels, ids = make_iob_tag_categories(["PER", "ORG"])
    # reference layout: O, then all B- labels, then all I- labels, in
    # caller's type order (io/conll.py:1257)
    assert labels == ["O", "B-PER", "B-ORG", "I-PER", "I-ORG"]
    toks = spark.createDataFrame(
        [(0, 0, "B", "PER"), (0, 1, "I", "PER"), (0, 2, "O", None), (0, 3, "B", "ORG")],
        "doc_id long, token_idx int, ent_iob string, ent_type string",
    )
    classed = add_token_classes(toks, ids)
    got = {r.token_idx: (r.token_class, r.token_class_id) for r in classed.collect()}
    assert got[0] == ("B-PER", 1) and got[2] == ("O", 0) and got[3] == ("B-ORG", 2)

    decoded = decode_class_labels(
        classed.withColumnRenamed("token_class_id", "predicted_id"), labels
    )
    back = {r.token_idx: (r.predicted_iob, r.predicted_type) for r in decoded.collect()}
    assert back[0] == ("B", "PER") and back[2] == ("O", None) and back[3] == ("B", "ORG")


def test_infer_and_extract_entities_iob(spark):
    """End-to-end §2.9: train on separable per-token embeddings, infer,
    decode IOB, extract entity spans."""
    import numpy as np

    from text_extensions_for_pandas_spark.operators.iob import (
        make_iob_tag_categories,
    )
    from text_extensions_for_pandas_spark.operators.ml import (
        infer_and_extract_entities_iob,
        train_reduced_model,
    )

    labels, ids = make_iob_tag_categories(["PER"])
    # tokens: B-PER I-PER O O B-PER O per doc, embeddings cluster by class
    rng = np.random.default_rng(7)
    rows = []
    pattern = [1, 2, 0, 0, 1, 0]  # class ids: 1=B-PER, 2=I-PER under ["O","B-PER","I-PER"]
    cls_of = {0: 0, 1: ids["B-PER"], 2: ids["I-PER"]}
    for doc in range(30):
        for i, p in enumerate(pattern):
            center = {0: [0, 0, 8], 1: [8, 0, 0], 2: [0, 8, 0]}[p]
            vec = (rng.normal(0, 0.3, 3) + center).tolist()
            begin = i * 4
            rows.append(
                (doc, i, (begin, begin + 3), float(cls_of[p]), vec)
            )
    toks = spark.createDataFrame(
        rows,
        "doc_id long, token_idx int, span struct<begin:int,end:int>, "
        "label double, embedding array<double>",
    )
    trained = train_reduced_model(toks, out_dim=3, seed=0, max_iter=40)
    ents = infer_and_extract_entities_iob(trained, toks.drop("label"), labels)
    per_doc = ents.groupBy("doc_id").count().collect()
    # pattern has 2 PER entities per doc; model is near-separable
    assert all(r["count"] == 2 for r in per_doc)
    one = ents.filter("doc_id = 0").orderBy("span.begin").collect()
    assert [(r.span.begin, r.span.end) for r in one] == [(0, 7), (16, 19)]
    assert all(r.ent_type == "PER" for r in one)


def test_infer_and_extract_raw_entities(spark):
    """Cleaning-tutorial flow through the named APIs: subtoken predictions
    regroup onto raw tokens (probability product + renorm), argmax class
    recovers the original labels exactly."""
    import numpy as np

    from text_extensions_for_pandas_spark.operators.ml import (
        infer_and_extract_raw_entities,
        train_reduced_model,
    )

    labels = ["O", "B-PER", "I-PER"]
    rng = np.random.default_rng(11)
    rows = []
    # 2 folds x 10 docs x 6 raw tokens, each raw token split into 1-3
    # "subtokens" sharing its raw_span_id; embeddings cluster by class
    pattern = [1, 2, 0, 0, 1, 0]
    for fold in ("train", "test"):
        for doc in range(10):
            tok_idx = 0
            for raw_id, p in enumerate(pattern):
                center = {0: [0, 0, 8], 1: [8, 0, 0], 2: [0, 8, 0]}[p]
                for _ in range(1 + (raw_id + doc) % 3):
                    vec = (rng.normal(0, 0.3, 3) + center).tolist()
                    rows.append(
                        (fold, doc, tok_idx, raw_id, f"raw{raw_id}",
                         float(p), vec)
                    )
                    tok_idx += 1
    df = spark.createDataFrame(
        rows,
        "fold string, doc_id long, token_idx int, raw_span_id int, "
        "raw_span string, label double, embedding array<double>",
    )
    trained = train_reduced_model(df, out_dim=3, seed=0, max_iter=40)
    out = infer_and_extract_raw_entities(trained, df.drop("label"), labels)
    got = out.collect()
    # one output row per raw token
    assert len(got) == 2 * 10 * len(pattern)
    for r in got:
        assert abs(sum(r.raw_output) - 1.0) < 1e-9
        assert r.raw_span == f"raw{r.raw_span_id}"  # keep_cols rode along
        assert labels[r.predicted_id] == r.predicted_class
        assert r.predicted_id == pattern[r.raw_span_id]  # exact recovery


def test_combine_raw_spans_docs_and_to_match(spark):
    from text_extensions_for_pandas_spark.operators.ml import (
        combine_raw_spans_docs,
        combine_raw_spans_docs_to_match,
    )

    def fold_df(n_docs):
        rows = []
        for d in range(n_docs):
            for i, (iob, typ) in enumerate(
                [("B", "PER"), ("I", "PER"), ("O", None), ("B", "ORG")]
            ):
                b = i * 4
                rows.append((d, i, (b, b + 3), iob, typ))
        return spark.createDataFrame(
            rows,
            "doc_id long, token_idx int, span struct<begin:int,end:int>, "
            "ent_iob string, ent_type string",
        )

    folds = {"train": fold_df(3), "test": fold_df(2)}
    spans = combine_raw_spans_docs(folds)
    rows = spans.collect()
    # 2 entities per doc, 5 docs across folds
    assert len(rows) == 10
    assert {r.fold for r in rows} == {"train", "test"}
    per = {(r.fold, r.doc_id, r.span.begin, r.span.end, r.ent_type) for r in rows}
    assert ("train", 0, 0, 7, "PER") in per and ("test", 1, 12, 15, "ORG") in per

    match = spark.createDataFrame(
        [("train", 0), ("test", 1)], "fold string, doc_id long"
    )
    restricted = combine_raw_spans_docs_to_match(folds, match)
    got = {(r.fold, r.doc_id) for r in restricted.collect()}
    assert got == {("train", 0), ("test", 1)}
    assert restricted.count() == 4


def test_chunk_document_spans_coverage(spark):
    """Every token is inside >=1 chunk; chunk token budgets hold; spans
    slice back to text that starts/ends on token boundaries."""
    from text_extensions_for_pandas_spark.functions.text import (
        tokenize_whitespace,
    )
    from text_extensions_for_pandas_spark.operators.windows import (
        chunk_document_spans,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    toks = tokenize_whitespace(docs)
    window, stride = 12, 8
    chunks = chunk_document_spans(toks, window=window, stride=stride).cache()

    # budgets: every chunk has 1..window tokens; only the last chunk of a
    # doc may be shorter than window when the doc has >= window tokens
    rows = chunks.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    n_tok = {r.doc_id: r.n for r in toks.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    for d, rs in by_doc.items():
        rs.sort(key=lambda r: r.chunk_idx)
        for r in rs[:-1]:
            assert r.n_tokens == window, (d, r)
        assert 1 <= rs[-1].n_tokens <= window
        if n_tok[d] >= window:
            assert rs[0].n_tokens == window
    # coverage: chunk char ranges jointly cover every token span
    cov = toks.alias("t").join(
        chunks.alias("c"),
        (F.col("t.doc_id") == F.col("c.doc_id"))
        & (F.col("t.span.begin") >= F.col("c.span.begin"))
        & (F.col("t.span.end") <= F.col("c.span.end")),
        "left_anti",
    )
    assert cov.count() == 0
