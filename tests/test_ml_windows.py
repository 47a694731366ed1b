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
