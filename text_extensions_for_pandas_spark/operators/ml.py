"""Model-ensemble operators (reference ``cleaning/ensemble.py``), built on
Spark MLlib instead of sklearn+Ray.

The reference trains a grid of (feature-subset-size × random-seed) logistic
models over BERT embeddings, shipping data to Ray workers
(``cleaning/ensemble.py:82-161``).  Spark replaces Ray outright: every
``fit`` is a distributed job over the embeddings DataFrame, and the grid
loop runs on the driver (SURVEY.md §2.9).

Pipeline per model: Gaussian random projection (seeded, deterministic) →
LogisticRegression.  Projection is an Arrow-batched pandas UDF doing one
matmul per batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def random_projection(
    df: DataFrame,
    out_dim: int,
    seed: int,
    vec_col: str = "embedding",
    out_col: str = "features",
) -> DataFrame:
    """Gaussian random projection to ``out_dim`` dims
    (reference ``train_reduced_model``'s GaussianRandomProjection,
    ``cleaning/ensemble.py:34-79``).  The projection matrix is derived
    deterministically from ``seed`` and applied as a per-batch matmul."""
    in_dim = len(df.select(vec_col).first()[0])
    mat = (
        np.random.RandomState(seed)
        .normal(0.0, 1.0 / np.sqrt(out_dim), size=(in_dim, out_dim))
        .astype(np.float64)
    )

    @F.pandas_udf("array<double>")
    def _proj(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for vecs in it:
            stacked = np.vstack(vecs.to_numpy())
            out = stacked @ mat
            yield pd.Series(list(out))

    return df.withColumn(out_col, _proj(F.col(vec_col)))


def train_reduced_model(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    out_dim: int = 16,
    seed: int = 0,
    max_iter: int = 50,
):
    """Train one (projection, logistic-regression) model; returns a dict
    with the fitted model and its projection parameters."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    projected = random_projection(df, out_dim, seed, vec_col).withColumn(
        "__features", array_to_vector(F.col("features"))
    )
    lr = LogisticRegression(
        featuresCol="__features", labelCol=label_col, maxIter=max_iter, regParam=0.01
    )
    model = lr.fit(projected)
    return {"model": model, "out_dim": out_dim, "seed": seed}


def train_model_ensemble(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    out_dims: list[int] | None = None,
    seeds: list[int] | None = None,
):
    """Train the size×seed grid (reference ``train_model_ensemble``,
    ``cleaning/ensemble.py:82-161``).  Each fit is a distributed Spark job;
    the grid loop is driver-side — no external runtime needed."""
    out_dims = out_dims or [8, 16]
    seeds = seeds or [0, 1]
    df = df.cache()
    return [
        train_reduced_model(df, label_col, vec_col, d, s)
        for d in out_dims
        for s in seeds
    ]


def infer_on_df(
    trained: dict,
    df: DataFrame,
    vec_col: str = "embedding",
) -> DataFrame:
    """Run one trained model over a DataFrame
    (reference ``infer_on_df``, ``cleaning/ensemble.py:164-204``): adds
    ``predicted_id`` and ``raw_output`` (probability vector)."""
    from pyspark.ml.functions import array_to_vector, vector_to_array

    projected = random_projection(
        df, trained["out_dim"], trained["seed"], vec_col
    ).withColumn("__features", array_to_vector(F.col("features")))
    out = trained["model"].transform(projected)
    return out.select(
        *df.columns,
        F.col("prediction").cast("int").alias("predicted_id"),
        vector_to_array(F.col("probability")).alias("raw_output"),
    )


def extract_entities_iob(
    tokens_with_iob: DataFrame,
    iob_col: str = "predicted_iob",
    type_col: str = "predicted_type",
    doc_col: str = "doc_id",
) -> DataFrame:
    """Predicted IOB tags → entity span table (reference
    ``extract_entities_iob``, ``cleaning/ensemble.py:301-360`` — a per-doc
    Python loop there; one sessionization plan here)."""
    from text_extensions_for_pandas_spark.operators.iob import (
        iob_to_iob2,
        iob_to_spans,
    )

    repaired = iob_to_iob2(
        tokens_with_iob, iob_col=iob_col, type_col=type_col, doc_col=doc_col,
        sentence_col=None,
    )
    return iob_to_spans(
        repaired, iob_col=iob_col, type_col=type_col, doc_col=doc_col
    )


def infer_and_extract_entities_iob(
    trained: dict,
    tokens: DataFrame,
    class_labels: list[str],
    corpus_tokens: DataFrame | None = None,
    vec_col: str = "embedding",
    doc_col: str = "doc_id",
) -> DataFrame:
    """Full inference pipeline (reference ``infer_and_extract_entities_iob``,
    ``cleaning/ensemble.py:363-422``): model → class ids → IOB tags →
    entity spans, optionally re-aligned to a different corpus tokenization.

    ``tokens`` must carry ``doc_col``, ``token_idx``, ``span`` and the
    embedding column; alignment (when ``corpus_tokens`` given) uses the
    overlap-join/consolidate path of the BERT bridge.
    """
    from text_extensions_for_pandas_spark.operators.iob import decode_class_labels

    preds = infer_on_df(trained, tokens, vec_col=vec_col)
    tagged = decode_class_labels(preds, class_labels)
    ents = extract_entities_iob(tagged, doc_col=doc_col)
    ents = ents.withColumnRenamed("predicted_type", "ent_type")
    if corpus_tokens is None:
        return ents
    from text_extensions_for_pandas_spark.sources.nlp_bridges import (
        align_bert_tokens_to_corpus_tokens,
    )

    return align_bert_tokens_to_corpus_tokens(
        ents.select(doc_col, "span", "ent_type"), corpus_tokens, doc_col=doc_col
    )


def infer_and_extract_raw_entities(
    trained: dict,
    doc: DataFrame,
    id_to_class: list[str] | dict[int, str],
    raw_span_id_col: str = "raw_span_id",
    fold_col: str = "fold",
    doc_col: str = "doc_id",
    vec_col: str = "embedding",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Inference + subtoken regrouping onto the original tokenization
    (reference ``infer_and_extract_raw_entites`` — sic —
    ``cleaning/ensemble.py:207-298``).

    Runs the model over BERT-subtoken embeddings, then merges the per-
    subtoken probability vectors of each *raw* (pre-BERT) token: product of
    probabilities per class, renormalized — computed in log space
    (:func:`..functions.tensor.prob_product_renorm`), which also covers the
    reference's explicit underflow fallback.  ``predicted_id`` is the
    argmax of the merged vector and ``predicted_class`` its name under
    ``id_to_class``.

    Group keys are the (fold, doc, raw-span-id) columns present in ``doc``;
    ``keep_cols`` ride along via deterministic first-subtoken values
    (``min_by token_idx`` when available).  One shuffle on the group keys;
    the inference itself is a map-side Arrow-batched projection+model pass.
    """
    from text_extensions_for_pandas_spark.functions.tensor import (
        prob_product_renorm,
    )

    if isinstance(id_to_class, dict):
        id_to_class = [id_to_class[i] for i in range(len(id_to_class))]

    preds = infer_on_df(trained, doc, vec_col=vec_col)
    sort_cols = [c for c in (fold_col, doc_col, raw_span_id_col) if c in doc.columns]
    if not sort_cols:
        raise ValueError(
            f"none of ({fold_col}, {doc_col}, {raw_span_id_col}) in {doc.columns}"
        )
    default_keep = ["raw_span"]
    keep = [
        c
        for c in (keep_cols if keep_cols is not None else default_keep)
        if c in doc.columns and c not in sort_cols
    ]

    merged = prob_product_renorm(preds, sort_cols, "raw_output")
    if keep:
        order = (
            F.col("token_idx") if "token_idx" in doc.columns else F.monotonically_increasing_id()
        )
        firsts = preds.groupBy(*sort_cols).agg(
            *[F.min_by(c, order).alias(c) for c in keep]
        )
        merged = merged.join(firsts, sort_cols)

    labels = F.array(*[F.lit(c) for c in id_to_class])
    out = merged.withColumn(
        "predicted_id",
        (F.array_position(F.col("probs"), F.array_max("probs")) - 1).cast("int"),
    )
    return out.select(
        *sort_cols,
        *keep,
        F.col("probs").alias("raw_output"),
        "predicted_id",
        F.get(labels, F.col("predicted_id")).alias("predicted_class"),
    )


# the reference spells it "entites"; keep that name importable for parity
infer_and_extract_raw_entites = infer_and_extract_raw_entities


def combine_raw_spans_docs(
    folds: dict[str, DataFrame],
    iob_col: str = "ent_iob",
    type_col: str = "ent_type",
    doc_col: str = "doc_id",
) -> DataFrame:
    """Merge corpus folds into one entity-span table (reference
    ``combine_raw_spans_docs``, ``cleaning/preprocess.py:292-322``): run
    ``iob_to_spans`` over each fold's token frame and stack with fold keys.
    The reference loops per document; each fold here is one multi-document
    DataFrame, so this is a union of per-fold lazy plans."""
    from text_extensions_for_pandas_spark.operators.iob import iob_to_spans
    from text_extensions_for_pandas_spark.sources.conll import combine_folds

    return combine_folds(
        {
            fold: iob_to_spans(df, iob_col=iob_col, type_col=type_col, doc_col=doc_col)
            for fold, df in folds.items()
        }
    )


def combine_raw_spans_docs_to_match(
    folds: dict[str, DataFrame],
    df_to_match: DataFrame,
    iob_col: str = "ent_iob",
    type_col: str = "ent_type",
    doc_col: str = "doc_id",
    fold_col: str = "fold",
) -> DataFrame:
    """:func:`combine_raw_spans_docs` restricted to the (fold, document)
    pairs present in ``df_to_match`` (reference
    ``combine_raw_spans_docs_to_match``, ``cleaning/preprocess.py:325-378``
    — a driver-side pair loop there; one semi-join here, so the pair list
    never leaves the cluster)."""
    pairs = df_to_match.select(fold_col, doc_col).distinct()
    return combine_raw_spans_docs(
        folds, iob_col=iob_col, type_col=type_col, doc_col=doc_col
    ).join(pairs, [fold_col, doc_col], "left_semi")
