"""Model-based quality filtering — the classifier stage of web-scale
corpus curation (GPT-3 appendix A: a linear classifier trained to separate
a high-quality reference corpus from raw crawl, with Pareto-smoothed
acceptance; CCNet's LM-perplexity buckets are the statistical cousin,
already covered by ``operators/search.unigram_surprisal``).

Spark-first shape: MLlib pipeline (regex tokens → hashing TF → IDF →
logistic regression) trained on a labeled union of reference-vs-crawl
documents; scoring is one model pass (JVM vectorized); the acceptance
decision is a row-local deterministic expression (md5-uniform → inverse-CDF
Pareto), so filtering is reproducible across retries/engines and runs
unchanged on a stream.  Beyond the reference library's surface; part of
the LLM-pipeline north star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from text_extensions_for_pandas_spark.functions.text import DEFAULT_TOKEN_PATTERN


def train_quality_classifier(
    positive: DataFrame,
    negative: DataFrame,
    text_col: str = "text",
    num_features: int = 1 << 18,
    max_iter: int = 50,
):
    """Fit the reference-vs-crawl classifier.  ``positive`` = documents from
    the trusted/high-quality corpus, ``negative`` = raw crawl sample.
    Returns a fitted ``pyspark.ml.PipelineModel`` whose ``probability[1]``
    is the document quality score.

    Feature hashing keeps the model size fixed (``num_features`` buckets)
    regardless of vocabulary — the property that lets the same pipeline
    train on a 1% sample and score 100 TB.
    """
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import IDF, HashingTF, RegexTokenizer

    labeled = positive.select(
        F.col(text_col).alias("text"), F.lit(1.0).alias("label")
    ).unionByName(
        negative.select(F.col(text_col).alias("text"), F.lit(0.0).alias("label"))
    )
    pipe = Pipeline(
        stages=[
            RegexTokenizer(
                inputCol="text",
                outputCol="__toks",
                pattern=DEFAULT_TOKEN_PATTERN,
                gaps=False,
                toLowercase=True,
            ),
            HashingTF(
                inputCol="__toks", outputCol="__tf", numFeatures=num_features
            ),
            IDF(inputCol="__tf", outputCol="__features"),
            LogisticRegression(
                featuresCol="__features", labelCol="label", maxIter=max_iter
            ),
        ]
    )
    return pipe.fit(labeled)


def score_quality(
    model,
    documents: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Add ``quality_score`` (P[reference-like] in [0, 1]) to every
    document — one vectorized model pass, no shuffle."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(
        documents.withColumn("text", F.col(text_col))
    )
    keep = [c for c in documents.columns]
    return scored.select(
        *keep,
        F.round(
            F.element_at(vector_to_array("probability"), 2), 6
        ).alias("quality_score"),
    )


def pareto_filter(
    scored: DataFrame,
    alpha: float = 9.0,
    score_col: str = "quality_score",
    id_col: str = "doc_id",
    salt: str = "quality-pareto",
) -> DataFrame:
    """GPT-3's acceptance rule — keep a document iff
    ``pareto(alpha) > 1 - score`` — with the Pareto draw DERANDOMIZED:
    ``u = md5-uniform(doc_id)`` and the inverse CDF
    ``(1 - u)^(-1/alpha) - 1`` replace ``np.random.pareto``.

    High-score docs are (almost) always kept; low-score docs survive with
    small probability, preserving tail diversity instead of hard
    thresholding.  Row-local and deterministic: re-runs, retried tasks,
    and streaming micro-batches keep exactly the same documents (the same
    guarantee as ``operators/sampling``'s hash membership).
    """
    u = (
        F.conv(F.substring(F.md5(F.concat_ws("|", F.lit(salt), F.col(id_col))), 1, 15), 16, 10)
        .cast("double")
        / float(16**15)
    )
    pareto = F.pow(1.0 - u, F.lit(-1.0 / alpha)) - 1.0
    return scored.filter(pareto > (1.0 - F.col(score_col)))
