"""Span↔tokenization alignment + projection operators.

Reference: ``TokenSpanArray.align_to_tokens`` (``array/token_span.py:729-802``)
and ``lemmatize`` (``spanner/project.py:36-66``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from text_extensions_for_pandas_spark.functions.spans import make_token_span


def align_to_tokens(
    tokens: DataFrame,
    spans: DataFrame,
    span_col: str = "span",
    doc_col: str = "doc_id",
    raise_on_unaligned: bool = True,
) -> DataFrame:
    """Map char spans onto a tokenization: find the token whose begin matches
    each span's begin and the token whose end matches each span's end; result
    is a token span covering those tokens.

    Reference (``array/token_span.py:729-802``): two merges on char offsets,
    zero-length tokens filtered first (``:766-767``), error on unmatched
    spans (``:774-791``).  Spark-first: two equijoins on ``(doc_id, offset)``;
    misalignment surfaces as a count of rows with a NULL side — in a lazy
    engine validation is an action, so ``raise_on_unaligned`` keeps NULL
    token spans flagged in an ``aligned`` boolean instead of raising
    mid-plan; callers can ``filter(~aligned)`` + count to enforce.
    """
    toks = tokens.filter(
        F.col("span")["end"] > F.col("span")["begin"]
    )  # zero-length tokens can't anchor alignment
    b_side = toks.select(
        F.col(doc_col).alias("__bd"),
        F.col("span")["begin"].alias("__bb"),
        F.col("token_idx").alias("__b_tok"),
    )
    e_side = toks.select(
        F.col(doc_col).alias("__ed"),
        F.col("span")["end"].alias("__ee"),
        F.col("token_idx").alias("__e_tok"),
    )
    out = (
        spans.join(
            b_side,
            (F.col(doc_col) == F.col("__bd"))
            & (F.col(span_col)["begin"] == F.col("__bb")),
            "left",
        )
        .join(
            e_side,
            (F.col(doc_col) == F.col("__ed"))
            & (F.col(span_col)["end"] == F.col("__ee")),
            "left",
        )
        .withColumn(
            "aligned", F.col("__b_tok").isNotNull() & F.col("__e_tok").isNotNull()
        )
        .withColumn(
            "token_span",
            F.when(
                F.col("aligned"),
                make_token_span(F.col("__b_tok"), F.col("__e_tok") + 1),
            ),
        )
        .drop("__bd", "__bb", "__b_tok", "__ed", "__ee", "__e_tok")
    )
    return out


def lemmatize(
    spans: DataFrame,
    tokens: DataFrame,
    lemma_col: str = "lemma",
    span_col: str = "token_span",
    doc_col: str = "doc_id",
    output_col: str = "lemma",
) -> DataFrame:
    """Space-joined lemmas of each span's tokens (reference ``lemmatize``,
    ``spanner/project.py:36-66`` — a per-row Python loop).

    Spark-first: explode span → token indices, equijoin the tokens table,
    re-assemble with ``collect_list`` ordered by token position.  The sort
    inside ``collect_list`` is made deterministic by aggregating
    (idx, lemma) structs and ``array_sort``-ing.
    """
    span_toks = spans.withColumn(
        "__tok_idx",
        F.explode(
            F.sequence(
                F.col(span_col)["begin_token"], F.col(span_col)["end_token"] - 1
            )
        ),
    )
    tok_lemmas = tokens.select(
        F.col(doc_col).alias("__td"),
        F.col("token_idx").alias("__ti"),
        F.col(lemma_col).alias("__lemma"),
    )
    joined = span_toks.join(
        tok_lemmas,
        (F.col(doc_col) == F.col("__td")) & (F.col("__tok_idx") == F.col("__ti")),
        "inner",
    )
    group_cols = [c for c in spans.columns]
    return (
        joined.groupBy(*group_cols)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("__tok_idx"), F.col("__lemma")))
            ).alias("__parts")
        )
        .withColumn(
            output_col,
            F.concat_ws(" ", F.transform(F.col("__parts"), lambda s: s["__lemma"])),
        )
        .drop("__parts")
    )
