"""Interop with the reference's Arrow/Parquet span layout.

The reference serializes span columns as an Arrow extension type
"TextExtensionsSpan" whose *storage* is
``struct<span_begins:int, span_ends:int, target_text:dictionary<string>>``
(``array/arrow_conversion.py:46-81``), token spans as
``struct<token_begins, token_ends, tokens:dictionary<...>>`` (``:83-118``)
and tensors as ``list<primitive>`` with the element shape in extension
metadata (``:304-425``).

Spark reads extension types by their storage type, and parquet dictionary
encoding is transparent — so interop needs only struct-shape conversion,
no custom datasource:

* read: reference struct → engine convention (``span struct<begin,end>`` +
  ``doc_id`` key + a ``documents(doc_id, text)`` dimension table, i.e. the
  StringTable relationally normalized, SURVEY.md §1.4);
* write: engine convention → reference struct (``target_text`` inlined per
  row; parquet's own dictionary encoding restores the compression that the
  reference's explicit dictionary type provided).

Tensors need nothing: the engine's ``array<float>`` IS ``list<float>``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from text_extensions_for_pandas_spark.functions.spans import make_span

SPAN_BEGINS = "span_begins"
SPAN_ENDS = "span_ends"
TARGET_TEXT = "target_text"
TOKEN_BEGINS = "token_begins"
TOKEN_ENDS = "token_ends"


def spans_from_reference(
    df: DataFrame, span_col: str, doc_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame]:
    """Normalize a reference-layout span struct column.

    Returns ``(rows, documents)``: ``rows`` replaces ``span_col`` with the
    engine's ``struct<begin,end>`` plus a ``doc_id`` derived
    deterministically from the target text (``xxhash64`` — stable across
    partitions and runs); ``documents`` is the distinct
    ``(doc_id, text)`` dimension (the de-embedded StringTable).
    """
    s = F.col(span_col)
    rows = df.withColumn(doc_col, F.xxhash64(s[TARGET_TEXT])).withColumn(
        span_col,
        make_span(s[SPAN_BEGINS].cast("int"), s[SPAN_ENDS].cast("int")),
    )
    documents = (
        df.select(
            F.xxhash64(F.col(span_col)[TARGET_TEXT]).alias(doc_col),
            F.col(span_col)[TARGET_TEXT].alias("text"),
        )
        .dropDuplicates([doc_col])
    )
    return rows, documents


def spans_to_reference(
    rows: DataFrame,
    documents: DataFrame,
    span_col: str = "span",
    doc_col: str = "doc_id",
) -> DataFrame:
    """Engine convention → reference storage layout: broadcast-join the
    documents dimension and embed the target text in the span struct."""
    docs = F.broadcast(
        documents.select(
            F.col(doc_col).alias("__doc"), F.col("text").alias("__text")
        )
    )
    return (
        rows.join(docs, F.col(doc_col) == F.col("__doc"), "left")
        .withColumn(
            span_col,
            F.struct(
                F.col(span_col)["begin"].alias(SPAN_BEGINS),
                F.col(span_col)["end"].alias(SPAN_ENDS),
                F.col("__text").alias(TARGET_TEXT),
            ),
        )
        .drop("__doc", "__text")
    )


def token_spans_from_reference(
    df: DataFrame, span_col: str
) -> DataFrame:
    """Reference token-span storage → engine ``struct<begin_token,
    end_token>``.  (The reference embeds the tokenization itself via a
    dictionary of span lists — single-document only, NotImplemented for
    multi-doc in the reference (``arrow_conversion.py:216-225``); the engine
    keeps tokenizations as first-class token tables instead, so only the
    offsets transfer.)"""
    s = F.col(span_col)
    return df.withColumn(
        span_col,
        F.struct(
            s[TOKEN_BEGINS].cast("int").alias("begin_token"),
            s[TOKEN_ENDS].cast("int").alias("end_token"),
        ),
    )


def token_spans_to_reference(df: DataFrame, span_col: str = "token_span") -> DataFrame:
    s = F.col(span_col)
    return df.withColumn(
        span_col,
        F.struct(
            s["begin_token"].alias(TOKEN_BEGINS),
            s["end_token"].alias(TOKEN_ENDS),
        ),
    )


def read_reference_parquet(
    spark, path: str, span_cols: list[str] | None = None
) -> tuple[DataFrame, DataFrame]:
    """Read a parquet written by the reference library (or any writer using
    its storage layout).  Auto-detects span-layout struct columns when
    ``span_cols`` is None.  Returns ``(rows, documents)``; with several span
    columns the documents table unions their target texts."""
    df = spark.read.parquet(path)
    if span_cols is None:
        span_cols = [
            f.name
            for f in df.schema.fields
            if f.dataType.typeName() == "struct"
            and {SPAN_BEGINS, SPAN_ENDS, TARGET_TEXT}
            <= {sf.name for sf in f.dataType.fields}
        ]
    documents = None
    for c in span_cols:
        df, docs = spans_from_reference(df, c)
        documents = docs if documents is None else documents.unionByName(docs)
    if documents is not None:
        documents = documents.dropDuplicates(["doc_id"])
    return df, documents
