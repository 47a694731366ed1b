"""Raw-corpus ingestion: JSONL / plain-text files → the canonical
``documents(doc_id, text, ...)`` table.

The reference library ingests only structured NLP formats (CoNLL, Watson
JSON — ``io/conll.py``, ``io/watson/nlu.py``); a training-data pipeline
starts one step earlier, at heaps of JSONL or raw text files.  These readers
produce the same ``documents`` shape every operator in this engine consumes.

Doc-id discipline at scale: ``monotonically_increasing_id`` is
partition-layout-dependent and ``zipWithIndex`` forces an extra pass, so
neither survives retries or re-partitioning.  Ids here are **content
hashes** (``xxhash64`` of the text): a rerun over the same files yields the
same ids on any cluster layout — the property exact dedup, hash splits, and
incremental appends rely on.  Identical payloads therefore share an id,
which is exact-dedup-by-construction; pass ``unique_ids=True`` to salt with
``(source file, position in file)`` instead, at the cost of one per-file
window shuffle (only worth it when duplicate texts must stay distinct
rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = ["read_jsonl_corpus", "read_text_corpus", "stable_doc_id"]


def stable_doc_id(*cols) -> "F.Column":
    """Deterministic non-negative doc id from the given columns
    (``xxhash64`` with the sign cleared so ids sort/split cleanly)."""
    return F.abs(F.xxhash64(*cols))


def _to_documents(raw: DataFrame, text_col, unique_ids: bool, extra: list):
    if unique_ids:
        pos = F.row_number().over(
            Window.partitionBy("source").orderBy(text_col)
        )
        doc_id = stable_doc_id(text_col, F.col("source"), pos)
    else:
        doc_id = stable_doc_id(text_col)
    return raw.select(
        doc_id.alias("doc_id"),
        text_col.alias("text"),
        F.col("source"),
        F.length(text_col).cast("long").alias("n_chars"),
        *extra,
    )


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    text_field: str = "text",
    keep_fields: list[str] | None = None,
    unique_ids: bool = False,
) -> DataFrame:
    """Read newline-delimited JSON documents into the canonical table.

    Output: ``doc_id, text, source, n_chars`` plus any ``keep_fields``
    carried through from the JSON records.  Pass explicit ``keep_fields``
    so the scan stays pruned to the columns actually used (schema-on-read
    of every stray field is a real cost at corpus scale).
    """
    raw = spark.read.json(path).withColumn("source", F.input_file_name())
    return _to_documents(
        raw, F.col(text_field), unique_ids, keep_fields or []
    )


def read_text_corpus(
    spark: SparkSession,
    path: str,
    doc_per: str = "line",
    unique_ids: bool = False,
) -> DataFrame:
    """Read plain-text files: one document per line (``doc_per='line'``,
    the common sharded-corpus layout; empty lines skipped) or per file
    (``doc_per='file'``, via ``wholetext`` — one row per file must fit an
    executor)."""
    if doc_per == "line":
        raw = (
            spark.read.text(path)
            .withColumn("source", F.input_file_name())
            .filter(F.length("value") > 0)
        )
    elif doc_per == "file":
        raw = (
            spark.read.option("wholetext", True)
            .text(path)
            .withColumn("source", F.input_file_name())
        )
    else:
        raise ValueError(f"doc_per must be 'line' or 'file', got {doc_per!r}")
    return _to_documents(raw, F.col("value"), unique_ids, [])
