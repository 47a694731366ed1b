#!/usr/bin/env python
"""Structured Streaming walkthrough: the training-data pipeline as an
append stream.

Documents arrive as files (here: the test parquet read with
``readStream`` + ``availableNow``, which drains everything as micro-batches
and stops — swap the path for a landing directory and drop the trigger for
a live feed).  Three stages run AS STREAMS with no plan changes, because
every operator used is stateless per row or explicitly watermarked:

1. stateless span extraction (regex + dictionary, consolidated per row);
2. exact dedup across the stream (state-bounded by a watermark);
3. MinHash near-dup filtering against batches seen so far
   (``applyInPandasWithState`` keeping per-band LSH state).

Run: python examples/streaming_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from text_extensions_for_pandas_spark import get_spark  # noqa: E402
from text_extensions_for_pandas_spark import streaming as STR  # noqa: E402
from text_extensions_for_pandas_spark.operators.extract import (  # noqa: E402
    create_dict,
)


def run_to_memory(stream_df, name, mode="append"):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return q


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("streaming-example")
    spark.sparkContext.setLogLevel("ERROR")

    docs = STR.read_documents_stream(spark, sf_dir)

    # 1. stateless extraction: one consolidated span table per micro-batch
    d = create_dict(spark, ["table scan", "hash join", "spark"])
    extracted = STR.streaming_extract_dict(docs, d)
    run_to_memory(extracted, "spans")
    n_spans = spark.table("spans").count()

    # 2. exact dedup across the stream
    deduped = STR.streaming_dedup_exact(docs)
    run_to_memory(deduped, "uniq")
    n_uniq = spark.table("uniq").count()

    # 3. stateful MinHash near-dup filter (keeps LSH band state per key)
    survivors = STR.streaming_dedup_minhash(docs)
    run_to_memory(survivors, "survivors", mode="update")
    n_survive = spark.table("survivors").count()

    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    print(f"documents        : {n_docs}")
    print(f"extracted spans  : {n_spans}")
    print(f"exact-dedup kept : {n_uniq}")
    print(f"near-dup kept    : {n_survive}")
    assert n_uniq <= n_docs and n_survive <= n_uniq
    spark.stop()


if __name__ == "__main__":
    main()
