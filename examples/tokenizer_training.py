"""Tokenizer training — BPE merges learned from the corpus, applied back
to it, with paragraph dedup as the cleaning step in front.

    documents → paragraph dedup (CCNet keep-first)
              → word-frequency table (the corpus collapses here)
              → BPE merge training (deterministic top-1 loop)
              → vocabulary segmentation → corpus tokenization
              → compression report (chars per subtoken)

The corpus is touched exactly twice at scale: once to build the word
table, once to tokenize via the segmentation join.  Every merge
iteration rewrites only vocabulary-sized rows.

Run:  python examples/tokenizer_training.py [docs_parquet_dir]
"""

from __future__ import annotations

import os
import sys

import pyspark.sql.functions as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import text_extensions_for_pandas_spark as tep  # noqa: E402
from text_extensions_for_pandas_spark.operators import bpe  # noqa: E402
from text_extensions_for_pandas_spark.operators.dedup import (  # noqa: E402
    dedup_paragraphs,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = tep.get_spark("tokenizer-training-example")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # 1. Boilerplate removal first — repeated paragraphs would otherwise
    # bias the pair counts toward boilerplate character sequences.
    cleaned = dedup_paragraphs(
        docs, sep_regex=" table ", join_sep=" "
    ).select("doc_id", F.col("dedup_text").alias("text"))

    # 2. Learn merges.  n_merges is tiny here for demo runtime; the loop
    # cost is per-merge, not per-byte of corpus.
    merges, vocab = bpe.train_bpe(cleaned, n_merges=12)
    print(f"learned {len(merges)} merges: {merges[:8]} ...")

    # 3. Tokenize the corpus under the trained vocabulary, reusing the
    # persisted segmentation train_bpe already computed.
    encoded = bpe.bpe_encode_corpus(cleaned, merges, segmented=vocab)

    # 4. Compression report: how many subtokens per word/char the
    # vocabulary achieves — the metric tokenizer training optimizes.
    report = encoded.agg(
        F.count("*").alias("words"),
        F.sum(F.size("subtokens")).alias("subtokens"),
        F.sum(F.length("word")).alias("chars"),
    ).select(
        "words",
        "subtokens",
        F.round(F.col("chars") / F.col("subtokens"), 3).alias(
            "chars_per_subtoken"
        ),
    )
    report.show()

    longest = (
        vocab.select(F.explode("symbols").alias("sym"))
        .groupBy("sym")
        .count()
        .orderBy(F.length("sym").desc(), F.col("count").desc())
        .limit(8)
    )
    print("longest learned subword units:")
    longest.show(truncate=False)


if __name__ == "__main__":
    main()
