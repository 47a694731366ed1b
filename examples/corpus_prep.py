"""Training-corpus preparation — the engine's scale showcase: raw text
shards in, cleaned/deduplicated/split corpus out, with a full audit trail.

    raw shards → documents table (content-hash ids)
               → language + quality filters
               → exact dedup → near-dup clusters (connected components)
               → exact-substring repeated-passage spans (report)
               → benchmark decontamination (Bloom filter)
               → deterministic train/val/test split
               → stage-by-stage funnel audit

Every stage is a lazy Catalyst plan; at 100 TB the same code runs with the
shards on object storage and the splits written back as parquet.

Run:  python examples/corpus_prep.py [docs_parquet_dir]
"""

from __future__ import annotations

import os
import sys

import pyspark.sql.functions as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import text_extensions_for_pandas_spark as tep  # noqa: E402
from text_extensions_for_pandas_spark.operators.dedup import (  # noqa: E402
    contaminated,
    eval_shingle_bloom,
    repeated_ngram_spans,
)
from text_extensions_for_pandas_spark.operators.pipeline import (  # noqa: E402
    corpus_funnel,
    prepare_training_corpus,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = tep.get_spark("corpus-prep-example")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # 1. Clean + dedup (cluster-correct) + split, as one lazy plan.
    corpus = prepare_training_corpus(
        docs,
        near_dup_strategy="clusters",
        split_weights={"train": 0.9, "val": 0.05, "test": 0.05},
    )

    # 2. Decontaminate against a benchmark (here: every 50th doc stands in
    #    for the eval set).  The Bloom probe is a stateless row filter, so
    #    the same expression decontaminates a readStream.
    eval_docs = docs.filter(F.col("doc_id") % 50 == 0)
    bloom = eval_shingle_bloom(eval_docs, shingle_n=5)
    clean = corpus.filter(~contaminated(F.col("text"), bloom, 5))

    print("\n=== split sizes after cleaning ===")
    clean.groupBy("split").count().orderBy("split").show()

    # 3. Audit funnel: survivors per pipeline stage.
    print("=== preparation funnel ===")
    corpus_funnel(docs).show()

    # 3b. Model-based quality gate (GPT-3 appendix A): train a
    #     reference-vs-crawl classifier on a labeled sample, score every
    #     document in one vectorized pass, and keep by the Pareto-smoothed
    #     acceptance rule — derandomized, so re-runs keep the same docs.
    from text_extensions_for_pandas_spark.operators.quality_model import (
        pareto_filter,
        score_quality,
        train_quality_classifier,
    )

    reference_sample = docs.filter(F.col("doc_id") % 7 == 0).limit(50)
    crawl_sample = docs.filter(F.col("doc_id") % 7 == 3).limit(50).selectExpr(
        "doc_id", "repeat('free bonus click now ', 25) AS text"
    )
    clf = train_quality_classifier(reference_sample, crawl_sample, max_iter=15)
    gated = pareto_filter(score_quality(clf, clean.select("doc_id", "text", "split")))
    print("=== model-quality gate: kept docs per split ===")
    gated.groupBy("split").count().orderBy("split").show()

    # 4. Repeated-passage report: maximal cross-document repeated spans
    #    (cut candidates for passage-level dedup).
    print("=== largest repeated passages (top 5) ===")
    spans = repeated_ngram_spans(docs, k=20, min_docs=2)
    (
        spans.join(docs.select("doc_id", "text"), "doc_id")
        .select(
            "doc_id",
            "begin",
            "end",
            F.expr("substring(text, begin + 1, least(end - begin, 60))").alias(
                "passage_prefix"
            ),
        )
        .orderBy((F.col("end") - F.col("begin")).desc(), "doc_id")
        .show(5, truncate=False)
    )

    # 5. Pack the cleaned train split into fixed token-budget bins — the
    #    step before serializing training shards.  Packing is per-shard
    #    (hash of doc id) so every shard's running-sum window sorts locally.
    from pyspark.sql import Window

    from text_extensions_for_pandas_spark.functions.text import token_count

    budget, n_shards = 2048, 8
    shard = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("int") % n_shards
    )
    counted = clean.filter(F.col("split") == "train").select(
        "doc_id", shard.alias("shard"), token_count(F.col("text")).alias("n_tokens")
    )
    w = (
        Window.partitionBy("shard").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = counted.withColumn(
        "bin", F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / budget)
    )
    print("=== packed bins per shard (train split) ===")
    packed.groupBy("shard").agg(
        F.countDistinct("bin").alias("n_bins"),
        F.sum("n_tokens").alias("n_tokens"),
    ).orderBy("shard").show()

    # 6. Mix the cleaned corpus to target language weights under a char
    #    budget — per-language rates derived lazily from language mass,
    #    membership by content hash (identical on re-runs and across
    #    repartitioning, unlike df.sample).
    from text_extensions_for_pandas_spark.operators.sampling import (
        sample_mixture,
    )

    mixed = sample_mixture(
        clean, "lang", {"en": 0.6, "de": 0.3, "fr": 0.1},
        F.col("n_chars").cast("double"), budget=100_000.0,
    )
    print("=== mixture sample (lang, kept docs, kept chars, rate) ===")
    mixed.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("n_chars"),
        F.round(F.first("rate"), 4).alias("rate"),
    ).orderBy("lang").show()

    # 7. Or run the whole modern recipe as ONE operator: boilerplate
    #    removal -> Gopher gate -> paragraph dedup -> exact dedup ->
    #    per-domain caps -> epoch-stable shard shuffle.  Every stage is a
    #    pure function of the input; write partitionBy("shard") and train.
    from text_extensions_for_pandas_spark.operators.pipeline import (
        prep_and_shard,
    )

    sharded = prep_and_shard(
        docs.select("doc_id", "source", "text"),
        sep_regex=" table ",
        join_sep=" ",
        min_words=30,
        required_words=("the", "a", "data", "key", "line", "row"),
        max_docs_per_domain=20,
        max_chars_per_domain=50_000,
        n_shards=4,
        salt="epoch0",
    )
    print("=== prep_and_shard: docs and chars per training shard ===")
    sharded.groupBy("shard").agg(
        F.count("*").alias("n_docs"), F.sum("n_chars").alias("n_chars")
    ).orderBy("shard").show()

    # --- sizing the final mix: budget, upsampling, and script-aware
    # quality — the last mile between a cleaned corpus and a train set
    from text_extensions_for_pandas_spark.functions.text import (
        quality_gate_by_script,
    )
    from text_extensions_for_pandas_spark.operators.sampling import (
        sample_to_token_budget,
        upsample_mixture,
    )

    gated = docs.select(
        "doc_id", "source", "text", F.length("text").alias("n_chars")
    ).filter(quality_gate_by_script("text")["passes"])
    # keep the best 100k chars by a quality prior (here: length prior)
    sized = sample_to_token_budget(
        gated, 100_000, size_col="n_chars",
        priority_col=F.col("n_chars").cast("double"),
    )
    # then repeat one high-value source 2x in the final epoch plan
    mix = upsample_mixture(sized, "source", {"src0": 2.0}, epoch_col="epoch")
    print("=== budgeted + upsampled mix (rows per source x epoch) ===")
    mix.groupBy("source", "epoch").count().orderBy("source", "epoch").show()

    spark.stop()


if __name__ == "__main__":
    main()
