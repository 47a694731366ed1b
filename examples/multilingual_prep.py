"""Multilingual corpus preparation — the round-10 language front, end
to end on planted prose in eleven languages:

    documents → lang_id (16 marker profiles + script routing)
    → quality_gate_by_language (per-language stopwords, letter
      classes, word-length bounds; CJK/Thai char rules)
    → per-language token budgets (sample_to_token_budgets_by_group)
    → prep_and_shard(lang_aware=True) for the full funnel

and the incremental-refresh companion: corpus_diff between two
snapshots → per-host churn → the changed/added keys that a recrawl
would actually fetch.

Everything below is lazy Catalyst plans over row-local Column
expressions — the same code gates a 100 TB crawl or a readStream.

Run:  python examples/multilingual_prep.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import pyspark.sql.functions as F  # noqa: E402

from text_extensions_for_pandas_spark import get_spark  # noqa: E402
from text_extensions_for_pandas_spark.functions.text import (  # noqa: E402
    lang_id,
    quality_gate_by_language,
    word_tokens,
)
from text_extensions_for_pandas_spark.operators.sampling import (  # noqa: E402
    sample_to_token_budgets_by_group,
)
from text_extensions_for_pandas_spark.sources.corpus import (  # noqa: E402
    corpus_diff,
    snapshot_churn_by_host,
)

# borrow the planted prose from the gated fixture so the example and
# the oracle agree on what "good prose" means
from text_extensions_for_pandas_spark.queries import (  # noqa: E402
    _EL_PROSE,
    _EN_PROSE,
    _HE_PROSE,
    _ID_PROSE,
    _IT_PROSE,
    _NL_PROSE,
    _PL_PROSE,
    _PT_PROSE,
    _RU_PROSE,
    _TH_PROSE,
    _TR_PROSE,
    _VI_PROSE,
)


def main() -> None:
    spark = get_spark("multilingual-prep-example")
    spark.sparkContext.setLogLevel("ERROR")

    prose = [
        _RU_PROSE, _IT_PROSE, _PT_PROSE, _NL_PROSE, _PL_PROSE,
        _TR_PROSE, _ID_PROSE, _VI_PROSE, _TH_PROSE, _EL_PROSE,
        _HE_PROSE, _EN_PROSE,
        _RU_PROSE + " ##########" * 5,  # damaged twin: symbol flood
        "มา" * 300,                      # damaged twin: Thai char flood
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(prose)], "doc_id long, text string"
    )

    # 1. detect + gate (materialize toks/clean/lang: HOF args don't CSE)
    gated = (
        docs.withColumn("__toks", word_tokens(F.col("text")))
        .withColumn(
            "__clean",
            F.transform(
                F.col("__toks"),
                lambda t: F.regexp_replace(t, r"(?U)^\W+|\W+$", ""),
            ),
        )
        .withColumn("lang", lang_id(F.col("text"), toks=F.col("__toks")))
        .withColumn(
            "gate",
            quality_gate_by_language(
                F.col("text"), F.col("lang"),
                toks=F.col("__toks"), clean_toks=F.col("__clean"),
            ),
        )
        .select(
            "doc_id", "lang", F.col("gate.passes").alias("passes"),
            F.length("text").cast("long").alias("n_chars"), "text",
        )
    )
    print("\n-- detection + dispatched gate (damaged twins fail) --")
    gated.select("doc_id", "lang", "passes", "n_chars").orderBy(
        "doc_id"
    ).show(20, truncate=False)

    # 2. per-language token budgets over the survivors
    kept = gated.filter("passes")
    budget = sample_to_token_budgets_by_group(
        kept,
        {"ru": 2000, "th": 1500, "en": 800},  # unlisted languages drop
        group_col="lang",
        size_col="n_chars",
        priority_col="n_chars",
    )
    print("-- per-language token budgets (unlisted languages drop) --")
    budget.select("doc_id", "lang", "n_chars").orderBy("lang").show(
        20, truncate=False
    )

    # 3. incremental refresh: what changed since the last snapshot?
    old = docs.select(
        F.concat(F.lit("http://h"), (F.col("doc_id") % 3).cast("string"),
                 F.lit(".example/p/"), F.col("doc_id")).alias("url"),
        F.md5(F.encode("text", "utf-8")).alias("digest"),
    ).filter(F.col("url").endswith("3") == False)  # noqa: E712
    new = docs.select(
        F.concat(F.lit("http://h"), (F.col("doc_id") % 3).cast("string"),
                 F.lit(".example/p/"), F.col("doc_id")).alias("url"),
        F.when(
            F.col("doc_id") % 4 == 1,
            F.md5(F.encode(F.concat("text", F.lit("v2")), "utf-8")),
        ).otherwise(F.md5(F.encode("text", "utf-8"))).alias("digest"),
    )
    diff = corpus_diff(old, new)
    print("-- snapshot diff: the recrawl fetch list is added+changed --")
    diff.groupBy("status").count().orderBy("status").show()
    snapshot_churn_by_host(diff).orderBy("host").show(truncate=False)

    spark.stop()


if __name__ == "__main__":
    main()
