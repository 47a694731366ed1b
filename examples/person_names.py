"""Person-name extraction — the engine's end-to-end showcase, mirroring the
reference's Market Intelligence tutorial workflow
(``tutorials/market/`` in CODAIT/text-extensions-for-pandas):

    corpus → tokenize → dictionary extraction (first + last names)
           → adjacent join (first name directly before last name)
           → union with full-name matches → consolidate → covered text

Run:  python examples/person_names.py [conll_file]
"""

from __future__ import annotations

import os
import sys

import pyspark.sql.functions as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import text_extensions_for_pandas_spark as tep  # noqa: E402
from text_extensions_for_pandas_spark.functions.spans import make_span  # noqa: E402
from text_extensions_for_pandas_spark.operators.consolidate import (  # noqa: E402
    consolidate,
)
from text_extensions_for_pandas_spark.operators.extract import (  # noqa: E402
    create_dict,
    extract_dict,
)
from text_extensions_for_pandas_spark.operators.join import adjacent_join  # noqa: E402
from text_extensions_for_pandas_spark.sources.conll import (  # noqa: E402
    conll_2003_to_dataframe,
    conll_documents,
)

FIRST_NAMES = ["alice", "bob", "carol"]
LAST_NAMES = ["jones", "smith"]


def person_names(spark, conll_path: str):
    corpus = conll_2003_to_dataframe(spark, conll_path, fold="demo")
    tokens = corpus.select(
        "doc_id", "token_idx", "span", F.col("token")
    )
    docs = conll_documents(corpus).withColumnRenamed("text", "text")

    firsts = extract_dict(tokens, create_dict(spark, FIRST_NAMES)).select(
        "doc_id", "token_span", "span"
    )
    lasts = extract_dict(tokens, create_dict(spark, LAST_NAMES)).select(
        "doc_id", "token_span", "span"
    )

    # first name immediately followed by last name -> full-name span
    pairs = adjacent_join(
        firsts.select("doc_id", "token_span"),
        lasts.select("doc_id", "token_span"),
        first_name="first",
        second_name="last",
        min_gap=0,
        max_gap=0,
    )
    # recover char offsets of the covering span from the token table
    b = tokens.select(
        F.col("doc_id").alias("__bd"),
        F.col("token_idx").alias("__bi"),
        F.col("span")["begin"].alias("__bb"),
    )
    e = tokens.select(
        F.col("doc_id").alias("__ed"),
        F.col("token_idx").alias("__ei"),
        F.col("span")["end"].alias("__ee"),
    )
    full = (
        pairs.join(
            b,
            (F.col("doc_id") == F.col("__bd"))
            & (F.col("first")["begin_token"] == F.col("__bi")),
        )
        .join(
            e,
            (F.col("doc_id") == F.col("__ed"))
            & (F.col("last")["end_token"] - 1 == F.col("__ei")),
        )
        .select("doc_id", make_span(F.col("__bb"), F.col("__ee")).alias("span"))
    )

    candidates = full.unionByName(
        firsts.select("doc_id", "span")
    ).unionByName(lasts.select("doc_id", "span"))
    names = consolidate(candidates, on="span")
    return (
        names.join(docs, "doc_id")
        .select(
            "doc_id",
            F.col("span")["begin"].alias("begin"),
            F.col("span")["end"].alias("end"),
            F.expr("substring(text, span.begin + 1, span.end - span.begin)").alias(
                "person"
            ),
        )
        .orderBy("doc_id", "begin")
    )


if __name__ == "__main__":
    path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(__file__), "..", "tests", "data", "sample.conll"
    )
    spark = tep.get_spark("person-names-example")
    person_names(spark, path).show(truncate=False)
