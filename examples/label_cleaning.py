"""Label-cleaning walkthrough — the reference's "Identifying Incorrect
Labels" tutorial flow (``cleaning/`` module, notebooks under
``tutorials/corpus/``) through this engine's named Spark APIs:

    CoNLL corpus → preprocess_documents (BERT retokenize + class ids)
                 → train_model_ensemble (size x seed grid)
                 → infer_and_extract_entities_iob per model
                 → gold entities via combine_raw_spans_docs
                 → create_f1_report_ensemble (per-model P/R/F1, one plan)
                 → flag_suspicious_labels (model voting vs gold)
                 → csv_prep (hand-labeling CSV)

The reference loops documents and models on the driver (Ray actors for the
ensemble); here every per-model step is one lazy Catalyst plan over the
whole corpus, and the ensemble scoring is a single semi-join + groupBy —
at 100 TB the corpus is scanned once per stage, never once per document.

Run:  python examples/label_cleaning.py
"""

from __future__ import annotations

import os
import sys

import pyspark.sql.functions as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import text_extensions_for_pandas_spark as tep  # noqa: E402
from text_extensions_for_pandas_spark.operators.cleaning import (  # noqa: E402
    create_f1_report_ensemble,
    csv_prep,
    flag_suspicious_labels,
)
from text_extensions_for_pandas_spark.operators.iob import iob_to_iob2  # noqa: E402
from text_extensions_for_pandas_spark.operators.ml import (  # noqa: E402
    combine_raw_spans_docs,
    infer_and_extract_entities_iob,
    train_model_ensemble,
)
from text_extensions_for_pandas_spark.sources.conll import (  # noqa: E402
    conll_2003_to_dataframe,
)
from text_extensions_for_pandas_spark.sources.nlp_bridges import (  # noqa: E402
    preprocess_documents,
)

DATA = os.path.join(os.path.dirname(__file__), "..", "tests", "data")


def main() -> None:
    spark = tep.get_spark("label-cleaning-example")
    spark.sparkContext.setLogLevel("ERROR")

    # 1. Corpus: CoNLL-2003 file -> token table with gold IOB labels
    conll = conll_2003_to_dataframe(
        spark, f"{DATA}/sample.conll", fold="train"
    )
    repaired = iob_to_iob2(conll)
    docs = conll.select(
        "fold", "doc_id", F.col("doc_text").alias("text")
    ).distinct()
    print(f"corpus: {docs.count()} documents, {repaired.count()} tokens")

    # 2. Preprocess: BERT retokenization + class categoricals + embeddings
    bert_toks, class_labels, class_ids = preprocess_documents(
        repaired, docs, entity_types=["PER", "ORG"]
    )
    bert_toks = bert_toks.withColumn(
        "label", F.col("token_class_id").cast("double")
    ).cache()
    print(f"classes: {class_labels}")

    # 3. Ensemble: train the size x seed grid (each fit a distributed job)
    models = train_model_ensemble(
        bert_toks, out_dims=[8, 16], seeds=[0, 1]
    )
    print(f"trained {len(models)} models")

    # 4. Per-model entity extraction, stacked into ONE entity table
    stacked, names = None, []
    for trained in models:
        name = f"d{trained['out_dim']}_s{trained['seed']}"
        names.append(name)
        ents = infer_and_extract_entities_iob(
            trained, bert_toks, class_labels
        ).withColumn("model", F.lit(name))
        ents = ents.join(
            docs.select("fold", "doc_id").distinct(), "doc_id"
        ).select("fold", "doc_id", "span", "ent_type", "model")
        stacked = ents if stacked is None else stacked.unionByName(ents)

    # 5. Gold entities from the corpus IOB labels
    gold = combine_raw_spans_docs({"train": repaired.drop("fold")})

    # 6. Per-model scores — one semi-join + groupBy(model), no model loop
    report = create_f1_report_ensemble(stacked, gold, models=names)
    print("\nper-model F1 report:")
    for r in report.orderBy("model").collect():
        print(
            f"  {r.model}: P={r.precision:.3f} R={r.recall:.3f} "
            f"F1={r.f1:.3f}  ({r.tp}/{r.n_pred} predicted, {r.n_gold} gold)"
        )

    # 7. Vote-based label auditing: gold vs ensemble agreement
    votes = stacked.unionByName(
        gold.withColumn("model", F.lit("GOLD")).select(
            "fold", "doc_id", "span", "ent_type", "model"
        )
    )
    flagged = flag_suspicious_labels(votes, min_agreement=0.5)
    counts = {
        r.category: r.n
        for r in flagged.groupBy("category").agg(F.count("*").alias("n")).collect()
    }
    print(f"\nvote categories: {counts}")

    # 8. Hand-labeling CSV for the suspicious rows
    suspects = flagged.filter(F.col("category") != "ok")
    csv = csv_prep(suspects, docs.select("doc_id", "text"))
    print("\nhand-labeling rows:")
    csv.show(10, truncate=60)

    spark.stop()


if __name__ == "__main__":
    main()
