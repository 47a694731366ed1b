"""spaCy/BERT bridge tests — deterministic fallbacks in this container;
schemas and composition plumbing are what's under test."""

import os

import pyspark.sql.functions as F
import pytest

from text_extensions_for_pandas_spark.sources import nlp_bridges as B
from text_extensions_for_pandas_spark.sources.conll import conll_2003_to_dataframe

DATA = os.path.join(os.path.dirname(__file__), "data")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50).cache()


def test_make_tokens(docs):
    toks = B.make_tokens(docs)
    joined = toks.join(docs, "doc_id").filter(
        F.expr("substring(text, span.begin + 1, span.end - span.begin)")
        != F.col("token")
    )
    assert joined.count() == 0


def test_tokens_and_features_schema(docs):
    feats = B.make_tokens_and_features(docs)
    rows = feats.filter("doc_id = 0").orderBy("token_idx").collect()
    assert rows, "no tokens"
    r = rows[0]
    assert r.span.end > r.span.begin and r.lemma and r.pos in (
        "NOUN", "PROPN", "NUM", "PUNCT"
    )
    assert isinstance(r.is_alpha, bool) and isinstance(r.is_stop, bool)
    assert all(rr.sentence_id >= 0 for rr in rows)


def test_bert_tokens_fallback(docs):
    bt = B.make_bert_tokens(docs).cache()
    one = bt.filter("doc_id = 0").orderBy("token_idx").collect()
    assert one[0].token == "[CLS]" and one[0].special_tokens_mask
    assert one[0].span.begin == one[0].span.end == 0  # zero-length special
    assert one[-1].token == "[SEP]" and one[-1].special_tokens_mask
    # wordpieces reconstruct words: '##' pieces directly follow their head
    body = [r for r in one if not r.special_tokens_mask]
    assert all(r.input_id >= 1000 for r in body)
    assert any(r.token.startswith("##") for r in body) or all(
        len(r.token) <= 4 for r in body
    )


def test_add_embeddings_deterministic(docs):
    bt = B.make_bert_tokens(docs.limit(5))
    e1 = B.add_embeddings(bt, dim=8)
    rows = e1.select("token", "embedding").collect()
    by_tok = {}
    for r in rows:
        assert len(r.embedding) == 8
        if r.token in by_tok:
            assert by_tok[r.token] == r.embedding  # same token -> same vector
        by_tok[r.token] = r.embedding


def test_align_bert_tokens_to_corpus_tokens(spark):
    conll = conll_2003_to_dataframe(spark, f"{DATA}/sample.conll", fold="test")
    from text_extensions_for_pandas_spark.operators.iob import (
        iob_to_iob2,
        iob_to_spans,
    )

    repaired = iob_to_iob2(conll, doc_col=["fold", "doc_id"])
    gold = iob_to_spans(repaired, doc_col=["fold", "doc_id"]).filter("doc_id = 0")
    docs = conll.filter("doc_id = 0").select("doc_id", "doc_text").distinct()
    bert = B.make_bert_tokens(docs.select("doc_id", F.col("doc_text").alias("text")))
    aligned = B.align_bert_tokens_to_corpus_tokens(
        gold.select("doc_id", "span", "ent_type"), bert
    )
    got = {
        (r.span.begin, r.span.end, r.ent_type)
        for r in aligned.filter("aligned").collect()
    }
    # char spans shifted by the retained "-DOCSTART- " prefix (11 chars):
    # Alice Jones PER; Acme Corp ORG; Acme ORG
    assert (11, 22, "PER") in got
    assert (31, 40, "ORG") in got
    assert (75, 79, "ORG") in got


def test_conll_to_bert_composite(spark):
    conll = conll_2003_to_dataframe(spark, f"{DATA}/sample.conll", fold="test")
    from text_extensions_for_pandas_spark.operators.iob import iob_to_iob2

    repaired = iob_to_iob2(conll)
    docs = conll.select("doc_id", F.col("doc_text").alias("text")).distinct()
    out = B.conll_to_bert(repaired, docs).cache()
    assert out.filter("ent_iob = 'B'").count() >= 3
    emb = out.select("embedding").first()[0]
    assert len(emb) == 32
    # every B/I token's covered text belongs to a gold entity word
    ent_toks = out.filter("ent_iob != 'O'").join(
        docs, "doc_id"
    ).select(
        F.expr("substring(text, span.begin + 1, span.end - span.begin)").alias("t")
    ).collect()
    # fallback wordpieces: entity "Bob" expands to its covering piece "bob'"
    words = {"alic", "e", "jone", "s", "acme", "corp", "bob'"}
    assert all(r.t.lower() in words for r in ent_toks)


def test_token_features_to_tree_matches_reference(spark):
    """The displaCy manual dict (words/arcs, dense renumbering, self-link
    dropping, start<end normalization) matches the reference's converter on
    the same CoNLL-U tokens."""
    import sys
    import types

    import pandas as pd
    import pytest

    if "memoized_property" not in sys.modules:
        shim = types.ModuleType("memoized_property")

        def memoized_property(fget):
            attr = "_memo_" + fget.__name__

            @property
            def prop(self):
                if not hasattr(self, attr):
                    setattr(self, attr, fget(self))
                return getattr(self, attr)

            return prop

        shim.memoized_property = memoized_property
        sys.modules["memoized_property"] = shim
    if "/root/reference" not in sys.path:
        sys.path.append("/root/reference")
    try:
        from text_extensions_for_pandas.io.spacy import (
            token_features_to_tree as ref_tree,
        )
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference not importable: {e}")

    from text_extensions_for_pandas_spark.sources.conll import (
        conll_u_to_dataframe,
    )
    from text_extensions_for_pandas_spark.sources.nlp_bridges import (
        token_features_to_tree,
    )

    fixture = "/root/reference/test_data/io/test_conll/conll_u_test1.txt"
    toks = conll_u_to_dataframe(spark, fixture).filter(
        "doc_id = 0 and sentence_id = 0"
    )
    got = token_features_to_tree(toks)

    pdf = (
        toks.select("token_idx", "token", "upos", "deprel", "head")
        .toPandas()
        .sort_values("token_idx")
        .set_index("token_idx")
    )
    pdf["head"] = pdf["head"].astype("Int64")
    want = ref_tree(
        pdf, text_col="token", tag_col="upos", label_col="deprel"
    )
    assert got["words"] == want["words"]
    assert got["arcs"] == [
        {k: a[k] for k in ("start", "end", "label", "dir")} for a in want["arcs"]
    ]


def test_render_parse_tree_svg(spark):
    from text_extensions_for_pandas_spark.sources.nlp_bridges import (
        render_parse_tree,
    )

    toks = spark.createDataFrame(
        [
            (0, 0, "The", "DET", "det", 1),
            (0, 1, "cat", "NOUN", "nsubj", 2),
            (0, 2, "sat", "VERB", "root", None),
        ],
        "doc_id long, token_idx int, token string, upos string, "
        "deprel string, head int",
    )
    svg = render_parse_tree(toks)
    assert svg.startswith("<svg") and svg.endswith("</svg>")
    assert ">The<" in svg and ">cat<" in svg and ">sat<" in svg
    assert svg.count("class='arc'") == 2  # root has no arc
    assert "nsubj" in svg and "det" in svg
    # deterministic
    assert render_parse_tree(toks) == svg


def test_preprocess_documents_composite(spark):
    """preprocess_documents = conll_to_bert + token-class categoricals in
    one call (reference cleaning/preprocess.py:114-250)."""
    conll = conll_2003_to_dataframe(spark, f"{DATA}/sample.conll", fold="test")
    from text_extensions_for_pandas_spark.operators.iob import iob_to_iob2

    repaired = iob_to_iob2(conll)
    docs = conll.select("doc_id", F.col("doc_text").alias("text")).distinct()
    out, labels, class_ids = B.preprocess_documents(
        repaired, docs, entity_types=["PER", "ORG"]
    )
    assert labels == ["O", "B-PER", "B-ORG", "I-PER", "I-ORG"]
    assert class_ids["O"] == 0 and class_ids["B-ORG"] == 2
    rows = out.select("ent_iob", "ent_type", "token_class", "token_class_id")
    got = {(r.ent_iob, r.ent_type, r.token_class, r.token_class_id)
           for r in rows.collect()}
    for iob, typ, cls, cid in got:
        want = "O" if iob == "O" else f"{iob}-{typ}"
        assert cls == want and cid == class_ids[want]
    # both entity classes survive the BERT re-tokenization round trip
    assert {c for _, _, c, _ in got} >= {"O", "B-PER", "B-ORG"}


def test_simple_tokenize_alias(spark):
    docs = spark.createDataFrame([(0, "a-b c!")], ["doc_id", "text"])
    got = sorted(
        (r.span.begin, r.span.end, r.token)
        for r in B.simple_tokenize(docs).collect()
    )
    # whitespace + punctuation splits (reference io/spacy.py:48-72)
    assert got == [(0, 1, "a"), (1, 2, "-"), (2, 3, "b"), (4, 5, "c"), (5, 6, "!")]
