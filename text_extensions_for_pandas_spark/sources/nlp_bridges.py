"""spaCy / HuggingFace-BERT front-ends, Spark-first.

Reference behavior reimplemented: ``make_tokens`` / ``make_tokens_and_
features`` (``io/spacy.py:75-152``), ``make_bert_tokens`` + ``add_
embeddings`` (``io/bert.py:51-157``), ``align_bert_tokens_to_corpus_
tokens`` (``io/bert.py:202-251``), ``conll_to_bert`` (``io/bert.py:
160-199``).

Every bridge is an Arrow-batched pandas UDF over the documents table — the
NLP library runs data-parallel on executors, one Python call per batch.
spaCy / transformers / torch are NOT installed in this container, so each
bridge degrades to a clearly-marked DETERMINISTIC FALLBACK that produces
the same schema (and sensible values) from pure Python — the Spark plumbing
(UDF signatures, explode shapes, alignment joins, window compositions) is
identical either way, which is what the engine actually owns.  Swapping the
real models in changes only the closure body.
"""

from __future__ import annotations

import hashlib
import re
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from text_extensions_for_pandas_spark.functions.spans import make_span
from text_extensions_for_pandas_spark.functions.text import (
    DEFAULT_TOKEN_PATTERN,
    STOPWORDS,
    tokenize_regex,
)

TOKEN_FEATURES_DDL = (
    "doc_id long, token_idx int, begin int, end int, token string, "
    "lemma string, pos string, tag string, dep string, head int, "
    "shape string, ent_iob string, ent_type string, is_alpha boolean, "
    "is_stop boolean, sentence_id int"
)

BERT_TOKENS_DDL = (
    "doc_id long, token_idx int, begin int, end int, token string, "
    "input_id int, token_type_id int, attention_mask int, "
    "special_tokens_mask boolean"
)


def _spacy_nlp(language_model: str):
    try:
        import spacy

        return spacy.load(language_model)
    except ImportError:
        return None


def make_tokens(
    documents: DataFrame,
    text_col: str = "text",
    doc_col: str = "doc_id",
) -> DataFrame:
    """Tokenizer front-end (reference ``make_tokens``, ``io/spacy.py:75-90``):
    spaCy-ish word/punctuation splitting via the regex tokenizer — the
    canonical ``(doc_id, token_idx, span, token)`` table."""
    return tokenize_regex(documents, DEFAULT_TOKEN_PATTERN, text_col, doc_col)


# Reference ``simple_tokenizer`` (``io/spacy.py:48-72``) returns a spaCy
# Tokenizer object that splits on whitespace and punctuation, recommended
# for dictionary/regex matching.  A tokenizer-as-object has no Spark
# analogue — the splitting is a plan fragment — so the equivalent surface
# is the tokenizing function itself, with identical split semantics
# (DEFAULT_TOKEN_PATTERN: word runs | single punctuation marks).
simple_tokenize = make_tokens


_SHAPE_RE = [
    (re.compile(r"[A-Z]"), "X"),
    (re.compile(r"[a-z]"), "x"),
    (re.compile(r"[0-9]"), "d"),
]


def _token_shape(tok: str) -> str:
    """spaCy-style shape: char classes, runs > 4 collapsed."""
    s = tok
    for rex, repl in _SHAPE_RE:
        s = rex.sub(repl, s)
    return re.sub(r"(.)\1{3,}", r"\1\1\1\1", s)


def make_tokens_and_features(
    documents: DataFrame,
    language_model: str = "en_core_web_sm",
    text_col: str = "text",
    doc_col: str = "doc_id",
) -> DataFrame:
    """Full-pipeline token features (reference ``make_tokens_and_features``,
    ``io/spacy.py:93-152``): one row per token with lemma / pos / tag / dep
    / head / shape / ent_iob / ent_type / is_alpha / is_stop / sentence_id.

    With spaCy importable the real pipeline runs inside the UDF.  FALLBACK
    (this container): deterministic heuristics — regex tokens, suffix-strip
    lemma, coarse pos from character classes, sentence ids from [.!?]
    boundaries, 'O' entities — same schema, stable values.
    """
    nlp = None  # resolved lazily on executors

    def _featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        nonlocal nlp
        rex = re.compile(DEFAULT_TOKEN_PATTERN)
        nlp_local = _spacy_nlp(language_model)
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf[doc_col], pdf[text_col]):
                text = text or ""
                if nlp_local is not None:
                    doc = nlp_local(text)
                    sent_of = {}
                    for sid, sent in enumerate(doc.sents):
                        for tok in sent:
                            sent_of[tok.i] = sid
                    for tok in doc:
                        rows.append(
                            (
                                int(doc_id), tok.i, tok.idx,
                                tok.idx + len(tok.text), tok.text, tok.lemma_,
                                tok.pos_, tok.tag_, tok.dep_, tok.head.i,
                                tok.shape_, tok.ent_iob_, tok.ent_type_ or None,
                                tok.is_alpha, tok.is_stop, sent_of.get(tok.i, 0),
                            )
                        )
                    continue
                # ---- deterministic fallback ----
                sent_id = 0
                for idx, m in enumerate(rex.finditer(text)):
                    tok = m.group(0)
                    low = tok.lower()
                    is_alpha = tok.isalpha()
                    if tok.isdigit():
                        pos = "NUM"
                    elif not is_alpha:
                        pos = "PUNCT"
                    elif tok[0].isupper() and m.start() > 0:
                        pos = "PROPN"
                    else:
                        pos = "NOUN"
                    lemma = re.sub(r"(ing|ed|es|s)$", "", low) if is_alpha else low
                    rows.append(
                        (
                            int(doc_id), idx, m.start(), m.end(), tok,
                            lemma or low, pos, pos, "dep", idx, _token_shape(tok),
                            "O", None, is_alpha, low in STOPWORDS, sent_id,
                        )
                    )
                    if tok in ".!?":
                        sent_id += 1
            cols = [f.split(" ")[0] for f in TOKEN_FEATURES_DDL.split(", ")]
            yield pd.DataFrame(rows, columns=cols)

    parsed = documents.select(doc_col, text_col).mapInPandas(
        _featurize, schema=TOKEN_FEATURES_DDL
    )
    return parsed.select(
        doc_col,
        "token_idx",
        make_span(F.col("begin"), F.col("end")).alias("span"),
        *[
            c
            for c in parsed.columns
            if c not in (doc_col, "token_idx", "begin", "end")
        ],
    )


def _fake_wordpiece(tok: str) -> list[str]:
    """DETERMINISTIC FALLBACK subword split: 4-char pieces with ``##``
    continuation markers — exercises the real multi-subtoken alignment
    paths without a vocab file."""
    low = tok.lower()
    if len(low) <= 4:
        return [low]
    return [low[:4]] + ["##" + low[i:i + 4] for i in range(4, len(low), 4)]


def _fake_input_id(piece: str, vocab_size: int = 30522) -> int:
    return 1000 + int.from_bytes(
        hashlib.md5(piece.encode()).digest()[:4], "big"
    ) % (vocab_size - 1000)


def make_bert_tokens(
    documents: DataFrame,
    tokenizer_name: str = "bert-base-uncased",
    text_col: str = "text",
    doc_col: str = "doc_id",
) -> DataFrame:
    """BERT tokenization (reference ``make_bert_tokens``, ``io/bert.py:
    51-120``): one row per subtoken with input ids and masks; [CLS]/[SEP]
    special tokens become zero-length spans at document start/end.

    Real path: HF fast tokenizer (offsets from ``return_offsets_mapping``).
    FALLBACK: whitespace words → deterministic 4-char wordpieces with
    md5-derived input ids.
    """

    def _tok(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            from transformers import AutoTokenizer  # not in container

            hf = AutoTokenizer.from_pretrained(tokenizer_name, use_fast=True)
        except ImportError:
            hf = None
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf[doc_col], pdf[text_col]):
                text = text or ""
                if hf is not None:
                    enc = hf(
                        text,
                        return_offsets_mapping=True,
                        return_special_tokens_mask=True,
                        return_attention_mask=True,
                        return_token_type_ids=True,
                    )
                    for i, (iid, (b, e), sp, am, tt) in enumerate(
                        zip(
                            enc["input_ids"], enc["offset_mapping"],
                            enc["special_tokens_mask"], enc["attention_mask"],
                            enc["token_type_ids"],
                        )
                    ):
                        tok_text = text[b:e]
                        rows.append(
                            (int(doc_id), i, b, e, tok_text, iid, tt, am, bool(sp))
                        )
                    continue
                # ---- deterministic fallback ----
                idx = 0
                rows.append(
                    (int(doc_id), idx, 0, 0, "[CLS]", 101, 0, 1, True)
                )
                idx += 1
                for m in re.finditer(r"\S+", text):
                    word = m.group(0)
                    off = m.start()
                    for piece in _fake_wordpiece(word):
                        plen = len(piece) - 2 if piece.startswith("##") else len(piece)
                        rows.append(
                            (
                                int(doc_id), idx, off, off + plen, piece,
                                _fake_input_id(piece), 0, 1, False,
                            )
                        )
                        off += plen
                        idx += 1
                rows.append(
                    (int(doc_id), idx, len(text), len(text), "[SEP]", 102, 0, 1, True)
                )
            cols = [f.split(" ")[0] for f in BERT_TOKENS_DDL.split(", ")]
            yield pd.DataFrame(rows, columns=cols)

    parsed = documents.select(doc_col, text_col).mapInPandas(
        _tok, schema=BERT_TOKENS_DDL
    )
    return parsed.select(
        doc_col,
        "token_idx",
        make_span(F.col("begin"), F.col("end")).alias("span"),
        *[
            c
            for c in parsed.columns
            if c not in (doc_col, "token_idx", "begin", "end")
        ],
    )


def add_embeddings(
    bert_tokens: DataFrame,
    dim: int = 32,
    model_name: str = "bert-base-uncased",
    token_col: str = "token",
) -> DataFrame:
    """Per-token embeddings as ``array<float>`` (reference
    ``add_embeddings``, ``io/bert.py:123-157`` — a torch forward pass over
    ``seq_to_windows`` batches).

    Real path: torch model in an iterator pandas UDF (weights loaded once
    per executor, batches streamed through).  FALLBACK: deterministic
    md5-seeded unit vectors per distinct token text — downstream tensor
    math (ensemble training, ANN search) behaves identically.
    """

    @F.pandas_udf("array<float>")
    def _embed(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        try:
            import torch  # noqa: F401 — not in container
            from transformers import AutoModel

            model = AutoModel.from_pretrained(model_name)
            real = True
        except ImportError:
            real = False
        cache: dict[str, list[float]] = {}
        for toks in it:
            if real:
                # (kept minimal: embed token strings one window per batch)
                raise NotImplementedError(
                    "torch path requires windowed input_ids; use "
                    "seq_to_windows + a task-specific forward fn"
                )
            out = []
            for tok in toks:
                v = cache.get(tok)
                if v is None:
                    seed = int.from_bytes(
                        hashlib.md5((tok or "").encode()).digest()[:8], "big"
                    )
                    vec = np.random.default_rng(seed).normal(size=dim)
                    v = (vec / np.linalg.norm(vec)).astype(np.float32).tolist()
                    cache[tok] = v
                out.append(v)
            yield pd.Series(out)

    return bert_tokens.withColumn("embedding", _embed(F.col(token_col)))


def align_bert_tokens_to_corpus_tokens(
    spans: DataFrame,
    corpus_tokens: DataFrame,
    doc_col: str = "doc_id",
    entity_type_col: str = "ent_type",
) -> DataFrame:
    """Expand model-output spans (BERT tokenization) to align with the
    corpus tokenization (reference ``io/bert.py:202-251``): overlap-join
    entity spans with corpus tokens, cover each entity with the minimal
    span of its overlapped tokens, consolidate, re-align to token offsets.
    """
    from text_extensions_for_pandas_spark.operators.align import align_to_tokens
    from text_extensions_for_pandas_spark.operators.consolidate import consolidate
    from text_extensions_for_pandas_spark.operators.join import overlap_join

    pairs = overlap_join(
        spans.select(doc_col, "span", entity_type_col),
        corpus_tokens.select(doc_col, "span"),
        first_name="ent",
        second_name="corpus_token",
        doc_col=doc_col,
    )
    ent_types = spans.select(
        doc_col, F.col("span").alias("ent"), F.col(entity_type_col)
    ).dropDuplicates([doc_col, "ent"])
    covered = (
        pairs.groupBy(doc_col, "ent")
        .agg(
            F.min(F.col("corpus_token")["begin"]).alias("__b"),
            F.max(F.col("corpus_token")["end"]).alias("__e"),
        )
        .join(ent_types, [doc_col, "ent"])
        .select(
            doc_col,
            make_span(F.col("__b"), F.col("__e")).alias("span"),
            entity_type_col,
        )
    )
    cons = consolidate(covered, on="span", doc_col=doc_col)
    return align_to_tokens(corpus_tokens, cons, doc_col=doc_col).select(
        doc_col, "token_span", "span", entity_type_col, "aligned"
    )


def conll_to_bert(
    corpus_tokens: DataFrame,
    documents: DataFrame,
    iob_col: str = "ent_iob",
    type_col: str = "ent_type",
    doc_col: str = "doc_id",
    embedding_dim: int = 32,
) -> DataFrame:
    """The reference's end-to-end model-preprocessing composite
    (``io/bert.py:160-199``): gold IOB → entity spans; BERT re-tokenize;
    re-label the BERT tokens with IOB over the new tokenization; attach
    embeddings — one lazy multi-document plan instead of the reference's
    per-document loop."""
    from text_extensions_for_pandas_spark.operators.iob import (
        iob_to_spans,
        spans_to_iob,
    )

    gold = iob_to_spans(
        corpus_tokens, iob_col=iob_col, type_col=type_col, doc_col=doc_col
    )
    bert_toks = make_bert_tokens(documents, doc_col=doc_col)
    on_bert = align_bert_tokens_to_corpus_tokens(
        gold.select(doc_col, "span", F.col(type_col)),
        bert_toks,
        doc_col=doc_col,
        entity_type_col=type_col,
    ).filter(F.col("aligned"))
    relabeled = spans_to_iob(
        bert_toks,
        on_bert.select(doc_col, "token_span", type_col),
        type_col=type_col,
        doc_col=doc_col,
    )
    return add_embeddings(relabeled, dim=embedding_dim)


def preprocess_documents(
    corpus_tokens: DataFrame,
    documents: DataFrame,
    entity_types: list[str],
    iob_col: str = "ent_iob",
    type_col: str = "ent_type",
    doc_col: str = "doc_id",
    embedding_dim: int = 32,
) -> tuple[DataFrame, list[str], dict[str, int]]:
    """Full corpus preprocessing for token classification (reference
    ``preprocess_documents``, ``cleaning/preprocess.py:114-250``):
    BERT-retokenize + relabel (:func:`conll_to_bert`), then attach the
    categorical ``token_class``/``token_class_id`` columns derived from
    ``entity_types``.

    The reference takes a fold → list-of-document-frames dict and loops;
    here the corpus is ONE DataFrame (``fold``/``doc_id`` columns) and one
    lazy plan covers every fold.  Returns ``(tokens, class_labels,
    class_id_map)`` — the same triple the reference's downstream training
    code consumes."""
    from text_extensions_for_pandas_spark.operators.iob import (
        add_token_classes,
        make_iob_tag_categories,
    )

    labels, class_ids = make_iob_tag_categories(entity_types)
    bert = conll_to_bert(
        corpus_tokens,
        documents,
        iob_col=iob_col,
        type_col=type_col,
        doc_col=doc_col,
        embedding_dim=embedding_dim,
    )
    return (
        add_token_classes(bert, class_ids, iob_col=iob_col, type_col=type_col),
        labels,
        class_ids,
    )


# ---------------------------------------------------------------------------
# Dependency parse-tree rendering (reference io/spacy.py:177-293)
# ---------------------------------------------------------------------------

def token_features_to_tree(
    tokens: DataFrame,
    text_col: str = "token",
    tag_col: str = "upos",
    label_col: str = "deprel",
    head_col: str = "head",
    token_idx_col: str = "token_idx",
) -> dict:
    """One document's token-features rows → displaCy's "manual" dependency
    input ``{"words": [...], "arcs": [...]}`` (reference
    ``token_features_to_tree``, ``io/spacy.py:177-256``).

    Driver-side by design (a parse tree is rendered for one bounded
    document — ``filter`` + ``limit`` first).  Heads are renumbered to
    dense 0-based positions; heads outside the input rows (including NULL
    roots) become self-links and are dropped, and every arc is normalized
    to ``start < end`` with a ``dir`` flag, exactly as the reference does
    for displaCy's renderer."""
    cols = [token_idx_col, head_col]
    cols += [c for c in (text_col, tag_col, label_col) if c is not None]
    rows = sorted(tokens.select(*cols).collect(), key=lambda r: r[token_idx_col])

    tok_map = {r[token_idx_col]: i for i, r in enumerate(rows)}
    words = [
        {
            "text": str(r[text_col]) if text_col else "",
            "tag": str(r[tag_col]) if tag_col and r[tag_col] is not None else "",
        }
        for r in rows
    ]
    arcs = []
    for i, r in enumerate(rows):
        head = tok_map.get(r[head_col], i)
        if head == i:
            continue  # self-link (root or head outside the selection)
        arcs.append(
            {
                "start": min(i, head),
                "end": max(i, head),
                "label": str(r[label_col]) if label_col and r[label_col] is not None else "",
                "dir": "right" if i > head else "left",
            }
        )
    return {"words": words, "arcs": arcs}


def render_parse_tree(
    tokens: DataFrame,
    text_col: str = "token",
    tag_col: str = "upos",
    label_col: str = "deprel",
    head_col: str = "head",
    token_idx_col: str = "token_idx",
) -> str:
    """Render one document's dependency parse as HTML (reference
    ``render_parse_tree``, ``io/spacy.py:259-293``).

    When spaCy is importable its displaCy renderer is used on the manual
    dict from :func:`token_features_to_tree`; otherwise a built-in
    deterministic SVG renderer draws the same words/arcs layout (tokens on
    a baseline with tags beneath, arcs as labeled arches with the
    arrowhead at the dependent end) so notebooks work without spaCy."""
    tree = token_features_to_tree(
        tokens, text_col, tag_col, label_col, head_col, token_idx_col
    )
    try:
        import spacy.displacy  # pragma: no cover - not in this container

        return spacy.displacy.render(tree, manual=True)
    except ImportError:
        return _render_tree_svg(tree)


def _render_tree_svg(tree: dict, x_step: int = 110, arc_step: int = 28) -> str:
    """Minimal displaCy-style SVG for a manual words/arcs dict."""
    import html as _html

    words, arcs = tree["words"], tree["arcs"]
    base_y = 30 + arc_step * (max((a["end"] - a["start"]) for a in arcs) if arcs else 1)
    width = x_step * max(1, len(words)) + 40
    height = base_y + 50
    x_of = lambda i: 40 + i * x_step  # noqa: E731

    parts = [
        f"<svg class='parse-tree' xmlns='http://www.w3.org/2000/svg' "
        f"width='{width}' height='{height}' viewBox='0 0 {width} {height}'>"
    ]
    for i, w in enumerate(words):
        parts.append(
            f"<text class='word' x='{x_of(i)}' y='{base_y}' "
            f"text-anchor='middle'>{_html.escape(w['text'])}</text>"
        )
        if w["tag"]:
            parts.append(
                f"<text class='tag' x='{x_of(i)}' y='{base_y + 18}' "
                f"text-anchor='middle'>{_html.escape(w['tag'])}</text>"
            )
    for a in sorted(arcs, key=lambda a: (a["start"], a["end"])):
        x1, x2 = x_of(a["start"]), x_of(a["end"])
        top = base_y - 14 - arc_step * (a["end"] - a["start"])
        mid = (x1 + x2) // 2
        # arrowhead at the dependent: start for "left" arcs, end for "right"
        ax = x1 if a["dir"] == "left" else x2
        parts.append(
            f"<path class='arc' d='M {x1} {base_y - 14} C {x1} {top}, "
            f"{x2} {top}, {x2} {base_y - 14}' fill='none' stroke='currentColor'/>"
        )
        parts.append(
            f"<polygon class='arrow' points='{ax - 3},{base_y - 18} "
            f"{ax + 3},{base_y - 18} {ax},{base_y - 12}'/>"
        )
        if a["label"]:
            parts.append(
                f"<text class='label' x='{mid}' y='{(base_y - 14 + top) // 2}' "
                f"text-anchor='middle' font-size='0.75em'>"
                f"{_html.escape(a['label'])}</text>"
            )
    parts.append("</svg>")
    return "".join(parts)


# reference spelling of the tokenizer-object accessor (io/spacy.py:48)
simple_tokenizer = simple_tokenize
