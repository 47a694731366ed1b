"""Fixed-length overlapping windowing of token sequences — the BERT
windowing surface (reference ``seq_to_windows`` / ``windows_to_seq``,
``io/bert.py:254-396``) as set-oriented plans.

Window ``w`` of a document covers token indices
``[w * stride, w * stride + window_size)`` with ``stride = window_size -
overlap``; every token belongs to 1..⌈W/stride⌉ windows.  ``windows_to_seq``
inverts by taking each token's value from the window where the token is most
interior (deterministic tie-break on lower window id) — the reference's
keep-the-center-region rule without its padding bookkeeping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def seq_to_windows(
    tokens: DataFrame,
    window_size: int = 32,
    overlap: int = 8,
    doc_col: str = "doc_id",
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Explode each token into the windows containing it, then assemble one
    row per (doc, window): ``window_id``, padded ``token_idxs``,
    ``attention_mask`` (1 for real tokens, 0 for padding) and one array per
    value column.

    Plan: per-token arithmetic explode (narrow) + groupBy (one shuffle keyed
    by doc+window).
    """
    stride = window_size - overlap
    if stride <= 0:
        raise ValueError("window_size must exceed overlap")
    value_cols = value_cols or []

    t = F.col("token_idx")
    w_min = F.greatest(
        F.ceil((t - window_size + 1) / stride).cast("int"), F.lit(0)
    )
    w_max = F.floor(t / stride).cast("int")
    exploded = tokens.withColumn(
        "window_id", F.explode(F.sequence(w_min, w_max))
    )
    parts = exploded.groupBy(doc_col, "window_id").agg(
        F.array_sort(
            F.collect_list(
                F.struct(F.col("token_idx"), *[F.col(c) for c in value_cols])
            )
        ).alias("__parts")
    )
    idxs = F.transform("__parts", lambda s: s["token_idx"])
    n = F.size("__parts")
    pad = F.array_repeat(F.lit(None).cast("int"), window_size)
    out = parts.select(
        F.col(doc_col),
        "window_id",
        F.concat(idxs, F.slice(pad, 1, window_size - n)).alias("token_idxs"),
        F.concat(
            F.array_repeat(F.lit(1), n),
            F.array_repeat(F.lit(0), window_size - n),
        ).alias("attention_mask"),
        *[
            F.transform("__parts", _field_getter(c)).alias(f"{c}s")
            for c in value_cols
        ],
    )
    return out


def _field_getter(name: str):
    # NB: can't use `lambda s, n=name: s[n]` — pyspark treats a 2-arg lambda
    # as (element, index) and binds the default to the index variable.
    return lambda s: s[name]


def windows_to_seq(
    windows: DataFrame,
    value_col: str,
    window_size: int = 32,
    overlap: int = 8,
    doc_col: str = "doc_id",
) -> DataFrame:
    """Invert :func:`seq_to_windows` for one per-window array column:
    returns ``(doc_id, token_idx, <value_col>)`` choosing, for tokens in
    overlap regions, the window where the token is most interior."""
    stride = window_size - overlap
    exploded = windows.select(
        F.col(doc_col),
        "window_id",
        F.posexplode(F.arrays_zip("token_idxs", value_col)).alias("pos", "__z"),
    ).select(
        doc_col,
        "window_id",
        "pos",
        F.col("__z")["token_idxs"].alias("token_idx"),
        F.col("__z")[value_col].alias("__value"),
    ).filter(F.col("token_idx").isNotNull())
    # interiority = distance to nearest window edge
    interior = F.least(F.col("pos"), window_size - 1 - F.col("pos"))
    w = Window.partitionBy(doc_col, "token_idx").orderBy(
        interior.desc(), F.col("window_id").asc()
    )
    return (
        exploded.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(doc_col, "token_idx", F.col("__value").alias(value_col))
    )


def chunk_document_spans(
    tokens: DataFrame,
    window: int = 512,
    stride: int = 384,
    doc_col: str = "doc_id",
) -> DataFrame:
    """Split each document into fixed-token-budget chunks with overlap,
    returned as CHAR spans over the original text — the context-window
    chunking step of an LLM training pipeline (long doc → model-sized
    pieces; pairs with sequence packing, which bins the pieces).

    Chunk ``i`` covers tokens ``[i*stride, i*stride + window)``; the last
    chunk is the remainder (every token lands in >=1 chunk when
    ``stride <= window``).  Output: ``(doc_col, chunk_idx, span, n_tokens)``.

    Plan shape: one groupBy(doc) assembles the per-doc offset arrays, then
    a narrow ``sequence``-explode computes chunk boundaries by array index —
    documents are the parallelism unit, and a document's token offsets fit
    an executor by the same assumption that makes it usable training data.
    No window functions, no second shuffle.
    """
    if stride <= 0 or stride > window:
        raise ValueError("need 0 < stride <= window")
    agg = tokens.groupBy(doc_col).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("token_idx"),
                    F.col("span")["begin"].alias("b"),
                    F.col("span")["end"].alias("e"),
                )
            )
        ).alias("__toks")
    )
    n = F.size("__toks")
    n_chunks = (
        F.lit(1)
        + F.ceil(F.greatest(n - window, F.lit(0)) / F.lit(stride))
    ).cast("int")
    out = agg.select(
        F.col(doc_col),
        n.alias("__n"),
        F.col("__toks"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    start = F.col("chunk_idx") * stride
    stop = F.least(start + window, F.col("__n"))  # exclusive
    return out.select(
        doc_col,
        "chunk_idx",
        F.struct(
            F.element_at("__toks", start + 1)["b"].alias("begin"),
            F.element_at("__toks", stop)["e"].alias("end"),
        ).alias("span"),
        (stop - start).cast("int").alias("n_tokens"),
    )
