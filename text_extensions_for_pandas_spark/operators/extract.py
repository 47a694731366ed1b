"""Extract operators — the "scan" of spanner algebra
(reference ``spanner/extract.py``), re-expressed Spark-first.

All operators are multi-document by construction: inputs are corpus-wide
DataFrames keyed by ``doc_id``, outputs are span tables
``(doc_id, span [, token_span], <output_col>)``.
"""

from __future__ import annotations

import re
from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from text_extensions_for_pandas_spark.functions.spans import make_span, make_token_span


def extract_regex(
    documents: DataFrame,
    pattern: str,
    text_col: str = "text",
    doc_col: str = "doc_id",
    output_col: str = "match",
) -> DataFrame:
    """All non-overlapping regex matches over each document's text → spans.

    Reference: ``extract_regex`` (``spanner/extract.py:240-261``) — a
    driver-side ``finditer`` loop over one document.  Here: an Arrow-batched
    pandas UDF returning ``array<struct<begin,end>>`` per document, then
    ``explode`` — one Python call per Arrow batch, parallel over the corpus,
    no shuffle at all (narrow transform of the documents scan).
    """

    @F.pandas_udf("array<struct<begin:int,end:int>>")
    def _find(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        rex = re.compile(pattern)
        for texts in it:
            yield texts.map(
                lambda t: [(m.start(), m.end()) for m in rex.finditer(t or "")]
            )

    return documents.select(
        F.col(doc_col),
        F.explode(_find(F.col(text_col))).alias("__m"),
        F.col(text_col).alias("__text"),
    ).select(
        doc_col,
        make_span(F.col("__m.begin"), F.col("__m.end")).alias("span"),
        F.expr(
            "substring(__text, __m.begin + 1, __m.end - __m.begin)"
        ).alias(output_col),
    )


def extract_regex_native(
    documents: DataFrame,
    pattern: str,
    text_col: str = "text",
    doc_col: str = "doc_id",
    output_col: str = "match",
) -> DataFrame:
    """All non-overlapping regex matches with exact char offsets, computed
    ENTIRELY JVM-side — the scale-path twin of :func:`extract_regex`
    (which runs Python ``re`` inside an Arrow UDF for bug-compatible
    reference semantics, ``spanner/extract.py:240-261``).

    Spark has no all-matches-with-positions builtin, so offsets are
    recovered from the interleaving identity: ``split`` yields the
    inter-match segments ``s_0..s_n`` while ``regexp_extract_all`` yields
    the matches ``m_0..m_{n-1}``, and the text is exactly
    ``s_0 m_0 s_1 m_1 … s_n``.  Hence with one per-doc running sum
    ``end_i = Σ_{j<=i}(|s_j| + |m_j|)`` and ``begin_i = end_i - |m_i|``.
    One narrow explode + one window cumsum partitioned by ``doc_id`` —
    no Python worker, whole-stage codegen end to end; at corpus scale the
    only wide op is the per-doc window (documents are the parallelism
    unit, same as tokenization).

    Caveats vs the UDF twin: Java regex dialect, and zero-width matches
    are unsupported (``split`` cannot interleave them).
    """
    base = documents.select(
        F.col(doc_col),
        F.split(F.col(text_col), pattern, -1).alias("__segs"),
        F.regexp_extract_all(F.col(text_col), F.lit(pattern), F.lit(0)).alias(
            "__ms"
        ),
    )
    e = base.select(
        doc_col,
        F.posexplode("__ms").alias("__i", output_col),
        F.col("__segs"),
    ).select(
        doc_col,
        "__i",
        output_col,
        F.length(F.get("__segs", F.col("__i"))).alias("__sl"),
        F.length(output_col).alias("__ml"),
    )
    w = (
        Window.partitionBy(doc_col)
        .orderBy("__i")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pos = e.withColumn("__end", F.sum(F.col("__sl") + F.col("__ml")).over(w))
    return pos.select(
        doc_col,
        make_span(
            (F.col("__end") - F.col("__ml")).cast("int"),
            F.col("__end").cast("int"),
        ).alias("span"),
        output_col,
    )


def extract_regex_tok(
    tokens: DataFrame,
    pattern: str,
    min_len: int = 1,
    max_len: int = 1,
    doc_col: str = "doc_id",
    output_col: str = "match",
) -> DataFrame:
    """All (possibly overlapping) regex matches that start and end on token
    boundaries, between ``min_len`` and ``max_len`` tokens long.

    Reference: ``extract_regex_tok`` (``spanner/extract.py:196-237``) — an
    O(n·len) window loop the authors flagged as inefficient.  Spark-first
    design: explode each start token into its candidate window lengths
    (``sequence`` + ``explode`` — the same rewrite the reference uses for
    adjacent_join gaps), then a single equijoin on
    ``(doc_id, end_token_idx)`` to find the window-end token, then an
    anchored ``rlike`` on the candidate covered text.  One shuffle join total
    regardless of ``max_len`` — and since both sides are the same token table
    partitioned by doc, AQE turns it into a local join per partition.

    Input ``tokens`` must have columns (doc_col, token_idx, span, token).
    Matching uses Java regex semantics (``rlike``), anchored.
    """
    if max_len < min_len:
        raise ValueError(
            f"max_len ({max_len}) must be >= min_len ({min_len})"
        )  # guard: F.sequence would silently generate a descending range
    starts = tokens.select(
        F.col(doc_col),
        F.col("token_idx").alias("__b_idx"),
        F.col("span")["begin"].alias("__b_char"),
        F.explode(
            F.sequence(F.lit(min_len), F.lit(max_len))
        ).alias("__len"),
    ).withColumn("__e_idx", F.col("__b_idx") + F.col("__len") - 1)

    ends = tokens.select(
        F.col(doc_col).alias("__e_doc"),
        F.col("token_idx").alias("__e_idx2"),
        F.col("span")["end"].alias("__e_char"),
    )

    cands = starts.join(
        ends,
        (F.col(doc_col) == F.col("__e_doc")) & (F.col("__e_idx") == F.col("__e_idx2")),
        "inner",
    )
    anchored = f"^(?:{pattern})$"
    return (
        cands.select(
            F.col(doc_col),
            make_token_span(F.col("__b_idx"), F.col("__e_idx") + 1).alias("token_span"),
            make_span(F.col("__b_char"), F.col("__e_char")).alias("span"),
        )
        # covered text needs the document text; join lazily only for the filter
        .join(_doc_text_of(tokens, doc_col), doc_col)
        .withColumn(
            output_col,
            F.expr("substring(__doc_text, span.begin + 1, span.end - span.begin)"),
        )
        .filter(F.col(output_col).rlike(anchored))
        .drop("__doc_text")
    )


def _doc_text_of(tokens_or_docs: DataFrame, doc_col: str) -> DataFrame:
    """Helper: a (doc_id, __doc_text) table. If the input already carries a
    ``text`` column use it; otherwise caller should join documents first."""
    if "text" in tokens_or_docs.columns:
        return tokens_or_docs.select(
            F.col(doc_col), F.col("text").alias("__doc_text")
        ).dropDuplicates([doc_col])
    raise ValueError(
        "extract_regex_tok needs a 'text' column on the tokens input "
        "(join documents first) to evaluate candidate covered text"
    )


def create_dict(
    spark: SparkSession, entries: Iterable[str], tokenizer=None
) -> DataFrame:
    """Build a gazetteer DataFrame ``(entry_id, toks ARRAY<STRING>, n_toks)``
    from entry strings; entries are lowercased and tokenized.

    Reference: ``create_dict`` (``spanner/extract.py:70-109``) stores
    None-terminated ``toks_0..n`` columns; an array column is the natural
    Spark shape (FIXTURES.md §3).  ``tokenizer`` is a str->list[str] callable
    and **must tokenize the same way as the corpus tokenizer**
    (reference ``spanner/extract.py:80-83``); default = whitespace split,
    matching :func:`~text_extensions_for_pandas_spark.functions.text.tokenize_whitespace`.
    """
    tok = tokenizer or (lambda s: s.split())
    rows = [(i, tok(e.lower())) for i, e in enumerate(entries)]
    df = spark.createDataFrame(rows, "entry_id int, toks array<string>")
    return df.withColumn("n_toks", F.size("toks"))


def load_dict(spark: SparkSession, file_name: str, tokenizer=None) -> DataFrame:
    """Read a SystemT-format dictionary file (one entry per line, ``#``
    comments) → gazetteer DataFrame (reference ``spanner/extract.py:44-66``).
    Driver-side parse — dictionary files are small by contract."""
    with open(file_name) as f:
        lines = [ln.strip() for ln in f if ln.strip() and ln[0] != "#"]
    return create_dict(spark, lines, tokenizer)


def extract_dict(
    tokens: DataFrame,
    dictionary: DataFrame,
    doc_col: str = "doc_id",
    output_col: str = "match",
) -> DataFrame:
    """Gazetteer matching: find every place where a dictionary entry's token
    sequence occurs in the corpus token stream.

    Reference: ``extract_dict`` (``spanner/extract.py:112-193``) — an
    iterative merge per token position.  Spark-first design: **one** join +
    **one** aggregation, independent of entry length:

    1. explode the (broadcast) dictionary into ``(entry_id, pos, tok)``;
    2. equijoin on normalized token text — each corpus token proposes
       ``begin = token_idx - pos`` for each entry position it could fill;
    3. group by ``(doc_id, entry_id, begin)``: a real match has all
       ``n_toks`` distinct positions present.

    The join broadcasts the exploded dictionary (gazetteers are small); the
    groupBy shuffles only candidate rows, keyed by doc — at 100 TB this is
    the selective path (corpus tokens that match no dictionary token are
    dropped by the join before any shuffle).

    Output: ``(doc_id, token_span, span, <output_col>)``, sorted by position
    within each doc (reference sorts by begin, ``spanner/extract.py:191-193``).
    """
    dict_toks = dictionary.select(
        "entry_id",
        "n_toks",
        F.posexplode("toks").alias("pos", "__dict_tok"),
    )
    cand = tokens.join(
        F.broadcast(dict_toks),
        F.lower(tokens["token"]) == dict_toks["__dict_tok"],
        "inner",
    ).select(
        F.col(doc_col),
        "entry_id",
        "n_toks",
        (F.col("token_idx") - F.col("pos")).alias("__begin_tok"),
        "pos",
        F.col("span")["begin"].alias("__char_b"),
        F.col("span")["end"].alias("__char_e"),
    )
    # (doc, entry, __begin_tok, pos) is unique by construction — one corpus
    # token owns each token_idx and the dictionary has one row per (entry,
    # pos) — so plain count(*) equals the distinct-position count, and the
    # match's char endpoints are simply the pos==0 / pos==n-1 rows' values.
    # This keeps the aggregation hash-based with ONE exchange; the earlier
    # countDistinct + min/max-over-struct form planned as a double-exchange
    # SortAggregate chain.
    matches = (
        cand.filter(F.col("__begin_tok") >= 0)
        .groupBy(doc_col, "entry_id", "n_toks", "__begin_tok")
        .agg(
            F.count("*").alias("__npos"),
            F.min(F.when(F.col("pos") == 0, F.col("__char_b"))).alias("__b"),
            F.max(
                F.when(F.col("pos") == F.col("n_toks") - 1, F.col("__char_e"))
            ).alias("__e"),
        )
        .filter(F.col("__npos") == F.col("n_toks"))
    )
    return matches.select(
        F.col(doc_col),
        make_token_span(
            F.col("__begin_tok"), F.col("__begin_tok") + F.col("n_toks")
        ).alias("token_span"),
        make_span(F.col("__b"), F.col("__e")).alias("span"),
        F.col("entry_id"),
    )


def token_array(text_col):
    """Whitespace token array with exact char offsets as a pure column
    expression: ``array<struct<idx,begin,end,token>>`` — the row-local twin
    of :func:`~text_extensions_for_pandas_spark.functions.text.tokenize_whitespace`
    (empty segments advance the cursor but emit nothing)."""
    segs = F.split(F.translate(text_col, "\t\n\r", "   "), " ")
    return F.aggregate(
        segs,
        F.struct(
            F.lit(0).alias("cur"),
            F.array().cast(
                "array<struct<idx:int,begin:int,end:int,token:string>>"
            ).alias("toks"),
        ),
        lambda acc, seg: F.struct(
            (acc["cur"] + F.length(seg) + 1).alias("cur"),
            F.when(F.length(seg) > 0, F.array_append(
                acc["toks"],
                F.struct(
                    F.size(acc["toks"]).alias("idx"),
                    acc["cur"].cast("int").alias("begin"),
                    (acc["cur"] + F.length(seg)).cast("int").alias("end"),
                    seg.alias("token"),
                ),
            )).otherwise(acc["toks"]).alias("toks"),
        ),
        lambda acc: acc["toks"],
    )


def extract_dict_consolidated_rowwise(
    documents: DataFrame,
    entries: list[str],
    text_col: str = "text",
    doc_col: str = "doc_id",
) -> DataFrame:
    """Gazetteer extraction + left-to-right consolidation as ONE pure
    column expression per document row — zero joins, zero shuffles, zero
    state: the fully stream-transparent pipeline (batch ``extract_dict`` →
    ``consolidate`` produces the same rows; verified in tests).

    The dictionary rides in the plan as literals (gazetteers are small by
    contract, reference ``spanner/extract.py:93-109``).  Output:
    ``(doc_id, span, entry_id)``.
    """
    from functools import reduce as _reduce
    from operator import and_ as _and

    from text_extensions_for_pandas_spark.operators.consolidate import (
        consolidate_array,
    )

    toks = F.col("__toks")

    def entry_matches(parts: list[str], eid: int):
        # factory so each closure binds its own parts/eid (and the lambdas
        # keep arity 1 — pyspark inspects lambda signatures)
        n = len(parts)

        def pred(i):
            return _reduce(
                _and,
                [
                    F.lower(F.element_at(toks, i + j + 1)["token"])
                    == F.lit(parts[j])
                    for j in range(n)
                ],
            )

        def to_match(i):
            return F.struct(
                F.element_at(toks, i + 1)["begin"].alias("begin"),
                F.element_at(toks, i + n)["end"].alias("end"),
                F.lit(eid).alias("entry_id"),
            )

        starts = F.when(
            F.size(toks) >= n,
            F.filter(F.sequence(F.lit(0), F.size(toks) - n), pred),
        ).otherwise(F.array().cast("array<int>"))
        return F.transform(starts, to_match)

    per_entry = [
        entry_matches(entry.lower().split(), eid)
        for eid, entry in enumerate(entries)
    ]
    matches = F.flatten(F.array(*per_entry))
    kept = consolidate_array(
        matches, element_type="struct<begin:int,end:int,entry_id:int>"
    )
    return (
        documents.withColumn("__toks", token_array(F.col(text_col)))
        .select(F.col(doc_col), F.explode(kept).alias("__m"))
        .select(
            doc_col,
            make_span(F.col("__m.begin"), F.col("__m.end")).alias("span"),
            F.col("__m.entry_id").alias("entry_id"),
        )
    )


def extract_dict_rowwise(
    documents: DataFrame,
    dictionary: DataFrame,
    text_col: str = "text",
    doc_col: str = "doc_id",
) -> DataFrame:
    """Gazetteer matching computed entirely *within each document row* —
    no explode-to-token-rows, no window, no aggregation.

    Per row: build the token array (offsets via an ``aggregate`` fold), join
    the (broadcast) dictionary, and test every candidate start position with
    nested higher-order functions.  Because the plan is stateless row logic
    + a broadcast join, it runs unchanged on Structured Streaming (where
    :func:`extract_dict`'s groupBy would need a watermark) and on 100 TB
    batch scans it trades :func:`extract_dict`'s shuffle for per-row compute
    — the better plan when dictionaries are small and documents are short.

    Same output contract as :func:`extract_dict`:
    ``(doc_id, token_span, span, entry_id)``.
    """
    docs = documents.select(
        F.col(doc_col), token_array(F.col(text_col)).alias("__toks")
    )
    with_dict = docs.join(
        F.broadcast(dictionary.select("entry_id", "toks", "n_toks")),
        F.size("__toks") >= F.col("n_toks"),
        "inner",
    )
    starts = F.filter(
        F.sequence(F.lit(0), F.size("__toks") - F.col("n_toks")),
        lambda i: F.forall(
            F.sequence(F.lit(0), F.col("n_toks") - 1),
            lambda j: F.lower(F.element_at(F.col("__toks"), i + j + 1)["token"])
            == F.element_at(F.col("toks"), j + 1),
        ),
    )
    matched = with_dict.select(
        F.col(doc_col),
        "entry_id",
        "n_toks",
        "__toks",
        F.explode(starts).alias("__start"),
    )
    return matched.select(
        F.col(doc_col),
        make_token_span(
            F.col("__start"), F.col("__start") + F.col("n_toks")
        ).alias("token_span"),
        make_span(
            F.element_at(F.col("__toks"), F.col("__start") + 1)["begin"],
            F.element_at(F.col("__toks"), F.col("__start") + F.col("n_toks"))["end"],
        ).alias("span"),
        F.col("entry_id"),
    )


def extract_split(
    documents: DataFrame,
    split_points: DataFrame,
    text_col: str = "text",
    doc_col: str = "doc_id",
    output_col: str = "span",
) -> DataFrame:
    """Split each document around split-point spans, returning the chunks
    *between* them (split-point content is discarded; zero-length chunks
    dropped).  Documents with no split points yield one whole-document span.

    Reference: ``extract_split`` (``spanner/extract.py:264-311``) — a
    sequential walk per document.  Spark-first: a ``lag(end)`` window per doc
    pairs each split with the previous one (chunk = [prev_end, this_begin)),
    plus a per-doc trailing chunk [max_end, len(text)) and whole-doc spans
    for unsplit documents via anti-join.  All window work is partitioned by
    ``doc_id``.

    ``split_points`` must have (doc_col, span); zero-length split spans act
    as pure split locations.
    """
    doc_len = documents.select(
        F.col(doc_col), F.length(F.col(text_col)).alias("__len")
    )
    w = Window.partitionBy(doc_col).orderBy(
        F.col("span")["begin"], F.col("span")["end"]
    )
    # three output branches (between / trailing / unsplit anti-join) all
    # derive from split_points, which is usually itself an extract subplan
    # — cut lineage so it evaluates once; the (doc, span) frame is tiny
    # next to the corpus it came from
    points = split_points.select(doc_col, "span").localCheckpoint(eager=False)
    sp = points.withColumn(
        "__prev_end", F.coalesce(F.lag(F.col("span")["end"]).over(w), F.lit(0))
    )
    between = sp.select(
        F.col(doc_col),
        make_span(F.col("__prev_end"), F.col("span")["begin"]).alias(output_col),
    )
    trailing = (
        points.groupBy(doc_col)
        .agg(F.max(F.col("span")["end"]).alias("__max_end"))
        .join(doc_len, doc_col)
        .select(
            F.col(doc_col), make_span(F.col("__max_end"), F.col("__len")).alias(output_col)
        )
    )
    unsplit = (
        doc_len.join(points.select(doc_col).distinct(), doc_col, "left_anti")
        .select(F.col(doc_col), make_span(F.lit(0), F.col("__len")).alias(output_col))
    )
    chunks = between.unionByName(trailing).unionByName(unsplit)
    return chunks.filter(
        F.col(output_col)["end"] > F.col(output_col)["begin"]
    )
