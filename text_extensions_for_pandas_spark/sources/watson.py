"""IBM Watson response parsers, Spark-first.

Reference behavior reimplemented (NOT ported): ``io/watson/nlu.py``
(``parse_response``, ``:421-528``; entity-mention flattening ``:355-418``;
relation-argument widening ``:168-272``; ``make_span_from_entities``
``:531-576``) and ``io/watson/tables.py`` (cell tables ``:348-431``,
exploded cells ``:73-145``, numeric coercion ``:148-300``, pivot
reconstruction ``:584-663``).

Spark shape: responses are JSON documents → ``spark.read.json`` (multiLine)
with ``input_file_name`` as the document key, then ``explode`` for every
nested list, ``element_at`` for argument/header widening, and
``groupBy().pivot()`` for table reconstruction.  The reference's per-row
loops (mention flattening, sentence binary search) disappear into
relational plans — sentence attachment is a containment join.

All span columns use the engine's ``struct<begin,end>`` convention; Watson
``location: [begin, end]`` arrays convert via ``element_at``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from text_extensions_for_pandas_spark.functions.spans import make_span


def _loc_span(loc_col):
    """Watson ``location`` [begin, end] array → span struct."""
    return make_span(
        F.element_at(loc_col, 1).cast("int"), F.element_at(loc_col, 2).cast("int")
    )


def read_nlu_responses(spark: SparkSession, path: str) -> DataFrame:
    """One row per NLU response JSON file: ``(doc_id, response struct)``.
    ``doc_id`` is the file name (dense ids can be joined on later)."""
    return (
        spark.read.option("multiLine", "true")
        .json(path)
        .withColumn(
            "doc_id",
            F.regexp_extract(F.input_file_name(), r"([^/]+?)(\.[^./]*)?$", 1),
        )
    )


def nlu_syntax_tokens(responses: DataFrame) -> DataFrame:
    """``syntax.tokens`` → one row per token with span / pos / lemma
    (reference ``_make_syntax_dataframes``, ``io/watson/nlu.py:118-151``)."""
    t = responses.select(
        "doc_id", F.posexplode("syntax.tokens").alias("token_idx", "tok")
    )
    return t.select(
        "doc_id",
        "token_idx",
        _loc_span(F.col("tok.location")).alias("span"),
        F.col("tok.text").alias("text"),
        F.col("tok.part_of_speech").alias("part_of_speech"),
        F.col("tok.lemma").alias("lemma"),
    )


def nlu_syntax_sentences(responses: DataFrame) -> DataFrame:
    return responses.select(
        "doc_id", F.posexplode("syntax.sentences").alias("sentence_id", "s")
    ).select(
        "doc_id",
        "sentence_id",
        _loc_span(F.col("s.location")).alias("span"),
        F.col("s.text").alias("text"),
    )


def nlu_entities(responses: DataFrame) -> DataFrame:
    """Top-level entities with sentiment/emotion/disambiguation columns
    (reference ``_entities_schema``, ``io/watson/nlu.py:44-60``; dotted
    pandas column names become nested-field projections here)."""
    e = responses.select("doc_id", F.explode("entities").alias("ent"))
    cols = [
        ("ent.type", "type"),
        ("ent.text", "text"),
        ("ent.sentiment.label", "sentiment_label"),
        ("ent.sentiment.score", "sentiment_score"),
        ("ent.relevance", "relevance"),
        ("ent.count", "count"),
        ("ent.confidence", "confidence"),
        ("ent.disambiguation.subtype", "disambiguation_subtype"),
        ("ent.disambiguation.name", "disambiguation_name"),
        ("ent.disambiguation.dbpedia_resource", "disambiguation_dbpedia_resource"),
    ]
    fields = set(responses.select("entities").schema[0].dataType.elementType.names)

    def has(path: str) -> bool:
        return path.split(".")[1] in fields

    return e.select(
        "doc_id",
        *[
            (F.expr(p) if has(p) else F.lit(None)).alias(a)
            for p, a in cols
        ],
    )


def nlu_entity_mentions(responses: DataFrame) -> DataFrame:
    """Entity mentions flattened to one row per mention with its span
    (reference Arrow list-flattening dance, ``io/watson/nlu.py:355-418`` —
    here just two explodes)."""
    e = responses.select("doc_id", F.explode("entities").alias("ent"))
    m = e.select(
        "doc_id",
        F.col("ent.type").alias("type"),
        F.col("ent.text").alias("text"),
        F.explode("ent.mentions").alias("mention"),
    )
    return m.select(
        "doc_id",
        "type",
        "text",
        _loc_span(F.col("mention.location")).alias("span"),
        F.col("mention.confidence").alias("confidence"),
    )


def nlu_keywords(responses: DataFrame) -> DataFrame:
    k = responses.select("doc_id", F.explode("keywords").alias("kw"))
    return k.select(
        "doc_id",
        F.col("kw.text").alias("text"),
        F.col("kw.sentiment.label").alias("sentiment_label"),
        F.col("kw.sentiment.score").alias("sentiment_score"),
        F.col("kw.relevance").alias("relevance"),
        F.col("kw.count").alias("count"),
    )


def nlu_relations(responses: DataFrame) -> DataFrame:
    """Relations with the first two arguments widened into columns
    (reference ``_make_relations_dataframe``, ``io/watson/nlu.py:168-272``;
    the manual sentence binary-search loop is replaced by joining
    :func:`nlu_syntax_sentences` on containment downstream if needed)."""
    r = responses.select("doc_id", F.explode("relations").alias("rel"))

    def arg(i: int, sub: str):
        return F.expr(f"rel.arguments[{i}].{sub}")

    return r.select(
        "doc_id",
        F.col("rel.type").alias("type"),
        F.col("rel.score").alias("score"),
        F.col("rel.sentence").alias("sentence"),
        _loc_span(arg(0, "location")).alias("arg0_span"),
        F.expr("rel.arguments[0].text").alias("arg0_text"),
        F.expr("rel.arguments[0].entities[0].type").alias("arg0_entity_type"),
        F.expr("rel.arguments[0].entities[0].text").alias("arg0_entity_text"),
        _loc_span(arg(1, "location")).alias("arg1_span"),
        F.expr("rel.arguments[1].text").alias("arg1_text"),
        F.expr("rel.arguments[1].entities[0].type").alias("arg1_entity_type"),
        F.expr("rel.arguments[1].entities[0].text").alias("arg1_entity_text"),
    )


def attach_sentence_spans(
    relations: DataFrame,
    sentences: DataFrame,
    span_col: str = "arg0_span",
) -> DataFrame:
    """Attach each relation's containing sentence span (reference
    ``_make_relations_dataframe``'s per-row binary-search loop,
    ``io/watson/nlu.py:231-256``) — here a containment equijoin against
    :func:`nlu_syntax_sentences`, so the lookup distributes instead of
    running on the driver.  Adds ``sentence_span``; relations whose
    ``span_col`` lies outside every sentence keep NULL."""
    s = sentences.select(
        "doc_id",
        F.col("span").alias("sentence_span"),
    )
    cond = (
        (relations["doc_id"] == s["doc_id"])
        & (relations[span_col]["begin"] >= s["sentence_span"]["begin"])
        & (relations[span_col]["end"] <= s["sentence_span"]["end"])
    )
    return relations.join(s, cond, "left").drop(s["doc_id"])


def nlu_semantic_roles(responses: DataFrame) -> DataFrame:
    s = responses.select("doc_id", F.explode("semantic_roles").alias("sr"))
    return s.select(
        "doc_id",
        F.col("sr.subject.text").alias("subject_text"),
        F.col("sr.sentence").alias("sentence"),
        F.col("sr.object.text").alias("object_text"),
        F.col("sr.action.verb.text").alias("action_verb_text"),
        F.col("sr.action.verb.tense").alias("action_verb_tense"),
        F.col("sr.action.text").alias("action_text"),
        F.col("sr.action.normalized").alias("action_normalized"),
    )


def parse_nlu_response(
    spark: SparkSession, path: str
) -> dict[str, DataFrame]:
    """All NLU views at once (reference ``parse_response``,
    ``io/watson/nlu.py:421-528``) — each lazily derived from one JSON scan."""
    resp = read_nlu_responses(spark, path)
    out: dict[str, DataFrame] = {}
    top = set(resp.columns)
    if "syntax" in top:
        out["syntax"] = nlu_syntax_tokens(resp)
        out["syntax_sentences"] = nlu_syntax_sentences(resp)
    if "entities" in top:
        out["entities"] = nlu_entities(resp)
        mention_fields = resp.select("entities").schema[0].dataType.elementType.names
        if "mentions" in mention_fields:
            out["entity_mentions"] = nlu_entity_mentions(resp)
    if "keywords" in top:
        out["keywords"] = nlu_keywords(resp)
    if "relations" in top:
        out["relations"] = nlu_relations(resp)
    if "semantic_roles" in top:
        out["semantic_roles"] = nlu_semantic_roles(resp)
    return out


def make_span_from_entities(
    tokens: DataFrame, entities: DataFrame, doc_col: str = "doc_id"
) -> DataFrame:
    """Locate each entity's text as token spans in the corpus — the
    reference's greedy longest-prefix scan (``io/watson/nlu.py:531-576``)
    re-expressed as gazetteer extraction + left-to-right consolidation
    (longest match wins at each position), with matches restricted to the
    document whose entity list produced them.
    """
    from text_extensions_for_pandas_spark.operators.consolidate import consolidate
    from text_extensions_for_pandas_spark.operators.extract import (
        create_dict,
        extract_dict,
    )

    ent_rows = [
        (r["text"],)
        for r in entities.select("text").distinct().collect()
        if r["text"]
    ]
    d = create_dict(tokens.sparkSession, [t for (t,) in ent_rows])
    entry_texts = d.select(
        "entry_id", F.concat_ws(" ", "toks").alias("__entry_text")
    )
    matches = (
        extract_dict(tokens, d, doc_col=doc_col)
        .join(F.broadcast(entry_texts), "entry_id")
    )
    doc_ents = entities.select(
        F.col(doc_col),
        F.lower(F.col("text")).alias("__entry_text"),
        F.col("type").alias("ent_type"),
    ).distinct()
    scoped = matches.join(doc_ents, [doc_col, "__entry_text"])
    return consolidate(
        scoped.select(doc_col, "token_span", "span", "ent_type"), on="span",
        doc_col=doc_col,
    )


# ---------------------------------------------------------------------------
# Watson Discovery Table Understanding
# ---------------------------------------------------------------------------

def read_tables_responses(spark: SparkSession, path: str) -> DataFrame:
    """Table-understanding responses: ``(doc_id, table_idx, table struct)``."""
    raw = (
        spark.read.option("multiLine", "true")
        .json(path)
        .withColumn(
            "doc_id",
            F.regexp_extract(F.input_file_name(), r"([^/]+?)(\.[^./]*)?$", 1),
        )
    )
    return raw.select(
        "doc_id", F.posexplode("tables").alias("table_idx", "table")
    )


def _header_df(tables: DataFrame, field: str) -> DataFrame:
    h = tables.select(
        "doc_id", "table_idx", F.explode(f"table.{field}").alias("h")
    )
    return h.select(
        "doc_id",
        "table_idx",
        F.col("h.cell_id").alias("cell_id"),
        make_span(
            F.col("h.location.begin").cast("int"), F.col("h.location.end").cast("int")
        ).alias("span"),
        F.col("h.text").alias("text"),
        F.col("h.text_normalized").alias("text_normalized"),
        F.col("h.row_index_begin").cast("int").alias("row_index_begin"),
        F.col("h.row_index_end").cast("int").alias("row_index_end"),
        F.col("h.column_index_begin").cast("int").alias("column_index_begin"),
        F.col("h.column_index_end").cast("int").alias("column_index_end"),
    )


def tables_row_headers(tables: DataFrame) -> DataFrame:
    return _header_df(tables, "row_headers")


def tables_col_headers(tables: DataFrame) -> DataFrame:
    return _header_df(tables, "column_headers")


def tables_body_cells(tables: DataFrame) -> DataFrame:
    """Body cells with their header-text arrays (reference ``parse_response``
    ``io/watson/tables.py:348-431``)."""
    c = tables.select(
        "doc_id", "table_idx", F.explode("table.body_cells").alias("c")
    )
    return c.select(
        "doc_id",
        "table_idx",
        F.col("c.cell_id").alias("cell_id"),
        make_span(
            F.col("c.location.begin").cast("int"), F.col("c.location.end").cast("int")
        ).alias("span"),
        F.col("c.text").alias("text"),
        F.col("c.row_index_begin").cast("int").alias("row_index_begin"),
        F.col("c.column_index_begin").cast("int").alias("column_index_begin"),
        F.col("c.row_header_texts").alias("row_header_texts"),
        F.col("c.column_header_texts").alias("column_header_texts"),
    )


def make_exploded_df(
    body_cells: DataFrame, max_header_levels: int = 2
) -> tuple[DataFrame, list[str], list[str]]:
    """Widen header-text arrays into ``row_header_texts_i`` /
    ``column_header_texts_i`` columns (reference ``make_exploded_df``,
    ``io/watson/tables.py:73-145``).  Cells with no header fall back to
    their numeric index so every cell survives the pivot.
    """
    row_cols, col_cols = [], []
    out = body_cells
    for i in range(max_header_levels):
        rc, cc = f"row_header_texts_{i}", f"column_header_texts_{i}"
        fallback_r = (
            F.col("row_index_begin").cast("string") if i == 0 else F.lit("")
        )
        fallback_c = (
            F.col("column_index_begin").cast("string") if i == 0 else F.lit("")
        )
        # F.get (0-based) returns NULL out of bounds — element_at would
        # throw under Spark 4's default ANSI mode for short header arrays
        out = out.withColumn(
            rc, F.coalesce(F.get("row_header_texts", i), fallback_r)
        ).withColumn(
            cc, F.coalesce(F.get("column_header_texts", i), fallback_c)
        )
        row_cols.append(rc)
        col_cols.append(cc)
    return out, row_cols, col_cols


_NUMERIC_JUNK = r"[^0-9.\-]"


def coerce_numeric(col):
    """Watson numeric-cell cleanup (reference ``io/watson/tables.py:209-238``):
    ``(1,234.5)`` → -1234.5, strip currency/thousands junk, else NULL."""
    trimmed = F.trim(col)
    negative = trimmed.rlike(r"^\(.*\)$")
    cleaned = F.regexp_replace(trimmed, _NUMERIC_JUNK, "")
    val = F.when(cleaned.rlike(r"^-?[0-9]*\.?[0-9]+$"), cleaned.cast("double"))
    return F.when(negative, -val).otherwise(val)


def make_table(
    body_cells: DataFrame,
    value_col: str = "text",
    concat_with: str = " | ",
    max_header_levels: int = 2,
    sort_headers: bool = True,
) -> DataFrame:
    """Reconstruct the human-readable table: group by row headers, pivot on
    the (concatenated) column-header path, join duplicate cell texts
    (reference ``make_table_from_exploded_df``,
    ``io/watson/tables.py:584-663``; pandas ``pivot_table`` →
    ``groupBy().pivot()``).

    ``sort_headers=True`` orders the pivoted output columns by each
    header's physical column position in the source table (reference
    ``_sort_merge_headers`` / recursive multiindex ordering,
    ``io/watson/tables.py:303-325``) instead of Spark's default
    alphabetical pivot order.  The distinct header list is collected to
    the driver to fix the order — it is the TABLE WIDTH, a few dozen
    values, independent of corpus size.
    """
    exploded, row_cols, col_cols = make_exploded_df(body_cells, max_header_levels)
    pivot_key = F.concat_ws(
        " / ", *[F.nullif(F.col(c), F.lit("")) for c in col_cols]
    )
    keyed = exploded.withColumn("__col", pivot_key)
    grouped = keyed.groupBy("doc_id", "table_idx", *row_cols)
    if sort_headers:
        order = (
            keyed.groupBy("__col")
            .agg(F.min("column_index_begin").alias("__pos"))
            .orderBy("__pos", "__col")
            .collect()
        )
        pivoted = grouped.pivot("__col", [r["__col"] for r in order])
    else:
        pivoted = grouped.pivot("__col")
    return pivoted.agg(F.concat_ws(concat_with, F.collect_list(value_col)))


def convert_cols_to_numeric(
    table: DataFrame,
    columns: list[str] | None = None,
) -> DataFrame:
    """Coerce pivoted-table value columns to numbers (reference
    ``convert_cols_to_numeric``, ``io/watson/tables.py:264-325``).

    With ``columns=None`` every column except the grouping keys
    (``doc_id`` / ``table_idx`` / ``row_header_texts_*``) is converted —
    the reference's convert-everything default.  Cells that do not clean up
    to a number become NULL (the reference's ``errors='coerce'`` path);
    parenthesized accounting negatives and currency/thousands junk are
    handled by :func:`coerce_numeric`.

    The reference's row-wise mode (``rows=`` on a transposed pandas frame)
    has no Spark analogue — transpose the pivot instead.
    """
    keys = {"doc_id", "table_idx"}
    if columns is None:
        columns = [
            c
            for c in table.columns
            if c not in keys and not c.startswith("row_header_texts_")
        ]
    out = table
    for c in columns:
        out = out.withColumn(c, coerce_numeric(F.col(c)))
    return out


def get_raw_html(spark: SparkSession, path: str) -> DataFrame:
    """Slice each table's original ``<table>…`` markup out of the document
    HTML shipped in the response (reference ``get_raw_html``,
    ``io/watson/tables.py:434-447``): scan back from the table's reported
    ``location.begin`` to the last ``<table`` open tag and return the HTML
    through ``location.end``.

    Output: ``(doc_id, table_idx, html)``; ``html`` is NULL when the
    document carries no ``<table`` tag before the reported begin (the
    reference under-slices via ``rfind == -1`` there).  Pure column
    expressions — the rfind is ``instr(reverse(prefix), reverse(tag))``,
    so no Python touches the (potentially large) HTML payloads.
    """
    raw = (
        spark.read.option("multiLine", "true")
        .json(path)
        .withColumn(
            "doc_id",
            F.regexp_extract(F.input_file_name(), r"([^/]+?)(\.[^./]*)?$", 1),
        )
    )
    t = raw.select(
        "doc_id",
        F.col("document.html").alias("html"),
        F.posexplode("tables").alias("table_idx", "table"),
    ).select(
        "doc_id",
        "table_idx",
        "html",
        F.col("table.location.begin").cast("int").alias("b"),
        F.col("table.location.end").cast("int").alias("e"),
    )
    # last '<table' before b: 1-based offset q of reverse(tag) in the
    # reversed prefix html[0:b] maps to 0-based tag start  b - q - 5
    q = F.instr(F.reverse(F.expr("substring(html, 1, b)")), "elbat<")
    start0 = F.col("b") - q - F.lit(5)
    sliced = F.expr(
        "substring(html, __start0 + 1, e - __start0)"
    )
    return (
        t.withColumn("__start0", start0)
        .select(
            "doc_id",
            "table_idx",
            F.when(q > 0, sliced).alias("html"),
        )
    )


def parse_tables_response(
    spark: SparkSession, path: str
) -> dict[str, DataFrame]:
    """Parse Table-Understanding responses into the reference's
    dfs-dict shape (``tables.parse_response``, ``io/watson/tables.py:
    348-431``): ``row_headers`` / ``col_headers`` / ``body_cells``
    DataFrames ready for :func:`make_exploded_df` / :func:`make_table`."""
    tables = read_tables_responses(spark, path)
    return {
        "row_headers": tables_row_headers(tables),
        "col_headers": tables_col_headers(tables),
        "body_cells": tables_body_cells(tables),
    }
