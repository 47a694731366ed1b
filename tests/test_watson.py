"""Watson NLU + Tables parser tests over synthetic fixture responses."""

import os

import pyspark.sql.functions as F
import pytest

from text_extensions_for_pandas_spark.sources import watson as W

DATA = os.path.join(os.path.dirname(__file__), "data", "watson")


@pytest.fixture(scope="module")
def nlu(spark):
    return W.parse_nlu_response(spark, f"{DATA}/nlu_doc1.json")


def test_nlu_views_present(nlu):
    assert set(nlu) == {
        "syntax", "syntax_sentences", "entities", "entity_mentions",
        "keywords", "relations", "semantic_roles",
    }


def test_syntax_tokens(nlu):
    toks = nlu["syntax"].orderBy("token_idx").collect()
    assert len(toks) == 11
    assert toks[0].text == "Ada" and toks[0].span.begin == 0 and toks[0].span.end == 3
    assert toks[2].lemma == "write"
    sents = nlu["syntax_sentences"].collect()
    assert len(sents) == 2 and sents[1].span.begin == 29


def test_entities_and_mentions(nlu):
    ents = {r.text: r for r in nlu["entities"].collect()}
    assert ents["Ada Lovelace"].type == "Person"
    assert ents["Ada Lovelace"].disambiguation_name == "Ada_Lovelace"
    assert ents["London"].confidence == 0.95
    mentions = {r.text: r for r in nlu["entity_mentions"].collect()}
    assert mentions["London"].span.begin == 54 and mentions["London"].span.end == 60


def test_keywords(nlu):
    kws = {r.text: r for r in nlu["keywords"].collect()}
    assert kws["engines"].sentiment_label == "positive"


def test_relations_widened(nlu):
    rels = nlu["relations"].collect()
    assert len(rels) == 1
    r = rels[0]
    assert r.type == "locatedAt"
    assert r.arg0_text == "Babbage" and r.arg0_entity_type == "Person"
    assert r.arg1_span.begin == 54 and r.arg1_entity_type == "Location"


def test_semantic_roles(nlu):
    sr = nlu["semantic_roles"].collect()[0]
    assert sr.subject_text == "Ada Lovelace" and sr.action_verb_tense == "past"


def test_make_span_from_entities(spark, nlu):
    # tokens from the syntax view double as the corpus tokenization
    toks = nlu["syntax"].select(
        "doc_id", "token_idx", "span", F.col("text").alias("token")
    )
    ents = nlu["entities"].select("doc_id", "text", "type")
    out = W.make_span_from_entities(toks, ents).collect()
    found = {(r.span.begin, r.span.end, r.ent_type) for r in out}
    assert (0, 12, "Person") in found        # Ada Lovelace (two tokens)
    assert (29, 36, "Person") in found       # Babbage
    assert (54, 60, "Location") in found     # London


@pytest.fixture(scope="module")
def tables(spark):
    return W.read_tables_responses(spark, f"{DATA}/tables_doc1.json").cache()


def test_table_cell_frames(tables):
    rh = W.tables_row_headers(tables).collect()
    ch = W.tables_col_headers(tables).collect()
    cells = W.tables_body_cells(tables).collect()
    assert {r.text for r in rh} == {"Paris", "Lyon"}
    assert {c.text for c in ch} == {"2020", "2021"}
    assert len(cells) == 4
    assert all(c.span.end > c.span.begin for c in cells)


def test_table_reconstruction(tables):
    cells = W.tables_body_cells(tables)
    table = W.make_table(cells, max_header_levels=1)
    rows = {r.row_header_texts_0: r for r in table.collect()}
    assert rows["Paris"]["2020"] == "10" and rows["Paris"]["2021"] == "11"
    assert rows["Lyon"]["2020"] == "(5)" and rows["Lyon"]["2021"] == "6.5"


def test_numeric_coercion(spark):
    df = spark.createDataFrame(
        [("(5)",), ("1,234.5",), ("$10",), ("6.5",), ("n/a",)], "v string"
    ).select(W.coerce_numeric(F.col("v")).alias("n"))
    got = [r.n for r in df.collect()]
    assert got == [-5.0, 1234.5, 10.0, 6.5, None]


def test_double_header_reconstruction(spark):
    t2 = W.read_tables_responses(spark, f"{DATA}/tables_doc2.json")
    cells = W.tables_body_cells(t2)
    table = W.make_table(cells, max_header_levels=2)
    rows = {r.row_header_texts_0: r.asDict() for r in table.collect()}
    assert rows["Paris"]["H1 / 2020"] == "1"
    assert rows["Paris"]["H2 / 2021"] == "4"
    assert rows["Lyon"]["H1 / 2021"] == "6"
    assert rows["Lyon"]["H2 / 2020"] == "7"


def test_convert_cols_to_numeric(tables):
    cells = W.tables_body_cells(tables)
    pivoted = W.make_table(cells)
    num = W.convert_cols_to_numeric(pivoted)
    # every non-key column is now numeric (double) ...
    for f in num.schema.fields:
        if f.name in ("doc_id", "table_idx") or f.name.startswith(
            "row_header_texts_"
        ):
            continue
        assert f.dataType.typeName() == "double", f
    # ... and explicit column selection converts only those
    value_cols = [
        f.name
        for f in pivoted.schema.fields
        if f.name not in ("doc_id", "table_idx")
        and not f.name.startswith("row_header_texts_")
    ]
    partial = W.convert_cols_to_numeric(pivoted, columns=value_cols[:1])
    kinds = {f.name: f.dataType.typeName() for f in partial.schema.fields}
    assert kinds[value_cols[0]] == "double"
    for c in value_cols[1:]:
        assert kinds[c] == "string"


def test_get_raw_html(spark, tmp_path):
    html = (
        "<html><body><p>intro</p>"
        "<table id='t1'><tr><td>Revenue</td><td>42</td></tr></table>"
        "<p>outro</p></body></html>"
    )
    # Watson's location points at table content inside the html payload
    begin = html.index("<tr>")
    end = html.index("</table>") + len("</table>")
    doc = {
        "document": {"html": html},
        "tables": [
            {"location": {"begin": begin, "end": end}},
            # degenerate: begin before any <table  ->  NULL html
            {"location": {"begin": 3, "end": 10}},
        ],
    }
    import json

    p = tmp_path / "resp.json"
    p.write_text(json.dumps(doc))
    rows = {
        r["table_idx"]: r["html"]
        for r in W.get_raw_html(spark, str(p)).collect()
    }
    # the reference algorithm: rfind('<table') before begin, slice to end
    table_begin = html[:begin].rfind("<table")
    assert rows[0] == html[table_begin:end]
    assert rows[0].startswith("<table id='t1'>")
    assert rows[1] is None


def test_attach_sentence_spans(nlu):
    rel = W.attach_sentence_spans(nlu["relations"], nlu["syntax_sentences"])
    rows = rel.collect()
    assert len(rows) == nlu["relations"].count()
    for r in rows:
        if r.sentence_span is not None:
            assert r.sentence_span.begin <= r.arg0_span.begin
            assert r.arg0_span.end <= r.sentence_span.end


def test_make_table_header_order(tables):
    cells = W.tables_body_cells(tables)
    pivoted = W.make_table(cells)
    # pivoted value columns appear in physical column order, not alphabetical
    value_cols = [
        c for c in pivoted.columns
        if c not in ("doc_id", "table_idx") and not c.startswith("row_header_texts_")
    ]
    pos = {
        r["__col"]: r["__pos"]
        for r in cells.withColumn(
            "__col",
            F.concat_ws(
                " / ",
                F.get("column_header_texts", 0),
                F.get("column_header_texts", 1),
            ),
        )
        .groupBy("__col")
        .agg(F.min("column_index_begin").alias("__pos"))
        .collect()
    }
    got = [pos.get(c.split(" / ")[0], pos.get(c)) for c in value_cols]
    got = [p for p in got if p is not None]
    assert got == sorted(got) and len(got) >= 2


def test_parse_tables_response_dict(spark):
    dfs = W.parse_tables_response(spark, f"{DATA}/tables_doc1.json")
    assert set(dfs) == {"row_headers", "col_headers", "body_cells"}
    assert dfs["body_cells"].count() > 0
    pivoted = W.make_table(dfs["body_cells"])
    assert pivoted.count() > 0
