"""Round-trip tests against the reference's Arrow storage layout, using
pyarrow directly to simulate files written by the reference library."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pyspark.sql.functions as F
import pytest

from text_extensions_for_pandas_spark.sources import arrow_interop as AI

TEXT1 = "Alice met Bob."
TEXT2 = "Carol met Dave in Paris."


@pytest.fixture(scope="module")
def ref_parquet(tmp_path_factory):
    # storage layout of "TextExtensionsSpan": struct<span_begins, span_ends,
    # target_text:dictionary<string>> (reference arrow_conversion.py:46-81)
    path = str(tmp_path_factory.mktemp("ref") / "spans.parquet")
    begins = pa.array([0, 10, 0, 18], type=pa.int32())
    ends = pa.array([5, 13, 5, 23], type=pa.int32())
    texts = pa.DictionaryArray.from_arrays(
        pa.array([0, 0, 1, 1], type=pa.int8()), pa.array([TEXT1, TEXT2])
    )
    span = pa.StructArray.from_arrays(
        [begins, ends, texts], names=["span_begins", "span_ends", "target_text"]
    )
    table = pa.table(
        {
            "span": span,
            "label": pa.array(["PER", "PER", "PER", "LOC"]),
            "embedding": pa.array(
                [[0.1, 0.2], [0.3, 0.4], [0.5, 0.6], [0.7, 0.8]],
                type=pa.list_(pa.float32()),
            ),
        }
    )
    pq.write_table(table, path)
    return path


def test_read_reference_layout(spark, ref_parquet):
    rows, docs = AI.read_reference_parquet(spark, ref_parquet)
    assert rows.count() == 4
    assert docs.count() == 2
    covered = rows.join(docs, "doc_id").select(
        F.expr("substring(text, span.begin + 1, span.end - span.begin)").alias("t"),
        "label",
    ).collect()
    got = {(r.t, r.label) for r in covered}
    assert got == {("Alice", "PER"), ("Bob", "PER"), ("Carol", "PER"), ("Paris", "LOC")}
    # tensor column arrives as a plain list<float>
    emb = rows.select("embedding").first()[0]
    assert len(emb) == 2


def test_write_reference_layout(spark, ref_parquet, tmp_path):
    rows, docs = AI.read_reference_parquet(spark, ref_parquet)
    out_dir = str(tmp_path / "out")
    AI.spans_to_reference(rows, docs).select("span", "label").write.parquet(out_dir)

    back = pq.read_table(out_dir)
    st = back.schema.field("span").type
    assert {st.field(i).name for i in range(st.num_fields)} == {
        "span_begins", "span_ends", "target_text"
    }
    pdf = back.to_pandas()
    spans = sorted(
        (r["span_begins"], r["span_ends"], r["target_text"]) for r in pdf["span"]
    )
    assert spans[0] == (0, 5, TEXT1)
    assert any(s == (18, 23, TEXT2) for s in spans)


def test_round_trip_through_spark(spark, ref_parquet, tmp_path):
    rows, docs = AI.read_reference_parquet(spark, ref_parquet)
    out_dir = str(tmp_path / "rt")
    AI.spans_to_reference(rows, docs).select("span", "label").write.parquet(out_dir)
    rows2, docs2 = AI.read_reference_parquet(spark, out_dir)
    a = {
        (r.span.begin, r.span.end, r.label, r.doc_id)
        for r in rows.select("span", "label", "doc_id").collect()
    }
    b = {
        (r.span.begin, r.span.end, r.label, r.doc_id)
        for r in rows2.select("span", "label", "doc_id").collect()
    }
    assert a == b


def test_token_span_layouts(spark):
    df = spark.createDataFrame(
        [(0, (1, 3)), (1, (0, 2))],
        "doc_id long, token_span struct<token_begins:int, token_ends:int>",
    )
    eng = AI.token_spans_from_reference(df, "token_span")
    r = eng.first()
    assert r.token_span.begin_token == 1 and r.token_span.end_token == 3
    back = AI.token_spans_to_reference(eng, "token_span").first()
    assert back.token_span.token_begins == 1 and back.token_span.token_ends == 3
