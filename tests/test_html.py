"""HTML → text extraction: markup semantics, entity decoding, skip
subtrees, block-level line structure, and malformed-input termination."""

from __future__ import annotations

import random

import pyspark.sql.functions as F

from text_extensions_for_pandas_spark.operators.html import (
    _html_to_text_py,
    extract_html_documents,
    html_to_text,
)

PAGE = (
    "<html><head><title>ignored title</title>"
    "<style>p { color: red }</style></head>"
    "<body><nav><a href='/'>Home</a> | <a href='/x'>X</a></nav>"
    "<h1>Heading  One</h1>"
    "<script>var x = '<p>not text</p>';</script>"
    "<p>alpha &amp; beta</p>"
    "<div>gamma <b>delta</b> 42</div>"
    "<ul><li>item one</li><li>item&nbsp;two</li></ul>"
    "line<br/>break"
    "<noscript>enable js</noscript>"
    "</body></html>"
)

def test_driver_side_extraction_semantics():
    got = _html_to_text_py(PAGE)
    # &nbsp; decodes to U+00A0 which IS \s for Python re — it collapses
    # into a plain space, so pin the actual expectation directly:
    assert got == (
        "Heading One\n"
        "alpha & beta\n"
        "gamma delta 42\n"
        "item one\n"
        "item two\n"
        "line\n"
        "break"
    )


def test_skip_subtrees_nested_and_unbalanced():
    # nested skip tags, an unbalanced extra closer, and content after
    assert _html_to_text_py(
        "<div>keep1</div><script>a<style>b</style>c</script>"
        "</style></script><div>keep2</div>"
    ) == "keep1\nkeep2"
    # unclosed script drops the rest (documented best-effort)
    assert _html_to_text_py("<p>ok</p><script>never closed") == "ok"


def test_inline_tags_do_not_break_lines():
    assert _html_to_text_py(
        "<p>a <span>b</span> <a href='#'>c</a> <em>d</em></p>"
    ) == "a b c d"


def test_whitespace_collapse_and_blank_line_drop():
    assert _html_to_text_py(
        "<div>  lots \t of \n space  </div><div>  </div><div>next</div>"
    ) == "lots of space\nnext"


def test_udf_matches_driver_side_and_null_passthrough(spark):
    df = spark.createDataFrame(
        [(1, PAGE), (2, "<p>tiny</p>"), (3, None)],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: r.t
        for r in df.select("doc_id", html_to_text(F.col("text")).alias("t")).collect()
    }
    assert rows[1] == _html_to_text_py(PAGE)
    assert rows[2] == "tiny"
    assert rows[3] is None


def test_extract_html_documents_rehash_min_chars(spark):
    from text_extensions_for_pandas_spark.sources.corpus import stable_doc_id

    df = spark.createDataFrame(
        [(10, "<p>real content here</p>", 24, "u1"),
         (11, "<style>only css</style>", 23, "u2")],
        "doc_id long, text string, n_chars long, url string",
    )
    out = extract_html_documents(df, min_chars=3).collect()
    assert len(out) == 1  # the css-only page extracted to '' and dropped
    row = out[0]
    assert row.text == "real content here"
    assert row.n_chars == len("real content here")
    assert row.url == "u1"
    # doc_id re-derived from the EXTRACTED text
    expect = (
        spark.range(1)
        .select(stable_doc_id(F.lit("real content here")).alias("h"))
        .first()
        .h
    )
    assert row.doc_id == expect
    # rehash_ids=False keeps the incoming id
    kept = extract_html_documents(df, min_chars=3, rehash_ids=False).first()
    assert kept.doc_id == 10


def test_fuzz_malformed_html_terminates():
    """Arbitrary mutations of real markup (truncations, byte flips,
    garbage splices, unterminated entities/comments/CDATA) must return a
    str, never raise — one pathological page must not kill a scan task."""
    rng = random.Random(0xBEEF)
    for trial in range(400):
        page = list(PAGE)
        for _ in range(rng.randint(1, 4)):
            op = rng.randrange(4)
            pos = rng.randrange(len(page) + 1)
            if op == 0:
                page = page[:pos]
            elif op == 1:
                page[pos:pos] = rng.choice(
                    ["<", ">", "&#", "<!--", "<![CDATA[", "&nosuch;", "</",
                     "\x00", "<p", "=''"]
                )
            elif op == 2 and page:
                page[min(pos, len(page) - 1)] = chr(rng.randrange(1, 0x300))
            else:
                page[pos:pos] = list(PAGE[rng.randrange(len(PAGE)):])
        out = _html_to_text_py("".join(page))
        assert isinstance(out, str)
