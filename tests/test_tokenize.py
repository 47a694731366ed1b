"""Tokenizer correctness: exact char offsets, multi-whitespace, regex vs
whitespace agreement on simple text."""

import pyspark.sql.functions as F
import pytest

from text_extensions_for_pandas_spark.functions import spans as S
from text_extensions_for_pandas_spark.functions.text import (
    tokenize_regex,
    tokenize_whitespace,
)


@pytest.fixture(scope="module")
def toy_docs(spark):
    return spark.createDataFrame(
        [
            (0, "This is a test"),
            (1, "double  space\tand\nnewline"),
            (2, "x"),
            (3, ""),
        ],
        "doc_id long, text string",
    )


def _offsets_ok(tokens_df, docs_df):
    joined = tokens_df.join(docs_df, "doc_id").select(
        "doc_id", "token_idx", "token",
        S.covered_text("text", "span").alias("cut"),
    )
    for r in joined.collect():
        assert r.cut == r.token, r


def test_whitespace_offsets_exact(toy_docs):
    toks = tokenize_whitespace(toy_docs)
    _offsets_ok(toks, toy_docs)
    got = {(r.doc_id, r.token_idx): r.token for r in toks.collect()}
    assert got[(0, 0)] == "This" and got[(0, 3)] == "test"
    assert got[(1, 1)] == "space" and got[(1, 2)] == "and" and got[(1, 3)] == "newline"
    assert (3, 0) not in got  # empty doc yields no tokens


def test_whitespace_token_idx_dense(toy_docs):
    toks = tokenize_whitespace(toy_docs)
    per_doc = (
        toks.groupBy("doc_id")
        .agg(F.collect_list("token_idx").alias("idxs"), F.count("*").alias("n"))
        .collect()
    )
    for r in per_doc:
        assert sorted(r.idxs) == list(range(r.n))


def test_regex_offsets_exact(toy_docs, spark):
    docs = spark.createDataFrame(
        [(0, "Hello, world! It's 42."), (1, "a-b c")], "doc_id long, text string"
    )
    toks = tokenize_regex(docs)
    _offsets_ok(toks, docs)
    got = [r.token for r in toks.filter("doc_id = 0").orderBy("token_idx").collect()]
    assert got == ["Hello", ",", "world", "!", "It", "'", "s", "42", "."]


def test_tokenizers_agree_on_simple_text(toy_docs):
    ws = tokenize_whitespace(toy_docs.filter("doc_id = 0"))
    rx = tokenize_regex(toy_docs.filter("doc_id = 0"))
    assert sorted((r.token_idx, r.token, r.span.begin, r.span.end) for r in ws.collect()) == \
           sorted((r.token_idx, r.token, r.span.begin, r.span.end) for r in rx.collect())


def test_tokenize_real_documents(docs):
    toks = tokenize_whitespace(docs.limit(20))
    _offsets_ok(toks, docs.limit(20))


# ---------------------------------------------------------------------------
# split_sentences
# ---------------------------------------------------------------------------

def test_split_sentences_driver_side_semantics():
    from text_extensions_for_pandas_spark.functions.text import (
        DEFAULT_ABBREVIATIONS,
        _split_sentences_py,
    )

    t = 'First one. Second two!  "Third three?" And by Dr. Smith. Tail'
    got = _split_sentences_py(t, DEFAULT_ABBREVIATIONS)
    # offsets are exact into the source
    assert [(s, t[b:e]) for b, e, s in got] == [
        (s, s) for _, _, s in got
    ]
    assert [s for _, _, s in got] == [
        "First one.",
        "Second two!",
        '"Third three?"',
        "And by Dr. Smith.",  # Dr. does NOT split
        "Tail",               # unterminated tail is a sentence
    ]
    # no terminator: one sentence; decimals and lowercase continuations
    # do not split; empty/whitespace yields nothing
    assert [s for _, _, s in _split_sentences_py(
        "pi is 3.14 then e.g. lowercase stays", DEFAULT_ABBREVIATIONS
    )] == ["pi is 3.14 then e.g. lowercase stays"]
    assert _split_sentences_py("   ", DEFAULT_ABBREVIATIONS) == []
    # ellipsis before a capital DOES split (".." escape hatch only
    # guards abbreviation matching, not boundaries)
    assert [s for _, _, s in _split_sentences_py(
        "Wait... Now go.", DEFAULT_ABBREVIATIONS
    )] == ["Wait...", "Now go."]


def test_split_sentences_cjk_and_mixed_script():
    """Full-width terminators 。！？ split with no whitespace and no
    capitalization; full-width closers stay left; terminator runs don't
    split internally; … splits only before an explicit new start; all
    offsets stay exact."""
    from text_extensions_for_pandas_spark.functions.text import (
        DEFAULT_ABBREVIATIONS as AB,
        _split_sentences_py,
    )

    def S(t):
        sents = _split_sentences_py(t, AB)
        for b, e, s in sents:
            assert t[b:e] == s
        return [s for _, _, s in sents]

    # a CJK paragraph splits at every 。 — not one whole-doc "sentence"
    assert S("今天天气很好。我们去公园吧。好的！") == [
        "今天天气很好。", "我们去公园吧。", "好的！",
    ]
    # full-width closing quote belongs to the left sentence
    assert S("他说「你好。」然后走了。") == ["他说「你好。」", "然后走了。"]
    # terminator runs stay one sentence end
    assert S("真的吗！！我不信。") == ["真的吗！！", "我不信。"]
    # mixed script both directions; ideographic space tolerated
    assert S("Hello there. 你好世界。Back to English now.") == [
        "Hello there.", "你好世界。", "Back to English now.",
    ]
    assert S("第一句。　第二句。") == ["第一句。", "第二句。"]
    # English mid-sentence ellipsis does NOT split; before a capital it
    # does; before a CJK start it does
    assert S("wait… and then it happened. The end.") == [
        "wait… and then it happened.", "The end.",
    ]
    assert S("He paused… Then he spoke.") == ["He paused…", "Then he spoke."]
    assert S("等一下…好吧。") == ["等一下…", "好吧。"]


def test_split_sentences_dataframe_offsets_and_custom_abbrevs(spark):
    from pyspark.sql import functions as F

    from text_extensions_for_pandas_spark.functions.text import (
        split_sentences,
    )

    docs = spark.createDataFrame(
        [(1, "Alpha beta. Gamma delta! Ok."), (2, "No terminator here"),
         (3, None), (4, "Per Foo. Bar baz.")],
        "doc_id long, text string",
    )
    out = split_sentences(docs)
    rows = out.collect()
    assert [r.sentence for r in rows if r.doc_id == 1] == [
        "Alpha beta.", "Gamma delta!", "Ok."
    ]
    assert [r.sentence_idx for r in rows if r.doc_id == 1] == [0, 1, 2]
    assert [r.sentence for r in rows if r.doc_id == 2] == [
        "No terminator here"
    ]
    assert not [r for r in rows if r.doc_id == 3]  # NULL -> no rows
    # the substring invariant holds through the UDF
    joined = out.join(docs, "doc_id").filter(
        F.expr("substring(text, begin + 1, end - begin) <> sentence")
    )
    assert joined.count() == 0
    # custom abbreviation set: 'foo.' stops splitting
    custom = split_sentences(docs, abbreviations=frozenset({"foo"}))
    assert [r.sentence for r in custom.collect() if r.doc_id == 4] == [
        "Per Foo. Bar baz."
    ]


def test_chunk_by_sentences_greedy_packing(spark):
    from pyspark.sql import functions as F

    from text_extensions_for_pandas_spark.functions.text import (
        chunk_by_sentences,
    )

    t = "One one. Two two! Three three? Four."
    # sentences: [0,8) [9,17) [18,30) [31,36)
    docs = spark.createDataFrame([(1, t), (2, None)], "doc_id long, text string")
    out = chunk_by_sentences(docs, max_chars=20).collect()
    got = [(r.chunk_idx, r.begin, r.end, r.n_sentences, r.chunk) for r in out]
    # greedy: s1+s2 span 17 <= 20; +s3 span 30 > 20 -> new chunk;
    # s3+s4 span 36-18=18 <= 20 -> together
    assert got == [
        (0, 0, 17, 2, "One one. Two two!"),
        (1, 18, 36, 2, "Three three? Four."),
    ]
    # an over-long single sentence is its own oversized chunk
    long_doc = spark.createDataFrame(
        [(3, "Averyveryverylongsentence. Ok.")], "doc_id long, text string"
    )
    rows = chunk_by_sentences(long_doc, max_chars=10).collect()
    assert [(r.n_sentences, r.chunk) for r in rows] == [
        (1, "Averyveryverylongsentence."),
        (1, "Ok."),
    ]
    # substring invariant
    joined = chunk_by_sentences(docs, max_chars=20).join(docs, "doc_id")
    bad = joined.filter(
        F.expr("substring(text, begin + 1, end - begin) <> chunk")
    )
    assert bad.count() == 0
    with __import__("pytest").raises(ValueError):
        chunk_by_sentences(docs, max_chars=0)


def test_chunk_by_sentences_token_budget(spark):
    from text_extensions_for_pandas_spark.functions.text import (
        DEFAULT_ABBREVIATIONS,
        _chunk_by_sentences_py,
        chunk_by_sentences,
    )

    t = "One one. Two two! Three three? Four."
    # token counts under the BPE-ish default: 3, 3, 3, 2
    got = _chunk_by_sentences_py(
        t, 10_000, DEFAULT_ABBREVIATIONS, max_tokens=6
    )
    # 3+3 fits 6; +3 exceeds; 3+2 fits
    assert [(n) for _, _, n in got] == [2, 2]
    # both budgets bind: chars force a split the token budget would allow
    got2 = _chunk_by_sentences_py(
        t, 10, DEFAULT_ABBREVIATIONS, max_tokens=100
    )
    assert [n for _, _, n in got2] == [1, 1, 1, 1]
    docs = spark.createDataFrame([(1, t)], "doc_id long, text string")
    rows = chunk_by_sentences(docs, max_chars=10_000, max_tokens=6).collect()
    assert [r.chunk for r in rows] == [
        "One one. Two two!", "Three three? Four."
    ]
    with __import__("pytest").raises(ValueError):
        chunk_by_sentences(docs, max_tokens=0)


def test_cjk_token_pattern_counts_chars_not_sentences(spark):
    """CJK_TOKEN_PATTERN counts each Han/kana/Hangul char as one token
    (~1-token-per-char BPE approximation) on both the JVM path
    (token_count) and the Python path (chunk_by_sentences' budget);
    the Latin default is unchanged on Latin text."""
    from pyspark.sql import functions as F

    from text_extensions_for_pandas_spark.functions.text import (
        CJK_TOKEN_PATTERN,
        chunk_by_sentences,
        token_count,
    )

    df = spark.createDataFrame(
        [(0, "今天天气很好。hello world!"), (1, "plain latin text.")],
        "id long, text string",
    )
    got = {
        r.id: (r.cjk, r.default)
        for r in df.select(
            "id",
            token_count("text", CJK_TOKEN_PATTERN).alias("cjk"),
            token_count("text").alias("default"),
        ).collect()
    }
    # 6 han chars + 。 + hello + world + ! = 10.  The JVM default ALSO
    # lands on 10 — but incidentally: Java's \w is ASCII-only, so han
    # chars fall into [^\w\s] one at a time.  Python's \w is Unicode,
    # so the same default pattern under `re` lumps the han run into ONE
    # token — the engine divergence CJK_TOKEN_PATTERN eliminates.
    assert got[0] == (10, 10)
    assert got[1] == (4, 4)  # Latin unchanged under either pattern
    import re

    t0 = "今天天气很好。hello world!"
    assert len(re.findall(r"\w+|[^\w\s]", t0)) == 5       # Python default
    assert len(re.findall(CJK_TOKEN_PATTERN, t0)) == 10   # explicit, both

    # the token budget actually bites under the CJK pattern: every CJK
    # sentence is 8 tokens (7 chars + 。), so max_tokens=10 packs one
    # sentence per chunk where the default pattern (2 tokens/sentence)
    # would pack all three
    cjk_doc = spark.createDataFrame(
        [(0, "一二三四五六七。八九十一二三四。五六七八九十一。")],
        "doc_id long, text string",
    )
    chunks = chunk_by_sentences(
        cjk_doc, max_chars=1000, max_tokens=10,
        token_pattern=CJK_TOKEN_PATTERN,
    ).collect()
    assert [c.n_sentences for c in chunks] == [1, 1, 1]
    loose = chunk_by_sentences(cjk_doc, max_chars=1000, max_tokens=10).collect()
    assert [c.n_sentences for c in loose] == [3]
