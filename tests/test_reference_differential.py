"""Differential tests against the REFERENCE implementation itself.

The reference library at /root/reference has a pure pandas/numpy core, so
its spanner operators are directly executable here (read-only import; its
one missing dependency, ``memoized_property``, is shimmed with the
standard three-line caching-property decorator).  These tests run the
reference and our Spark operators on the same inputs — including the edge
cases its semantics documents call out (zero-length spans, identical
endpoints, touching-but-disjoint intervals; SURVEY.md §1.2) — and assert
identical results.  This is the strongest parity evidence available: not a
re-derived oracle, the reference's own behavior.
"""

import re
import sys
import types

import pandas as pd
import pytest


def _load_reference():
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
    import text_extensions_for_pandas as tp

    return tp


@pytest.fixture(scope="module")
def ref():
    try:
        return _load_reference()
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference library not importable: {e}")


TEXT = "In AD 1100 and all that, the sun was shining and shining."

# span inventory exercising the §1.2 edge cases: overlapping, nested,
# touching (end == begin: NOT overlapping), identical, zero-length
FIRST_SPANS = [(0, 2), (3, 10), (11, 14), (25, 28), (29, 29), (37, 44)]
SECOND_SPANS = [(0, 2), (2, 5), (10, 11), (11, 14), (26, 32), (29, 29), (44, 48)]


def _ref_span_series(ref, spans):
    from text_extensions_for_pandas import SpanArray

    return pd.Series(
        SpanArray(TEXT, [b for b, _ in spans], [e for _, e in spans])
    )


def _spark_span_df(spark, spans):
    return spark.createDataFrame(
        [(0, (b, e)) for b, e in spans],
        "doc_id long, span struct<begin:int,`end`:int>",
    )


def _pairs_from_ref(out, first_name="first", second_name="second"):
    return sorted(
        ((s1.begin, s1.end), (s2.begin, s2.end))
        for s1, s2 in zip(out[first_name], out[second_name])
    )


def _pairs_from_spark(out, first_name="first", second_name="second"):
    return sorted(
        ((r[first_name]["begin"], r[first_name]["end"]),
         (r[second_name]["begin"], r[second_name]["end"]))
        for r in out.collect()
    )


def test_extract_regex_matches_reference(ref, spark):
    from text_extensions_for_pandas.spanner import extract_regex as ref_extract

    from text_extensions_for_pandas_spark.operators.extract import extract_regex

    pattern = r"[a-z]+in[a-z]*"
    want = sorted(
        (s.begin, s.end) for s in ref_extract(TEXT, re.compile(pattern))
    )
    docs = spark.createDataFrame([(0, TEXT)], ["doc_id", "text"])
    out = extract_regex(docs, pattern).collect()
    got = sorted((r["span"]["begin"], r["span"]["end"]) for r in out)
    assert got == want and len(got) > 0
    # covered text parity too
    assert sorted(r["match"] for r in out) == ["shining", "shining"]


def test_overlap_join_matches_reference(ref, spark):
    from text_extensions_for_pandas.spanner import overlap_join as ref_overlap

    from text_extensions_for_pandas_spark.operators.join import overlap_join

    want = _pairs_from_ref(
        ref_overlap(
            _ref_span_series(ref, FIRST_SPANS),
            _ref_span_series(ref, SECOND_SPANS),
        )
    )
    got = _pairs_from_spark(
        overlap_join(
            _spark_span_df(spark, FIRST_SPANS),
            _spark_span_df(spark, SECOND_SPANS),
        )
    )
    assert got == want and len(got) > 0


def test_contain_join_matches_reference(ref, spark):
    from text_extensions_for_pandas.spanner import contain_join as ref_contain

    from text_extensions_for_pandas_spark.operators.join import contain_join

    want = _pairs_from_ref(
        ref_contain(
            _ref_span_series(ref, FIRST_SPANS),
            _ref_span_series(ref, SECOND_SPANS),
        )
    )
    got = _pairs_from_spark(
        contain_join(
            _spark_span_df(spark, FIRST_SPANS),
            _spark_span_df(spark, SECOND_SPANS),
        )
    )
    assert got == want and len(got) > 0


def test_consolidate_matches_reference(ref, spark):
    from text_extensions_for_pandas.spanner import consolidate as ref_consolidate

    from text_extensions_for_pandas_spark.operators.consolidate import (
        consolidate,
    )

    # heavily overlapping inventory — exercises the greedy left-to-right
    # keep-longest policy, including a tie on begin (longest wins) and a
    # span surviving after a skipped overlap
    spans = [(0, 10), (0, 4), (2, 6), (5, 12), (12, 20), (13, 14), (18, 25)]
    ref_df = pd.DataFrame({"span": _ref_span_series(ref, spans)})
    want = sorted(
        (s.begin, s.end) for s in ref_consolidate(ref_df, on="span")["span"]
    )
    got = sorted(
        (r["span"]["begin"], r["span"]["end"])
        for r in consolidate(_spark_span_df(spark, spans), on="span").collect()
    )
    assert got == want and len(got) > 0


def test_extract_split_matches_reference(ref, spark):
    from text_extensions_for_pandas.spanner import extract_split as ref_split

    from text_extensions_for_pandas_spark.operators.extract import extract_split

    split_points = [(10, 14), (24, 25), (44, 47)]
    from text_extensions_for_pandas import SpanArray

    want = sorted(
        (s.begin, s.end)
        for s in ref_split(
            TEXT,
            SpanArray(
                TEXT,
                [b for b, _ in split_points],
                [e for _, e in split_points],
            ),
        )
    )
    docs = spark.createDataFrame([(0, TEXT)], ["doc_id", "text"])
    splits = spark.createDataFrame(
        [(0, (b, e)) for b, e in split_points],
        "doc_id long, span struct<begin:int,`end`:int>",
    )
    got = sorted(
        (r["span"]["begin"], r["span"]["end"])
        for r in extract_split(docs, splits).collect()
    )
    assert got == want


def test_adjacent_join_matches_reference(ref, spark):
    from text_extensions_for_pandas import SpanArray, TokenSpanArray
    from text_extensions_for_pandas.spanner import adjacent_join as ref_adjacent

    from text_extensions_for_pandas_spark.operators.join import adjacent_join

    # whitespace tokenization of TEXT as the shared token table
    toks = [(m.start(), m.end()) for m in re.finditer(r"\S+", TEXT)]
    tokens = SpanArray(TEXT, [b for b, _ in toks], [e for _, e in toks])
    first_idx = [0, 2, 3, 5, 8]
    second_idx = [1, 3, 4, 6, 9, 10]
    ref_first = pd.Series(
        TokenSpanArray(tokens, first_idx, [i + 1 for i in first_idx])
    )
    ref_second = pd.Series(
        TokenSpanArray(tokens, second_idx, [i + 1 for i in second_idx])
    )
    out = ref_adjacent(ref_first, ref_second, min_gap=0, max_gap=2)
    want = sorted(
        (s1.begin_token, s2.begin_token)
        for s1, s2 in zip(out["first"], out["second"])
    )

    mk = lambda idxs: spark.createDataFrame(  # noqa: E731
        [(0, (i, i + 1)) for i in idxs],
        "doc_id long, token_span struct<begin_token:int,end_token:int>",
    )
    got = sorted(
        (r["first"]["begin_token"], r["second"]["begin_token"])
        for r in adjacent_join(
            mk(first_idx), mk(second_idx), min_gap=0, max_gap=2
        ).collect()
    )
    assert got == want and len(got) > 0


def _token_offsets():
    return [(m.start(), m.end()) for m in re.finditer(r"\S+", TEXT)]


def test_iob_to_spans_matches_reference(ref, spark):
    from text_extensions_for_pandas import SpanArray
    from text_extensions_for_pandas.io.conll import iob_to_spans as ref_iob

    from text_extensions_for_pandas_spark.operators.iob import iob_to_spans

    toks = _token_offsets()
    #            In   AD   1100 and  all  that, the  sun  was  shining and  shining.
    iob_tags = ["O", "B", "I", "O", "B", "O", "O", "B", "I", "I", "O", "B"]
    types = [
        None, "DATE", "DATE", None, "Q", None, None, "X", "X", "X", None, "Y",
    ]
    ref_df = pd.DataFrame(
        {
            "span": pd.Series(
                SpanArray(TEXT, [b for b, _ in toks], [e for _, e in toks])
            ),
            "ent_iob": iob_tags,
            "ent_type": types,
        }
    )
    ref_out = ref_iob(ref_df)
    want = sorted(
        (s.begin_token, s.end_token, t)
        for s, t in zip(ref_out["span"], ref_out["ent_type"])
    )

    tokens = spark.createDataFrame(
        [
            (0, i, (b, e), iob_tags[i], types[i])
            for i, (b, e) in enumerate(toks)
        ],
        "doc_id long, token_idx int, span struct<begin:int,`end`:int>, "
        "ent_iob string, ent_type string",
    )
    got = sorted(
        (
            r["token_span"]["begin_token"],
            r["token_span"]["end_token"],
            r["ent_type"],
        )
        for r in iob_to_spans(tokens).collect()
    )
    assert got == want and len(got) > 0


def test_spans_to_iob_matches_reference(ref, spark):
    from text_extensions_for_pandas import SpanArray, TokenSpanArray
    from text_extensions_for_pandas.io.conll import spans_to_iob as ref_s2i

    from text_extensions_for_pandas_spark.operators.iob import spans_to_iob

    toks = _token_offsets()
    tokens_arr = SpanArray(TEXT, [b for b, _ in toks], [e for _, e in toks])
    # entities: tokens [1,3) and [7,10), adjacent entity [4,5)
    ent_spans = [(1, 3), (4, 5), (7, 10)]
    ent_types = ["DATE", "Q", "X"]
    ref_out = ref_s2i(
        TokenSpanArray(
            tokens_arr,
            [b for b, _ in ent_spans],
            [e for _, e in ent_spans],
        ),
        ent_types,
    )
    want = [
        (i, iob, None if pd.isna(t) else t)
        for i, (iob, t) in enumerate(
            zip(ref_out["ent_iob"], ref_out["ent_type"])
        )
    ]

    tokens = spark.createDataFrame(
        [(0, i, (b, e)) for i, (b, e) in enumerate(toks)],
        "doc_id long, token_idx int, span struct<begin:int,`end`:int>",
    )
    entities = spark.createDataFrame(
        [(0, (b, e), t) for (b, e), t in zip(ent_spans, ent_types)],
        "doc_id long, token_span struct<begin_token:int,end_token:int>, "
        "ent_type string",
    )
    got = sorted(
        (r["token_idx"], r["ent_iob"], r["ent_type"])
        for r in spans_to_iob(tokens, entities).collect()
    )
    assert got == want


def test_align_to_tokens_matches_reference(ref, spark):
    from text_extensions_for_pandas import SpanArray, TokenSpanArray

    from text_extensions_for_pandas_spark.operators.align import (
        align_to_tokens,
    )

    toks = _token_offsets()
    tokens_arr = SpanArray(TEXT, [b for b, _ in toks], [e for _, e in toks])
    # char spans exactly covering tokens 1..2 and token 7
    char_spans = [(toks[1][0], toks[2][1]), (toks[7][0], toks[7][1])]
    ref_out = TokenSpanArray.align_to_tokens(
        tokens_arr,
        SpanArray(
            TEXT, [b for b, _ in char_spans], [e for _, e in char_spans]
        ),
    )
    want = sorted((s.begin_token, s.end_token) for s in ref_out)

    tokens = spark.createDataFrame(
        [(0, i, (b, e)) for i, (b, e) in enumerate(toks)],
        "doc_id long, token_idx int, span struct<begin:int,`end`:int>",
    )
    spans = spark.createDataFrame(
        [(0, (b, e)) for b, e in char_spans],
        "doc_id long, span struct<begin:int,`end`:int>",
    )
    out = align_to_tokens(tokens, spans).collect()
    assert all(r["aligned"] for r in out)
    got = sorted(
        (r["token_span"]["begin_token"], r["token_span"]["end_token"])
        for r in out
    )
    assert got == want


def test_lemmatize_matches_reference(ref, spark):
    from text_extensions_for_pandas import SpanArray
    from text_extensions_for_pandas.spanner import lemmatize as ref_lemmatize

    from text_extensions_for_pandas_spark.operators.align import lemmatize

    toks = _token_offsets()
    tokens_arr = SpanArray(TEXT, [b for b, _ in toks], [e for _, e in toks])
    lemmas = [TEXT[b:e].lower().rstrip(".,") for b, e in toks]
    token_features = pd.DataFrame(
        {"span": pd.Series(tokens_arr), "lemma": lemmas}
    )
    char_spans = [(toks[1][0], toks[2][1]), (toks[7][0], toks[9][1])]
    want = sorted(
        ref_lemmatize(
            SpanArray(
                TEXT, [b for b, _ in char_spans], [e for _, e in char_spans]
            ),
            token_features,
        )
    )

    tokens = spark.createDataFrame(
        [
            (0, i, (b, e), lemmas[i])
            for i, (b, e) in enumerate(toks)
        ],
        "doc_id long, token_idx int, span struct<begin:int,`end`:int>, "
        "lemma string",
    )
    # our lemmatize takes token spans; tokens 1..3 and 7..10 match the
    # char spans above
    spans = spark.createDataFrame(
        [(0, (1, 3)), (0, (7, 10))],
        "doc_id long, token_span struct<begin_token:int,end_token:int>",
    )
    got = sorted(r["lemma"] for r in lemmatize(spans, tokens).collect())
    assert got == want and len(got) == 2


def test_watson_nlu_parse_matches_reference(ref, spark, tmp_path):
    import json
    import shutil

    from text_extensions_for_pandas.io.watson.nlu import (
        parse_response as ref_parse,
    )

    from text_extensions_for_pandas_spark.sources.watson import (
        parse_nlu_response,
    )

    fixture = "/root/reference/test_data/io/test_watson/basic_response.txt"
    ref_out = ref_parse(json.load(open(fixture)))

    # our reader takes a directory of response JSON files
    shutil.copy(fixture, tmp_path / "basic_response.json")
    ours = parse_nlu_response(spark, str(tmp_path / "basic_response.json"))

    # syntax tokens: identical spans, POS, lemmas
    want = sorted(
        (s.begin, s.end, pos, None if pd.isna(lem) else lem)
        for s, pos, lem in zip(
            ref_out["syntax"]["span"],
            ref_out["syntax"]["part_of_speech"],
            ref_out["syntax"]["lemma"],
        )
    )
    got = sorted(
        (r["span"]["begin"], r["span"]["end"], r["part_of_speech"], r["lemma"])
        for r in ours["syntax"].collect()
    )
    assert got == want and len(got) > 0

    # keywords: identical text/relevance/count (raw JSON values, no
    # arithmetic -> exact float equality is expected)
    want_kw = sorted(
        (t, rel, int(c))
        for t, rel, c in zip(
            ref_out["keywords"]["text"],
            ref_out["keywords"]["relevance"],
            ref_out["keywords"]["count"],
        )
    )
    got_kw = sorted(
        (r["text"], r["relevance"], int(r["count"]))
        for r in ours["keywords"].collect()
    )
    assert got_kw == want_kw and len(got_kw) > 0

    # entities: identical type/text
    want_ent = sorted(
        zip(ref_out["entities"]["type"], ref_out["entities"]["text"])
    )
    got_ent = sorted(
        (r["type"], r["text"]) for r in ours["entities"].collect()
    )
    assert got_ent == want_ent and len(got_ent) > 0


def test_conll_reader_matches_reference(ref, spark):
    """Whitespace-exact parity on the reference's own CoNLL-2003 fixture:
    same token spans, same reconstructed document text, same IOB tags."""
    from text_extensions_for_pandas.io.conll import (
        conll_2003_to_dataframes as ref_conll,
    )

    from text_extensions_for_pandas_spark.operators.iob import iob_to_iob2
    from text_extensions_for_pandas_spark.sources.conll import (
        conll_2003_to_dataframe,
    )

    fixture = "/root/reference/test_data/io/test_conll/conll03_test.txt"
    ref_docs = ref_conll(fixture, ["ent"], [True])

    # the reference reader applies IOB1->IOB2 repair internally; ours
    # leaves raw tags and composes with iob_to_iob2 — so this also
    # differentials the repair operator
    ours = iob_to_iob2(
        conll_2003_to_dataframe(
            spark, fixture, column_names=["ent"], iob_columns=[True]
        )
    ).collect()
    by_doc = {}
    for r in ours:
        by_doc.setdefault(r["doc_id"], []).append(r)

    assert len(by_doc) == len(ref_docs)
    for doc_id, ref_df in enumerate(ref_docs):
        got_rows = sorted(by_doc[doc_id], key=lambda r: r["token_idx"])
        want = [
            (s.begin, s.end, s.covered_text, iob, None if pd.isna(t) else t)
            for s, iob, t in zip(
                ref_df["span"], ref_df["ent_iob"], ref_df["ent_type"]
            )
        ]
        got = [
            (
                r["span"]["begin"],
                r["span"]["end"],
                r["token"],
                r["ent_iob"],
                r["ent_type"],
            )
            for r in got_rows
        ]
        assert got == want, f"doc {doc_id} mismatch"
        # reconstructed text identical -> every span's covered_text agrees
        ref_text = ref_df["span"].iloc[0].target_text
        for (b, e, tok, _, _) in got:
            assert ref_text[b:e] == tok


def test_conll_09_reader_matches_reference(ref, spark):
    """Predicate-args parity on the reference's own CoNLL-09 fixture: same
    spans, same base columns, same doc-level head renumbering, and the same
    widened predicate/pred{i}arg block (reference io/conll.py:294-311,
    699-703)."""
    from text_extensions_for_pandas.io.conll import conll_u_to_dataframes

    from text_extensions_for_pandas_spark.sources.conll import (
        CONLL_09_COLUMNS,
        conll_09_to_dataframe,
        widen_pred_args,
    )

    fixture = "/root/reference/test_data/io/test_conll/conll_09_test1.conllu"
    ref_df = conll_u_to_dataframes(fixture, column_names=list(CONLL_09_COLUMNS))[0]

    ours = widen_pred_args(conll_09_to_dataframe(spark, fixture))
    got_rows = sorted(ours.collect(), key=lambda r: r["token_idx"])
    assert len(got_rows) == len(ref_df)

    n_args = sum(1 for c in ref_df.columns if re.fullmatch(r"pred\d+arg", c))
    assert any(c.startswith("pred0arg") for c in ours.columns) or n_args == 0
    norm = lambda v: None if v is None or (pd.api.types.is_scalar(v) and pd.isna(v)) else v  # noqa: E731

    for i, r in enumerate(got_rows):
        span = ref_df["span"].iloc[i]
        assert (r["span"]["begin"], r["span"]["end"]) == (span.begin, span.end)
        assert r["token"] == span.covered_text
        for col in ("lemma", "upostag", "xpostag", "features", "deprel",
                    "fillpred", "predicate"):
            assert norm(r[col]) == norm(ref_df[col].iloc[i]), (i, col)
        want_head = norm(ref_df["head"].iloc[i])
        assert norm(r["head"]) == (int(want_head) if want_head is not None else None), i
        assert r["line_num"] == ref_df["line_num"].iloc[i]
        for a in range(n_args):
            assert norm(r[f"pred{a}arg"]) == norm(ref_df[f"pred{a}arg"].iloc[i]), (i, a)
    # reconstructed doc text identical (sentence-per-line)
    assert got_rows[0]["doc_text"] == ref_df["span"].iloc[0].target_text


def test_watson_tables_reconstruction_matches_reference(ref, spark, tmp_path):
    import json

    from text_extensions_for_pandas.io.watson import tables as RT

    from text_extensions_for_pandas_spark.sources import watson as W

    arch = json.load(
        open("/root/reference/test_data/io/test_watson_tables/archive.json")
    )
    resp = arch["cali-temp-chart"]
    ref_tbl = RT.make_table(RT.parse_response(resp))
    want = {
        (str(row_label), str(col_label), str(ref_tbl.loc[row_label, col_label]))
        for row_label in ref_tbl.index
        for col_label in ref_tbl.columns
    }

    (tmp_path / "cali.json").write_text(json.dumps(resp))
    cells = W.tables_body_cells(
        W.read_tables_responses(spark, str(tmp_path / "cali.json"))
    )
    ours = W.make_table(cells, max_header_levels=1).collect()
    got = set()
    for r in ours:
        d = r.asDict()
        row_label = d.pop("row_header_texts_0")
        d.pop("doc_id", None), d.pop("table_idx", None)
        for col_label, v in d.items():
            got.add((str(row_label), str(col_label), str(v)))
    assert got == want and len(got) > 0


def test_unpack_semijoin_matches_reference(ref, spark):
    from text_extensions_for_pandas import Span, SpanArray
    from text_extensions_for_pandas.spanner import (
        unpack_semijoin as ref_unpack,
    )

    from text_extensions_for_pandas_spark.operators.join import unpack_semijoin

    region = Span(TEXT, 25, 56)  # "the sun was shining and shining"
    region_text = TEXT[25:56]
    rel_spans = [(0, 3), (4, 7), (12, 19)]
    model_results = pd.DataFrame(
        {
            "match": pd.Series(
                SpanArray(
                    region_text,
                    [b for b, _ in rel_spans],
                    [e for _, e in rel_spans],
                )
            ),
            "label": ["A", "B", "C"],
        }
    )
    ref_out = ref_unpack(region, model_results)
    want = sorted(
        (s.begin, s.end, lab)
        for s, lab in zip(ref_out["match"], ref_out["label"])
    )

    regions = spark.createDataFrame(
        [(0, (25, 56))], "doc_id long, region struct<begin:int,`end`:int>"
    )
    results = spark.createDataFrame(
        [(0, (b, e), lab) for (b, e), lab in zip(rel_spans, ["A", "B", "C"])],
        "doc_id long, match struct<begin:int,`end`:int>, label string",
    )
    got = sorted(
        (r["match"]["begin"], r["match"]["end"], r["label"])
        for r in unpack_semijoin(regions, results, span_cols=["match"]).collect()
    )
    assert got == want


def test_accuracy_machinery_matches_reference(ref, spark):
    from text_extensions_for_pandas import SpanArray
    from text_extensions_for_pandas.io.conll import (
        compute_accuracy_by_document as ref_by_doc,
    )
    from text_extensions_for_pandas.io.conll import (
        compute_global_accuracy as ref_global,
    )

    from text_extensions_for_pandas_spark.operators.cleaning import (
        compute_accuracy_by_document,
        compute_global_accuracy,
    )

    def ref_frame(spans, types):
        return pd.DataFrame(
            {
                "span": pd.Series(
                    SpanArray(
                        TEXT, [b for b, _ in spans], [e for _, e in spans]
                    )
                ),
                "ent_type": types,
            }
        )

    gold = {
        ("test", 0): ref_frame([(0, 2), (3, 10), (25, 28)], ["A", "B", "A"]),
        ("test", 1): ref_frame([(11, 14)], ["C"]),
    }
    pred = {
        ("test", 0): ref_frame([(0, 2), (3, 10), (29, 32)], ["A", "X", "A"]),
        ("test", 1): ref_frame([], []),
    }
    ref_stats = ref_by_doc(gold, pred)
    ref_glob = ref_global(ref_stats)

    mk = lambda d: spark.createDataFrame(  # noqa: E731
        [
            (fold, doc, (int(s.begin), int(s.end)), t)
            for (fold, doc), df in d.items()
            for s, t in zip(df["span"], df["ent_type"])
        ],
        "fold string, doc_id long, span struct<begin:int,`end`:int>, "
        "ent_type string",
    )
    ours = compute_accuracy_by_document(mk(gold), mk(pred))
    got = {
        (r["fold"], r["doc_id"]): r.asDict() for r in ours.collect()
    }
    for _, row in ref_stats.iterrows():
        g = got[(row["fold"], int(row["doc_num"]))]
        assert g["num_entities_in_common"] == int(row["num_true_positives"])
        assert g["num_extracted_entities"] == int(row["num_extracted"])
        assert g["num_true_entities"] == int(row["num_entities"])
        # reference yields NaN on 0/0 (io/conll variant); ours defines those
        # as 0 (cleaning-module variant) — compare only defined values
        if not pd.isna(row["precision"]):
            assert round(g["precision"], 6) == round(float(row["precision"]), 6)
        if not pd.isna(row["recall"]):
            assert round(g["recall"], 6) == round(float(row["recall"]), 6)

    ours_glob = compute_global_accuracy(ours).collect()[0]
    assert round(float(ref_glob["precision"]), 6) == ours_glob["precision"]
    assert round(float(ref_glob["recall"]), 6) == ours_glob["recall"]
    assert round(float(ref_glob["F1"]), 6) == ours_glob["F1"]


def test_extract_regex_tok_matches_reference(ref, spark):
    import regex

    from text_extensions_for_pandas import SpanArray
    from text_extensions_for_pandas.spanner import (
        extract_regex_tok as ref_ert,
    )

    from text_extensions_for_pandas_spark.functions.text import (
        tokenize_whitespace,
    )
    from text_extensions_for_pandas_spark.operators.extract import (
        extract_regex_tok,
    )

    toks = _token_offsets()
    tokens_arr = SpanArray(TEXT, [b for b, _ in toks], [e for _, e in toks])
    pattern = r"[a-z]+( [a-z]+)?"  # 1-2 all-lowercase tokens
    ref_out = ref_ert(tokens_arr, regex.compile(pattern), min_len=1, max_len=2)
    want = sorted((s.begin, s.end) for s in ref_out["match"])

    docs = spark.createDataFrame([(0, TEXT)], ["doc_id", "text"])
    toks = tokenize_whitespace(docs).join(docs, "doc_id")
    got = sorted(
        (r["span"]["begin"], r["span"]["end"])
        for r in extract_regex_tok(
            toks, pattern, min_len=1, max_len=2
        ).collect()
    )
    assert got == want and len(got) > 0


def test_extract_dict_matches_reference(ref, spark):
    from text_extensions_for_pandas import SpanArray
    from text_extensions_for_pandas.spanner import extract_dict as ref_ed

    from text_extensions_for_pandas_spark.functions.text import (
        tokenize_whitespace,
    )
    from text_extensions_for_pandas_spark.operators.extract import (
        create_dict,
        extract_dict,
    )

    toks = _token_offsets()
    tokens_arr = SpanArray(TEXT, [b for b, _ in toks], [e for _, e in toks])
    entries = [["the", "sun"], ["shining"], ["in", "ad"]]
    ref_dict = pd.DataFrame(
        {
            "toks_0": [e[0] for e in entries],
            "toks_1": [e[1] if len(e) > 1 else None for e in entries],
            "toks_2": [None, None, None],
        }
    )
    ref_out = ref_ed(tokens_arr, ref_dict)
    want = sorted((s.begin, s.end) for s in ref_out["match"])

    docs = spark.createDataFrame([(0, TEXT)], ["doc_id", "text"])
    d = create_dict(spark, ["the sun", "shining", "in ad"])
    got = sorted(
        (r["span"]["begin"], r["span"]["end"])
        for r in extract_dict(tokenize_whitespace(docs), d).collect()
    )
    assert got == want and len(got) > 0


def test_span_scalar_semantics_match_reference(ref, spark):
    """Span + (minimal covering merge) and the covering-span "sum"
    aggregate against the reference's scalar/array behavior."""
    from text_extensions_for_pandas import Span, SpanArray

    from text_extensions_for_pandas_spark.functions.spans import (
        covering_span,
        merge_spans,
    )

    pairs = [((3, 10), (11, 14)), ((25, 28), (26, 32)), ((29, 29), (25, 28))]
    want_merge = [
        (
            (Span(TEXT, a[0], a[1]) + Span(TEXT, b[0], b[1])).begin,
            (Span(TEXT, a[0], a[1]) + Span(TEXT, b[0], b[1])).end,
        )
        for a, b in pairs
    ]
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(pairs)],
        "i int, a struct<begin:int,`end`:int>, b struct<begin:int,`end`:int>",
    )
    got_merge = [
        (r["m"]["begin"], r["m"]["end"])
        for r in df.select("i", merge_spans("a", "b").alias("m"))
        .orderBy("i")
        .collect()
    ]
    assert got_merge == want_merge

    spans = [(0, 2), (3, 10), (25, 28), (29, 29)]
    ref_sum = pd.Series(
        SpanArray(TEXT, [b for b, _ in spans], [e for _, e in spans])
    ).sum()
    sdf = spark.createDataFrame(
        [(0, s) for s in spans], "doc_id long, span struct<begin:int,`end`:int>"
    )
    got_sum = (
        sdf.groupBy("doc_id").agg(covering_span("span").alias("s")).collect()[0]["s"]
    )
    assert (got_sum["begin"], got_sum["end"]) == (ref_sum.begin, ref_sum.end)


def test_flag_suspicious_labels_matches_reference(ref, spark):
    """Vote-counting parity: same (element, label) -> (in_gold, #agreeing
    models, model list) as the reference's grouped aggregation."""
    from text_extensions_for_pandas.cleaning.analysis import (
        flag_suspicious_labels as ref_flag,
    )

    from text_extensions_for_pandas_spark.operators.cleaning import (
        flag_suspicious_labels,
    )

    # three elements: span 0 gold PER, both models agree; span 1 gold ORG,
    # no model agrees (one says LOC); span 2 not in gold, both models say PER
    def pdf(label_col, rows):
        return pd.DataFrame(
            {
                "fold": [r[0] for r in rows],
                "doc_num": [r[1] for r in rows],
                "raw_span_id": [r[2] for r in rows],
                "raw_span": [f"s{r[2]}" for r in rows],
                label_col: [r[3] for r in rows],
            }
        )

    gold = pdf("gold_label", [("t", 0, 0, "PER"), ("t", 0, 1, "ORG")])
    m1 = pdf("pred_label", [("t", 0, 0, "PER"), ("t", 0, 1, "LOC"), ("t", 0, 2, "PER")])
    m2 = pdf("pred_label", [("t", 0, 0, "PER"), ("t", 0, 2, "PER")])
    grouped = ref_flag(
        {"m1": m1, "m2": m2},
        corpus_label_col="gold_label",
        predicted_label_col="pred_label",
        gold_feats=gold,
        split_doc=False,
    )
    want = {
        (int(r["raw_span_id"]), r["class"]): (
            bool(r["in_gold"]),
            int(r["count"]),
            sorted(m for m in r["models"] if m != "GOLD"),
        )
        for _, r in grouped.iterrows()
    }

    rows = []
    for model, df in [("GOLD", gold), ("m1", m1), ("m2", m2)]:
        lab = "gold_label" if model == "GOLD" else "pred_label"
        for _, r in df.iterrows():
            rows.append(
                ("t", 0, (int(r["raw_span_id"]), int(r["raw_span_id"]) + 1),
                 r[lab], model)
            )
    ours = flag_suspicious_labels(
        spark.createDataFrame(
            rows,
            "fold string, doc_id long, span struct<begin:int,`end`:int>, "
            "ent_type string, model string",
        )
    )
    got = {
        (r["span"]["begin"], r["ent_type"]): (
            r["in_gold"],
            int(r["num_models"]),
            sorted(m for m in r["models"] if m != "GOLD"),
        )
        for r in ours.collect()
    }
    assert got == want and len(got) == 4


def test_token_class_categoricals_match_reference(ref, spark):
    from text_extensions_for_pandas import SpanArray
    from text_extensions_for_pandas.io.conll import (
        add_token_classes as ref_add,
    )
    from text_extensions_for_pandas.io.conll import (
        decode_class_labels as ref_decode,
    )
    from text_extensions_for_pandas.io.conll import (
        make_iob_tag_categories as ref_cats,
    )

    from text_extensions_for_pandas_spark.operators.iob import (
        add_token_classes,
        decode_class_labels,
        make_iob_tag_categories,
    )

    types = ["PER", "ORG"]
    dtype, int_to_label, label_to_int = ref_cats(types)
    labels, class_ids = make_iob_tag_categories(types)
    assert labels == list(int_to_label)
    assert class_ids == dict(label_to_int)

    toks = _token_offsets()[:5]
    iob = ["O", "B", "I", "O", "B"]
    typ = [None, "PER", "PER", None, "ORG"]
    ref_df = pd.DataFrame(
        {
            "span": pd.Series(
                SpanArray(TEXT, [b for b, _ in toks], [e for _, e in toks])
            ),
            "ent_iob": iob,
            "ent_type": typ,
        }
    )
    ref_out = ref_add(ref_df, dtype)
    want = list(zip(ref_out["token_class"].astype(str), ref_out["token_class_id"]))

    tokens = spark.createDataFrame(
        [(0, i, iob[i], typ[i]) for i in range(5)],
        "doc_id long, token_idx int, ent_iob string, ent_type string",
    )
    got_rows = (
        add_token_classes(tokens, class_ids).orderBy("token_idx").collect()
    )
    got = [(r["token_class"], r["token_class_id"]) for r in got_rows]
    assert got == [(c, int(i)) for c, i in want]

    # decode inverts: reference decode on the string labels gives back tags
    ref_iobs, ref_types = ref_decode([c for c, _ in want])
    preds = spark.createDataFrame(
        [(i, int(w[1])) for i, w in enumerate(want)],
        "token_idx int, predicted_id int",
    )
    got_dec = sorted(
        (r["token_idx"], r["predicted_iob"], r["predicted_type"])
        for r in decode_class_labels(preds, labels).collect()
    )
    want_dec = [
        (i, io, t) for i, (io, t) in enumerate(zip(ref_iobs, ref_types))
    ]
    assert got_dec == want_dec


def test_arrow_interop_reads_reference_serialization(ref, spark, tmp_path):
    """Files serialized by the REFERENCE's own Arrow conversion are readable
    by our interop layer with identical span semantics."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from text_extensions_for_pandas import SpanArray
    from text_extensions_for_pandas.array.arrow_conversion import span_to_arrow

    from text_extensions_for_pandas_spark.sources import arrow_interop as AI

    spans = [(0, 2), (3, 10), (25, 28), (37, 44)]
    sa = SpanArray(TEXT, [b for b, _ in spans], [e for _, e in spans])
    arr = span_to_arrow(sa)
    table = pa.table(
        {"span": arr, "label": pa.array(["A", "B", "C", "D"])}
    )
    path = str(tmp_path / "ref_written.parquet")
    pq.write_table(table, path)

    rows, documents = AI.read_reference_parquet(spark, path)
    got = sorted(
        (r["span"]["begin"], r["span"]["end"], r["label"])
        for r in rows.collect()
    )
    assert got == [(b, e, lab) for (b, e), lab in zip(spans, "ABCD")]
    # document text survives the dictionary encoding
    assert {r["text"] for r in documents.collect()} == {TEXT}


# Mixed-script text with an ASTRAL-PLANE emoji (U+1F600, 2 UTF-16 units,
# 4 UTF-8 bytes) placed EARLY so every later offset diverges if any layer
# counts UTF-16 units or bytes instead of code points, plus combining
# accents, CJK, and mathematical-alphanumeric (also astral) letters.
UNICODE_TEXT = "naïve 😀 café — 中文 test 𝔘𝔫𝔦 done"


def test_unicode_offsets_match_reference(ref, spark):
    """Python computes match offsets in code points (reference semantics,
    ``array/span.py:104-144``); the ``match`` column re-slices those
    offsets with JVM ``substring``.  Both must agree on text containing
    astral-plane characters — a divergence here silently corrupts every
    downstream span over non-BMP text."""
    from text_extensions_for_pandas.spanner import extract_regex as ref_extract

    from text_extensions_for_pandas_spark.operators.extract import extract_regex

    pattern = r"\w+"
    ref_spans = ref_extract(UNICODE_TEXT, re.compile(pattern))
    want = sorted(
        (s.begin, s.end, s.covered_text) for s in ref_spans
    )
    docs = spark.createDataFrame([(0, UNICODE_TEXT)], ["doc_id", "text"])
    out = extract_regex(docs, pattern).collect()
    got = sorted(
        (r["span"]["begin"], r["span"]["end"], r["match"]) for r in out
    )
    assert got == want and len(got) >= 6
    # the astral letters must survive the round trip intact
    assert any("𝔘𝔫𝔦" == m for _, _, m in got)


def test_unicode_tokenizer_offset_invariant(spark):
    """JVM-side whitespace tokenizer offsets must slice back to the token
    under BOTH engines' string semantics: Spark ``substring`` (covered_text)
    and Python ``str`` slicing of the same offsets."""
    from text_extensions_for_pandas_spark.functions.spans import covered_text
    from text_extensions_for_pandas_spark.functions.text import (
        tokenize_whitespace,
    )

    docs = spark.createDataFrame([(0, UNICODE_TEXT)], ["doc_id", "text"])
    toks = tokenize_whitespace(docs)
    import pyspark.sql.functions as F

    rows = (
        toks.join(docs, "doc_id")
        .select("token", covered_text("text", "span").alias("cov"), "span")
        .collect()
    )
    assert len(rows) == len(UNICODE_TEXT.split())
    for r in rows:
        assert r.token == r.cov, (r.token, r.cov)
        assert UNICODE_TEXT[r.span.begin : r.span.end] == r.token


def test_f1_simple_and_ensemble_match_reference(ref, spark):
    """``f1_score_simple`` / ``create_f1_report_ensemble`` vs the
    reference's ``create_f1_score_report_iob(simple=True)`` and
    ``create_f1_report_ensemble_iob`` (cleaning/analysis.py:69-210) on the
    same entity tables.  (The non-simple reference path uses the removed
    ``DataFrame.append`` API and cannot execute on modern pandas; the
    simple/ensemble path is its still-runnable core.)"""
    from text_extensions_for_pandas import SpanArray
    from text_extensions_for_pandas.cleaning.analysis import (
        create_f1_report_ensemble_iob as ref_ensemble,
    )
    from text_extensions_for_pandas.cleaning.analysis import (
        create_f1_score_report_iob as ref_simple,
    )

    from text_extensions_for_pandas_spark.operators.cleaning import (
        create_f1_report_ensemble,
        f1_score_simple,
    )

    def ref_frame(rows):
        return pd.DataFrame(
            {
                "fold": [f for f, *_ in rows],
                "doc_num": [d for _, d, *_ in rows],
                "span": pd.Series(
                    SpanArray(
                        TEXT,
                        [b for *_, (b, _e), _t in rows],
                        [e for *_, (_b, e), _t in rows],
                    )
                ),
                "ent_type": [t for *_, t in rows],
            }
        )

    gold_rows = [
        ("t", 0, (0, 2), "A"),
        ("t", 0, (3, 10), "B"),
        ("t", 0, (25, 28), "A"),
        ("t", 1, (11, 14), "C"),
    ]
    models = {
        "m1": [
            ("t", 0, (0, 2), "A"),
            ("t", 0, (3, 10), "X"),   # wrong type
            ("t", 0, (29, 32), "A"),  # wrong span
            ("t", 1, (11, 14), "C"),
        ],
        "m2": [
            ("t", 0, (0, 2), "A"),
            ("t", 0, (3, 10), "B"),
        ],
    }
    span_cols = ["fold", "doc_num", "span"]
    ref_out = ref_ensemble(
        {k: ref_frame(v) for k, v in models.items()},
        ref_frame(gold_rows),
        span_id_col_names=span_cols,
    )
    ref_m1 = ref_simple(
        ref_frame(models["m1"]), ref_frame(gold_rows),
        span_id_col_names=span_cols, simple=True,
    )

    schema = (
        "fold string, doc_id long, span struct<begin:int,`end`:int>, "
        "ent_type string"
    )
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        [(f, d, (b, e), t) for f, d, (b, e), t in rows], schema
    )
    gold = mk(gold_rows)

    simple = f1_score_simple(gold, mk(models["m1"])).collect()[0]
    assert simple["precision"] == round(ref_m1["precision"], 6)
    assert simple["recall"] == round(ref_m1["recall"], 6)
    assert simple["f1"] == round(ref_m1["f1-score"], 6)

    stacked = None
    for name, rows in models.items():
        import pyspark.sql.functions as F

        tagged = mk(rows).withColumn("model", F.lit(name))
        stacked = tagged if stacked is None else stacked.unionByName(tagged)
    ours = {
        r["model"]: r
        for r in create_f1_report_ensemble(stacked, gold).collect()
    }
    for name in models:
        want = ref_out.loc[name]
        got = ours[name]
        assert got["precision"] == round(float(want["precision"]), 6), name
        assert got["recall"] == round(float(want["recall"]), 6), name
        assert got["f1"] == round(float(want["f1-score"]), 6), name


def test_classification_report_hand_computed(spark):
    """``create_classification_report`` against a hand-computed confusion
    matrix (reference ``create_f1_score_report`` wraps sklearn's
    classification_report, unavailable here -- the expected values below
    follow its documented definitions, zero_division=0)."""
    from text_extensions_for_pandas_spark.operators.cleaning import (
        create_classification_report,
    )

    #        gold -> pred
    rows = (
        [("A", "A")] * 3        # A: 3 tp
        + [("A", "B")] * 1      # A->B: fn for A, fp for B
        + [("B", "B")] * 2      # B: 2 tp
        + [("B", "O")] * 1
        + [("O", "O")] * 4
        + [("O", "A")] * 2      # fp for A
    )
    df = spark.createDataFrame(rows, ["gold_label", "pred_label"])
    out = {r["label"]: r for r in create_classification_report(df).collect()}

    # A: support 4, predicted 5, tp 3
    assert out["A"]["support"] == 4
    assert out["A"]["precision"] == 0.6
    assert out["A"]["recall"] == 0.75
    assert out["A"]["f1"] == round(2 * 0.6 * 0.75 / 1.35, 6)
    # B: support 3, predicted 3, tp 2
    assert out["B"]["precision"] == round(2 / 3, 6)
    assert out["B"]["recall"] == round(2 / 3, 6)
    # O: support 6 (4 kept + 2 mislabeled as A), predicted 5, tp 4
    assert out["O"]["support"] == 6
    assert out["O"]["precision"] == 0.8
    assert out["O"]["recall"] == round(4 / 6, 6)
    # accuracy = 9/13 everywhere in that row
    acc = round(9 / 13, 6)
    assert out["__accuracy__"]["precision"] == acc
    assert out["__accuracy__"]["f1"] == acc
    assert out["__accuracy__"]["support"] == 13
    # macro = unweighted means of the rounded per-label stats
    import numpy as np

    per = [out[k] for k in ("A", "B", "O")]
    assert out["__macro__"]["precision"] == round(
        float(np.mean([p["precision"] for p in per])), 6
    )
    # weighted = support-weighted means
    wsum = sum(p["support"] for p in per)
    assert out["__weighted__"]["recall"] == round(
        sum(p["recall"] * p["support"] for p in per) / wsum, 6
    )
    assert out["__weighted__"]["support"] == 13


def test_f1_ensemble_zero_prediction_model(spark):
    """A model with no predicted entities must still get an all-zero row
    when the roster is passed (the reference's input dict keys guarantee
    this implicitly)."""
    from text_extensions_for_pandas_spark.operators.cleaning import (
        create_f1_report_ensemble,
    )

    schema = (
        "fold string, doc_id long, span struct<begin:int,`end`:int>, "
        "ent_type string, model string"
    )
    gold = spark.createDataFrame(
        [("t", 0, (0, 2), "A", "GOLD")], schema
    ).drop("model")
    stacked = spark.createDataFrame([("t", 0, (0, 2), "A", "m1")], schema)
    out = {
        r["model"]: r
        for r in create_f1_report_ensemble(
            stacked, gold, models=["m1", "m_silent"]
        ).collect()
    }
    assert out["m1"]["f1"] == 1.0
    assert out["m_silent"]["tp"] == 0 and out["m_silent"]["n_pred"] == 0
    assert out["m_silent"]["precision"] == 0.0 and out["m_silent"]["f1"] == 0.0


def test_reference_namespace_compatibility(ref):
    """A migrating user's reference-shaped imports must resolve: every
    ``tp.spanner`` export, the ``tp.io`` module layout, the
    ``tp.cleaning.{analysis,ensemble,preprocess}`` functions, and
    ``tp.jupyter.pretty_print_html`` exist under the Spark package's alias
    namespaces.  Documented absences:
    ``run_with_progress_bar`` (Spark UI), ``create_bert_actor_class``
    (Ray — Spark IS the runtime).  ``DataFrameWidget`` exists as the
    STATIC subset (``display.py``): display/to_dataframe/selected/
    ``_repr_html_`` without browser-side editing
    (``set_interactive_columns`` raises with a scope note).
    """
    import importlib
    import inspect

    import text_extensions_for_pandas_spark as teps

    # spanner: exact export parity
    ref_spanner = importlib.import_module(
        "text_extensions_for_pandas.spanner"
    )
    ours = importlib.import_module("text_extensions_for_pandas_spark.spanner")
    ref_names = [
        n for n in dir(ref_spanner)
        if inspect.isfunction(getattr(ref_spanner, n))
    ]
    for n in ref_names:
        assert hasattr(ours, n), f"spanner.{n} missing"

    # io: module layout
    io_mod = importlib.import_module("text_extensions_for_pandas_spark.io")
    for sub in ("conll", "spacy", "bert", "watson"):
        assert hasattr(io_mod, sub), f"io.{sub} missing"
    assert hasattr(io_mod.conll, "conll_2003_to_dataframe")
    assert hasattr(io_mod.spacy, "make_tokens_and_features")
    assert hasattr(io_mod.bert, "make_bert_tokens")
    assert hasattr(io_mod.conll, "default_ewt_metadata")

    # cleaning: function-level parity with documented exceptions
    skip = {"create_bert_actor_class"}
    for sub, ours_name in (
        ("analysis", "analysis"), ("ensemble", "ensemble"),
        ("preprocess", "preprocess"),
    ):
        ref_mod = importlib.import_module(
            f"text_extensions_for_pandas.cleaning.{sub}"
        )
        our_mod = importlib.import_module(
            f"text_extensions_for_pandas_spark.cleaning.{ours_name}"
        )
        mapped = {
            # reference name -> our name where they differ
            "create_f1_score_report": "create_classification_report",
            "create_f1_score_report_iob": "create_f1_report",
            "create_f1_report_ensemble_iob": "create_f1_report_ensemble",
            "infer_and_extract_raw_entites": "infer_and_extract_raw_entites",
        }
        for n in dir(ref_mod):
            fn = getattr(ref_mod, n)
            if not (inspect.isfunction(fn) and not n.startswith("_")):
                continue
            if inspect.getmodule(fn) is not ref_mod or n in skip:
                continue
            assert hasattr(our_mod, mapped.get(n, n)), f"cleaning.{sub}.{n}"

    # jupyter
    jup = importlib.import_module("text_extensions_for_pandas_spark.jupyter")
    assert hasattr(jup, "pretty_print_html")
    del teps


def test_notebook_import_paths_resolve():
    """Every tp.* attribute path used in the reference's own notebooks and
    tutorials (extracted by scanning their code cells) must resolve through
    the alias namespaces — except the array types (the Spark data model
    replaces them) and the documented absences."""
    import text_extensions_for_pandas_spark as tp

    paths = [
        "cleaning.analysis.csv_prep",
        "cleaning.preprocess_documents",
        "io.bert.add_embeddings",
        "io.bert.align_bert_tokens_to_corpus_tokens",
        "io.bert.conll_to_bert",
        "io.bert.make_bert_tokens",
        "io.conll.add_token_classes",
        "io.conll.combine_folds",
        "io.conll.compute_accuracy_by_document",
        "io.conll.compute_global_accuracy",
        "io.conll.conll_2003_output_to_dataframes",
        "io.conll.conll_2003_to_dataframes",
        "io.conll.conll_u_to_dataframes",
        "io.conll.decode_class_labels",
        "io.conll.iob_to_spans",
        "io.conll.make_iob_tag_categories",
        "io.conll.spans_to_iob",
        "io.spacy.make_tokens",
        "io.spacy.make_tokens_and_features",
        "io.spacy.render_parse_tree",
        "io.spacy.simple_tokenizer",
        "io.watson.nlu.parse_response",
        "io.watson.tables.convert_cols_to_numeric",
        "io.watson.tables.make_exploded_df",
        "io.watson.tables.make_table",
        "io.watson.tables.parse_response",
        "spanner.adjacent_join",
        "spanner.consolidate",
        "spanner.contain_join",
        "spanner.extract.create_dict",
        "spanner.extract_dict",
        "spanner.extract_regex",
        "spanner.extract_regex_tok",
        "spanner.join.unpack_semijoin",
        "spanner.overlap_join",
    ]
    missing = []
    for p in paths:
        obj = tp
        for part in p.split("."):
            obj = getattr(obj, part, None)
            if obj is None:
                missing.append(p)
                break
    assert not missing, missing
