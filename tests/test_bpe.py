"""Distributed BPE training: pair counting, greedy merge semantics, and
end-to-end parity against a pure-Python reference implementation."""

from collections import Counter

from tests.conftest import rows_to_tuples
from text_extensions_for_pandas_spark.operators import bpe


# ---------------------------------------------------------------------------
# pure-Python reference BPE (Sennrich-style, word-frequency table)
# ---------------------------------------------------------------------------

def _py_bpe(texts, n_merges, min_pair_count=2):
    words = Counter(
        w for t in texts for w in t.strip().lower().split(" ") if w
    )
    syms = {w: list(w) for w in words}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, c in words.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += c
        if not pairs:
            break
        # highest count, then lexicographic (a, b) — mirrors train_bpe
        (a, b), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < min_pair_count:
            break
        merges.append((a, b))
        for w in syms:
            s, out, i = syms[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges, syms


def test_pair_counts_hand_computed(spark):
    docs = spark.createDataFrame([(1, "ab ab abc")], ["doc_id", "text"])
    w = bpe.with_symbols(bpe.word_freq_table(docs))
    got = rows_to_tuples(bpe.bpe_pair_counts(w), "a", "b", "cnt")
    assert got == [("a", "b", 3), ("b", "c", 1)]


def test_apply_merge_is_greedy_left_to_right(spark):
    # 'aaaa' under (a,a) must become [aa, aa]; 'aaa' must become [aa, a]
    # (no overlapping re-match of the just-merged symbol)
    w = spark.createDataFrame(
        [("aaaa", 1), ("aaa", 1), ("baa", 1)], ["word", "count"]
    )
    got = rows_to_tuples(
        bpe.apply_merge(bpe.with_symbols(w), "a", "a"), "word", "symbols"
    )
    assert got == [
        ("aaa", ["aa", "a"]),
        ("aaaa", ["aa", "aa"]),
        ("baa", ["b", "aa"]),
    ]


def test_train_bpe_matches_pure_python_reference(spark):
    texts = [
        "low lower lowest low low",
        "new newer newest new",
        "wide wider widest",
        "low new wide lowest",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    want_merges, want_syms = _py_bpe(texts, n_merges=10)
    got_merges, final = bpe.train_bpe(docs, n_merges=10)
    assert got_merges == want_merges
    got_syms = {
        r["word"]: list(r["symbols"]) for r in final.collect()
    }
    assert got_syms == want_syms


def test_train_bpe_stops_when_no_pair_reaches_min_count(spark):
    docs = spark.createDataFrame([(1, "ab cd ef")], ["doc_id", "text"])
    merges, _ = bpe.train_bpe(docs, n_merges=5, min_pair_count=2)
    assert merges == []


def test_segment_words_applies_learned_merges_in_order(spark):
    docs = spark.createDataFrame(
        [(1, "low lower lowest low low")], ["doc_id", "text"]
    )
    merges, _ = bpe.train_bpe(docs, n_merges=3)
    new_words = spark.createDataFrame(
        [("lowly", 1), ("slow", 1)], ["word", "count"]
    )
    got = rows_to_tuples(
        bpe.segment_words(new_words, merges), "word", "symbols"
    )
    # merges learned on 'low…' words segment unseen words consistently
    by_word = dict(got)
    assert by_word["lowly"][0] == "low"
    assert by_word["slow"][-1][-1] == "w"


def test_bpe_encode_corpus_matches_vocab_segmentation(spark):
    texts = ["low lower lowest low low", "new newer newest new low"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    merges, _ = bpe.train_bpe(docs, n_merges=6)
    _, want_syms = _py_bpe(texts, n_merges=6)
    got = bpe.bpe_encode_corpus(docs, merges).collect()
    # every word occurrence present, in position order, with the
    # segmentation the trained vocabulary assigns to that word
    for r in got:
        assert list(r["subtokens"]) == want_syms[r["word"]]
        assert texts[r["doc_id"]].split()[r["pos"]] == r["word"]
    n_words = sum(len(t.split()) for t in texts)
    assert len(got) == n_words
    # concatenating subtokens reconstructs each word exactly
    for r in got:
        assert "".join(r["subtokens"]) == r["word"]


def test_apply_merge_randomized_differential(spark):
    """One Spark pass over 300 random short words, checked against the
    pure-Python greedy merge for several (a, b) pairs including the
    pathological self-pair."""
    import random

    rng = random.Random(42)
    words = [
        "".join(rng.choice("ab") for _ in range(rng.randint(0, 8)))
        for _ in range(300)
    ]
    words = [w for w in words if w]
    df = spark.createDataFrame(
        [(w, 1) for w in set(words)], ["word", "count"]
    )

    def py_merge(s, a, b):
        out, i = [], 0
        while i < len(s):
            if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(s[i])
                i += 1
        return out

    for a, b in [("a", "a"), ("a", "b"), ("b", "a"), ("b", "b")]:
        got = {
            r["word"]: list(r["symbols"])
            for r in bpe.apply_merge(bpe.with_symbols(df), a, b).collect()
        }
        for w in got:
            assert got[w] == py_merge(list(w), a, b), (w, a, b, got[w])
            assert "".join(got[w]) == w


def test_train_bpe_driver_and_distributed_paths_identical(spark):
    """The in-memory finish (default) and the per-merge distributed loop
    must produce identical merges AND identical final segmentations —
    the parity contract that makes the fast path safe to default to."""
    import random

    rng = random.Random(7)
    texts = [
        " ".join(
            "".join(rng.choice("abcde") for _ in range(rng.randint(1, 7)))
            for _ in range(30)
        )
        for _ in range(20)
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    fast_merges, fast_words = bpe.train_bpe(docs, n_merges=24)
    slow_merges, slow_words = bpe.train_bpe(
        docs, n_merges=24, max_driver_words=None
    )
    assert fast_merges == slow_merges
    fast = {r["word"]: (r["count"], list(r["symbols"])) for r in fast_words.collect()}
    slow = {r["word"]: (r["count"], list(r["symbols"])) for r in slow_words.collect()}
    assert fast == slow
