"""Tokenization + text-analysis column functions.

Tokenizers are the "make_tokens" surface of the reference
(``io/spacy.py:75-90``, ``io/bert.py:51-120``) re-expressed Spark-first:

* ``tokenize_whitespace`` — 100% JVM-side (split + posexplode + window
  cumsum); exact char offsets with no Python in the loop.  This is the
  default tokenizer for the engine and for dictionary matching
  (tokenizer determinism requirement: reference ``spanner/extract.py:80-83``).
* ``tokenize_regex`` — Arrow-batched pandas UDF wrapping ``re.finditer``
  (the general path for spaCy-like punctuation splitting,
  reference ``io/spacy.py:48-72``); one UDF call per document row,
  vectorized over batches.

Text-analysis functions (language-id, quality scoring, token counting,
fingerprinting) are the beyond-reference training-data-pipeline surface; all
of them are built-in-function compositions that stay inside whole-stage
codegen — no UDFs — so they hold up on 100 TB scans.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from text_extensions_for_pandas_spark.functions.spans import make_span

# Word-or-single-punctuation token pattern (spaCy-ish, reference
# ``io/spacy.py:48-72``).
DEFAULT_TOKEN_PATTERN = r"\w+|[^\w\s]"

# CJK-aware variant: each Han/kana/Hangul character is its own token
# (the standard ~1-token-per-character BPE approximation).  The default
# pattern's CJK behavior is ENGINE-DEPENDENT: Java's ``\w`` is
# ASCII-only, so JVM consumers (``token_count``) incidentally count CJK
# per char already, while Python's ``\w`` is Unicode, so ``re``-based
# consumers (``tokenize_regex``, ``chunk_by_sentences`` token budgets)
# swallow a whole CJK sentence as ONE token and blow the budget.  This
# pattern makes per-char counting explicit and identical on BOTH
# engines.  Opt-in: the default stays as-is so existing gated counts
# are unchanged.
CJK_TOKEN_PATTERN = (
    "[\\u3400-\\u4dbf\\u4e00-\\u9fff\\u3040-\\u30ff\\uac00-\\ud7af]"
    r"|\w+|[^\w\s]"
)

# Tiny per-language marker-word profiles for the n-gram/stopword language-ID
# heuristic.  Real deployments would swap in fastText/CLD3 via a pandas UDF;
# the heuristic keeps the hot path JVM-side.
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "est"],
    "de": ["der", "die", "und", "das", "von", "ein", "ist", "zu"],
    "it": ["di", "che", "il", "per", "non", "con", "una", "sono"],
    "pt": ["de", "que", "não", "uma", "para", "com", "os", "do"],
    "nl": ["de", "het", "een", "van", "en", "dat", "niet", "op"],
    "el": ["και", "του", "την", "είναι", "που", "των", "από", "μια"],
    "he": ["של", "את", "על", "עם", "הוא", "זה", "לא", "גם"],
    "pl": ["nie", "się", "na", "do", "jest", "że", "od", "po"],
    "tr": ["bir", "ve", "bu", "için", "ile", "daha", "çok", "ama"],
    "id": ["yang", "dan", "di", "ke", "untuk", "dengan", "ini", "itu"],
    "vi": ["và", "của", "là", "không", "một", "người", "có", "được"],
    "ru": ["и", "в", "не", "на", "что", "с", "как", "это"],
    "ar": ["في", "من", "على", "أن", "إلى", "عن", "مع", "هذا"],
    "hi": ["के", "है", "में", "की", "और", "से", "का", "यह"],
    "zh": ["de", "le", "shi", "wo", "zai", "you", "he", "ren"],
}

# per-language "contains a letter" character classes for the Gopher
# alpha-ratio rule: good Russian/Arabic/Hindi prose contains no [a-zA-Z]
# at all, so the default class silently rejected every such document —
# the same cliff CJK segmentation hit, one script later.  Languages not
# listed use the default ASCII class (Latin-script languages all pass
# it: accented words still contain at least one ASCII letter).
LANG_LETTER_PATTERNS: dict[str, str] = {
    "ru": "[\\u0400-\\u04ff]",
    "ar": "[\\u0600-\\u06ff\\u0750-\\u077f]",
    "hi": "[\\u0900-\\u097f]",
    "el": "[\\u0370-\\u03ff\\u1f00-\\u1fff]",
    "he": "[\\u0590-\\u05ff]",
}

# per-language mean-word-length bounds for the Gopher word-length rule:
# Vietnamese is monosyllabic (và/của/có — mean ~3 chars), so the
# English-calibrated [3, 10] rejects good vi prose on length alone.
# Languages not listed keep the caller's/default bounds.
LANG_WORD_LEN_BOUNDS: dict[str, tuple[float, float]] = {
    "vi": (2.0, 10.0),
}

STOPWORDS = sorted({w for ws in LANG_PROFILES.values() for w in ws})


# ---------------------------------------------------------------------------
# Tokenizers
# ---------------------------------------------------------------------------

def tokenize_whitespace(
    documents: DataFrame,
    text_col: str = "text",
    doc_col: str = "doc_id",
) -> DataFrame:
    """Whitespace tokenizer with exact char offsets, fully JVM-side.

    Returns one row per token: ``(doc_id, token_idx, span, token)`` — the
    canonical tokens table (reference ``make_tokens``, ``io/spacy.py:75-90``).

    Algorithm: map tabs/newlines to spaces (offset-preserving), split on
    single spaces keeping empty segments, ``posexplode``, recover each
    segment's begin offset as the running sum of previous segment lengths + 1
    separator each, then drop empty segments and re-number surviving tokens.
    Exact for any run of whitespace.  The only wide operation is a window
    partitioned by ``doc_id`` — documents are the parallelism unit, so this
    scales with the corpus.
    """
    segs = documents.select(
        F.col(doc_col),
        F.posexplode(F.split(F.translate(F.col(text_col), "\t\n\r", "   "), " ")).alias(
            "__seg_idx", "token"
        ),
    )
    w = (
        Window.partitionBy(doc_col)
        .orderBy("__seg_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_idx = Window.partitionBy(doc_col).orderBy("__seg_idx")
    return (
        segs.withColumn(
            "__begin",
            F.coalesce(F.sum(F.length("token") + 1).over(w), F.lit(0)).cast("int"),
        )
        .filter(F.length("token") > 0)
        .withColumn("token_idx", (F.row_number().over(w_idx) - 1).cast("int"))
        .select(
            F.col(doc_col),
            "token_idx",
            make_span(F.col("__begin"), F.col("__begin") + F.length("token")).alias(
                "span"
            ),
            "token",
        )
    )


def tokenize_regex(
    documents: DataFrame,
    pattern: str = DEFAULT_TOKEN_PATTERN,
    text_col: str = "text",
    doc_col: str = "doc_id",
) -> DataFrame:
    """Regex tokenizer via Arrow-batched pandas UDF (``re.finditer`` offsets).

    Output schema matches :func:`tokenize_whitespace`.  The UDF returns
    ``array<struct<begin,end,token>>`` per document which is then
    ``posexplode``d — one Python call per Arrow batch of documents, never per
    token (reference eager loop: ``io/spacy.py:75-90``).
    """
    import re

    compiled_flags = 0

    @F.pandas_udf("array<struct<begin:int,end:int,token:string>>")
    def _tok(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        rex = re.compile(pattern, compiled_flags)
        for texts in it:
            yield texts.map(
                lambda t: [
                    (m.start(), m.end(), m.group(0)) for m in rex.finditer(t or "")
                ]
            )

    return documents.select(
        F.col(doc_col),
        F.posexplode(_tok(F.col(text_col))).alias("token_idx", "__m"),
    ).select(
        doc_col,
        F.col("token_idx").cast("int").alias("token_idx"),
        make_span(F.col("__m.begin"), F.col("__m.end")).alias("span"),
        F.col("__m.token").alias("token"),
    )


def add_neighbor_tokens(tokens: DataFrame, doc_col: str = "doc_id") -> DataFrame:
    """Add ``left``/``right`` neighbor token ids
    (reference ``io/spacy.py:144-151``) via lag/lead."""
    w = Window.partitionBy(doc_col).orderBy("token_idx")
    return tokens.withColumn("left", F.lag("token_idx").over(w)).withColumn(
        "right", F.lead("token_idx").over(w)
    )


# ---------------------------------------------------------------------------
# Text analysis (training-data pipeline surface)
# ---------------------------------------------------------------------------

def word_tokens(text: Column | str) -> Column:
    """Array of word tokens (lowercased), JVM-side."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.lower(F.trim(c)), r"\s+")


def token_count(text: Column | str, pattern: str = r"\w+|[^\w\s]") -> Column:
    """Token count under a BPE-ish regex, via ``regexp_extract_all`` —
    JVM-side, no UDF."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(pattern), F.lit(0)))


def quality_metrics(text: Column | str, toks: Column | None = None) -> Column:
    """Struct of document quality signals: char/token counts, mean token
    length, stopword ratio, punctuation ratio, digit ratio.

    Everything is built-in-function arithmetic — survives whole-stage codegen
    on a full-corpus scan.

    Pass ``toks`` (a materialized ``word_tokens`` column) when combining with
    other token-consuming expressions in one projection: higher-order-function
    arguments do not share subexpressions, so without it every filter lambda
    re-splits the text.
    """
    c = F.col(text) if isinstance(text, str) else text
    toks = word_tokens(c) if toks is None else toks
    n_tok = F.size(toks)
    n_char = F.length(c)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    # counts, not length-of-stripped-copy: same value, no per-row string
    # allocation (see script_ratios)
    n_punct = F.regexp_count(c, F.lit(r"[^\w\s]"))
    n_digit = F.regexp_count(c, F.lit(r"[0-9]"))
    return F.struct(
        n_char.cast("int").alias("n_chars"),
        n_tok.cast("int").alias("n_tokens"),
        F.round(n_char / F.greatest(n_tok, F.lit(1)), 4).alias("mean_token_len"),
        F.round(n_stop / F.greatest(n_tok, F.lit(1)), 4).alias("stopword_ratio"),
        F.round(n_punct / F.greatest(n_char, F.lit(1)), 4).alias("punct_ratio"),
        F.round(n_digit / F.greatest(n_char, F.lit(1)), 4).alias("digit_ratio"),
    )


# Gopher's required-word list (Rae et al. 2021, Appendix A1.1): a document
# must contain at least 2 of these to look like running English prose.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    text: Column | str,
    toks: Column | None = None,
    min_words: int = 50,
    max_words: int = 100_000,
    required_words: tuple[str, ...] = GOPHER_STOPWORDS,
    letter_pattern: str = "[a-zA-Z]",
) -> Column:
    """The Gopher quality-filter rule set (Rae et al. 2021, Appendix A1.1)
    as a struct of per-rule booleans plus the combined ``passes`` — the
    de-facto standard heuristic gate for web-scraped training text,
    complementing :func:`repetition_metrics` (which carries the Gopher
    repetition rules):

    * ``word_count_ok`` — between ``min_words`` and ``max_words`` words;
    * ``mean_word_len_ok`` — mean word length in [3, 10];
    * ``symbol_ratio_ok`` — (# + "...") to word ratio <= 0.1;
    * ``bullet_ok`` — <= 90% of lines start with a bullet;
    * ``ellipsis_ok`` — <= 30% of lines end with "...";
    * ``alpha_ratio_ok`` — >= 80% of words contain a letter;
    * ``stopword_ok`` — >= 2 distinct required words present.

    ``required_words`` defaults to Gopher's English list; swap in a
    corpus-appropriate list for other languages/domains (the rule is
    "looks like running prose of THIS corpus's language").
    ``letter_pattern`` is the alpha-rule's "contains a letter" class —
    override for non-Latin scripts (see :data:`LANG_LETTER_PATTERNS`),
    whose prose contains no ``[a-zA-Z]`` at all.

    Pure built-in arithmetic, row-local and stream-transparent; survives
    whole-stage codegen on a full-corpus scan.
    """
    c = F.col(text) if isinstance(text, str) else text
    toks = word_tokens(c) if toks is None else toks
    n_words = F.size(toks)
    safe_words = F.greatest(n_words, F.lit(1))
    mean_len = F.aggregate(
        toks, F.lit(0), lambda a, t: a + F.length(t)
    ) / safe_words
    n_hash = F.length(c) - F.length(F.replace(c, F.lit("#"), F.lit("")))
    # both ASCII "..." and U+2026 "…" — web text overwhelmingly uses the
    # latter, and counting only dots would leak spam past the gate
    n_ell = (
        F.length(c) - F.length(F.replace(c, F.lit("..."), F.lit("")))
    ) / 3 + (F.length(c) - F.length(F.replace(c, F.lit("…"), F.lit(""))))
    lines = F.split(c, "\n")
    n_lines = F.greatest(F.size(lines), F.lit(1))
    n_bullet = F.size(F.filter(lines, lambda l: l.rlike(r"^\s*[-*•] ")))
    n_ell_line = F.size(
        F.filter(lines, lambda l: l.rlike(r"(\.\.\.|…)\s*$"))
    )
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike(letter_pattern)))
    stop_arr = F.array(*[F.lit(w) for w in required_words])
    # membership is tested on punctuation-stripped tokens ("the." counts as
    # "the") — the Gopher rule is word-level, and whitespace tokenization
    # would otherwise under-count prose where required words precede
    # punctuation.  (?U): Java's default \W is ASCII-only, so without it
    # every non-Latin token strips to "" and non-English profiles can
    # never match their own marker words.
    clean_toks = F.transform(
        toks, lambda t: F.regexp_replace(t, r"(?U)^\W+|\W+$", "")
    )
    # array_intersect, not filter+array_contains: it hashes one side,
    # O(n_tok + n_words) instead of O(n_words * n_tok), and its
    # distinct-common-elements semantics IS the rule (>= 2 distinct
    # required words present)
    n_stop = F.size(F.array_intersect(stop_arr, clean_toks))
    rules = {
        "word_count_ok": (n_words >= min_words) & (n_words <= max_words),
        "mean_word_len_ok": (mean_len >= 3) & (mean_len <= 10),
        "symbol_ratio_ok": (n_hash + n_ell) / safe_words <= 0.1,
        "bullet_ok": n_bullet / n_lines <= 0.9,
        "ellipsis_ok": n_ell_line / n_lines <= 0.3,
        "alpha_ratio_ok": n_alpha / safe_words >= 0.8,
        "stopword_ok": n_stop >= 2,
    }
    passes = None
    for expr in rules.values():
        passes = expr if passes is None else (passes & expr)
    return F.struct(
        *[expr.alias(name) for name, expr in rules.items()],
        passes.alias("passes"),
    )


def lang_scores(text: Column | str, toks: Column | None = None) -> Column:
    """Per-language marker-word hit ratios as a struct — the language-ID
    heuristic's feature vector.

    Evaluation shape: ONE compiled-regex pass over the text extracts
    every marker-word occurrence (whole-token boundaries, so counts
    equal token-equality membership exactly), then the per-language
    filters run over that TINY hit array instead of the full token
    array.  The naive form — 14 higher-order ``filter``s over all
    tokens, each interpreted (HOFs don't enter codegen) — measured
    ~6× slower at 14 profiles on 80k documents."""
    c = F.col(text) if isinstance(text, str) else text
    toks = word_tokens(c) if toks is None else toks
    n_tok = F.greatest(F.size(toks), F.lit(1))

    # bind the hit array ONCE via a one-element transform lambda: the
    # 14 per-language filters below would otherwise each re-run the
    # full-text extraction (HOF arguments do not CSE).  NOTE for
    # consumers: extracting a SINGLE field from the returned struct
    # re-evaluates the whole binding — take the struct once (or use
    # :func:`lang_id`, which does its argmax inside the binding scope).
    def _scores_over(a):
        fields = []
        for lang, words in sorted(LANG_PROFILES.items()):
            marker = F.array(*[F.lit(w) for w in words])
            hits = F.size(
                F.filter(a, lambda t: F.array_contains(marker, t))
            )
            fields.append(F.round(hits / n_tok, 6).alias(lang))
        return F.struct(*fields)

    return F.element_at(
        F.transform(F.array(_marker_hits_arr(c)), _scores_over), 1
    )


def _marker_hits_arr(c: Column) -> Column:
    """Every marker-word occurrence in ``c`` as a (small) array — one
    compiled-regex pass with whole-token boundaries, so counting
    occurrences in the result equals token-equality membership over
    ``word_tokens``.  Shared by :func:`lang_scores` and
    :func:`lang_id`."""
    import re as _re

    all_words = sorted({w for ws in LANG_PROFILES.values() for w in ws})
    pat = (
        r"(^|\s)("
        + "|".join(_re.escape(w) for w in all_words)
        + r")(?=\s|$)"
    )
    return F.regexp_extract_all(F.lower(F.trim(c)), F.lit(pat), 2)


def script_ratios(text: Column | str) -> Column:
    """Per-script character ratios as a struct — ``kana`` (Hiragana +
    Katakana U+3040-30FF), ``hangul`` (U+AC00-D7AF), ``han`` (CJK
    unified + ext-A), ``cyrillic`` (U+0400-04FF), ``arabic``
    (U+0600-06FF + supplement), ``devanagari`` (U+0900-097F) over total
    length.  Pure ``regexp_replace`` length arithmetic, codegen,
    stream-safe.  The decisive signal for non-Latin language ID and
    gate routing: marker WORDS require whitespace tokenization (absent
    in CJK) and per-script letter classes (Cyrillic/Arabic/Devanagari
    prose contains no ``[a-zA-Z]``) — script ranges cover both."""
    c = F.col(text) if isinstance(text, str) else text
    n = F.greatest(F.length(c), F.lit(1))

    def ratio(rng: str) -> Column:
        # regexp_count, not length(regexp_replace(...)): the count of
        # single-char-class matches equals the length difference exactly,
        # but counting never materializes a stripped copy of the document —
        # at 10 script classes the replace form allocated ten full-text
        # strings per row (measured regex-extraction-dominated in the
        # lang-ID chain).
        return F.round(F.regexp_count(c, F.lit(f"[{rng}]")) / n, 6)

    return F.struct(
        ratio("\\u3040-\\u30ff").alias("kana"),
        ratio("\\uac00-\\ud7af").alias("hangul"),
        ratio("\\u3400-\\u4dbf\\u4e00-\\u9fff").alias("han"),
        ratio("\\u0400-\\u04ff").alias("cyrillic"),
        ratio("\\u0600-\\u06ff\\u0750-\\u077f").alias("arabic"),
        ratio("\\u0900-\\u097f").alias("devanagari"),
        ratio("\\u0e01-\\u0e5b").alias("thai"),
        ratio("\\u1780-\\u17dd").alias("khmer"),
        ratio("\\u0e81-\\u0edf").alias("lao"),
        ratio("\\u1000-\\u109f").alias("myanmar"),
    )


def lang_id(text: Column | str, toks: Column | None = None) -> Column:
    """Predicted language: CJK script detection first — any kana
    presence (≥ 5% of chars) is Japanese, hangul-dominant (≥ 30%) is
    Korean, han-dominant (≥ 30%) without kana is Chinese — because CJK
    text has no whitespace tokens for the marker-word path to see (it
    used to arrive as 'und', silently, on roughly half of a real
    crawl); Arabic-script- or Devanagari-dominant (≥ 30%) text routes
    to 'ar'/'hi' the same way (whitespace exists there, but short or
    marker-sparse text would otherwise fall to 'und'); then argmax
    marker-word ratio, ties broken by language code order; 'und' when
    nothing fires.  Cyrillic deliberately has NO script override: the
    script spans ru/uk/bg/sr, so only the ru marker words claim it —
    non-Russian Cyrillic stays 'und' rather than being mislabeled.

    The marker path is one ``array_max`` over fixed-width sortable
    STRINGS ``"%013.6f~%02d~%s" % (score, 99 - rank, lang)`` plus an
    ``"000000.000001~00~und"`` sentinel: lexicographic max IS the
    (score, earlier-language-wins) argmax, the sentinel beats every
    all-zero score so "nothing fired" decodes to 'und' with no second
    look at the scores, and ``substring_index(...)`` peels the
    language off the single winner.  This keeps every per-language
    score expression evaluated exactly ONCE in whole-stage codegen —
    a (score, rank, lang) struct form needed two field extractions of
    the ``array_max`` result, each re-evaluating the entire score
    array (measured 2× the operator's cost at 14 profiles), and a
    lambda rebinding fixed that only by dropping the array build out
    of codegen.  A chained ``when`` scan would be worse still (each
    score nested inside every later branch — exponential growth under
    projection collapse).  The script pre-check is regexp length
    counts — all JVM-side, no UDF anywhere.
    """
    c = F.col(text) if isinstance(text, str) else text
    scripts = script_ratios(c)
    toks = word_tokens(c) if toks is None else toks
    n_tok = F.greatest(F.size(toks), F.lit(1))

    # the whole marker argmax runs INSIDE the one-element transform
    # binding: one regex extraction, 14 small-array counts, one
    # array_max — extracting per-language fields from a bound
    # lang_scores struct would re-run the binding per field (measured
    # 14× on 80k docs)
    def _pred_over(a):
        entries = []
        for i, (lang, words) in enumerate(sorted(LANG_PROFILES.items())):
            marker = F.array(*[F.lit(w) for w in words])
            hits = F.size(
                F.filter(a, lambda t: F.array_contains(marker, t))
            )
            entries.append(
                F.format_string(
                    f"%013.6f~{99 - i:02d}~{lang}",
                    F.round(hits / n_tok, 6),
                )
            )
        return F.substring_index(
            F.array_max(
                F.array(F.lit("000000.000001~00~und"), *entries)
            ),
            "~",
            -1,
        )

    marker_pred = F.element_at(
        F.transform(F.array(_marker_hits_arr(c)), _pred_over), 1
    )
    return (
        F.when(scripts["kana"] >= 0.05, F.lit("ja"))
        .when(scripts["hangul"] >= 0.3, F.lit("ko"))
        .when(scripts["han"] >= 0.3, F.lit("zh"))
        .when(scripts["arabic"] >= 0.3, F.lit("ar"))
        .when(scripts["devanagari"] >= 0.3, F.lit("hi"))
        .when(scripts["thai"] >= 0.3, F.lit("th"))
        # rare unsegmented scripts: the rlike guard is one cheap scan
        # that short-circuits the ratio computation for the 99.9% of
        # documents carrying no such characters
        .when(
            c.rlike("[\\u1780-\\u17dd]")
            & (scripts["khmer"] >= 0.3),
            F.lit("km"),
        )
        .when(
            c.rlike("[\\u0e81-\\u0edf]") & (scripts["lao"] >= 0.3),
            F.lit("lo"),
        )
        .when(
            c.rlike("[\\u1000-\\u109f]")
            & (scripts["myanmar"] >= 0.3),
            F.lit("my"),
        )
        .otherwise(marker_pred)
    )


def char_shingles(text: Column | str, k: int = 5) -> Column:
    """Array of character k-gram shingles (JVM-side ``transform`` over an
    offset ``sequence``).  Empty array for texts shorter than ``k``."""
    c = F.col(text) if isinstance(text, str) else text
    n = F.length(c)
    return F.when(n < k, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.substring(c, i + 1, k),
        )
    )


def word_shingles(text: Column | str, n: int = 3) -> Column:
    """Array of word n-gram shingles (space-joined), for MinHash / Jaccard."""
    toks = word_tokens(text)
    cnt = F.size(toks)
    return F.when(cnt < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), cnt - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
    )


def word_shingle_rows(
    documents: "DataFrame",
    n: int = 3,
    text_col: str = "text",
    doc_col: str = "doc_id",
    out_col: str = "shingle",
) -> "DataFrame":
    """Exploded word ``n``-gram shingles: one ``(doc, shingle)`` row per
    position — identical output to ``explode(word_shingles(...))``.

    Exists because the array form pays the higher-order-function tax twice:
    ``transform`` builds every shingle interpreted (HOFs don't participate
    in whole-stage codegen) and then explode throws the array away.  Here
    positions are exploded first and each shingle is a flat
    ``concat_ws(slice(...))`` projection inside codegen — measured ~25%
    faster at sf0.1.  Use this form whenever shingles feed a relational
    pipeline; keep :func:`word_shingles` for per-row array semantics
    (stream-safe rowwise variants, ``exists`` probes).
    """
    toks = documents.select(
        F.col(doc_col), word_tokens(F.col(text_col)).alias("__t")
    )
    positions = F.when(
        F.size("__t") >= n, F.sequence(F.lit(0), F.size("__t") - n)
    ).otherwise(F.array().cast("array<int>"))
    return toks.select(
        doc_col, F.explode(positions).alias("__i"), F.col("__t")
    ).select(
        doc_col,
        F.concat_ws(" ", F.slice("__t", F.col("__i") + 1, F.lit(n))).alias(out_col),
    )


def fingerprint(text: Column | str, k: int = 8, window: int = 4) -> Column:
    """Winnowing document fingerprint (Schleimer et al., SIGMOD'03): hash all
    char k-grams (md5 — deterministic across engines), then keep the minimum
    hash of every ``window`` consecutive k-grams, deduplicated.

    Returns ``array<string>`` of selected hashes.

    CAUTION: as a single column expression the inner hash array is re-inlined
    into every window slice by projection collapse — O(n·w) md5 evaluations
    per document.  For corpus-scale winnowing use
    :func:`fingerprint_rows`, which computes each hash once and takes window
    minima with an ordered window frame.
    """
    hashes = F.transform(char_shingles(text, k), F.md5)
    n_h = F.size(hashes)
    return F.when(n_h <= 0, F.array().cast("array<string>")).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.greatest(n_h - window, F.lit(0))),
                lambda j: F.array_min(F.slice(hashes, j + 1, window)),
            )
        )
    )


def fingerprint_rows(
    documents: "DataFrame",
    k: int = 8,
    window: int = 4,
    text_col: str = "text",
    doc_col: str = "doc_id",
) -> "DataFrame":
    """Corpus-scale winnowing fingerprints: one row per selected fingerprint
    ``(doc_id, fp)``.

    Plan shape: explode k-gram *positions* to rows (narrow), then substring
    + md5 as flat projections — inside whole-stage codegen, unlike a
    ``transform(…, md5)`` higher-order call which evaluates interpreted
    per element (measured ~30% slower end-to-end; a FULLY row-local variant
    that also takes window minima via ``transform(…, array_min(slice))`` is
    catastrophically slower — O(n·w) interpreted comparisons did not finish
    one sf0.1 pass in 6 minutes vs ~3s for this plan, so trading one
    shuffle for codegen hashing is decisively right).  ``min(hash)`` over a
    per-doc ordered window of ``window`` rows, then dedup.  Every md5 is
    computed exactly once; the only wide op is the per-doc sort window —
    this is the form that survives 100 TB.
    """
    from pyspark.sql import Window

    positions = F.when(
        F.length(text_col) >= k, F.sequence(F.lit(0), F.length(text_col) - k)
    ).otherwise(F.array().cast("array<int>"))
    # 16-hex-char (64-bit) md5 prefix: same deterministic minima selection in
    # both engines (each takes the min of the same truncated multiset), half
    # the bytes through the per-doc sort window — the widest op in the plan.
    hashed = documents.select(
        F.col(doc_col),
        F.explode(positions).alias("__i"),
        F.col(text_col).alias("__t"),
    ).select(
        doc_col,
        "__i",
        F.substring(
            F.md5(F.substring(F.col("__t"), F.col("__i") + 1, F.lit(k))), 1, 16
        ).alias("__h"),
    )
    n = documents.select(
        F.col(doc_col),
        (F.greatest(F.length(text_col) - k + 1, F.lit(0))).alias("__n_h"),
    )
    w = (
        Window.partitionBy(doc_col)
        .orderBy("__i")
        .rowsBetween(Window.currentRow, window - 1)
    )
    return (
        hashed.withColumn("__wmin", F.min("__h").over(w))
        .join(n, doc_col)
        .filter(F.col("__i") <= F.greatest(F.col("__n_h") - window, F.lit(0)))
        .select(F.col(doc_col), F.col("__wmin").alias("fp"))
        .distinct()
    )


# PII patterns restricted to constructs with identical semantics in Java
# regex (Spark) and RE2 (DuckDB oracle): character classes, bounded
# repetition, word boundaries — no lookarounds, no backreferences.
# Redaction applies them in this dict's insertion order.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+\d{1,3}-\d{3}-\d{4}",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def pii_counts(text: Column | str) -> Column:
    """Struct of per-category PII match counts (``n_email``, ``n_phone``,
    ``n_ssn``, ``n_ipv4``) — `regexp_extract_all` + `size`, JVM-side.

    Training pipelines count before they scrub: the counts drive both the
    drop-vs-redact policy decision and the compliance audit trail."""
    c = F.col(text) if isinstance(text, str) else text
    return F.struct(
        *[
            F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0))).alias(
                f"n_{name}"
            )
            for name, pat in PII_PATTERNS.items()
        ]
    )


def redact_pii(text: Column | str) -> Column:
    """Replace every PII match with its ``[CATEGORY]`` tag (chained
    ``regexp_replace`` in :data:`PII_PATTERNS` order — email before phone
    before SSN before IP, so overlapping digit runs resolve
    deterministically).  Pure row-local expression: usable in batch scans
    and ``readStream`` pipelines alike, no shuffle, no UDF."""
    c = F.col(text) if isinstance(text, str) else text
    for name, pat in PII_PATTERNS.items():
        c = F.regexp_replace(c, pat, f"[{name.upper()}]")
    return c


# classic UTF-8-decoded-as-Latin-1 artifacts: A-tilde (U+00C3) + accented
# letter (e-acute mangles to U+00C3 U+00A9), a-circumflex + euro digraphs
# (right-quote mangles to U+00E2 U+20AC U+2122), stray U+00C2 + space/NBSP
_MOJIBAKE_PATTERN = (
    "\u00c3[\u00a9\u00a8\u00a2\u00ab\u00bb\u00b1\u00ae\u00a4\u00a7]"
    "|\u00e2\u20ac[\u2122\u0153\u009d\u0098\u00a6\u201c\u2013\u2014-]"
    "|\u00c2[ \u00a0]"
)
_CONTROL_PATTERN = "[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"


def encoding_metrics(text: Column | str) -> Column:
    """Encoding-corruption signals per document, as a struct of
    ``n_replacement`` (U+FFFD chars left by lossy decodes), ``n_control``
    (control chars other than tab/newline/CR — binary junk in "text"),
    ``n_mojibake`` (classic UTF-8-read-as-Latin-1 digraphs like ``Ã©`` /
    ``â€™``), and ``nonascii_ratio``.

    Web-scale corpora arrive through many decode paths; docs that were
    decoded with the wrong codec score fine on length/stopword metrics but
    poison tokenizers.  Pure row-local ``regexp_count`` expressions — no
    UDF, stream-safe, composes with :func:`quality_metrics` in one scan.
    """
    c = F.col(text) if isinstance(text, str) else text
    n_char = F.length(c)
    # count non-ASCII codepoints directly — same value as stripping all
    # ASCII and measuring, without allocating the stripped copy
    n_nonascii = F.regexp_count(c, F.lit("[^\\x00-\\x7f]"))
    return F.struct(
        F.size(F.regexp_extract_all(c, F.lit("�"), F.lit(0)))
        .cast("int")
        .alias("n_replacement"),
        F.size(F.regexp_extract_all(c, F.lit(_CONTROL_PATTERN), F.lit(0)))
        .cast("int")
        .alias("n_control"),
        F.size(F.regexp_extract_all(c, F.lit(_MOJIBAKE_PATTERN), F.lit(0)))
        .cast("int")
        .alias("n_mojibake"),
        F.round(n_nonascii / F.greatest(n_char, F.lit(1)), 6).alias(
            "nonascii_ratio"
        ),
    )


def _fix_text_py(s: str, form: str | None) -> str:
    """Driver-side reference implementation of :func:`fix_text` (the UDF
    maps this).  Mojibake repair is the ftfy core heuristic reduced to
    its safe kernel: when the classic UTF-8-read-as-Latin-1 digraphs are
    present, re-encode through cp1252 (C1 gaps falling back to latin-1 —
    "sloppy cp1252") and strictly re-decode as UTF-8; accept only if the
    strict decode succeeds AND the text got shorter (a real repair
    always folds a multi-char digraph into one char, so acceptance is
    loss-free).  Repair and control-strip alternate to a FIXPOINT: a
    stray C1 char can block the strict re-decode of otherwise-repairable
    mojibake (``'Ã§\\x9c'``), so after repair stalls we strip controls
    and retry — otherwise the function isn't idempotent (stripping the
    blocker leaves mojibake the NEXT call would fix).  Every productive
    iteration strictly shortens the string, so the loop terminates in at
    most ``len(s)`` rounds (in practice ≤ mojibake depth + 2)."""
    import re
    import unicodedata

    moji = _FIX_MOJIBAKE_RE or re.compile(_FIX_DETECT_PATTERN)
    ctrl = _FIX_CONTROL_RE or re.compile(_FIX_CONTROL_PATTERN)
    for _ in range(len(s) + 1):
        prev = s
        if moji.search(s):
            try:
                cand = s.encode("cp1252", errors="tep_c1_fallback").decode(
                    "utf-8"
                )
                if len(cand) < len(s):
                    s = cand
                    continue  # deeper encoding layers may remain
            except (UnicodeEncodeError, UnicodeDecodeError, LookupError):
                pass  # repair stalled: strip may unblock it
        s = ctrl.sub("", s)
        if s == prev:
            break
    if form:
        s = unicodedata.normalize(form, s)
    return s


def _register_c1_fallback() -> None:
    """cp1252 leaves five C1 bytes unmapped (0x81 0x8D 0x8F 0x90 0x9D);
    mojibake text carries the matching C1 *chars* (e.g. U+009D from a
    mangled right double quote), so encode those through latin-1 —
    exactly ftfy's sloppy-windows-1252."""
    import codecs

    def handler(err):
        ch = err.object[err.start : err.end]
        try:
            return (ch.encode("latin-1"), err.end)
        except UnicodeEncodeError:
            raise err

    try:
        codecs.lookup_error("tep_c1_fallback")
    except LookupError:
        codecs.register_error("tep_c1_fallback", handler)


# repair-trigger pattern: the shared detection digraphs PLUS "Ã" followed
# by a C1 control char — the signature of DOUBLE-encoded mojibake (é →
# "Ã©" → re-encode → "Ã\\x83Â©"), which the counting pattern deliberately
# leaves out (encoding_metrics' gated counts must not change) but the
# strict-round-trip repair handles safely
_FIX_DETECT_PATTERN = _MOJIBAKE_PATTERN + "|\u00c3[\u0080-\u009f]"

# repair-side control strip: C0 + DEL (like the counting pattern) PLUS
# the C1 range U+0080-U+009F \u2014 C1 chars are exactly the residue partial
# mojibake leaves behind.  Kept separate from _CONTROL_PATTERN so
# encoding_metrics' gated n_control counts don't change.
_FIX_CONTROL_PATTERN = "[\x00-\x08\x0b\x0c\x0e-\x1f\x7f\u0080-\u009f]"

_FIX_MOJIBAKE_RE = None
_FIX_CONTROL_RE = None
_register_c1_fallback()


def fix_text(text: Column | str, form: str | None = "NFC") -> Column:
    """Repair encoding damage in a text column: undo classic
    UTF-8-read-as-Latin-1 mojibake (``Ã©`` → ``é``, ``â€™`` → ``’``,
    double-encoded variants fold across passes), strip C0/C1 control
    characters (tab/newline/CR kept), and optionally unicode-normalize
    (``form="NFC"`` default; ``"NFKC"`` for tokenizer-canonical text;
    ``None`` to skip).  Repair is STRICT-round-trip gated — a candidate
    is accepted only when the cp1252→UTF-8 re-decode succeeds cleanly
    and shortens the text — so clean documents pass through untouched
    and no repair can lose data.  NULL in → NULL out.

    The detection twin is :func:`encoding_metrics` (count before,
    repair with this, count after).  Arrow-batched pandas UDF (codec
    round-trips need Python); the regex pre-check makes the common
    clean-document case one scan + no re-encode."""
    global _FIX_MOJIBAKE_RE, _FIX_CONTROL_RE
    import re

    if _FIX_MOJIBAKE_RE is None:
        # the DETECT pattern (counting digraphs + the double-encoding
        # arm), NOT the narrower counting pattern — caching the narrow
        # one here made driver-side _fix_text_py stop detecting
        # double-encoded mojibake after the first fix_text() call
        _FIX_MOJIBAKE_RE = re.compile(_FIX_DETECT_PATTERN)
        _FIX_CONTROL_RE = re.compile(_FIX_CONTROL_PATTERN)

    @F.pandas_udf("string")
    def _fix(s: pd.Series) -> pd.Series:
        _register_c1_fallback()  # executors are fresh interpreters
        return s.map(
            lambda t: _fix_text_py(t, form) if t is not None else None
        )

    c = F.col(text) if isinstance(text, str) else text
    return _fix(c)


# sentence-start characters beyond [A-Z0-9]: CJK scripts have no
# capitalization, so any Han/kana/Hangul (or full-width Latin) char can
# open a sentence — Hiragana+Katakana U+3040-30FF, CJK ext-A
# U+3400-4DBF, CJK unified U+4E00-9FFF, Hangul U+AC00-D7AF, full-width
# A-Z/a-z
_CJK_START_CLASS = (
    "\u3040-\u30ff\u3400-\u4dbf\u4e00-\u9fff\uac00-\ud7af"
    "\uff21-\uff3a\uff41-\uff5a"
)
# full-width closing quotes/brackets that belong to the LEFT sentence
_FW_CLOSE_CLASS = "\u300d\u300f\uff09\u3011\u2019\u201d"
# full-width opening quotes/brackets a new sentence may start behind
_FW_OPEN_CLASS = "\u300c\u300e\uff08\u3010\u2018\u201c"

# sentence boundary, three arms:
#  1. Latin: .!? run, optional closers, REQUIRED whitespace, then a
#     capital/digit (or CJK) start — capitalization is the signal
#  2. full-width 。！？: boundary at the terminator (CJK needs no
#     inter-sentence space and no capital); optional full-width
#     closers and whitespace (incl. U+3000), never inside a terminator
#     run ("！！" stays one sentence end)
#  3. ellipsis …: used mid-sentence in English, so it ends a sentence
#     only before an explicit new start (capital/digit/CJK, optionally
#     quote-opened)
_SENT_BOUNDARY_PATTERN = (
    r'(?<=[.!?])(["\')\]]*)[ \t\n\r\u3000]+'
    r'(?=["\'(\[]*[A-Z0-9' + _CJK_START_CLASS + r"])"
    r"|(?<=[。！？])([" + _FW_CLOSE_CLASS + r"]*)"
    r"[ \t\n\r\u3000]*"
    r"(?=[^\s。！？…])"
    r"|(?<=…)([" + _FW_CLOSE_CLASS + r"]*)[ \t\n\r\u3000]*"
    r'(?=["\'(\[' + _FW_OPEN_CLASS + r"]*"
    r"[A-Z0-9" + _CJK_START_CLASS + r"])"
)
# the word immediately before a lone '.' terminator (dots kept so
# "e.g." matches as 'e.g' -> 'eg')
_ABBR_TOKEN_PATTERN = r"([A-Za-z]+(?:\.[A-Za-z]+)*)\.$"

# common English abbreviations whose trailing period is not a sentence
# end; pass your own set for other domains
DEFAULT_ABBREVIATIONS = frozenset(
    {
        "mr", "mrs", "ms", "dr", "prof", "sr", "jr", "st", "vs", "etc",
        "fig", "no", "inc", "ltd", "co", "eg", "ie", "al", "approx",
        "dept", "est", "min", "max",
    }
)


def _split_sentences_py(
    t: str, abbrevs: frozenset[str]
) -> list[tuple[int, int, str]]:
    """Driver-side reference implementation of :func:`split_sentences`
    (the UDF maps this).  Deterministic heuristic: boundary = ``.!?``
    run (+ optional closing quotes) + whitespace + capital/digit/CJK
    start, OR a full-width ``。！？`` terminator (no capitalization and
    no inter-sentence whitespace required — CJK), OR ``…`` before an
    explicit new start; EXCEPT when the preceding word is a known
    abbreviation and the terminator is a lone period.  Offsets are
    exact into the SOURCE string; inter-sentence whitespace belongs to
    no sentence."""
    import re

    boundary = re.compile(_SENT_BOUNDARY_PATTERN)
    abbr_token = re.compile(_ABBR_TOKEN_PATTERN)
    out: list[tuple[int, int, str]] = []

    def emit(b: int, e: int) -> None:
        seg = t[b:e]
        lead = len(seg) - len(seg.lstrip())
        if b + lead < e:
            out.append((b + lead, e, t[b + lead : e]))

    start = 0
    for m in boundary.finditer(t):
        # exactly one alternation arm participates; its closers group
        # marks the end of the left sentence
        end = max(m.end(g) for g in (1, 2, 3) if m.start(g) != -1)
        core = t[start:end].rstrip("\"')]")
        if core.endswith(".") and not core.endswith(".."):
            wm = abbr_token.search(core)
            if wm and wm.group(1).replace(".", "").lower() in abbrevs:
                continue  # abbreviation period: not a boundary
        emit(start, end)
        start = m.end()
    tail = t[start:].rstrip()
    if tail:
        emit(start, start + len(tail))
    return out


def split_sentences(
    documents: DataFrame,
    text_col: str = "text",
    doc_col: str = "doc_id",
    abbreviations: frozenset[str] | None = None,
) -> DataFrame:
    """Sentence segmentation with exact char offsets: one row per
    sentence — ``(doc_col, sentence_idx, begin, end, sentence)`` —
    the unit RAG chunkers, context packers, and per-sentence quality
    filters consume (compose with
    :func:`~..operators.windows.chunk_documents`-style packing for
    fixed-budget chunks that never split mid-sentence).

    Heuristic, deterministic, language-light: a ``.!?`` run (plus
    closing quotes/brackets) followed by whitespace and a
    capital-or-digit-or-CJK start ends a sentence, EXCEPT after a known
    abbreviation (``Dr. Smith`` stays one sentence —
    ``DEFAULT_ABBREVIATIONS``; pass your own set per domain).
    Full-width terminators ``。！？`` end a sentence at the terminator
    itself — CJK text has no capitalization and no inter-sentence
    space, so a Chinese/Japanese paragraph splits at every ``。``
    instead of arriving as one whole-document "sentence" (full-width
    closing quotes/brackets stay with the left sentence; terminator
    runs like ``！！`` don't split internally).  ``…`` ends a sentence
    only before an explicit new start, so English mid-sentence
    ellipses don't split.  Text with no terminator is one sentence;
    inter-sentence whitespace belongs to no sentence, so
    ``substring(text, begin+1, end-begin)`` == ``sentence`` exactly
    (the tokenizer offset invariant).

    Same scale shape as :func:`tokenize_regex`: one Arrow-batched
    pandas UDF call per document batch returning
    ``array<struct>``, then ``posexplode`` — no shuffle, documents are
    the parallelism unit, stream-transparent."""
    abbrevs = (
        DEFAULT_ABBREVIATIONS if abbreviations is None else frozenset(
            a.lower() for a in abbreviations
        )
    )

    @F.pandas_udf("array<struct<begin:int,end:int,sentence:string>>")
    def _sents(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for texts in it:
            yield texts.map(
                lambda t: _split_sentences_py(t, abbrevs)
                if t is not None
                else []
            )

    return documents.select(
        F.col(doc_col),
        F.posexplode(_sents(F.col(text_col))).alias("sentence_idx", "__s"),
    ).select(
        doc_col,
        F.col("sentence_idx").cast("int").alias("sentence_idx"),
        F.col("__s.begin").alias("begin"),
        F.col("__s.end").alias("end"),
        F.col("__s.sentence").alias("sentence"),
    )


def _chunk_by_sentences_py(
    t: str,
    max_chars: int,
    abbrevs: frozenset[str],
    max_tokens: int | None = None,
    token_pattern: str = DEFAULT_TOKEN_PATTERN,
) -> list[tuple[int, int, int]]:
    """Greedy sentence packing (driver-side reference): consecutive
    sentences join into a chunk while the SPAN (first sentence begin …
    last sentence end, inter-sentence gaps included) stays within
    ``max_chars`` AND, when ``max_tokens`` is set, the summed
    per-sentence token count stays within it; a single over-long
    sentence becomes its own chunk rather than being split."""
    import re

    sents = _split_sentences_py(t, abbrevs)
    tok = re.compile(token_pattern) if max_tokens is not None else None
    chunks: list[tuple[int, int, int]] = []
    cb = ce = n = toks = 0
    for b, e, seg in sents:
        seg_toks = len(tok.findall(seg)) if tok else 0
        fits = e - cb <= max_chars and (
            max_tokens is None or toks + seg_toks <= max_tokens
        )
        if n and fits:
            ce, n, toks = e, n + 1, toks + seg_toks
        else:
            if n:
                chunks.append((cb, ce, n))
            cb, ce, n, toks = b, e, 1, seg_toks
    if n:
        chunks.append((cb, ce, n))
    return chunks


def chunk_by_sentences(
    documents: DataFrame,
    max_chars: int = 2000,
    text_col: str = "text",
    doc_col: str = "doc_id",
    abbreviations: frozenset[str] | None = None,
    max_tokens: int | None = None,
    token_pattern: str = DEFAULT_TOKEN_PATTERN,
) -> DataFrame:
    """Sentence-aware chunking: pack consecutive sentences greedily into
    chunks whose char span stays within ``max_chars`` — the RAG/context
    chunker that NEVER splits mid-sentence (pair with
    :func:`~..operators.windows.chunk_document_spans` when a hard token
    budget matters more than sentence integrity).  A single over-long
    sentence becomes its own (oversized) chunk rather than being cut.

    Output: ``(doc_col, chunk_idx, begin, end, n_sentences, chunk)``
    with ``substring(text, begin+1, end-begin) == chunk`` exactly.

    ``max_tokens`` adds a second budget: the summed per-sentence token
    count (under ``token_pattern``, the BPE-ish default of
    :func:`token_count`) must also fit — set ``max_chars`` loose and
    ``max_tokens`` to the model's context slice for token-budgeted RAG
    chunks that still never split a sentence.

    Scale shape: sentence split AND greedy pack run inside ONE
    Arrow-batched UDF pass per document batch — no tokens table, no
    groupBy, no shuffle; documents are the parallelism unit and a
    document's sentence list fits an executor by the same assumption
    that makes it usable training data."""
    if max_chars < 1:
        raise ValueError(f"max_chars must be >= 1, got {max_chars}")
    abbrevs = (
        DEFAULT_ABBREVIATIONS if abbreviations is None else frozenset(
            a.lower() for a in abbreviations
        )
    )

    if max_tokens is not None and max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")

    @F.pandas_udf("array<struct<begin:int,end:int,n_sentences:int>>")
    def _chunks(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for texts in it:
            yield texts.map(
                lambda t: _chunk_by_sentences_py(
                    t, max_chars, abbrevs, max_tokens, token_pattern
                )
                if t is not None
                else []
            )

    return documents.select(
        F.col(doc_col),
        F.col(text_col).alias("__t"),
        F.posexplode(_chunks(F.col(text_col))).alias("chunk_idx", "__c"),
    ).select(
        doc_col,
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.col("__c.begin").alias("begin"),
        F.col("__c.end").alias("end"),
        F.col("__c.n_sentences").alias("n_sentences"),
        F.expr("substring(__t, __c.begin + 1, __c.end - __c.begin)").alias(
            "chunk"
        ),
    )


def dehyphenate(text: Column | str) -> Column:
    """Rejoin words hyphenated across line breaks — the standard cleanup
    for PDF-extracted / OCR / hard-wrapped text, where justified layout
    splits words as ``exam-\\n ple``.  A letter + ``-`` + newline (plus
    any surrounding spaces) + lowercase letter fuses to one word; the
    join requires a LOWERCASE continuation so sentence-initial capitals
    after a genuinely hyphen-terminated line (rare, but real in
    bibliographies) don't fuse.  Unconditional about compound words
    (``well-\\nknown`` → ``wellknown``) — the same trade C4's cleanup
    makes; hyphens not at a line break are untouched.

    Pure JVM ``regexp_replace`` — codegen, stream-safe, no UDF; compose
    before :func:`quality_metrics`/tokenization so token stats see whole
    words."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_replace(
        c, r"(\p{L})- *\n *(\p{Ll})", r"$1$2"
    )


def line_repetition_metrics(
    documents: "DataFrame",
    sep_regex: str = r"\n+",
    text_col: str = "text",
    doc_col: str = "doc_id",
) -> "DataFrame":
    """Gopher/FineWeb duplicate-LINE signals per document (Rae et al. 2021
    §A1.1 "fraction of lines duplicated"; FineWeb carries the same pair as
    ``dup_line_frac`` / ``dup_line_char_frac``): with lines split on
    ``sep_regex`` (empties dropped),

    * ``n_lines`` — surviving line count;
    * ``dup_line_frac`` — fraction of line OCCURRENCES whose line occurs
      more than once in the document;
    * ``dup_line_char_frac`` — same fraction weighted by line length
      (the signal Gopher actually gates on: a doc whose bulk is one
      repeated paragraph);
    * ``top_line_frac`` — occurrence share of the single most frequent
      line.

    Complements :func:`repetition_metrics` (word n-gram level) one
    granularity up.  Plan: one narrow explode + two aggregations both
    keyed by ``doc_id`` (the second reuses the first's partitioning) —
    one shuffle of (doc, line) rows at corpus scale, same shape as the
    n-gram metrics.  Documents with no surviving line produce no row.
    """
    lines = documents.select(
        F.col(doc_col),
        F.explode(
            F.filter(
                F.split(F.col(text_col), sep_regex),
                lambda s: F.length(s) > 0,
            )
        ).alias("__line"),
    )
    counts = lines.groupBy(doc_col, "__line").agg(
        F.count("*").alias("__c"),
        (F.count("*") * F.length("__line")).alias("__chars"),
    )
    dup = F.col("__c") > 1
    return counts.groupBy(doc_col).agg(
        F.sum("__c").cast("long").alias("n_lines"),
        F.round(
            F.sum(F.when(dup, F.col("__c")).otherwise(0)) / F.sum("__c"), 6
        ).alias("dup_line_frac"),
        F.round(
            F.sum(F.when(dup, F.col("__chars")).otherwise(0))
            / F.sum("__chars"),
            6,
        ).alias("dup_line_char_frac"),
        F.round(F.max("__c") / F.sum("__c"), 6).alias("top_line_frac"),
    )


def repetition_metrics(
    documents: "DataFrame",
    n: int = 2,
    text_col: str = "text",
    doc_col: str = "doc_id",
) -> "DataFrame":
    """Gopher-style repetition quality signals per document (Rae et al. 2021
    §A1.1 use duplicate-n-gram fractions to drop boilerplate/spam): for word
    ``n``-grams, the fraction held by the single most frequent n-gram
    (``top_ngram_frac``) and the fraction occurring more than once
    (``dup_ngram_frac``).

    One narrow explode + two map-side-combined aggregations, both keyed on
    ``doc_id`` — the second reuses the first's partitioning, so the whole
    metric costs one shuffle of (doc, ngram) rows at 100 TB.
    Documents with fewer than ``n`` words produce no row (no n-grams exist).
    """
    ng = word_shingle_rows(documents, n, text_col, doc_col, out_col="__ng")
    counts = ng.groupBy(doc_col, "__ng").agg(F.count("*").alias("__c"))
    return counts.groupBy(doc_col).agg(
        F.sum("__c").alias("n_ngrams"),
        F.round(F.max("__c") / F.sum("__c"), 6).alias("top_ngram_frac"),
        F.round(
            F.sum(F.when(F.col("__c") > 1, F.col("__c")).otherwise(0))
            / F.sum("__c"),
            6,
        ).alias("dup_ngram_frac"),
    )


_CJK_CHAR_CLASS = "぀-ヿ㐀-䶿一-鿿가-힯"
# full-width sentence punctuation + enumeration/quote marks CJK prose
# actually carries; absence over hundreds of chars marks tables/SEO spam
_CJK_PUNCT_CLASS = (
    "。，、！？；："
    "「」『』（）…—"
)


def cjk_quality_rules(
    text: Column | str,
    min_chars: int = 50,
    max_chars: int = 100_000,
) -> Column:
    """Char-based quality gate for CJK text — the counterpart of the
    word-based :func:`gopher_rules`, whose word_count / mean_word_len /
    alpha_ratio / stopword rules all silently malfunction on
    unsegmented Han/kana/Hangul prose (every "word" is a whole line,
    mean word length is enormous, no ``[a-zA-Z]``, no English
    stopwords).  Struct of per-rule booleans plus combined ``passes``:

    * ``char_count_ok`` — CJK char count in [min_chars, max_chars]
      (chars are the token unit; 50 Han chars ≈ the information of
      Gopher's 50 words);
    * ``cjk_ratio_ok`` — ≥ 30% of non-space chars are CJK (the gate is
      for documents that ARE CJK; route others to gopher_rules, or use
      :func:`quality_gate_by_script` which dispatches);
    * ``distinct_ratio_ok`` — ≥ 10% of CJK chars are distinct
      (repetition spam — "啊啊啊…" floods — collapses this; normal
      prose over a few hundred chars sits far above);
    * ``punct_ok`` — ≥ 1 CJK punctuation mark per 200 CJK chars
      (running prose carries 。，、; keyword-stuffing and table dumps
      carry none);
    * ``symbol_ok`` — (# + ellipsis) per CJK char ≤ 5%;
    * ``bullet_ok`` / ``ellipsis_ok`` — the Gopher line rules,
      script-independent, unchanged thresholds.

    Thresholds are documented heuristics (WuDao/WanJuan-style cleanup
    defaults), tunable per corpus.  Pure built-in arithmetic, row-local
    and stream-transparent, codegen throughout.
    """
    c = F.col(text) if isinstance(text, str) else text
    compact = F.regexp_replace(c, r"\s", "")
    n_all = F.greatest(F.length(compact), F.lit(1))
    cjk = F.regexp_replace(compact, f"[^{_CJK_CHAR_CLASS}]", "")
    n_cjk = F.length(cjk)
    safe_cjk = F.greatest(n_cjk, F.lit(1))
    n_distinct = F.size(F.array_distinct(F.split(cjk, "")))
    punct = F.regexp_replace(compact, f"[^{_CJK_PUNCT_CLASS}]", "")
    n_punct = F.length(punct)
    n_hash = F.length(c) - F.length(F.replace(c, F.lit("#"), F.lit("")))
    n_ell = (
        F.length(c) - F.length(F.replace(c, F.lit("..."), F.lit("")))
    ) / 3 + (F.length(c) - F.length(F.replace(c, F.lit("…"), F.lit(""))))
    lines = F.split(c, "\n")
    n_lines = F.greatest(F.size(lines), F.lit(1))
    n_bullet = F.size(F.filter(lines, lambda l: l.rlike(r"^\s*[-*•] ")))
    n_ell_line = F.size(
        F.filter(lines, lambda l: l.rlike(r"(\.\.\.|…)\s*$"))
    )
    rules = {
        "char_count_ok": (n_cjk >= min_chars) & (n_cjk <= max_chars),
        "cjk_ratio_ok": n_cjk / n_all >= 0.3,
        "distinct_ratio_ok": n_distinct / safe_cjk >= 0.1,
        "punct_ok": n_punct / safe_cjk >= 0.005,
        "symbol_ok": (n_hash + n_ell) / safe_cjk <= 0.05,
        "bullet_ok": n_bullet / n_lines <= 0.9,
        "ellipsis_ok": n_ell_line / n_lines <= 0.3,
    }
    passes = None
    for expr in rules.values():
        passes = expr if passes is None else (passes & expr)
    return F.struct(
        *[expr.alias(name) for name, expr in rules.items()],
        passes.alias("passes"),
    )


# Unsegmented scripts beyond CJK: no spaces between words, so every
# word-based Gopher rule malfunctions — but they are NOT in the CJK
# ranges either, so the CJK gate's ratio rule rejects them too.  Each
# entry: (script_ratios field, char class, distinct-char cap).  The
# cap exists because these alphabets have ~60-80 usable characters, so
# a CJK-style ``distinct/chars >= 0.1`` rule mathematically fails
# every document beyond ~700 chars regardless of quality; Han's
# thousands of distinct chars never hit this.
_THAI_CHAR_CLASS = "\\u0e01-\\u0e5b"
UNSEGMENTED_SCRIPTS: dict[str, tuple[str, str, float]] = {
    # lang code -> (script_ratios field, char class, distinct cap)
    "th": ("thai", _THAI_CHAR_CLASS, 40.0),
    "km": ("khmer", "\\u1780-\\u17dd", 40.0),
    "lo": ("lao", "\\u0e81-\\u0edf", 35.0),
    # Burmese prose concentrates on a smaller per-paragraph repertoire
    # (~30-40 distinct of the block's ~80): cap 30, measured on real
    # paragraph-shaped prose carrying 35 distinct chars
    "my": ("myanmar", "\\u1000-\\u109f", 30.0),
}


def unsegmented_quality_rules(
    text: Column | str,
    char_class: str,
    min_chars: int = 50,
    max_chars: int = 100_000,
    distinct_cap: float = 40.0,
) -> Column:
    """Char-based quality gate for unsegmented non-CJK scripts (Thai,
    Khmer, Lao, Burmese — see :data:`UNSEGMENTED_SCRIPTS`).  Two rules
    differ from :func:`cjk_quality_rules`, for script-structural
    reasons:

    * no punctuation rule — these scripts' running prose
      conventionally carries NO terminal punctuation (phrase breaks
      are spaces or script-specific marks used sparsely), so a
      CJK-style punct-density floor would reject good prose;
    * the distinct-char rule is CAPPED at ``distinct_cap``:
      ``distinct >= least(0.1 * chars, cap)`` — see
      :data:`UNSEGMENTED_SCRIPTS` for why.

    Fields: ``char_count_ok, ratio_ok, distinct_ratio_ok, symbol_ok,
    bullet_ok, ellipsis_ok, passes``.  Row-local codegen,
    stream-transparent."""
    c = F.col(text) if isinstance(text, str) else text
    compact = F.regexp_replace(c, r"\s", "")
    n_all = F.greatest(F.length(compact), F.lit(1))
    sc = F.regexp_replace(compact, f"[^{char_class}]", "")
    n_sc = F.length(sc)
    safe_sc = F.greatest(n_sc, F.lit(1))
    n_distinct = F.size(F.array_distinct(F.split(sc, "")))
    n_hash = F.length(c) - F.length(F.replace(c, F.lit("#"), F.lit("")))
    n_ell = (
        F.length(c) - F.length(F.replace(c, F.lit("..."), F.lit("")))
    ) / 3 + (F.length(c) - F.length(F.replace(c, F.lit("…"), F.lit(""))))
    lines = F.split(c, "\n")
    n_lines = F.greatest(F.size(lines), F.lit(1))
    n_bullet = F.size(F.filter(lines, lambda l: l.rlike(r"^\s*[-*•] ")))
    n_ell_line = F.size(
        F.filter(lines, lambda l: l.rlike(r"(\.\.\.|…)\s*$"))
    )
    rules = {
        "char_count_ok": (n_sc >= min_chars) & (n_sc <= max_chars),
        "ratio_ok": n_sc / n_all >= 0.3,
        "distinct_ratio_ok": n_distinct
        >= F.least(0.1 * safe_sc, F.lit(float(distinct_cap))),
        "symbol_ok": (n_hash + n_ell) / safe_sc <= 0.05,
        "bullet_ok": n_bullet / n_lines <= 0.9,
        "ellipsis_ok": n_ell_line / n_lines <= 0.3,
    }
    passes = None
    for expr in rules.values():
        passes = expr if passes is None else (passes & expr)
    return F.struct(
        *[expr.alias(name) for name, expr in rules.items()],
        passes.alias("passes"),
    )


def thai_quality_rules(
    text: Column | str,
    min_chars: int = 50,
    max_chars: int = 100_000,
) -> Column:
    """Char-based quality gate for THAI text — the same silent-drop
    cliff as CJK one script over; see :func:`unsegmented_quality_rules`
    (this is its Thai instantiation, kept as a named entry point
    because Thai is by far the highest-volume unsegmented non-CJK
    script on a real crawl)."""
    _, char_class, cap = UNSEGMENTED_SCRIPTS["th"]
    return unsegmented_quality_rules(
        text, char_class, min_chars, max_chars, distinct_cap=cap
    )


def quality_gate_by_script(
    text: Column | str,
    toks: Column | None = None,
    cjk_threshold: float = 0.3,
    **gopher_kwargs,
) -> Column:
    """Script-dispatched quality gate: documents whose combined
    Han/kana/Hangul char ratio (:func:`script_ratios`) reaches
    ``cjk_threshold`` are judged by :func:`cjk_quality_rules`,
    Thai-dominant documents by :func:`thai_quality_rules` (the other
    unsegmented script, with its own structural rules), the rest by
    :func:`gopher_rules` — closing the silent failure where the
    word-based gate rejects virtually ALL unsegmented prose (no
    spaces → one giant "word") and a naive pipeline quietly drops
    half a real crawl.  Returns ``struct(is_cjk, passes)``; run the
    respective rule struct directly when per-rule diagnostics are
    needed.  All branches are row-local codegen expressions — the
    dispatch is one CASE, stream-transparent."""
    c = F.col(text) if isinstance(text, str) else text
    s = script_ratios(c)
    is_cjk = (s["kana"] + s["hangul"] + s["han"]) >= cjk_threshold
    branch = F.when(is_cjk, cjk_quality_rules(c)["passes"])
    for _lang, (field, char_class, cap) in UNSEGMENTED_SCRIPTS.items():
        branch = branch.when(
            s[field] >= cjk_threshold,
            unsegmented_quality_rules(c, char_class, distinct_cap=cap)[
                "passes"
            ],
        )
    return F.struct(
        is_cjk.alias("is_cjk"),
        branch.otherwise(
            gopher_rules(c, toks, **gopher_kwargs)["passes"]
        ).alias("passes"),
    )


def _ngrams_of(toks: Column, n: int) -> Column:
    """Space-joined word n-grams of a token array by ITERATIVE
    ``zip_with`` against shifted copies of the array — O(tokens)
    column work per level with no per-position ``slice`` allocation
    (the slice-per-index form both allocated an array per gram and
    compiled far slower).  NOTE for maintainers: pyspark HOF lambdas
    here must take exactly ONE parameter — a second parameter makes
    ``transform``/``zip_with`` pass the array index into it, silently
    shadowing default-bound loop variables (found the hard way)."""
    grams = toks
    for k in range(2, n + 1):
        shifted = F.slice(toks, k, F.greatest(F.size(toks) - (k - 1), F.lit(0)))
        grams = F.zip_with(
            F.slice(grams, 1, F.greatest(F.size(toks) - (k - 1), F.lit(0))),
            shifted,
            lambda g, t: F.concat(g, F.lit(" "), t),
        )
    return grams


def blocked_term_hits(
    text: Column | str, terms: list[str]
) -> Column:
    """Array of blocklist terms the document contains — word-boundary
    matching on punctuation-stripped lowercase whitespace tokens (the
    same tokenization as :func:`gopher_rules`' stopword rule, so
    "Term." matches "term" but "terminal" never does), with multi-word
    phrases matched against the document's n-grams of the phrase's
    length.  List entries are normalized with the SAME per-token
    edge-strip as document tokens, so curated entries that carry
    punctuation ("buy now!", "spam.") match their document forms —
    the two sides of the comparison always see identical
    normalization.

    Entirely row-local: the term list ships as a plan literal and the
    match is array arithmetic inside codegen — no shuffle, no UDF,
    stream-transparent.  Per-row cost is O(tokens × terms), so this
    path is for the usual curated lists (hundreds to a few thousand
    entries); for very large lists use :func:`filter_blocked_terms`'
    DataFrame form, which explodes tokens into a broadcast semi-join
    instead.  Case-insensitive by construction; empty list → empty
    array.
    """
    import re as _re

    c = F.col(text) if isinstance(text, str) else text
    toks = F.transform(
        F.split(F.lower(F.trim(c)), r"\s+"),
        lambda t: F.regexp_replace(t, r"(?U)^\W+|\W+$", ""),
    )
    by_len: dict[int, list[str]] = {}
    for t in terms:
        # SYMMETRIC normalization: strip each term token exactly the way
        # document tokens are stripped above (both sides Unicode \W —
        # (?U) on the Java side, Python's default here), so punctuated
        # list entries like "buy now!" or "spam." match their
        # unpunctuated document forms instead of silently never
        # matching, and non-Latin terms survive the strip.
        tok_norm = [
            _re.sub(r"^\W+|\W+$", "", w)
            for w in t.lower().split()
        ]
        if not any(tok_norm):
            continue
        by_len.setdefault(len(tok_norm), []).append(" ".join(tok_norm))
    if not by_len:
        return F.array().cast("array<string>")
    hit_arrays = []
    for n, ts in sorted(by_len.items()):
        term_arr = F.array(*[F.lit(t) for t in sorted(set(ts))])
        hit_arrays.append(F.array_intersect(term_arr, _ngrams_of(toks, n)))
    out = hit_arrays[0]
    for h in hit_arrays[1:]:
        out = F.concat(out, h)
    return out


def filter_blocked_terms(
    documents: DataFrame,
    terms: list[str] | DataFrame,
    text_col: str = "text",
    doc_col: str = "doc_id",
    max_hits: int = 0,
) -> DataFrame:
    """Drop documents containing blocklisted words/phrases — the content
    sibling of ``urls.filter_blocked_domains``.  Keeps rows with at
    most ``max_hits`` DISTINCT matched terms (default 0: any hit
    drops; a small positive budget tolerates incidental mentions in
    encyclopedic text, the usual false-positive pressure on word
    blocklists).

    ``terms`` as a list uses the row-local plan-literal match
    (:func:`blocked_term_hits` — no shuffle at all).  ``terms`` as a
    single-column DataFrame (arbitrarily large lists) switches to the
    scale path: explode the document's tokens/n-grams once, broadcast
    hash semi-join the term table, count distinct hits per doc (only
    FLAGGED docs shuffle — a tiny fraction), and broadcast-anti-join
    the over-budget ids back out.  Both paths match identically
    (pinned by test)."""
    if isinstance(terms, list):
        hits = blocked_term_hits(F.col(text_col), terms)
        return documents.filter(F.size(F.array_distinct(hits)) <= max_hits)

    # SYMMETRIC normalization (same as the plan-literal path): split on
    # whitespace and strip each term token with the exact edge-strip
    # applied to document tokens below, so punctuated list entries
    # ("buy now!", "spam.") match their document forms.  Interior
    # tokens that strip to empty are kept so "buy - now" still joins
    # to the same 3-gram the document side produces.
    term_norm = (
        terms.select(
            F.array_join(
                F.transform(
                    F.split(
                        F.lower(F.trim(F.col(terms.columns[0]))), r"\s+"
                    ),
                    lambda w: F.regexp_replace(w, r"(?U)^\W+|\W+$", ""),
                ),
                " ",
            ).alias("__term")
        )
        .where(F.trim(F.col("__term")) != "")
        .distinct()
    )
    # phrase lengths present in the list: bounded driver collect (a
    # blocklist has a handful of distinct phrase lengths)
    lens = [
        int(r[0])
        for r in term_norm.select(
            F.size(F.split(F.col("__term"), " ")).alias("n")
        ).distinct().collect()
    ]
    toks = F.transform(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda t: F.regexp_replace(t, r"(?U)^\W+|\W+$", ""),
    )
    gram_arrays = [_ngrams_of(toks, n) for n in sorted(lens)]
    grams = gram_arrays[0]
    for g in gram_arrays[1:]:
        grams = F.concat(grams, g)
    exploded = documents.select(
        F.col(doc_col), F.explode(F.array_distinct(grams)).alias("__g")
    )
    flagged = (
        exploded.join(
            F.broadcast(term_norm), exploded["__g"] == term_norm["__term"]
        )
        .groupBy(doc_col)
        .agg(F.count_distinct("__term").alias("__n_hits"))
        .where(F.col("__n_hits") > max_hits)
        .select(doc_col)
    )
    return documents.join(F.broadcast(flagged), doc_col, "left_anti")


def char_repetition_metrics(
    documents: "DataFrame",
    k: int = 10,
    text_col: str = "text",
    doc_col: str = "doc_id",
) -> "DataFrame":
    """Character-k-gram twin of :func:`repetition_metrics` — the
    repetition signal for scripts the word-based variant cannot see:
    unsegmented CJK text has ~one "word" per line, so its word n-grams
    are empty/degenerate and the Gopher dup-fraction rules go silent
    (fail-soft, but signal-less).  Char grams need no segmentation:
    ``top_ngram_frac`` / ``dup_ngram_frac`` over the document's
    character ``k``-grams behave for 啊-floods and copied-paragraph
    spam exactly as the word variant does for English.

    Same output schema as :func:`repetition_metrics` (``n_ngrams``,
    ``top_ngram_frac``, ``dup_ngram_frac``) so gate rules compose
    unchanged; documents shorter than ``k`` chars produce no row.
    Same scale shape too: one narrow explode + two map-side-combined
    aggregates keyed on ``doc_id``, one shuffle total.  Default k=10:
    ~Gopher's 2-3 word grams worth of Han characters, and long enough
    that ordinary English prose doesn't self-collide.
    """
    ng = documents.select(
        F.col(doc_col),
        F.explode(char_shingles(F.col(text_col), k)).alias("__ng"),
    )
    counts = ng.groupBy(doc_col, "__ng").agg(F.count("*").alias("__c"))
    return counts.groupBy(doc_col).agg(
        F.sum("__c").alias("n_ngrams"),
        F.round(F.max("__c") / F.sum("__c"), 6).alias("top_ngram_frac"),
        F.round(
            F.sum(F.when(F.col("__c") > 1, F.col("__c")).otherwise(0))
            / F.sum("__c"),
            6,
        ).alias("dup_ngram_frac"),
    )


def quality_gate_by_language(
    text: Column | str,
    lang: Column | str,
    toks: Column | None = None,
    cjk_threshold: float = 0.3,
    profiles: dict[str, tuple[str, ...]] | None = None,
    clean_toks: Column | None = None,
    **gopher_kwargs,
) -> Column:
    """Language-aware quality gate: CJK scripts route to
    :func:`cjk_quality_rules` (as in :func:`quality_gate_by_script`),
    and the Gopher branch swaps its ``required_words`` stopword list by
    the document's ``lang`` label — the rule is "looks like running
    prose of ITS OWN language", and the default English list silently
    fails es/fr/de prose the same way word counting fails CJK (a French
    page contains no "the"/"and", so ``stopword_ok`` is near-always
    false and good French is rejected).

    ``profiles`` maps language code → required-word tuple; defaults to
    the marker-word lists in :data:`LANG_PROFILES` (en/es/fr/de/it/pt/
    nl/pl/tr/id/vi/ru/ar/hi — the same vocabulary :func:`lang_id`
    detects with, so detection and gating agree by construction);
    unlisted languages fall back to the Gopher English list via
    ``gopher_kwargs``.  Languages in :data:`LANG_WORD_LEN_BOUNDS` also
    swap the mean-word-length bounds (monosyllabic Vietnamese fails
    the English-calibrated [3, 10] on length alone).
    Non-Latin-script languages additionally swap the alpha rule's
    letter class per :data:`LANG_LETTER_PATTERNS` — good Russian/
    Arabic/Hindi prose contains no ``[a-zA-Z]``, so with the default
    class the alpha rule alone silently rejected all of it regardless
    of stopwords.

    Expression shape: only the two language-DEPENDENT rules (stopword
    membership, alpha letter class) dispatch through the CASE on
    ``lang``; the five language-independent Gopher rules are built
    ONCE and ANDed outside it — a full ``gopher_rules`` per branch
    measured ~10× the codegen cost for identical semantics.  Pass a
    materialized ``toks`` AND ``clean_toks`` (the ``(?U)``-stripped
    token array) to share tokenization — HOF arguments do not CSE, so
    without ``clean_toks`` every per-language stopword filter re-runs
    the per-token regexp strip (measured: the strip re-evaluation
    dominates the whole gate at 14 profiles).

    Returns ``struct(is_cjk, passes)`` like the script dispatcher.
    """
    c = F.col(text) if isinstance(text, str) else text
    lg = F.col(lang) if isinstance(lang, str) else lang
    toks = word_tokens(c) if toks is None else toks
    profs = (
        {k: tuple(v) for k, v in LANG_PROFILES.items() if k != "zh"}
        if profiles is None
        else profiles
    )
    s = script_ratios(c)
    is_cjk = (s["kana"] + s["hangul"] + s["han"]) >= cjk_threshold
    base = gopher_rules(c, toks, **gopher_kwargs)
    shared = (
        base["word_count_ok"]
        & base["symbol_ratio_ok"]
        & base["bullet_ok"]
        & base["ellipsis_ok"]
    )
    if clean_toks is None:
        clean_toks = F.transform(
            toks, lambda t: F.regexp_replace(t, r"(?U)^\W+|\W+$", "")
        )
    n_words = F.greatest(F.size(toks), F.lit(1))
    stop_ok = base["stopword_ok"]
    alpha_ok = base["alpha_ratio_ok"]
    len_ok = base["mean_word_len_ok"]
    for code, words in sorted(profs.items()):
        marker = F.array(*[F.lit(w) for w in words])
        # array_intersect = hash probe + exactly the distinct-count rule
        n_stop = F.size(F.array_intersect(marker, clean_toks))
        stop_ok = F.when(lg == code, n_stop >= 2).otherwise(stop_ok)
        if code in LANG_LETTER_PATTERNS:
            pat = LANG_LETTER_PATTERNS[code]
            n_alpha = F.size(F.filter(toks, lambda t: t.rlike(pat)))
            alpha_ok = F.when(
                lg == code, n_alpha / n_words >= 0.8
            ).otherwise(alpha_ok)
        if code in LANG_WORD_LEN_BOUNDS:
            lo, hi = LANG_WORD_LEN_BOUNDS[code]
            mean_len = (
                F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t))
                / n_words
            )
            len_ok = F.when(
                lg == code, (mean_len >= lo) & (mean_len <= hi)
            ).otherwise(len_ok)
    latin = shared & len_ok & stop_ok & alpha_ok
    branch = F.when(is_cjk, cjk_quality_rules(c)["passes"])
    for _lang, (field, char_class, cap) in UNSEGMENTED_SCRIPTS.items():
        branch = branch.when(
            s[field] >= cjk_threshold,
            unsegmented_quality_rules(c, char_class, distinct_cap=cap)[
                "passes"
            ],
        )
    return F.struct(
        is_cjk.alias("is_cjk"),
        branch.otherwise(latin).alias("passes"),
    )
