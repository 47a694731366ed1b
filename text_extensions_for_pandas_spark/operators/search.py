"""Keyword search & corpus-statistics operators (beyond-reference surface).

A training-data engine needs keyword retrieval next to embedding ANN: BM25
over an inverted term-statistics table, built entirely from built-in
functions so the whole pipeline — term stats, document frequencies, query
scoring — is one Catalyst plan.

Scale shape: the term-frequency table (one row per distinct (doc, term)) is
the inverted index; scoring a query touches only the posting rows of the
query's terms (filter pushdown on ``term``), never the corpus.  The df/idf
side is tiny (vocabulary-sized) and broadcasts.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from text_extensions_for_pandas_spark.functions.text import word_tokens


def term_frequencies(
    documents: DataFrame, text_col: str = "text", doc_col: str = "doc_id"
) -> DataFrame:
    """Inverted term-stats table ``(doc_id, term, tf, doc_len)``."""
    toks = documents.select(
        F.col(doc_col),
        F.explode(word_tokens(F.col(text_col))).alias("term"),
    ).filter(F.length("term") > 0)
    tf = toks.groupBy(doc_col, "term").agg(F.count("*").alias("tf"))
    lens = toks.groupBy(doc_col).agg(F.count("*").alias("doc_len"))
    return tf.join(lens, doc_col)


def document_frequencies(term_freqs: DataFrame) -> DataFrame:
    """``(term, df)`` — number of documents containing each term."""
    return term_freqs.groupBy("term").agg(F.count("*").alias("df"))


def vocabulary(
    documents: DataFrame,
    text_col: str = "text",
    doc_col: str = "doc_id",
    term_freqs: DataFrame | None = None,
) -> DataFrame:
    """Corpus vocabulary with collection frequency and document frequency —
    the Zipf table every corpus audit starts from."""
    tf = (
        term_freqs
        if term_freqs is not None
        else term_frequencies(documents, text_col, doc_col)
    )
    return tf.groupBy("term").agg(
        F.sum("tf").alias("collection_freq"),
        F.count("*").alias("doc_freq"),
    )


def bm25_search(
    documents: DataFrame,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    doc_col: str = "doc_id",
    term_freqs: DataFrame | None = None,
) -> DataFrame:
    """BM25 top-k document retrieval for a query string.

    idf = ln((N - df + 0.5) / (df + 0.5) + 1) (Lucene's non-negative form);
    score = Σ_terms idf · tf·(k1+1) / (tf + k1·(1 - b + b·len/avglen)).

    The plan: posting rows of the query terms (selective filter on the
    term-stats table) ⋈ broadcast df table → per-doc sum → top-k.  Ties
    break on doc id for determinism.
    """
    terms = sorted({t for t in query.lower().split() if t})
    if not terms:
        raise ValueError("empty query")
    stats = (
        term_freqs
        if term_freqs is not None
        # persist-lifetime: the returned top-k frame references this
        # cache lazily (fallback path only; queries pass the session
        # matview) — handle must outlive the call; LRU-evictable.
        else term_frequencies(documents, text_col, doc_col).persist()
    )
    tf = stats.filter(F.col("term").isin(terms))
    # corpus constants (driver-side scalars, like the overlap-join
    # block-size estimation); n_docs counts ALL documents, token-less ones
    # included — BM25's idf is defined over the collection size
    n_docs = documents.count()
    avg_len = float(
        stats.select(doc_col, "doc_len")
        .distinct()
        .agg(F.avg("doc_len"))
        .collect()[0][0]
        or 1.0
    )
    dfs = document_frequencies(stats).filter(F.col("term").isin(terms))
    idf = F.log(
        (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    scored = tf.join(F.broadcast(dfs), "term").withColumn(
        "__s",
        idf
        * (F.col("tf") * (k1 + 1))
        / (F.col("tf") + k1 * (1 - b + b * F.col("doc_len") / F.lit(float(avg_len)))),
    )
    return (
        scored.groupBy(doc_col)
        .agg(
            F.sum("__s").alias("score"),
            F.count("*").alias("n_matched_terms"),
        )
        .orderBy(F.col("score").desc(), F.col(doc_col))
        .limit(k)
    )


def unigram_surprisal(
    documents: DataFrame, text_col: str = "text", doc_col: str = "doc_id"
) -> DataFrame:
    """Per-document mean unigram surprisal — the SQL-expressible analog of
    CCNet's LM-perplexity quality filter (Wenzek et al., LREC'20): score
    each document by ``-avg(log2 p(token))`` under the corpus' own unigram
    distribution.  Documents of improbable (rare-token-heavy) text score
    high; word-salad and boilerplate sort to the extremes, which is what
    the filter thresholds on.

    Returns ``(doc_id, n_tokens, bits_per_token)`` (rounded to 6 decimals —
    cross-engine float discipline).

    Scale shape: the unigram table is vocabulary-sized and broadcasts; the
    corpus total enters as a 1-row cross join.  The only corpus-wide ops
    are the token explode + two map-side-combined aggregations; nothing
    wider than (doc, token) ever shuffles.
    """
    toks = documents.select(
        F.col(doc_col),
        F.explode(word_tokens(F.col(text_col))).alias("tok"),
    ).filter(F.length("tok") > 0)
    vocab = toks.groupBy("tok").agg(F.count("*").alias("__c"))
    total = vocab.agg(F.sum("__c").alias("__n"))
    probs = vocab.crossJoin(F.broadcast(total)).select(
        "tok", (-F.log2(F.col("__c") / F.col("__n"))).alias("__bits")
    )
    return (
        toks.join(F.broadcast(probs), "tok")
        .groupBy(doc_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg("__bits"), 6).alias("bits_per_token"),
        )
    )


def split_by_hash(
    df: DataFrame,
    weights: dict[str, float],
    key_col: str = "doc_id",
    split_col: str = "split",
    buckets: int = 1_000_000,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Deterministic train/val/test assignment by key hash.

    Unlike ``randomSplit`` the assignment is a pure function of the key —
    stable across runs, executors, retries, and data order, which is what a
    reproducible 100 TB pipeline actually needs.  ``weights`` need not be
    normalized.

    ``hash_fn``: ``"xxhash64"`` (default — one JVM hash, fastest) or
    ``"md5"`` (the cross-engine fraction from
    :func:`..sampling.hash_fraction`, reproducible by external systems /
    the DuckDB oracle at the cost of a cryptographic hash per row).
    """
    total = sum(weights.values())
    if hash_fn == "md5":
        from text_extensions_for_pandas_spark.operators.sampling import (
            hash_fraction,
        )

        bucket = F.floor(hash_fraction(F.col(key_col)) * buckets)
    elif hash_fn == "xxhash64":
        bucket = F.pmod(F.xxhash64(F.col(key_col)), F.lit(buckets))
    else:
        raise ValueError(f"unknown hash_fn: {hash_fn!r}")
    expr = None
    acc = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        acc += w / total
        cond = bucket < int(acc * buckets)
        expr = (
            F.when(cond, name) if expr is None else expr.when(cond, name)
        )
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)


def tfidf_top_terms(
    documents: DataFrame,
    top_k: int = 3,
    text_col: str = "text",
    doc_col: str = "doc_id",
    term_freqs: DataFrame | None = None,
) -> DataFrame:
    """Top-``k`` characteristic terms per document by TF-IDF:
    ``tf/doc_len * ln(N/df)``, ties broken by term for determinism.

    Scale shape: the df table is vocabulary-sized and broadcasts; the corpus
    count enters as a 1-row cross join (also broadcast), so the only wide ops
    are the two term-stat aggregations and the per-doc top-k window — all
    map-side combined / partitioned on ``doc_id``.
    """
    tf = (
        term_freqs
        if term_freqs is not None
        else term_frequencies(documents, text_col, doc_col)
    )
    df = document_frequencies(tf)
    n_docs = documents.agg(F.count("*").alias("__n"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            (F.col("tf") / F.col("doc_len"))
            * F.log(F.col("__n") / F.col("df")),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy(doc_col).orderBy(
        F.col("tfidf").desc(), F.col("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= top_k)
        .select(
            doc_col, "term", F.round("tfidf", 6).alias("tfidf"), "rank"
        )
    )


def bigram_lm(
    tokens: DataFrame,
    doc_col: str = "doc_id",
    idx_col: str = "token_idx",
    token_col: str = "token",
) -> DataFrame:
    """Corpus bigram language model: conditional probability table
    ``(w1, w2, c12, p)`` with ``p = count(w1,w2) / count(w1 as context)``.

    Input is a token table (e.g. the session tokens matview) — the model
    builds on the same tokenization every other operator uses.  Tokens are
    lowercased; the document-final token of each doc forms no bigram.

    Scale shape: one ``lead`` window per document (shuffle on doc), then
    two map-side-combined aggregations shuffling only ``(w1[, w2])`` pair
    counts — vocabulary-sized, not corpus-sized.  The context-count join
    is vocabulary × vocabulary-pairs, both tiny next to the corpus; at
    100 TB the pair table is the thing you'd persist as the LM artifact.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(doc_col).orderBy(idx_col)
    pairs = (
        tokens.select(
            F.col(doc_col),
            F.col(idx_col),
            F.lower(F.col(token_col)).alias("w1"),
        )
        .withColumn("w2", F.lead("w1").over(w))
        .filter(F.col("w2").isNotNull())
    )
    counts = pairs.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    contexts = pairs.groupBy("w1").agg(F.count("*").alias("__c1"))
    return counts.join(contexts, "w1").select(
        "w1",
        "w2",
        F.col("c12").cast("long").alias("c12"),
        F.round(F.col("c12") / F.col("__c1"), 6).alias("p"),
    )


def doc_perplexity(
    tokens: DataFrame,
    lam: float = 0.9,
    doc_col: str = "doc_id",
    idx_col: str = "token_idx",
    token_col: str = "token",
) -> DataFrame:
    """Per-document perplexity under a Jelinek-Mercer-interpolated bigram
    LM estimated from the corpus itself (the KenLM-shaped filter CCNet
    applies before its head/middle/tail split — here with the corpus as
    its own model, the standard in-domain proxy when no external LM is
    available):

    ``P(w2 | w1) = lam * c(w1,w2)/c(w1) + (1 - lam) * c(w2)/N``

    Returns ``(doc_id, n_bigrams, nats_per_token, ppl)`` — mean negative
    log-likelihood in nats and its exp.  Low-perplexity docs are fluent
    (or boilerplate); high-perplexity docs are noise — both tails get
    filtered in training-data prep.

    Scale shape: one ``lead`` window partitioned by doc builds bigram
    occurrences; the model tables (pair counts, context counts, unigram
    counts) are vocabulary-sized aggregates with map-side partials; the
    corpus-sized occurrence stream then equijoins those small tables
    (broadcast when they fit) and collapses per doc.  Nothing Python,
    nothing all-pairs, and at 100 TB the model tables are the persisted
    artifact while the corpus is scanned twice (model + score) or once
    when the model is precomputed upstream.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(doc_col).orderBy(idx_col)
    pairs = (
        tokens.select(
            F.col(doc_col),
            F.col(idx_col),
            F.lower(F.col(token_col)).alias("w1"),
        )
        .withColumn("w2", F.lead("w1").over(w))
        .filter(F.col("w2").isNotNull())
        # referenced five times below (three model tables, the normalizer,
        # and the scoring join): persist so the per-doc lead window runs
        # once, not per branch (persist, not localCheckpoint — a
        # checkpoint would hide the upstream plan from the plan audits).
        # persist-lifetime: the returned per-doc scores reference this
        # cache lazily — handle must outlive the call; LRU-evictable.
        .persist()
    )
    bi = pairs.groupBy("w1", "w2").agg(F.count("*").alias("__c12"))
    ctx = pairs.groupBy("w1").agg(F.count("*").alias("__c1"))
    uni = pairs.groupBy("w2").agg(F.count("*").alias("__c2"))
    total = pairs.agg(F.count("*").alias("__n"))
    model = (
        bi.join(ctx, "w1")
        .join(uni, "w2")
        .crossJoin(F.broadcast(total))
        .select(
            "w1",
            "w2",
            (
                F.lit(lam) * F.col("__c12") / F.col("__c1")
                + F.lit(1.0 - lam) * F.col("__c2") / F.col("__n")
            ).alias("__p"),
        )
    )
    return (
        pairs.join(model, ["w1", "w2"])
        .groupBy(doc_col)
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.round(F.avg(-F.log("__p")), 6).alias("nats_per_token"),
            F.round(F.exp(F.avg(-F.log("__p"))), 2).alias("ppl"),
        )
    )


def surprisal_buckets(
    documents: DataFrame,
    n_buckets: int = 3,
    by: str = "lang",
    text_col: str = "text",
    doc_col: str = "doc_id",
) -> DataFrame:
    """CCNet's per-language perplexity bucketing (Wenzek et al., LREC'20
    §4.3: each language's documents are split into head/middle/tail thirds
    by LM perplexity; training mixes prefer the head).  Here the score is
    :func:`unigram_surprisal` and the split is an exact ``ntile`` per
    ``by`` group, tie-broken by ``doc_col`` for determinism.

    Output: ``(doc_col, by, n_tokens, bits_per_token, bucket, bucket_name)``
    with bucket 1 = lowest surprisal ("head").  The window sorts WITHIN
    each language partition only — at corpus scale that is a per-language
    sort of (doc, score) rows, not of documents' text.  For the
    shuffle-light path at extreme scale use
    :func:`surprisal_buckets_approx`, which replaces the per-language
    sort with a percentile sketch + row-local assignment.
    """
    names = {1: "head", 2: "middle", 3: "tail"}
    scored = unigram_surprisal(documents, text_col, doc_col).join(
        documents.select(doc_col, by), doc_col
    )
    w = Window.partitionBy(by).orderBy("bits_per_token", doc_col)
    out = scored.withColumn("bucket", F.ntile(n_buckets).over(w))
    name_expr = F.lit(None).cast("string")
    if n_buckets == 3:
        name_expr = (
            F.when(F.col("bucket") == 1, "head")
            .when(F.col("bucket") == 2, "middle")
            .otherwise("tail")
        )
    del names
    return out.select(
        doc_col, by, "n_tokens", "bits_per_token", "bucket",
        name_expr.alias("bucket_name"),
    )


def surprisal_buckets_approx(
    documents: DataFrame,
    n_buckets: int = 3,
    by: str = "lang",
    text_col: str = "text",
    doc_col: str = "doc_id",
    accuracy: int = 10_000,
) -> DataFrame:
    """The shuffle-light scale path of :func:`surprisal_buckets`: instead
    of an exact per-language ``ntile`` (which sorts every (doc, score)
    row within its language partition), compute approximate quantile cut
    points per language with ``percentile_approx`` — one aggregation
    whose state is a fixed-size sketch — broadcast the tiny
    (language × cuts) table, and assign buckets by comparison.  At
    100 TB this replaces the per-language sort with a map-side-combined
    sketch merge + a row-local comparison; group sizes no longer bound
    any single task.

    Buckets can deviate from the exact split near cut points (sketch
    error ≈ 1/accuracy of rank); agreement is property-tested against
    the exact operator.  Output schema matches :func:`surprisal_buckets`.
    """
    scored = unigram_surprisal(documents, text_col, doc_col).join(
        documents.select(doc_col, by), doc_col
    )
    fracs = [i / n_buckets for i in range(1, n_buckets)]
    cuts = scored.groupBy(by).agg(
        F.percentile_approx(
            "bits_per_token", F.lit(fracs), F.lit(accuracy)
        ).alias("__cuts")
    )
    joined = scored.join(F.broadcast(cuts), by)
    bucket = (
        F.aggregate(
            "__cuts",
            F.lit(1),
            lambda acc, c: acc
            + F.when(F.col("bits_per_token") > c, 1).otherwise(0),
        )
    ).alias("bucket")
    out = joined.select(
        doc_col, by, "n_tokens", "bits_per_token", bucket
    )
    name_expr = F.lit(None).cast("string")
    if n_buckets == 3:
        name_expr = (
            F.when(F.col("bucket") == 1, "head")
            .when(F.col("bucket") == 2, "middle")
            .otherwise("tail")
        )
    return out.select(
        doc_col, by, "n_tokens", "bits_per_token", "bucket",
        name_expr.alias("bucket_name"),
    )
