"""Deterministic sampling for training-data pipelines.

Corpus assembly at 100 TB needs *reproducible* sampling: re-running the
pipeline (or re-processing one failed partition) must keep exactly the
same documents, which rules out ``df.sample`` (seeded per-partition RNG —
the kept set changes with partitioning).  Everything here derives a
uniform-[0,1) fraction from a **content-stable hash of the row key**, so
membership is a pure row-local function of the data: stable under
repartitioning, engine-independent (md5 — verifiable against the DuckDB
oracles), and streamable (no state, no shuffle for the filter itself).

Operators:

* :func:`hash_fraction` — the md5-based uniform;
* :func:`stratified_sample` — per-stratum rates (dict or default);
* :func:`importance_sample` — per-row keep probability from a weight
  column (quality-score resampling);
* :func:`mixture_rates` / :func:`sample_mixture` — corpus mixing to
  hand-specified target weights under a token budget;
* :func:`alpha_mixture_rates` — temperature-scaled weights derived from
  stratum mass (the mT5/XLM-R multilingual schedule);
* :func:`upsample_mixture` — rates ABOVE 1: deterministic epoch
  repetition (floor copies + a hash-kept fractional epoch);
* :func:`dsir_llr_table` / :func:`dsir_score` / :func:`dsir_log_weights`
  — Data Selection via Importance Resampling;
* :func:`cap_per_domain` — RefinedWeb/C4 anti-host-dominance budgets;
* :func:`deterministic_shuffle` — epoch-stable (shard, pos) training
  order (with ``order_cols`` for in-context/curriculum grouping);
* :func:`sample_to_token_budget` — greedy highest-priority prefix under
  a token budget via quantile-threshold refinement (never a global
  cumulative-sum sort);
* :func:`unigram_divergence` / :func:`source_divergence` — KL/JS
  distribution-drift checks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_fraction(key: Column) -> Column:
    """Deterministic uniform fraction in [0, 1) from ``md5(key)``.

    Uses the first 8 hex chars (32 bits) of the md5 of the key's string
    form — the same bytes DuckDB's ``md5`` produces, so oracle SQL can
    reproduce membership exactly: ``CAST(('0x' || substring(md5(CAST(k AS
    VARCHAR)), 1, 8)) AS BIGINT) / 4294967296.0``.
    """
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("double")
        / F.lit(float(1 << 32))
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    key_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row iff its hash fraction is below its stratum's rate.

    Row-local: no shuffle, no state; the rates dict ships as a plan
    literal (strata counts are small by definition — languages, sources,
    quality buckets).  Unlisted strata use ``default_rate``.
    """
    rate = F.lit(float(default_rate))
    for stratum, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == stratum, float(r)).otherwise(rate)
    return df.filter(hash_fraction(F.col(key_col)) < rate)


def importance_sample(
    df: DataFrame,
    weight_col: Column | str,
    key_col: str = "doc_id",
) -> DataFrame:
    """Keep each row with probability = its (clamped to [0,1]) weight —
    deterministic importance resampling, e.g. quality-score-proportional
    retention.  Row-local; weights ≥ 1 always keep."""
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    return df.filter(
        hash_fraction(F.col(key_col)) < F.least(F.lit(1.0), F.greatest(w, F.lit(0.0)))
    )


def mixture_rates(
    df: DataFrame,
    strata_col: str,
    targets: dict[str, float],
    size_col: Column | str,
    budget: float,
) -> DataFrame:
    """Per-stratum sampling rates that hit a target mixture under a budget.

    ``rate(s) = min(1, budget * target_share(s) / size(s))`` where
    ``size(s)`` is the stratum's total of ``size_col`` (tokens, bytes...).
    One aggregate over the strata (map-side combined, output = one row per
    stratum) — the result is a tiny frame suitable for a broadcast join.
    Strata not in ``targets`` get rate 0.  Oversubscribed strata (mass
    smaller than their target share of the budget) cap at 1 — i.e. the mix
    degrades gracefully instead of upsampling duplicates.
    """
    total_target = sum(targets.values()) or 1.0
    share = F.lit(0.0)
    for stratum, t in sorted(targets.items()):
        share = F.when(F.col(strata_col) == stratum, float(t) / total_target).otherwise(share)
    size = F.col(size_col) if isinstance(size_col, str) else size_col
    return (
        df.groupBy(strata_col)
        .agg(F.sum(size).alias("stratum_size"))
        .select(
            strata_col,
            "stratum_size",
            F.least(
                F.lit(1.0), F.lit(float(budget)) * share / F.col("stratum_size")
            ).alias("rate"),
        )
    )


def alpha_mixture_rates(
    df: DataFrame,
    strata_col: str,
    size_col: Column | str,
    alpha: float = 0.3,
    budget: float | None = None,
) -> DataFrame:
    """Temperature-scaled mixture weights (the mT5/XLM-R multilingual
    recipe): a stratum with mass ``m_i`` gets sampling probability
    ``p_i = m_i^alpha / sum_j m_j^alpha`` — ``alpha < 1`` upweights
    low-resource strata relative to their raw share, ``alpha = 1`` is
    proportional, ``alpha = 0`` is uniform.  This replaces
    :func:`mixture_rates`' hand-specified targets with the standard
    derived-from-mass schedule.

    Returns ``(strata_col, stratum_size, p, rate)`` — ``rate`` is the
    per-row keep probability achieving ``p`` under ``budget`` total mass
    (capped at 1: low-resource strata degrade to take-everything instead
    of upsampling duplicates); with ``budget=None`` the rate column is
    the uncapped share itself.  One map-side-combined aggregate; output
    is one row per stratum, broadcastable to a row-local filter — the
    corpus never shuffles.
    """
    size = F.col(size_col) if isinstance(size_col, str) else size_col
    mass = df.groupBy(strata_col).agg(F.sum(size).alias("stratum_size"))
    powed = mass.select(
        strata_col,
        "stratum_size",
        F.pow(F.col("stratum_size").cast("double"), F.lit(float(alpha))).alias(
            "__w"
        ),
    )
    total = powed.agg(F.sum("__w").alias("__tw"))
    out = powed.crossJoin(F.broadcast(total)).select(
        strata_col,
        "stratum_size",
        F.round(F.col("__w") / F.col("__tw"), 6).alias("p"),
    )
    if budget is None:
        return out.withColumn("rate", F.col("p"))
    return out.withColumn(
        "rate",
        F.round(
            F.least(
                F.lit(1.0),
                F.lit(float(budget)) * F.col("p") / F.col("stratum_size"),
            ),
            6,
        ),
    )


def sample_mixture(
    df: DataFrame,
    strata_col: str,
    targets: dict[str, float],
    size_col: Column | str,
    budget: float,
    key_col: str = "doc_id",
) -> DataFrame:
    """:func:`mixture_rates` applied: broadcast-join the per-stratum rate
    and keep rows below it.  The corpus never shuffles — only the one-row-
    per-stratum aggregate does."""
    rates = mixture_rates(df, strata_col, targets, size_col, budget)
    return df.join(F.broadcast(rates), strata_col).filter(
        hash_fraction(F.col(key_col)) < F.col("rate")
    )


def dsir_log_weights(
    raw_docs: DataFrame,
    target_docs: DataFrame,
    n_buckets: int = 10_000,
    text_col: str = "text",
    doc_col: str = "doc_id",
) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al., NeurIPS'23):
    score every raw document by how much more likely its text is under a
    small TARGET corpus' hashed-unigram distribution than under the raw
    corpus' own — ``log_weight = avg_tokens(log p_target(b) - log p_raw(b))``
    over md5-hashed token buckets with add-1 smoothing.  Feed the result
    to :func:`importance_sample` (after exponentiating / rank-normalizing)
    to assemble a target-like training mix from a general crawl.

    Returns ``(doc_col, n_tokens, log_weight)`` for every raw document
    that has at least one token (rounded to 6 decimals — cross-engine
    float discipline).  Empty/whitespace-only documents have no defined
    score and are omitted; left-join the result back onto the corpus if
    every row must survive.

    Scale shape: both distributions collapse to ``n_buckets`` rows (one
    corpus scan each — the bucket counts are persisted and the totals
    derived from them, so estimation is a single map-side-combined
    groupBy per corpus); the joined bucket table broadcasts, and scoring
    is one more corpus pass (explode + broadcast-join + per-doc
    aggregation).  Two raw-corpus passes total — estimate and score —
    is the floor without materializing the token stream.  Nothing wider
    than (doc, token) shuffles, and the hashing trick caps
    distribution-estimation memory regardless of vocabulary size — the
    reason DSIR scales where exact-vocab LM importance weights do not.
    """
    table = dsir_llr_table(raw_docs, target_docs, n_buckets, text_col)
    return dsir_score(raw_docs, table, n_buckets, text_col, doc_col)


def _dsir_buckets(docs: DataFrame, n_buckets: int, text_col: str, doc_col=None):
    cols = [F.col(doc_col)] if doc_col else []
    return docs.select(
        *cols,
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), " ")).alias("tok"),
    ).filter(F.length("tok") > 0).select(
        *([doc_col] if doc_col else []),
        (
            F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long")
            % n_buckets
        ).alias("bucket"),
    )


def dsir_llr_table(
    raw_docs: DataFrame,
    target_docs: DataFrame,
    n_buckets: int = 10_000,
    text_col: str = "text",
) -> DataFrame:
    """The static half of DSIR: the complete ``(bucket, llr)`` table over
    all ``n_buckets`` hash buckets (``spark.range`` spine + left-joined
    counts, so unseen buckets carry the pure smoothing mass).  Estimate
    once over the two corpora, persist, then :func:`dsir_score` any
    batch or micro-batch against it — the table is static, so scoring is
    stream-transparent (foreachBatch, parity-tested)."""
    spark = raw_docs.sparkSession

    def log_probs(docs: DataFrame, name: str) -> DataFrame:
        toks = _dsir_buckets(docs, n_buckets, text_col)
        # one corpus scan: persist the (≤ n_buckets)-row count table and
        # derive the total from it rather than a separate count() pass
        # persist-lifetime: ≤ n_buckets skinny rows; the returned llr
        # table references it lazily — handle must outlive the call.
        counts = toks.groupBy("bucket").agg(F.count("*").alias("__c")).persist()
        total = counts.agg(F.sum("__c")).collect()[0][0] or 0
        spine = spark.range(n_buckets).select(F.col("id").alias("bucket"))
        return spine.join(counts, "bucket", "left").select(
            "bucket",
            F.log(
                (F.coalesce("__c", F.lit(0)) + 1.0)
                / F.lit(float(total + n_buckets))
            ).alias(name),
        )

    tgt = log_probs(target_docs, "__lp_t")
    raw = log_probs(raw_docs, "__lp_r")
    return tgt.join(raw, "bucket").select(
        "bucket", (F.col("__lp_t") - F.col("__lp_r")).alias("llr")
    )


def dsir_score(
    docs: DataFrame,
    llr_table: DataFrame,
    n_buckets: int = 10_000,
    text_col: str = "text",
    doc_col: str = "doc_id",
) -> DataFrame:
    """Score documents against a precomputed :func:`dsir_llr_table`
    (``n_buckets`` must match): explode + broadcast join + per-doc mean.
    Row-local given the static table, so each micro-batch scores
    independently and identically to the batch path."""
    toks = _dsir_buckets(docs, n_buckets, text_col, doc_col)
    return (
        toks.join(F.broadcast(llr_table), "bucket")
        .groupBy(doc_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg("llr"), 6).alias("log_weight"),
        )
    )


def cap_per_domain(
    df: DataFrame,
    max_docs: int | None = None,
    max_tokens: int | None = None,
    token_col: str = "n_chars",
    domain_col: str = "source",
    doc_col: str = "doc_id",
) -> DataFrame:
    """Per-domain caps (the RefinedWeb/C4 trick against a handful of hosts
    dominating the corpus): within each domain keep documents in
    deterministic md5-hash order until hitting ``max_docs`` and/or a
    ``max_tokens`` budget (a document is kept while the budget is not yet
    exhausted BEFORE it, so one oversized document cannot starve its
    domain).

    Hash order makes the kept set a pure function of the data — stable
    under repartitioning, and nested across caps (cap 10 ⊆ cap 20), so
    scaling a mixture down later keeps subsets consistent.

    Scale shape (mega-domain safe): the kept set is always a PREFIX of
    each domain's ``(__frac, doc_id)`` order, so rows with a hash fraction
    above a per-domain threshold can be discarded BEFORE the exact sort
    window ever sees them.  The threshold is ``margin ×`` the expected
    fraction needed to cover the cap (``max_docs/count`` for the doc cap,
    ``max_tokens/sum(tokens)`` for the token budget); a cheap
    map-side-combinable count/sum per domain derives it, and a second
    aggregate VERIFIES the guarantee (survivors ≥ effective cap) — any
    domain whose survivors fall short (probability ~e^-margin, e.g. hash
    clustering on a tiny cap) falls back to its full row set, so the
    result is bit-identical to the unfiltered window in every case.  A
    domain with 10^9 docs and a cap of 10^4 therefore sorts ~margin×10^4
    rows in one task instead of 10^9; the corpus-scale work is two
    hash-joins against domain-cardinality tables (broadcast under AQE) —
    splittable shuffles, not single-task sorts.
    """
    from pyspark.sql import Window

    if max_docs is None and max_tokens is None:
        return df
    # materialize the hash fraction as ONE named column so both window
    # expressions share the identical sort key — Catalyst then plans a
    # single Sort + single Window node (separate withColumns would each
    # re-derive the expression under a fresh id and force a second sort)
    out = df.withColumn("__frac", hash_fraction(F.col(doc_col)))
    margin = 8.0
    # the token column only exists/matters when a token budget is set; the
    # doc cap alone must not reference it
    tok = (
        F.sum(F.coalesce(F.col(token_col), F.lit(0)))
        if max_tokens is not None
        else F.lit(0)
    )
    stats = out.groupBy(domain_col).agg(
        F.count("*").alias("__cnt"), tok.alias("__tot")
    )
    # if max_docs is set the kept set is inside the first max_docs rows
    # regardless of the token budget, so the doc threshold alone suffices
    if max_docs is not None:
        t_expr = F.least(
            F.lit(1.0), F.lit(margin) * max_docs / F.col("__cnt")
        )
    else:
        t_expr = F.least(
            F.lit(1.0),
            F.lit(margin) * max_tokens
            / F.greatest(F.col("__tot"), F.lit(1)),
        )
    thr = stats.select(domain_col, t_expr.alias("__t"))
    j = out.join(thr, domain_col)
    surv = (F.col("__t") >= 1.0) | (F.col("__frac") < F.col("__t"))
    schk = (
        j.filter(surv)
        .groupBy(domain_col)
        .agg(F.count("*").alias("__scnt"), tok.alias("__stot"))
    )
    if max_docs is not None:
        ok_expr = (F.col("__scnt") >= max_docs) | (
            F.col("__scnt") == F.col("__cnt")
        )
    else:
        ok_expr = (F.col("__stot") >= max_tokens) | (
            F.col("__scnt") == F.col("__cnt")
        )
    flags = (
        stats.join(schk, domain_col, "left")
        .select(
            domain_col,
            F.coalesce(ok_expr, F.lit(False)).alias("__ok"),
        )
    )
    out = (
        j.join(flags, domain_col)
        .filter(~F.col("__ok") | surv)
        .drop("__t", "__ok")
    )
    w = Window.partitionBy(domain_col).orderBy("__frac", doc_col)
    cols, conds = [], []
    if max_docs is not None:
        cols.append(F.row_number().over(w).alias("__rk"))
        conds.append(F.col("__rk") <= max_docs)
    if max_tokens is not None:
        prefix = F.coalesce(
            F.sum(token_col).over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        )
        cols.append(prefix.alias("__prefix"))
        conds.append(F.col("__prefix") < max_tokens)
    out = out.select("*", *cols)
    cond = conds[0]
    for c in conds[1:]:
        cond = cond & c
    return out.filter(cond).drop("__rk", "__prefix", "__frac")


def cluster_balanced_sample(
    embeddings: DataFrame,
    centroids: DataFrame,
    per_cluster: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "cosine",
) -> DataFrame:
    """Cluster-balanced (diversity) sampling: assign every vector to its
    nearest centroid, then keep a deterministic hash-ordered cap of
    ``per_cluster`` rows per cluster — the cluster-coverage selection step
    of diversity-aware data curation (cap the over-represented modes, keep
    every mode represented), e.g. the cluster-balanced sampling in
    SemDeDup-style pipelines.

    Pure composition of two scale-proven pieces: ``ivf_assign``'s
    broadcast-centroid argmin (one corpus pass, no shuffle) and
    :func:`cap_per_domain`'s pre-filtered hash-order window keyed by
    ``cluster_id`` (mega-cluster safe).  Deterministic: the kept set is a
    pure function of ids, nested across cap sizes.

    Output: the assigned frame (id, original columns, ``cluster_id``)
    restricted to the kept rows.
    """
    from text_extensions_for_pandas_spark.operators.similarity import (
        ivf_assign,
    )

    assigned = ivf_assign(
        embeddings, centroids, id_col, vec_col, metric=metric
    )
    return cap_per_domain(
        assigned,
        max_docs=per_cluster,
        domain_col="cluster_id",
        doc_col=id_col,
    )


def unigram_divergence(
    tokens_a: DataFrame,
    tokens_b: DataFrame,
    alpha: float = 0.5,
    token_col: str = "token",
) -> DataFrame:
    """KL and Jensen-Shannon divergence between two corpora's unigram
    distributions — the standard drift check when validating a training
    mixture (is the held-out split / new crawl snapshot distributed like
    the training corpus?).

    Distributions are additively smoothed over the JOINT vocabulary
    (``p_t = (c_t + alpha) / (N + alpha·V)``), so both KLs are finite and
    the result is a pure deterministic function of the data.  Returns one
    row: ``(n_vocab, kl_ab, kl_ba, js)`` in nats, rounded to 6 decimals.

    Scale shape: each side collapses to a vocabulary-sized count table
    (map-side-combined groupBy); the outer join and the final sums are
    over vocab rows only — the corpora are each scanned once and never
    shuffled whole.
    """
    ca = tokens_a.groupBy(F.lower(F.col(token_col)).alias("t")).agg(
        F.count("*").alias("__ca")
    )
    cb = tokens_b.groupBy(F.lower(F.col(token_col)).alias("t")).agg(
        F.count("*").alias("__cb")
    )
    joint = ca.join(cb, "t", "full_outer").select(
        "t",
        F.coalesce("__ca", F.lit(0)).alias("__ca"),
        F.coalesce("__cb", F.lit(0)).alias("__cb"),
    )
    # one tiny pass for the normalizers, broadcast back as a 1-row frame
    totals = joint.agg(
        F.sum("__ca").alias("__na"),
        F.sum("__cb").alias("__nb"),
        F.count("*").alias("__v"),
    )
    p = (F.col("__ca") + F.lit(alpha)) / (
        F.col("__na") + F.lit(alpha) * F.col("__v")
    )
    q = (F.col("__cb") + F.lit(alpha)) / (
        F.col("__nb") + F.lit(alpha) * F.col("__v")
    )
    m = (p + q) / 2
    return (
        joint.crossJoin(F.broadcast(totals))
        .select(
            F.col("__v"),
            (p * F.log(p / q)).alias("__kl_ab"),
            (q * F.log(q / p)).alias("__kl_ba"),
            (p / 2 * F.log(p / m) + q / 2 * F.log(q / m)).alias("__js"),
        )
        .groupBy()
        .agg(
            F.max("__v").cast("long").alias("n_vocab"),
            F.round(F.sum("__kl_ab"), 6).alias("kl_ab"),
            F.round(F.sum("__kl_ba"), 6).alias("kl_ba"),
            F.round(F.sum("__js"), 6).alias("js"),
        )
    )


def source_divergence(
    tokens: DataFrame,
    doc_meta: DataFrame,
    group_col: str = "source",
    alpha: float = 0.5,
    doc_col: str = "doc_id",
    token_col: str = "token",
) -> DataFrame:
    """Per-group Jensen-Shannon divergence of each group's unigram
    distribution against the WHOLE corpus — ranks domains/sources by how
    far they drift from the corpus average, the screen that surfaces a
    source gone bad (spam flood, template farm, encoding breakage) in a
    large mixture.

    ``doc_meta`` maps ``doc_col`` → ``group_col`` (typically the
    documents table itself).  Smoothing as in
    :func:`unigram_divergence`, over the corpus vocabulary.  Returns
    ``(group_col, n_tokens, js)`` sorted nowhere — order downstream.

    Scale shape: one (group, token) count table and one (token) corpus
    table, both vocabulary-bounded; the join keys are tokens, the final
    aggregate is per group.  Adding a group never rescans the corpus.
    """
    toks = tokens.join(doc_meta.select(doc_col, group_col), doc_col).select(
        F.col(group_col).alias("__g"),
        F.lower(F.col(token_col)).alias("t"),
    )
    per_group = toks.groupBy("__g", "t").agg(F.count("*").alias("__cg"))
    # corpus counts roll up from the vocabulary-sized per-group table —
    # identical values, and the corpus-scale join really is scanned once
    corpus = per_group.groupBy("t").agg(F.sum("__cg").alias("__ct"))
    vocab = corpus.agg(
        F.count("*").alias("__v"), F.sum("__ct").alias("__n")
    )
    group_tot = per_group.groupBy("__g").agg(F.sum("__cg").alias("__ng"))
    # every (group, vocab-token) cell participates via a full grid join:
    # groups × vocab is bounded (both model-sized), never corpus-sized
    grid = corpus.crossJoin(group_tot.select("__g", "__ng")).join(
        per_group, ["__g", "t"], "left"
    ).select(
        "__g", "t", "__ng", "__ct",
        F.coalesce("__cg", F.lit(0)).alias("__cg"),
    )
    p = (F.col("__cg") + F.lit(alpha)) / (
        F.col("__ng") + F.lit(alpha) * F.col("__v")
    )
    q = (F.col("__ct") + F.lit(alpha)) / (
        F.col("__n") + F.lit(alpha) * F.col("__v")
    )
    m = (p + q) / 2
    return (
        grid.crossJoin(F.broadcast(vocab))
        .select(
            "__g",
            "__ng",
            (p / 2 * F.log(p / m) + q / 2 * F.log(q / m)).alias("__js"),
        )
        .groupBy("__g")
        .agg(
            F.max("__ng").cast("long").alias("n_tokens"),
            F.round(F.sum("__js"), 6).alias("js"),
        )
        .withColumnRenamed("__g", group_col)
    )


def deterministic_shuffle(
    df: DataFrame,
    n_shards: int = 64,
    key_col: str = "doc_id",
    salt: str = "",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Globally-shuffled, shard-addressed training order: every row gets a
    ``(shard, pos)`` that is a pure function of ``(salt, key)`` — the
    epoch-stable shuffle a training job needs so that every reader,
    restart, and re-run walks examples in the same pseudo-random order
    without ever materializing a global sort.  Vary ``salt`` per epoch
    for a fresh order.

    Scale shape: the hash is row-local; rows shuffle once on ``shard``
    (pick ``n_shards`` ~ a few x executor count) and each shard sorts
    independently — there is no global ``orderBy``, whose range
    partitioning and skewed boundaries are the classic full-corpus-sort
    trap.  Downstream, write with ``partitionBy("shard")`` and readers
    consume shards in ``pos`` order.

    Existing ``shard``/``pos`` columns on the input (e.g. re-sharding a
    previous epoch's output under a new salt) are replaced, not
    duplicated.

    ``order_cols`` prefixes the within-shard order (hash order breaks the
    remaining ties) — pass a similarity-cluster id to group related
    documents adjacently in the training stream (in-context pretraining,
    Shi et al. 2023), or a quality band for curriculum schedules.  Shard
    membership stays pure hash, so the stream is still globally mixed.
    """
    from pyspark.sql import Window

    df = df.drop("shard", "pos")
    frac = hash_fraction(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    shard = F.least(
        F.floor(frac * n_shards).cast("int"), F.lit(n_shards - 1)
    ).alias("shard")
    order = [F.col(c) for c in (order_cols or [])] + [
        F.col("__frac"), F.col(key_col)
    ]
    w = Window.partitionBy("shard").orderBy(*order)
    return (
        df.select(shard, frac.alias("__frac"), *df.columns)
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .drop("__frac")
    )


def sample_to_token_budget(
    df: DataFrame,
    budget: int,
    size_col: str = "n_tokens",
    priority_col: str | Column | None = None,
    key_col: str = "doc_id",
    n_buckets: int = 256,
    levels: int = 2,
) -> DataFrame:
    """Greedy prefix under a budget: walk documents in priority order
    (highest first) and keep each one while the running ``size_col``
    total stays ≤ ``budget`` — the "take the best N tokens" step that
    turns a scored corpus into a right-sized training set.  Semantics
    are EXACTLY the SQL window ``sum(size) OVER (ORDER BY priority
    DESC, key) <= budget`` (ties break on ``key``), and the driver
    correctness gate holds this operator to that oracle — but the plan
    never runs that window: a global cumulative sum means a global
    range-partitioned sort, the classic full-corpus straggler.

    Scale shape (threshold refinement instead of a global sort):

    1. ``approxQuantile`` buckets the priority into ``n_buckets``
       quantile ranges (driver state: ``n_buckets`` doubles).
    2. One map-side-combinable aggregate sums ``size_col`` per bucket;
       the driver scans the ≤ ``n_buckets`` sums highest-first to find
       the BOUNDARY bucket where the cumulative total crosses the
       budget.  Everything strictly above it is kept by a row-local
       filter; everything below is dropped the same way.
    3. Recurse into the boundary bucket (``levels`` rounds, each a
       ~``n_buckets``× narrowing), then run the exact cumulative-sum
       window over ONLY the final boundary slice — ~``N / n_buckets^
       levels`` rows (at 100 TB with the defaults: tens of MB on one
       task), seeded with the tokens already committed above it.

    Every driver action is bounded by ``n_buckets`` rows — no corpus
    collect.  Degenerate priorities (one value carrying most of the
    mass) collapse the narrowing: heavy ties all land in one boundary
    bucket, and the final window pays the skew.  ``priority_col=None``
    uses :func:`hash_fraction` of the key — a uniform, tie-free random
    prefix (budget-capped deterministic subsampling).

    Returns the kept rows with original columns (priority/size helper
    columns dropped).
    """
    from pyspark.sql import Window

    prio = (
        hash_fraction(F.col(key_col))
        if priority_col is None
        else (
            F.col(priority_col)
            if isinstance(priority_col, str)
            else priority_col
        )
    )
    work = df.select(
        F.struct(*df.columns).alias("__row"),
        prio.cast("double").alias("__p"),
        F.col(size_col).cast("long").alias("__sz"),
        F.col(key_col).alias("__k"),
    ).persist()
    try:
        # [lo, hi] is the half-open priority interval still undecided;
        # None bound = unbounded.  committed = tokens already taken by
        # fully-kept buckets above hi.
        lo: float | None = None
        hi: float | None = None
        committed = 0
        for _ in range(max(1, levels)):
            sliced = work
            if hi is not None:
                sliced = sliced.filter(F.col("__p") <= hi)
            if lo is not None:
                sliced = sliced.filter(F.col("__p") > lo)
            probs = [i / n_buckets for i in range(1, n_buckets)]
            edges = sorted(
                set(sliced.approxQuantile("__p", probs, 0.001)),
                reverse=True,
            )
            if not edges:
                break  # empty or single-valued slice: stop narrowing
            # bucket j = count of (desc-sorted) edges >= __p: bucket 0
            # holds the highest priorities (__p > edges[0]), bucket
            # len(edges) the lowest (__p <= edges[-1]) — one array scan,
            # no O(n_buckets)-deep CASE chain
            arr = F.array(*[F.lit(e) for e in edges])
            bucket = F.size(F.filter(arr, lambda e: F.col("__p") <= e))
            sums = dict(
                sliced.groupBy(bucket.alias("__b"))
                .agg(F.sum("__sz").alias("s"))
                .collect()
            )
            acc = committed
            boundary = None
            for b in range(len(edges) + 1):
                s = sums.get(b, 0) or 0
                if acc + s > budget:
                    boundary = b
                    break
                acc += s
            if boundary is None:
                # entire slice fits: everything undecided is kept
                lo_edge = lo
                kept = work.filter(F.col("__p") > lo_edge) if lo_edge is not None else work
                return kept.select("__row.*")
            committed = acc
            hi = edges[boundary - 1] if boundary > 0 else hi
            lo = edges[boundary] if boundary < len(edges) else lo
            if hi is not None and lo is not None and hi <= lo:
                break

        # exact pass over the final boundary slice only
        sliced = work
        if hi is not None:
            sliced = sliced.filter(F.col("__p") <= hi)
        if lo is not None:
            sliced = sliced.filter(F.col("__p") > lo)
        w = Window.orderBy(F.col("__p").desc(), F.col("__k")).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        boundary_kept = (
            sliced.withColumn("__cum", F.sum("__sz").over(w))
            .filter(F.col("__cum") + committed <= budget)
            .select("__row.*")
        )
        above = (
            work.filter(F.col("__p") > hi).select("__row.*")
            if hi is not None
            else work.limit(0).select("__row.*")
        )
        return above.unionByName(boundary_kept)
    finally:
        work.unpersist()


def upsample_mixture(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    key_col: str = "doc_id",
    epoch_col: str = "epoch",
) -> DataFrame:
    """Mixture rates ABOVE 1: emit each row ``floor(rate)`` times (epoch
    copies ``0..floor(rate)-1``) plus one more with probability
    ``rate - floor(rate)`` — deterministic epoch repetition, the other
    half of the story :func:`mixture_rates` caps away (an oversubscribed
    stratum there degrades to rate 1 rather than upsampling; THIS is the
    operator that says "the model sees wikipedia 2.5 times").

    The fractional copy keeps by :func:`hash_fraction` of ``key:epoch``,
    so membership is a pure row-local function of the data — stable
    under repartitioning, oracle-reproducible, and each epoch's
    fractional subset is an independent hash draw.  Rates ≤ 0 drop the
    stratum; unlisted strata default to rate 1 (one epoch, always
    kept).  Output gains ``epoch_col``; compose with
    :func:`deterministic_shuffle` using the epoch in the salt so copies
    of a document land in different shards::

        shuffled = deterministic_shuffle(
            upsampled.withColumn("k", F.concat_ws(":", "doc_id", "epoch")),
            key_col="k",
        )

    Scale shape: one row-local ``explode`` of a ``ceil(rate)``-element
    sequence per row — output-proportional work, no shuffle, no state;
    rates ship as a plan literal like the other mixture operators.
    """
    rate = F.lit(1.0)
    for stratum, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == stratum, float(r)).otherwise(rate)
    n_epochs = F.when(
        rate > 0, F.sequence(F.lit(0), F.ceil(rate).cast("int") - 1)
    ).otherwise(F.array().cast("array<int>"))
    e = F.col(epoch_col)
    frac_keep = hash_fraction(
        F.concat(F.col(key_col).cast("string"), F.lit(":"), e.cast("string"))
    ) < (rate - F.floor(rate))
    return (
        df.withColumn(epoch_col, F.explode(n_epochs))
        .filter((e < F.floor(rate)) | frac_keep)
    )


def sample_to_token_budgets_by_group(
    df: DataFrame,
    budgets: dict[str, int],
    group_col: str = "lang",
    size_col: str = "n_tokens",
    priority_col: str | Column | None = None,
    key_col: str = "doc_id",
    default_budget: int = 0,
) -> DataFrame:
    """Per-group greedy prefixes under per-group token budgets — the
    mixture-sizing step a multilingual curriculum actually runs ("2B
    tokens of the best English, 500M of the best Russian, ..."), the
    grouped sibling of :func:`sample_to_token_budget`.  Semantics:
    ``sum(size) OVER (PARTITION BY group ORDER BY priority DESC, key)
    <= budgets[group]`` — ties break on ``key``; groups absent from
    ``budgets`` get ``default_budget`` (0 = dropped entirely).

    Scale shape: unlike the single-budget variant, the defining window
    here PARTITIONS BY GROUP, so there is no global sort to dodge —
    each group's cumulative sum sorts only its own partition slice,
    and the budgets map ships as a plan literal (no join).  The caveat
    is inherent: ONE group carrying most of the corpus degrades to the
    single-budget problem — route that group through
    :func:`sample_to_token_budget`'s threshold refinement and union.

    ``priority_col=None`` uses :func:`hash_fraction` of the key — a
    uniform, tie-free random prefix per group.
    """
    from pyspark.sql import Window

    prio = (
        hash_fraction(F.col(key_col))
        if priority_col is None
        else (
            F.col(priority_col)
            if isinstance(priority_col, str)
            else priority_col
        )
    )
    bmap = F.create_map(
        *[F.lit(x) for kv in budgets.items() for x in kv]
    )
    budget = F.coalesce(
        bmap[F.col(group_col)], F.lit(int(default_budget))
    ).cast("long")
    w = (
        Window.partitionBy(group_col)
        .orderBy(prio.cast("double").desc(), F.col(key_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn(
            "__cum", F.sum(F.col(size_col).cast("long")).over(w)
        )
        .filter(F.col("__cum") <= budget)
        .drop("__cum")
    )
