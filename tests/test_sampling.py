"""Deterministic sampling operators: reproducibility, stratification
semantics, mixture-rate math, plan shapes."""

import hashlib

import pyspark.sql.functions as F
import pytest

from text_extensions_for_pandas_spark.operators.sampling import (
    hash_fraction,
    importance_sample,
    mixture_rates,
    sample_mixture,
    stratified_sample,
)


def _frac(key) -> float:
    return int(hashlib.md5(str(key).encode()).hexdigest()[:8], 16) / 2**32


def test_hash_fraction_matches_python_md5(spark, docs):
    rows = docs.select(
        "doc_id", hash_fraction(F.col("doc_id")).alias("f")
    ).limit(50).collect()
    for r in rows:
        assert r.f == pytest.approx(_frac(r.doc_id), abs=0)
        assert 0.0 <= r.f < 1.0


def test_stratified_sample_membership_and_stability(spark, docs):
    rates = {"en": 0.5, "de": 0.25}
    kept = stratified_sample(docs, "lang", rates, default_rate=0.1)
    got = {r.doc_id for r in kept.select("doc_id").collect()}
    want = {
        r.doc_id
        for r in docs.select("doc_id", "lang").collect()
        if _frac(r.doc_id) < rates.get(r.lang, 0.1)
    }
    assert got == want
    # repartitioning must not change membership (the df.sample failure mode)
    re_got = {
        r.doc_id
        for r in stratified_sample(
            docs.repartition(7, "lang"), "lang", rates, default_rate=0.1
        ).select("doc_id").collect()
    }
    assert re_got == got


def test_importance_sample_weight_semantics(spark):
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate([0.0, -1.0, 0.5, 1.0, 2.0] * 40)],
        "doc_id long, w double",
    )
    kept = {r.doc_id for r in importance_sample(df, "w").collect()}
    for r in df.collect():
        clamped = min(1.0, max(0.0, r.w))
        assert (r.doc_id in kept) == (_frac(r.doc_id) < clamped)
    # weight >= 1 always keeps; weight <= 0 never keeps
    assert all(r.doc_id in kept for r in df.collect() if r.w >= 1.0)
    assert all(r.doc_id not in kept for r in df.collect() if r.w <= 0.0)


def test_mixture_rates_hit_targets(spark, docs):
    targets = {"en": 0.6, "de": 0.3, "fr": 0.1}
    budget = 50_000.0
    rates = {
        r.lang: r
        for r in mixture_rates(
            docs, "lang", targets, F.col("n_chars").cast("double"), budget
        ).collect()
    }
    sizes = {
        r.lang: r.s
        for r in docs.groupBy("lang").agg(F.sum("n_chars").alias("s")).collect()
    }
    for lang, t in targets.items():
        assert rates[lang].rate == pytest.approx(
            min(1.0, budget * t / sizes[lang])
        )
    # unlisted strata rate 0
    for lang in set(sizes) - set(targets):
        assert rates[lang].rate == 0.0
    # the expected sampled mass approximates the target mix (rate * size)
    for lang, t in targets.items():
        expect = rates[lang].rate * sizes[lang]
        assert expect == pytest.approx(min(budget * t, sizes[lang]))


def test_sample_mixture_plan_is_broadcast_no_corpus_shuffle(spark, docs):
    import contextlib
    import io

    plan_df = sample_mixture(
        docs, "lang", {"en": 0.5, "de": 0.5}, F.col("n_chars").cast("double"),
        budget=10_000.0,
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        plan_df.explain("simple")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_sampling_monotone_in_rate(spark, docs):
    """Raising a stratum's rate only ADDS members (hash threshold
    semantics) — the property that lets a pipeline cheaply produce nested
    corpus subsets (1% ⊂ 10% ⊂ 100%) for scaling-law runs."""
    kept = {}
    for rate in (0.1, 0.3, 0.7):
        kept[rate] = {
            r.doc_id
            for r in stratified_sample(
                docs, "lang", {}, default_rate=rate
            ).select("doc_id").collect()
        }
    assert kept[0.1] <= kept[0.3] <= kept[0.7]
    assert len(kept[0.1]) < len(kept[0.7])


def test_dsir_weights_prefer_target_like_documents(spark):
    """Documents written in the target slice's vocabulary must score
    higher log-weights than documents from a disjoint vocabulary."""
    from text_extensions_for_pandas_spark.operators.sampling import (
        dsir_log_weights,
    )

    target_like = [(i, "alpha beta gamma delta " * 5) for i in range(10)]
    other = [(i + 10, "zeta eta theta iota " * 5) for i in range(10)]
    raw = spark.createDataFrame(target_like + other, ["doc_id", "text"])
    target = spark.createDataFrame(target_like, ["doc_id", "text"])
    got = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_log_weights(raw, target, n_buckets=1000).collect()
    }
    assert len(got) == 20
    lo = max(got[i] for i in range(10, 20))
    hi = min(got[i] for i in range(10))
    assert hi > lo, (hi, lo)
    # identical texts get identical weights (pure function of content)
    assert len({got[i] for i in range(10)}) == 1
    assert len({got[i] for i in range(10, 20)}) == 1


def test_cap_per_domain_invariants(spark):
    """Doc caps, token budgets, nesting (cap 5 ⊆ cap 10), and the
    one-oversized-doc rule."""
    from text_extensions_for_pandas_spark.operators.sampling import (
        cap_per_domain,
    )

    rows = [(i, f"s{i % 3}", 100) for i in range(60)]
    rows.append((1000, "big", 10_000))  # oversized single doc
    docs = spark.createDataFrame(rows, ["doc_id", "source", "n_chars"])

    capped5 = cap_per_domain(docs, max_docs=5)
    by_src = {
        r["source"]: r["n"]
        for r in capped5.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert by_src == {"s0": 5, "s1": 5, "s2": 5, "big": 1}

    # nesting: the 5-cap set is a subset of the 10-cap set per domain
    k5 = {r.doc_id for r in capped5.collect()}
    k10 = {r.doc_id for r in cap_per_domain(docs, max_docs=10).collect()}
    assert k5 <= k10

    # token budget: kept chars minus the last kept doc stay under budget,
    # and the oversized doc is still kept (budget not exhausted before it)
    kb = cap_per_domain(docs, max_tokens=350)
    got = {
        r["source"]: (r["n"], r["chars"])
        for r in kb.groupBy("source")
        .agg(F.count("*").alias("n"), F.sum("n_chars").alias("chars"))
        .collect()
    }
    assert got["big"] == (1, 10_000)
    for s in ("s0", "s1", "s2"):
        n, chars = got[s]
        assert n == 4 and chars == 400  # 3*100 < 350 ≤ 4*100, keep 4th

    # determinism: repartitioned input keeps the identical set
    k5b = {
        r.doc_id
        for r in cap_per_domain(docs.repartition(13), max_docs=5).collect()
    }
    assert k5b == k5


def test_cap_per_domain_prefilter_matches_bruteforce_on_mega_domain(spark):
    """The hash-threshold pre-filter must be bit-identical to the plain
    exact window on adversarial shapes: a mega-domain with a tiny cap
    (threshold far below 1), a domain whose budget exceeds its total
    (every row kept), zero-token rows under a token budget, and a
    single-row domain."""
    from pyspark.sql import Window

    from text_extensions_for_pandas_spark.operators.sampling import (
        cap_per_domain,
        hash_fraction,
    )

    rows = (
        [(i, "mega", (i * 37) % 200) for i in range(5000)]
        + [(100_000 + i, "tiny", 0) for i in range(6)]  # zero-token rows
        + [(200_000, "single", 50)]
        + [(300_000 + i, "small", 10) for i in range(3)]  # tot < budget
    )
    docs = spark.createDataFrame(rows, ["doc_id", "source", "n_chars"])

    def brute(max_docs=None, max_tokens=None):
        out = docs.withColumn("__frac", hash_fraction(F.col("doc_id")))
        w = Window.partitionBy("source").orderBy("__frac", "doc_id")
        cond = F.lit(True)
        if max_docs is not None:
            cond = cond & (F.row_number().over(w) <= max_docs)
        if max_tokens is not None:
            prefix = F.coalesce(
                F.sum("n_chars").over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            )
            cond = cond & (prefix < max_tokens)
        return {
            r.doc_id
            for r in out.withColumn("__keep", cond)
            .filter("__keep")
            .collect()
        }

    for kwargs in (
        {"max_docs": 7},
        {"max_tokens": 900},
        {"max_docs": 25, "max_tokens": 900},
        {"max_docs": 1},
    ):
        got = {r.doc_id for r in cap_per_domain(docs, **kwargs).collect()}
        assert got == brute(**kwargs), kwargs
    # doc-only cap must not require the token column at all
    got = {
        r.doc_id
        for r in cap_per_domain(
            docs.drop("n_chars"), max_docs=7
        ).collect()
    }
    assert got == brute(max_docs=7)


def test_cluster_balanced_sample_invariants(spark):
    """Diversity sampling: per-cluster counts never exceed the cap, every
    non-empty cluster stays represented, the kept set nests across cap
    sizes and is repartition-stable."""
    import numpy as np

    from text_extensions_for_pandas_spark.operators.sampling import (
        cluster_balanced_sample,
    )

    rng = np.random.RandomState(7)
    # three planted modes with very different populations (60/25/5)
    centers = np.array([[10.0, 0.0], [0.0, 10.0], [-10.0, -10.0]])
    rows = []
    for i, n in enumerate([60, 25, 5]):
        pts = centers[i] + rng.randn(n, 2) * 0.1
        rows += [
            (len(rows) + j, [float(x) for x in p]) for j, p in enumerate(pts)
        ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centers)],
        "centroid_id long, embedding array<double>",
    )

    kept10 = cluster_balanced_sample(emb, cents, per_cluster=10)
    by_cluster = {
        r.cluster_id: r.n
        for r in kept10.groupBy("cluster_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    # over-represented modes capped, small mode fully kept
    assert by_cluster == {0: 10, 1: 10, 2: 5}

    k10 = {r.vec_id for r in kept10.collect()}
    k20 = {
        r.vec_id
        for r in cluster_balanced_sample(emb, cents, per_cluster=20).collect()
    }
    assert k10 <= k20  # nesting
    k10b = {
        r.vec_id
        for r in cluster_balanced_sample(
            emb.repartition(7), cents, per_cluster=10
        ).collect()
    }
    assert k10b == k10  # determinism


def test_unigram_divergence_identity_and_separation(spark):
    from text_extensions_for_pandas_spark.operators.sampling import (
        unigram_divergence,
    )

    a = spark.createDataFrame(
        [(1, i, w) for i, w in enumerate("the cat sat on the mat".split())],
        ["doc_id", "token_idx", "token"],
    )
    b = spark.createDataFrame(
        [(2, i, w) for i, w in enumerate("quantum flux capacitors hum loudly".split())],
        ["doc_id", "token_idx", "token"],
    )
    same = unigram_divergence(a, a).collect()[0]
    assert same["kl_ab"] == 0.0 and same["kl_ba"] == 0.0 and same["js"] == 0.0
    diff = unigram_divergence(a, b).collect()[0]
    assert diff["js"] > 0.1 and diff["kl_ab"] > 0 and diff["kl_ba"] > 0
    # JS is symmetric and bounded by ln 2
    rev = unigram_divergence(b, a).collect()[0]
    assert rev["js"] == diff["js"]
    assert diff["js"] <= 0.6931472


def test_source_divergence_ranks_the_outlier(spark):
    from text_extensions_for_pandas_spark.operators.sampling import (
        source_divergence,
    )

    # two sources speak the corpus language; the third is an off-vocab spam
    # flood and must rank highest-JS
    docs = []
    toks = []
    did = 0
    for src, text in [
        ("s1", "alpha beta gamma delta alpha beta"),
        ("s2", "alpha gamma beta delta beta alpha"),
        ("spam", "buy pills buy pills buy pills"),
    ]:
        for _ in range(3):
            docs.append((did, src))
            for i, w in enumerate(text.split()):
                toks.append((did, i, w))
            did += 1
    docs_df = spark.createDataFrame(docs, ["doc_id", "source"])
    toks_df = spark.createDataFrame(toks, ["doc_id", "token_idx", "token"])
    out = {r["source"]: r for r in source_divergence(toks_df, docs_df).collect()}
    assert set(out) == {"s1", "s2", "spam"}
    assert out["spam"]["js"] > out["s1"]["js"]
    assert out["spam"]["js"] > out["s2"]["js"]
    assert out["s1"]["n_tokens"] == 18


def test_deterministic_shuffle_invariants(spark):
    from text_extensions_for_pandas_spark.operators.sampling import (
        deterministic_shuffle,
    )

    df = spark.range(200).withColumnRenamed("id", "doc_id")
    out = deterministic_shuffle(df, n_shards=8, salt="e1")
    rows = out.collect()
    assert len(rows) == 200
    assert all(0 <= r["shard"] < 8 for r in rows)
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    # pos is contiguous 1..n within every shard
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # stable under repartitioning (a pure function of the data)
    again = deterministic_shuffle(df.repartition(13), n_shards=8, salt="e1")
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again.collect()))
    # a different salt produces a genuinely different order
    other = deterministic_shuffle(df, n_shards=8, salt="e2")
    a = {r["doc_id"]: (r["shard"], r["pos"]) for r in rows}
    b = {r["doc_id"]: (r["shard"], r["pos"]) for r in other.collect()}
    assert a != b
    # ...and the shuffle is not the identity order
    first_shard = [r for r in rows if r["shard"] == 0]
    ids_in_pos_order = [r["doc_id"] for r in sorted(first_shard, key=lambda r: r["pos"])]
    assert ids_in_pos_order != sorted(ids_in_pos_order)


def test_alpha_mixture_rates_temperature_semantics(spark):
    from text_extensions_for_pandas_spark.operators.sampling import (
        alpha_mixture_rates,
    )

    df = spark.createDataFrame(
        [("big", 9000), ("mid", 900), ("small", 100)], ["lang", "n"]
    )

    def ps(alpha):
        return {
            r["lang"]: r["p"]
            for r in alpha_mixture_rates(df, "lang", "n", alpha=alpha).collect()
        }

    uniform = ps(0.0)
    assert all(abs(v - 1 / 3) < 1e-6 for v in uniform.values())
    prop = ps(1.0)
    assert abs(prop["big"] - 0.9) < 1e-6 and abs(prop["small"] - 0.01) < 1e-6
    # 0 < alpha < 1 sits between: low-resource upweighted vs its raw share,
    # high-resource downweighted
    mid = ps(0.3)
    assert prop["small"] < mid["small"] < uniform["small"]
    assert uniform["big"] < mid["big"] < prop["big"]
    # budget: rates cap at 1 and keep-probability math holds
    rates = {
        r["lang"]: r["rate"]
        for r in alpha_mixture_rates(df, "lang", "n", alpha=0.3, budget=2000).collect()
    }
    assert all(0 < v <= 1 for v in rates.values())
    assert rates["small"] == 1.0  # 2000 * p_small > 100 chars of mass
    assert rates["big"] < 1.0


def test_deterministic_shuffle_order_cols_groups_clusters(spark):
    from text_extensions_for_pandas_spark.operators.sampling import (
        deterministic_shuffle,
    )

    rows = [(i, i % 3) for i in range(60)]
    df = spark.createDataFrame(rows, ["doc_id", "cluster_id"])
    out = deterministic_shuffle(
        df, n_shards=2, salt="s", order_cols=["cluster_id"]
    ).collect()
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    for rs in by_shard.values():
        ordered = sorted(rs, key=lambda r: r["pos"])
        clusters = [r["cluster_id"] for r in ordered]
        # within a shard, cluster members are contiguous (non-decreasing)
        assert clusters == sorted(clusters)
    # shard membership identical to the plain shuffle: ordering is the
    # only thing order_cols changes
    plain = deterministic_shuffle(df, n_shards=2, salt="s")
    a = {r["doc_id"]: r["shard"] for r in out}
    b = {r["doc_id"]: r["shard"] for r in plain.collect()}
    assert a == b


def test_sample_to_token_budget_matches_window_oracle(spark):
    """The operator's contract IS the global cumulative-sum window
    (sum(size) OVER (ORDER BY priority DESC, key) <= budget); the
    threshold-refinement plan must reproduce it row-for-row — including
    priority ties resolved by key — without ever running it."""
    from pyspark.sql import Window

    from text_extensions_for_pandas_spark.operators.sampling import (
        sample_to_token_budget,
    )

    df = (
        spark.range(500)
        .select(
            F.col("id").alias("doc_id"),
            (F.col("id") * 37 % 100 + 5).alias("n_tokens"),
            # heavy ties: only 13 distinct priorities over 500 docs
            ((F.col("id") * 7 % 13) / 13.0).alias("quality"),
        )
    )
    w = Window.orderBy(F.col("quality").desc(), F.col("doc_id")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    for budget in (0, 1, 5_000, 13_000, 100_000_000):
        got = sorted(
            r[0]
            for r in sample_to_token_budget(
                df, budget, size_col="n_tokens", priority_col="quality"
            )
            .select("doc_id")
            .collect()
        )
        want = sorted(
            r[0]
            for r in df.withColumn("c", F.sum("n_tokens").over(w))
            .filter(F.col("c") <= budget)
            .select("doc_id")
            .collect()
        )
        assert got == want, f"budget={budget}: {len(got)} vs {len(want)}"


def test_sample_to_token_budget_schema_and_hash_priority(spark):
    from text_extensions_for_pandas_spark.operators.sampling import (
        sample_to_token_budget,
    )

    df = spark.range(200).select(
        F.col("id").alias("doc_id"), F.lit(10).alias("n_tokens")
    )
    out = sample_to_token_budget(df, 500)  # hash priority, 50 docs fit
    assert out.columns == ["doc_id", "n_tokens"]
    rows = out.collect()
    assert len(rows) == 50
    # deterministic: same call, same kept set
    again = sample_to_token_budget(df, 500)
    assert sorted(r["doc_id"] for r in rows) == sorted(
        r["doc_id"] for r in again.collect()
    )


def test_sample_to_token_budget_no_global_sort_of_corpus(spark):
    """The exact window may only ever see the boundary slice: the plan's
    Sort+Window must sit under filters, and the kept 'above' arm must be
    window-free.  Cheap structural check: the unioned plan contains
    exactly one Window, and the full-corpus arm none."""
    from text_extensions_for_pandas_spark.operators.sampling import (
        sample_to_token_budget,
    )

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 97 + 1).alias("n_tokens"),
        (F.col("id") % 89 / 89.0).alias("q"),
    )
    out = sample_to_token_budget(df, 5000, priority_col="q")
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Window") == 1


def test_upsample_mixture_epoch_semantics(spark):
    """rate 2.5 -> two full epochs + a ~50% hash-kept third; rate 1 ->
    exactly one epoch; rate 0.4 -> a ~40% single epoch; rate 0 / -1 ->
    dropped; unlisted strata default to one epoch.  Deterministic:
    identical calls keep identical (doc, epoch) sets."""
    from text_extensions_for_pandas_spark.operators.sampling import (
        upsample_mixture,
    )

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 5).cast("string").alias("src"),
    )
    rates = {"0": 2.5, "1": 1.0, "2": 0.4, "3": 0.0}
    out = upsample_mixture(df, "src", rates).cache()
    per = {
        r["src"]: (r["n"], r["max_e"], r["min_e"])
        for r in out.groupBy("src")
        .agg(
            F.count("*").alias("n"),
            F.max("epoch").alias("max_e"),
            F.min("epoch").alias("min_e"),
        )
        .collect()
    }
    # stratum 0: 200 docs x 2 full epochs + fractional third
    n0, max_e0, min_e0 = per["0"]
    assert min_e0 == 0 and max_e0 == 2
    assert 400 < n0 < 600  # 400 + a ~half-kept fractional epoch
    # full epochs are complete; the fractional one is a strict subset
    full = out.filter((F.col("src") == "0") & (F.col("epoch") < 2)).count()
    frac = out.filter((F.col("src") == "0") & (F.col("epoch") == 2)).count()
    assert full == 400 and 0 < frac < 200
    assert per["1"] == (200, 0, 0)
    n2, max_e2, _ = per["2"]
    assert max_e2 == 0 and 50 < n2 < 110
    assert "3" not in per
    assert per["4"] == (200, 0, 0)  # unlisted -> default rate 1

    again = upsample_mixture(df, "src", rates)
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, again.collect())
    )
    out.unpersist()


def test_sample_to_token_budgets_by_group(spark):
    """Per-group greedy prefixes: each group independently keeps its
    highest-priority docs while its own budget lasts; unlisted groups
    default to budget 0 and vanish; ties break on the key."""
    import pyspark.sql.functions as F

    from text_extensions_for_pandas_spark.operators.sampling import (
        sample_to_token_budgets_by_group,
    )

    rows = [
        # (doc_id, lang, n_tokens, priority)
        (1, "en", 50, 0.9),
        (2, "en", 60, 0.8),
        (3, "en", 40, 0.7),   # over budget after 1+2 -> dropped
        (4, "ru", 80, 0.9),
        (5, "ru", 30, 0.5),   # 80+30=110 <= 120 -> kept
        (6, "de", 10, 0.9),   # 'de' unlisted -> dropped
        (7, "vi", 25, 0.4),   # tie with 8 on priority: lower id first
        (8, "vi", 25, 0.4),   # 25+25=50 > 40 -> dropped
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, n_tokens long, priority double"
    )
    kept = sorted(
        r["doc_id"]
        for r in sample_to_token_budgets_by_group(
            df,
            {"en": 110, "ru": 120, "vi": 40},
            group_col="lang",
            priority_col="priority",
        ).collect()
    )
    assert kept == [1, 2, 4, 5, 7]
    # the plan partitions by the group - no global ordering exchange
    plan = (
        sample_to_token_budgets_by_group(
            df, {"en": 110}, group_col="lang", priority_col="priority"
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "rangepartitioning" not in plan.lower()
