"""Mergeable cardinality sketches for corpus statistics at scale.

At 100 TB, ``countDistinct`` over a high-cardinality column (tokens, URLs,
user ids) forces a full shuffle of every distinct value.  The scale path is
a mergeable sketch: each partition aggregates its values into a fixed-size
HyperLogLog state (map-side, a few KB), and only sketches move in the
shuffle.  Crucially the sketches are REUSABLE: persist per-shard/per-source
sketches once, then answer any coarser rollup ("distinct tokens per lang",
"per source", "whole corpus") by merging the stored sketches — no second
scan of the corpus.

Built on Spark's Apache DataSketches HLL functions (``hll_sketch_agg`` /
``hll_union_agg`` / ``hll_sketch_estimate``, JVM-side, available since
Spark 3.5).  Estimates are deterministic for a given input multiset — no
randomness — so merge identities can be asserted exactly in tests.

This family is beyond the reference's surface (its pandas core computes
exact ``nunique`` in memory); it exists for the LLM-pipeline north star.
The exact tier for small/medium data remains ``countDistinct`` /
``operators/search.vocabulary``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_LG_K = 12  # 2^12 registers ~= 1.6% relative standard error, 4 KB


def hll_sketches(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lg_k: int = DEFAULT_LG_K,
) -> DataFrame:
    """Per-group HLL sketches of ``value_col``'s distinct values.

    Output: ``group_cols + (sketch BINARY, estimate BIGINT)``.  One
    hash-aggregate with map-side partial sketches — shuffle volume is
    ``groups x 4KB`` regardless of input size.  Persist this frame to make
    every coarser distinct-count rollup scan-free.
    """
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("sketch")
    ).withColumn(
        "estimate", F.hll_sketch_estimate("sketch").cast("bigint")
    )


def hll_rollup(
    sketches: DataFrame,
    group_cols: list[str],
    allow_different_lg_k: bool = False,
) -> DataFrame:
    """Merge stored sketches up to a coarser grouping (possibly empty =
    whole corpus).  Output: ``group_cols + (sketch, estimate)``.

    Merging is the whole point of the sketch tier: distinct counts are not
    additive, but sketches union losslessly — the rollup touches only the
    sketch frame, never the corpus.
    """
    if group_cols:
        merged = sketches.groupBy(*group_cols)
    else:
        merged = sketches.groupBy()
    return merged.agg(
        F.hll_union_agg("sketch", F.lit(allow_different_lg_k)).alias("sketch")
    ).withColumn(
        "estimate", F.hll_sketch_estimate("sketch").cast("bigint")
    )


def distinct_rollup(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    exact: bool = True,
    lg_k: int = DEFAULT_LG_K,
) -> DataFrame:
    """Distinct ``value_col`` count per group, with an explicit tier switch.

    ``exact=True`` — ``countDistinct``: right when the distinct set per
    group fits a shuffle (small corpora, low-cardinality values).
    ``exact=False`` — HLL sketch estimate: right at corpus scale, where
    shuffling every distinct token is the bottleneck; ~1.6% relative error
    at the default ``lg_k``.

    Both tiers return the same schema (``group_cols + n_distinct``) so
    callers can switch on data volume without plan changes.
    """
    if exact:
        return df.groupBy(*group_cols).agg(
            F.countDistinct(value_col).alias("n_distinct")
        )
    return (
        hll_sketches(df, group_cols, value_col, lg_k)
        .select(*group_cols, F.col("estimate").alias("n_distinct"))
    )


# ---------------------------------------------------------------------------
# Count-min sketch: mergeable point-frequency estimates
# ---------------------------------------------------------------------------

def _cms_bucket(value_col, row: int, w: int):
    """Deterministic bucket for hash row ``row``: first 8 hex chars of
    md5("row:value") mod ``w`` — engine-independent (DuckDB computes the
    identical integer), so sketches and estimates are oracle-exact."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{row}:"), F.col(value_col))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % w
    )


def cms_sketch(
    df: DataFrame,
    value_col: str,
    d: int = 4,
    w: int = 1024,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan '05) of ``value_col``'s
    frequencies: ``d`` hash rows x ``w`` buckets, each cell the total
    weight of values hashing there.  Output: ``(row, bucket, cnt)`` —
    at most ``d*w`` rows, the whole sketch.

    The scale contract mirrors the HLL tier: frequencies are not
    distinct-counts, so a 100 TB corpus's token-frequency table is
    vocabulary-sized — large.  The sketch caps the aggregation state at
    ``d*w`` cells with map-side partials (shuffle volume independent of
    cardinality), overestimates only (never under), and MERGES: sketches
    of two shards add cell-wise (:func:`cms_merge`), so per-shard sketches
    persist once and any union is answerable without rescanning.

    NULL values are EXCLUDED from the sketch (the same convention as
    ``count(col)``/``countDistinct``): they would otherwise hash to a NULL
    bucket that silently drops from totals while never matching an
    estimate probe.  :func:`cms_estimate` filters NULL items identically.
    """
    weight = F.col(weight_col) if weight_col else F.lit(1)
    df = df.filter(F.col(value_col).isNotNull())
    # ONE corpus scan: each value explodes to its d (row, bucket) cells
    # inline (a union of d scans would read the corpus d times)
    cells = F.array(
        *[
            F.struct(
                F.lit(r).alias("row"),
                _cms_bucket(value_col, r, w).alias("bucket"),
            )
            for r in range(d)
        ]
    )
    return (
        df.select(F.explode(cells).alias("e"), weight.alias("__w"))
        .select("e.row", "e.bucket", "__w")
        .groupBy("row", "bucket")
        .agg(F.sum("__w").cast("long").alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge count-min sketches built with the same (d, w): cell-wise sum.
    The mergeability that makes per-shard sketches a persistent artifact."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "bucket").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    d: int = 4,
    w: int = 1024,
) -> DataFrame:
    """Point-frequency estimates for ``items``: per item, the MIN over the
    ``d`` hash rows of its bucket's cell — the count-min guarantee
    (estimate >= true count; error bounded by total_weight * e/w with
    probability 1 - e^-d).

    Plan: items replicate to ``d`` (row, bucket) probes and equijoin the
    broadcast sketch (at most ``d*w`` rows); the min is a map-side-partial
    aggregate.  No corpus access — estimates come entirely from the
    persisted sketch.  NULL items are excluded, matching
    :func:`cms_sketch`'s NULL convention.
    """
    items = items.filter(F.col(item_col).isNotNull())
    probes = [
        items.select(
            F.col(item_col).alias("item"),
            F.lit(r).alias("row"),
            _cms_bucket(item_col, r, w).alias("bucket"),
        )
        for r in range(d)
    ]
    out = probes[0]
    for p in probes[1:]:
        out = out.unionByName(p)
    return (
        out.join(F.broadcast(sketch), ["row", "bucket"])
        .groupBy("item")
        .agg(F.min("cnt").cast("long").alias("est"))
    )
