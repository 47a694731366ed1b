"""Tensor / embedding column functions — the Spark mapping of the
reference's ``TensorArray`` (``array/tensor.py:282-316``): a 1-D tensor per
row is an ``ARRAY<FLOAT>`` column; higher rank nests arrays.

Covers the reference surface:

* elementwise arithmetic & ufuncs (``array/tensor.py:208-248,640-667``)
  → ``zip_with`` / ``transform`` — JVM-side, codegen-friendly;
* reductions along axis 0 (``array/tensor.py:618-630``)
  → per-dimension aggregation after ``posexplode`` (cross-engine exact via
  DECIMAL sums) or sequential folds per row;
* NA = all-NaN row (``array/tensor.py:348-363``) → ``forall isnan``.

Determinism: per-row folds are sequential left folds in array order
(bit-identical to DuckDB's ``list_sum`` over the same doubles); cross-row
sums go through DECIMAL(38,18).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _c(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


# -- elementwise (tensor ⊕ tensor, tensor ⊕ scalar) -------------------------

def elementwise(a: Column | str, b: Column | str, op: str = "+") -> Column:
    """Elementwise arithmetic between two equal-shape tensor columns."""
    ops = {
        "+": lambda x, y: x + y,
        "-": lambda x, y: x - y,
        "*": lambda x, y: x * y,
        "/": lambda x, y: x / y,
    }
    return F.zip_with(_c(a), _c(b), ops[op])


def scale(a: Column | str, factor: Column | float, offset: Column | float = 0.0) -> Column:
    """``a * factor + offset`` elementwise (scalar broadcast)."""
    return F.transform(_c(a), lambda x: x * factor + offset)


def tensor_isna(a: Column | str) -> Column:
    """NA tensor = all-NaN row (reference ``array/tensor.py:348-363``)."""
    return F.forall(_c(a), F.isnan)


# -- arbitrary-rank elementwise surface --------------------------------------
#
# The reference's ``__array_ufunc__`` (``array/tensor.py:640-667``) applies
# numpy ufuncs to tensors of ANY rank.  Spark's mapping nests arrays, and
# column expressions are built before any schema is known, so the rank is
# an explicit parameter: the expression recurses ``zip_with``/``transform``
# down to the scalar leaves.  Rank 1 degenerates to the functions above.

def elementwise_nd(
    a: Column | str, b: Column | str, op: str = "+", rank: int = 1
) -> Column:
    """Elementwise arithmetic between two equal-shape tensors of rank
    ``rank`` (1 = ``ARRAY<number>``, 2 = ``ARRAY<ARRAY<number>>``, ...)."""
    ops = {
        "+": lambda x, y: x + y,
        "-": lambda x, y: x - y,
        "*": lambda x, y: x * y,
        "/": lambda x, y: x / y,
    }
    leaf = ops[op]

    def rec(x: Column, y: Column, r: int) -> Column:
        if r <= 1:
            return F.zip_with(x, y, leaf)
        return F.zip_with(x, y, lambda xa, ya: rec(xa, ya, r - 1))

    return rec(_c(a), _c(b), rank)


def scale_nd(
    a: Column | str,
    factor: Column | float,
    offset: Column | float = 0.0,
    rank: int = 1,
) -> Column:
    """``a * factor + offset`` elementwise at any rank (scalar broadcast,
    the reference's tensor-scalar ufunc path)."""

    def rec(x: Column, r: int) -> Column:
        if r <= 1:
            return F.transform(x, lambda v: v * factor + offset)
        return F.transform(x, lambda xa: rec(xa, r - 1))

    return rec(_c(a), rank)


def apply_ufunc_nd(a: Column | str, fn, rank: int = 1) -> Column:
    """Apply a scalar Column function (``F.exp``, ``F.abs``, a lambda…)
    to every leaf element of a rank-``rank`` tensor — the generic unary
    ufunc surface."""

    def rec(x: Column, r: int) -> Column:
        if r <= 1:
            return F.transform(x, fn)
        return F.transform(x, lambda xa: rec(xa, r - 1))

    return rec(_c(a), rank)


def flatten_nd(a: Column | str, rank: int = 1) -> Column:
    """Flatten a rank-``rank`` tensor to its rank-1 leaf sequence
    (row-major, numpy ``ravel``), enabling any rank-1 reduction above
    (``vsum``/``vmean``/``l2_norm``/``argmax``) on higher-rank tensors."""
    out = _c(a)
    for _ in range(max(0, rank - 1)):
        out = F.flatten(out)
    return out


def tensor_isna_nd(a: Column | str, rank: int = 1) -> Column:
    """NA tensor = all leaves NaN, at any rank (reference
    ``array/tensor.py:348-363`` generalized)."""
    return F.forall(flatten_nd(a, rank), F.isnan)


# -- per-row reductions (axis 1) --------------------------------------------

def vsum(a: Column | str) -> Column:
    """Sequential-fold sum of one row's elements (double)."""
    return F.aggregate(_c(a), F.lit(0.0), lambda acc, x: acc + x.cast("double"))


def vmean(a: Column | str) -> Column:
    return vsum(a) / F.size(_c(a))


def vmax(a: Column | str) -> Column:
    return F.array_max(_c(a))


def vmin(a: Column | str) -> Column:
    return F.array_min(_c(a))


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            _c(a), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def argmax(a: Column | str) -> Column:
    """Index of the row maximum, first-wins on ties (numpy semantics,
    reference ``array/tensor.py:618-630``)."""
    arr = _c(a)
    best = F.array_max(
        F.zip_with(
            arr,
            F.sequence(F.lit(0), F.size(arr) - 1),
            lambda v, i: F.struct(v.alias("v"), (-i).alias("ni")),
        )
    )
    return (-best["ni"]).cast("int")


def softmax(a: Column | str) -> Column:
    """Numerically-stable per-row softmax (max-shifted), all JVM-side."""
    arr = _c(a)
    mx = F.array_max(arr)
    exps = F.transform(arr, lambda x: F.exp(x.cast("double") - mx))
    z = F.aggregate(exps, F.lit(0.0), lambda acc, x: acc + x)
    return F.transform(exps, lambda e: e / z)


# -- cross-row reductions (axis 0) ------------------------------------------

def reduce_rows(
    df: DataFrame,
    vec_col: str = "embedding",
    group_cols: list[str] | None = None,
    stat: str = "mean",
) -> DataFrame:
    """Per-dimension reduction across rows (the reference's axis-0
    ``sum/mean/min/max``): explode to (group, dim, value) and aggregate.

    Sums/means run through DECIMAL(38,18) so results are independent of
    aggregation order (exact — matches any engine).  Output:
    ``(group_cols..., dim, value)``.
    """
    group_cols = group_cols or []
    exploded = df.select(
        *group_cols, F.posexplode(F.col(vec_col)).alias("dim", "__v")
    )
    # float -> string -> decimal: the shortest round-trip decimal string of
    # a float is engine-independent (Ryu in both Spark and DuckDB), while
    # direct float->decimal casts differ (Spark rounds the exact binary
    # value, DuckDB scales in floating point and drifts ulps)
    dec = F.col("__v").cast("string").cast("decimal(38,18)")
    if stat == "sum":
        agg = F.sum(dec).cast("double")
    elif stat == "mean":
        # cast the exact decimal sum to DOUBLE *before* dividing: decimal
        # division rounding rules differ across engines (Spark truncates the
        # quotient to a derived scale, DuckDB doesn't), while double/int64
        # division is IEEE-identical everywhere
        agg = F.sum(dec).cast("double") / F.count("*")
    elif stat == "min":
        agg = F.min("__v").cast("double")
    elif stat == "max":
        agg = F.max("__v").cast("double")
    else:
        raise ValueError(f"unsupported stat: {stat}")
    return (
        exploded.groupBy(*group_cols, "dim")
        .agg(agg.alias("value"))
    )


def prob_product_renorm(df: DataFrame, group_cols: list[str], vec_col: str) -> DataFrame:
    """Probability-vector product aggregation with renormalization — the
    reference's subtoken-probability merge (``cleaning/ensemble.py:248-289``),
    computed in log space to avoid the underflow its fallback handles:
    ``exp(Σ log p_i)`` per dimension, then renormalized to sum 1.

    Output: ``(group_cols..., probs ARRAY<DOUBLE>)``.
    """
    exploded = df.select(
        *group_cols, F.posexplode(F.col(vec_col)).alias("dim", "__p")
    )
    logs = exploded.groupBy(*group_cols, "dim").agg(
        F.sum(F.log(F.col("__p").cast("double"))).alias("__logsum")
    )
    merged = logs.groupBy(*group_cols).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("dim"), F.exp("__logsum").alias("p")))
        ).alias("__parts")
    )
    probs = F.transform("__parts", lambda s: s["p"])
    total = F.aggregate(probs, F.lit(0.0), lambda acc, x: acc + x)
    return merged.select(
        *group_cols, F.transform(probs, lambda p: p / total).alias("probs")
    )
