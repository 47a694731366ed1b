"""Similarity search over an embedding column, tier by tier — the same
queries answered at four memory/latency/recall points:

    exact        brute_force_topk   full scan, full vectors
    IVF          ivf_topk           nprobe clusters, full vectors
    PQ           pq_topk            full scan, 32x-compressed codes
    IVF-PQ       ivfpq_topk         nprobe clusters, compressed codes

At 100 TB the progression is the point: the exact tier is the oracle you
validate against on a sample; IVF prunes the scan; PQ shrinks the index
until it fits executor memory; IVF-PQ is what actually serves.  Recall
of each approximate tier is reported against the exact tier.

Run:  python examples/ann_search.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

import pyspark.sql.functions as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import text_extensions_for_pandas_spark as tep  # noqa: E402
from text_extensions_for_pandas_spark.operators.similarity import (  # noqa: E402
    brute_force_topk,
    ivf_assign,
    ivf_topk,
    ivfpq_topk,
    kmeans_fit,
    pq_encode,
    pq_fit,
    pq_topk,
)

K, N_QUERIES = 10, 5


def _neighbor_sets(df):
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = tep.get_spark("ann-search-example")
    spark.sparkContext.setLogLevel("ERROR")

    # normalize once so inner-product scoring (the PQ tiers) ranks by
    # cosine, same as the exact tier
    raw = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = F.sqrt(
        F.aggregate(
            F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda a, x: a + x,
        )
    )
    emb = raw.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double") / n).alias("embedding"),
    ).cache()
    queries = emb.filter(F.col("vec_id") < N_QUERIES)

    # ---- index artifacts: train once, persist in production ----
    centroids = kmeans_fit(emb, k=16, iterations=3).cache()
    assigned = ivf_assign(emb, centroids).cache()
    codebooks = pq_fit(emb, m=16, k=16, iterations=3).cache()
    codes = pq_encode(emb, codebooks).cache()

    exact = _neighbor_sets(brute_force_topk(emb, queries, k=K))

    tiers = {
        "ivf (nprobe=4)": ivf_topk(assigned, centroids, queries, k=K, nprobe=4),
        "pq (m=16)": pq_topk(codes, queries, codebooks, k=K),
        "ivf-pq (nprobe=4)": ivfpq_topk(
            assigned, codes, centroids, codebooks, queries, k=K, nprobe=4
        ),
    }
    print(f"recall@{K} vs exact tier over {len(exact)} queries:")
    for name, df in tiers.items():
        approx = _neighbor_sets(df)
        rec = sum(
            len(exact[q] & approx.get(q, set())) / len(exact[q]) for q in exact
        ) / len(exact)
        print(f"  {name:20s} {rec:.2f}")

    dims = emb.select(F.size("embedding")).first()[0]
    m = codes.select(F.size("codes")).first()[0]
    print(
        f"index sizes per vector: exact {4 * dims} B (float32)"
        f" vs pq {m} codes (~{m // 2} B nibble-packed at k=16)"
    )

    # ---- durable index: write once, partition-pruned search forever ----
    import tempfile

    from text_extensions_for_pandas_spark.operators.similarity import (
        ivfpq_search_index,
        write_ivfpq_index,
    )

    with tempfile.TemporaryDirectory() as td:
        path = f"{td}/ivfpq_index"
        write_ivfpq_index(emb, centroids, codebooks, path)
        served = _neighbor_sets(
            ivfpq_search_index(spark, path, queries, k=K, nprobe=4)
        )
        in_mem = _neighbor_sets(
            ivfpq_topk(
                assigned, codes, centroids, codebooks, queries, k=K, nprobe=4
            )
        )
        assert served == in_mem, "on-disk search must match the in-memory plan"
        print(
            "durable ivf-pq index: search reads nprobe=4 of 16 cluster"
            " directories (partition pruning), results identical"
        )
    print("OK")


if __name__ == "__main__":
    main()
