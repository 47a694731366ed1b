#!/usr/bin/env python
"""Empirical scaling probe: time flagship operators at 4x/16x/64x synthetic
corpus scale (20k/80k/320k documents; 8k/32k/128k vectors) and report the
endpoints scaling exponent (log-time vs log-size slope between the
smallest and largest scale).  An exponent near 1.0 is the linear scaling the 100 TB design
claims; a superlinear drift flags a hidden all-pairs or driver bottleneck
long before a cluster run would.

The synthetic scale-up replicates the sf0.1 documents table with offset
doc ids and a LENGTH-PROPORTIONAL distinct suffix (~one replica token per
two base tokens) — enough shingle difference at every document length to
push cross-replica Jaccard below the near-dup threshold, so the near-dup
output grows linearly with scale instead of admitting the replicas
themselves as an artificial quadratic pair set (a fixed-size suffix
leaves LONG documents' replicas above threshold; measured before fixing).

Run:  python scripts/scale_probe.py   # prints one JSON line per (op, scale)
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import pyspark.sql.functions as F  # noqa: E402

# override for deeper points, e.g. PROBE_SCALES=4,16,64,256 for the
# 256x (1.28M-doc) link_graph confirmation recorded in BASELINE.md
SCALES = [
    int(s)
    for s in os.environ.get("PROBE_SCALES", "4,16,64").split(",")
]
SF_DIR = "/root/testdata/sf0.1"


def scaled_docs(spark, n: int):
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    reps = spark.range(n).withColumnRenamed("id", "__rep")
    # the suffix must scale with the DOCUMENT's own length: a fixed-size
    # suffix leaves long documents' replicas above the Jaccard threshold
    # (8 changed tokens out of 100 is still ~0.86 similar) and the pair
    # output quadratic by construction.  One distinct replica token per
    # ~2 base tokens pins cross-replica Jaccard near 0.5 at every length.
    n_tok = F.size(F.split(F.col("text"), " "))
    suffix = F.array_join(
        F.transform(
            F.sequence(F.lit(0), (n_tok / 2).cast("int")),
            lambda i: F.concat(
                F.lit("q"),
                F.col("__rep").cast("string"),
                F.lit("x"),
                i.cast("string"),
            ),
        ),
        " ",
    )
    return (
        base.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("__rep") * 10_000_000).alias("doc_id"),
            "source",
            F.concat(F.col("text"), F.lit(" "), suffix).alias("text"),
        )
        .persist()
    )


def scaled_embeddings(spark, n: int):
    base = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    reps = spark.range(n).withColumnRenamed("id", "__rep")
    return (
        base.crossJoin(reps)
        .select(
            (F.col("vec_id") + F.col("__rep") * 10_000_000).alias("vec_id"),
            "embedding",
        )
        .persist()
    )


def _synth_url_rows(d):
    """Worst-case-skew URL corpus from a documents frame: every EVEN doc
    is a crawl of the same page on one hot domain, doc_id%7==3 hosts are
    blocklisted, the rest spread over 1000 domains."""
    i = F.col("doc_id")
    host = (
        F.when(i % 2 == 0, F.lit("hot.example"))
        .when(i % 7 == 3, F.lit("ads.blocked.example"))
        .otherwise(
            F.concat(F.lit("d"), (i % 1000).cast("string"), F.lit(".example"))
        )
    )
    page = F.when(i % 2 == 0, F.lit("samepage")).otherwise(i.cast("string"))
    return d.select(
        "doc_id",
        F.concat(F.lit("http://"), host, F.lit("/p/"), page).alias("url"),
        F.lpad(i.cast("string"), 14, "0").alias("warc_date"),
    )


def _html_mod():
    from text_extensions_for_pandas_spark.operators import html as H

    return H


def _graph_mod():
    from text_extensions_for_pandas_spark.operators import graph as G

    return G


def _write_wet_shard(
    path: str, n_records: int, kind: str = "conversion"
) -> None:
    """One WET shard file with n_records small records — a single
    binaryFile task, so the probe times the parser LOOP itself
    (decompression + header scan + payload slicing), not Spark overhead.
    ``kind="response"`` wraps an HTML page in an HTTP 200 envelope (the
    raw-crawl shape the envelope-strip + HTML-extract stages consume)."""
    import gzip

    from text_extensions_for_pandas_spark.sources.corpus import (
        make_warc_record,
    )

    def rec(i: int) -> bytes:
        if kind == "response":
            body = (
                f"<html><head><title>T{i}</title><style>p{{}}</style>"
                f"</head><body><nav>chrome</nav><h1>Doc {i}</h1>"
                f"<p>wet probe record {i} body text {i % 997}</p>"
                f"<a href='/n'>next</a></body></html>"
            )
            status = 200
        else:
            body = f"wet probe record {i} body text {i % 997}"
            status = None
        return make_warc_record(
            body,
            url=f"http://h{i % 100}.example/p/{i}",
            warc_type=kind,
            http_status=status,
        )

    with gzip.open(path, "wb") as fh:
        for i in range(n_records):
            fh.write(rec(i))


def main() -> None:
    from text_extensions_for_pandas_spark import get_spark
    from text_extensions_for_pandas_spark.operators.dedup import (
        dedup_paragraphs,
        exact_dedup,
        near_dup_pairs,
        remove_boilerplate,
    )
    from text_extensions_for_pandas_spark.operators.dedup import (
        fingerprint_overlap_pairs,
        remove_repeated_substrings,
    )
    from text_extensions_for_pandas_spark.operators.pipeline import (
        prep_and_shard,
    )
    from text_extensions_for_pandas_spark.operators.sampling import (
        cap_per_domain,
        deterministic_shuffle,
    )
    from text_extensions_for_pandas_spark.operators.urls import (
        dedup_by_url,
        filter_blocked_domains,
    )

    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    from text_extensions_for_pandas_spark.operators.similarity import (
        brute_force_topk,
        ivf_assign,
        pq_encode,
        pq_fit,
    )

    emb_base = scaled_embeddings(spark, 1)
    codebooks = pq_fit(emb_base, m=8, k=16, iterations=3).persist()
    codebooks.count()
    centroids = emb_base.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    ).persist()
    queries5 = emb_base.filter(F.col("vec_id") < 5).persist()

    emb_ops = {
        "pq_encode": lambda e: pq_encode(e, codebooks).count(),
        "ivf_assign": lambda e: ivf_assign(e, centroids).count(),
        "ann_exact_5q": lambda e: brute_force_topk(e, queries5, k=10).count(),
    }

    ops = {
        "exact_dedup": lambda d: exact_dedup(d).count(),
        "near_dup_pairs": lambda d: near_dup_pairs(d, threshold=0.8).count(),
        "paragraph_dedup": lambda d: dedup_paragraphs(
            d, sep_regex=" table ", join_sep=" "
        ).count(),
        "boilerplate": lambda d: remove_boilerplate(
            d, min_docs=2, sep_regex=" table ", join_sep=" ",
            group_col="source",
        ).count(),
        "det_shuffle": lambda d: deterministic_shuffle(d, n_shards=32).count(),
        # the two priciest bench composites: MOSS winnowing pairs (the
        # max_docs_per_fp stop-key cap predicts <= linear shuffle; replicas
        # make base-text fingerprints hot keys, so the cap is exercised
        # hard) and the full prep pipeline (caps set effectively unbounded
        # so the per-domain sort/window work scales with the corpus)
        "fingerprint_overlap": lambda d: fingerprint_overlap_pairs(d).count(),
        # ExactSubstr removal with a PLANTED HOT GRAM: every document gets
        # the same boilerplate prefix, so one composite gram hash collects
        # n_docs occurrences — the exact skew shape that killed the old
        # per-hash row_number window.  The min(struct) keep-first agg must
        # hold the exponent <= ~linear.
        # .agg(sum(length)) rather than .count(): a bare count lets
        # Catalyst eliminate the distinct-keyed left join and skip the
        # whole gram pipeline (measured: 0.4s flat at every scale)
        "exactsubstr_remove_hot": lambda d: remove_repeated_substrings(
            d.select(
                "doc_id",
                F.concat(
                    F.lit("standard license boilerplate header line "),
                    F.col("text"),
                ).alias("text"),
            ),
            k=20,
        ).agg(
            F.sum(F.length("clean_text")), F.sum("n_cut_chars")
        ).collect()[0][0],
        # worst-case domain skew: EVERY document in one domain with a tiny
        # cap — the shape the hash-threshold pre-filter exists for (the
        # plain window would single-task sort the whole corpus)
        "cap_mega_domain": lambda d: cap_per_domain(
            d.select(
                "doc_id",
                F.lit("megahost").alias("source"),
                F.length("text").alias("n_chars"),
            ),
            max_docs=100,
            max_tokens=1_000_000,
        ).count(),
        "training_prep": lambda d: prep_and_shard(
            d, sep_regex=" table ", join_sep=" ", boiler_min_docs=2,
            min_words=30,
            required_words=("the", "a", "data", "key", "line", "row"),
            max_docs_per_domain=1_000_000_000,
            max_chars_per_domain=1 << 60, n_shards=32, salt="p",
        ).count(),
        # crawl front under worst-case URL skew: HALF the corpus is crawls
        # of ONE page on ONE hot domain (the suffix-explode runs over
        # distinct hosts — tiny — and the keep-newest is a map-side
        # combinable max_by agg, so both must hold <= linear; a window
        # formulation would single-task sort the hot page's crawls)
        "url_blocklist_hot": lambda d: filter_blocked_domains(
            _synth_url_rows(d), ["blocked.example"]
        ).count(),
        "url_dedup_hotpage": lambda d: dedup_by_url(
            _synth_url_rows(d), keep="last"
        ).count(),
        # link extraction + host-graph aggregation: 5 anchors per doc, a
        # sum(n_links) sink so the parse projection cannot be eliminated
        "link_graph": lambda d: _html_mod().link_graph(
            d.select(
                F.concat(
                    F.lit("http://s"),
                    (F.col("doc_id") % 2000).cast("string"),
                    F.lit(".example/p/"),
                    F.col("doc_id").cast("string"),
                ).alias("url"),
                F.concat(
                    F.lit("<p><a href='http://t"),
                    (F.col("doc_id") % 500).cast("string"),
                    F.lit(".example/x'>a</a><a href='http://hot.example/y'>"
                          "b</a><a href='/self'>c</a><a href='rel/z'>d</a>"
                          "<a href='http://t"),
                    ((F.col("doc_id") + 7) % 500).cast("string"),
                    F.lit(".example/w'>e</a></p>"),
                ).alias("text"),
            )
        ).agg(F.sum("n_links")).collect()[0][0],
        # anchor-text index under worst-case target skew: HALF the corpus
        # links to ONE hot URL (anchors drawn from a 997-value pool, so
        # the hot target's collect_list state is bounded by DISTINCT
        # anchors — the documented contract — while its raw incoming
        # count grows with the corpus); the rest spread over 10k targets
        "anchor_index_hot": lambda d: _html_mod().anchor_text_index(
            d.select(
                F.concat(
                    F.lit("http://s"),
                    (F.col("doc_id") % 5000).cast("string"),
                    F.lit(".example/p/"),
                    F.col("doc_id").cast("string"),
                ).alias("url"),
                F.concat(
                    F.lit("<a href='"),
                    F.when(
                        F.col("doc_id") % 2 == 0,
                        F.lit("http://hot.example/the-page"),
                    ).otherwise(
                        F.concat(
                            F.lit("http://t"),
                            (F.col("doc_id") % 10_000).cast("string"),
                            F.lit(".example/p"),
                        )
                    ),
                    F.lit("'>anchor "),
                    (F.col("doc_id") % 997).cast("string"),
                    F.lit("</a>"),
                ).alias("text"),
            ),
            k=5,
        ).agg(F.sum("n_incoming")).collect()[0][0],
        # PageRank under worst-case dst skew: EVERY node links to ONE hot
        # node (the star) plus one pseudo-random peer — the hot node's
        # in-sum must stay a map-side-combinable aggregate, never a
        # single-task window/sort; node count grows with the corpus
        "pagerank_hotdst": lambda d: _graph_mod().pagerank(
            d.select(
                F.col("doc_id").alias("src"),
                F.explode(
                    F.array(
                        F.lit(-1).cast("long"),  # the hot destination
                        F.col("doc_id") * 31 + 7,
                    )
                ).alias("dst"),
            ),
            iterations=4,
        ).count(),
        # HTML->text extraction: row-local Arrow-batched pandas UDF; the
        # sum(length) sink keeps Catalyst from eliminating the projection
        "html_extract": lambda d: d.select(
            _html_mod().html_to_text(
                F.concat(
                    F.lit("<html><head><style>x{}</style></head><body>"
                          "<nav>chrome</nav><h1>T</h1><p>"),
                    F.col("text"),
                    F.lit("</p><script>var j=1;</script></body></html>"),
                )
            ).alias("t")
        ).agg(F.sum(F.length("t"))).collect()[0][0],
        # language-dispatched quality gate (r10): lang_id over 14
        # marker profiles + per-language stopword/alpha/word-len CASE —
        # all row-local codegen; the count(passes) sink forces every
        # branch to evaluate
        "multilingual_gate": lambda d: _multilingual_gate(d),
        # snapshot diff (r10): ONE full-outer sort-merge join between
        # two derived snapshots (10% added / 10% removed / 10% changed)
        # + the per-host churn aggregate — the incremental-crawl
        # primitive's scaling shape
        "corpus_diff": lambda d: _corpus_diff_probe(d),
    }

    def _corpus_diff_probe(d):
        from text_extensions_for_pandas_spark.sources.corpus import (
            corpus_diff,
            snapshot_churn_by_host,
        )

        i = F.col("doc_id")
        base = d.select(
            "doc_id",
            F.concat(
                F.lit("http://h"), (i % 97).cast("string"),
                F.lit(".example/p/"), i.cast("string"),
            ).alias("url"),
            F.xxhash64("text").alias("digest"),
            F.xxhash64("text", F.lit("v2")).alias("digest_v2"),
        )
        old = base.filter(i % 10 != 0).select("url", "digest")
        new = base.filter(i % 10 != 9).select(
            "url",
            F.when(i % 10 == 5, F.col("digest_v2"))
            .otherwise(F.col("digest"))
            .alias("digest"),
        )
        churn = snapshot_churn_by_host(corpus_diff(old, new))
        return churn.agg(
            F.sum("n_added") + F.sum("n_removed") + F.sum("n_changed")
        ).collect()[0][0]

    def _multilingual_gate(d):
        from text_extensions_for_pandas_spark.functions.text import (
            lang_id,
            quality_gate_by_language,
            word_tokens,
        )

        g = (
            d.withColumn("__toks", word_tokens(F.col("text")))
            .withColumn(
                "__clean",
                F.transform(
                    F.col("__toks"),
                    lambda t: F.regexp_replace(t, r"(?U)^\W+|\W+$", ""),
                ),
            )
            .withColumn("lang", lang_id(F.col("text"), toks=F.col("__toks")))
        )
        gate = quality_gate_by_language(
            F.col("text"),
            F.col("lang"),
            toks=F.col("__toks"),
            clean_toks=F.col("__clean"),
        )
        return g.agg(
            F.sum(gate["passes"].cast("int"))
        ).collect()[0][0]

    # optional argv filter: probe only the named ops (e.g.
    # `python scripts/scale_probe.py fingerprint_overlap training_prep bpe`)
    # — the full sweep exceeds a single coarse timeout window
    only = set(sys.argv[1:])
    if only:
        ops = {k: v for k, v in ops.items() if k in only}
        emb_ops = {k: v for k, v in emb_ops.items() if k in only}
    run_bpe = not only or "bpe" in only

    times: dict[str, list[tuple[int, float]]] = {k: [] for k in ops}

    for n in SCALES:
        if not ops:
            break
        docs = scaled_docs(spark, n)
        n_docs = docs.count()  # materialize the replica view once
        for name, fn in ops.items():
            t0 = time.time()
            rows = fn(docs)
            dt = time.time() - t0
            times[name].append((n, dt))
            print(
                json.dumps(
                    {"op": name, "scale": n, "docs": n_docs,
                     "rows": rows, "sec": round(dt, 2)}
                )
            )
        docs.unpersist()

    for n in SCALES:
        if not emb_ops:
            break
        emb = scaled_embeddings(spark, n)
        n_vec = emb.count()
        for name, fn in emb_ops.items():
            t0 = time.time()
            rows = fn(emb)
            dt = time.time() - t0
            times.setdefault(name, []).append((n, dt))
            print(
                json.dumps(
                    {"op": name, "scale": n, "vecs": n_vec,
                     "rows": rows, "sec": round(dt, 2)}
                )
            )
        emb.unpersist()

    # WET parse island: one shard of 10k/40k/160k small records per scale
    # (single file = single task), timing the parser loop itself.  The
    # loop is a forward byte scan with O(record) slicing, so the exponent
    # must sit at ~1 (linear in record count) with memory bounded by one
    # decompressed shard.
    if not only or "wet_parse" in only:
        import tempfile

        from text_extensions_for_pandas_spark.sources.corpus import (
            read_wet_corpus,
        )

        wet_dir = tempfile.mkdtemp(prefix="wet_probe_")
        for n in SCALES:
            n_rec = 2_500 * n
            shard_dir = os.path.join(wet_dir, f"s{n}")
            os.makedirs(shard_dir, exist_ok=True)
            _write_wet_shard(
                os.path.join(shard_dir, "shard.warc.wet.gz"), n_rec
            )
            t0 = time.time()
            rows = read_wet_corpus(spark, shard_dir).count()
            dt = time.time() - t0
            times.setdefault("wet_parse", []).append((n, dt))
            print(
                json.dumps(
                    {"op": "wet_parse", "scale": n, "records": n_rec,
                     "rows": rows, "sec": round(dt, 2)}
                )
            )

    # Crawl front END-TO-END: raw WARC response shards (HTTP envelope +
    # HTML page per record) -> read_wet_corpus(response, keep 200) ->
    # extract_html_documents.  One shard per scale split into 8 files so
    # the stage parallelizes like a real segment listing; the exponent
    # must hold ~linear — this is the pipeline every crawled byte pays.
    if not only or "crawl_e2e" in only:
        import tempfile

        from text_extensions_for_pandas_spark.operators.html import (
            extract_html_documents,
        )
        from text_extensions_for_pandas_spark.sources.corpus import (
            read_wet_corpus,
        )

        e2e_dir = tempfile.mkdtemp(prefix="crawl_e2e_probe_")
        for n in SCALES:
            n_rec = 2_500 * n
            shard_dir = os.path.join(e2e_dir, f"s{n}")
            os.makedirs(shard_dir, exist_ok=True)
            per_file = n_rec // 8
            for f_no in range(8):
                _write_wet_shard(
                    os.path.join(shard_dir, f"seg{f_no}.warc.gz"),
                    per_file,
                    kind="response",
                )
            t0 = time.time()
            docs = extract_html_documents(
                read_wet_corpus(
                    spark, shard_dir, record_types=("response",),
                    keep_http_statuses=(200,),
                )
            )
            rows, chars = docs.agg(
                F.count("*"), F.sum("n_chars")
            ).collect()[0]
            dt = time.time() - t0
            times.setdefault("crawl_e2e", []).append((n, dt))
            print(
                json.dumps(
                    {"op": "crawl_e2e", "scale": n, "records": n_rec,
                     "rows": rows, "sum_chars": chars, "sec": round(dt, 2)}
                )
            )

    # WAT vs HTML link ingestion: the SAME logical pages' host link
    # graph, once from raw-WARC HTML (envelope strip + full HTML parse +
    # anchor extraction) and once from WAT metadata JSON (pre-extracted
    # links, no HTML parse).  Both paths must produce the identical edge
    # sum; the time ratio quantifies what reading WAT saves a
    # segment-scale link-graph/pagerank front.
    if not only or "wat_links" in only:
        import gzip as _gzip
        import tempfile

        from text_extensions_for_pandas_spark.operators.html import (
            link_graph,
            link_graph_from_edges,
        )
        from text_extensions_for_pandas_spark.sources.corpus import (
            make_warc_record,
            make_wat_record,
            read_wat_links,
            read_wet_corpus,
        )

        def _page_links(i: int) -> list[tuple[str, str]]:
            return [
                (f"http://t{i % 500}.example/x", f"anchor {i % 97}"),
                ("http://hot.example/y", "hot link"),
                ("/self", "nav"),
                (f"http://t{(i + 7) % 500}.example/w", f"other {i % 89}"),
            ]

        def _page_url(i: int) -> str:
            return f"http://s{i % 2000}.example/p/{i}"

        def _html_rec(i: int) -> bytes:
            # realistic page weight: ~8 KB of markup around the links —
            # the WAT record carries ONLY the links regardless, which is
            # exactly the cost asymmetry being measured (real pages run
            # tens-to-hundreds of KB; a links-only probe would understate
            # the saving to nearly nothing)
            filler = "".join(
                f"<p>paragraph {j} of document {i} with routine crawl "
                f"prose content and value {(i * 7 + j) % 997}</p>"
                for j in range(80)
            )
            body = (
                "<html><head><title>t</title></head><body><h1>Doc</h1>"
                + filler
                + "".join(
                    f"<a href='{h}'>{a}</a>" for h, a in _page_links(i)
                )
                + "</body></html>"
            )
            return make_warc_record(
                body, url=_page_url(i), warc_type="response",
                http_status=200,
            )

        lk_dir = tempfile.mkdtemp(prefix="wat_links_probe_")
        for n in SCALES:
            n_rec = 2_500 * n
            per_file = n_rec // 8
            hdir = os.path.join(lk_dir, f"h{n}")
            wdir = os.path.join(lk_dir, f"w{n}")
            os.makedirs(hdir, exist_ok=True)
            os.makedirs(wdir, exist_ok=True)
            for f_no in range(8):
                lo = f_no * per_file
                with _gzip.open(
                    os.path.join(hdir, f"seg{f_no}.warc.gz"), "wb"
                ) as fh:
                    for i in range(lo, lo + per_file):
                        fh.write(_html_rec(i))
                with _gzip.open(
                    os.path.join(wdir, f"seg{f_no}.warc.wat.gz"), "wb"
                ) as fh:
                    for i in range(lo, lo + per_file):
                        fh.write(
                            make_wat_record(_page_url(i), _page_links(i))
                        )
            t0 = time.time()
            html_sum = link_graph(
                read_wet_corpus(
                    spark, hdir, record_types=("response",),
                    keep_http_statuses=(200,),
                )
            ).agg(F.sum("n_links")).collect()[0][0]
            dt_html = time.time() - t0
            t0 = time.time()
            wat_sum = link_graph_from_edges(
                read_wat_links(spark, wdir),
                src_url_col="url", dst_url_col="link_url",
            ).agg(F.sum("n_links")).collect()[0][0]
            dt_wat = time.time() - t0
            assert html_sum == wat_sum, (html_sum, wat_sum)
            times.setdefault("links_from_html", []).append((n, dt_html))
            times.setdefault("links_from_wat", []).append((n, dt_wat))
            print(
                json.dumps(
                    {"op": "wat_links", "scale": n, "records": n_rec,
                     "edges": html_sum, "html_sec": round(dt_html, 2),
                     "wat_sec": round(dt_wat, 2),
                     "speedup": round(dt_html / dt_wat, 2)}
                )
            )

    # Fused vs staged image embedding: decode_images -> embed_images
    # materializes every decoded pixel buffer (h*w*c bytes/row) through
    # Arrow between the stages; embed_image_assets decodes and reduces
    # inside ONE island.  Both are timed over the same synthesized
    # 64x64 PPM assets (12 KB decoded/row); results must agree.
    if not only or "embed_images" in only:
        import numpy as _np
        import pandas as _pd

        from text_extensions_for_pandas_spark.operators import (
            multimodal as MM,
        )

        header = b"P6\n64 64\n255\n"

        def _img_gen(batches):
            for pdf in batches:
                rows = []
                for i in pdf["id"]:
                    i = int(i)
                    p = _np.arange(64 * 64, dtype=_np.int64)
                    base = (i * 2654435761 + p * 40503 + i * p * 97) % 248
                    px = _np.repeat(base.astype(_np.uint8), 3).tobytes()
                    rows.append(
                        (i, "image", header + px,
                         (64, 64, 3, None, None, "image/x-portable-pixmap"))
                    )
                yield _pd.DataFrame(
                    rows, columns=["asset_id", "kind", "content", "meta"]
                )

        for n in SCALES:
            n_img = 2_500 * n
            assets = (
                spark.range(n_img)
                .repartition(32)
                .mapInPandas(_img_gen, schema=MM.ASSETS_DDL)
            )
            t0 = time.time()
            s_staged = (
                MM.embed_images(MM.decode_images(assets))
                .agg(F.sum(F.element_at("embedding", 1)))
                .collect()[0][0]
            )
            dt_staged = time.time() - t0
            t0 = time.time()
            s_fused = (
                MM.embed_image_assets(assets)
                .agg(F.sum(F.element_at("embedding", 1)))
                .collect()[0][0]
            )
            dt_fused = time.time() - t0
            assert abs(s_staged - s_fused) < 1e-6, (s_staged, s_fused)
            times.setdefault("embed_staged", []).append((n, dt_staged))
            times.setdefault("embed_fused", []).append((n, dt_fused))
            print(
                json.dumps(
                    {"op": "embed_images", "scale": n, "images": n_img,
                     "staged_sec": round(dt_staged, 2),
                     "fused_sec": round(dt_fused, 2),
                     "speedup": round(dt_staged / dt_fused, 2)}
                )
            )

    # CDX select-before-scan: parse + select over a synthetic capture
    # index (3 captures/URL across 3 crawl days, 1/7 non-200, 1/11
    # non-HTML, mirror pairs sharing digests).  The whole path is
    # JVM-side (split + from_json + two combinable aggregates), so the
    # exponent must sit ~1 with NO Arrow/Python cost at all — this is
    # the stage that decides which 1% of 100 TB gets fetched, and it has
    # to be cheap enough to run casually.  Index shards are generated
    # distributed (spark.range -> concat -> write.text gzip x8).
    if not only or "cdx_select" in only:
        import tempfile

        from text_extensions_for_pandas_spark.sources.cdx import (
            read_cdx_index,
            select_captures,
        )

        cdx_dir = tempfile.mkdtemp(prefix="cdx_probe_")
        for n in SCALES:
            n_rec = 25_000 * n
            k_urls = max(1, n_rec // 3)
            shard_dir = os.path.join(cdx_dir, f"s{n}")
            i = F.col("id")
            ku = i % k_urls
            url = F.concat(
                F.lit("http://h"), (ku % 101).cast("string"),
                F.lit(".example/p/"), ku.cast("string"),
            )
            line = F.concat(
                F.lit("example,h"), (ku % 101).cast("string"),
                F.lit(")/p/"), ku.cast("string"),
                F.lit(" 2024010"), (i / k_urls + 1).cast("int").cast("string"),
                F.lit('000000 {"url": "'), url,
                F.lit('", "mime": "'),
                F.when(i % 11 == 0, "application/pdf").otherwise("text/html"),
                F.lit('", "status": "'),
                F.when(i % 7 == 0, "404").otherwise("200"),
                F.lit('", "digest": "d'),
                (i % (k_urls // 2 + 1)).cast("string"),
                F.lit('", "length": "'), (500 + i % 1000).cast("string"),
                F.lit('", "offset": "'), (i * 1000).cast("string"),
                F.lit('", "filename": "w'), (i % 16).cast("string"),
                F.lit('.warc.gz"}'),
            )
            (
                spark.range(n_rec).select(line.alias("value"))
                .repartition(8)
                .write.mode("overwrite")
                .option("compression", "gzip")
                .text(shard_dir)
            )
            t0 = time.time()
            rows, fetch_bytes = (
                select_captures(read_cdx_index(spark, shard_dir))
                .agg(F.count("*"), F.sum("length"))
                .collect()[0]
            )
            dt = time.time() - t0
            times.setdefault("cdx_select", []).append((n, dt))
            print(
                json.dumps(
                    {"op": "cdx_select", "scale": n, "records": n_rec,
                     "rows": rows, "fetch_bytes": fetch_bytes,
                     "sec": round(dt, 2)}
                )
            )

    # Ranged fetch vs full scan: the SAME selection (10% of captures)
    # obtained by seeking the index's (offset, length) members vs
    # parsing every shard and filtering afterwards.  Ranged cost grows
    # with the SELECTED bytes, full-scan cost with the CORPUS bytes —
    # the 10x asymmetry here is the floor (real selections run well
    # under 1%).  Both paths must yield identical document sets.
    if not only or "cdx_fetch" in only:
        import gzip as _gzip
        import tempfile

        from text_extensions_for_pandas_spark.sources.cdx import (
            fetch_plan,
            fetch_warc_ranges,
            make_cdx_line,
            read_cdx_index,
        )
        from text_extensions_for_pandas_spark.sources.corpus import (
            make_warc_record,
            read_wet_corpus,
        )

        fdir = tempfile.mkdtemp(prefix="cdx_fetch_probe_")
        for n in SCALES:
            n_rec = 1_250 * n
            per_file = n_rec // 8
            sdir = os.path.join(fdir, f"s{n}")
            os.makedirs(sdir, exist_ok=True)
            cdx_lines = []
            for f_no in range(8):
                fname = f"seg{f_no}.warc.gz"
                offset = 0
                with open(os.path.join(sdir, fname), "wb") as fh:
                    for i in range(f_no * per_file, (f_no + 1) * per_file):
                        body = (
                            f"<html><body>page {i} "
                            + "filler prose word " * 100
                            + "</body></html>"
                        )
                        member = _gzip.compress(
                            make_warc_record(
                                body,
                                url=f"http://h{i % 97}.example/p/{i}",
                                warc_type="response",
                                http_status=200,
                            )
                        )
                        cdx_lines.append(
                            make_cdx_line(
                                f"http://h{i % 97}.example/p/{i}",
                                f"20240601{i % 1000000:06d}",
                                digest=f"dg{i}",
                                filename=fname,
                                offset=offset,
                                length=len(member),
                            )
                        )
                        fh.write(member)
                        offset += len(member)
            with _gzip.open(os.path.join(sdir, "cdx-0.gz"), "wt") as fh:
                fh.write("\n".join(cdx_lines) + "\n")

            sel = read_cdx_index(
                spark, os.path.join(sdir, "cdx-0.gz")
            ).where(F.col("surt").rlike("0$"))  # ~10%: paths ending in 0
            t0 = time.time()
            ranged = fetch_warc_ranges(
                spark,
                fetch_plan(sel, max_records_per_task=256),
                base_dir=sdir,
                record_types=("response",),
            ).count()
            dt_ranged = time.time() - t0
            t0 = time.time()
            full = (
                read_wet_corpus(
                    spark,
                    os.path.join(sdir, "seg*.warc.gz"),
                    record_types=("response",),
                )
                .where(F.col("url").rlike("0$"))
                .count()
            )
            dt_full = time.time() - t0
            assert ranged == full, (ranged, full)
            times.setdefault("fetch_ranged", []).append((n, dt_ranged))
            times.setdefault("fetch_fullscan", []).append((n, dt_full))
            print(
                json.dumps(
                    {"op": "cdx_fetch", "scale": n, "records": n_rec,
                     "selected": ranged,
                     "ranged_sec": round(dt_ranged, 2),
                     "fullscan_sec": round(dt_full, 2),
                     "speedup": round(dt_full / dt_ranged, 2)}
                )
            )

    # Token-budget sampling: the quantile-threshold plan vs the naive
    # global cumulative-sum window it is defined by.  Same kept set
    # asserted; the naive plan range-sorts the WHOLE corpus into the
    # window (single straggling sort at scale), the operator confines
    # the exact window to the boundary slice.
    if not only or "token_budget" in only:
        from pyspark.sql import Window

        from text_extensions_for_pandas_spark.operators.sampling import (
            sample_to_token_budget,
        )

        for n in SCALES:
            n_docs = 25_000 * n
            d = spark.range(n_docs).select(
                F.col("id").alias("doc_id"),
                (F.col("id") * 37 % 1000 + 10).alias("n_tokens"),
                ((F.col("id") * 2654435761) % 1000003 / 1000003.0).alias("q"),
            )
            budget = n_docs * 100  # cuts ~20% in (mean size ~510)
            t0 = time.time()
            kept = sample_to_token_budget(
                d, budget, size_col="n_tokens", priority_col="q"
            ).count()
            dt_op = time.time() - t0
            w = Window.orderBy(
                F.col("q").desc(), F.col("doc_id")
            ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
            t0 = time.time()
            naive = (
                d.withColumn("c", F.sum("n_tokens").over(w))
                .filter(F.col("c") <= budget)
                .count()
            )
            dt_naive = time.time() - t0
            assert kept == naive, (kept, naive)
            times.setdefault("token_budget_op", []).append((n, dt_op))
            times.setdefault("token_budget_window", []).append((n, dt_naive))
            print(
                json.dumps(
                    {"op": "token_budget", "scale": n, "docs": n_docs,
                     "kept": kept, "op_sec": round(dt_op, 2),
                     "window_sec": round(dt_naive, 2),
                     "speedup": round(dt_naive / dt_op, 2)}
                )
            )

    # Durable band index: probe a FIXED small batch against a growing
    # stored index.  Probe cost = batch signature pass (fixed) + one
    # scan+join of the stored bands, so the exponent must sit <= ~1 in
    # index size with no superlinear drift (a drift would mean the
    # probe re-hashes or re-shuffles the corpus).
    if not only or "band_probe" in only:
        import tempfile

        from text_extensions_for_pandas_spark.operators.dedup import (
            probe_band_index,
            write_band_index,
        )

        bdir = tempfile.mkdtemp(prefix="band_probe_")
        for n in SCALES:
            corpus = scaled_docs(spark, n)
            n_docs = corpus.count()
            batch = corpus.filter(F.col("doc_id") % (n_docs // 50) == 1)
            path = os.path.join(bdir, f"s{n}")
            t0 = time.time()
            write_band_index(corpus, path)
            dt_build = time.time() - t0
            t0 = time.time()
            cands = probe_band_index(spark, batch, path).count()
            dt_probe = time.time() - t0
            times.setdefault("band_index_build", []).append((n, dt_build))
            times.setdefault("band_index_probe", []).append((n, dt_probe))
            print(
                json.dumps(
                    {"op": "band_probe", "scale": n, "index_docs": n_docs,
                     "batch_docs": batch.count(), "cands": cands,
                     "build_sec": round(dt_build, 2),
                     "probe_sec": round(dt_probe, 2)}
                )
            )
            corpus.unpersist()

    # BPE merge-loop boundedness: ~1k merges must complete in bounded
    # wall-clock on the in-memory path (the distributed per-merge loop is
    # one Spark job per merge — the documented wall-clock killer at 32k+
    # merges), with the first rounds identical to the distributed loop.
    from text_extensions_for_pandas_spark.operators.bpe import train_bpe

    if not run_bpe:
        _report(times)
        return
    bpe_docs = scaled_docs(spark, 4)
    bpe_docs.count()
    t0 = time.time()
    fast_merges, _ = train_bpe(bpe_docs, n_merges=1000, min_pair_count=2)
    dt_fast = time.time() - t0
    print(
        json.dumps(
            {"op": "train_bpe_inmemory_1k", "merges": len(fast_merges),
             "sec": round(dt_fast, 2)}
        )
    )
    # tokenizer-scale budget: even at min_pair_count=1 the synthetic
    # corpus's pair inventory exhausts at ~305 merges (few hundred
    # distinct words), so an 8k budget cannot bind on real testdata —
    # run the budget anyway to prove early-stop costs nothing extra
    t0 = time.time()
    big_merges, _ = train_bpe(bpe_docs, n_merges=8000, min_pair_count=1)
    dt_big = time.time() - t0
    print(
        json.dumps(
            {"op": "train_bpe_inmemory_8k_budget", "merges": len(big_merges),
             "sec": round(dt_big, 2)}
        )
    )
    # ... and measure a REAL 8k-merge run on a synthetic 50k-word Zipf
    # vocabulary (deterministic 12-char md5-prefix words), exercising the
    # in-memory trainer's incremental bookkeeping at tokenizer scale —
    # the wall-clock a production vocab-training run pays after the
    # corpus collapses to its word-frequency table.  (A hex alphabet is
    # the WORST case for the bookkeeping: the ~256 hot early pairs touch
    # nearly every word; natural-language vocabularies are far sparser.)
    import hashlib

    from text_extensions_for_pandas_spark.operators.bpe import (
        _train_bpe_in_memory,
    )

    synth_vocab = [
        (
            hashlib.md5(str(i).encode()).hexdigest()[:12],
            max(1, 50_000 // (i + 1)),
        )
        for i in range(50_000)
    ]
    t0 = time.time()
    synth_merges, _ = _train_bpe_in_memory(
        synth_vocab, n_merges=8_000, min_pair_count=2
    )
    dt_synth = time.time() - t0
    print(
        json.dumps(
            {"op": "train_bpe_inmemory_8k_synth50k",
             "merges": len(synth_merges), "sec": round(dt_synth, 2)}
        )
    )
    t0 = time.time()
    slow_merges, _ = train_bpe(
        bpe_docs, n_merges=16, max_driver_words=None
    )
    dt_slow16 = time.time() - t0
    assert fast_merges[: len(slow_merges)] == slow_merges, (
        "BPE in-memory/distributed path divergence"
    )
    print(
        json.dumps(
            {"op": "train_bpe_distributed_16", "merges": len(slow_merges),
             "sec": round(dt_slow16, 2), "parity_first_16": True}
        )
    )
    bpe_docs.unpersist()
    _report(times)


def _report(times: dict[str, list[tuple[int, float]]]) -> None:
    print(
        "# endpoints scaling exponents "
        f"(slope of log t vs log n, {SCALES[0]}x->{SCALES[-1]}x):"
    )
    for name, pts in times.items():
        if len(pts) < 2:
            continue
        (n0, t0), (n1, t1) = pts[0], pts[-1]
        exp = math.log(t1 / t0) / math.log(n1 / n0)
        print(json.dumps({"op": name, "exponent": round(exp, 2)}))
    print("# exponent ~1 = linear; <1 = fixed-cost-dominated at this size")


if __name__ == "__main__":
    main()
