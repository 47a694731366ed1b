"""Crawl-to-corpus walkthrough — the web front of a training-data
pipeline, end to end on synthetic Common Crawl WET shards:

    WET shards (gzip WARC)  → documents table  (read_wet_corpus)
    → domain blocklist       (suffix-chain semi join)
    → same-page crawl dedup  (normalized URL, keep newest)
    → quality gate + dedup + split (prepare_training_corpus)

plus the two companion modes:

* **raw WARC responses** → :func:`extract_html_documents` (HTML→text)
  for segments that carry markup instead of pre-extracted WET text;
* **continuous ingest**: the SAME parser island as a Structured
  Streaming source (`read_wet_stream` → `streaming_prep_ingest`) — new
  shards landing in the crawl directory become micro-batches, with
  cross-batch dedup and exactly-once output; a second arriving shard is
  demonstrated below.

The same code runs against real CC-MAIN WET segments on object storage:
the file is the unit of parallelism, every stage after ingestion is a
lazy Catalyst plan over the canonical documents table.

Run:  python examples/crawl_prep.py
"""

from __future__ import annotations

import gzip
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import text_extensions_for_pandas_spark as tep  # noqa: E402
from text_extensions_for_pandas_spark.operators.pipeline import (  # noqa: E402
    prepare_training_corpus,
)
from text_extensions_for_pandas_spark.operators.urls import (  # noqa: E402
    dedup_by_url,
    filter_blocked_domains,
)
from text_extensions_for_pandas_spark.sources.corpus import (  # noqa: E402
    make_warc_record,
    read_wet_corpus,
)

BLOCKLIST = ["spam.example", "tracker.example"]


def _record(url: str, date: str, text: str,
            warc_type: str = "conversion",
            http_status: int | None = None) -> bytes:
    # one shared serializer for every fixture in this repo
    return make_warc_record(
        text, url=url, warc_date=date, warc_type=warc_type,
        record_id=f"<urn:uuid:{abs(hash(url + date))}>",
        http_status=http_status,
    )


def _write_shards(out_dir: str) -> None:
    """Synthesize two WET shards: good pages, a blocklisted host, and the
    same page crawled twice (older copy must lose)."""
    def body(topic: str) -> str:
        # distinct per-page vocabulary so the near-dup stage keeps real
        # pages apart while the twice-crawled page still collapses
        return (
            f"the {topic} pipeline reads a {topic} table and sorts each "
            f"{topic} row by key before the merge step writes a clean "
            f"line of {topic} output data for the {topic} corpus "
        ) * 3

    shard0 = (
        _record("http://news.example/a", "2024-01-01T00:00:00Z", body("market") + "alpha")
        + _record("http://ads.spam.example/x", "2024-01-01T00:00:00Z", body("ads"))
        + _record("http://news.example/dup", "2024-01-01T00:00:00Z", body("sports") + "old crawl")
    )
    shard1 = _record(
        "http://news.example/dup", "2024-03-01T00:00:00Z", body("sports") + "new crawl"
    ) + _record("http://blog.example/b", "2024-02-02T00:00:00Z", body("cooking") + "beta")
    with open(os.path.join(out_dir, "seg0.warc.wet"), "wb") as f:
        f.write(shard0)
    with open(os.path.join(out_dir, "seg1.warc.wet.gz"), "wb") as f:
        f.write(gzip.compress(shard1))


def main() -> None:
    spark = tep.get_spark("crawl-prep-example")
    spark.sparkContext.setLogLevel("ERROR")

    with tempfile.TemporaryDirectory() as td:
        _write_shards(td)
        docs = read_wet_corpus(spark, td)
        n_raw = docs.count()

        kept = filter_blocked_domains(docs, BLOCKLIST)
        n_unblocked = kept.count()

        pages = dedup_by_url(kept, keep="last")
        n_pages = pages.count()
        survivors = {r.url: r.text[-12:] for r in pages.collect()}

        corpus = prepare_training_corpus(
            pages.select("doc_id", "text", "source", "n_chars"),
            min_words=20,
            split_weights={"train": 0.5, "val": 0.25, "test": 0.25},
        )
        by_split = {
            r.split: r.n
            for r in corpus.groupBy("split").count().withColumnRenamed(
                "count", "n"
            ).collect()
        }

        print(f"wet records ingested: {n_raw}")
        print(f"after domain blocklist: {n_unblocked}")
        print(f"after same-page crawl dedup: {n_pages}")
        print(f"newest crawl won: {survivors['http://news.example/dup']!r}")
        print(f"splits: {by_split}")
        assert n_raw == 5 and n_unblocked == 4 and n_pages == 3
        assert survivors["http://news.example/dup"].endswith("new crawl")
        print("OK crawl front end-to-end (batch)")

    html_demo(spark)
    link_graph_demo(spark)
    wat_demo(spark)
    cdx_demo(spark)
    streaming_demo(spark)
    spark.stop()


def cdx_demo(spark) -> None:
    """Select-before-scan: instead of parsing every WARC shard, read the
    capture INDEX, pick the captures worth having (latest per URL,
    content-digest deduped, minus what a prior crawl already
    contributed), and fetch only those byte ranges — then ask the
    site's sitemap what the crawl is still missing or stale on."""
    import gzip

    from pyspark.sql import functions as F

    from text_extensions_for_pandas_spark.sources.cdx import (
        crawl_freshness,
        fetch_plan,
        fetch_warc_ranges,
        make_cdx_line,
        read_cdx_index,
        select_captures,
    )
    from text_extensions_for_pandas_spark.operators.urls import (
        parse_sitemaps,
    )
    from text_extensions_for_pandas_spark.sources.corpus import (
        make_warc_record,
    )

    with tempfile.TemporaryDirectory() as td:
        # two WARC files of individually-gzipped members + the index
        cdx_lines = []
        total_bytes = 0
        for fi in range(2):
            fname = f"seg{fi}.warc.gz"
            blobs, offset = [], 0
            for k in range(fi * 6, fi * 6 + 6):
                member = gzip.compress(
                    make_warc_record(
                        f"<html><body>article {k}</body></html>",
                        url=f"http://site.example/a/{k}",
                        warc_type="response",
                        http_status=200,
                    )
                )
                blobs.append(member)
                cdx_lines.append(
                    make_cdx_line(
                        f"http://site.example/a/{k}",
                        f"2024060100000{k % 10}",
                        digest=f"sha1:{k % 8:032d}",  # 8,9 mirror 0,1
                        filename=fname,
                        offset=offset,
                        length=len(member),
                    )
                )
                offset += len(member)
            with open(os.path.join(td, fname), "wb") as fh:
                fh.write(b"".join(blobs))
            total_bytes += offset
        with open(os.path.join(td, "cdx-0"), "w") as fh:
            fh.write("\n".join(cdx_lines) + "\n")

        cdx = read_cdx_index(spark, os.path.join(td, "cdx-0"))
        prior = spark.createDataFrame(
            [("sha1:" + "2".zfill(32),)], ["digest"]
        )  # a prior dump already has article 2's content
        sel = select_captures(cdx, prior_digests=prior)
        plan = fetch_plan(sel, max_records_per_task=4)
        docs = fetch_warc_ranges(
            spark, plan, base_dir=td, record_types=("response",)
        )
        fetched = plan.agg(F.sum("fetch_bytes")).collect()[0][0]
        n_docs = docs.count()
        print(
            f"cdx: {len(cdx_lines)} captures -> {sel.count()} selected, "
            f"{n_docs} fetched, {fetched}/{total_bytes} bytes read"
        )
        assert n_docs == sel.count() and fetched < total_bytes

        # sitemap truth vs the crawl: one unseen page, one stale page
        sitemap = spark.createDataFrame(
            [(
                "site.example",
                "<urlset>"
                + "".join(
                    f"<url><loc>http://site.example/a/{k}</loc>"
                    f"<lastmod>{'2024-07-01' if k == 3 else '2024-01-01'}"
                    "</lastmod></url>"
                    for k in range(5)
                )
                + "<url><loc>http://site.example/a/999</loc></url>"
                "</urlset>",
            )],
            ["host", "sitemap_xml"],
        )
        fresh = crawl_freshness(parse_sitemaps(sitemap), cdx)
        counts = {
            r["freshness"]: r["n"]
            for r in fresh.groupBy("freshness").agg(
                F.count("*").alias("n")
            ).collect()
        }
        print(f"recrawl frontier: {counts}")
        assert counts["missing"] == 1 and counts["stale"] == 1
        print("OK cdx select-before-scan + recrawl frontier")


def wat_demo(spark) -> None:
    """Common Crawl ships pre-extracted links as WAT metadata records in
    the same WARC container: read THOSE for the link-graph/authority
    front and skip the HTML re-parse entirely (measured 5.7× cheaper at
    probe scale), then compose the PageRank host scores into the
    training mix as importance-sampling priors — the standard
    domain-weighting step between link graph and corpus."""
    from pyspark.sql import functions as F

    from text_extensions_for_pandas_spark.operators.graph import pagerank
    from text_extensions_for_pandas_spark.operators.html import (
        link_graph_from_edges,
    )
    from text_extensions_for_pandas_spark.operators.sampling import (
        importance_sample,
    )
    from text_extensions_for_pandas_spark.sources.corpus import (
        make_wat_record,
        read_wat_links,
    )

    with tempfile.TemporaryDirectory() as td:
        pages = [
            ("http://hub.example/",
             [("http://a.example/1", "a"), ("http://b.example/2", "b")]),
            ("http://a.example/1", [("http://b.example/2", "b")]),
            ("http://b.example/2", [("http://hub.example/", "hub")]),
        ]
        shard = b"".join(make_wat_record(u, ls) for u, ls in pages)
        with open(os.path.join(td, "seg.warc.wat.gz"), "wb") as fh:
            fh.write(gzip.compress(shard))

        links = read_wat_links(spark, td)
        edges = link_graph_from_edges(links)
        ranks = pagerank(edges, src="src_host", dst="dst_host",
                         weight_col="n_links", iterations=10)
        n_hosts = ranks.count()

        # rank → retention weight (mean 1) → importance-sampled corpus
        weights = ranks.select(
            F.col("node").alias("host"),
            (F.col("pagerank") * n_hosts).alias("weight"),
        )
        docs = spark.createDataFrame(
            [(i, f"http://{h}/p{i}")
             for i, h in enumerate(
                 ["hub.example", "a.example", "b.example"] * 40)],
            "doc_id long, url string",
        ).withColumn(
            "host", F.lower(F.try_parse_url("url", F.lit("HOST")))
        )
        mixed = importance_sample(
            docs.join(F.broadcast(weights), "host"), "weight"
        )
        kept_by_host = {
            r.host: r.n
            for r in mixed.groupBy("host").agg(
                F.count("*").alias("n")
            ).collect()
        }
        print(f"WAT edges: {edges.count()}, hosts ranked: {n_hosts}")
        print(f"pagerank-weighted retention by host: {kept_by_host}")
        assert n_hosts == 3 and sum(kept_by_host.values()) > 0
        print("OK WAT link front + pagerank-weighted mix (no HTML parse)")


def link_graph_demo(spark) -> None:
    """The authority/compliance half of the crawl front: extract the
    host-level link graph from raw HTML, rank hosts with PageRank (the
    quality prior crawl pipelines weight domains by), and drop pages the
    owning host's robots.txt disallows for this pipeline's agent."""
    from pyspark.sql import functions as F

    from text_extensions_for_pandas_spark.operators.graph import pagerank
    from text_extensions_for_pandas_spark.operators.html import link_graph
    from text_extensions_for_pandas_spark.operators.urls import (
        filter_by_robots,
    )

    pages = spark.createDataFrame(
        [
            ("http://hub.example/",
             "<a href='http://a.example/1'>a</a>"
             "<a href='http://b.example/2'>b</a>"),
            ("http://a.example/1", "<a href='http://b.example/2'>b</a>"),
            ("http://b.example/2", "<a href='http://hub.example/'>hub</a>"),
            ("http://b.example/private/x", "<p>no links</p>"),
        ],
        "url string, text string",
    )
    edges = link_graph(pages)
    ranks = pagerank(edges, src="src_host", dst="dst_host",
                     weight_col="n_links", iterations=10)
    top = ranks.orderBy(F.desc("pagerank")).first()
    print(f"top host by pagerank: {top.node} ({top.pagerank:.4f})")

    robots = spark.createDataFrame(
        [("b.example", "User-agent: *\nDisallow: /private/\n")],
        "host string, robots_txt string",
    )
    allowed = filter_by_robots(pages, robots)
    kept = sorted(r.url for r in allowed.collect())
    assert "http://b.example/private/x" not in kept and len(kept) == 3
    print(f"robots.txt kept {len(kept)}/4 pages")
    print("OK crawl front link graph + robots compliance")


def html_demo(spark) -> None:
    """Raw WARC ``response`` records carry HTML, not extracted text —
    read them with ``record_types=("response",)`` and run the HTML→text
    stage before the prep funnel sees them."""
    from text_extensions_for_pandas_spark.operators.html import (
        extract_html_documents,
    )

    with tempfile.TemporaryDirectory() as td:
        page = (
            "<html><head><style>p{}</style></head><body>"
            "<nav>Home | About</nav><h1>Crawled page</h1>"
            "<p>the real article text survives &amp; the chrome does not"
            "</p><script>track();</script></body></html>"
        )
        # real WARC responses carry the HTTP envelope; the reader strips
        # it, honors the charset, and can filter on the status code
        with open(os.path.join(td, "seg.warc"), "wb") as f:
            f.write(
                _record("http://site.example/p", "2024-01-01T00:00:00Z",
                        page, warc_type="response", http_status=200)
                + _record("http://site.example/404", "2024-01-01T00:00:00Z",
                          "gone", warc_type="response", http_status=404)
            )
        raw = read_wet_corpus(
            spark, td, record_types=("response",), keep_http_statuses=(200,)
        )
        doc = extract_html_documents(raw).first()
        print(f"html extracted: {doc.text!r}")
        assert doc.text == (
            "Crawled page\nthe real article text survives & the chrome "
            "does not"
        )
        assert doc.n_chars == len(doc.text)
        print("OK crawl front end-to-end (raw HTML responses)")

    # the text-cleanup chain between extraction and the prep funnel:
    # mojibake/control repair -> line-break hyphenation rejoin ->
    # offset-exact sentence segmentation
    from pyspark.sql import functions as F

    from text_extensions_for_pandas_spark.functions.text import (
        dehyphenate,
        fix_text,
        split_sentences,
    )

    damaged = spark.createDataFrame(
        [(1, "The cafÃ© re-\nopened. Dr. Ada approves! Done")],
        "doc_id long, text string",
    )
    cleaned = damaged.withColumn(
        "text", dehyphenate(fix_text("text", form=None))
    )
    sents = [r.sentence for r in split_sentences(cleaned).collect()]
    print(f"cleaned sentences: {sents}")
    assert sents == ["The café reopened.", "Dr. Ada approves!", "Done"]
    # spans always slice back exactly
    bad = split_sentences(cleaned).join(cleaned, "doc_id").filter(
        F.expr("substring(text, begin + 1, end - begin) <> sentence")
    )
    assert bad.count() == 0
    print("OK text-cleanup chain (fix_text -> dehyphenate -> sentences)")


def streaming_demo(spark) -> None:
    """The continuous-crawl story: shards LAND over time; each
    ``availableNow`` pass picks up only the new files (the stream
    checkpoint remembers what was ingested), cleans, dedups against the
    persisted cross-batch state, and appends exactly-once."""
    from text_extensions_for_pandas_spark.operators.dedup import (
        boilerplate_lines,
    )
    from text_extensions_for_pandas_spark.streaming.ops import (
        read_wet_stream,
        streaming_prep_ingest,
    )

    words = " ".join(f"the data page w{i}xx" for i in range(8))
    nav = "NAVBAR MENU"

    with tempfile.TemporaryDirectory() as td:
        crawl = os.path.join(td, "crawl")
        out = os.path.join(td, "out")
        os.makedirs(crawl)

        # wave 1: one shard on disk before the first ingest pass
        with open(os.path.join(crawl, "shard0.warc.wet"), "wb") as f:
            f.write(
                _record("http://a.example/1", "2024-01-01T00:00:00Z",
                        f"{nav}\n{words} alpha")
                + _record("http://a.example/2", "2024-01-01T00:00:00Z",
                          f"{nav}\n{words} beta")
            )
        # static boilerplate table from the seed shard, per the contract
        bp = boilerplate_lines(
            read_wet_corpus(spark, crawl), min_docs=2, group_col="source"
        ).cache()
        bp.count()

        def ingest_pass() -> None:
            q = streaming_prep_ingest(
                read_wet_stream(spark, crawl, max_files_per_trigger=1),
                bp,
                state_dir=os.path.join(td, "state"),
                out_path=out,
                checkpoint=os.path.join(td, "ckpt"),
                min_words=10,
                required_words=("the", "data"),
                n_shards=2,
                url_col="url",  # same-page crawl dedup across batches
            ).start()
            q.awaitTermination(300)

        ingest_pass()
        n_wave1 = spark.read.parquet(out).count()

        # wave 2 ARRIVES: a fresh page; a recrawl whose cleaned text
        # equals wave-1 alpha (cross-batch TEXT dedup drops it); and a
        # recrawl of wave-1's /1 URL with CHANGED text (the URL stage
        # drops it — first arrival of a page wins at ingest)
        with open(os.path.join(crawl, "shard1.warc.wet.gz"), "wb") as f:
            f.write(
                gzip.compress(
                    _record("http://b.example/3", "2024-02-01T00:00:00Z",
                            f"{words} gamma")
                    + _record("http://c.example/4", "2024-02-01T00:00:00Z",
                              f"{words} alpha")
                    + _record("http://a.example/1", "2024-02-01T00:00:00Z",
                              f"{words} alpha version two")
                )
            )
        ingest_pass()

        got = spark.read.parquet(out).collect()
        texts = sorted(r.text for r in got)
        print(f"streaming ingest: wave1={n_wave1} docs, total={len(got)}")
        assert n_wave1 == 2
        assert texts == sorted(
            [f"{words} alpha", f"{words} beta", f"{words} gamma"]
        ), texts
        assert all(nav not in t for t in texts)
        assert not any("version two" in t for t in texts)  # URL-stage drop
        print("OK crawl front end-to-end (streaming, 2 arrival waves)")


if __name__ == "__main__":
    main()
