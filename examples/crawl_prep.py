"""Crawl-to-corpus walkthrough — the web front of a training-data
pipeline, end to end on synthetic Common Crawl WET shards:

    WET shards (gzip WARC)  → documents table  (read_wet_corpus)
    → domain blocklist       (suffix-chain semi join)
    → same-page crawl dedup  (normalized URL, keep newest)
    → quality gate + dedup + split (prepare_training_corpus)

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
    read_wet_corpus,
)

BLOCKLIST = ["spam.example", "tracker.example"]


def _record(url: str, date: str, text: str) -> bytes:
    payload = text.encode()
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: conversion\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {date}\r\n"
        f"WARC-Record-ID: <urn:uuid:{abs(hash(url + date))}>\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode()
    return head + payload + b"\r\n\r\n"


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
        print("OK crawl front end-to-end")

    spark.stop()


if __name__ == "__main__":
    main()
