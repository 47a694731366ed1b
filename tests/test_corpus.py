"""Raw-corpus ingestion robustness.

The stdlib WARC/WET parser ingests untrusted web bytes, so it must
TERMINATE and yield every well-formed record on arbitrarily malformed
input — corrupt records are skipped by resyncing forward to the next
record marker, never by dropping the rest of the shard, and never by
moving the cursor backwards (a crafted negative Content-Length must not
hang an executor task).
"""

from __future__ import annotations

import itertools
import random

from text_extensions_for_pandas_spark.sources.corpus import (
    _iter_warc_records,
)


def _rec(payload: bytes, warc_type: str = "conversion", length: int | None = None,
         extra: str = "") -> bytes:
    n = len(payload) if length is None else length
    return (
        b"WARC/1.0\r\n"
        + f"WARC-Type: {warc_type}\r\n".encode()
        + extra.encode()
        + f"Content-Length: {n}\r\n".encode()
        + b"\r\n"
        + payload
        + b"\r\n\r\n"
    )


def _payloads(data: bytes) -> list[bytes]:
    return [p for _, p in _iter_warc_records(data)]


def test_valid_stream_roundtrips():
    recs = [f"doc {i} body".encode() for i in range(5)]
    data = b"".join(_rec(p) for p in recs)
    assert _payloads(data) == recs


def test_negative_content_length_terminates_and_skips():
    # the regression: int("-5") parses fine, i = start + (-5) used to move
    # the cursor BACKWARDS — data.find(b"WARC/", ...) could re-find the
    # same record forever.  Now the record is treated as corrupt and the
    # parser resyncs forward.
    data = (
        _rec(b"good one")
        + _rec(b"evil", length=-5)
        + _rec(b"good two")
    )
    assert _payloads(data) == [b"good one", b"good two"]


def test_unparseable_and_missing_content_length_resync_forward():
    bad_unparseable = (
        b"WARC/1.0\r\nWARC-Type: conversion\r\nContent-Length: xyz\r\n\r\njunk\r\n\r\n"
    )
    bad_missing = b"WARC/1.0\r\nWARC-Type: conversion\r\n\r\njunk\r\n\r\n"
    data = _rec(b"first") + bad_unparseable + _rec(b"second") + bad_missing + _rec(b"third")
    # the docstring's tolerance claim: later good records survive a bad one
    assert _payloads(data) == [b"first", b"second", b"third"]


def test_http_envelope_stripped_charset_honored_and_status_parsed():
    """WARC 'response' payloads are HTTP messages: the envelope must not
    leak into document text, the Content-Type charset must drive body
    decoding, and the status code must be parseable for filtering."""
    from text_extensions_for_pandas_spark.sources.corpus import (
        _decode_payload,
    )

    body_latin1 = "café résumé".encode("latin-1")
    payload = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/html; charset=ISO-8859-1\r\n"
        b"Server: x\r\n\r\n" + body_latin1
    )
    text, status = _decode_payload(payload)
    assert text == "café résumé" and status == 200
    # no envelope (WET conversion text): unchanged, status None
    text, status = _decode_payload("plain café".encode())
    assert text == "plain café" and status is None
    # unknown charset label: fall back to utf-8-replace, keep the status
    text, status = _decode_payload(
        b"HTTP/1.1 404 Not Found\r\nContent-Type: text/html; "
        b"charset=no-such-enc\r\n\r\nmissing"
    )
    assert text == "missing" and status == 404
    # truncated envelope (no blank line): whole payload as utf-8 text
    text, status = _decode_payload(b"HTTP/1.1 200 OK\r\nHeader-only")
    assert status is None and text.startswith("HTTP/1.1")
    # no header charset: the <meta charset> declaration is sniffed from
    # the document head (browser pre-scan convention)
    meta_page = (
        b"<html><head><meta charset='ISO-8859-1'></head><body>"
        + "café".encode("latin-1")
        + b"</body></html>"
    )
    text, status = _decode_payload(
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + meta_page
    )
    assert "café" in text and status == 200
    # header charset WINS over a conflicting meta declaration
    text, _ = _decode_payload(
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n"
        b"<meta charset='utf-16'>plain utf8 body"
    )
    assert "plain utf8 body" in text


def test_chunked_transfer_encoding_reassembled():
    """Chunk-size lines must not leak into document text; truncated
    chunked captures yield the chunks they have."""
    from text_extensions_for_pandas_spark.sources.corpus import (
        _decode_payload,
    )

    body = b"7\r\nchunk 1\r\n9\r\n, chunk 2\r\n0\r\n\r\n"
    payload = (
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n"
        b"Content-Type: text/plain\r\n\r\n" + body
    )
    text, status = _decode_payload(payload)
    assert text == "chunk 1, chunk 2" and status == 200
    # chunk-extension tokens after ';' are ignored
    ext = b"7;ext=1\r\nchunk 1\r\n0\r\n\r\n"
    assert _decode_payload(
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" + ext
    )[0] == "chunk 1"
    # truncated mid-chunk: best-effort prefix, no raise
    trunc = (
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
        b"7\r\nchunk 1\r\nff\r\nonly part"
    )
    assert _decode_payload(trunc)[0].startswith("chunk 1")
    # declared chunked but body isn't: returned unchanged, not mangled
    lying = (
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
        b"plain body, no chunks"
    )
    assert _decode_payload(lying)[0] == "plain body, no chunks"


def test_read_wet_corpus_response_records_filter_by_status(spark, tmp_path):
    from text_extensions_for_pandas_spark.sources.corpus import (
        read_wet_corpus,
    )

    def resp(url, status, body):
        payload = (
            f"HTTP/1.1 {status} X\r\nContent-Type: text/html\r\n\r\n".encode()
            + body.encode()
        )
        return (
            b"WARC/1.0\r\nWARC-Type: response\r\n"
            + f"WARC-Target-URI: {url}\r\n".encode()
            + f"Content-Length: {len(payload)}\r\n\r\n".encode()
            + payload
            + b"\r\n\r\n"
        )

    shard = (
        resp("http://a.example/ok", 200, "<p>good page</p>")
        + resp("http://a.example/gone", 404, "<p>not found</p>")
        + resp("http://a.example/moved", 301, "<p>redirect stub</p>")
    )
    (tmp_path / "s.warc").write_bytes(shard)
    all_rows = read_wet_corpus(
        spark, str(tmp_path), record_types=("response",)
    ).collect()
    assert {r.url for r in all_rows} == {
        "http://a.example/ok", "http://a.example/gone",
        "http://a.example/moved",
    }
    # envelopes stripped everywhere
    assert all("HTTP/1.1" not in r.text for r in all_rows)
    ok_rows = read_wet_corpus(
        spark, str(tmp_path), record_types=("response",),
        keep_http_statuses=(200,),
    ).collect()
    assert [r.url for r in ok_rows] == ["http://a.example/ok"]
    assert ok_rows[0].text == "<p>good page</p>"


def test_corrupt_length_payload_quoting_warc_headers_yields_no_phantom():
    """A corrupt-length record whose (unbounded) payload QUOTES WARC
    headers must not produce phantom records parsed from payload bytes:
    the resync hunts for the record-boundary marker CRLFCRLF+'WARC/',
    not a bare 'WARC/' that can occur mid-payload (e.g. a crawl shard
    whose pages discuss the WARC format)."""
    phantom_bait = (
        b"see the spec: WARC/1.0\r\n"
        b"Content-Length: 7\r\n"
        b"WARC-Type: conversion\r\n\r\nPHANTOM"
    )
    corrupt = (
        b"WARC/1.0\r\nWARC-Type: conversion\r\nContent-Length: -1\r\n\r\n"
        + phantom_bait
        + b"\r\n\r\n"
    )
    data = _rec(b"before") + corrupt + _rec(b"after")
    assert _payloads(data) == [b"before", b"after"]


def test_corrupt_length_payload_quoting_warc_header_at_offset_zero():
    """The quoted header can sit at payload offset 0 — then the corrupt
    header's OWN terminator is a valid-looking boundary marker.  The
    resync must not accept it (no phantom), at the documented cost of a
    doubly-malformed no-separator stream losing its next record."""
    corrupt = (
        b"WARC/1.0\r\nWARC-Type: conversion\r\nContent-Length: -9\r\n\r\n"
        b"WARC/1.0\r\nWARC-Type: conversion\r\nContent-Length: 4\r\n\r\n"
        b"bait\r\n\r\n"
    )
    data = _rec(b"before") + corrupt + _rec(b"after")
    assert _payloads(data) == [b"before", b"after"]


def test_conversion_payload_starting_with_http_decodes_verbatim():
    """Envelope stripping is gated on warc-type=response: a WET
    conversion page ABOUT the HTTP protocol keeps its head."""
    text = "HTTP/1.1 is a versioned protocol\r\n\r\nthe rest of the article"
    data = _rec(text.encode())
    from text_extensions_for_pandas_spark.sources.corpus import (
        _wet_parse_island,
    )
    import pandas as pd

    parse = _wet_parse_island(("conversion",), 1, None)
    [out] = list(parse(iter([pd.DataFrame({"path": ["p"], "content": [data]})])))
    assert out["text"].tolist() == [text]


def test_empty_status_allowlist_keeps_nothing_enveloped():
    """keep_http_statuses=() is an EMPTY allowlist, not 'no filter':
    every enveloped capture drops; envelope-less text still passes."""
    import pandas as pd

    from text_extensions_for_pandas_spark.sources.corpus import (
        _wet_parse_island,
    )

    resp = (
        b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 47\r\n\r\n"
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\npage"
        b"\r\n\r\n"
    )
    conv = _rec(b"wet text")
    parse = _wet_parse_island(("response", "conversion"), 1, ())
    [out] = list(
        parse(iter([pd.DataFrame({"path": ["p"], "content": [resp + conv]})]))
    )
    assert out["text"].tolist() == ["wet text"]


def test_garbage_between_records_and_truncated_tail():
    data = (
        _rec(b"alpha")
        + b"NOT A RECORD AT ALL\x00\xff garbage"
        + _rec(b"beta")
        + _rec(b"gamma gamma gamma")[:-12]  # truncated final record
    )
    got = _payloads(data)
    # beta survives even though the garbage sits between alpha and it
    assert got[:2] == [b"alpha", b"beta"]
    # truncated tail yields what it has (possibly short), never throws
    assert len(got) <= 3
    if len(got) == 3:
        assert b"gamma" in got[2]


def test_fuzz_corrupted_streams_terminate_and_keep_untouched_records():
    """Seeded fuzz: truncations, garbage insertions, byte flips, and
    absurd/negative lengths anywhere in a multi-record stream.  The
    parser must terminate without raising; on pure truncation it must
    yield a prefix of the original records (last possibly short)."""
    rng = random.Random(0xC0FFEE)
    recs = [f"record {i} ".encode() * (i + 1) for i in range(6)]
    base = b"".join(_rec(p) for p in recs)

    for trial in range(300):
        data = bytearray(base)
        for _ in range(rng.randint(1, 3)):
            op = rng.randrange(4)
            pos = rng.randrange(len(data) + 1)
            if op == 0:  # truncate
                data = data[:pos]
            elif op == 1:  # insert garbage
                junk = bytes(rng.randrange(256) for _ in range(rng.randint(1, 40)))
                data = data[:pos] + junk + data[pos:]
            elif op == 2 and data:  # flip a byte
                data[min(pos, len(data) - 1)] ^= 0xFF
            else:  # splice in a corrupt header claiming a wild length
                hdr = _rec(b"x", length=rng.choice([-(10**9), -1, 10**12]))
                data = data[:pos] + hdr + data[pos:]
        # islice bounds the number of YIELDS; termination of the internal
        # scan is the property under test (a hang fails the test run)
        out = list(itertools.islice(_iter_warc_records(bytes(data)), 1000))
        for headers, _payload in out:
            assert isinstance(headers, dict)

    # pure-truncation property, every cut point modulo a stride
    for cut in range(0, len(base), 97):
        got = _payloads(base[:cut])
        assert len(got) <= len(recs)
        for want, have in zip(recs, got[:-1] if got else []):
            assert have == want


# ---------------------------------------------------------------------------
# WAT link ingestion
# ---------------------------------------------------------------------------

def test_read_wat_links_parses_resolves_and_filters(spark, tmp_path):
    """WAT metadata records yield per-link rows: relative hrefs resolve
    against WARC-Target-URI, fragment/javascript links drop, non-A@
    paths drop, malformed JSON records are skipped, anchors collapse
    whitespace — the same normalization as the HTML parser path."""
    import gzip
    import json

    from text_extensions_for_pandas_spark.sources.corpus import (
        make_warc_record,
        make_wat_record,
        read_wat_links,
    )

    good = make_wat_record(
        "http://a.example/dir/page",
        [
            ("http://b.example/x", "Cross  link"),   # absolute + ws collapse
            ("rel/path", "relative"),                # resolves to /dir/rel/path
            ("/root", "abs path"),                   # host-absolute
            ("#frag", "same page"),                  # dropped
            ("javascript:void(0)", "js"),            # dropped
        ],
        warc_date="2024-02-02T00:00:00Z",
        record_id="<urn:uuid:wat-1>",
    )
    # a LINK@/href entry must be excluded under the default link_paths
    rel_only = json.dumps(
        {
            "Envelope": {
                "Payload-Metadata": {
                    "HTTP-Response-Metadata": {
                        "HTML-Metadata": {
                            "Links": [
                                {"path": "LINK@/href",
                                 "url": "http://c.example/css"},
                                {"path": "A@/href",
                                 "url": "http://c.example/ok",
                                 "text": "ok"},
                            ]
                        }
                    }
                }
            }
        }
    )
    other = make_warc_record(
        rel_only, url="http://d.example/", warc_type="metadata",
        content_type="application/json",
    )
    bad_json = make_warc_record(
        "{not json", url="http://bad.example/", warc_type="metadata",
        content_type="application/json",
    )
    non_meta = make_warc_record(
        "plain text", url="http://e.example/", warc_type="conversion"
    )
    shard = good + bad_json + other + non_meta
    (tmp_path / "s.warc.wat.gz").write_bytes(gzip.compress(shard))

    out = read_wat_links(spark, str(tmp_path)).collect()
    got = sorted((r.url, r.link_url, r.anchor) for r in out)
    assert got == [
        ("http://a.example/dir/page", "http://a.example/dir/rel/path",
         "relative"),
        ("http://a.example/dir/page", "http://a.example/root", "abs path"),
        ("http://a.example/dir/page", "http://b.example/x", "Cross link"),
        ("http://d.example/", "http://c.example/ok", "ok"),
    ]
    dates = {r.url: r.warc_date for r in out}
    assert dates["http://a.example/dir/page"] == "2024-02-02T00:00:00Z"


def test_wat_link_graph_agrees_with_html_link_graph(spark, tmp_path):
    """The WAT path and the HTML-parse path produce the SAME host graph
    from the same logical links — the no-reparse guarantee."""
    import gzip

    from text_extensions_for_pandas_spark.operators.html import (
        link_graph,
        link_graph_from_edges,
    )
    from text_extensions_for_pandas_spark.sources.corpus import (
        make_wat_record,
        read_wat_links,
    )

    pages = []
    for i in range(12):
        url = f"http://h{i % 4}.example/p/{i}"
        links = [
            (f"http://h{(i + 1) % 4}.example/t/{i}", f"next {i}"),
            (f"/local/{i}", "self nav"),                 # intra-host
            (f"//h{(i + 2) % 4}.example/pp", "proto-rel"),
        ]
        pages.append((url, links))

    # WAT shard
    shard = b"".join(make_wat_record(u, ls) for u, ls in pages)
    (tmp_path / "g.warc.wat.gz").write_bytes(gzip.compress(shard))
    wat_edges = read_wat_links(spark, str(tmp_path))
    wat_graph = link_graph_from_edges(
        wat_edges, src_url_col="url", dst_url_col="link_url"
    )

    # equivalent raw HTML
    html_rows = [
        (
            u,
            "".join(f'<a href="{h}">{a}</a>' for h, a in ls),
        )
        for u, ls in pages
    ]
    html_df = spark.createDataFrame(html_rows, "url string, text string")
    html_graph = link_graph(html_df)

    w = sorted(map(tuple, wat_graph.collect()))
    h = sorted(map(tuple, html_graph.collect()))
    assert w == h and len(w) > 0

    # the anchor index agrees across the two paths as well
    from text_extensions_for_pandas_spark.operators.html import (
        anchor_text_index,
        anchor_text_index_from_edges,
    )

    def norm(rows):
        return sorted(
            (r.url, tuple((a.anchor, a.n) for a in r.anchors), r.n_incoming)
            for r in rows
        )

    wat_idx = anchor_text_index_from_edges(wat_edges, k=3)
    html_idx = anchor_text_index(html_df, k=3)
    wi, hi = norm(wat_idx.collect()), norm(html_idx.collect())
    assert wi == hi and len(wi) > 0


def test_read_wat_links_never_fails_on_hostile_shards(spark, tmp_path):
    """Hazard sweep: truncated JSON, wrong envelope shapes, non-dict
    link entries, numeric urls, binary garbage payloads — every record
    is skipped, never fatal, and the good record always survives."""
    import gzip
    import json

    from text_extensions_for_pandas_spark.sources.corpus import (
        make_warc_record,
        make_wat_record,
        read_wat_links,
    )

    def meta(payload):
        return make_warc_record(
            payload, url="http://h.example/", warc_type="metadata",
            content_type="application/json",
        )

    hazards = [
        meta('{"Envelope": {"Payload-Metadata": {"HTTP-Response-Met'),
        meta('{"Envelope": null}'),
        meta('{"Envelope": {"Payload-Metadata": {"HTTP-Response-Metadata":'
             ' {"HTML-Metadata": {"Links": "not-a-list"}}}}}'),
        meta(json.dumps({"Envelope": {"Payload-Metadata": {
            "HTTP-Response-Metadata": {"HTML-Metadata": {"Links": [
                "bare-string",
                {"path": "A@/href", "url": 12345},
                {"path": "A@/href"},
                {"path": "A@/href", "url": "javascript:x", "text": "t"},
                None,
            ]}}}}})),
        meta(b"\x00\xff\xfe binary junk"),
        make_warc_record("plain", url="http://x.example/",
                         warc_type="conversion"),
    ]
    good = make_wat_record(
        "http://ok.example/p", [("http://t.example/q", "fine")]
    )
    blob = b"".join(hazards[:3]) + good + b"".join(hazards[3:])
    (tmp_path / "hz.warc.wat.gz").write_bytes(gzip.compress(blob))

    rows = read_wat_links(spark, str(tmp_path)).collect()
    assert [(r.url, r.link_url, r.anchor) for r in rows] == [
        ("http://ok.example/p", "http://t.example/q", "fine")
    ]


def test_write_jsonl_shards_roundtrip_and_manifest(spark, tmp_path):
    """Export -> re-read round-trips every document; the manifest's
    per-shard counts match; the content hash is order-insensitive
    (re-export of a repartitioned frame agrees) and flips on any
    altered document."""
    from pyspark.sql import functions as F

    from text_extensions_for_pandas_spark.sources.corpus import (
        read_jsonl_corpus,
        write_jsonl_shards,
    )

    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("document body "), F.col("id").cast("string")).alias(
            "text"
        ),
        (F.col("id") % 4).cast("int").alias("shard"),
    )
    out = str(tmp_path / "export")
    m1 = {r["shard"]: tuple(r) for r in write_jsonl_shards(docs, out).collect()}
    assert len(m1) == 4 and all(r[1] == 50 for r in m1.values())

    back = spark.read.json(f"{out}/data")
    assert back.count() == 200
    got_texts = sorted(r["text"] for r in back.collect())
    want_texts = sorted(r["text"] for r in docs.collect())
    assert got_texts == want_texts
    # the exported files are consumable by the corpus reader too
    rd = read_jsonl_corpus(spark, f"{out}/data/shard=0/*.json.gz")
    assert rd.count() == 50

    # order-insensitivity: shuffled input, same manifest hashes
    m2 = {
        r["shard"]: tuple(r)
        for r in write_jsonl_shards(
            docs.repartition(7), str(tmp_path / "export2")
        ).collect()
    }
    assert m1 == m2
    # tamper detection: one changed char flips that shard's hash only
    tampered = docs.withColumn(
        "text",
        F.when(F.col("doc_id") == 0, F.lit("TAMPERED")).otherwise(
            F.col("text")
        ),
    )
    m3 = {
        r["shard"]: tuple(r)
        for r in write_jsonl_shards(
            tampered, str(tmp_path / "export3")
        ).collect()
    }
    assert m3[0] != m1[0]
    assert all(m3[s] == m1[s] for s in (1, 2, 3))


def test_write_warc_segments_roundtrip_all_paths(spark, tmp_path):
    """The writer's output must be consumable by the WHOLE crawl front:
    full-shard read_wet_corpus, and index-driven select+ranged-fetch,
    both reproducing the input texts byte-for-byte; the CDX digests
    dedup identical content."""
    from pyspark.sql import functions as F

    from text_extensions_for_pandas_spark.sources.cdx import (
        fetch_plan,
        fetch_warc_ranges,
        read_cdx_index,
        select_captures,
    )
    from text_extensions_for_pandas_spark.sources.corpus import (
        read_wet_corpus,
        write_warc_segments,
    )

    docs = spark.range(40).select(
        F.concat(
            F.lit("http://h"), (F.col("id") % 5).cast("string"),
            F.lit(".example/p/"), F.col("id").cast("string"),
        ).alias("url"),
        F.concat(
            F.lit("<html><body>body "),
            # ids 30..39 duplicate the CONTENT of 0..9 at new urls
            (F.col("id") % 30).cast("string"),
            F.lit("</body></html>"),
        ).alias("text"),
        F.concat(
            F.lit("2024-07-0"), (F.col("id") % 9 + 1).cast("string"),
            F.lit("T00:00:00Z"),
        ).alias("warc_date"),
    ).repartition(3)
    out = str(tmp_path / "segments")
    summary = write_warc_segments(
        docs, out, date_col="warc_date"
    )
    assert sum(s["n_records"] for s in summary) == 40
    assert 1 < len(summary) <= 3  # one segment per non-empty partition

    # full-shard path
    full = read_wet_corpus(
        spark, f"{out}/seg-*.warc.gz", record_types=("response",)
    )
    assert sorted(r["text"] for r in full.collect()) == sorted(
        r["text"] for r in docs.collect()
    )

    # index-driven path: digest dedup collapses the 10 duplicate bodies
    cdx = read_cdx_index(spark, f"{out}/cdx")
    assert cdx.count() == 40
    sel = select_captures(cdx, mimes=None)
    assert sel.count() == 30
    fetched = fetch_warc_ranges(
        spark, fetch_plan(sel), base_dir=out, record_types=("response",)
    )
    texts = sorted(r["text"] for r in fetched.collect())
    assert texts == sorted(
        f"<html><body>body {k}</body></html>" for k in range(30)
    )


def test_write_warc_segments_wat_roundtrip(spark, tmp_path):
    """With ``links_col``, the writer emits WAT metadata records whose
    ``read_wat_links`` graph equals the HTML-parsed ``link_graph`` over
    the same pages — the self-written crawl-format loop is closed for
    all three formats (WARC payloads, CDX index, WAT links)."""
    from pyspark.sql import functions as F

    from text_extensions_for_pandas_spark.operators.html import (
        extract_links,
        link_graph,
        link_graph_from_edges,
    )
    from text_extensions_for_pandas_spark.sources.corpus import (
        read_wat_links,
        write_warc_segments,
    )

    rows = []
    for i in range(12):
        url = f"http://h{i % 4}.example/p/{i}"
        html = (
            f'<html><body><a href="http://h{(i + 1) % 4}.example/t/{i}">'
            f"next {i}</a>"
            f'<a href="/local/{i}">self nav</a>'
            f'<a href="//h{(i + 2) % 4}.example/pp">proto-rel</a>'
            "</body></html>"
        )
        rows.append((url, html))
    docs = spark.createDataFrame(rows, "url string, text string").withColumn(
        "links", extract_links(F.col("text"), F.col("url"))
    ).repartition(2)

    out = str(tmp_path / "segments")
    summary = write_warc_segments(docs, out, links_col="links")
    assert sum(s["n_records"] for s in summary) == 12

    wat_edges = read_wat_links(spark, f"{out}/wat")
    wat_graph = link_graph_from_edges(
        wat_edges, src_url_col="url", dst_url_col="link_url"
    )
    html_graph = link_graph(docs.select("url", "text"))
    w = sorted(map(tuple, wat_graph.collect()))
    h = sorted(map(tuple, html_graph.collect()))
    assert w == h and len(w) > 0


def test_corpus_diff_and_host_churn(spark):
    """Snapshot diff statuses (added/removed/changed/unchanged via a
    single full-outer join) and the per-host churn rollup."""
    from pyspark.sql import functions as F

    from text_extensions_for_pandas_spark.sources.corpus import (
        corpus_diff,
        snapshot_churn_by_host,
    )

    old = spark.createDataFrame(
        [
            ("http://a.example/1", "d1"),
            ("http://a.example/2", "d2"),
            ("http://b.example/3", "d3"),
            ("http://b.example/gone", "d4"),
        ],
        ["url", "digest"],
    )
    new = spark.createDataFrame(
        [
            ("http://a.example/1", "d1"),        # unchanged
            ("http://a.example/2", "d2-v2"),     # changed
            ("http://b.example/3", "d3"),        # unchanged
            ("http://b.example/new", "d5"),      # added
        ],
        ["url", "digest"],
    )
    diff = corpus_diff(old, new)
    got = {r["url"]: r["status"] for r in diff.collect()}
    assert got == {
        "http://a.example/1": "unchanged",
        "http://a.example/2": "changed",
        "http://b.example/3": "unchanged",
        "http://b.example/gone": "removed",
        "http://b.example/new": "added",
    }
    churn = {
        r["host"]: (r["n_added"], r["n_removed"], r["n_changed"],
                    r["n_unchanged"], r["churn"])
        for r in snapshot_churn_by_host(diff).collect()
    }
    assert churn["a.example"] == (0, 0, 1, 1, 0.5)
    assert churn["b.example"] == (1, 1, 0, 1, round(2 / 3, 6))
    # no accidental cartesian/nested loop in the diff plan
    plan = diff._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def test_write_warc_segments_non200_status_in_index(spark, tmp_path):
    """A non-200 export's CDX lines must carry the REAL status so the
    index never contradicts the payloads — and select_captures' default
    status filter drops them instead of wrongly keeping them."""
    from pyspark.sql import functions as F

    from text_extensions_for_pandas_spark.sources.cdx import (
        read_cdx_index,
        select_captures,
    )
    from text_extensions_for_pandas_spark.sources.corpus import (
        write_warc_segments,
    )

    docs = spark.range(5).select(
        F.concat(F.lit("http://g.example/p/"), F.col("id")).alias("url"),
        F.concat(F.lit("gone "), F.col("id")).alias("text"),
    ).coalesce(1)
    out = str(tmp_path / "seg404")
    write_warc_segments(docs, out, http_status=404)
    cdx = read_cdx_index(spark, f"{out}/cdx")
    assert [r[0] for r in cdx.select("status").distinct().collect()] == [404]
    assert select_captures(cdx, mimes=None).count() == 0
    assert select_captures(cdx, statuses=(404,), mimes=None).count() == 5
