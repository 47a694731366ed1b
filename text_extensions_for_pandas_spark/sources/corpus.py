"""Raw-corpus ingestion: JSONL / plain-text files → the canonical
``documents(doc_id, text, ...)`` table.

The reference library ingests only structured NLP formats (CoNLL, Watson
JSON — ``io/conll.py``, ``io/watson/nlu.py``); a training-data pipeline
starts one step earlier, at heaps of JSONL or raw text files.  These readers
produce the same ``documents`` shape every operator in this engine consumes.

Doc-id discipline at scale: ``monotonically_increasing_id`` is
partition-layout-dependent and ``zipWithIndex`` forces an extra pass, so
neither survives retries or re-partitioning.  Ids here are **content
hashes** (``xxhash64`` of the text): a rerun over the same files yields the
same ids on any cluster layout — the property exact dedup, hash splits, and
incremental appends rely on.  Identical payloads therefore share an id,
which is exact-dedup-by-construction; pass ``unique_ids=True`` to salt with
``(source file, position in file)`` instead, at the cost of one per-file
window shuffle (only worth it when duplicate texts must stay distinct
rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = [
    "read_jsonl_corpus",
    "read_text_corpus",
    "read_wet_corpus",
    "read_wat_links",
    "make_warc_record",
    "make_wat_record",
    "stable_doc_id",
    "write_jsonl_shards",
    "write_warc_segments",
    "corpus_diff",
    "snapshot_churn_by_host",
]


def stable_doc_id(*cols) -> "F.Column":
    """Deterministic non-negative doc id from the given columns
    (``xxhash64`` with the sign cleared so ids sort/split cleanly)."""
    return F.abs(F.xxhash64(*cols))


def _to_documents(raw: DataFrame, text_col, unique_ids: bool, extra: list):
    if unique_ids:
        pos = F.row_number().over(
            Window.partitionBy("source").orderBy(text_col)
        )
        doc_id = stable_doc_id(text_col, F.col("source"), pos)
    else:
        doc_id = stable_doc_id(text_col)
    return raw.select(
        doc_id.alias("doc_id"),
        text_col.alias("text"),
        F.col("source"),
        F.length(text_col).cast("long").alias("n_chars"),
        *extra,
    )


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    text_field: str = "text",
    keep_fields: list[str] | None = None,
    unique_ids: bool = False,
) -> DataFrame:
    """Read newline-delimited JSON documents into the canonical table.

    Output: ``doc_id, text, source, n_chars`` plus any ``keep_fields``
    carried through from the JSON records.  Pass explicit ``keep_fields``
    so the scan stays pruned to the columns actually used (schema-on-read
    of every stray field is a real cost at corpus scale).
    """
    raw = spark.read.json(path).withColumn("source", F.input_file_name())
    return _to_documents(
        raw, F.col(text_field), unique_ids, keep_fields or []
    )


def read_text_corpus(
    spark: SparkSession,
    path: str,
    doc_per: str = "line",
    unique_ids: bool = False,
) -> DataFrame:
    """Read plain-text files: one document per line (``doc_per='line'``,
    the common sharded-corpus layout; empty lines skipped) or per file
    (``doc_per='file'``, via ``wholetext`` — one row per file must fit an
    executor)."""
    if doc_per == "line":
        raw = (
            spark.read.text(path)
            .withColumn("source", F.input_file_name())
            .filter(F.length("value") > 0)
        )
    elif doc_per == "file":
        raw = (
            spark.read.option("wholetext", True)
            .text(path)
            .withColumn("source", F.input_file_name())
        )
    else:
        raise ValueError(f"doc_per must be 'line' or 'file', got {doc_per!r}")
    return _to_documents(raw, F.col("value"), unique_ids, [])


# ---------------------------------------------------------------------------
# WARC / WET (Common Crawl) ingestion
# ---------------------------------------------------------------------------

def make_warc_record(
    body: str | bytes,
    url: str | None = None,
    warc_type: str = "conversion",
    warc_date: str | None = None,
    record_id: str | None = None,
    http_status: int | None = None,
    content_type: str = "text/html; charset=utf-8",
) -> bytes:
    """Serialize one WARC record — the fixture-side twin of
    :func:`_iter_warc_records`, shared by the repo's own test fixtures,
    gated-query fixtures, examples, and scale probes so a header-format
    change lands in ONE place.  ``http_status`` wraps the body in an
    HTTP/1.1 response envelope (the raw-capture shape ``response``
    records carry); omit it for WET ``conversion`` text."""
    payload = body.encode() if isinstance(body, str) else body
    if http_status is not None:
        payload = (
            f"HTTP/1.1 {http_status} X\r\n"
            f"Content-Type: {content_type}\r\n\r\n".encode() + payload
        )
    head = b"WARC/1.0\r\n" + f"WARC-Type: {warc_type}\r\n".encode()
    if url is not None:
        head += f"WARC-Target-URI: {url}\r\n".encode()
    if warc_date is not None:
        head += f"WARC-Date: {warc_date}\r\n".encode()
    if record_id is not None:
        head += f"WARC-Record-ID: {record_id}\r\n".encode()
    head += f"Content-Length: {len(payload)}\r\n\r\n".encode()
    return head + payload + b"\r\n\r\n"


def _iter_warc_records(data: bytes):
    """Yield ``(headers: dict, payload: bytes)`` for each record of a WARC
    byte stream (ISO 28500: ``WARC/1.x`` header block, blank line,
    ``Content-Length`` payload, blank separator).  Tolerant of trailing
    garbage and truncated final records — a crawl shard with a bad tail
    should yield its good records, not throw."""
    i, n = 0, len(data)
    while i < n:
        head_end = data.find(b"\r\n\r\n", i)
        if head_end < 0:
            return
        head = data[i:head_end].decode("utf-8", errors="replace")
        lines = head.split("\r\n")
        if not lines or not lines[0].startswith("WARC/"):
            # resync: find the next record marker.  Search from the
            # current cursor (not head_end) — garbage between records
            # would otherwise swallow the next record's header, whose
            # marker can sit BEFORE the blank line that ended this scan.
            nxt = data.find(b"WARC/", i + 1)
            if nxt < 0:
                return
            i = nxt
            continue
        headers = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            if _:
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            length = -1
        if length < 0:
            # Missing, unparseable, or negative Content-Length: the record
            # is corrupt but later records may be fine.  Resync FORWARD —
            # returning here would drop the rest of the shard, and a
            # negative length would move the cursor backwards and could
            # loop forever on crafted input.  The corrupt record's payload
            # is UNBOUNDED here (no usable length), so resync on the
            # record-BOUNDARY marker ``\r\n\r\nWARC/`` rather than a bare
            # ``WARC/``: payload text that quotes WARC headers would
            # otherwise yield phantom records parsed from payload bytes.
            # (The malformed-header resync below stays lenient on purpose:
            # garbage between records need not end with a blank line.)
            # Search from head_end + 1: a match AT head_end is the corrupt
            # header's own terminator with the payload QUOTING a header at
            # offset 0 — the phantom case again.  (The cost: a doubly
            # malformed stream whose next record abuts the corrupt header
            # with no separator loses that record — preferable to
            # emitting payload bytes as documents.)
            nxt = data.find(b"\r\n\r\n" + b"WARC/", head_end + 1)
            if nxt < 0:
                return
            i = nxt + 4
            continue
        start = head_end + 4
        payload = data[start : start + length]
        yield headers, payload
        i = start + length
        # skip the record separator (two CRLFs) if present
        while data[i : i + 2] == b"\r\n":
            i += 2


def _dechunk(body: bytes) -> bytes:
    """Reassemble an HTTP/1.1 chunked body (hex size line, CRLF, chunk,
    CRLF, ... , 0-size terminator).  Best-effort on malformed input: a
    body whose first size line doesn't parse is returned unchanged; a
    truncated stream yields the chunks it has — crawl captures are
    routinely cut off mid-transfer and must not fail the task."""
    out: list[bytes] = []
    i = 0
    n_total = len(body)
    while i < n_total:
        j = body.find(b"\r\n", i)
        if j < 0:
            # truncated size line: if nothing parsed yet the body was
            # never chunked to begin with — return it unchanged
            return b"".join(out) if out else body
        token = body[i:j].split(b";")[0].strip()
        try:
            n = int(token, 16)
        except ValueError:
            # not chunked after all (or corrupt): only trust what we have
            return b"".join(out) if out else body
        if n == 0:
            break  # terminator (trailers ignored)
        out.append(body[j + 2 : j + 2 + n])
        i = j + 2 + n + 2  # past chunk + trailing CRLF
    return b"".join(out)


def _decode_payload(payload: bytes) -> tuple[str, int | None]:
    """``(text, http_status)`` for a record payload.  WARC ``response``
    payloads are an HTTP/1.x message — status line, headers, blank line,
    body; treating the whole payload as text would pollute every
    document with header noise.  If an HTTP envelope is present it is
    stripped, the status code parsed, a ``Transfer-Encoding: chunked``
    body reassembled (:func:`_dechunk` — chunk-size lines must not leak
    into document text), and the body decoded honoring the
    ``Content-Type`` charset parameter (unknown/absent charsets fall
    back to utf-8 with replacement — the WET behavior).  Payloads with
    no envelope (WET ``conversion`` text) pass through unchanged with
    ``status=None``."""
    import re as _re

    if payload[:5] != b"HTTP/":
        return payload.decode("utf-8", errors="replace"), None
    head_end = payload.find(b"\r\n\r\n")
    if head_end < 0:
        return payload.decode("utf-8", errors="replace"), None
    head = payload[:head_end].decode("latin-1", errors="replace")
    lines = head.split("\r\n")
    parts = lines[0].split()
    status = int(parts[1]) if len(parts) >= 2 and parts[1].isdigit() else None
    charset = None
    chunked = False
    for ln in lines[1:]:
        k, _, v = ln.partition(":")
        key = k.strip().lower()
        if key == "content-type":
            m = _re.search(r"charset=[\"']?([\w.-]+)", v, _re.I)
            if m:
                charset = m.group(1)
        elif key == "transfer-encoding" and "chunked" in v.lower():
            chunked = True
    body = payload[head_end + 4 :]
    if chunked:
        body = _dechunk(body)
    if charset is None:
        # the common real-world case: no charset parameter on the HTTP
        # header — sniff the HTML <meta charset=...> / http-equiv
        # declaration from the document head (first 2 KB, the browser
        # pre-scan convention)
        m = _re.search(rb"charset=[\"']?([\w.-]+)", body[:2048], _re.I)
        if m:
            charset = m.group(1).decode("ascii", errors="replace")
    if charset:
        try:
            return body.decode(charset, errors="replace"), status
        except LookupError:
            pass  # unknown label in the wild: fall back, don't fail
    return body.decode("utf-8", errors="replace"), status


def read_wet_corpus(
    spark: SparkSession,
    path: str,
    record_types: tuple[str, ...] = ("conversion",),
    min_chars: int = 1,
    keep_http_statuses: tuple[int, ...] | None = None,
) -> DataFrame:
    """Common Crawl WET/WARC shards → the canonical ``documents`` table:
    ``doc_id, text, source, n_chars, url, warc_date, record_id``.

    The scale shape crawl processing actually uses: the FILE is the unit
    of parallelism (``binaryFile`` source — whole shards are gzip members,
    unsplittable anyway), and record parsing runs in an Arrow-batched
    ``mapInPandas`` island with a stdlib-only WARC parser (gzip + header
    scan, no external warcio dependency).  ``record_types`` defaults to
    WET ``conversion`` records (extracted text); pass ``("response",)``
    for raw WARC payloads — an HTTP envelope, when present, is stripped
    and its charset honored (:func:`_decode_payload`), and
    ``keep_http_statuses`` (e.g. ``(200,)``) drops non-OK captures;
    compose with :func:`..operators.html.extract_html_documents` for the
    HTML→text stage.  Malformed records are skipped, not fatal;
    truncated payloads of a cut-off shard yield what they have.

    Doc ids are content hashes (the same :func:`stable_doc_id` discipline
    as the other readers), so reruns and re-partitions agree.

    Per-task memory bound: each task holds ONE shard decompressed in
    memory (Common Crawl WET shards are ~100-400 MB inflated — fine for
    normal executor sizing); the ``binaryFile`` source's 2 GB per-file
    column limit is the hard edge.  Shards larger than that should be
    split upstream.
    """
    files = spark.read.format("binaryFile").load(path).select(
        "path", "content"
    )
    raw = files.mapInPandas(
        _wet_parse_island(record_types, min_chars, keep_http_statuses),
        WET_RAW_SCHEMA,
    )
    return _wet_documents(raw)


# The parse island and projection are shared verbatim by the streaming
# twin (streaming.ops.read_wet_stream) — batch and stream run the SAME
# parser over the same (path, content) shape, so batch/stream duality is
# by construction, not by parallel implementations.
WET_RAW_SCHEMA = (
    "text string, source string, url string, warc_date string, "
    "record_id string"
)


def _wet_parse_island(
    record_types: tuple[str, ...],
    min_chars: int,
    keep_http_statuses: tuple[int, ...] | None = None,
):
    """Build the Arrow-batched ``mapInPandas`` function that turns
    ``(path, content)`` shard rows into WET record rows."""
    import gzip as _gzip

    wanted = tuple(t.lower() for t in record_types)
    # () means "keep no enveloped capture" — only `None` disables the
    # filter (a falsy-check here would silently invert an empty
    # allowlist computed programmatically)
    statuses = (
        frozenset(keep_http_statuses)
        if keep_http_statuses is not None
        else None
    )

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for path_, blob in zip(pdf["path"], pdf["content"]):
                data = bytes(blob)
                if data[:2] == b"\x1f\x8b":
                    try:
                        data = _gzip.decompress(data)
                    except OSError:
                        continue  # corrupt member: skip the shard
                for headers, payload in _iter_warc_records(data):
                    rtype = headers.get("warc-type", "").lower()
                    if rtype not in wanted:
                        continue
                    # ONLY response records carry an HTTP message —
                    # conversion (WET) text decodes verbatim, even when a
                    # page about HTTP happens to start with 'HTTP/'
                    if rtype == "response":
                        text, status = _decode_payload(payload)
                    else:
                        text = payload.decode("utf-8", errors="replace")
                        status = None
                    # envelope-less records (status=None) always pass a
                    # status filter
                    if (
                        statuses is not None
                        and status is not None
                        and status not in statuses
                    ):
                        continue
                    if len(text) < min_chars:
                        continue
                    rows.append(
                        (
                            text,
                            path_,
                            headers.get("warc-target-uri", ""),
                            headers.get("warc-date", ""),
                            headers.get("warc-record-id", ""),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=["text", "source", "url", "warc_date", "record_id"],
            )

    return parse


def make_wat_record(
    url: str,
    links: list[tuple[str, str]],
    warc_date: str | None = None,
    record_id: str | None = None,
) -> bytes:
    """Serialize one WAT ``metadata`` record — the fixture-side twin of
    :func:`read_wat_links`, mirroring Common Crawl's WAT JSON envelope
    (``Envelope.Payload-Metadata.HTTP-Response-Metadata.HTML-Metadata
    .Links``, one ``{"path": "A@/href", "url": ..., "text": ...}`` per
    anchor).  ``links`` is ``[(href, anchor_text), ...]`` exactly as
    they'd appear in the page's HTML (relative hrefs stay relative —
    the READER resolves them, like the real WAT pipeline)."""
    import json

    payload = json.dumps(
        {
            "Envelope": {
                "WARC-Header-Metadata": {
                    "WARC-Type": "response",
                    "WARC-Target-URI": url,
                },
                "Payload-Metadata": {
                    "HTTP-Response-Metadata": {
                        "HTML-Metadata": {
                            "Links": [
                                {"path": "A@/href", "url": h, "text": a}
                                for h, a in links
                            ]
                        }
                    }
                },
            }
        }
    )
    return make_warc_record(
        payload,
        url=url,
        warc_type="metadata",
        warc_date=warc_date,
        record_id=record_id,
        content_type="application/json",
    )


# one row per outbound anchor; url = the linking PAGE, link_url = the
# resolved target, anchor = the anchor text — the exploded twin of
# operators.html.extract_links' per-page array
WAT_LINKS_SCHEMA = (
    "url string, link_url string, anchor string, source string, "
    "warc_date string, record_id string"
)


def read_wat_links(
    spark: SparkSession,
    path: str,
    link_paths: tuple[str, ...] = ("A@/href",),
) -> DataFrame:
    """Common Crawl WAT shards → per-link rows ``(url, link_url, anchor,
    source, warc_date, record_id)`` — the link graph WITHOUT the HTML
    re-parse.  Common Crawl ships pre-extracted page metadata as WAT
    ``metadata`` records (JSON envelopes) in the same WARC container
    format :func:`read_wet_corpus` parses; reading links from WAT makes
    the link-graph / anchor-index / PageRank front ~free at segment
    scale instead of paying the HTML parse a second time.

    ``link_paths`` selects which link kinds count (WAT tags each link
    with its DOM provenance — ``A@/href`` anchors by default; add e.g.
    ``"LINK@/href"`` for rel-links).  Relative hrefs are resolved
    against ``WARC-Target-URI`` and filtered by the SAME normalization
    as :func:`~..operators.html.extract_links`
    (``_normalize_link_py`` — both paths emit identical edges for the
    same logical link), so
    :func:`~..operators.html.link_graph_from_edges` over this frame
    agrees with :func:`~..operators.html.link_graph` over the raw HTML.
    Malformed JSON or envelope shapes are skipped, never fatal.

    Scale shape: same as :func:`read_wet_corpus` — the file is the unit
    of parallelism (``binaryFile``), parsing is one Arrow-batched
    ``mapInPandas`` island, and the output is per-link rows feeding
    map-side-combinable aggregates; one shard decompressed per task.
    """
    files = spark.read.format("binaryFile").load(path).select(
        "path", "content"
    )
    return files.mapInPandas(_wat_parse_island(link_paths), WAT_LINKS_SCHEMA)


def _wat_parse_island(link_paths: tuple[str, ...]):
    """Build the Arrow-batched ``mapInPandas`` function that turns
    ``(path, content)`` WAT shard rows into per-link rows."""
    import gzip as _gzip
    import json as _json

    from text_extensions_for_pandas_spark.operators.html import (
        _normalize_link_py,
    )

    wanted_paths = frozenset(link_paths)

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for path_, blob in zip(pdf["path"], pdf["content"]):
                data = bytes(blob)
                if data[:2] == b"\x1f\x8b":
                    try:
                        data = _gzip.decompress(data)
                    except OSError:
                        continue  # corrupt member: skip the shard
                for headers, payload in _iter_warc_records(data):
                    if headers.get("warc-type", "").lower() != "metadata":
                        continue
                    base = headers.get("warc-target-uri", "")
                    try:
                        env = _json.loads(payload)
                        links = env["Envelope"]["Payload-Metadata"][
                            "HTTP-Response-Metadata"
                        ]["HTML-Metadata"]["Links"]
                    except (
                        ValueError, KeyError, TypeError,
                        UnicodeDecodeError,
                    ):
                        continue  # non-HTML or malformed envelope: skip
                    if not isinstance(links, list):
                        continue
                    for entry in links:
                        if not isinstance(entry, dict):
                            continue
                        if entry.get("path") not in wanted_paths:
                            continue
                        href = entry.get("url")
                        if not isinstance(href, str):
                            continue
                        # whitespace-collapse the anchor exactly like
                        # the HTML parser path does
                        anchor = " ".join(str(entry.get("text", "")).split())
                        link = _normalize_link_py(href, anchor, base)
                        if link is None:
                            continue
                        rows.append(
                            (
                                base,
                                link["url"],
                                link["anchor"],
                                path_,
                                headers.get("warc-date", ""),
                                headers.get("warc-record-id", ""),
                            )
                        )
            yield pd.DataFrame(
                rows,
                columns=[
                    "url", "link_url", "anchor", "source", "warc_date",
                    "record_id",
                ],
            )

    return parse


def _wet_documents(raw: DataFrame) -> DataFrame:
    """Project parsed WET record rows to the canonical documents shape."""
    return raw.select(
        stable_doc_id(F.col("text")).alias("doc_id"),
        "text",
        "source",
        F.length("text").cast("long").alias("n_chars"),
        "url",
        "warc_date",
        "record_id",
    )


# ---------------------------------------------------------------- export --

def write_jsonl_shards(
    documents: DataFrame,
    path: str,
    shard_col: str = "shard",
    compression: str = "gzip",
) -> "DataFrame":
    """Export a prepared corpus as shard-partitioned JSONL — the
    interchange format training stacks actually consume — plus a
    manifest the consumer can trust without rescanning.

    Layout: ``{path}/data/shard=N/*.json.gz`` (one directory per
    training shard; within a shard, files split by task — consumers
    read a shard's directory as one logical stream) and
    ``{path}/manifest`` — one parquet row per shard with ``n_docs``,
    ``n_chars``, and ``content_hash`` (order-insensitive, multiplicity-
    sensitive modular SUM of per-doc hashes — a plain XOR would let
    identical rows cancel in pairs, so duplicating a document twice or
    dropping both copies of a duplicated pair would go undetected; the
    sum flips on ANY dropped/duplicated/altered document, and two
    exports of the same corpus agree bit-for-bit).

    One pass writes the data; the manifest is one map-side-combinable
    aggregate over the same frame.  Returns the manifest DataFrame.
    Compose upstream with ``sampling.deterministic_shuffle`` (whose
    ``(shard, pos)`` is already a pure function of the data) for a
    fully reproducible export: same corpus in, byte-identical manifest
    out.
    """
    (
        documents.write.mode("overwrite")
        .partitionBy(shard_col)
        .option("compression", compression)
        .json(f"{path}/data")
    )
    row_hash = F.xxhash64(
        *[F.col(c) for c in documents.columns if c != shard_col]
    )
    manifest = documents.groupBy(shard_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.length("text")).alias("n_chars"),
        # modular SUM: order-insensitive and partial-aggregable like
        # bit_xor, but multiplicity-sensitive (duplicated rows cannot
        # cancel).  DECIMAL(38,0) accumulation keeps the sum exact to
        # ~10^19 rows per shard; pmod by the Mersenne prime 2^61-1
        # folds it back to a bigint.
        F.pmod(
            F.sum(row_hash.cast("decimal(38,0)")),
            F.lit(2305843009213693951).cast("decimal(38,0)"),
        )
        .cast("bigint")
        .alias("content_hash"),
    )
    manifest.write.mode("overwrite").parquet(f"{path}/manifest")
    return manifest


def write_warc_segments(
    documents: DataFrame,
    path: str,
    url_col: str = "url",
    text_col: str = "text",
    date_col: str | None = None,
    http_status: int = 200,
    links_col: str | None = None,
) -> "list":
    """Documents → Common Crawl-shaped WARC segments: each task writes
    one ``{path}/seg-<partition>.warc.gz`` of INDIVIDUALLY-gzipped
    ``response`` records (the per-member layout that makes ranged fetch
    possible) plus the matching ``{path}/cdx/part-<partition>`` CDXJ
    shard whose lines carry the REAL member offsets/lengths and an md5
    content digest.  The output is directly consumable by the entire
    crawl front: ``read_cdx_index({path}/cdx)`` →
    ``select_captures`` → ``fetch_warc_ranges(base_dir=path)`` and
    ``read_wet_corpus({path})`` both reproduce the input (round-trip
    pinned by test) — so archival re-sharding, fixture generation at
    any scale, and selective re-reads of one's own corpus all share one
    format.

    Scale shape: one ``mapInPandas`` island per partition writing its
    segment sequentially (the file is the unit of parallelism, same as
    the readers); offsets are known exactly because the writer owns the
    file.  Returns the per-segment summary rows (filename, n_records,
    bytes) — the eager action that performs the write; re-invoking
    overwrites (segments are named by partition id, not randomness, so
    reruns are idempotent).  Repartition upstream to choose segment
    count/size.

    ``links_col`` (optional): an ``array<struct<url/href, anchor>>``
    column (e.g. :func:`~..operators.html.extract_links` output);
    when given, each task ALSO writes ``{path}/wat/seg-<partition>
    .warc.gz`` of WAT ``metadata`` records (:func:`make_wat_record`'s
    Common Crawl envelope, one per page, links pre-extracted) — so
    ``read_wat_links({path}/wat)`` reproduces the link graph without
    ever re-parsing HTML, closing the last crawl-format loop
    (round-trip pinned by test against the HTML-parsed graph).
    """
    import gzip as _gzip
    import hashlib
    import os

    import pandas as pd

    os.makedirs(path, exist_ok=True)
    os.makedirs(os.path.join(path, "cdx"), exist_ok=True)
    if links_col is not None:
        os.makedirs(os.path.join(path, "wat"), exist_ok=True)
    date_name = date_col
    links_name = links_col

    def _write(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        fname = f"seg-{pid:05d}.warc.gz"
        full = os.path.join(path, fname)
        cdx_path = os.path.join(path, "cdx", f"part-{pid:05d}")
        wat_full = os.path.join(path, "wat", fname)
        n, offset = 0, 0
        lines = []
        wat_fh = open(wat_full, "wb") if links_name is not None else None
        try:
            with open(full, "wb") as fh:
                for pdf in batches:
                    dates = (
                        pdf[date_name]
                        if date_name is not None
                        else [None] * len(pdf)
                    )
                    link_lists = (
                        pdf[links_name]
                        if links_name is not None
                        else [None] * len(pdf)
                    )
                    for url, text, date, page_links in zip(
                        pdf[url_col], pdf[text_col], dates, link_lists
                    ):
                        member = _gzip.compress(
                            make_warc_record(
                                text,
                                url=url,
                                warc_type="response",
                                warc_date=date,
                                http_status=http_status,
                            )
                        )
                        fh.write(member)
                        body = text.encode()
                        ts = (
                            "".join(c for c in date if c.isdigit())[:14]
                            if date
                            else "20000101000000"
                        )
                        lines.append(
                            make_cdx_line_for_writer(
                                url, ts.ljust(14, "0"),
                                digest=hashlib.md5(body).hexdigest(),
                                filename=fname, offset=offset,
                                length=len(member),
                                # the index must agree with the payloads:
                                # a non-200 export previously wrote
                                # status=200 lines that contradicted the
                                # records (and select_captures' default
                                # filter would wrongly keep them)
                                status=http_status,
                            )
                        )
                        offset += len(member)
                        n += 1
                        if wat_fh is not None:
                            pairs = []
                            for d in (
                                page_links if page_links is not None else []
                            ):
                                if isinstance(d, dict):
                                    href = d.get("url") or d.get("href")
                                    pairs.append(
                                        (href, d.get("anchor") or "")
                                    )
                                else:
                                    pairs.append((d[0], d[1] or ""))
                            wat_fh.write(
                                _gzip.compress(
                                    make_wat_record(
                                        url, pairs, warc_date=date
                                    )
                                )
                            )
        finally:
            if wat_fh is not None:
                wat_fh.close()
        if n:
            with open(cdx_path, "w") as fh:
                fh.write("\n".join(lines) + "\n")
        else:
            os.unlink(full)
            if wat_fh is not None:
                os.unlink(wat_full)
        yield pd.DataFrame(
            [(fname, n, offset)], columns=["filename", "n_records", "bytes"]
        )

    summary = documents.select(url_col, text_col, *(
        ([date_col] if date_col else []) + ([links_col] if links_col else [])
    )).mapInPandas(_write, "filename string, n_records int, bytes long")
    return [r for r in summary.collect() if r["n_records"] > 0]


def make_cdx_line_for_writer(
    url, ts, *, digest, filename, offset, length, status=200
):
    """Executor-side import indirection: ``cdx.make_cdx_line`` without a
    module-level corpus↔cdx import cycle."""
    from text_extensions_for_pandas_spark.sources.cdx import make_cdx_line

    return make_cdx_line(
        url, ts, digest=digest, filename=filename, offset=offset,
        length=length, status=status,
    )


# ------------------------------------------------------------- snapshots --

def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "url",
    digest_col: str = "digest",
) -> DataFrame:
    """Per-key churn between two corpus snapshots — the question every
    incremental crawl/training refresh asks first: what is ``added``,
    ``removed``, ``changed`` (same key, different content digest), or
    ``unchanged`` since the last dump?  Inputs are any frames carrying
    a unique ``key_col`` (URL, SURT, doc id) and a content
    ``digest_col`` (the CDX md5, ``xxhash64(text)``, ...); output is
    ``(key_col, status, old_digest, new_digest)``.

    Feeds straight into the existing incremental machinery: the
    ``added``+``changed`` keys are the fetch list (``cdx.fetch_plan``),
    ``removed`` drives retention, and ``changed`` is the re-embed /
    re-dedup set (``band-index append``, ``ivfpq append``).

    Scale shape: ONE full-outer sort-merge join keyed on ``key_col`` —
    both snapshots shuffle once on the same key (co-partitioned by
    construction), no driver state, no skew beyond the key's own
    distribution.  Keys are assumed unique per snapshot (dedup upstream
    with ``urls.dedup_by_url`` / ``select_captures``); duplicate keys
    produce a row per pairing, never a wrong status.
    """
    o = old.select(
        F.col(key_col).alias("__k"), F.col(digest_col).alias("old_digest")
    )
    n = new.select(
        F.col(key_col).alias("__k"), F.col(digest_col).alias("new_digest")
    )
    status = (
        F.when(F.col("old_digest").isNull(), F.lit("added"))
        .when(F.col("new_digest").isNull(), F.lit("removed"))
        .when(
            F.col("old_digest") == F.col("new_digest"), F.lit("unchanged")
        )
        .otherwise(F.lit("changed"))
    )
    return o.join(n, "__k", "full_outer").select(
        F.col("__k").alias(key_col),
        status.alias("status"),
        "old_digest",
        "new_digest",
    )


def snapshot_churn_by_host(
    diff: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Per-host churn rollup of a :func:`corpus_diff` frame:
    ``(host, n_added, n_removed, n_changed, n_unchanged, churn)`` where
    ``churn`` = changed+added+removed over total — the signal that
    drives per-host recrawl budgets (stable reference sites poll
    rarely; news hosts poll often), composing with
    ``cdx.crawl_freshness`` on the schedule side.  One conditional-sum
    aggregate, map-side combinable — a 100 TB diff rolls up in a
    single shuffle on the (bounded) host key."""
    host = F.lower(F.try_parse_url(F.col(url_col), F.lit("HOST")))

    def n(status: str) -> Column:
        return F.sum(
            (F.col("status") == status).cast("long")
        ).alias(f"n_{status}")

    out = diff.groupBy(host.alias("host")).agg(
        n("added"), n("removed"), n("changed"), n("unchanged")
    )
    total = (
        F.col("n_added")
        + F.col("n_removed")
        + F.col("n_changed")
        + F.col("n_unchanged")
    )
    return out.withColumn(
        "churn",
        F.round(
            (F.col("n_added") + F.col("n_removed") + F.col("n_changed"))
            / F.greatest(total, F.lit(1)),
            6,
        ),
    )
