"""Common Crawl capture-index (CDXJ) front — select BEFORE you scan.

Beyond-reference surface (the reference has no crawl notion).  At 100 TB
the single most important optimization is not reading the bytes at all:
Common Crawl publishes a capture index (`cdx-*.gz` shards of
``SURT-key timestamp {json}`` lines, ~200 GB/crawl vs ~100 TB of WARC)
whose JSON records carry ``filename``/``offset``/``length`` pointers to
the individually-gzipped WARC record members.  A selective pipeline
therefore runs

    read_cdx_index → select_captures → fetch_plan → fetch_warc_ranges

and touches only the WARC *byte ranges* it selected — typically well
under 1% of the corpus — instead of streaming every shard through the
parser.  This module implements that front.

Scale shape, stage by stage:

* :func:`read_cdx_index` — ``spark.read.text`` over the gzip index
  shards (one shard per task, the same unit-of-parallelism story as
  :func:`.corpus.read_wet_corpus`), then ONE JVM-side projection:
  ``split(limit=3)`` + ``from_json`` + casts.  No Python island — the
  whole parse is whole-stage-codegen, and downstream predicates on
  status/mime/prefix are ordinary pushdown-friendly filters.
* :func:`select_captures` — pure column predicates plus at most two
  combinable aggregates (``max_by`` latest-capture, ``min_by`` digest
  keep-first) and an optional broadcast anti-join against a prior
  crawl's digest index (the cross-snapshot incremental-dedup hook,
  mirroring :func:`..operators.dedup.incremental_candidates`).
* :func:`fetch_plan` — one ``collect_list`` per WARC file, sorted by
  offset so each fetch task reads its file monotonically (sequential
  I/O, coalescible ranges).  ``max_records_per_task`` splits hot files
  so one mega-file cannot straggle the stage.
* :func:`fetch_warc_ranges` — the only Python stage, and it only ever
  sees the SELECTED ranges: an Arrow-batched island seeks each
  ``(offset, length)`` member, gunzips it, and re-emits a synthetic
  ``(path, content)`` shard that flows through the SAME
  ``_wet_parse_island`` as full-shard reads — ranged and full ingest
  share one parser by construction.

SURT keys (the index's sort order) are computed JVM-side by
:func:`surt_key` with a Python twin (:func:`surt_key_py`) used by the
fixture writer; a property test pins the two to each other.

Reference scope note: the reference library (CODAIT
text_extensions_for_pandas) stops at NLP-on-DataFrames; this crawl-index
front is part of the beyond-reference LLM-pipeline layer (SURVEY.md §6).
"""

from __future__ import annotations

import json
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "surt_key",
    "surt_key_py",
    "make_cdx_line",
    "read_cdx_index",
    "cdx_project_lines",
    "select_captures",
    "fetch_plan",
    "fetch_warc_ranges",
    "crawl_freshness",
    "write_cdx_mirror",
    "read_cdx_mirror",
]


# ---------------------------------------------------------------- SURT --

def surt_key(url) -> F.Column:
    """Sort-friendly URI Reordering Transform of ``url`` as a pure
    Column expression (codegen — no UDF): lowercase, host labels
    reversed and comma-joined with a leading-``www.`` strip, ``)/`` +
    path, ``?`` + query with parameters sorted so equivalent URLs
    collide::

        http://www.News.Example.com/A/B?b=2&a=1
          → com,example,news)/a/b?a=1&b=2
        http://host.com:8080/  → com,host:8080)/

    Non-default ports stay in the key (``:8080`` after the reversed
    host, as standard SURT and Common Crawl's CDXJ write them — keys
    computed here JOIN cleanly against externally-produced indexes);
    scheme-default ports (http:80, https:443) are dropped so the two
    spellings of the same origin collide.  A single trailing dot on the
    host is stripped (``example.com.`` ≡ ``example.com``, the DNS-root
    form), again matching standard SURT.  NULL for unparseable URLs
    (``try_parse_url`` semantics).  Divergence from the full
    Internet-Archive SURT spec, on purpose: no scheme folding table
    beyond dropping the scheme, no session-param stripping — composing
    with :func:`..operators.urls.normalize_url` first covers those.
    """
    u = url if isinstance(url, F.Column) else F.col(url)
    host = F.lower(F.try_parse_url(u, F.lit("HOST")))
    host = F.regexp_replace(host, r"\.$", "")
    host = F.regexp_replace(host, r"^www\.", "")
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    # the port lives only in AUTHORITY ([userinfo@]host[:port]); cast
    # through bigint so ":08080" and ":8080" collide
    scheme = F.lower(F.try_parse_url(u, F.lit("PROTOCOL")))
    port = F.regexp_extract(
        F.try_parse_url(u, F.lit("AUTHORITY")), r":(\d+)$", 1
    ).try_cast("bigint")
    default_port = F.when(scheme == "http", F.lit(80)).when(
        scheme == "https", F.lit(443)
    )
    port_part = F.when(
        port.isNotNull() & ~port.eqNullSafe(default_port),
        F.concat(F.lit(":"), port.cast("string")),
    ).otherwise(F.lit(""))
    rev = F.concat(rev, port_part)
    path = F.lower(F.coalesce(F.try_parse_url(u, F.lit("PATH")), F.lit("/")))
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.lower(F.try_parse_url(u, F.lit("QUERY")))
    qnorm = F.array_join(F.array_sort(F.split(query, "&")), "&")
    return F.when(host.isNull(), F.lit(None).cast("string")).otherwise(
        F.concat(
            rev,
            F.lit(")"),
            path,
            F.when(
                query.isNotNull() & (query != ""), F.concat(F.lit("?"), qnorm)
            ).otherwise(F.lit("")),
        )
    )


import re as _re

# one label of a Java-URI-valid hostname: alphanumeric edges, hyphens
# inside, no underscores (sun's RFC 2396 server-authority grammar)
_JAVA_LABEL = _re.compile(r"[A-Za-z0-9](?:[A-Za-z0-9-]*[A-Za-z0-9])?$")


def _java_host_ok(host: str) -> bool:
    """Mirror ``try_parse_url``'s (java.net.URI's) host acceptance —
    found empirically by the property test and pinned by it: every
    label alphanumeric-edged; a MULTI-label host's last label must not
    start with a digit unless the whole host is a 4-part dotted-digit
    IPv4; one trailing dot allowed."""
    labels = host.split(".")
    if labels and labels[-1] == "":  # single trailing dot
        labels = labels[:-1]
    if not labels or any(not _JAVA_LABEL.match(lb) for lb in labels):
        return False
    if len(labels) > 1 and labels[-1][0].isdigit():
        return len(labels) == 4 and all(lb.isdigit() for lb in labels)
    return True


def surt_key_py(url: str) -> str | None:
    """Driver/fixture-side twin of :func:`surt_key` — MUST agree with the
    Column expression (pinned by ``test_cdx.py``'s property tests,
    including a 300-URL generated sweep).  Known unmirrored edge:
    IPv6 literals (absent from crawl indexes in practice)."""
    from urllib.parse import urlsplit

    try:
        parts = urlsplit(url)
    except ValueError:
        return None
    host = (parts.hostname or "").lower()
    if not host or not _java_host_ok(host):
        return None
    if host.endswith("."):
        host = host[:-1]
    if host.startswith("www."):
        host = host[4:]
    rev = ",".join(reversed(host.split(".")))
    # mirror the JVM side exactly: a trailing ":digits" run on the
    # authority (urlsplit .port would range-check; java.net.URI does
    # not), capped at 18 digits to match try_cast("bigint")
    m = _re.search(r":(\d{1,18})$", parts.netloc)
    port = int(m.group(1)) if m else None
    scheme = (parts.scheme or "").lower()
    default_port = {"http": 80, "https": 443}.get(scheme)
    if port is not None and port != default_port:
        rev += f":{port}"
    path = (parts.path or "/").lower() or "/"
    out = f"{rev}){path}"
    if parts.query:
        out += "?" + "&".join(sorted(parts.query.lower().split("&")))
    return out


# ------------------------------------------------------------- fixture --

def make_cdx_line(
    url: str,
    timestamp: str,
    *,
    status: int = 200,
    mime: str = "text/html",
    digest: str = "0" * 32,
    filename: str = "shard0.warc.gz",
    offset: int = 0,
    length: int = 0,
    languages: str | None = None,
) -> str:
    """Serialize one CDXJ index line — the fixture-side twin of
    :func:`read_cdx_index`, mirroring Common Crawl's format: SURT key,
    14-digit timestamp, then a JSON blob whose numerics are STRINGS
    (as the real index ships them; the reader casts)."""
    meta = {
        "url": url,
        "mime": mime,
        "status": str(status),
        "digest": digest,
        "length": str(length),
        "offset": str(offset),
        "filename": filename,
    }
    if languages is not None:
        meta["languages"] = languages
    return f"{surt_key_py(url)} {timestamp} {json.dumps(meta, sort_keys=True)}"


# --------------------------------------------------------------- reader --

# the real index ships numerics as JSON strings; parse as strings, cast
# in the projection so a malformed field nulls instead of failing the row
_CDX_JSON_DDL = (
    "url string, mime string, `mime-detected` string, status string, "
    "digest string, length string, offset string, filename string, "
    "languages string, encoding string"
)

CDX_SCHEMA = (
    "surt string, capture_ts string, url string, status int, mime string, "
    "digest string, length bigint, offset bigint, filename string, "
    "languages string"
)


def read_cdx_index(spark: SparkSession, path: str) -> DataFrame:
    """CDXJ index shards → one capture per row
    (``surt, capture_ts, url, status, mime, digest, length, offset,
    filename, languages``).

    Entirely JVM-side: ``spark.read.text`` (gzip shards decompress one
    per task), ``split(value, ' ', 3)`` to isolate the JSON remainder
    (the SURT key and timestamp never contain spaces; the JSON does),
    ``from_json`` + casts.  Malformed lines — bad JSON, non-14-digit
    timestamp, missing url — are dropped, never fatal, matching the
    fail-soft contract of the WARC readers.

    The projection is :func:`cdx_project_lines`, shared verbatim by the
    streaming twin (``streaming.ops.read_cdx_stream``) — batch and
    stream parse identically by construction.
    """
    return cdx_project_lines(spark.read.text(path))


def cdx_project_lines(lines: DataFrame) -> DataFrame:
    """The pure-Column CDXJ projection over a ``value: string`` frame —
    one codegen pass, no Python.  Shared by batch and streaming."""
    parts = F.split(F.col("value"), " ", 3)
    # F.get, not [i]: a truncated line with fewer than three fields must
    # yield NULLs (dropped by the filter below), not ANSI index errors
    meta = F.from_json(F.get(parts, 2), _CDX_JSON_DDL)
    return (
        lines
        .select(
            F.get(parts, 0).alias("surt"),
            F.get(parts, 1).alias("capture_ts"),
            meta.alias("m"),
        )
        .where(
            F.col("capture_ts").rlike(r"^\d{14}$")
            & F.col("m.url").isNotNull()
        )
        .select(
            "surt",
            "capture_ts",
            F.col("m.url").alias("url"),
            # try_cast, not cast: real capture indexes carry non-numeric
            # sentinels (status "-" on revisit records); under ANSI mode
            # a plain cast would abort the whole read instead of nulling
            # the field as documented
            F.col("m.status").try_cast("int").alias("status"),
            F.col("m.mime").alias("mime"),
            F.col("m.digest").alias("digest"),
            F.col("m.length").try_cast("bigint").alias("length"),
            F.col("m.offset").try_cast("bigint").alias("offset"),
            F.col("m.filename").alias("filename"),
            F.col("m.languages").alias("languages"),
        )
    )


# ------------------------------------------------------------ selection --

def select_captures(
    cdx: DataFrame,
    *,
    statuses: tuple[int, ...] | None = (200,),
    mimes: tuple[str, ...] | None = ("text/html",),
    surt_prefixes: list[str] | None = None,
    languages: tuple[str, ...] | None = None,
    latest_per_url: bool = True,
    dedupe_digest: bool = True,
    prior_digests: DataFrame | None = None,
) -> DataFrame:
    """The select-before-scan step: narrow the capture index to the rows
    worth fetching.

    * ``statuses`` / ``mimes`` / ``languages`` — plain ``isin`` filters
      (``languages`` matches any member of the index's comma-list).
    * ``surt_prefixes`` — host/path scoping as SURT prefixes (e.g.
      ``["org,example)/docs"]``); an OR of ``startswith`` predicates.
      On a SURT-sorted parquet mirror of the index these become range
      predicates (min/max pruning); on raw text shards they are still
      one codegen pass.
    * ``latest_per_url`` — crawls capture a URL repeatedly;
      ``max_by(struct(*), capture_ts)`` per SURT keeps the newest
      capture.  One combinable aggregate, ties broken by digest then
      offset for determinism.
    * ``dedupe_digest`` — identical content at many URLs (mirrors, CDN
      aliases) shares a content digest; ``min_by`` per digest keeps the
      lexicographically-first SURT's capture.  Exact content dedup paid
      at INDEX cost, before a single payload byte is read.
    * ``prior_digests`` — single-column ``(digest)`` frame from already-
      ingested crawls; a ``left_anti`` join (broadcast when small)
      drops everything a previous snapshot already contributed — the
      cross-dump incremental hook.
    """
    out = cdx
    if statuses is not None:
        out = out.where(F.col("status").isin(*statuses))
    if mimes is not None:
        out = out.where(F.col("mime").isin(*mimes))
    if languages is not None:
        lang_arr = F.split(F.coalesce(F.col("languages"), F.lit("")), ",")
        out = out.where(
            F.arrays_overlap(
                lang_arr, F.array(*[F.lit(x) for x in languages])
            )
        )
    if surt_prefixes:
        pred = F.col("surt").startswith(surt_prefixes[0])
        for p in surt_prefixes[1:]:
            pred = pred | F.col("surt").startswith(p)
        out = out.where(pred)
    if prior_digests is not None:
        out = out.join(prior_digests.select("digest"), "digest", "left_anti")

    cols = [c for c in out.columns]
    row = F.struct(*[F.col(c) for c in cols])
    if latest_per_url:
        # deterministic: newest capture, digest/offset tie-break
        key = F.struct(
            F.col("capture_ts"), F.col("digest"), F.col("offset")
        )
        out = out.groupBy("surt").agg(F.max_by(row, key).alias("r")).select(
            *[F.col(f"r.{c}").alias(c) for c in cols]
        )
    if dedupe_digest:
        key = F.struct(F.col("surt"), F.col("capture_ts"), F.col("offset"))
        out = (
            out.groupBy("digest")
            .agg(F.min_by(row, key).alias("r"))
            .select(*[F.col(f"r.{c}").alias(c) for c in cols])
        )
    return out


# ------------------------------------------------------------ fetch plan --

def fetch_plan(
    selected: DataFrame, max_records_per_task: int | None = None
) -> DataFrame:
    """Selected captures → ranged-fetch tasks: one row per (WARC file,
    chunk) with an offset-sorted ``records array<struct<offset,length,
    url>>``, ``n_records``, and ``fetch_bytes``.

    Sorting by offset makes each task's reads monotone (sequential I/O;
    adjacent members coalesce into one ranged GET on object stores).
    ``max_records_per_task`` splits a hot file's list into fixed-size
    chunks so one mega-file cannot straggle the fetch stage — the same
    anti-skew trade as ``repartition_for_decode``.
    """
    recs = F.array_sort(
        F.collect_list(
            F.struct(
                F.col("offset"), F.col("length"), F.col("url")
            )
        )
    )
    per_file = (
        selected.groupBy("filename")
        .agg(recs.alias("records"))
    )
    if max_records_per_task is not None:
        n = F.size(F.col("records"))
        chunks = F.transform(
            F.sequence(
                F.lit(0),
                F.ceil(n / F.lit(max_records_per_task)).cast("int") - 1,
            ),
            lambda i: F.slice(
                F.col("records"),
                i * max_records_per_task + 1,
                max_records_per_task,
            ),
        )
        per_file = per_file.select(
            "filename", F.posexplode(chunks).alias("task_idx", "records")
        )
    else:
        per_file = per_file.select(
            "filename", F.lit(0).alias("task_idx"), "records"
        )
    return per_file.select(
        "filename",
        "task_idx",
        "records",
        F.size("records").alias("n_records"),
        F.aggregate(
            "records", F.lit(0).cast("bigint"), lambda acc, r: acc + r["length"]
        ).alias("fetch_bytes"),
    )


# ---------------------------------------------------------- ranged fetch --

def fetch_warc_ranges(
    spark: SparkSession,
    plan: DataFrame,
    base_dir: str | None = None,
    record_types: tuple[str, ...] = ("response",),
    min_chars: int = 1,
    keep_http_statuses: tuple[int, ...] | None = None,
) -> DataFrame:
    """Execute a :func:`fetch_plan` → the canonical ``documents`` table,
    reading ONLY the planned byte ranges.

    Each task opens its WARC file once, seeks each ``(offset, length)``
    member in offset order, gunzips the member (Common Crawl gzips each
    record independently — that is what makes ranged fetch possible; a
    plain-bytes member passes through for plain fixtures), and emits a
    synthetic ``(path, content)`` shard of just the selected records.
    That shard flows through the SAME ``_wet_parse_island`` /
    ``_wet_documents`` tail as :func:`.corpus.read_wet_corpus`, so
    ranged and full-shard ingest share one parser, one decode path, one
    schema — by construction.

    ``base_dir`` resolves the plan's (typically relative) filenames; on
    a cluster it is the bucket/prefix mount.  Local driver for the
    seek+read; a cloud build swaps ranged GETs into the same island.
    """
    import gzip
    import os

    import pandas as pd

    from .corpus import WET_RAW_SCHEMA, _wet_documents, _wet_parse_island

    def _fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_path: list[str] = []
            out_content: list[bytes] = []
            for fname, task_idx, records in zip(
                pdf["filename"], pdf["task_idx"], pdf["records"]
            ):
                full = (
                    os.path.join(base_dir, fname) if base_dir else fname
                )
                blobs: list[bytes] = []
                try:
                    fh = open(full, "rb")
                except OSError:
                    continue  # fail-soft: a missing shard drops its rows
                with fh:
                    for rec in records:
                        try:
                            fh.seek(int(rec["offset"]))
                            blob = fh.read(int(rec["length"]))
                        except (OSError, ValueError):
                            continue
                        if blob[:2] == b"\x1f\x8b":
                            try:
                                blob = gzip.decompress(blob)
                            except OSError:
                                continue
                        blobs.append(blob)
                if blobs:
                    out_path.append(f"{full}#task{int(task_idx)}")
                    out_content.append(b"".join(blobs))
            yield pd.DataFrame({"path": out_path, "content": out_content})

    shards = plan.select("filename", "task_idx", "records").mapInPandas(
        _fetch, "path string, content binary"
    )
    raw = shards.mapInPandas(
        _wet_parse_island(record_types, min_chars, keep_http_statuses),
        WET_RAW_SCHEMA,
    )
    return _wet_documents(raw)


# ------------------------------------------------------------- freshness --

def crawl_freshness(
    sitemap_entries: DataFrame,
    captures: DataFrame,
) -> DataFrame:
    """Site-declared truth vs crawl reality: join :func:`parse_sitemaps`'
    ``'url'`` rows against a capture index on SURT key and classify each
    page — ``'missing'`` (the site lists it, the crawl never captured
    it), ``'stale'`` (the site's ``lastmod`` postdates the newest
    capture day), or ``'fresh'``.  The output IS the recrawl frontier:
    feed the missing/stale rows to a fetcher, prioritized by the
    sitemap's own ``priority`` hints.

    Scale shape: one combinable ``max`` per SURT over the capture index
    (map-side partial), one equijoin on the SURT key — the same key the
    index is already sorted/bucketed by, so a parquet mirror of the
    index co-locates the join for free.  Freshness is a row-local date
    compare (``lastmod`` ``YYYY-MM-DD`` vs the capture timestamp's
    day prefix); entries with no ``lastmod`` can only be missing or
    fresh — a site that doesn't declare timestamps never reports stale.

    Returns ``(surt, host, loc, lastmod, priority, last_capture_ts,
    freshness)``.
    """
    latest = captures.groupBy("surt").agg(
        F.max("capture_ts").alias("last_capture_ts")
    )
    entries = sitemap_entries.filter(F.col("kind") == "url").select(
        "host",
        "loc",
        "lastmod",
        "priority",
        surt_key(F.col("loc")).alias("surt"),
    )
    joined = entries.join(latest, "surt", "left")
    capture_day = F.substring(F.col("last_capture_ts"), 1, 8)
    lastmod_day = F.regexp_replace(
        F.substring(F.col("lastmod"), 1, 10), "-", ""
    )
    freshness = (
        F.when(F.col("last_capture_ts").isNull(), F.lit("missing"))
        .when(
            F.col("lastmod").isNotNull() & (lastmod_day > capture_day),
            F.lit("stale"),
        )
        .otherwise(F.lit("fresh"))
    )
    return joined.select(
        "surt", "host", "loc", "lastmod", "priority",
        "last_capture_ts", freshness.alias("freshness"),
    )


# --------------------------------------------------------------- mirror --

def write_cdx_mirror(
    cdx: DataFrame, path: str, n_files: int = 32
) -> None:
    """Materialize the raw text index as a SURT-range-sorted parquet
    mirror — the one-time investment that turns every later
    ``surt_prefixes`` selection into real I/O skipping: gzip text
    shards must always be fully decompressed and parsed, but a parquet
    mirror range-partitioned and sorted on ``surt`` gives (a) columnar
    pruning (a host-scoping pass reads the ``surt`` column, not the
    JSON), (b) per-file min/max ``surt`` ranges so a prefix predicate
    skips whole files, and (c) row-group statistics inside each file
    for the same predicate (parquet pushes ``StringStartsWith``).
    Re-selections against a crawl index are routine — every new
    curriculum, domain study, or recrawl plan re-scopes the same index
    — so the mirror pays for itself on the second query.

    ``repartitionByRange`` + ``sortWithinPartitions`` — a RANGE
    exchange, not a global sort: files end up with narrow,
    non-overlapping SURT spans (asserted from real parquet footers in
    ``test_cdx.py``)."""
    (
        cdx.repartitionByRange(n_files, F.col("surt"))
        .sortWithinPartitions("surt")
        .write.mode("overwrite")
        .parquet(path)
    )


def read_cdx_mirror(spark: SparkSession, path: str) -> DataFrame:
    """Read a :func:`write_cdx_mirror` artifact.  Selection predicates
    (``select_captures``' filters, SURT prefixes) push down to the
    parquet scan — compose exactly as with :func:`read_cdx_index`."""
    return spark.read.parquet(path)
