"""HTML → text extraction: the stage between raw-crawl ingestion
(:func:`..sources.corpus.read_wet_corpus` with ``record_types=
("response",)``) and the ``documents``-table prep funnel.

Beyond-reference surface (the reference ingests pre-tokenized NLP
formats); for a web-scale training corpus this step is where most of the
corpus quality is won: WET shards carry Common Crawl's own extraction,
but raw WARC ``response`` payloads arrive as HTML and need boilerplate
markup stripped before language-ID / quality / dedup see them.

Extraction semantics (deterministic, stdlib-only ``html.parser``):

* ``script`` / ``style`` / ``noscript`` / ``template`` / ``svg`` /
  ``head`` / ``nav`` subtrees are dropped whole (code, CSS, and chrome
  are not training text);
* block-level elements (``p``/``div``/``li``/``h1``-``h6``/``tr``/
  ``br``/…) open and close with a line break, inline elements
  (``b``/``a``/``span``/…) do not — so visual line structure survives
  into the text column the line-level operators
  (:func:`~.dedup.remove_boilerplate`, line-repetition metrics) consume;
* inside ``<pre>`` the SOURCE newlines are honored as line breaks (the
  element is literally preformatted — code blocks keep their lines);
* character/entity references decode (``&amp;`` → ``&``);
* whitespace is normalized per line: runs collapse to one space (source
  newlines are ordinary whitespace, exactly as a browser renders them —
  only block elements break lines), blank lines drop, lines join with
  ``\\n``.

Malformed HTML TERMINATES and yields best-effort text, never raises: the
parser is wrapped so a pathological page degrades to tag-stripped text
rather than failing a 100 TB-scan task (fuzz-tested in
tests/test_html.py).

Scale shape: a scalar Arrow-batched pandas UDF — one Python call per
Arrow batch, embarrassingly parallel, no shuffle, stream-transparent
(usable in both batch and Structured Streaming plans).  The only memory
knob is ``spark.sql.execution.arrow.maxRecordsPerBatch`` × page size.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "html_to_text",
    "html_features",
    "extract_html_documents",
    "extract_links",
    "link_graph",
    "link_graph_from_edges",
    "anchor_text_index",
    "anchor_text_index_from_edges",
]

# Subtrees dropped whole: non-content by construction.
_SKIP_TAGS = frozenset(
    {"script", "style", "noscript", "template", "svg", "head", "nav"}
)

# Elements that imply a line break when they open AND when they close.
_BLOCK_TAGS = frozenset(
    {
        "address", "article", "aside", "blockquote", "br", "caption",
        "dd", "details", "div", "dl", "dt", "fieldset", "figcaption",
        "figure", "footer", "form", "h1", "h2", "h3", "h4", "h5", "h6",
        "header", "hr", "li", "main", "ol", "option", "p", "pre",
        "section", "summary", "table", "tbody", "td", "tfoot", "th",
        "thead", "tr", "ul",
    }
)

_WS_RUN = re.compile(r"\s+")
_TAG_STRIP = re.compile(r"<[^>]*>")


# Line breaks come ONLY from block tags, never from source-text newlines
# (which are ordinary whitespace in HTML) — so breaks are marked with a
# control-char sentinel that cannot be confused with page text.
_BREAK = "\x1f"


class _TextExtractor(HTMLParser):
    """Streaming tag handler: collects text parts, depth-counts skip
    and ``pre`` subtrees (nested/unbalanced closers clamp at zero)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip = 0
        self._pre = 0
        self.parts: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip += 1
        elif tag in _BLOCK_TAGS:
            if tag == "pre":
                self._pre += 1
            self.parts.append(_BREAK)

    # <br/> and other XHTML self-closers arrive here, not handle_starttag
    def handle_startendtag(self, tag, attrs):
        if tag in _BLOCK_TAGS:
            self.parts.append(_BREAK)

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS:
            self._skip = max(0, self._skip - 1)
        elif tag in _BLOCK_TAGS:
            if tag == "pre":
                self._pre = max(0, self._pre - 1)
            self.parts.append(_BREAK)

    def handle_data(self, data):
        if not self._skip and data:
            # a stray U+001F in page text must not fake a line break
            data = data.replace(_BREAK, " ")
            if self._pre:
                # preformatted: source newlines ARE the line structure
                data = data.replace("\n", _BREAK)
            self.parts.append(data)


def _normalize_lines(raw: str) -> str:
    lines = []
    for line in raw.split(_BREAK):
        line = _WS_RUN.sub(" ", line).strip()
        if line:
            lines.append(line)
    return "\n".join(lines)


def _html_to_text_py(html: str) -> str:
    """Driver-side reference implementation (the UDF maps this)."""
    try:
        p = _TextExtractor()
        p.feed(html)
        p.close()
        return _normalize_lines("".join(p.parts))
    except Exception:
        # html.parser is tolerant but not proven crash-free on arbitrary
        # bytes; a 100 TB scan must not die on one pathological page.
        # Degrade to tag-stripped text (entities left undecoded).
        return _normalize_lines(_TAG_STRIP.sub(" ", html))


def html_to_text(col) -> "F.Column":
    """Column function: extract visible text from an HTML string column
    (NULL in → NULL out).  Arrow-batched scalar pandas UDF — the slow
    path is one Python call per batch, not per row."""

    @F.pandas_udf("string")
    def _extract(s: pd.Series) -> pd.Series:
        return s.map(
            lambda h: _html_to_text_py(h) if h is not None else None
        )

    return _extract(col)


class _FeatureExtractor(HTMLParser):
    """Structural page features in one pass: title text, tag/link
    counts, and visible-vs-link character counts (the link-density
    numerator/denominator).  Same skip-subtree discipline as
    :class:`_TextExtractor`; ``<title>`` is captured even though it sits
    inside the skipped ``head``."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip = 0
        self._title = 0
        self._link = 0
        self.title_parts: list[str] = []
        self.n_tags = 0
        self.n_links = 0
        self.text_chars = 0
        self.link_text_chars = 0

    def handle_starttag(self, tag, attrs):
        self.n_tags += 1
        if tag == "a":
            self.n_links += 1
            self._link += 1
        if tag == "title":
            self._title += 1
        if tag in _SKIP_TAGS:
            self._skip += 1

    def handle_startendtag(self, tag, attrs):
        self.n_tags += 1
        if tag == "a":
            self.n_links += 1

    def handle_endtag(self, tag):
        if tag == "a":
            self._link = max(0, self._link - 1)
        if tag == "title":
            self._title = max(0, self._title - 1)
        if tag in _SKIP_TAGS:
            self._skip = max(0, self._skip - 1)

    def handle_data(self, data):
        if self._title:
            self.title_parts.append(data)
            return
        if self._skip:
            return
        self.text_chars += len(data)
        if self._link:
            self.link_text_chars += len(data)


def _html_features_py(html: str) -> tuple:
    """(title, n_tags, n_links, text_chars, link_text_chars,
    link_density) — raw visible characters (pre-collapse), so the counts
    are exactly recomputable from the markup."""
    try:
        p = _FeatureExtractor()
        p.feed(html)
        p.close()
        title = "".join(p.title_parts).strip()
        density = (
            p.link_text_chars / p.text_chars if p.text_chars else 0.0
        )
        return (
            title if title else None,
            p.n_tags,
            p.n_links,
            p.text_chars,
            p.link_text_chars,
            density,
        )
    except Exception:
        # same never-fail contract as _html_to_text_py: a pathological
        # page yields degenerate features, not a dead task
        stripped = _TAG_STRIP.sub("", html)
        return (None, 0, 0, len(stripped), 0, 0.0)


HTML_FEATURES_SCHEMA = (
    "title string, n_tags int, n_links int, text_chars long, "
    "link_text_chars long, link_density double"
)


def html_features(col) -> "F.Column":
    """Column function: one-pass structural features of an HTML string —
    ``title``, tag/anchor counts, and **link density** (visible anchor
    chars / visible chars), the classic jusText/boilerplate-detection
    quality signal: navigation and link-farm pages score near 1, real
    articles near 0.  Filter crawl pages with e.g.
    ``html_features(F.col("text"))["link_density"] < 0.5`` before (or
    instead of) full extraction.  NULL in → NULL struct out; same
    Arrow-batched, malformed-input-safe contract as
    :func:`html_to_text`."""

    @F.pandas_udf(HTML_FEATURES_SCHEMA)
    def _feat(s: pd.Series) -> pd.DataFrame:
        rows = [
            _html_features_py(h) if h is not None
            else (None,) * 6
            for h in s
        ]
        return pd.DataFrame(
            rows,
            columns=[
                "title", "n_tags", "n_links", "text_chars",
                "link_text_chars", "link_density",
            ],
        )

    return _feat(col)


class _LinkExtractor(HTMLParser):
    """Collect ``(href, anchor-text)`` pairs from ``<a href=…>`` elements
    in one streaming pass.  Nested ``<a>`` is invalid HTML and browsers
    auto-close — a new ``<a`` finalizes the open one.  ``script``/
    ``style`` contents are CDATA to ``html.parser``, so markup quoted
    inside them never reaches the tag handlers."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.links: list[tuple[str, str]] = []
        self._open: tuple[str, list[str]] | None = None

    def _finish(self) -> None:
        if self._open is not None:
            href, parts = self._open
            self.links.append(
                (href, _WS_RUN.sub(" ", "".join(parts)).strip())
            )
            self._open = None

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            self._finish()
            href = next((v for k, v in attrs if k == "href" and v), None)
            if href is not None:
                self._open = (href, [])

    def handle_startendtag(self, tag, attrs):
        if tag == "a":
            self._finish()
            href = next((v for k, v in attrs if k == "href" and v), None)
            if href is not None:
                self.links.append((href, ""))

    def handle_endtag(self, tag):
        if tag == "a":
            self._finish()

    def handle_data(self, data):
        if self._open is not None:
            self._open[1].append(data)


# Non-navigational href schemes a link graph must not ingest.
_NON_HTTP_SCHEMES = ("javascript:", "mailto:", "tel:", "data:", "about:")


def _extract_links_py(html: str, base: str | None) -> list[dict]:
    """Driver-side reference implementation (the UDF maps this).
    Same never-fail contract as :func:`_html_to_text_py`: a pathological
    page yields no links, not a dead task."""
    try:
        p = _LinkExtractor()
        p.feed(html)
        p.close()
        p._finish()
        raw = p.links
    except Exception:
        return []
    out: list[dict] = []
    for href, anchor in raw:
        link = _normalize_link_py(href, anchor, base)
        if link is not None:
            out.append(link)
    return out


def _normalize_link_py(
    href: str, anchor: str, base: str | None
) -> dict | None:
    """Shared per-link normalization for HTML-parsed and WAT-sourced
    links (``..sources.corpus.read_wat_links`` — both paths must emit
    identical edges for the same logical link): strip, drop same-page
    fragments and non-navigational schemes, resolve relative hrefs
    against ``base`` (stdlib ``urljoin``).  Returns ``{"url", "anchor"}``
    or ``None`` for a non-edge."""
    from urllib.parse import urljoin

    href = href.strip()
    # same-page fragments and non-navigational schemes are not edges
    if not href or href.startswith("#"):
        return None
    if href.lower().startswith(_NON_HTTP_SCHEMES):
        return None
    if base:
        try:
            url = urljoin(base, href)
        except ValueError:
            return None  # malformed base/href — skip the edge, keep the page
    else:
        url = href
    return {"url": url, "anchor": anchor}


LINKS_SCHEMA = "array<struct<url: string, anchor: string>>"


def extract_links(html_col, base_url_col=None) -> "F.Column":
    """Column function: outbound links of an HTML string column as
    ``array<struct<url, anchor>>`` — every ``<a href>`` with its
    whitespace-collapsed anchor text, relative hrefs resolved against
    ``base_url_col`` (stdlib ``urljoin`` semantics: ``/abs``, ``rel``,
    ``../up``, protocol-relative ``//host``).  Fragment-only and
    ``javascript:``/``mailto:``/``tel:``/``data:`` hrefs are dropped.
    NULL html → NULL; NULL base → hrefs returned unresolved.  Arrow-
    batched scalar pandas UDF, malformed-input-safe — the link-graph
    front of a crawl pipeline (feeds :func:`link_graph` → host-level
    PageRank as a quality prior)."""

    @F.pandas_udf(LINKS_SCHEMA)
    def _links(h: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [
                _extract_links_py(x, y) if x is not None else None
                for x, y in zip(h, b)
            ]
        )

    base = (
        F.lit(None).cast("string")
        if base_url_col is None
        else F.col(base_url_col)
        if isinstance(base_url_col, str)
        else base_url_col
    )
    html = F.col(html_col) if isinstance(html_col, str) else html_col
    return _links(html, base)


def link_graph(
    df: DataFrame,
    url_col: str = "url",
    html_col: str = "text",
    drop_self: bool = True,
) -> DataFrame:
    """Host-level link graph from raw-HTML crawl rows: one edge
    ``(src_host, dst_host, n_links)`` per ordered host pair, counting
    every anchor on a ``src_host`` page that targets ``dst_host``.
    Rows whose page URL or link URL has no parseable host are dropped;
    ``drop_self`` removes intra-host edges (site navigation dominates
    raw counts and carries no cross-site endorsement signal).

    Feed the result to :func:`~.graph.pagerank` for the host-authority
    quality prior (the Common-Crawl-style ranking used to weight crawl
    corpora).

    Scale shape: one Arrow-batched parse projection + explode (no
    shuffle), then one map-side-combinable count aggregate on the edge
    key.  Edge count is bounded by total anchors, and the hot-host skew
    lands on the AGGREGATE (combinable), never a window sort.
    """
    src = F.lower(F.try_parse_url(F.col(url_col), F.lit("HOST")))
    exploded = df.select(
        src.alias("__src"),
        F.explode(extract_links(html_col, url_col)).alias("__l"),
    ).select("__src", F.col("__l.url").alias("__dst_url"))
    return link_graph_from_edges(
        exploded, src_url_col=None, dst_url_col="__dst_url",
        src_host_col="__src", drop_self=drop_self,
    )


def link_graph_from_edges(
    df: DataFrame,
    src_url_col: str | None = "url",
    dst_url_col: str = "link_url",
    src_host_col: str | None = None,
    drop_self: bool = True,
) -> DataFrame:
    """Host-level link graph from PER-LINK rows (one row per outbound
    link: page URL or host + link URL) — the aggregation tail shared by
    :func:`link_graph` (HTML-parsed links) and
    :func:`~..sources.corpus.read_wat_links` (Common Crawl WAT
    pre-extracted links, which skip the HTML re-parse entirely).
    Same output and semantics as :func:`link_graph`:
    ``(src_host, dst_host, n_links)``, unparseable hosts dropped,
    ``drop_self`` removes intra-host edges.

    Scale shape: two codegen ``parse_url`` projections + one
    map-side-combinable count aggregate — no UDF, no explode here (the
    input is already per-link)."""
    src = (
        F.lower(F.col(src_host_col))
        if src_host_col is not None
        else F.lower(F.try_parse_url(F.col(src_url_col), F.lit("HOST")))
    )
    dst = F.lower(F.try_parse_url(F.col(dst_url_col), F.lit("HOST")))
    edges = df.select(src.alias("src_host"), dst.alias("dst_host")).filter(
        F.col("src_host").isNotNull() & F.col("dst_host").isNotNull()
    )
    if drop_self:
        edges = edges.filter(F.col("src_host") != F.col("dst_host"))
    return edges.groupBy("src_host", "dst_host").agg(
        F.count("*").alias("n_links")
    )


def anchor_text_index(
    df: DataFrame,
    url_col: str = "url",
    html_col: str = "text",
    k: int = 5,
    min_count: int = 1,
) -> DataFrame:
    """Incoming anchor-text index: for every link TARGET, the ``k`` most
    frequent anchor strings other pages use to link to it, with counts —
    the classic document-expansion / query-independent relevance signal
    (anchor text describes the target better than the target describes
    itself).  Returns ``(url, anchors: array<struct<anchor, n>>,
    n_incoming)`` where ``url`` is the normalized target, ``anchors`` is
    ordered by descending count (count-ties broken lexically so the
    output is deterministic), and ``n_incoming`` counts ALL incoming
    anchors — including those a ``min_count > 1`` prunes from the
    ``anchors`` list (the sum runs over the unfiltered per-anchor
    counts; only the list is thresholded).  Targets with NO anchor at
    or above ``min_count`` are dropped entirely.

    Empty anchors (image links) and intra-host links are dropped —
    site-navigation anchor text ("next", "home") is noise for document
    expansion; pass the raw edges through :func:`extract_links` directly
    when self-links matter.

    Scale shape: parse + explode, then TWO combinable hash aggregates —
    count by (target, anchor), then one ``collect_list`` per target over
    the PRE-AGGREGATED (target, anchor, n) rows.  The hottest target's
    state is its distinct-anchor count, not its incoming-link count (the
    million "click here" links collapsed in the first aggregate), and
    ``min_count`` cuts the long tail before the list build.  No window
    sort anywhere.
    """
    exploded = df.select(
        F.col(url_col).alias("__page_url"),
        F.explode(extract_links(html_col, url_col)).alias("__l"),
    ).select(
        "__page_url",
        F.col("__l.url").alias("__link_url"),
        F.col("__l.anchor").alias("__anchor"),
    )
    return anchor_text_index_from_edges(
        exploded, src_url_col="__page_url", dst_url_col="__link_url",
        anchor_col="__anchor", k=k, min_count=min_count,
    )


def anchor_text_index_from_edges(
    df: DataFrame,
    src_url_col: str = "url",
    dst_url_col: str = "link_url",
    anchor_col: str = "anchor",
    k: int = 5,
    min_count: int = 1,
) -> DataFrame:
    """:func:`anchor_text_index` over PER-LINK rows (page URL, link URL,
    anchor text) — the aggregation tail shared by the HTML-parse path
    and :func:`~..sources.corpus.read_wat_links` (Common Crawl WAT
    pre-extracted links), so the anchor index, like the link graph,
    never pays the HTML parse twice.  Same output, semantics, and
    two-combinable-aggregate scale shape as :func:`anchor_text_index`.
    """
    from text_extensions_for_pandas_spark.operators.urls import normalize_url

    src_host = F.lower(F.try_parse_url(F.col(src_url_col), F.lit("HOST")))
    dst_host = F.lower(F.try_parse_url(F.col(dst_url_col), F.lit("HOST")))
    hits = (
        df.select(
            src_host.alias("__src_host"),
            F.col(dst_url_col).alias("__turl"),
            dst_host.alias("__dst_host"),
            F.col(anchor_col).alias("anchor"),
        )
        .filter(
            (F.length("anchor") > 0)
            & F.col("__dst_host").isNotNull()
            & (F.col("__src_host") != F.col("__dst_host"))
        )
        .withColumn("url", normalize_url("__turl"))
    )
    counted = hits.groupBy("url", "anchor").agg(F.count("*").alias("n"))
    # n_incoming sums the UNFILTERED counts; min_count thresholds only
    # what enters the top-k list (a conditional collect — collect_list
    # drops NULLs — so one aggregate serves both, no second agg + join)
    list_entry = F.struct(F.col("n"), F.col("anchor"))
    if min_count > 1:
        list_entry = F.when(F.col("n") >= min_count, list_entry)

    # comparator: count DESC, anchor ASC on ties — fully deterministic
    def _cmp(l, r):
        return (
            F.when(l["n"] < r["n"], F.lit(1))
            .when(l["n"] > r["n"], F.lit(-1))
            .when(l["anchor"] < r["anchor"], F.lit(-1))
            .when(l["anchor"] > r["anchor"], F.lit(1))
            .otherwise(F.lit(0))
        )

    out = (
        counted.groupBy("url")
        .agg(
            F.slice(
                F.array_sort(F.collect_list(list_entry), _cmp),
                1,
                k,
            ).alias("__top"),
            F.sum("n").alias("n_incoming"),
        )
        .select(
            "url",
            F.transform(
                "__top",
                lambda s: F.struct(
                    s["anchor"].alias("anchor"), s["n"].alias("n")
                ),
            ).alias("anchors"),
            "n_incoming",
        )
    )
    if min_count > 1:
        # a target whose every anchor fell below the threshold has an
        # empty list: drop it (same row semantics as the pre-fix filter)
        out = out.filter(F.size("anchors") > 0)
    return out


def extract_html_documents(
    df: DataFrame,
    html_col: str = "text",
    min_chars: int = 1,
    rehash_ids: bool = True,
) -> DataFrame:
    """Turn raw-HTML crawl rows (e.g. ``read_wet_corpus(...,
    record_types=("response",))`` output) into canonical ``documents``
    rows: ``html_col`` is replaced by its extracted text, ``n_chars`` is
    recomputed, rows whose extraction came up shorter than ``min_chars``
    are dropped, and — by default — ``doc_id`` is re-derived from the
    EXTRACTED text (the :func:`~..sources.corpus.stable_doc_id`
    content-hash discipline: ids must follow the bytes every downstream
    dedup actually sees).  All other columns pass through unchanged.

    Rows whose ``html_col`` is NULL are DROPPED (even at
    ``min_chars=0``): the output is a documents table and a document
    needs text; count NULLs upstream if extraction auditing matters.

    Compose with :func:`~.dedup.remove_boilerplate` for the heuristic
    (frequency-based) boilerplate pass; this operator only removes what
    the markup itself declares to be non-content.
    """
    from text_extensions_for_pandas_spark.sources.corpus import stable_doc_id

    out = df.withColumn(html_col, html_to_text(F.col(html_col)))
    if "n_chars" in df.columns:
        out = out.withColumn(
            "n_chars", F.length(html_col).cast("long")
        )
    if rehash_ids and "doc_id" in df.columns:
        out = out.withColumn("doc_id", stable_doc_id(F.col(html_col)))
    return out.filter(F.length(html_col) >= min_chars)
