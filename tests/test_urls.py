"""URL/domain operators: part extraction, suffix-chain blocklist
filtering, normalization, and same-page crawl dedup."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_extract_url_parts(spark):
    from text_extensions_for_pandas_spark.operators.urls import (
        extract_url_parts,
    )

    df = spark.createDataFrame(
        [
            ("HTTPS://Sub.Example.COM/Path/Page?q=1#frag",),
            ("not a url",),
        ],
        "url string",
    )
    rows = {r.url: r for r in extract_url_parts(df).collect()}
    good = rows["HTTPS://Sub.Example.COM/Path/Page?q=1#frag"]
    assert good.scheme == "https"
    assert good.host == "sub.example.com"
    assert good.path == "/Path/Page"
    assert good.query == "q=1"
    assert rows["not a url"].host is None


def test_filter_blocked_domains_suffix_semantics(spark):
    from text_extensions_for_pandas_spark.operators.urls import (
        filter_blocked_domains,
    )

    df = spark.createDataFrame(
        [
            (1, "http://ads.tracker.example/x"),  # blocked via parent
            (2, "http://tracker.example/y"),      # blocked exactly
            (3, "http://example.com/ok"),          # kept
            (4, "http://nottracker.example.com/ok"),  # NOT a suffix match
            (5, "garbage"),                        # unparseable
        ],
        "doc_id long, url string",
    )
    kept = filter_blocked_domains(df, ["tracker.example", "Spam.Org"])
    assert {r.doc_id for r in kept.collect()} == {3, 4}
    # unparseable hosts kept on request
    kept2 = filter_blocked_domains(
        df, ["tracker.example"], keep_unparseable=True
    )
    assert {r.doc_id for r in kept2.collect()} == {3, 4, 5}
    # DataFrame blocklist, pre-extracted host column
    bl = spark.createDataFrame([("example.com",)], "domain string")
    kept3 = filter_blocked_domains(
        df.withColumn("h", F.lower(F.try_parse_url("url", F.lit("HOST")))),
        bl,
        host_col="h",
    )
    assert {r.doc_id for r in kept3.collect()} == {1, 2}
    # original columns intact, helper column gone
    assert set(kept.columns) == {"doc_id", "url"}


def test_url_op_plan_shapes(spark):
    """Physical-shape guard: blocklist filtering is hash joins (no
    nested loop), page dedup is a partial-aggregated max_by — no window
    sort anywhere in either plan."""
    import contextlib
    import io

    from text_extensions_for_pandas_spark.operators.urls import (
        dedup_by_url,
        filter_blocked_domains,
    )

    def plan_of(df):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    df = spark.createDataFrame(
        [(1, "http://a.example/x", "2024-01-01")],
        "doc_id long, url string, warc_date string",
    )
    p1 = plan_of(filter_blocked_domains(df, ["spam.example"]))
    assert "BroadcastNestedLoopJoin" not in p1 and "CartesianProduct" not in p1
    assert "Window" not in p1

    p2 = plan_of(dedup_by_url(df))
    assert "Window" not in p2
    assert "max_by" in p2 or "HashAggregate" in p2 or "SortAggregate" in p2
    # partial aggregation before the exchange (map-side combine)
    assert p2.count("Aggregate") >= 2


def test_normalize_and_dedup_by_url(spark):
    from text_extensions_for_pandas_spark.operators.urls import (
        dedup_by_url,
        normalize_url,
    )

    df = spark.createDataFrame(
        [
            ("HTTP://A.example/page/", "2024-01-01", "old"),
            ("http://a.example/page#frag", "2024-02-01", "new"),
            ("http://a.example/other", "2024-01-15", "other"),
            ("http://a.example", "2024-01-01", "root"),
            ("http://a.example/?", "2024-01-02", "root2"),
        ],
        "url string, warc_date string, text string",
    )
    norms = {
        r.text: r.n
        for r in df.select("text", normalize_url("url").alias("n")).collect()
    }
    assert norms["old"] == norms["new"] == "http://a.example/page"
    assert norms["root"] == norms["root2"] == "http://a.example/"

    latest = dedup_by_url(df, keep="last")
    by_text = {r.text for r in latest.collect()}
    assert "new" in by_text and "old" not in by_text
    assert "other" in by_text
    # exactly one of the two root crawls survives (the newer)
    assert ("root2" in by_text) and ("root" not in by_text)
    assert set(latest.columns) == {"url", "warc_date", "text"}

    first = dedup_by_url(df, keep="first")
    t = {r.text for r in first.collect()}
    assert "old" in t and "new" not in t and "root" in t


def test_dedup_by_url_passes_null_and_blank_urls_through(spark):
    """Documents with a missing URL (NULL, '' — the parser emits '' for
    absent WARC-Target-URI — or whitespace) must pass through UN-deduped:
    NULL normalizes to NULL and groupBy puts every NULL in one group, so
    without the passthrough branch an entire URL-less shard would
    silently collapse to one survivor."""
    from text_extensions_for_pandas_spark.operators.urls import dedup_by_url

    df = spark.createDataFrame(
        [
            (None, "2024-01-01", "n1"),
            (None, "2024-01-02", "n2"),
            ("", "2024-01-03", "e1"),
            ("", "2024-01-04", "e2"),
            ("  ", "2024-01-05", "w1"),
            ("http://a.example/p", "2024-01-06", "u-old"),
            ("http://a.example/p/", "2024-01-07", "u-new"),
        ],
        "url string, warc_date string, text string",
    )
    out = dedup_by_url(df, keep="last")
    texts = sorted(r.text for r in out.collect())
    # all five URL-less rows survive; the two real crawls dedup to one
    assert texts == ["e1", "e2", "n1", "n2", "u-new", "w1"]
    assert set(out.columns) == {"url", "warc_date", "text"}


def test_normalize_url_strips_default_ports(spark):
    """Default-port stripping: http://h:80 ≡ http://h and https ≡ :443;
    non-default ports and other schemes keep theirs."""
    from text_extensions_for_pandas_spark.operators.urls import normalize_url

    df = spark.createDataFrame(
        [
            ("http://a.example:80/p",),
            ("HTTP://A.example:80/p",),
            ("http://a.example/p",),
            ("https://a.example:443/p",),
            ("https://a.example/p",),
            ("http://a.example:8080/p",),
            ("ftp://a.example:80/p",),
            ("http://a.example:80",),
        ],
        "url string",
    )
    n = [r.n for r in df.select(normalize_url("url").alias("n")).collect()]
    assert n[0] == n[1] == n[2] == "http://a.example/p"
    assert n[3] == n[4] == "https://a.example/p"
    assert n[5] == "http://a.example:8080/p"  # non-default kept
    assert n[6] == "ftp://a.example:80/p"  # other schemes untouched
    assert n[7] == "http://a.example/"  # port gone, default path applied


def test_normalize_url_pathless_query_not_folded_and_port_stripped(spark):
    """The scheme://host prefix stops at '/', '?', or '#': a path-less
    URL's query keeps its case (queries are case-sensitive resources)
    and cannot hide a default port from the strip rule."""
    from text_extensions_for_pandas_spark.operators.urls import normalize_url

    df = spark.createDataFrame(
        [
            ("http://H.example:80?a=1",),
            ("http://h.example?a=1",),
            ("http://h.example?Session=AbC",),
            ("http://h.example?session=abc",),
        ],
        "url string",
    )
    n = [r.n for r in df.select(normalize_url("url").alias("n")).collect()]
    assert n[0] == n[1] == "http://h.example?a=1"  # port stripped, host folded
    assert n[2] == "http://h.example?Session=AbC"  # query case preserved
    assert n[2] != n[3]  # distinct resources stay distinct


def test_normalize_url_schemeless_hosts_not_case_folded(spark):
    """Pin the documented asymmetry: with no scheme the host/path split
    is ambiguous, so scheme-less inputs get NO host case-folding —
    'Example.com/p' and 'example.com/p' stay distinct while their
    schemeful twins collapse."""
    from text_extensions_for_pandas_spark.operators.urls import normalize_url

    df = spark.createDataFrame(
        [
            ("Example.com/p",),
            ("example.com/p",),
            ("HTTP://Example.com/p",),
            ("http://example.com/p",),
        ],
        "url string",
    )
    n = [r.n for r in df.select(normalize_url("url").alias("n")).collect()]
    assert n[0] == "Example.com/p" and n[1] == "example.com/p"  # distinct
    assert n[2] == n[3] == "http://example.com/p"  # schemeful twins collapse


def test_normalize_url_schemeless_tail_rules(spark):
    """Scheme-less inputs get the same tail normalization as absolute
    URLs: 'example.com/page/' collapses with 'example.com/page', and
    'a.com/' with 'a.com' — previously only their schemeful twins did."""
    from text_extensions_for_pandas_spark.operators.urls import normalize_url

    df = spark.createDataFrame(
        [
            ("example.com/page/",),
            ("example.com/page",),
            ("a.com/",),
            ("a.com",),
            ("a.com/x?",),
            ("///",),
        ],
        "url string",
    )
    norms = [r.n for r in df.select(normalize_url("url").alias("n")).collect()]
    assert norms[0] == norms[1] == "example.com/page"
    assert norms[2] == norms[3] == "a.com"
    assert norms[4] == "a.com/x"
    assert norms[5] == "/"


# ---------------------------------------------------------------------------
# robots.txt
# ---------------------------------------------------------------------------

def test_parse_robots_py_groups_and_wildcards():
    from text_extensions_for_pandas_spark.operators.urls import (
        _parse_robots_py,
    )

    txt = (
        "# comment line\n"
        "User-agent: GoodBot\n"
        "User-agent: OtherBot\n"   # agent-line run shares one rule group
        "Disallow: /g/\n"
        "\n"
        "User-agent: *\n"
        "Disallow: /private/\n"
        "Allow: /private/ok\n"
        "Disallow: /*.pdf$\n"
        "Disallow:\n"              # empty pattern matches nothing -> dropped
        "Crawl-delay: 10\n"        # non-rule directives ignored
    )
    star = _parse_robots_py(txt, "*")
    assert [(r["rule"], r["prefix"]) for r in star] == [
        ("disallow", "/private/"),
        ("allow", "/private/ok"),
        ("disallow", "/*.pdf$"),
    ]
    # LIKE compilation: * -> %, $ anchors (no trailing %), specificity
    # counts wildcard-free chars
    pdf = star[2]
    assert pdf["pattern"] == "/%.pdf" and pdf["spec"] == 5
    assert star[0]["pattern"] == "/private/%"
    # exact agent group wins over * and is case-insensitive
    good = _parse_robots_py(txt, "goodbot")
    assert [(r["rule"], r["prefix"]) for r in good] == [("disallow", "/g/")]
    assert _parse_robots_py(txt, "OTHERBOT")[0]["prefix"] == "/g/"
    # unknown agent falls back to the * group
    assert len(_parse_robots_py(txt, "nobody")) == 3
    # garbage never raises
    assert _parse_robots_py("\x00\xff not : robots", "*") == []


def test_parse_robots_py_group_selection_rfc9309():
    from text_extensions_for_pandas_spark.operators.urls import (
        _parse_robots_py,
    )

    # group token matches the crawler's product token as a prefix:
    # 'trainbot/1.2' must select the 'trainbot' group, not fall to '*'
    txt = (
        "User-agent: *\nDisallow: /\n\n"
        "User-agent: trainbot\nDisallow: /t/\n"
    )
    assert [r["prefix"] for r in _parse_robots_py(txt, "trainbot/1.2")] == [
        "/t/"
    ]
    # longest matching token wins when several prefix-match
    txt_two = (
        "User-agent: train\nDisallow: /a/\n\n"
        "User-agent: trainbot\nDisallow: /b/\n"
    )
    assert [r["prefix"] for r in _parse_robots_py(txt_two, "trainbot/9")] == [
        "/b/"
    ]
    # an exact group whose rules are all empty-pattern is allow-all for
    # that agent — NOT a fall-through to the '*' blanket disallow
    txt_empty = (
        "User-agent: *\nDisallow: /\n\n"
        "User-agent: trainbot\nDisallow:\n"
    )
    assert _parse_robots_py(txt_empty, "trainbot") == []
    assert _parse_robots_py(txt_empty, "TrainBot/1.2") == []
    # other agents still get the star blanket
    assert [r["prefix"] for r in _parse_robots_py(txt_empty, "otherbot")] == [
        "/"
    ]
    # no star group + no matching named group = allow-all
    txt_no_star = "User-agent: trainbot\nDisallow: /\n"
    assert _parse_robots_py(txt_no_star, "otherbot") == []


def test_filter_by_robots_query_string_rules(spark):
    from text_extensions_for_pandas_spark.operators.urls import (
        filter_by_robots,
    )

    robots = spark.createDataFrame(
        [
            (
                "q.example",
                "User-agent: *\n"
                "Disallow: /*?session=\n"
                "Disallow: /search?\n"
                "Allow: /\n",
            )
        ],
        "host string, robots_txt string",
    )
    docs = spark.createDataFrame(
        [
            ("http://q.example/page?session=abc",),   # query rule matches
            ("http://q.example/page?sess=abc",),      # near-miss kept
            ("http://q.example/page",),               # no query kept
            ("http://q.example/search?q=x",),         # literal '?' rule
            ("http://q.example/searcher",),           # '?' must not match
            ("http://q.example/?session=1",),         # empty path -> '/'
        ],
        "url string",
    )
    kept = sorted(
        r.url
        for r in filter_by_robots(docs, robots, user_agent="trainbot")
        .collect()
    )
    assert kept == [
        "http://q.example/page",
        "http://q.example/page?sess=abc",
        "http://q.example/searcher",
    ]


def test_filter_by_robots_longest_match_allow_wins(spark):
    from text_extensions_for_pandas_spark.operators.urls import (
        filter_by_robots,
    )

    robots = spark.createDataFrame(
        [
            (
                "a.example",
                "User-agent: *\n"
                "Disallow: /private/\n"
                "Allow: /private/ok\n"
                "Disallow: /*.pdf$\n"
                "Allow: /\n",
            ),
            ("shut.example", "User-agent: *\nDisallow: /\n"),
        ],
        "host string, robots_txt string",
    )
    docs = spark.createDataFrame(
        [
            ("http://a.example/private/secret",),   # disallowed
            ("http://a.example/private/ok/deep",),  # allow wins (longer)
            ("http://a.example/open/page",),        # allowed by /
            ("http://a.example/docs/file.pdf",),    # $-anchored disallow
            ("http://a.example/file.pdf.html",),    # anchor must NOT match
            ("http://A.EXAMPLE/private/x",),        # host match case-folds
            ("http://shut.example/anything",),      # blanket disallow
            ("http://norobots.example/x",),         # no robots -> allowed
            ("not a url",),                         # unparseable -> allowed
        ],
        "url string",
    )
    kept = sorted(r.url for r in filter_by_robots(docs, robots).collect())
    assert kept == [
        "http://a.example/file.pdf.html",
        "http://a.example/open/page",
        "http://a.example/private/ok/deep",
        "http://norobots.example/x",
        "not a url",
    ]


def test_filter_by_robots_agent_groups_and_preparsed(spark):
    from text_extensions_for_pandas_spark.operators.urls import (
        filter_by_robots,
        parse_robots,
    )

    robots = spark.createDataFrame(
        [
            (
                "b.example",
                "User-agent: trainbot\nDisallow: /\n\n"
                "User-agent: *\nAllow: /\n",
            )
        ],
        "host string, robots_txt string",
    )
    docs = spark.createDataFrame(
        [("http://b.example/page",)], "url string"
    )
    assert filter_by_robots(docs, robots).count() == 1
    assert filter_by_robots(docs, robots, user_agent="TrainBot").count() == 0
    # pre-parsed rules are accepted as-is (same decision)
    rules = parse_robots(robots, user_agent="trainbot")
    assert filter_by_robots(docs, rules).count() == 0
    # original columns survive untouched
    out = filter_by_robots(
        docs.withColumn("host", F.lit("keepme")), robots
    )
    assert out.columns == ["url", "host"]
    assert out.collect()[0].host == "keepme"


def test_parse_sitemaps_urlset_and_index(spark):
    from text_extensions_for_pandas_spark.operators.urls import (
        parse_sitemaps,
    )

    urlset = (
        '<?xml version="1.0"?>\n'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
        "<url><loc> http://a.example/p/1 </loc>"
        "<lastmod>2024-01-01</lastmod><changefreq>daily</changefreq>"
        "<priority>0.8</priority></url>\n"
        # entity-escaped loc + CDATA form + missing optional fields
        "<url><loc>http://a.example/p/2?x=1&amp;y=2</loc></url>\n"
        "<url><loc><![CDATA[http://a.example/p/3]]></loc></url>\n"
        "<url><lastmod>2024-01-02</lastmod></url>\n"  # no loc: dropped
        "</urlset>"
    )
    index = (
        "<sitemapindex><sitemap><loc>http://b.example/s1.xml</loc>"
        "<lastmod>2024-02-01</lastmod></sitemap>"
        "<sitemap><loc>http://b.example/s2.xml</loc></sitemap>"
        "</sitemapindex>"
    )
    df = spark.createDataFrame(
        [("A.example", urlset), ("b.example", index), ("c.example", "<garbage")],
        ["host", "sitemap_xml"],
    )
    rows = sorted(
        tuple(r) for r in parse_sitemaps(df).collect()
    )
    assert rows == sorted(
        [
            ("a.example", "url", "http://a.example/p/1", "2024-01-01",
             "daily", 0.8),
            ("a.example", "url", "http://a.example/p/2?x=1&y=2", None,
             None, None),
            ("a.example", "url", "http://a.example/p/3", None, None, None),
            ("b.example", "sitemap", "http://b.example/s1.xml",
             "2024-02-01", None, None),
            ("b.example", "sitemap", "http://b.example/s2.xml", None,
             None, None),
        ]
    )


def test_parse_sitemaps_numeric_char_refs(spark):
    """sitemaps.org producers escape with numeric character references
    too (&#47; / &#x2F; style); the decoder must handle decimal, hex,
    non-ASCII code points, keep &amp;#47; as a literal '&#47;' (no
    double-decode), and leave out-of-range refs untouched."""
    from text_extensions_for_pandas_spark.operators.urls import (
        parse_sitemaps,
    )

    urlset = (
        "<urlset>"
        "<url><loc>http://a.example&#47;p&#x2F;1</loc></url>"
        "<url><loc>http://a.example/&#x4E2D;&#25991;</loc></url>"
        "<url><loc>http://a.example/amp&amp;#47;lit</loc></url>"
        "<url><loc>http://a.example/bad&#x110000;ref</loc></url>"
        "</urlset>"
    )
    df = spark.createDataFrame([("a.example", urlset)], ["host", "sitemap_xml"])
    locs = sorted(r["loc"] for r in parse_sitemaps(df).collect())
    assert locs == sorted(
        [
            "http://a.example/p/1",
            "http://a.example/中文",
            "http://a.example/amp&#47;lit",
            "http://a.example/bad&#x110000;ref",
        ]
    )


def test_parse_sitemaps_is_jvm_only(spark):
    from text_extensions_for_pandas_spark.operators.urls import (
        parse_sitemaps,
    )

    df = spark.createDataFrame([("h", "<urlset/>")], ["host", "sitemap_xml"])
    plan = parse_sitemaps(df)._jdf.queryExecution().toString()
    assert "mapInPandas" not in plan and "BatchEvalPython" not in plan


def test_extract_sitemap_directives(spark):
    from text_extensions_for_pandas_spark.operators.urls import (
        extract_sitemap_directives,
    )

    robots = (
        "User-agent: *\nDisallow: /x\n"
        "SITEMAP: http://h.example/sitemap.xml\n"
        "sitemap:http://h.example/s2.xml\n"
        "# sitemap: http://h.example/commented.xml is prose, not a "
        "directive\n"
    )
    df = spark.createDataFrame(
        [("H.example", robots), ("e.example", "User-agent: *\n")],
        ["host", "robots_txt"],
    )
    rows = sorted(tuple(r) for r in extract_sitemap_directives(df).collect())
    assert rows == [
        ("h.example", "http://h.example/s2.xml"),
        ("h.example", "http://h.example/sitemap.xml"),
    ]
