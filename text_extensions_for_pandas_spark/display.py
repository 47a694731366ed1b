"""Notebook display helper — marked-up document text for span columns.

Minimal port of the reference's Jupyter rendering (``jupyter/span.py:42-426``
renders highlighted document context for a span column).  Driver-side by
design: callers pass a *bounded* spans DataFrame (``limit()`` first); the
engine never renders at scale.
"""

from __future__ import annotations

import html

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def render_spans_html(
    spans: DataFrame,
    documents: DataFrame,
    span_col: str = "span",
    doc_col: str = "doc_id",
    label_col: str | None = None,
    max_docs: int = 10,
) -> str:
    """HTML with each document's text and its spans wrapped in ``<mark>``.

    Overlapping spans are consolidated to the earliest-longest per position
    for rendering sanity (same left-to-right rule as ``consolidate``).
    """
    rows = (
        spans.select(
            F.col(doc_col).alias("d"),
            F.col(span_col)["begin"].alias("b"),
            F.col(span_col)["end"].alias("e"),
            *(
                [F.col(label_col).alias("lbl")]
                if label_col
                else [F.lit(None).alias("lbl")]
            ),
        )
        .orderBy("d", "b", F.col("e").desc())
        .collect()
    )
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.d, []).append((r.b, r.e, r.lbl))
    doc_ids = list(by_doc)[:max_docs]
    texts = {
        r[doc_col]: r["text"]
        for r in documents.filter(F.col(doc_col).isin(doc_ids)).collect()
    }
    parts = ["<div class='spans'>"]
    for d in doc_ids:
        text = texts.get(d, "")
        out, cursor = [], 0
        for b, e, lbl in by_doc[d]:
            if b < cursor:
                continue  # overlap: keep earlier-longer span
            out.append(html.escape(text[cursor:b]))
            title = f" title='{html.escape(str(lbl))}'" if lbl is not None else ""
            out.append(f"<mark{title}>{html.escape(text[b:e])}</mark>")
            cursor = e
        out.append(html.escape(text[cursor:]))
        parts.append(
            f"<p><b>doc {html.escape(str(d))}</b><br>{''.join(out)}</p>"
        )
    parts.append("</div>")
    return "".join(parts)
