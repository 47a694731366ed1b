"""Notebook display helper — marked-up document text for span columns.

Reimplements the reference's Jupyter span rendering (``jupyter/span.py:
42-426``): an offsets table plus the document text with span regions
highlighted.  The reference's interactive widget wraps a static HTML
fallback built from three region types — SOLO (one isolated span), NESTED
(spans fully inside one root span), COMPLEX (partially-overlapping spans,
or nesting deeper than one level) — and that static structure is what this
module reproduces: same region classification (``_is_complex`` /
``_get_set_span`` semantics), same sanitization rules (including ``$``
isolation for Jupyter's LaTeX detection and newline → ``<br>``), minus the
JS/CSS payload.

Driver-side by design: callers pass a *bounded* spans DataFrame
(``limit()`` first); the engine never renders at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NESTED = "nested"
_OVERLAP = "overlap"


def _sanitize(text: str) -> str:
    """Reference ``_get_sanitized_text`` (``jupyter/span.py:399-426``):
    HTML escaping plus ``$`` wrapped in its own span (Jupyter's MathJax
    would treat a bare one as a LaTeX delimiter) and newlines as ``<br>``.
    """
    out = []
    for ch in text:
        if ch == "&":
            out.append("&amp;")
        elif ch == "<":
            out.append("&lt;")
        elif ch == ">":
            out.append("&gt;")
        elif ch == '"':
            out.append("&quot;")
        elif ch == "'":
            out.append("&#39;")
        elif ch == "$":
            out.append("<span>&#36;</span>")
        elif ch in ("\n", "\r"):
            out.append("<br>")
        else:
            out.append(ch)
    return "".join(out)


def _link_spans(sorted_spans: list[dict]) -> None:
    """Populate each span's ``sets`` with its (type, idx) relations to
    later spans it touches — reference ``jupyter/span.py:203-218``."""
    for i, s in enumerate(sorted_spans):
        for j in range(i + 1, len(sorted_spans)):
            o = sorted_spans[j]
            if o["begin"] >= s["end"]:
                break
            s["sets"].append(
                (_NESTED if o["end"] <= s["end"] else _OVERLAP, j)
            )


def _set_span(spans: list[dict], i: int) -> tuple[int, int]:
    """(max end, highest idx) of the transitive overlap closure rooted at
    span ``i`` — reference ``_get_set_span`` (``jupyter/span.py:368-383``)."""
    end, highest = spans[i]["end"], i
    for _, j in spans[i]["sets"]:
        o_end, o_high = _set_span(spans, j)
        end = max(end, o_end)
        highest = max(highest, o_high)
    return end, highest


def _is_complex(spans: list[dict], i: int) -> bool:
    """Partial overlap anywhere, or nesting deeper than one level —
    reference ``_is_complex`` (``jupyter/span.py:385-397``)."""
    for typ, j in spans[i]["sets"]:
        if typ == _OVERLAP:
            return True
        if typ == _NESTED and spans[j]["sets"]:
            return True
    return False


def _mark(body: str, css: str, label) -> str:
    title = f" title='{_sanitize(str(label))}'" if label is not None else ""
    cls = f" class='{css}'" if css else ""
    return f"<mark{cls}{title}>{body}</mark>"


def _render_doc(text: str, doc_spans: list[tuple[int, int, object]], show_offsets: bool) -> str:
    spans = [
        {"begin": b, "end": e, "lbl": lbl, "sets": []}
        for b, e, lbl in sorted(doc_spans, key=lambda t: (t[0], -t[1]))
    ]
    _link_spans(spans)

    parts = []
    if show_offsets:
        rows = "".join(
            f"<tr><td><b>{i}</b></td><td>{s['begin']}</td><td>{s['end']}</td>"
            f"<td>{_sanitize(str(s['lbl'])) if s['lbl'] is not None else ''}</td>"
            f"<td>{_sanitize(text[s['begin']:s['end']])}</td></tr>"
            for i, s in enumerate(spans)
        )
        parts.append(
            "<table class='offsets'><thead><tr><th></th><th>begin</th>"
            "<th>end</th><th>label</th><th>context</th></tr></thead>"
            f"<tbody>{rows}</tbody></table>"
        )

    body = []
    cursor = 0
    i = 0
    while i < len(spans):
        s = spans[i]
        region_end, highest = _set_span(spans, i)
        body.append(_sanitize(text[cursor:s["begin"]]))
        if not s["sets"]:
            body.append(_mark(_sanitize(text[s["begin"]:s["end"]]), "", s["lbl"]))
        elif _is_complex(spans, i):
            # partially-overlapping set: one flat highlight, tagged "Set"
            body.append(
                _mark(
                    _sanitize(text[s["begin"]:region_end])
                    + "<span class='mark-tag'>Set</span>",
                    "complex-set",
                    None,
                )
            )
        else:
            # spans fully nested in s: inner marks inside the root mark
            inner = []
            pos = s["begin"]
            for _, j in s["sets"]:
                n = spans[j]
                inner.append(_sanitize(text[pos:n["begin"]]))
                inner.append(
                    _mark(_sanitize(text[n["begin"]:n["end"]]), "nested", n["lbl"])
                )
                pos = n["end"]
            inner.append(_sanitize(text[pos:region_end]))
            body.append(_mark("".join(inner), "nested-root", s["lbl"]))
        cursor = region_end
        i = highest + 1
    body.append(_sanitize(text[cursor:]))
    parts.append(f"<p class='document-text'>{''.join(body)}</p>")
    return f"<div class='document'>{''.join(parts)}</div>"


def render_spans_html(
    spans: DataFrame,
    documents: DataFrame,
    span_col: str = "span",
    doc_col: str = "doc_id",
    label_col: str | None = None,
    max_docs: int = 10,
    show_offsets: bool = False,
) -> str:
    """HTML for a spans DataFrame: per document, an optional offsets table
    and the document text with highlighted span regions.

    Region semantics match the reference's static rendering
    (``jupyter/span.py:244-332``): isolated spans get a plain ``<mark>``
    (with the label as ``title`` when ``label_col`` is given); spans fully
    nested one level deep render as marks inside their root's mark;
    partially-overlapping or deeply-nested clusters collapse into one
    flat ``complex-set`` highlight tagged "Set".  Documents beyond
    ``max_docs`` are dropped with a ``<footer>`` note, like the
    reference's display limit.
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
    parts = ["<div class='span-array'>"]
    for d in doc_ids:
        parts.append(f"<h4>doc {_sanitize(str(d))}</h4>")
        parts.append(_render_doc(texts.get(d, ""), by_doc[d], show_offsets))
    if len(by_doc) > max_docs:
        parts.append(
            f"<footer>Documents truncated. Showing {max_docs} of "
            f"{len(by_doc)}</footer>"
        )
    parts.append("</div>")
    return "".join(parts)


# Reference surface name (``jupyter/span.py:46``): its pretty_print_html
# takes a SpanArray + show_offsets flag; the Spark-first equivalent takes
# the (spans, documents) DataFrames.  Same static rendering semantics.
pretty_print_html = render_spans_html


class DataFrameWidget:
    """Static (non-interactive) subset of the reference's
    ``jupyter/widget/core.py:43`` ``DataFrameWidget``: the same
    two-pane structure — a row table of the DataFrame beside the span
    visualization in document context — rendered as plain HTML with no
    ipywidgets/JS dependency, so it works in any notebook or saved HTML
    report.

    Surface parity (reference methods, ``jupyter/widget/core.py``):

    * ``to_dataframe()`` (ref :115-129) — the bounded rows as pandas;
    * ``selected()`` (ref :115) — the metadata (selection) column;
    * ``display()`` (ref :119) — IPython.display when available, else
      returns the HTML object;
    * ``_repr_html_`` — renders inline in Jupyter automatically.

    Deliberately NOT ported (interactive editing): in-place span
    begin/end editing, add-row, tag/color-mode dropdowns
    (``jupyter/widget/table.py:39-141``).  ``set_interactive_columns``
    raises ``NotImplementedError`` with this scope note — editing
    DataFrame cells through browser callbacks has no Spark-side
    equivalent (plans are immutable; re-run the pipeline instead).

    Driver-side by design, like :func:`render_spans_html`: rows are
    bounded by ``max_rows`` before collecting.
    """

    def __init__(
        self,
        dataframe: DataFrame,
        documents: DataFrame | None = None,
        metadata_column: str | None = None,
        span_col: str = "span",
        doc_col: str = "doc_id",
        label_col: str | None = None,
        max_rows: int = 50,
    ) -> None:
        self._df = dataframe.limit(max_rows)
        self._documents = documents
        self._metadata_column = metadata_column
        self._span_col = span_col
        self._doc_col = doc_col
        self._label_col = label_col
        self._max_rows = max_rows

    def to_dataframe(self):
        """The widget's current rows as a pandas DataFrame (bounded)."""
        return self._df.toPandas()

    def selected(self):
        """The selection column (reference ``metadata_column``): a pandas
        boolean Series, all-False when none was provided — the static
        widget has no checkboxes to flip it."""
        import pandas as pd

        pdf = self.to_dataframe()
        if self._metadata_column and self._metadata_column in pdf.columns:
            return pdf[self._metadata_column].astype(bool)
        return pd.Series([False] * len(pdf))

    def set_interactive_columns(self, columns: list) -> None:
        raise NotImplementedError(
            "Interactive column editing is out of scope for the static "
            "widget: Spark plans are immutable, so cell edits have no "
            "engine-side meaning. Re-derive the DataFrame instead. "
            "(Reference: jupyter/widget/core.py:131.)"
        )

    def to_html(self) -> str:
        """The two-pane HTML: row table, then (when ``documents`` was
        given and a span column exists) the span visualization."""
        pdf = self.to_dataframe()
        head = "".join(
            f"<th>{_sanitize(str(c))}</th>" for c in ["index", *pdf.columns]
        )
        body = []
        for idx, row in pdf.iterrows():
            cells = "".join(
                f"<td>{_sanitize(str(v))}</td>" for v in [idx, *row.tolist()]
            )
            body.append(f"<tr>{cells}</tr>")
        parts = [
            "<div class='tep-dataframe-widget'>",
            "<table class='tep-widget-table'>",
            f"<thead><tr>{head}</tr></thead>",
            f"<tbody>{''.join(body)}</tbody>",
            "</table>",
        ]
        if (
            self._documents is not None
            and self._span_col in self._df.columns
        ):
            parts.append(
                render_spans_html(
                    self._df,
                    self._documents,
                    span_col=self._span_col,
                    doc_col=self._doc_col,
                    label_col=self._label_col,
                    max_docs=self._max_rows,
                )
            )
        parts.append("</div>")
        return "".join(parts)

    _repr_html_ = to_html

    def display(self):
        """Show the widget (IPython when present, else return the HTML)."""
        try:
            from IPython.display import HTML, display as ipy_display
        except ImportError:
            return self.to_html()
        html = HTML(self.to_html())
        ipy_display(html)
        return html
