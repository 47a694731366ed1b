"""Reference-namespace compatibility: ``text_extensions_for_pandas.jupyter``
(``jupyter/__init__.py``) — notebook rendering helpers.

``run_with_progress_bar`` is intentionally absent: Spark jobs report
progress through the Spark UI / listener bus, not a driver-side tqdm loop.
``DataFrameWidget`` (interactive ipywidgets editing) has no server-side
analogue; use :func:`pretty_print_html`'s static rendering.
"""

from text_extensions_for_pandas_spark.display import (  # noqa: F401
    pretty_print_html,
    render_spans_html,
)

__all__ = ["pretty_print_html", "render_spans_html"]
