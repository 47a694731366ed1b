"""Reference-namespace compatibility: ``text_extensions_for_pandas.jupyter``
(``jupyter/__init__.py``) — notebook rendering helpers.

``run_with_progress_bar`` is intentionally absent: Spark jobs report
progress through the Spark UI / listener bus, not a driver-side tqdm loop.
``DataFrameWidget`` is the STATIC subset of the reference's ipywidgets
widget (``jupyter/widget/core.py:43``): same two-pane structure and
display/to_dataframe/selected surface, no browser-side editing (plans are
immutable — see its docstring's scope note).
"""

from text_extensions_for_pandas_spark.display import (  # noqa: F401
    DataFrameWidget,
    pretty_print_html,
    render_spans_html,
)

__all__ = ["DataFrameWidget", "pretty_print_html", "render_spans_html"]
