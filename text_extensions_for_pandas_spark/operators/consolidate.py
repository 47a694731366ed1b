"""Consolidate — overlap elimination among spans
(reference ``spanner/consolidate.py:29-83``).

The ``left_to_right`` policy walks spans in (begin asc, end desc) order and
keeps the longest non-overlapping span at each position: a span is kept iff
its begin >= the end of the most recently kept span.  This scan is
inherently sequential *per document*, so it runs as a grouped-map pandas UDF
partitioned by ``doc_id`` — each document's spans are consolidated
independently and in parallel across the corpus (SURVEY.md §4 "known-hard
items").  The per-doc scan is O(n log n) numpy, not a Python row loop.

Edge semantics preserved from the reference scan (``consolidate.py:61-83``):
duplicated zero-length spans are *all* kept (begin == threshold is not
skipped), and ties at the same begin keep only the longest.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _greedy_left_to_right(begins: np.ndarray, ends: np.ndarray) -> np.ndarray:
    """Return positional indices retained by the left-to-right policy."""
    order = np.lexsort((-ends, begins))
    keep: list[int] = []
    threshold = -1 << 62
    for i in order:
        if begins[i] >= threshold:
            keep.append(i)
            threshold = ends[i]
    return np.asarray(keep, dtype=np.int64)


def consolidate(
    df: DataFrame,
    on: str = "span",
    how: str = "left_to_right",
    doc_col: str = "doc_id",
) -> DataFrame:
    """Rows of ``df`` that survive overlap elimination on span column ``on``.

    All non-span columns pass through unchanged, like the reference's
    ``df.iloc[ix_to_retain]``.
    """
    if how != "left_to_right":
        raise ValueError(
            f"'{how}' is not a valid consolidation policy; only "
            f"'left_to_right' is supported"
        )
    schema = df.schema

    def _consolidate_doc(pdf: pd.DataFrame) -> pd.DataFrame:
        spans = pd.DataFrame(pdf[on].tolist(), columns=["begin", "end"])
        keep = _greedy_left_to_right(
            spans["begin"].to_numpy(), spans["end"].to_numpy()
        )
        return pdf.iloc[np.sort(keep)]

    # groupBy supplies the doc_id exchange; an explicit repartition here
    # would add a second, redundant shuffle.
    return df.groupBy(doc_col).applyInPandas(_consolidate_doc, schema=schema)
