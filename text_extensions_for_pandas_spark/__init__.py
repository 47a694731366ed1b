"""text_extensions_for_pandas_spark — a PySpark-native engine with the
query/data-processing capabilities of CODAIT/text-extensions-for-pandas.

Design (see SURVEY.md §1.4, §7):

* No pandas ExtensionArray port.  A *span* is an ordinary Spark column of type
  ``STRUCT<begin INT, end INT>`` (half-open character interval) that travels
  next to a ``doc_id`` key column; document text lives in a normalized
  ``documents(doc_id, text)`` dimension table (the Spark-native replacement
  for the reference's ``StringTable`` dictionary encoding,
  reference ``array/string_table.py:32-45``).
* A *token span* is ``STRUCT<begin_token INT, end_token INT>`` plus
  ``doc_id``; char offsets are recovered by joining the token table
  (reference ``array/token_span.py:101-173``).
* Tensors / embeddings are ``ARRAY<FLOAT>`` columns
  (reference ``array/tensor.py:282-316``).
* Every operator is a function ``DataFrame -> DataFrame`` that builds a lazy
  Catalyst plan — scans stay pushdown-friendly, joins are expressed so
  Catalyst can broadcast / shuffle-hash them, and genuinely sequential
  per-document algorithms run in ``applyInPandas`` islands partitioned by
  ``doc_id``.
"""

from text_extensions_for_pandas_spark.session import get_spark

# reference-shaped namespaces (`import text_extensions_for_pandas_spark as
# tp; tp.spanner.extract_dict(...)` — the reference's import idiom)
from text_extensions_for_pandas_spark import cleaning, io, jupyter, spanner  # noqa: E402,F401

__version__ = "0.1.0"

__all__ = ["get_spark", "spanner", "io", "cleaning", "jupyter", "__version__"]
