"""Column-function namespaces (the Spark-native replacement for the
reference's extension-dtype accessors, ``array/accessor.py:31-67``)."""

from text_extensions_for_pandas_spark.functions import spans, text

__all__ = ["spans", "text"]
