"""Reference-namespace compatibility: ``tp.cleaning.preprocess``
(``cleaning/preprocess.py``) — the BERT preprocessing and gold-span
combination surface, re-exported from its home modules."""

from text_extensions_for_pandas_spark.operators.ml import (  # noqa: F401
    combine_raw_spans_docs,
    combine_raw_spans_docs_to_match,
)
from text_extensions_for_pandas_spark.sources.nlp_bridges import (  # noqa: F401
    conll_to_bert as preprocess_doc_with_bert,
)
from text_extensions_for_pandas_spark.sources.nlp_bridges import (  # noqa: F401
    preprocess_documents,
)

__all__ = [
    "combine_raw_spans_docs",
    "combine_raw_spans_docs_to_match",
    "preprocess_doc_with_bert",
    "preprocess_documents",
]
