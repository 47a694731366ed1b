"""Reference-namespace compatibility: ``text_extensions_for_pandas.io``.

Mirrors the reference's ``tp.io.{conll,spacy,bert,watson}`` module layout
(``io/__init__.py``) onto this engine's sources:

* ``io.conll``  → :mod:`..sources.conll`
* ``io.spacy``  → :mod:`..sources.nlp_bridges` (tokenizer/feature surface)
* ``io.bert``   → :mod:`..sources.nlp_bridges` (BERT bridge surface)
* ``io.watson`` → :mod:`..sources.watson`
"""

import sys as _sys

from text_extensions_for_pandas_spark.sources import conll  # noqa: F401
from text_extensions_for_pandas_spark.sources import nlp_bridges as bert  # noqa: F401
from text_extensions_for_pandas_spark.sources import nlp_bridges as spacy  # noqa: F401
from text_extensions_for_pandas_spark.sources import watson  # noqa: F401

# importable as dotted module paths (`from ...io.bert import make_bert_tokens`)
for _sub, _mod in (("conll", conll), ("spacy", spacy), ("bert", bert), ("watson", watson)):
    _sys.modules[f"{__name__}.{_sub}"] = _mod

__all__ = ["bert", "conll", "spacy", "watson"]

# the reference nests Watson parsers one level deeper (io.watson.nlu /
# io.watson.tables); expose those paths with the reference's local names
import types as _types

nlu = _types.ModuleType(__name__ + ".watson.nlu")
nlu.parse_response = watson.parse_nlu_response
nlu.make_span_from_entities = watson.make_span_from_entities
tables = _types.ModuleType(__name__ + ".watson.tables")
tables.parse_response = watson.parse_tables_response
tables.make_exploded_df = watson.make_exploded_df
tables.make_table = watson.make_table
tables.make_table_from_exploded_df = watson.make_table
tables.convert_cols_to_numeric = watson.convert_cols_to_numeric
tables.get_raw_html = watson.get_raw_html
watson.nlu = nlu
watson.tables = tables
_sys.modules[__name__ + ".watson.nlu"] = nlu
_sys.modules[__name__ + ".watson.tables"] = tables
