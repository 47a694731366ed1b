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
