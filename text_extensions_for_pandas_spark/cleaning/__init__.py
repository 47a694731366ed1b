"""Reference-namespace compatibility: ``text_extensions_for_pandas.cleaning``.

Mirrors ``tp.cleaning.{analysis,ensemble,preprocess}``
(``cleaning/__init__.py``):

* ``cleaning.analysis``   → :mod:`..operators.cleaning` (reports, flagging)
* ``cleaning.ensemble``   → :mod:`..operators.ml` (training/inference)
* ``cleaning.preprocess`` → :mod:`.preprocess` (BERT preprocessing +
  gold-span combination, re-exported from their home modules)
"""

import sys as _sys

from text_extensions_for_pandas_spark.cleaning import preprocess  # noqa: F401
from text_extensions_for_pandas_spark.operators import cleaning as analysis  # noqa: F401
from text_extensions_for_pandas_spark.operators import ml as ensemble  # noqa: F401

# make the aliases importable as dotted module paths too
# (`from ...cleaning.analysis import create_f1_report`)
_sys.modules[__name__ + ".analysis"] = analysis
_sys.modules[__name__ + ".ensemble"] = ensemble

__all__ = ["analysis", "ensemble", "preprocess"]

# notebook-level conveniences the reference exposes at the package root
from text_extensions_for_pandas_spark.sources.nlp_bridges import (  # noqa: E402,F401
    preprocess_documents,
)
