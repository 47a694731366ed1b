"""Reference-namespace compatibility: ``text_extensions_for_pandas.spanner``.

The reference exposes its span-algebra operators as ``tp.spanner.*``
(``spanner/__init__.py``).  This module mirrors that surface one-for-one so
a migrating user's imports keep working — the functions take/return Spark
DataFrames instead of pandas Series, which is the documented porting step.
"""

from text_extensions_for_pandas_spark.operators.align import (  # noqa: F401
    lemmatize,
)
from text_extensions_for_pandas_spark.operators.consolidate import (  # noqa: F401
    consolidate,
)
from text_extensions_for_pandas_spark.operators.extract import (  # noqa: F401
    create_dict,
    extract_dict,
    extract_regex,
    extract_regex_tok,
    extract_split,
    load_dict,
)
from text_extensions_for_pandas_spark.operators.join import (  # noqa: F401
    adjacent_join,
    contain_join,
    overlap_join,
    unpack_semijoin,
)

__all__ = [
    "adjacent_join",
    "consolidate",
    "contain_join",
    "create_dict",
    "extract_dict",
    "extract_regex",
    "extract_regex_tok",
    "extract_split",
    "lemmatize",
    "load_dict",
    "overlap_join",
    "unpack_semijoin",
]


# the reference also exposes per-module paths (tp.spanner.extract.create_dict,
# tp.spanner.join.unpack_semijoin); mirror them
import sys as _sys

from text_extensions_for_pandas_spark.operators import extract  # noqa: E402,F401
from text_extensions_for_pandas_spark.operators import join  # noqa: E402,F401

_sys.modules[__name__ + ".extract"] = extract
_sys.modules[__name__ + ".join"] = join
