"""Pandas (Arrow-vectorized) UDFs — the escape hatch for semantics Spark
built-ins can't express (SURVEY.md §7: confined to unicode normalize and
friends).  Never row-at-a-time Python.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, StringType

_normalize_udfs: dict[str, object] = {}
_normalized_check_udfs: dict[str, object] = {}


def unicode_normalize_expr(col: Column, form: str) -> Column:
    """Unicode NFC/NFD/NFKC/NFKD normalization
    (reference: lib/types/string/index.js:558-574 coerce block).
    No Spark built-in exists → Arrow-batched pandas UDF."""
    if form not in _normalize_udfs:
        @F.pandas_udf(StringType())
        def _norm(s: pd.Series) -> pd.Series:
            return s.map(lambda v: unicodedata.normalize(form, v)
                         if isinstance(v, str) else v)
        _normalize_udfs[form] = _norm
    return _normalize_udfs[form](col)


def external_message_udf(method):
    """Wrap a user external hook (reference: lib/base.js:152-157) as an
    Arrow-batched pandas UDF: ``method(values: pd.Series) ->
    pd.Series[str | None]`` — non-null string = violation message.
    Batches stream through Arrow; no per-row Python calls unless the
    user's method itself loops."""
    @F.pandas_udf(StringType())
    def _ext(s: pd.Series) -> pd.Series:
        out = method(s)
        if not isinstance(out, pd.Series):
            out = pd.Series(out, index=s.index)
        return out
    return _ext


def unicode_normalized_check(form: str):
    """Predicate form: value already normalized?  Used in strict mode."""
    if form not in _normalized_check_udfs:
        @F.pandas_udf(BooleanType())
        def _check(s: pd.Series) -> pd.Series:
            return s.map(lambda v: unicodedata.normalize(form, v) == v
                         if isinstance(v, str) else True)
        _normalized_check_udfs[form] = _check
    return lambda col: _normalized_check_udfs[form](col)
