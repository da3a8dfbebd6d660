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


_email_udfs: dict = {}


def _freeze(v):
    if isinstance(v, dict):
        return tuple(sorted((k, _freeze(x)) for k, x in v.items()))
    if isinstance(v, (list, set, frozenset)):
        return tuple(sorted(_freeze(x) for x in v))
    return v


def email_check(col: Column, opts: dict) -> Column:
    """Exact-grammar email predicate (reference:
    lib/types/string/index.js:291-318 via the public address grammar —
    ported in joi_spark.functions.address).  Hybrid evaluation inside
    one Arrow batch: a C-regex prefilter (strict subset of the grammar)
    vectorizes the common case; only regex-rejected rows fall back to
    the per-row grammar (unicode locals, IDN domains, digit TLDs).
    Null in → null out, matching rlike semantics."""
    import re as _re

    from . import address

    opts = dict(opts or {})
    multiple = bool(opts.pop("multiple", False))
    separator = opts.pop("separator", ",")
    kw = {
        "min_domain_segments": int(opts.pop("minDomainSegments", 2)),
        "tlds": opts.pop("tlds", None),
        "allow_unicode": opts.pop("allowUnicode", True),
    }
    if opts:
        raise ValueError(f"unsupported email options: {sorted(opts)}")
    key = ("email", multiple, separator, _freeze(kw))
    if key not in _email_udfs:
        pre = _re.compile(address.email_prefilter_regex(
            kw["min_domain_segments"], kw["tlds"]))
        # reference splits on /\s*[sep]\s*/ (string/index.js:297)
        split_re = _re.compile(r"\s*" + _re.escape(separator) + r"\s*")

        def one(v: str) -> bool:
            return bool(pre.fullmatch(v)) or address.email_valid(v, **kw)

        if multiple:
            @F.pandas_udf(BooleanType())
            def _check(s: pd.Series) -> pd.Series:
                return s.map(lambda v: all(map(one, split_re.split(v)))
                             if isinstance(v, str) else None)
        else:
            @F.pandas_udf(BooleanType())
            def _check(s: pd.Series) -> pd.Series:
                out = s.str.fullmatch(pre.pattern).astype(object)
                residue = out.eq(False) & s.notna()
                if residue.any():
                    out[residue] = [address.email_valid(v, **kw)
                                    for v in s[residue]]
                out[s.isna()] = None
                return out
        _email_udfs[key] = _check
    return _email_udfs[key](col)


def unicode_normalized_check(form: str):
    """Predicate form: value already normalized?  Used in strict mode."""
    if form not in _normalized_check_udfs:
        @F.pandas_udf(BooleanType())
        def _check(s: pd.Series) -> pd.Series:
            return s.map(lambda v: unicodedata.normalize(form, v) == v
                         if isinstance(v, str) else True)
        _normalized_check_udfs[form] = _check
    return lambda col: _normalized_check_udfs[form](col)
