"""Property-based invariants (hypothesis) — beyond the reference's
example-based goldens (SURVEY.md §5: reference has none; these guard
the engine's own structural contracts).

Strategy note: schemas are GENERATED, Spark evaluation is checked
against a pure-Python re-implementation of the same rule semantics on
the same inputs — an independent oracle per example.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import joi_spark as joi
from joi_spark.dsl.manifest import build, manifest_hash


# --- describe/build round-trip ---------------------------------------------

_scalar_schemas = st.one_of(
    st.builds(lambda lo, hi: joi.number().min(lo).max(hi),
              st.integers(-100, 0), st.integers(1, 100)),
    st.builds(lambda n: joi.string().min(n), st.integers(0, 50)),
    st.builds(lambda vals: joi.string().valid(*vals),
              st.lists(st.text(alphabet="abcxyz", min_size=1, max_size=5),
                       min_size=1, max_size=4, unique=True)),
    st.builds(lambda: joi.string().required().pattern("^[a-z]+$")),
    st.builds(lambda b: joi.number().integer().multiple(b),
              st.integers(1, 9)),
)


@given(_scalar_schemas)
@settings(max_examples=60, deadline=None)
def test_manifest_round_trip_property(schema):
    desc = schema.describe()
    rebuilt = build(desc)
    assert rebuilt == schema
    assert manifest_hash(rebuilt) == manifest_hash(schema)
    # and a second round-trip is stable
    assert build(rebuilt.describe()) == rebuilt


# --- vectorized vs scalar oracle -------------------------------------------

def _py_check(value, lo, hi, mult):
    """Pure-Python oracle for number().min(lo).max(hi).multiple(mult)."""
    if value is None:
        return True
    if math.isnan(value) or math.isinf(value):
        return False
    return lo <= value <= hi and (value % mult == 0)


@pytest.fixture(scope="module")
def prop_spark(spark):
    return spark


@given(st.lists(st.one_of(st.none(),
                          st.integers(-1000, 1000).map(float)),
                min_size=1, max_size=30))
@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_number_rules_match_python_oracle(prop_spark, values):
    lo, hi, mult = -100, 100, 7
    df = prop_spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "id bigint, v double")
    schema = joi.object({
        "v": joi.number().min(lo).max(hi).multiple(mult),
    })
    res = joi.validate(df, schema, order_by=["id"])
    failed = {r["id"] for r in res.checked.collect() if not r["_ok"]}
    expected = {i for i, v in enumerate(values)
                if not _py_check(v, lo, hi, mult)}
    assert failed == expected


@given(st.lists(st.text(alphabet="ab ", max_size=8), min_size=1,
                max_size=25))
@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_string_rules_match_python_oracle(prop_spark, values):
    df = prop_spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "id bigint, v string")
    schema = joi.object({"v": joi.string().min(2).max(6)})
    res = joi.validate(df, schema, order_by=["id"],
                       prefs={"convert": False})
    failed = {r["id"] for r in res.checked.collect() if not r["_ok"]}
    expected = {i for i, v in enumerate(values)
                if v is not None and (v == "" or not 2 <= len(v) <= 6)}
    assert failed == expected


# --- structural invariants --------------------------------------------------

@given(st.lists(st.sampled_from(["system", "user", "bogus", None]),
                min_size=1, max_size=20))
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_abort_early_reports_exactly_one_error_per_failing_row(
        prop_spark, roles):
    df = prop_spark.createDataFrame(
        [(i, r) for i, r in enumerate(roles)], "id bigint, role string")
    schema = joi.object({
        "role": joi.string().valid("system", "user").required().min(3),
    })
    res = joi.validate(df, schema, order_by=["id"],
                       prefs={"abort_early": True})
    viols = res.violations(include_warnings=False).collect()
    per_row = {}
    for r in viols:
        per_row[r["id"]] = per_row.get(r["id"], 0) + 1
    assert all(n == 1 for n in per_row.values())
    n_failed = res.checked.filter("NOT _ok").count()
    assert len(per_row) == n_failed
