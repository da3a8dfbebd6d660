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


# --- round-2 surface properties ---------------------------------------------

@given(st.lists(st.text(alphabet="abc xyz", min_size=1, max_size=24),
                min_size=1, max_size=15))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_simhash_matches_python_oracle(prop_spark, texts):
    """Exact 64-bit signature parity against an independent
    pure-Python implementation on ARBITRARY text."""
    import hashlib
    import re
    from joi_spark.operators import dedup as DD

    def py_sig(text):
        sums = [0] * 64
        # regex-split like Spark's F.split(trim(x), '\\s+'): a
        # whitespace-only doc yields ONE empty token, not zero
        for t in re.split(r"\s+", text.lower().strip()):
            h = hashlib.md5(t.encode()).hexdigest()
            lo, hi = int(h[0:8], 16), int(h[8:16], 16)
            for b in range(64):
                bit = ((lo if b < 32 else hi) >> (b % 32)) & 1
                sums[b] += 1 if bit else -1
        return [sum(1 << i for i in range(16) if sums[c * 16 + i] > 0)
                for c in range(4)]

    df = prop_spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string")
    got = {r["doc_id"]: [r["c0"], r["c1"], r["c2"], r["c3"]]
           for r in DD.simhash_chunks(df).collect()}
    assert got == {i: py_sig(t) for i, t in enumerate(texts)}


@given(st.lists(st.text(alphabet="abcd .!?", min_size=1, max_size=60),
                min_size=1, max_size=15))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_quality_filter_keep_iff_no_reasons(prop_spark, texts):
    from joi_spark.operators import text as TX
    df = prop_spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string")
    for r in TX.quality_filter(df).collect():
        assert r["keep"] == (r["reasons"] == [])
        assert all(any(t.startswith(p) for p in
                       ("too_short", "punct", "repetitive", "lang"))
                   for t in r["reasons"])


@given(st.integers(-50, 50), st.integers(-50, 50), st.integers(1, 9))
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_template_formula_matches_python(prop_spark, a, b, m):
    df = prop_spark.createDataFrame([(1, float(a), float(b), None)],
                                    "id bigint, a double, b double, v double")
    schema = joi.object({
        "a": joi.number(), "b": joi.number(),
        "v": joi.number().default(joi.x(f"{{a * {m} - b}}")),
    })
    row = joi.validate(df, schema, order_by=["id"]).value.first()
    assert row["v"] == float(a * m - b)


@given(st.lists(st.text(alphabet="ab xy", min_size=0, max_size=40),
                min_size=1, max_size=12))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_window_dup_stats_matches_python_oracle(prop_spark, texts):
    """Duplicated-window counts on ARBITRARY short texts equal an
    independent pure-Python implementation (same trim/lower/\\s+
    tokenization, same cross-document-only semantics)."""
    import re
    from collections import defaultdict
    from joi_spark.operators import dedup as DD

    n = 3
    docs = list(enumerate(texts))

    def py_windows(text):
        toks = re.split(r"\s+", text.lower().strip())
        if len(toks) < n:
            return []
        return [" ".join(toks[i:i + n])
                for i in range(len(toks) - n + 1)]

    owners = defaultdict(set)
    for i, t in docs:
        for w in set(py_windows(t)):
            owners[w].add(i)
    want = {}
    for i, t in docs:
        wins = py_windows(t)
        dup = sum(1 for w in wins if len(owners[w]) >= 2)
        frac = dup / len(wins) if wins else 0.0
        want[i] = (len(wins), dup, frac)

    df = prop_spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {r["doc_id"]: (r["n_windows"], r["dup_windows"],
                         r["dup_fraction"])
           for r in DD.window_dup_stats(df, n=n).collect()}
    assert got == want


@given(st.lists(st.text(alphabet="ab xy", min_size=0, max_size=40),
                min_size=1, max_size=10))
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_cut_spans_matches_python_oracle(prop_spark, texts):
    """Span location AND cutting on ARBITRARY short texts equal an
    independent pure-python implementation (merge-on-touch islands,
    canonical-token rebuild)."""
    import re
    from collections import defaultdict
    from joi_spark.operators import dedup as DD

    n = 3
    docs = list(enumerate(texts))

    def toks_of(t):
        return re.split(r"\s+", t.lower().strip())

    def win_keys(t):
        toks = toks_of(t)
        if len(toks) < n:
            return []
        return [" ".join(toks[i:i + n])
                for i in range(len(toks) - n + 1)]

    owners = defaultdict(set)
    for i, t in docs:
        for w in set(win_keys(t)):
            owners[w].add(i)
    want = {}
    for i, t in docs:
        toks = toks_of(t)
        covered = set()
        for p, w in enumerate(win_keys(t), start=1):
            if len(owners[w]) >= 2:
                covered.update(range(p, p + n))
        kept = [tk for j, tk in enumerate(toks, start=1)
                if j not in covered]
        want[i] = (" ".join(kept), len(toks), len(toks) - len(kept))

    df = prop_spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {r["doc_id"]: (r["clean_text"], r["n_tokens"],
                         r["n_tokens_removed"])
           for r in DD.cut_duplicated_spans(df, n=n).collect()}
    assert got == want


# --- shingle-frequency valve subset property -------------------------------

@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.lists(st.sampled_from(
    ["the", "cat", "sat", "mat", "dog", "ran", "far", "saw", "sun"]),
    min_size=3, max_size=12), min_size=2, max_size=12),
    st.integers(1, 4))
def test_ngram_cap_yields_subset_with_identical_jaccard(prop_spark,
                                                        docs, cap):
    """max_shingle_freq prunes CANDIDATE GENERATION only: every pair
    the capped run reports must appear in the uncapped run with the
    IDENTICAL jaccard (sizes stay unpruned), and every uncapped pair
    all of whose shared shingles are within the cap must survive."""
    from joi_spark.operators import dedup as DD
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = prop_spark.createDataFrame(rows, "doc_id bigint, text string")
    full = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
            DD.ngram_jaccard_pairs(df, threshold=0.01,
                                   max_shingle_freq=None).collect()}
    capped = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
              DD.ngram_jaccard_pairs(df, threshold=0.01,
                                     max_shingle_freq=cap).collect()}
    for pair, j in capped.items():
        assert pair in full and full[pair] == j
