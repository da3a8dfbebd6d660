"""Exact email/domain grammar (joi_spark.functions.address): the
reference's own email test vectors as goldens (reference:
test/types/string.js describe('email()') "validates email"), the
prefilter-subset property, and the bundled IANA tlds=True path."""

from __future__ import annotations

import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

import joi_spark as joi
from joi_spark.functions import address
from joi_spark.functions.tlds import TLDS


# --- reference vectors (test/types/string.js:871-935), pure grammar ------

REFERENCE_VECTORS = [
    ("joe@example.com", True),
    ("êjness@something.com", True),          # unicode local, default OK
    ('"joe"@example.com', False),            # quoted locals rejected
    ("example@io", False),                   # minDomainSegments default 2
    ("@iaminvalid.com", False),              # empty local
    ("joe@[IPv6:2a00:1450:4001:c02::1b]", False),   # no domain literals
    ("1234567890123456789012345678901234567890123456789012345678901234"
     "5@walmartlabs.com", False),            # 65-byte local
    ("123456789012345678901234567890123456789012345678901234567890@"
     "12345678901234567890123456789012345678901234567890123456789."
     "12345678901234567890123456789012345678901234567890123456789."
     "12345678901234567890123456789012345678901234567890123456789."
     "12345.toolong.com", False),            # 254-char total cap
]


@pytest.mark.parametrize("email,expect", REFERENCE_VECTORS)
def test_reference_email_vectors(email, expect):
    assert address.email_valid(email) is expect


def test_reference_option_vectors():
    # tlds.allow (reference: 'validates email with tlds.allow')
    allow = {"tlds": {"allow": ["com", "org"]}}
    assert address.email_valid("joe@example.com", **{"tlds": allow["tlds"]})
    assert address.email_valid("joe@example.org", tlds=allow["tlds"])
    assert not address.email_valid("joe@example.edu", tlds=allow["tlds"])
    # minDomainSegments=4 (reference: 'validates email with minDomainSegments')
    assert not address.email_valid("joe@example.com", min_domain_segments=4)
    assert not address.email_valid("joe@www.example.com",
                                   min_domain_segments=4)
    assert address.email_valid("joe@sub.www.example.com",
                               min_domain_segments=4)


def test_unicode_domain_punycode():
    # IDN domain punycodes to LDH labels before the checks
    assert address.email_valid("joe@münchen.de")
    assert not address.email_valid("joe@münchen.de", allow_unicode=False)
    assert address.domain_valid("bücher.example")
    # digit-initial TLD rejected even though LDH-valid
    assert not address.domain_valid("example.3com")


def test_tlds_true_uses_bundled_snapshot():
    assert "com" in TLDS and "museum" in TLDS and "io" in TLDS
    assert address.email_valid("joe@example.com", tlds=True)
    assert not address.email_valid("joe@example.notarealtld", tlds=True)
    assert address.domain_valid("example.co.uk", tlds=True)


# --- prefilter subset property: regex-accept => grammar-accept ----------

_OPTION_SETS = [
    {},
    {"min_domain_segments": 3},
    {"tlds": {"allow": ["com", "org", "c3"]}},
    {"tlds": {"deny": ["example", "test"]}},
    {"tlds": True},
]


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=33, max_codepoint=126),
               min_size=1, max_size=40),
       st.sampled_from(range(len(_OPTION_SETS))))
def test_prefilter_is_subset_of_grammar(s, opt_i):
    opts = _OPTION_SETS[opt_i]
    pre = re.compile(address.email_prefilter_regex(
        opts.get("min_domain_segments", 2), opts.get("tlds")))
    if pre.fullmatch(s):
        assert address.email_valid(s, **opts), \
            f"prefilter accepted {s!r} but grammar rejects it"


@settings(max_examples=200, deadline=None)
@given(st.emails())
def test_hypothesis_emails_agree_with_prefilter(e):
    # hypothesis emails are RFC-shaped; whenever the fast path accepts,
    # the grammar must too (the reverse is allowed: quoted/IP forms)
    pre = re.compile(address.email_prefilter_regex())
    if pre.fullmatch(e):
        assert address.email_valid(e)


# --- engine integration (the UDF path end-to-end) ------------------------

def test_email_engine_unicode_and_quoted(spark):  # noqa: F811
    df = spark.createDataFrame(
        [(1, "joe@example.com"), (2, "êjness@something.com"),
         (3, '"joe"@example.com'), (4, "example@io")],
        "id bigint, e string")
    res = joi.validate(df, joi.object({"e": joi.string().email()}),
                       order_by=["id"], prefs={"abort_early": False})
    got = [r["id"] for r in res.violations().collect()]
    assert got == [3, 4]


def test_email_engine_tlds_true(spark):  # noqa: F811
    df = spark.createDataFrame(
        [(1, "a@b.com"), (2, "a@b.notarealtld")], "id bigint, e string")
    res = joi.validate(df, joi.object({
        "e": joi.string().email(tlds=True)}), order_by=["id"])
    assert [r["id"] for r in res.violations().collect()] == [2]


def test_domain_tlds_true(spark):  # noqa: F811
    df = spark.createDataFrame(
        [(1, "example.com"), (2, "example.notarealtld"), (3, "example.io")],
        "id bigint, d string")
    res = joi.validate(df, joi.object({"d": joi.string().domain(tlds=True)}),
                       order_by=["id"])
    rows = res.violations().collect()
    assert [(r["id"], r["code"]) for r in rows] == [(2, "string.domain")]


def test_email_unknown_option_raises(spark):  # noqa: F811
    df = spark.createDataFrame([(1, "a@b.com")], "id bigint, e string")
    with pytest.raises(Exception, match="unsupported email options"):
        joi.validate(df, joi.object({
            "e": joi.string().email(bogus=True)}))
