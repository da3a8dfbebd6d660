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


# --- round-5 parity fuzz goldens (round-4 verdict item 7) ----------------
# Boundary vectors derived from the RFC rules both engines encode
# (RFC 5321 64-octet local / 254-char path, RFC 1035 63-char LDH
# labels) plus the reference suite's quoted/IDN/long-label families
# (test/types/string.js:870-935; @hapi/address dot-atom grammar).

EDGE_VECTORS = [
    # local-part length boundary (64 octets OK, 65 not)
    ("a" * 64 + "@example.com", True),
    ("a" * 65 + "@example.com", False),
    # label length boundary (63 OK, 64 not)
    ("joe@" + "a" * 63 + ".com", True),
    ("joe@" + "a" * 64 + ".com", False),
    # dot-atom local rules
    (".joe@example.com", False),          # leading dot
    ("joe.@example.com", False),          # trailing dot
    ("jo..e@example.com", False),         # empty atom
    ("jo.e.x@example.com", True),         # dotted atoms OK
    ("!#$%&'*+-/=?^_`{|}~@example.com", True),   # full atext set
    ("jo e@example.com", False),          # space
    ("jo\"e@example.com", False),         # stray quote
    ("jo(e)@example.com", False),         # comment syntax unsupported
    ("jo,e@example.com", False),          # comma
    # @ structure
    ("joe@@example.com", False),
    ("a@b@example.com", False),
    ("joe", False),
    ("joe@", False),
    ("@", False),
    # domain shape
    ("joe@.com", False),                  # empty first label
    ("joe@example..com", False),          # empty middle label
    ("joe@example.com.", False),          # trailing dot -> empty label
    ("joe@-example.com", False),          # leading hyphen label
    ("joe@example-.com", False),          # trailing hyphen label
    ("joe@exa_mple.com", False),          # underscore not LDH
    ("joe@example.123", False),           # numeric TLD
    ("joe@example.3com", False),          # digit-initial TLD
    ("joe@example.c0m", True),            # digit inside TLD OK
    ("JOE@EXAMPLE.COM", True),            # case-insensitive
    ("joe@x.example-dash.com", True),     # interior hyphen OK
    # IDN: raw unicode and its punycoded ASCII form both pass
    ("joe@bücher.example", True),
    ("joe@xn--bcher-kva.example", True),
]


@pytest.mark.parametrize("email,expect", EDGE_VECTORS)
def test_edge_email_vectors(email, expect):
    assert address.email_valid(email) is expect


def test_total_length_boundary():
    """RFC 5321 path limit: 254 chars valid, 255 invalid — built so
    every label stays LDH-legal at both lengths."""
    local = "a" * 64
    def addr(total):
        # domain = full 63-char labels + a filler label + ".com"
        rem = total - len(local) - 1       # domain length target
        labels = []
        while rem > 63 + 1 + 4:            # keep filler ≤ 63 + ".com"
            labels.append("b" * 63)
            rem -= 64                      # label + its joining dot
        labels.append("c" * (rem - 4))     # rest minus ".com"
        a = local + "@" + ".".join(labels) + ".com"
        assert len(a) == total
        return a
    assert address.email_valid(addr(254)) is True
    assert address.email_valid(addr(255)) is False


def test_min_domain_segments_one_allows_bare_tld():
    assert address.email_valid("joe@com", min_domain_segments=1)
    assert not address.email_valid("joe@com")   # default 2


def test_engine_multiple_separator_vectors(spark):
    """The reference's 'validates email with multiple (separator)'
    vectors (test/types/string.js:997-1014) through the engine UDF."""
    rows = [
        (1, "joe@example.com", True),
        (2, "joe@example.com; joe@example.org; joe@example.com", True),
        (3, "joe@example.com ; joe@example.org ;joe@example.com", True),
        (4, "joe@example.com  ; joe@example.org ;  joe@example.com", True),
        (5, "joe@example.com; joe@example; joe@example.org; joe@com",
         False),
    ]
    df = spark.createDataFrame([(i, e) for i, e, _ in rows],
                               "id bigint, e string")
    schema = joi.object({"e": joi.string().email(multiple=True,
                                                 separator=";")})
    res = joi.validate(df, schema, order_by=["id"],
                       prefs={"abort_early": False})
    bad = [r["id"] for r in res.violations().collect()]
    assert bad == [i for i, _, ok in rows if not ok]
