"""Exact email/domain grammar — a pure-Python port of the public
address grammar the reference delegates to (@hapi/address; reference:
lib/types/string/index.js:270-318), rebuilt from RFC 5321/1123/3492 and
pinned to the reference's own test vectors (test/types/string.js
"validates email"): unicode local parts and IDN domains accepted by
default, quoted local parts and domain literals rejected, local part
<= 64 utf-8 bytes, whole address <= 254 chars, domain <= 256 chars,
LDH labels <= 63, TLD label starts with a letter, minDomainSegments
default 2, tlds allow/deny tables (``True`` = the bundled IANA snapshot
in :mod:`joi_spark.functions.tlds`).

This module is the slow exact path; the vectorized prefilter regex from
:func:`email_prefilter_regex` accepts a strict SUBSET of it (property-
tested in tests/test_address.py), so batches only fall back to the
per-row grammar on rows the C regex rejects.
"""

from __future__ import annotations

import re

ATEXT = frozenset(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    "!#$%&'*+-/=?^_`{|}~")

_LABEL_RE = re.compile(r"[a-zA-Z0-9](?:[a-zA-Z0-9-]{0,61}[a-zA-Z0-9])?")

MAX_EMAIL_LENGTH = 254       # RFC 5321 §4.5.3.1.3 (path = address + 2)
MAX_LOCAL_BYTES = 64         # RFC 5321 §4.5.3.1.1 (octets)
MAX_DOMAIN_LENGTH = 256


def _resolve_tlds(tlds):
    """Normalize a tlds option to (allow_set | None, deny_set | None).
    ``True`` (or ``{'allow': True}``) selects the bundled IANA
    snapshot; ``None``/``False`` disables the check."""
    if tlds is None or tlds is False:
        return None, None
    from .tlds import TLDS
    if tlds is True:
        return TLDS, None
    if not isinstance(tlds, dict):
        raise ValueError("tlds must be a dict, True, or False")
    allow = tlds.get("allow")
    deny = tlds.get("deny")
    if allow is True:
        allow = TLDS
    elif allow is False or allow is None:
        allow = None
    else:
        allow = frozenset(str(x).lower() for x in allow)
    deny = frozenset(str(x).lower() for x in deny) if deny else None
    return allow, deny


def _punycode_label(label: str) -> str | None:
    """ASCII form of one domain label (RFC 3492); None if unencodable."""
    if label.isascii():
        return label
    try:
        return "xn--" + label.lower().encode("punycode").decode("ascii")
    except UnicodeError:
        return None


def domain_valid(domain, *, min_domain_segments: int = 2,
                 tlds=None, allow_unicode: bool = True) -> bool:
    """Registered-name domain check (reference: lib/types/string/
    index.js:280-287 via the address lib's domain analyzer)."""
    if not isinstance(domain, str) or not domain:
        return False
    if len(domain) > MAX_DOMAIN_LENGTH:
        return False
    if not domain.isascii():
        if not allow_unicode:
            return False
        labels = [_punycode_label(s) for s in domain.split(".")]
        if any(lb is None for lb in labels):
            return False
        domain = ".".join(labels)
    segments = domain.split(".")
    if len(segments) < min_domain_segments:
        return False
    for seg in segments:
        if not seg or len(seg) > 63 or not _LABEL_RE.fullmatch(seg):
            return False
    tld = segments[-1].lower()
    if not tld[0].isalpha():
        return False
    allow, deny = _resolve_tlds(tlds)
    if allow is not None and tld not in allow:
        return False
    if deny is not None and tld in deny:
        return False
    return True


def email_valid(email, *, min_domain_segments: int = 2, tlds=None,
                allow_unicode: bool = True) -> bool:
    """One address (reference test vectors: unicode local OK, quoted
    local REJECTED, exactly one @, 64-byte local / 254-char total)."""
    if not isinstance(email, str) or not email:
        return False
    parts = email.split("@")
    if len(parts) != 2:
        return False
    local, domain = parts
    if not local:
        return False
    if len(email) > MAX_EMAIL_LENGTH:
        return False
    if len(local.encode("utf-8")) > MAX_LOCAL_BYTES:
        return False
    if not allow_unicode and not email.isascii():
        return False
    for seg in local.split("."):
        if not seg:
            return False
        for ch in seg:
            if ch not in ATEXT and not (ord(ch) > 0x7F and allow_unicode):
                return False
    return domain_valid(domain, min_domain_segments=min_domain_segments,
                        tlds=tlds, allow_unicode=allow_unicode)


def email_prefilter_regex(min_domain_segments: int = 2, tlds=None) -> str:
    """Vectorized fast-path regex: accepts a strict subset of
    :func:`email_valid` (ASCII practical profile with the options
    folded in), so regex-accept never needs the per-row grammar."""
    label = r"[a-zA-Z0-9](?:[a-zA-Z0-9-]{0,61}[a-zA-Z0-9])?"
    tld = r"[a-zA-Z]{2,63}"
    allow, deny = _resolve_tlds(tlds)
    if allow is not None:
        # keep the subset property: only entries the grammar could
        # accept (alpha-initial LDH labels) enter the fast path
        ok = sorted(t for t in allow
                    if t and t[0].isalpha() and _LABEL_RE.fullmatch(t))
        if not ok:
            return r"(?!x)x"  # nothing can pass; grammar decides all rows
        tld = "(?i:" + "|".join(re.escape(t) for t in ok) + ")"
    if deny is not None:
        tld = ("(?!(?i:" + "|".join(re.escape(t) for t in sorted(deny))
               + r")$)" + tld)
    m = max(int(min_domain_segments) - 1, 1)
    return (r"(?=.{1,254}$)(?!\.)(?!.*\.\.)"
            r"[A-Za-z0-9!#$%&'*+/=?^_`{|}~.-]{1,64}(?<!\.)@"
            rf"(?:{label}\.){{{m},}}{tld}")
