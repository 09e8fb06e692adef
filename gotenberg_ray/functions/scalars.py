"""Scalar helper functions mirrored from the reference (SURVEY §2.8).

- alphanumeric_key: the natural-sort comparator of
  /root/reference/pkg/gotenberg/sort.go:26-113 — prefix number, then
  extension-suffix number, then trailing number, then lexicographic —
  and digit_suffix_key (pdfcpu/sort.go:10-68) for split outputs. Our
  engine sorts by explicit part_index columns; these exist for
  fixture-name parity.
- inches / duration / byte-size parsers (api/formdata.go:152-268,
  api.go:197).
- cap_attr / redact_url (gotenberg/attrs.go): log-attribute hygiene.
"""

from __future__ import annotations

import re
from functools import cmp_to_key as _cmp_to_key
from urllib.parse import urlsplit, urlunsplit

_NUM_PREFIX = re.compile(r"^(\d+)")
_NUM_TRAIL = re.compile(r"(\d+)$")
_UNIT_RE = re.compile(r"^\s*([0-9.]+)\s*([a-zA-Z%]*)\s*$")

_INCH_FACTORS = {
    "": 1.0,  # bare numbers are inches
    "in": 1.0,
    "pt": 1.0 / 72.0,
    "px": 1.0 / 96.0,
    "mm": 1.0 / 25.4,
    "cm": 1.0 / 2.54,
    "pc": 1.0 / 6.0,
}

_BYTE_FACTORS = {
    "": 1,
    "b": 1,
    "kb": 1000,
    "mb": 1000**2,
    "gb": 1000**3,
    "tb": 1000**4,
    "kib": 1024,
    "mib": 1024**2,
    "gib": 1024**3,
}

_DUR_FACTORS = {"ns": 1e-9, "us": 1e-6, "µs": 1e-6, "ms": 1e-3, "s": 1.0, "m": 60.0, "h": 3600.0}


def parse_inches(value: str) -> float:
    """'8.5', '72pt', '297mm' → inches (formdata.go:173-268)."""
    m = _UNIT_RE.match(value)
    if not m:
        raise ValueError(f"invalid dimension {value!r}")
    num, unit = float(m.group(1)), m.group(2).lower()
    if unit not in _INCH_FACTORS:
        raise ValueError(f"unknown unit {unit!r} in {value!r}")
    return num * _INCH_FACTORS[unit]


def parse_byte_size(value: str) -> int:
    """'5MB', '1GiB', '700kb' → bytes (api-body-limit parsing)."""
    m = _UNIT_RE.match(value)
    if not m:
        raise ValueError(f"invalid byte size {value!r}")
    num, unit = float(m.group(1)), m.group(2).lower()
    if unit not in _BYTE_FACTORS:
        raise ValueError(f"unknown unit {unit!r} in {value!r}")
    return int(num * _BYTE_FACTORS[unit])


def parse_duration(value: str) -> float:
    """Go-style duration ('1h30m', '2.5s', '500ms') → seconds."""
    value = value.strip()
    if not value:
        raise ValueError("empty duration")
    # Go's time.ParseDuration accepts an optional leading sign and the
    # special case "0" / "+0" / "-0" with no unit
    sign = 1.0
    if value[0] in "+-":
        sign = -1.0 if value[0] == "-" else 1.0
        value = value[1:]
    if value == "0":
        return 0.0
    # the WHOLE string must be (number unit)+ — Go's time.ParseDuration
    # rejects trailing garbage like '1hgarbage', so must we
    if not re.fullmatch(r"(?:[0-9.]+(?:ns|us|µs|ms|s|m|h))+", value):
        raise ValueError(f"invalid duration {value!r}")
    total = 0.0
    for num, unit in re.findall(r"([0-9.]+)(ns|us|µs|ms|s|m|h)", value):
        total += float(num) * _DUR_FACTORS[unit]
    return sign * total


_GO_PREFIX = re.compile(r"^(\d+)(.*)$")
_GO_EXT_SUFFIX = re.compile(r"^(.*?)(\d+)(\.[^.]+)$")
_GO_SUFFIX = re.compile(r"^(.*?)(\d+)$")
_LOC_NONE, _LOC_PREFIX, _LOC_SUFFIXISH = 0, 1, 2


def _extract_number(name: str) -> tuple[int, str, int]:
    """Mirror of sort.go extractNumber: (number, rest, location)."""
    base = name.rsplit("/", 1)[-1]
    m = _GO_PREFIX.match(base)
    if m:
        return int(m.group(1)), m.group(2), _LOC_PREFIX
    m = _GO_EXT_SUFFIX.match(base)
    if m:
        return int(m.group(2)), m.group(1) + m.group(3), _LOC_SUFFIXISH
    m = _GO_SUFFIX.match(base)
    if m:
        return int(m.group(2)), m.group(1), _LOC_SUFFIXISH
    return -1, base, _LOC_NONE


def _alphanumeric_cmp(a: str, b: str) -> int:
    """EXACT transcription of AlphanumericSort.Less (sort.go:37-79) —
    the pairwise rules (prefix pairs: number then rest; suffix pairs:
    rest then number; mixed: rest then prefix-first) are not
    expressible as a single sort key, so the comparator itself is the
    parity artifact. (For heterogeneous prefix/suffix mixes Go's Less
    is not transitive; on the homogeneous fixture families the routes
    actually sort, both engines agree exactly.)"""
    num_a, rest_a, loc_a = _extract_number(a)
    num_b, rest_b, loc_b = _extract_number(b)
    if num_a != -1 and num_b != -1:
        if loc_a == _LOC_PREFIX and loc_b == _LOC_PREFIX:
            if num_a != num_b:
                return -1 if num_a < num_b else 1
            return (rest_a > rest_b) - (rest_a < rest_b)
        if loc_a != _LOC_PREFIX and loc_b != _LOC_PREFIX:
            if rest_a != rest_b:
                return -1 if rest_a < rest_b else 1
            if num_a != num_b:
                return -1 if num_a < num_b else 1
            return (a > b) - (a < b)
        if rest_a != rest_b:
            return -1 if rest_a < rest_b else 1
        return -1 if loc_a == _LOC_PREFIX else 1
    if num_a != -1:
        return -1
    if num_b != -1:
        return 1
    return (a > b) - (a < b)


alphanumeric_key = _cmp_to_key(_alphanumeric_cmp)


def digit_suffix_key(name: str):
    """pdfcpu split-output sort (pdfcpu/sort.go:10-68): numeric suffix
    before the extension."""
    stem, dot, _ext = name.rpartition(".")
    base = stem if dot else name
    m = _NUM_TRAIL.search(base)
    return (base[: m.start()] if m else base, int(m.group(1)) if m else -1)


def cap_attr(value: str, limit: int = 512) -> str:
    """Truncate long log attributes (gotenberg/attrs.go CapAttr)."""
    if len(value) <= limit:
        return value
    return value[: limit - 1] + "…"


def redact_url(url: str) -> str:
    """Strip userinfo + query values from logged URLs (RedactURL)."""
    try:
        p = urlsplit(url)
        port = p.port  # .port raises on out-of-range/non-numeric ports
        host = p.hostname or ""
    except ValueError:
        # log hygiene must never crash on attacker-supplied URLs —
        # fall back to the raw string rather than raising
        return url
    netloc = host
    if port:
        netloc = f"{netloc}:{port}"
    if p.username:
        netloc = f"xxx@{netloc}"
    query = "&".join(
        f"{kv.split('=', 1)[0]}=xxx" if "=" in kv else kv
        for kv in p.query.split("&")
        if kv
    )
    return urlunsplit((p.scheme, netloc, p.path, query, ""))


def sanitize_filename(name: str) -> str:
    """Strip path separators + control chars, NFC-normalize — the
    Zip-Slip defense of api/context.go:692-703."""
    import unicodedata

    out = "".join(c for c in name if c not in "/\\" and ord(c) >= 0x20)
    return unicodedata.normalize("NFC", out)


_SAMESITE_RE = re.compile(r"^(lax|strict|none)$", re.I)


def normalize_samesite(value: str) -> str:
    """Case-insensitive Lax/Strict/None canonicalization
    (chromium/routes.go:27-30,117-158); invalid values raise."""
    m = _SAMESITE_RE.match(value.strip())
    if not m:
        raise ValueError(f"invalid sameSite value {value!r}")
    return m.group(1).capitalize()


def parse_scoped_header(value: str) -> tuple[str, re.Pattern | None]:
    """The `value; scope=regex` extraHttpHeaders mini-grammar
    (chromium/routes.go:160-218): returns (header value, compiled scope
    regex or None). A malformed scope raises."""
    if "; scope=" not in value:
        return value, None
    head, _, pattern = value.partition("; scope=")
    return head, re.compile(pattern)


def xml_escape(value: str) -> str:
    """XML entity escaping for XMP splicing (qpdf.go:1088-1092)."""
    from xml.sax.saxutils import escape

    return escape(value, {'"': "&quot;", "'": "&apos;"})


def strip_qpdf_prefix(value: str) -> tuple[str, str]:
    """qpdf string-prefix convention `u:`/`b:`/`e:` (qpdf.go:698-707):
    returns (kind, payload); no prefix → ("u", value)."""
    if len(value) >= 2 and value[1] == ":" and value[0] in "ube":
        return value[0], value[2:]
    return "u", value
