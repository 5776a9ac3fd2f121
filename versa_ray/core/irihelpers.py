"""IRI reference handling.

Implements the subset of RFC 3986/3987 behavior the engine needs —
syntax validation, absoluteness test, reference resolution,
relativization, percent-encoding — from the public RFCs. Semantics
follow the reference toolchain's usage (iriref validation at
construction, /root/reference/tools/py/iriref.py:15-49; absolutize and
matches_uri_ref_syntax usage throughout the serial/pipeline modules).
"""

from __future__ import annotations

import re
from urllib.parse import quote, urljoin

# RFC 3986 URI-reference grammar, loosened per RFC 3987 to admit
# non-ASCII (iunreserved) characters. Disallows whitespace, <>, ", {},
# |, ^, `, \ and raw percent signs not followed by two hex digits.
_SCHEME = r"[A-Za-z][A-Za-z0-9+.\-]*"
_BAD_CHARS = re.compile(r'[\x00-\x20<>"{}|^`\\\x7f]')
_PCT_OK = re.compile(r"%(?![0-9A-Fa-f]{2})")
_ABS_PAT = re.compile(r"^%s:" % _SCHEME)


def matches_uri_ref_syntax(s: str) -> bool:
    """True if ``s`` is a syntactically plausible IRI reference."""
    if not isinstance(s, str):
        return False
    if _BAD_CHARS.search(s):
        return False
    if _PCT_OK.search(s):
        return False
    # A lone '#' fragment separator may appear at most once
    if s.count("#") > 1:
        return False
    return True


def is_absolute(s: str) -> bool:
    """True if ``s`` carries a scheme."""
    return bool(s) and bool(_ABS_PAT.match(s))


_ABSOLUTIZE_MEMO: dict = {}


def absolutize(ref: str, base: str | None) -> str:
    """Resolve ``ref`` against ``base`` per RFC 3986 §5.

    Absolute refs and null bases pass through unchanged (matching how
    the reference pipeline calls absolutize with a None context base on
    already-absolute rels). Resolutions are memoized: in RDFa
    extraction the same (vocab base, term) pairs repeat on every page,
    and urllib's urljoin is a measurable per-page cost."""
    if ref is None:
        return ref
    if not base or is_absolute(ref):
        return ref
    key = (base, ref)
    hit = _ABSOLUTIZE_MEMO.get(key)
    if hit is None:
        hit = urljoin(base, ref)
        if len(_ABSOLUTIZE_MEMO) < 100_000:
            _ABSOLUTIZE_MEMO[key] = hit
    return hit


def relativize(iriref_: str, base: str, sub_path_only: bool = True) -> str | None:
    """Inverse of absolutize for the canonical writer's abbreviation:
    return the suffix of ``iriref_`` under ``base`` or None."""
    if not base or not iriref_.startswith(base):
        return None
    tail = iriref_[len(base) :]
    if not tail:
        return None
    if sub_path_only and tail.startswith("/"):
        return None
    return tail


_IRI_SAFE = "-._~!$&'()*+,;=:@/?#[]"


def percent_encode(s: str) -> str:
    """Percent-encode characters not allowed in an IRI reference."""
    return quote(s, safe=_IRI_SAFE)


class I(str):
    """IRI reference: a ``str`` subclass whose construction validates
    IRI-ref syntax and which supports concatenation via call, mirroring
    the reference's ``iriref`` type tag semantics (iriref.py:15-49).

    In Arrow batches the I-vs-str distinction is carried by the
    ``target_is_iri`` column instead of the Python type; this class
    exists for the driver-side / per-document API surface.
    """

    __slots__ = ()

    def __new__(cls, value):
        if not matches_uri_ref_syntax(value):
            raise ValueError('Invalid IRI reference: "%s"' % (value,))
        return super().__new__(cls, value)

    def __repr__(self):
        return "I(" + str(self) + ")"

    def __call__(self, tail):
        return I(str(self) + str(tail))
