"""Core conformance: hash convention, IRI handling, canonical encodings.

Anchors derive from the reference's executable test suite and vendored
hash implementation (see versa_ray/core/hashing.py docstring).
"""

import json

import pytest

from versa_ray.core import (
    EMPTY_ATTRS,
    I,
    VTYPE_REL,
    absolutize,
    attrs_from_json,
    attrs_to_json,
    canonical_json,
    fingerprint_text,
    is_absolute,
    link_to_row,
    matches_uri_ref_syntax,
    resource_id,
    row_to_link,
    simple_hashstring,
)
from versa_ray.core.mmh3 import hash64_signed


def test_mmh3_public_vectors():
    # Public mmh3.hash64 test vectors (x64 variant, seed 0, signed)
    assert hash64_signed("foo") == (-2129773440516405919, 9128664383759220103)
    assert hash64_signed(b"") == (0, 0)


def test_simple_hashstring_sentinel():
    assert simple_hashstring("") == "AAAAAAAAAAA"


def test_resource_id_anchors():
    # Matches reference vendored pymmh3 + resource_id convention
    assert (
        resource_id(
            "http://schema.org/Person",
            [("http://schema.org/name", "Augusta Ada King")],
        )
        == "xjgOrUFiw_o"
    )
    # The hash ID the reference pipeline test asserts (test_pipeline.py:415)
    MB = "https://musicbrainz.org/doc/MusicBrainz_Database/Schema/"
    assert resource_id(MB + "Artist", [(MB + "name", "Yasiin Bey")]) == "i5GvPVm7ClA"


def test_resource_id_type_dedup_and_sort():
    # VTYPE pair not duplicated if already present; pairs sorted
    t = "http://schema.org/Person"
    a = fingerprint_text(t, [("http://schema.org/name", "x"), (VTYPE_REL, t)])
    b = fingerprint_text(t, [("http://schema.org/name", "x")])
    assert a == b
    assert json.loads(a)[0][0] == str(VTYPE_REL)  # bibfra.me sorts first


def test_resource_id_requires_fingerprint():
    with pytest.raises(ValueError):
        resource_id("http://schema.org/Person", [])


def test_iriref_validation():
    assert I("spam") == "spam"
    with pytest.raises(ValueError):
        I("spam eggs")
    base = I("https://example.org/")
    assert base("a") == "https://example.org/a"
    assert repr(I("x")) == "I(x)"


def test_iri_predicates():
    assert matches_uri_ref_syntax("")
    assert matches_uri_ref_syntax("http://example.org/a?b#c")
    assert not matches_uri_ref_syntax("a b")
    assert is_absolute("http://example.org")
    assert not is_absolute("relative/path")
    assert absolutize("isbn", "https://schema.org/") == "https://schema.org/isbn"
    assert absolutize("http://a/b", "https://schema.org/") == "http://a/b"
    assert absolutize("x", None) == "x"
    assert absolutize("", "http://uche.ogbuji.net/poems/") == "http://uche.ogbuji.net/poems/"


def test_attrs_roundtrip():
    assert attrs_to_json(None) == EMPTY_ATTRS
    assert attrs_to_json({}) == EMPTY_ATTRS
    s = attrs_to_json({"b": "2", "a": "1"})
    assert s == '{"a":"1","b":"2"}'
    assert attrs_from_json(s) == {"a": "1", "b": "2"}


def test_link_row_roundtrip():
    row = link_to_row(I("http://e.org/s"), I("http://e.org/p"), I("http://e.org/o"), {"k": "v"})
    assert row["target_is_iri"] is True
    o, r, t, a = row_to_link(row)
    assert isinstance(t, I) and a == {"k": "v"}
    row2 = link_to_row("http://e.org/s", "http://e.org/p", "plain text")
    assert row2["target_is_iri"] is False and row2["attrs"] == EMPTY_ATTRS


def test_canonical_json_tags_iri_targets():
    rows = [
        link_to_row("http://e.org/b", "http://e.org/p", I("http://e.org/o")),
        link_to_row("http://e.org/a", "http://e.org/p", "text"),
    ]
    doc = json.loads(canonical_json(rows))
    assert doc[0][0] == "http://e.org/a"
    assert doc[1][3] == {"@target-type": "@iri-ref"}
