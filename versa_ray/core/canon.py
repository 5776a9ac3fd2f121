"""Canonical encodings for links.

The engine's one physical representation of a link is an Arrow row:

    origin: string      (IRI, non-null)
    rel: string         (IRI, non-null)
    target: string
    target_is_iri: bool (replaces the I-vs-str runtime type tag)
    attrs: string       (canonical JSON object, sorted keys)

``attrs`` is stored as canonical sorted-key JSON text rather than an
Arrow map so that the quad dedup / canonical-sort shuffles operate on
plain string columns (dictionary-encoded in Parquet, zero-copy in
Arrow), and so equality is bytewise. This realizes the reference's
canonical equality surface (sorted links with sorted attr items and an
``@target-type: @iri-ref`` pseudo-attribute for IRI targets — see
/root/reference/tools/py/driver/memory.py:263-291) as a column layout.
"""

from __future__ import annotations

import json

import pyarrow as pa

from .irihelpers import I

LINK_SCHEMA = pa.schema(
    [
        ("origin", pa.string()),
        ("rel", pa.string()),
        ("target", pa.string()),
        ("target_is_iri", pa.bool_()),
        ("attrs", pa.string()),
    ]
)

LINK_COLUMNS = [f.name for f in LINK_SCHEMA]

EMPTY_ATTRS = "{}"

TARGET_TYPE_KEY = "@target-type"
IRI_REF_TAG = "@iri-ref"


def attrs_to_json(attrs: dict | None) -> str:
    """Canonical sorted-key JSON encoding of an attribute mapping."""
    if not attrs:
        return EMPTY_ATTRS
    return json.dumps(
        {str(k): _plain(v) for k, v in attrs.items()},
        sort_keys=True,
        separators=(",", ":"),
        ensure_ascii=False,
    )


def _plain(v):
    if isinstance(v, (list, tuple)):
        return [_plain(x) for x in v]
    if isinstance(v, str):
        return str(v)
    return v


def attrs_from_json(s: str | None) -> dict:
    if not s or s == EMPTY_ATTRS:
        return {}
    return json.loads(s)


def link_to_row(origin, rel, target, attrs=None) -> dict:
    """One Python link tuple -> canonical Arrow row dict."""
    return {
        "origin": str(origin),
        "rel": str(rel),
        "target": str(target) if target is not None else None,
        "target_is_iri": isinstance(target, I),
        "attrs": attrs if isinstance(attrs, str) else attrs_to_json(attrs),
    }


def row_to_link(row: dict):
    """Canonical Arrow row dict -> (origin, rel, target, attrs) tuple."""
    target = row["target"]
    if row.get("target_is_iri") and target is not None:
        target = I(target)
    return (
        I(row["origin"]),
        I(row["rel"]),
        target,
        attrs_from_json(row.get("attrs")),
    )


def canonical_sort_key(row: dict) -> tuple:
    """Total order on links matching the canonical repr semantics."""
    return (
        row["origin"],
        row["rel"],
        row["target"] or "",
        bool(row["target_is_iri"]),
        row["attrs"] or EMPTY_ATTRS,
    )


def canonical_json(rows) -> str:
    """Canonical JSON rendering of an iterable of link rows: the
    equality surface for conformance diffing (sorted links, sorted
    attrs, IRI targets tagged with @target-type)."""
    out = []
    for row in sorted(rows, key=canonical_sort_key):
        attrs = attrs_from_json(row["attrs"])
        if row["target_is_iri"]:
            attrs[TARGET_TYPE_KEY] = IRI_REF_TAG
        out.append(
            [
                row["origin"],
                row["rel"],
                row["target"],
                {k: attrs[k] for k in sorted(attrs)},
            ]
        )
    return json.dumps(out, indent=4, ensure_ascii=False)
