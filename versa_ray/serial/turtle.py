"""Turtle writer, rdflib-free.

The reference's RDFS export (serial/rdfs.py:50-100) hands its mapped
graph to rdflib and lets rdflib serialize Turtle; rdflib is not a
dependency of this engine, so this module renders Turtle directly
from a MicroModel (driver form) or a links Dataset (sharded form).
Write-only by design — the reference has no Turtle parser either.

Output shape: one block per subject, ``a`` for rdf:type, predicate
lists joined with ``;`` and object lists with ``,``, prefix
compaction for any ``{pfx: iri}`` mapping passed in (rdf:/rdfs: are
always available), N-Triples-style ECHAR escaping for literals, and
bare ``_:`` blank nodes.
"""

from __future__ import annotations

import re

from ..core import I, RDF_NS, RDFS_NS, RDF_TYPE_REL, VTYPE_REL
from .ntriples import RESOURCE_MAPPING, _nt_escape

__all__ = ["write", "write_string", "write_turtle_ds"]

DEFAULT_PREFIXES = {"rdf": str(RDF_NS), "rdfs": str(RDFS_NS)}

# PN_LOCAL subset we compact (conservative: anything else renders as a
# full IRI, which is always valid Turtle)
_PN_LOCAL = re.compile(r"^[A-Za-z_][A-Za-z0-9_\-]*$")


def _term(item, prefixes, bnode_ok=True, attrs=None):
    if isinstance(item, I) or (
        bnode_ok and isinstance(item, str) and item.startswith("_:")
    ):
        s = str(item)
        if s.startswith("_:"):
            return s
        for pfx, ns in prefixes.items():
            if s.startswith(ns):
                local = s[len(ns):]
                if _PN_LOCAL.match(local):
                    return f"{pfx}:{local}"
        return f"<{s}>"
    lit = '"' + _nt_escape(str(item)) + '"'
    # language tags / datatypes ride as attrs (same convention as
    # ntriples.write — {"@lang": "en"} / {"@datatype": iri})
    if attrs:
        if "@lang" in attrs:
            return lit + "@" + str(attrs["@lang"])
        if "@datatype" in attrs:
            return lit + "^^" + _term(
                I(attrs["@datatype"]), prefixes, bnode_ok=False)
    return lit


def _subject_block(subj, po_pairs, prefixes):
    """One Turtle block: sorted predicates; rdf:type first as ``a``.
    ``po_pairs`` items are (pred, obj) or (pred, obj, attrs)."""
    by_pred: dict = {}
    for p, o, *rest in po_pairs:
        by_pred.setdefault(p, []).append((o, rest[0] if rest else None))
    parts = []
    preds = sorted(by_pred, key=lambda p: (p != "a", p))
    for p in preds:
        objs = ", ".join(
            _term(o, prefixes, attrs=a)
            for o, a in sorted(by_pred[p], key=lambda oa: str(oa[0]))
        )
        ptxt = p if p == "a" else _term(I(p), prefixes, bnode_ok=False)
        parts.append(f"{ptxt} {objs}")
    stxt = _term(I(subj), prefixes, bnode_ok=False) if not str(subj).startswith(
        "_:"
    ) else str(subj)
    joined = " ;\n    ".join(parts)
    return f"{stxt} {joined} .\n"


def _normalize(s, p, o):
    p = RESOURCE_MAPPING.get(p, p)
    o = RESOURCE_MAPPING.get(o, o)
    if p == VTYPE_REL or p == RDF_TYPE_REL:
        return s, "a", I(o)
    return s, str(p), o


def _prefix_header(prefixes) -> str:
    return (
        "".join(
            f"@prefix {pfx}: <{ns}> .\n" for pfx, ns in sorted(prefixes.items())
        )
        + "\n"
    )


def write(models, out=None, base=None, prefixes=None):
    """Serialize MicroModel(s) as Turtle to a file object (the
    driver-side sibling of ntriples.write, same docheader skip and
    Versa->RDF resource mapping)."""
    assert out is not None
    prefixes = {**DEFAULT_PREFIXES, **(prefixes or {})}
    if not isinstance(models, list):
        models = [models]
    groups: dict = {}
    for m in models:
        for s, p, o, a in m.match():
            if s == (base or "") + "@docheader":
                continue
            s, p, o = _normalize(s, p, o)
            groups.setdefault(str(s), []).append((p, o, a))
    out.write(_prefix_header(prefixes))
    for subj in sorted(groups):
        out.write(_subject_block(subj, groups[subj], prefixes))


def write_string(models, base=None, prefixes=None) -> str:
    import io

    buf = io.StringIO()
    write(models, out=buf, base=base, prefixes=prefixes)
    return buf.getvalue()


def write_turtle_ds(ds, path: str, prefixes=None, filesystem=None):
    """Distributed Turtle sink: origin-grouped rendering (one subject
    block per origin, complete because origin_adjacency co-locates an
    origin's links), sharded text files each carrying the prefix
    header — every shard is a standalone valid Turtle document, and
    repeated-prefix declarations across shards concatenate cleanly.
    Returns the shard file list."""
    import json

    import pandas as pd

    from ..model.linkset import _resolve_sink, _write_shard, origin_adjacency

    prefixes = {**DEFAULT_PREFIXES, **(prefixes or {})}
    fs_, root = _resolve_sink(path, filesystem)
    header = _prefix_header(prefixes)

    def _render(df: pd.DataFrame) -> pd.DataFrame:
        blocks = []
        for origin, adjacency in zip(df["origin"], df["adjacency"]):
            pairs = []
            for r, t, is_iri, attrs in json.loads(adjacency):
                s, p, o = _normalize(origin, I(r), I(t) if is_iri else t)
                # attrs rides the adjacency as a nested JSON string
                a = json.loads(attrs) if attrs and attrs != "{}" else None
                pairs.append((p, o, a))
            blocks.append(_subject_block(origin, pairs, prefixes))
        if not blocks:
            return pd.DataFrame({"file": []})
        return pd.DataFrame(
            {"file": [_write_shard(fs_, root, ".ttl", header + "".join(blocks))]}
        )

    files = (
        origin_adjacency(ds)
        .sort("origin")
        .map_batches(_render, batch_format="pandas")
        .take_all()
    )
    return [r["file"] for r in files]
