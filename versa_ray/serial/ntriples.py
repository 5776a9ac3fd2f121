"""NTriples codec (reference semantics: /root/reference/tools/py/serial/ntriples.py).

Parsing is regex-per-line (vectorizable over a text batch); rdf:type
maps to the Versa type rel; ``only_rel`` / ``exclude_rel`` pre-filter
predicates and ``disjoint`` performs an anti-join against an existing
link set at parse time.
"""

from __future__ import annotations

import re

from ..core import I, RDF_TYPE_REL, VERSA_BASEIRI, VTYPE_REL, RDF_NS, RDFS_NS
from ..model.micro import MicroModel

__all__ = ["parse", "write", "write_string", "parse_links"]

NT_LINE_PAT = re.compile(
    r'^((<([^>]+)>)|(_:\w+))\s+<([^>]+)>\s+((<([^>]+)>)|"((?:[^"\\]|\\.)*)"|(_:\w+))\s+\.\s*'
)

# N-Triples literal string escapes (the spec's ECHAR subset we emit).
# NB divergence from the reference writer, which quotes without
# escaping (serial/ntriples.py:103-110 `strconv`) and so cannot
# round-trip literals containing '"' or '\'; ours does.
_NT_ESCAPES = [("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n"), ("\r", "\\r"), ("\t", "\\t")]
_NT_UNESCAPE_PAT = re.compile(r'\\([\\"nrt])')
_NT_UNESCAPE_MAP = {"\\": "\\", '"': '"', "n": "\n", "r": "\r", "t": "\t"}


def _nt_escape(s: str) -> str:
    for raw, esc in _NT_ESCAPES:
        s = s.replace(raw, esc)
    return s


def _nt_unescape(s: str) -> str:
    if "\\" not in s:
        return s
    return _NT_UNESCAPE_PAT.sub(lambda m: _NT_UNESCAPE_MAP[m.group(1)], s)

RESOURCE_MAPPING = {
    I(VERSA_BASEIRI + "Resource"): I(RDFS_NS + "Class"),
    I(VERSA_BASEIRI + "Property"): I(RDF_NS + "Property"),
    I(VERSA_BASEIRI + "description"): I(RDFS_NS + "comment"),
    I(VERSA_BASEIRI + "label"): I(RDFS_NS + "label"),
}


def parse_links(nt, only_rel=None, exclude_rel=None, disjoint=None):
    """Yield (origin, rel, target, attrs) links from NTriples text.

    Pure generator form used by both the MicroModel API and the
    Dataset batch parser."""
    exclude_rel = set(exclude_rel or ())
    only_rel = set(only_rel or ())
    disjoint = disjoint or set()
    if only_rel:
        only_rel = set(only_rel)
        only_rel.add(VTYPE_REL)
    seen = set()

    # split on LF only — splitlines() also splits on NEL/LS/PS, which
    # are legal raw inside NT literals
    lines = nt.split("\n") if isinstance(nt, str) else nt
    for line in lines:
        m = NT_LINE_PAT.match(line.strip())
        if not m:
            continue
        _, s, s_iri, s_blank, p_iri, o, _, o_iri, o_str, o_blank = m.groups()
        if o_blank or s_blank:
            raise NotImplementedError("Blank nodes not yet implemented")
        if p_iri == RDF_TYPE_REL:
            p_iri = VTYPE_REL
        p_iri = I(p_iri)
        if only_rel:
            if p_iri not in only_rel:
                continue
        elif p_iri in exclude_rel:
            continue
        target = I(o_iri) if o_iri else _nt_unescape(o_str)
        parts = (I(s_iri), p_iri, target, ())
        if parts in seen or parts in disjoint:
            continue
        seen.add(parts)
        yield (I(s_iri), p_iri, target, {})


def parse(nt, model: MicroModel | None = None, only_rel=None, exclude_rel=None, disjoint=None):
    model = model if model is not None else MicroModel()
    for link in parse_links(nt, only_rel=only_rel, exclude_rel=exclude_rel, disjoint=disjoint):
        model.add(*link)
    return model


def _strconv(item):
    if isinstance(item, I):
        return "<" + str(item) + ">"
    return '"' + _nt_escape(str(item)) + '"'


def write(models, out=None, base=None):
    assert out is not None
    if not isinstance(models, list):
        models = [models]
    for m in models:
        for s, p, o, a in m.match():
            if s == (base or "") + "@docheader":
                continue
            p = RESOURCE_MAPPING.get(p, p)
            o = RESOURCE_MAPPING.get(o, o)
            if p == VTYPE_REL:
                p = RDF_TYPE_REL
            print(_strconv(s), _strconv(p), _strconv(o), ".", file=out)


def read_ntriples_ds(paths, only_rel=None, exclude_rel=None, disjoint=None,
                     distinct=False):
    """Distributed NTriples ingestion: files split into line batches,
    each parsed vectorized-per-line inside map_batches with the same
    only_rel/exclude_rel predicate filters as the driver-side parser;
    emits canonical link rows.

    Dedup semantics: parse_links' ``seen`` set is per-batch, so
    duplicate triples that straddle batch boundaries survive the raw
    read — pass ``distinct=True`` for the driver-side parse() dedup
    semantics (one distinct_links shuffle). ``disjoint`` (a SMALL set
    of (origin, rel, target, ()) tuples, broadcast into each task)
    drops matching links at parse time; for a corpus-scale disjoint
    set use ``linkset.remove_statements`` downstream instead."""
    import pyarrow as pa
    import ray.data as rd

    from ..core.canon import LINK_SCHEMA, link_to_row

    disjoint = frozenset(disjoint or ())

    def _parse(batch: pa.Table) -> pa.Table:
        cols = {name: [] for name in LINK_SCHEMA.names}
        text = "\n".join(batch["text"].to_pylist())
        for o, r, t, a in parse_links(
            text, only_rel=only_rel, exclude_rel=exclude_rel, disjoint=disjoint
        ):
            row = link_to_row(o, r, t, a)
            for k, v in row.items():
                cols[k].append(v)
        return pa.Table.from_pydict(cols, schema=LINK_SCHEMA)

    out = rd.read_text(paths).map_batches(_parse, batch_format="pyarrow")
    if distinct:
        from ..model.linkset import distinct_links

        out = distinct_links(out)
    return out


def write_string(models) -> str:
    import io

    buf = io.StringIO()
    write(models, buf)
    return buf.getvalue()
