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

# bnode labels may contain '.' internally but not terminally (spec
# BLANK_NODE_LABEL) — and the whitespace before the closing '.' is
# optional, so minified "_:a <p> _:b." parses instead of silently
# dropping
_BNODE_LABEL = r'_:[\w\-](?:[\w.\-]*[\w\-])?'
NT_LINE_PAT = re.compile(
    r'^((<([^>]+)>)|(' + _BNODE_LABEL + r'))\s+<([^>]+)>\s+'
    r'((<([^>]+)>)|"((?:[^"\\]|\\.)*)"'
    r'(?:@(?P<lang>[A-Za-z][A-Za-z0-9\-]*)|\^\^<(?P<dtype>[^>]+)>)?'
    r'|(' + _BNODE_LABEL + r'))\s*\.\s*'
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


def parse_links(nt, only_rel=None, exclude_rel=None, disjoint=None,
                bnode_scope=None):
    """Yield (origin, rel, target, attrs) links from NTriples text.

    Pure generator form used by both the MicroModel API and the
    Dataset batch parser.

    Blank nodes — EXCEEDING the reference, which raises
    NotImplementedError (serial/ntriples.py:81-82): a bnode label
    ``_:x`` maps to the deterministic content-derived id
    ``_:b<scope>-x`` (the same scheme web/extract.py uses for RDFa
    bnodes). ``bnode_scope`` identifies the DOCUMENT the labels are
    scoped to (NT bnode labels are file-local); it defaults to a hash
    of the input text, so re-parsing the same document reproduces the
    same ids while equal labels in different documents stay distinct.
    Callers that split one document across calls (the Dataset batch
    parser) must pass an explicit per-document scope to keep
    coreference. When the input is an ITERABLE of lines the text
    can't be hashed without consuming it, so a bnode in unscoped
    iterable input raises ValueError — a silent shared default would
    corefer equal labels across different documents."""
    from ..core.hashing import simple_hashstring

    exclude_rel = set(exclude_rel or ())
    only_rel = set(only_rel or ())
    disjoint = disjoint or set()
    if only_rel:
        only_rel = set(only_rel)
        only_rel.add(VTYPE_REL)
    seen = set()

    def _bnode(label: str):
        # label arrives as "_:x"; strip the marker, keep the name.
        # The default scope (hash of the whole input) is computed
        # LAZILY on the first bnode — bnode-free corpora never pay it
        nonlocal bnode_scope
        if bnode_scope is None:
            if not isinstance(nt, str):
                raise ValueError(
                    "blank node %r in iterable input: NT bnode labels "
                    "are document-local, so parse_links needs an "
                    "explicit bnode_scope when the document text is "
                    "not available to hash" % label)
            bnode_scope = simple_hashstring(nt)
        return I("_:b%s-%s" % (bnode_scope, label[2:]))

    # split on LF only — splitlines() also splits on NEL/LS/PS, which
    # are legal raw inside NT literals
    lines = nt.split("\n") if isinstance(nt, str) else nt
    for line in lines:
        m = NT_LINE_PAT.match(line.strip())
        if not m:
            continue
        g = m.groups()
        s_iri, s_blank, p_iri = g[2], g[3], g[4]
        o_iri, o_str, o_blank = g[7], g[8], g[11]
        subj = _bnode(s_blank) if s_blank else I(s_iri)
        if p_iri == RDF_TYPE_REL:
            p_iri = VTYPE_REL
        p_iri = I(p_iri)
        if only_rel:
            if p_iri not in only_rel:
                continue
        elif p_iri in exclude_rel:
            continue
        attrs = {}
        if o_iri is not None:
            target = I(o_iri)
        elif o_blank:
            target = _bnode(o_blank)
        else:
            target = _nt_unescape(o_str)
            # language tags / datatypes ride as attrs (the reference
            # data model's own convention, e.g. {"@lang": "en"})
            if m.group("lang"):
                attrs["@lang"] = m.group("lang")
            elif m.group("dtype"):
                attrs["@datatype"] = m.group("dtype")
        parts = (subj, p_iri, target, tuple(sorted(attrs.items())))
        if parts in seen or parts in disjoint:
            continue
        seen.add(parts)
        yield (subj, p_iri, target, attrs)


def parse(nt, model: MicroModel | None = None, only_rel=None, exclude_rel=None, disjoint=None):
    model = model if model is not None else MicroModel()
    for link in parse_links(nt, only_rel=only_rel, exclude_rel=exclude_rel, disjoint=disjoint):
        model.add(*link)
    return model


def _strconv(item):
    if isinstance(item, I):
        # blank nodes serialize bare (never angle-bracketed)
        if str(item).startswith("_:"):
            return str(item)
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
            obj = _strconv(o)
            if not isinstance(o, I) and a:
                if "@lang" in a:
                    obj += "@" + str(a["@lang"])
                elif "@datatype" in a:
                    obj += "^^<%s>" % a["@datatype"]
            print(_strconv(s), _strconv(p), obj, ".", file=out)


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
    set use ``linkset.remove_statements`` downstream instead.

    Blank-node coreference: bnode labels are file-scoped, and one
    file's lines may land in MANY batches, so each line's bnode scope
    derives from its source path (``include_paths``) — every batch of
    the same file maps ``_:x`` to the same deterministic id."""
    import pyarrow as pa
    import ray.data as rd

    from ..core.canon import LINK_SCHEMA, link_to_row
    from ..core.hashing import simple_hashstring

    disjoint = frozenset(disjoint or ())

    def _parse(batch: pa.Table) -> pa.Table:
        cols = {name: [] for name in LINK_SCHEMA.names}
        df_paths = batch["path"].to_pylist()
        df_text = batch["text"].to_pylist()
        by_path: dict = {}
        for p, t in zip(df_paths, df_text):
            by_path.setdefault(p, []).append(t)
        for p, lines in by_path.items():
            for o, r, t, a in parse_links(
                lines, only_rel=only_rel, exclude_rel=exclude_rel,
                disjoint=disjoint, bnode_scope=simple_hashstring(p),
            ):
                row = link_to_row(o, r, t, a)
                for k, v in row.items():
                    cols[k].append(v)
        return pa.Table.from_pydict(cols, schema=LINK_SCHEMA)

    out = rd.read_text(paths, include_paths=True).map_batches(
        _parse, batch_format="pyarrow"
    )
    if distinct:
        from ..model.linkset import distinct_links

        out = distinct_links(out)
    return out


def write_string(models) -> str:
    import io

    buf = io.StringIO()
    write(models, buf)
    return buf.getvalue()
