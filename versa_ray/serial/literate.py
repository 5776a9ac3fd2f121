"""Versa Literate (Markdown-flavored) codec.

A fast, line-oriented parser and a canonical writer for the Versa
Literate format (reference grammar and semantics:
/root/reference/tools/py/serial/literate_pure_helper.py and
serial/literate.py; format doc: doc/literate_format.md). This is a
fresh implementation: a single pass over lines with compiled regexes —
no parser-generator — because in the engine a batch task parses many
documents per call and constant factors dominate.

Format essentials::

    # @docheader
    * @iri:
        * @base: http://example.org/classics/
        * @schema: https://schema.org/

    # resource-id [Type]
    * prop: value            <- unquoted -> UNKNOWN (interp hook)
    * prop: "value"          <- quoted   -> TEXT (gets @lang if doc lang)
    * prop: <target>         <- IRI      -> resource link
        * attrkey: attrval   <- indented -> attribute of prop above

Extension beyond the reference pure parser: unquoted values may
continue over following lines (long text), which the reference's
legacy Markdown-based parser accepted (markdown_parse.py) but its pure
parser rejects; the poetry.md fixture requires it.
"""

from __future__ import annotations

import re
import sys

from ..core import I, VERSA_BASEIRI, VERSA_NULL, VTYPE_REL, absolutize, matches_uri_ref_syntax, relativize
from ..model.micro import MicroModel
from ..model.vutil import all_origins, resourcetypes

__all__ = ["parse", "parse_into", "write", "write_string"]

RES_VAL, TEXT_VAL, UNKNOWN_VAL, NONE_VAL = "res", "text", "unknown", "none"

_HEADER_PAT = re.compile(r"^(#+)\s*(.*?)\s*$")
_PROP_PAT = re.compile(r"^([ \t]*)\*\s+(.*)$")
_COMMENT_LINE_PAT = re.compile(r"^\s*(<!--.*?-->|//.*)\s*$", re.DOTALL)
_COMMENT_OPEN_PAT = re.compile(r"^\s*<!--")
_TRAILING_COMMENT_PAT = re.compile(r"\s*(<!--.*?-->|//[^\n]*)\s*$", re.DOTALL)
_URI_ABBR_PAT = re.compile(r"@([\-_\w]+)([#/@])(.+)", re.DOTALL)
_URI_EXPLICIT_PAT = re.compile(r"<(.+)>", re.DOTALL)
_QUOTED_PAT = re.compile(r'^"((?:[^"\\]|\\.)*)"|^\'((?:[^\'\\]|\\.)*)\'')
_IRI_VALUE_PAT = re.compile(r"^<([^<>]*)>")

TYPE_REL = VTYPE_REL


class _Doc:
    __slots__ = ("iri", "resbase", "schemabase", "rtbase", "lang", "iris", "interp")

    def __init__(self):
        self.iri = None
        self.resbase = None
        self.schemabase = None
        self.rtbase = None
        self.lang = None
        self.iris = {}
        self.interp = {}


class _Prop:
    __slots__ = ("indent", "key", "value", "vtype")

    def __init__(self, indent, key, value, vtype):
        self.indent = indent
        self.key = key
        self.value = value
        self.vtype = vtype


def _parse_value(raw: str):
    """Classify a property value -> (value, vtype)."""
    if raw is None:
        return None, NONE_VAL
    raw = raw.strip()
    if not raw:
        return None, NONE_VAL
    m = _IRI_VALUE_PAT.match(raw)
    if m and not _TRAILING_COMMENT_PAT.sub("", raw[m.end() :]).strip():
        return m.group(1), RES_VAL
    m = _QUOTED_PAT.match(raw)
    if m and not _TRAILING_COMMENT_PAT.sub("", raw[m.end() :]).strip():
        text = m.group(1) if m.group(1) is not None else m.group(2)
        text = text.replace('\\"', '"').replace("\\'", "'").replace("\\\\", "\\")
        return text, TEXT_VAL
    return raw, UNKNOWN_VAL


def _split_prop(body: str):
    """Split '<key>: value' / 'key: value' -> (key, rawvalue|None).

    For bare keys the split point is the first ': ' (or a trailing
    ':'), so keys that are themselves IRIs containing ':' still parse.
    """
    if body.startswith("<"):
        end = body.find(">")
        if end > 0 and body[end + 1 : end + 2] == ":":
            return body[1:end], body[end + 2 :]
    ix = body.find(": ")
    if ix < 0:
        if body.rstrip().endswith(":"):
            return body.rstrip()[:-1].strip(), None
        ix = body.find(":")
        if ix < 0:
            return body.strip(), None
    return body[:ix].strip(), body[ix + 1 :]


def _expand(iri_in, base, doc: _Doc, relcontext=None):
    if iri_in is None:
        return VERSA_NULL
    if iri_in.startswith("@") and not _URI_ABBR_PAT.match(iri_in):
        return I(absolutize(iri_in[1:], VERSA_BASEIRI))
    m = _URI_EXPLICIT_PAT.match(iri_in)
    if m:
        inner = m.group(1)
        return I(inner) if base is None else I(absolutize(inner, base))
    m = _URI_ABBR_PAT.match(iri_in)
    if m and m.group(1) in doc.iris:
        return I(doc.iris[m.group(1)] + m.group(2) + m.group(3))
    if relcontext and not matches_uri_ref_syntax(iri_in):
        raise ValueError(
            f'Invalid IRI reference provided for relation {relcontext}: "{iri_in}"'
        )
    return I(iri_in) if base is None else I(absolutize(iri_in, base))


def _tokenize(vlit: str):
    """Yield ('header', depth, rest) | ('prop', indent, body) |
    ('cont', text) events, skipping comments and blanks."""
    in_comment = False
    for line in vlit.splitlines():
        if in_comment:
            if "-->" in line:
                in_comment = False
            continue
        if not line.strip():
            yield ("blank", None, None)
            continue
        if _COMMENT_LINE_PAT.match(line):
            continue
        if _COMMENT_OPEN_PAT.match(line) and "-->" not in line:
            in_comment = True
            continue
        m = _HEADER_PAT.match(line)
        if m:
            yield ("header", len(m.group(1)), m.group(2))
            continue
        m = _PROP_PAT.match(line)
        if m:
            yield ("prop", len(m.group(1).expandtabs(4)), m.group(2))
            continue
        yield ("cont", None, line)


def _parse_header_rest(rest: str):
    """'rid [Type]' -> (rid, rtype); either may be absent."""
    rtype = None
    m = re.search(r"\[([^\]]*)\]\s*$", rest)
    if m:
        rtype = m.group(1).strip() or None
        rest = rest[: m.start()].strip()
    rid = rest.strip() or None
    if rid:
        em = _URI_EXPLICIT_PAT.match(rid)
        if em:
            rid = em.group(1)
    return rid, rtype


def parse_into(vlit: str, model: MicroModel, config: dict | None = None):
    """Parse Versa Literate text, adding links to ``model``.

    Returns the document base IRI (@base, else @document)."""
    config = config or {}
    doc = _Doc()
    doc.interp = _setup_interpretations(config.get("interpretations", {}), doc)

    blocks = []  # (rid, rtype, props)
    current = None
    cur_prop = None

    for kind, a, b in _tokenize(vlit):
        if kind == "header":
            rid, rtype = _parse_header_rest(b)
            current = (rid, rtype, [])
            blocks.append(current)
            cur_prop = None
        elif kind == "prop":
            if current is None:
                continue
            key, rawval = _split_prop(b)
            val, vtype = _parse_value(rawval)
            cur_prop = _Prop(a, key, val, vtype)
            current[2].append(cur_prop)
        elif kind == "cont":
            # long-text continuation of an unquoted value
            if cur_prop is not None and cur_prop.vtype in (UNKNOWN_VAL, TEXT_VAL):
                cur_prop.value = (cur_prop.value or "") + "\n" + b.strip()
        elif kind == "blank":
            pass

    for rid, rtype, props in blocks:
        if rid == "@docheader":
            _process_docheader(props, model, doc)
        else:
            _process_resblock(rid, rtype, props, model, doc)

    return doc.resbase or doc.iri


def parse(vlit: str, model: MicroModel | None = None, config: dict | None = None):
    """Parse Versa Literate text; returns the model (creating one if
    needed). Use parse_into for the reference-style signature."""
    model = model if model is not None else MicroModel()
    parse_into(vlit, model, config=config)
    return model


def read_literate_ds(paths, config: dict | None = None):
    """Distributed Versa Literate ingestion: every .vlit/.md file
    parses doc-locally inside map_batches (one micro-model per
    document — the reference's model-per-doc unit made physical) and
    emits canonical link rows plus a ``src_doc`` lineage column.
    ``paths`` is a file, directory, or list accepted by
    ray.data.read_binary_files."""
    import pyarrow as pa
    import ray.data as rd

    from ..core.canon import LINK_SCHEMA, link_to_row

    out_schema = pa.schema(list(LINK_SCHEMA) + [pa.field("src_doc", pa.string())])

    def _parse(batch: pa.Table) -> pa.Table:
        cols = {name: [] for name in out_schema.names}
        for path, data in zip(
            batch["path"].to_pylist(), batch["bytes"].to_pylist()
        ):
            model = parse(data.decode("utf-8"), config=config)
            for o, r, t, a in model.match():
                row = link_to_row(o, r, t, a)
                for k, v in row.items():
                    cols[k].append(v)
                cols["src_doc"].append(path)
        return pa.Table.from_pydict(cols, schema=out_schema)

    files = rd.read_binary_files(paths, include_paths=True)
    return files.map_batches(_parse, batch_format="pyarrow")


def _process_docheader(props, model, doc: _Doc):
    outer = -1
    section = None
    for prop in props:
        if outer == -1:
            outer = prop.indent
        if prop.indent == outer:
            section = prop
            if prop.key == "@document":
                doc.iri = prop.value
            elif prop.key == "@language":
                doc.lang = prop.value
            elif doc.iri:
                fullprop = I(absolutize(prop.key, doc.schemabase))
                if fullprop in doc.interp:
                    val = doc.interp[fullprop](
                        prop.value, rid=doc.iri, fullprop=fullprop, base=doc.resbase, model=model
                    )
                    if val is not None:
                        model.add(doc.iri, fullprop, val)
                else:
                    model.add(doc.iri, fullprop, prop.value)
        elif section is not None and section.key == "@iri":
            k, uri = prop.key, prop.value
            if k == "@base":
                doc.resbase = doc.rtbase = uri
            elif k == "@schema":
                doc.schemabase = uri
            elif k == "@resource-type":
                doc.rtbase = uri
            else:
                doc.iris[k] = uri
        elif section is not None and section.key == "@interpretations":
            key = I(absolutize(prop.key, doc.schemabase))
            doc.interp.update(_setup_interpretations({key: prop.value}, doc))


def _process_resblock(rid, rtype, props, model, doc: _Doc):
    rid = _expand(rid or "", doc.resbase, doc)
    if rtype:
        model.add(rid, TYPE_REL, _expand(rtype, doc.schemabase, doc))

    outer = -1
    cur = None  # (key, value) of pending outer prop
    attrs = {}
    for prop in props:
        if outer == -1:
            outer = prop.indent
        if prop.indent == outer:
            if cur is not None:
                model.add(rid, cur[0], cur[1], attrs)
            attrs = {}
            key = _expand(prop.key, doc.schemabase, doc)
            value = prop.value
            if prop.vtype == RES_VAL:
                value = _expand("<%s>" % prop.value, doc.rtbase, doc, relcontext=key)
            elif prop.vtype == TEXT_VAL:
                value = str(prop.value)
                if doc.lang:
                    attrs.setdefault("@lang", doc.lang)
            elif prop.vtype == UNKNOWN_VAL:
                if key in doc.interp:
                    value = doc.interp[key](
                        str(prop.value), rid=rid, fullprop=key, base=doc.iri, model=model
                    )
                else:
                    value = str(prop.value)
            else:
                value = None
            cur = (key, value)
        else:
            # attribute of the pending outer prop; values always land as
            # plain strings (matching reference behavior, where the
            # nested-attr IRI branch is unreachable —
            # literate_pure_helper.py:263-285)
            fullaprop = _expand(prop.key, doc.schemabase, doc)
            if prop.vtype == NONE_VAL:
                continue
            aval = prop.value
            if prop.vtype == UNKNOWN_VAL and fullaprop in doc.interp:
                aval = doc.interp[fullaprop](str(aval), rid=rid, fullprop=fullaprop, base=doc.iri, model=model)
            if aval is not None:
                attrs[fullaprop] = str(aval)
    if cur is not None:
        model.add(rid, cur[0], cur[1], attrs)


def _handle_resourceset(ltext, fullprop=None, rid=None, base=VERSA_BASEIRI, model=None, **kw):
    for i in ltext.strip().split():
        model.add(rid, fullprop, I(absolutize(i, base)))
    return None


def _setup_interpretations(interp, doc):
    prep = {
        VERSA_BASEIRI + "text": lambda x, **kw: x,
        VERSA_BASEIRI + "resource": lambda x, base=VERSA_BASEIRI, **kw: I(absolutize(x, base)),
        VERSA_BASEIRI + "resourceset": _handle_resourceset,
    }
    out = {}
    for prop, key in (interp or {}).items():
        if isinstance(key, str) and key.startswith("@"):
            key = absolutize(key[1:], VERSA_BASEIRI)
        out[prop] = prep.get(key, lambda x, **kw: x)
    return out


# ---------------------------------------------------------------------------
# Writer


def _abbreviate(rel, bases):
    for base in bases:
        abbr = relativize(rel, base, sub_path_only=True)
        if abbr:
            if base == VERSA_BASEIRI:
                abbr = "@" + abbr
            return abbr
    return I(rel)


def escape_text(val) -> str:
    """Escape a data value for double-quoted Literate output so the
    parser's ``_QUOTED_PAT`` + unescape (above) round-trips exactly:
    backslash first, then the quote character."""
    return str(val).replace("\\", "\\\\").replace('"', '\\"')


def _value_format(val):
    if isinstance(val, I):
        return f"<{val}>"
    return f'"{escape_text(val)}"'


def write(model, out=sys.stdout, base=None, schema=None, shorteners=None, canonical=False):
    """Serialize a model as Versa Literate; ``canonical=True`` emits the
    sorted canonical form used as a conformance surface
    (serial/literate.py:80-132 semantics, golden-tested)."""
    shorteners = shorteners or {}
    all_schema = [schema] if schema else []
    all_schema.append(VERSA_BASEIRI)

    if any((base, schema, shorteners)):
        out.write("# @docheader\n\n* @iri:\n")
        if base:
            out.write("    * @base: {0}".format(base))
        if schema:
            out.write("    * @schema: {0}".format(schema))
    out.write("\n\n")

    origin_space = set(all_origins(model))
    if canonical:
        origin_space = sorted(origin_space)

    for o in origin_space:
        first_type = next(iter(sorted(resourcetypes(model, o))), None)
        if first_type:
            ft = _abbreviate(first_type, all_schema)
            out.write(f"# {o} [{ft}]\n\n")
        else:
            out.write(f"# {o}\n\n")
        rels = [
            (o_, r, t, sorted(a.items()))
            for (o_, r, t, a) in model.match(o)
        ]
        if canonical:
            rels = sorted(rels, key=lambda x: (x[0], x[1], x[2] or "", x[3]))
        for _, r, t, a in rels:
            if (r, t) == (TYPE_REL, first_type):
                continue
            rendered_r = _abbreviate(r, all_schema)
            if isinstance(rendered_r, I):
                rendered_r = f"<{rendered_r}>"
            out.write(f"* {rendered_r}: {_value_format(t)}\n")
            for k, v in a:
                rendered_k = _abbreviate(k, all_schema)
                # NB: reference renders IRI attr keys bare (writer quirk
                # baked into its canonical goldens) — reproduced here
                out.write(f"    * {rendered_k}: {_value_format(v)}\n")
        out.write("\n")


def write_string(model, **kwargs) -> str:
    import io

    buf = io.StringIO()
    write(model, buf, **kwargs)
    return buf.getvalue()
