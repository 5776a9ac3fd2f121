"""HTML text extraction and RDFa-Lite triple extraction.

Implemented on the stdlib ``html.parser`` (no external HTML deps in
this environment). The RDFa-Lite walker follows the attribute
semantics of the reference extractor
(/root/reference/tools/py/serial/rdfalite.py:78-172): track
``vocab`` / ``prefix`` / ``resource`` down the tree; ``typeof`` emits
rdf:type statements; ``property`` emits a statement whose value is the
nested resource if present, else ``content`` / ``href`` / ``src`` /
the element's text value; unlike the reference, blank nodes are
DETERMINISTIC (content-derived per document), because random bnode ids
would break distributed re-execution and dedup.

Both functions are stateless and run vectorized-per-row inside
``map_batches`` tasks; per-document cost is one parse.
"""

from __future__ import annotations

from html.parser import HTMLParser

from ..core import I, RDF_NS, absolutize
from ..core.hashing import simple_hashstring

VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)
_SKIP_TEXT = frozenset(("script", "style", "template"))

DEFAULT_PREFIXES = {
    "rdf": str(RDF_NS),
    "schema": "https://schema.org/",
    "foaf": "http://xmlns.com/foaf/0.1/",
    "dc": "http://purl.org/dc/terms/",
    "bf": "http://bibfra.me/vocab/lite/",
}

RDF_TYPE = str(RDF_NS) + "type"


class _Node:
    __slots__ = ("tag", "attrs", "children")

    def __init__(self, tag, attrs):
        self.tag = tag
        self.attrs = attrs
        self.children = []  # _Node or str (text)

    def text_value(self) -> str:
        """Concatenated descendant text (reference xml_value)."""
        out = []

        def walk(n):
            for c in n.children:
                if isinstance(c, str):
                    out.append(c)
                else:
                    walk(c)

        walk(self)
        return "".join(out)


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = _Node("#root", {})
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = _Node(tag, dict(attrs))
        self.stack[-1].children.append(node)
        if tag not in VOID_ELEMENTS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self.stack[-1].children.append(_Node(tag, dict(attrs)))

    def handle_endtag(self, tag):
        for ix in range(len(self.stack) - 1, 0, -1):
            if self.stack[ix].tag == tag:
                del self.stack[ix:]
                break

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


def parse_html(html) -> _Node:
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", "replace")
    tb = _TreeBuilder()
    tb.feed(html)
    tb.close()
    return tb.root


def _find(node: _Node, tag: str):
    for c in node.children:
        if isinstance(c, _Node):
            if c.tag == tag:
                return c
            found = _find(c, tag)
            if found is not None:
                return found
    return None


def extract_text(html) -> str:
    """Byte-stable text extraction: stripped text chunks of the <body>
    (whole document if no body), document order, newline-joined;
    script/style/template content skipped.

    This exact convention is the per-row invariant checked against the
    corpus's golden ``text`` column.
    """
    return text_from_tree(parse_html(html))


def text_from_tree(root: _Node) -> str:
    body = _find(root, "body") or root
    segments = []

    def walk(n: _Node):
        if n.tag in _SKIP_TEXT:
            return
        for c in n.children:
            if isinstance(c, str):
                s = c.strip()
                if s:
                    segments.append(s)
            else:
                walk(c)

    walk(body)
    return "\n".join(segments)


def extract_rdfa(html, source_uri: str, strict: bool = False):
    """RDFa-Lite extraction -> list of (subject, predicate, object,
    obj_is_iri) tuples, document order, duplicates preserved.

    ``strict=True`` enables W3C-RDFa behaviors the reference's lite
    walker simplifies (rdfalite.py:78-172): the ``about`` attribute
    sets the element's subject; ``property`` + ``resource`` chains
    (parent-subject, prop, resource) instead of the lite walker's
    self-triple (it overwrites the subject with ``resource`` before
    emitting); ``prefix``/CURIE properties work without a ``vocab``
    in scope. Default (lite) mode is bit-compatible with the
    reference walker."""
    return rdfa_from_tree(parse_html(html), source_uri, strict=strict)


def extract_both(html, source_uri: str):
    """One parse, both products: (text, rdfa triples). The hot path for
    the page extraction stage — HTML parsing dominates, so share the
    tree."""
    root = parse_html(html)
    return text_from_tree(root), rdfa_from_tree(root, source_uri)


_RDFA_ATTRS = ("prefix", "about", "resource", "typeof", "property")


def rdfa_from_tree(root: _Node, source_uri: str, strict: bool = False):
    triples = []
    bnode_counter = [0]
    doc_tag = simple_hashstring(source_uri)

    def bnode():
        bnode_counter[0] += 1
        return I("_:b%s-%d" % (doc_tag, bnode_counter[0]))

    def do_parse(elem: _Node, resource, vocab=None, prefixes=None):
        prefixes = prefixes or dict(DEFAULT_PREFIXES)
        attrs = elem.attrs
        vocab = attrs.get("vocab", vocab)
        # lite mode gates ALL rdfa processing on a vocab in scope (the
        # reference walker's behavior); strict processes rdfa
        # attributes whenever any is present (CURIEs work vocab-less)
        active = vocab or (strict and any(a in attrs for a in _RDFA_ATTRS))
        if active:
            prefix = attrs.get("prefix")
            if prefix:
                bits = prefix.split()
                for i in range(0, len(bits) - 1, 2):
                    prefixes = dict(prefixes)
                    prefixes[bits[i].strip().rstrip(":")] = bits[i + 1].strip()
            about_subj = None
            if strict:
                about = attrs.get("about")
                if about:
                    try:
                        about_subj = I(absolutize(about, source_uri))
                        resource = about_subj
                    except ValueError:
                        pass
            subject = resource  # the property-triple subject in strict mode
            new_resource = attrs.get("resource")
            if new_resource:
                try:
                    new_resource = I(absolutize(new_resource, source_uri))
                    if not strict:
                        # lite quirk (reference rdfalite.py:106): the
                        # subject is overwritten BEFORE property
                        # emission, so property+resource co-occurrence
                        # yields a self-triple
                        resource = new_resource
                except ValueError:
                    new_resource = None

            typeof_list = attrs.get("typeof")
            if typeof_list:
                if strict and about_subj is not None:
                    # RDFa 1.1: @about wins as the typed resource even
                    # when @resource co-occurs (resource is then the
                    # current OBJECT, not the typed subject)
                    type_subj = about_subj
                else:
                    if not new_resource:
                        new_resource = bnode()
                    type_subj = new_resource or resource
                for typeof in typeof_list.split():
                    typ = None
                    if ":" in typeof:
                        p, local = typeof.split(":", 1)
                        if strict and p in prefixes:
                            try:
                                typ = I(absolutize(local, prefixes[p]))
                            except ValueError:
                                typ = None
                    if typ is None:
                        if not vocab:
                            continue
                        try:
                            typ = I(absolutize(typeof, vocab))
                        except ValueError:
                            continue
                    triples.append((type_subj, RDF_TYPE, typ, True))

            prop_list = attrs.get("property")
            new_value = None
            if prop_list:
                if new_resource:
                    new_value = new_resource
                for raw_prop in prop_list.split():
                    if raw_prop == "about":
                        continue
                    if ":" in raw_prop:
                        p, local = raw_prop.split(":", 1)
                        if p not in prefixes:
                            continue
                        try:
                            prop = I(absolutize(local, prefixes[p]))
                        except ValueError:
                            continue
                    else:
                        if not vocab:
                            continue  # bare terms need a vocab (both modes)
                        try:
                            prop = I(absolutize(raw_prop, vocab))
                        except ValueError:
                            continue
                    value = None
                    if new_value:
                        value = new_value
                    else:
                        for src_attr in ("content", "href", "src"):
                            v = attrs.get(src_attr)
                            if v:
                                try:
                                    value = I(v) if src_attr in ("href", "src") else v
                                except ValueError:
                                    value = None
                                break
                        if value is None:
                            value = elem.text_value()
                    subj = subject if strict else resource
                    triples.append((subj, prop, value, isinstance(value, I)))
            if new_value:
                resource = new_value
            elif strict and new_resource:
                resource = new_resource
        for child in elem.children:
            if isinstance(child, _Node):
                do_parse(child, resource, vocab=vocab, prefixes=prefixes)

    do_parse(root, source_uri)
    return triples
