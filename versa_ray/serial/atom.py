"""Atom feed -> Versa model (demo-tier source, reference
tools/exec/atom2versa:56-90 semantics) using stdlib ElementTree; each
feed entry renders a Versa Literate block."""

from __future__ import annotations

import xml.etree.ElementTree as ET

from ..model.micro import MicroModel
from .literate import parse_into

ATOM_NS = "{http://www.w3.org/2005/Atom}"

ENTRY_TEMPLATE = """
# [poem]

* updated: {updated}
{links}* title: "{title}"
* author: {author}
* summary: {summary}

"""


def _text(elem, name):
    child = elem.find(ATOM_NS + name)
    return (child.text or "").strip() if child is not None else ""


def parse(atom_xml: str, model: MicroModel | None = None, base=None):
    model = model if model is not None else MicroModel()
    root = ET.fromstring(atom_xml)
    config = None
    for entry in root.iter(ATOM_NS + "entry"):
        links = "".join(
            "* link: <%s>\n" % e.get("href")
            for e in entry.findall(ATOM_NS + "link")
            if e.get("href")
        )
        author_el = entry.find(ATOM_NS + "author")
        author = _text(author_el, "name") if author_el is not None else ""
        vlit = ENTRY_TEMPLATE.format(
            updated=_text(entry, "updated"),
            links=links,
            title=_text(entry, "title").replace('"', '\\"'),
            author=author,
            summary=_text(entry, "summary"),
        )
        if base:
            vlit = (
                "# @docheader\n\n* @iri:\n    * @base: %s\n" % base
            ) + vlit
        parse_into(vlit, model, config=config)
    return model


def feeds_to_links_ds(ds, xml_col="xml", base=None):
    """Dataset of feed documents -> canonical link rows."""
    import pyarrow as pa

    from ..core.canon import LINK_SCHEMA

    def _batch(tbl: pa.Table) -> pa.Table:
        out = []
        for xml in tbl[xml_col].to_pylist():
            m = parse(xml, base=base)
            out.extend(m.to_rows())
        if not out:
            return LINK_SCHEMA.empty_table()
        return pa.Table.from_pylist(out, schema=LINK_SCHEMA)

    return ds.map_batches(_batch, batch_format="pyarrow")
