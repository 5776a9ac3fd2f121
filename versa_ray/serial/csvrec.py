"""CSV / record-template ingestion.

Rows fill a Versa Literate string template (headers slugified and
percent-encoded for use as template keys), each rendered document
parses into a model — the reference's model-per-row pattern
(serial/csv.py:44-172) which is exactly the engine's unit of
parallelism: the Dataset form renders+parses each row inside
map_batches.
"""

from __future__ import annotations

import csv as _csv
import re

from ..core import percent_encode
from ..model.micro import MicroModel
from .literate import parse_into

SLUGCHARS = r"a-zA-Z0-9\-\_"
OMIT_FROM_SLUG_PAT = re.compile("[^%s]" % SLUGCHARS)

_FIELD_PAT = re.compile(r"\{([^{}]+)\}")

__all__ = ["fill_template", "adapted_keys", "parse", "parse_iter", "rows_to_links_ds", "write", "omap"]


def fill_template(template: str, row: dict) -> str:
    """{key} substitution allowing arbitrary key characters (str.format
    rejects keys like '%C2%A9')."""
    return _FIELD_PAT.sub(lambda m: str(row.get(m.group(1), "")), template)


def adapted_keys(keys, mode="slug"):
    """header -> template-safe key. mode='slug' (new API, csv.py:142)
    or 'percent' (iter API, csv.py:91)."""
    out = {}
    for k in keys:
        if mode == "percent":
            ad = percent_encode(k.replace(" ", "_"))
        else:
            ad = OMIT_FROM_SLUG_PAT.sub("_", k)
        out[k] = ad
    return out


def _augment(row: dict, mapping: dict) -> dict:
    row = dict(row)
    for k, ad in mapping.items():
        row[ad] = row[k]
    return row


def parse_iter(csvfp, template_obj, csv_fact=None, prerow=None, nosy=None):
    """Yield one model per row (reference parse_iter semantics)."""
    rows = csv_fact(csvfp) if csv_fact else _csv.DictReader(csvfp)
    mapping = None
    for row in rows:
        if mapping is None:
            mapping = adapted_keys(row.keys(), mode="percent")
        row = _augment(row, mapping)
        if prerow:
            row = prerow(row)
        if isinstance(template_obj, str):
            vtext = fill_template(template_obj, row)
        else:
            vtext = template_obj(row)
        if nosy:
            nosy(vtext)
        model = MicroModel()
        parse_into(vtext, model)
        yield model


def parse(csvfp, vliterate_template, model=None, csv_cls=None):
    """All rows into one model (reference new-API parse)."""
    model = model if model is not None else MicroModel()
    rows = csv_cls(csvfp) if csv_cls else _csv.DictReader(csvfp)
    mapping = None
    for row in rows:
        if mapping is None:
            mapping = adapted_keys(row.keys(), mode="slug")
        row = _augment(row, mapping)
        parse_into(fill_template(vliterate_template, row), model)
    return model


def rows_to_links_ds(ds, vliterate_template: str, key_mode="slug"):
    """Dataset form: each record batch renders templates and parses
    doc-locally; emits canonical link rows."""
    import pyarrow as pa

    from ..core.canon import LINK_SCHEMA

    def _batch(tbl: pa.Table) -> pa.Table:
        cols = tbl.column_names
        mapping = adapted_keys(cols, mode=key_mode)
        out = []
        for i in range(tbl.num_rows):
            row = {c: str(tbl[c][i].as_py()) for c in cols}
            row = _augment(row, mapping)
            model = MicroModel()
            parse_into(fill_template(vliterate_template, row), model)
            out.extend(model.to_rows())
        if not out:
            return LINK_SCHEMA.empty_table()
        return pa.Table.from_pylist(out, schema=LINK_SCHEMA)

    return ds.map_batches(_batch, batch_format="pyarrow")


# -- writer (csv.py:177-212) ------------------------------------------------


def omap(m):
    om = {}
    for s, p, o, a in m.match():
        om.setdefault(s, {}).setdefault(p, []).append((o, a))
    return om


def fromlist(l):
    return "|".join(l)


def write(model, csvout, rulelist, write_header, base=None):
    """Project typed resources to CSV rows by (property, header) rules."""
    from ..core import RDF_TYPE_REL, VTYPE_REL

    properties = [k for (k, v) in rulelist]
    headers = [v for (k, v) in rulelist]
    if write_header:
        csvout.writerow(["id", "type"] + headers)
    mapped = omap(model)
    for o, props in mapped.items():
        rtypes = [t for (t, a) in props.get(RDF_TYPE_REL, [])] or [
            t for (t, a) in props.get(VTYPE_REL, [])
        ]
        if not rtypes:
            continue
        row = [o, fromlist(rtypes)] + [None] * len(properties)
        wrote = False
        for ix, p in enumerate(properties):
            v = [t for (t, a) in props.get(p, [])]
            if v:
                row[ix + 2] = fromlist(v)
                wrote = True
        if wrote:
            csvout.writerow(row)
