"""Simple-object (JSON-ish dict) template ingestion
(reference serial/simpleobj.py:20-33 semantics, minus the Jinja
dependency: templates are callables or {key} string templates)."""

from __future__ import annotations

from ..model.micro import MicroModel
from .csvrec import fill_template
from .literate import parse_into

__all__ = ["parse", "objs_to_links_ds"]


def parse(objlist, vl_template, model=None, nosy=None):
    model = model if model is not None else MicroModel()
    for obj in objlist:
        if callable(vl_template):
            vl_text = vl_template(obj)
        elif hasattr(vl_template, "render"):
            vl_text = vl_template.render(_=obj, **obj)
        else:
            vl_text = fill_template(vl_template, obj)
        if nosy:
            nosy(vl_text)
        parse_into(vl_text, model)
    return model


def objs_to_links_ds(ds, vl_template):
    """Dataset of records -> canonical link rows via the template."""
    import pyarrow as pa

    from ..core.canon import LINK_SCHEMA

    def _batch(tbl: pa.Table) -> pa.Table:
        out = []
        for i in range(tbl.num_rows):
            obj = {c: tbl[c][i].as_py() for c in tbl.column_names}
            model = MicroModel()
            parse_into(
                vl_template(obj) if callable(vl_template)
                else fill_template(vl_template, obj),
                model,
            )
            out.extend(model.to_rows())
        if not out:
            return LINK_SCHEMA.empty_table()
        return pa.Table.from_pylist(out, schema=LINK_SCHEMA)

    return ds.map_batches(_batch, batch_format="pyarrow")
