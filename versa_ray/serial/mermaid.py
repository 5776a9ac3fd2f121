"""Mermaid diagram writer.

Renders a model as a `graph TD` flowchart (same output dialect as the
reference's mermaid writer, serial/mermaid.py): resources are round
nodes, literal values square nodes, labeled resources get a tag icon,
long stems are middle-elided, and colliding display stems are
disambiguated with numeric suffixes.

Fresh implementation: a two-pass design — first assign display names
to every distinct origin/property/value, then emit edges — rather than
the reference's allocate-while-walking approach.
"""

from __future__ import annotations

import re
import sys
import unicodedata

from ..core import I
from ..model import vutil

__all__ = ["write", "write_string"]

MAX_STEM = 12
_NON_SLUG = re.compile(r"[^\w\-_]+")


def _slug(value: str) -> str:
    norm = unicodedata.normalize("NFKD", str(value)).strip().lower()
    return _NON_SLUG.sub("-", norm).strip("-")


def _elide(s: str) -> str:
    if len(s) < MAX_STEM:
        return s
    half = MAX_STEM // 2
    return s[:half] + "..." + s[-half:]


class _Namer:
    """Distinct display stem per object within one namespace."""

    def __init__(self):
        self.by_obj = {}
        self.taken = set()

    def stem(self, obj) -> tuple[str, str]:
        if obj in self.by_obj:
            return self.by_obj[obj]
        base = _elide(str(obj).rsplit("/", 1)[-1])
        n = 0
        while f"{base}-{n}" in self.taken:
            n += 1
        suffix = str(n) if n else ""
        display = base + ("-" + suffix if suffix else "")
        self.taken.add(f"{base}-{n}")
        self.by_obj[obj] = (display, _slug(base) + suffix)
        return self.by_obj[obj]


def _node(obj, namer: _Namer, label=None) -> str:
    display, node_id = namer.stem(obj)
    if label:
        return f"{node_id}(fa:fa-tag {_elide(label)})"
    if isinstance(obj, I):
        return f"{node_id}({display})"
    return f"{node_id}[{display}]"


def write(model, out=sys.stdout):
    resources, props, values = _Namer(), _Namer(), _Namer()
    out.write("graph TD\n")
    for origin in vutil.all_origins(model):
        o_label = next(vutil.labels(model, origin), None)
        o_node = _node(origin, resources, o_label)
        for _, rel, target, _a in model.match(origin):
            r_display, _ = props.stem(rel)
            if isinstance(target, I):
                t_label = next(vutil.labels(model, target), None)
                t_node = _node(target, resources, t_label)
            else:
                t_node = _node(target, values)
            out.write(f"    {o_node} -->|{r_display}| {t_node}\n")
        out.write("\n")


def write_string(model) -> str:
    import io

    buf = io.StringIO()
    write(model, buf)
    return buf.getvalue()
