"""Mermaid diagram writer (reference serial/mermaid.py:28-96
semantics; own slugify — no external dependency)."""

from __future__ import annotations

import re
import sys
import unicodedata

from ..core import I
from ..model import vutil

__all__ = ["write", "write_string"]

TAG_MAX_STEM_LENGTH = 12
_SLUG_RE = re.compile(r"[^\w\-_]+")


def _slugify(value: str) -> str:
    value = unicodedata.normalize("NFKD", str(value)).strip().lower()
    return _SLUG_RE.sub("-", value).strip("-")


def _lookup_tag(obj, tag_map, label, is_node=True):
    stem = tag_map.get(obj)
    disambig = ""
    if stem is None:
        existing = set(tag_map.values())
        stem = str(obj).split("/")[-1]
        if len(stem) >= TAG_MAX_STEM_LENGTH:
            sp = TAG_MAX_STEM_LENGTH // 2
            stem = stem[:sp] + "..." + stem[-sp:]
        n = 0
        while f"{stem}-{n}" in existing:
            n += 1
        disambig = "" if not n else str(n)
        tag_map[obj] = f'{stem}{"-" if disambig else ""}{disambig}'
    asc = _slugify(stem)
    node_id = f"{asc}{disambig}"
    if label:
        if len(label) >= TAG_MAX_STEM_LENGTH:
            sp = TAG_MAX_STEM_LENGTH // 2
            label = label[:sp] + "..." + label[-sp:]
        return f"{node_id}(fa:fa-tag {label})"
    label = f'{stem}{"-" if disambig else ""}{disambig}'
    if is_node:
        return f"{node_id}({label})" if isinstance(obj, I) else f"{node_id}[{label}]"
    return label


def write(model, out=sys.stdout):
    resource_tags, property_tags, value_tags = {}, {}, {}
    out.write("graph TD\n")
    for o in vutil.all_origins(model):
        o_label = next(vutil.labels(model, o), None)
        o_tag = _lookup_tag(o, resource_tags, o_label)
        for _, r, t, a in model.match(o):
            r_tag = _lookup_tag(r, property_tags, None, is_node=False)
            if isinstance(t, I):
                t_label = next(vutil.labels(model, t), None)
                t_tag = _lookup_tag(t, resource_tags, t_label)
            else:
                t_tag = _lookup_tag(t, value_tags, None)
            out.write(f"    {o_tag} -->|{r_tag}| {t_tag}\n")
        out.write("\n")


def write_string(model) -> str:
    import io

    buf = io.StringIO()
    write(model, buf)
    return buf.getvalue()
