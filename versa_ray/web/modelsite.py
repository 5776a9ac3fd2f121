"""Static vocabulary-site builder.

Library + CLI equivalent of the reference's demo exec tool
``tools/exec/build_model_site`` (parse a Versa Literate vocabulary
model, render one HTML page per resource plus an index). The
reference renders Bootstrap-era templates with an ``@(\\w+)``
link-resolution pattern in description text; this port keeps the
same information architecture — per-resource pages with label,
description, types and property listings, ``@name`` references
resolved to intra-site links — as dependency-free semantic HTML with
deterministic (sorted) output.
"""

from __future__ import annotations

import html
import os
import re

from ..core import VLABEL_REL, VTYPE_REL

LINK_PAT = re.compile(r"@(\w+)")

_PAGE = """<!DOCTYPE html>
<html lang="en">
<head><meta charset="utf-8"><title>{title}</title></head>
<body>
<nav><a href="index.html">index</a></nav>
<h1>{title}</h1>
{body}
</body>
</html>
"""


def _slug(iri: str) -> str:
    tail = str(iri).rstrip("/").rsplit("/", 1)[-1].rsplit("#", 1)[-1]
    return re.sub(r"[^A-Za-z0-9_.-]", "_", tail) or "resource"


def _resolve_at_links(text: str, names: dict) -> str:
    """Replace ``@name`` references with links to that resource's page
    (the reference's LINK_PAT resolution); unknown names stay text."""

    def _sub(m):
        target = names.get(m.group(1))
        if target:
            return '<a href="%s.html">%s</a>' % (target, m.group(1))
        return m.group(0)

    # escape FIRST; @name matches only \\w so escaping never breaks it
    return LINK_PAT.sub(_sub, html.escape(text))


def build_site(model, out_dir: str, base: str | None = None) -> int:
    """Render the model as a static site; returns the page count."""
    os.makedirs(out_dir, exist_ok=True)
    label_rel = str(VLABEL_REL)
    type_rel = str(VTYPE_REL)

    resources: dict = {}
    for s, p, o, _a in model.match():
        if str(s).endswith("@docheader"):
            continue
        resources.setdefault(str(s), []).append((str(p), o))

    slugs = {iri: _slug(iri) for iri in resources}
    # de-collide deterministically; @name resolves to the FIRST
    # (sorted) resource bearing that base name — keyed off the
    # pre-collision slug, so a de-collided "foo-1" or a legitimately
    # hyphenated "see-also" never shadows another name
    seen: dict = {}
    by_name: dict = {}
    for iri in sorted(slugs):
        s = slugs[iri]
        if s in seen:
            seen[s] += 1
            slugs[iri] = f"{s}-{seen[s]}"
        else:
            seen[s] = 0
            by_name[s] = s

    for iri in sorted(resources):
        rows = sorted(resources[iri], key=lambda pv: (pv[0], str(pv[1])))
        labels = [str(v) for p, v in rows if p == label_rel]
        types = [str(v) for p, v in rows if p == type_rel]
        title = labels[0] if labels else _slug(iri)
        parts = ['<p><code>%s</code></p>' % html.escape(iri)]
        if types:
            parts.append(
                "<p>type: %s</p>"
                % ", ".join(html.escape(t) for t in sorted(types))
            )
        parts.append("<dl>")
        for p, v in rows:
            if p in (label_rel, type_rel):
                continue
            vtxt = (
                '<a href="%s.html">%s</a>' % (slugs[str(v)], html.escape(str(v)))
                if str(v) in slugs
                else _resolve_at_links(str(v), by_name)
            )
            parts.append(
                "<dt>%s</dt><dd>%s</dd>" % (html.escape(p), vtxt)
            )
        parts.append("</dl>")
        page = _PAGE.format(title=html.escape(title), body="\n".join(parts))
        with open(os.path.join(out_dir, slugs[iri] + ".html"), "w") as fp:
            fp.write(page)

    items = "\n".join(
        '<li><a href="%s.html">%s</a></li>' % (slugs[iri], html.escape(iri))
        for iri in sorted(resources)
    )
    with open(os.path.join(out_dir, "index.html"), "w") as fp:
        fp.write(
            _PAGE.format(
                title=html.escape(base or "Vocabulary"),
                body="<ul>\n%s\n</ul>" % items,
            )
        )
    return len(resources) + 1
