"""JSON-LD binder: nested objects from origin-grouped links
(reference serial/jsonld.py:17-103 semantics)."""

from __future__ import annotations

from ..core import I, RDF_TYPE_REL, VTYPE_REL, relativize
from ..model import vutil

__all__ = ["bind"]

_BLANK_PREFIX = "__VERSABLANKNODE__"


def bind(models, context=None, ignore_oftypes=None, type_rel=None):
    """Build JSON-LD-ish nested objects: origin-grouped links become
    objects; IRI targets inline their object the first time and are
    id-refs after; ignored types are pruned; @id-only refs collapse."""
    if not isinstance(models, list):
        models = [models]
    context = context or {}
    ignore_oftypes = ignore_oftypes or []
    vocab = context.get("@vocab")
    type_rels = [type_rel] if type_rel else [RDF_TYPE_REL, VTYPE_REL]

    non_top_ids = set()
    obj_pool = {}
    used_objects = set()

    def _typ_of(m, origin):
        for tr in type_rels:
            t = vutil.simple_lookup(m, origin, tr)
            if t is not None:
                return t
        return None

    for m in models:
        for origin in vutil.all_origins(m):
            typ = _typ_of(m, origin)
            obj, referents = obj_pool.setdefault(origin, ({}, []))
            if vocab and typ:
                typ = relativize(typ, vocab) or typ
            if typ:
                obj["@type"] = str(typ)
            if not origin.startswith(_BLANK_PREFIX):
                obj["@id"] = str(origin)
            for o, r, t, a in m.match(origin):
                if r in type_rels:
                    continue
                if isinstance(t, I) and o != t:
                    if vocab:
                        t = relativize(t, vocab) or t
                    valobj, t_refs = obj_pool.setdefault(t, ({}, []))
                    if t in used_objects:
                        val = str(t)
                    else:
                        val = valobj
                        if not t.startswith(_BLANK_PREFIX) and "@id" not in val:
                            val["@id"] = str(t)
                        used_objects.add(t)
                        non_top_ids.add(t)
                    t_refs.append(o)
                else:
                    val = t
                if vocab:
                    r = relativize(r, vocab) or r
                r = str(r)
                if r in obj and isinstance(obj[r], list):
                    obj[r].append(val)
                elif r in obj:
                    obj[r] = [obj[r], val]
                else:
                    obj[r] = val

    # prune ignored types, dropping references to the pruned objects
    to_remove = []
    for oid, (obj, referents) in obj_pool.items():
        typ = obj.get("@type")
        if vocab and typ:
            typ = typ if ":" in typ else (vocab + typ)
        if typ in ignore_oftypes:
            to_remove.append(oid)
            for ref in referents:
                refobj, _ = obj_pool[ref]
                for k in list(refobj.keys()):
                    v = refobj[k]
                    if isinstance(v, list) and obj in v:
                        v.remove(obj)
                        if len(v) == 1:
                            refobj[k] = v[0]
                    elif v == obj:
                        del refobj[k]
    for k in to_remove:
        del obj_pool[k]

    # collapse @id-only object values
    for oid, (obj, referents) in obj_pool.items():
        for k, v in obj.items():
            if isinstance(v, dict) and len(v) == 1 and "@id" in v:
                obj[k] = v["@id"]

    top_objs = [obj for (k, (obj, refs)) in obj_pool.items() if k not in non_top_ids]
    top_objs = [
        obj for obj in top_objs if not (len(obj) == 1 and "@type" in obj)
    ]
    if context and context.get("@output", True):
        return {"@context": context, "@graph": top_objs}
    return top_objs
