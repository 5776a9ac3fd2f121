"""Model utility operators (doc-local variants).

Same semantics as the reference's versa.util
(/root/reference/tools/py/util.py) over a MicroModel. Each of these
also has a distributed counterpart over a links Dataset in
versa_ray.model.linkset — the doc-local forms run inside map_batches
tasks; the linkset forms are shuffles.
"""

from __future__ import annotations

from ..core import I, VLABEL_REL, VTYPE_REL, matches_uri_ref_syntax
from .micro import MicroModel


def versa_list_to_pylist(m, vlistid):
    """Targets of the Versa-list ``item`` rel under a list resource
    (util.py:21-22)."""
    from ..core import VERSA_BASEIRI

    return [link[2] for link in m.match(vlistid, I(VERSA_BASEIRI + "item"))]


def make_immutable(obj):
    """Recursive freeze: lists/sets/dicts become tuples (dicts as
    (key, value) pairs in insertion order) so arbitrary attr values
    can be set members / dict keys (util.py:307-322)."""
    if isinstance(obj, (list, set)):
        return tuple(make_immutable(e) for e in obj)
    if isinstance(obj, dict):
        return tuple((k, make_immutable(v)) for k, v in obj.items())
    return obj


def simple_lookup(m, orig, rel):
    for link in m.match(orig, rel):
        return link[2]
    return None


def simple_lookup_byvalue(m, rel, target):
    for link in m.match(None, rel, target):
        return link[0]
    return None


def lookup(m, orig, rel):
    for link in m.match(orig, rel):
        yield link[2]


def lookup_byvalue(m, rel, target):
    return [link[0] for link in m.match(None, rel, target)]


def all_origins(m, of_types=None, only_types=None):
    """Distinct origins, optionally filtered by resource type; '*'
    means "has any type" (util.py:56-75)."""
    seen = set()
    if not of_types:
        of_types = only_types
    if isinstance(of_types, str):
        of_types = {of_types}
    of_types = set(of_types) if of_types else set()
    if "*" in of_types:
        of_types = {"*"}
    for o, r, t, a in m.match():
        if o in seen:
            continue
        seen.add(o)
        if not of_types:
            yield o
            continue
        otypes = set(resourcetypes(m, o))
        if ("*" in of_types and otypes) or (of_types & otypes):
            yield o


def column(m, linkpart):
    assert linkpart in (0, 1, 2, 3)
    seen = set()
    for link in m.match():
        val = link[linkpart]
        if not isinstance(val, (str, I)):
            val = repr(val)
        if val not in seen:
            seen.add(val)
            yield link[linkpart]


def resourcetypes(m, rid):
    for o, r, t, a in m.match(rid, VTYPE_REL):
        yield t


def labels(m, rid):
    for o, r, t, a in m.match(rid, VLABEL_REL):
        yield t


def static_index(m, rel, setvals=False, include_attrs=True):
    """origin -> target(+attrs) mapping for one rel (util.py:107-141)."""
    index = {}
    for o, r, t, a in m.match(None, rel):
        val = (t, a) if include_attrs else t
        curr = index.get(o)
        if curr is None:
            index[o] = {val} if setvals else val
        elif setvals:
            curr.add(val)
        elif isinstance(curr, list):
            curr.append(val)
        else:
            index[o] = [curr, val]
    return index


def origin_view(m):
    index = {}
    for o, r, t, a in m.match():
        index.setdefault(o, []).append((r, t, a))
    return index


def replace_values(in_m, out_m, map_from=(), map_to=()):
    mapping = dict(zip(map_from, map_to))
    for o, r, t, a in in_m.match():
        out_m.add(mapping.get(o, o), r, t, a.copy())


def replace_entity_resource(model, oldres, newres):
    """Rewrite every appearance of oldres (origin/target/attr values)
    to newres (util.py:175-191)."""
    oldrids = set()
    adds = []
    for rid, (o, r, t, a) in model:
        if o == oldres or t == oldres or oldres in a.values():
            oldrids.add(rid)
            adds.append(
                (
                    newres if o == oldres else o,
                    r,
                    newres if t == oldres else t,
                    {k: (newres if v == oldres else v) for k, v in a.items()},
                )
            )
    for link in adds:
        model.add(*link)
    model.remove(oldrids)


def duplicate_statements(model, oldorigin, neworigin, rfilter=None):
    for o, r, t, a in list(model.match(oldorigin)):
        if rfilter is None or rfilter(o, r, t, a):
            model.add(I(neworigin), r, t, a)


def uniquify(model):
    """MicroModel.add already refuses dupes, so this is a no-op kept
    for API parity (util.py:209-223)."""
    return


def transitive_closure(m, orig, rel):
    """Closure over a transitive rel, depth-first, cycle-safe."""
    seen = set()
    stack = [orig]
    while stack:
        focus = stack.pop()
        for o, r, t, a in m.match(focus, rel):
            if t not in seen:
                seen.add(t)
                yield t
                stack.append(t)


def zoom_in(model, focus, depth=1, max_rels=0):
    """Subgraph from focus out to `depth` hops, optionally capped at
    max_rels copied links (util.py:226-253)."""
    zoomed = MicroModel()
    relcount = 0

    def _zoom(f, d):
        nonlocal relcount
        for o, r, t, a in model.match(f):
            relcount += 1
            if max_rels and relcount > max_rels:
                return False
            zoomed.add(o, r, t, a)
            if d and isinstance(t, str) and matches_uri_ref_syntax(t):
                if not _zoom(t, d - 1):
                    return False
        return True

    completed = _zoom(focus, depth)
    return zoomed, completed


def jsonload(model, fp):
    import json as _json

    for link in _json.load(fp):
        if len(link) == 2:
            sid, (s, p, o, a) = link
        elif len(link) == 4:
            (s, p, o, a) = link
            if a.get("@target-type") == "@iri-ref":
                o = I(o)
            a.pop("@target-type", None)
        else:
            continue
        model.add(s, p, o, a)


def jsondump(model, fp):
    import json as _json

    fp.write("[")
    fp.write(",\n".join(_json.dumps(list(link)) for _, link in model))
    fp.write("]")
