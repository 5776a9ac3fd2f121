"""MicroModel: the doc-local link model.

Each web page / record / literate document parses into its own tiny
model, and every per-document pipeline rule runs against it inside one
``map_batches`` task — this mirrors the reference's model-per-row unit
of work (serial/csv.py:44-106) and is the engine's unit of
parallelism. Cross-document state never lives here; it lives in the
groupby shuffles.

Semantics match the reference in-memory driver
(/root/reference/tools/py/driver/memory.py): duplicate quads are
refused on add, match filters by exact origin/rel/target and
attr-subset equality, iteration preserves insertion order, and
equality is via the canonical sorted representation. The physical
design is different: adds are O(1) via a canonical-key set and matches
use an origin index instead of the reference's O(n) list scans
(memory.py:96,180) — these models are small but are created millions
of times, so constant factors matter.
"""

from __future__ import annotations

from ..core import I
from ..core.canon import attrs_to_json, canonical_json, link_to_row


class MicroModel:
    __slots__ = ("_links", "_dup_keys", "_by_origin", "_dirty")

    def __init__(self, links=None):
        self._links = []
        self._dup_keys = set()
        self._by_origin = {}
        self._dirty = False
        if links:
            self.add_many(links)

    # -- mutation ---------------------------------------------------------

    def add(self, origin, rel, target, attrs=None, index=None):
        if not origin:
            raise ValueError("Relationship origin cannot be null")
        if not rel:
            raise ValueError("Relationship ID cannot be null")
        attrs = dict(attrs or {})
        key = (str(origin), str(rel), str(target), attrs_to_json(attrs))
        self._ensure()
        if key in self._dup_keys:
            return None
        item = (origin, rel, target, attrs)
        if index is not None:
            self._links.insert(index, item)
            rid = index
            self._dirty = True  # origin index positions shifted
            self._dup_keys.add(key)
        else:
            rid = len(self._links)
            self._links.append(item)
            self._dup_keys.add(key)
            self._by_origin.setdefault(str(origin), []).append(rid)
        return rid

    def add_many(self, rels):
        for curr in rels:
            attrs = {}
            if len(curr) == 2:  # (index, link) pairs from __iter__
                origin, rel, target, attrs = curr[1]
            elif len(curr) == 3:
                origin, rel, target = curr
            elif len(curr) == 4:
                origin, rel, target, attrs = curr
            else:
                raise ValueError(curr)
            self.add(origin, rel, target, attrs)

    def update(self, other):
        for _, link in other:
            self.add(*link)

    def remove(self, index):
        ind = set(index) if hasattr(index, "__iter__") else {index}
        self._links = [l for i, l in enumerate(self._links) if i not in ind]
        self._rebuild()

    def copy(self, contents=True):
        cp = MicroModel()
        if contents:
            cp.add_many(self._links)
        return cp

    # -- indexes ----------------------------------------------------------

    def _rebuild(self):
        self._dup_keys = {
            (str(o), str(r), str(t), attrs_to_json(a)) for (o, r, t, a) in self._links
        }
        self._by_origin = {}
        for i, (o, _, _, _) in enumerate(self._links):
            self._by_origin.setdefault(str(o), []).append(i)
        self._dirty = False

    def _ensure(self):
        if self._dirty:
            self._rebuild()

    # -- reads ------------------------------------------------------------

    def __len__(self):
        return len(self._links)

    def size(self):
        return len(self._links)

    def __iter__(self):
        for index, (o, r, t, a) in enumerate(self._links):
            yield index, (o, r, t, a.copy())

    def __getitem__(self, i):
        o, r, t, a = self._links[i]
        return (o, r, t, a.copy())

    def match(self, origin=None, rel=None, target=None, attrs=None, include_ids=False):
        """Pattern scan; falsy components are wildcards, attrs is a
        subset-equality constraint (memory.py:85-116 semantics)."""
        self._ensure()
        if origin:
            indices = self._by_origin.get(str(origin), ())
        else:
            indices = range(len(self._links))
        for index in indices:
            o, r, t, a = self._links[index]
            if rel and r != rel:
                continue
            if target and t != target:
                continue
            if attrs and any(a.get(k) != v for k, v in attrs.items()):
                continue
            out = (o, r, t, a.copy())
            yield (index, out) if include_ids else out

    def multimatch(self, origin=None, rel=None, target=None, attrs=None, include_ids=False):
        """Like match but each component may be a set of candidates."""
        as_set = lambda v: v if v is None or isinstance(v, set) else {v}
        origin, rel, target = as_set(origin), as_set(rel), as_set(target)
        for index, (o, r, t, a) in enumerate(self._links):
            if origin and o not in origin:
                continue
            if rel and r not in rel:
                continue
            if target and t not in target:
                continue
            if attrs and any(a.get(k) != v for k, v in attrs.items()):
                continue
            out = (o, r, t, a.copy())
            yield (index, out) if include_ids else out

    # -- canonical form ---------------------------------------------------

    def to_rows(self):
        """Arrow-ready canonical row dicts (see core.canon.LINK_SCHEMA)."""
        return [link_to_row(o, r, t, a) for (o, r, t, a) in self._links]

    def __repr__(self):
        return canonical_json(self.to_rows())

    def __eq__(self, other):
        return repr(self) == repr(other)

    def __ne__(self, other):
        return not self.__eq__(other)

    __hash__ = None


def newmodel(name=None, baseiri=None):
    """Convenience factory mirroring the reference API."""
    return MicroModel()
