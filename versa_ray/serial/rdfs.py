"""RDFS export: map Versa vocab rels into RDF/RDFS triples
(reference serial/rdfs.py:30-100 semantics, emitted as links into a
MicroModel instead of an rdflib Graph — rdflib is not a dependency of
this engine; serialize the result with serial.ntriples)."""

from __future__ import annotations

from ..core import I, RDF_NS, RDFS_NS, RDF_TYPE_REL, VERSA_BASEIRI, VTYPE_REL, absolutize
from ..model.micro import MicroModel

__all__ = ["to_rdfs_model"]

RESOURCE_MAPPING = {
    I(VERSA_BASEIRI + "Resource"): I(RDFS_NS + "Class"),
    I(VERSA_BASEIRI + "Property"): I(RDF_NS + "Property"),
    I(VERSA_BASEIRI + "description"): I(RDFS_NS + "comment"),
    I(VERSA_BASEIRI + "label"): I(RDFS_NS + "label"),
}


def to_rdfs_model(model, base=None, rdfsonly=False):
    out = MicroModel()
    for s, p, o, a in model.match():
        if s == (base or "") + "@docheader":
            continue
        p = RESOURCE_MAPPING.get(p, p)
        o = RESOURCE_MAPPING.get(o, o)
        if p == VERSA_BASEIRI + "refines":
            tlinks = list(model.match(s, VTYPE_REL))
            if tlinks:
                if tlinks[0][2] == VERSA_BASEIRI + "Resource":
                    p = I(RDFS_NS + "subClassOf")
                elif tlinks[0][2] == VERSA_BASEIRI + "Property":
                    p = I(RDFS_NS + "subPropertyOf")
        if p == VERSA_BASEIRI + "properties":
            suri = I(absolutize(s, base)) if base else s
            out.add(I(o), I(RDFS_NS + "domain"), I(suri))
            continue
        if p == VERSA_BASEIRI + "value":
            if o not in ("Literal", "IRI"):
                ouri = I(absolutize(o, base)) if base else o
                out.add(I(s), I(RDFS_NS + "range"), I(ouri))
                continue
        p = RDF_TYPE_REL if p == VTYPE_REL else p
        if not rdfsonly or p.startswith(RDF_NS) or p.startswith(RDFS_NS):
            out.add(s, p, o, a)
    return out
