"""Precision/recall gate for the KG pipeline.

The reference toolchain's own P/R comparison cannot execute in this
environment (its dependency stack is absent), so the ground truth is
computed INDEPENDENTLY of the pipeline: directly from the corpus
generator's parameters (which entities it placed on which page) and
the bit-exact fingerprint convention. The pipeline must reproduce the
expected (s, p, o) sets at P/R >= 0.95 — in practice exactly 1.0 —
both at the RDFa-extraction layer and after the full transform +
dedup.
"""

import pytest

from versa_ray.core import VLABEL_REL, VTYPE_REL, resource_id
from versa_ray.web import synth
from versa_ray.web.extract import extract_rdfa
from versa_ray.web.synth import make_page

N = 60
SCH = "https://schema.org/"
BF = "http://bibfra.me/vocab/lite/"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def _page_params(i):
    seed = 42
    a = synth._author(seed, i, N)
    p = synth._publisher(seed, i, N)
    return {
        "url": "%s%08d" % (synth.BASE_URL, i),
        "a_iri": "%s%05d" % (synth.AUTHOR_BASE, a),
        "p_iri": "%s%05d" % (synth.PUB_BASE, p),
        "aname": synth.author_name(seed, a),
        "pname": synth.publisher_name(seed, p),
        "title": synth._words(seed, "title", i, 4).title(),
        "isbn": "97%011d" % (synth._h(seed, "isbn", i) % 10**11),
        "birth": "19%02d-%02d-%02d" % (
            synth._h(seed, "by", a) % 80,
            1 + synth._h(seed, "bm", a) % 12,
            1 + synth._h(seed, "bd", a) % 28,
        ),
        "date_pub": "20%02d-%02d-%02d" % (
            synth._h(seed, "py", i) % 25,
            1 + synth._h(seed, "pm", i) % 12,
            1 + synth._h(seed, "pd", i) % 28,
        ),
        "lang": synth._LANGS[synth._h(seed, "lang", i) % len(synth._LANGS)],
    }


def expected_rdfa_triples(i):
    p = _page_params(i)
    return {
        (p["url"], RDF_TYPE, SCH + "Book"),
        (p["url"], SCH + "name", p["title"]),
        (p["url"], SCH + "isbn", p["isbn"]),
        (p["url"], SCH + "datePublished", p["date_pub"]),
        (p["url"], SCH + "inLanguage", p["lang"]),
        (p["url"], SCH + "author", p["a_iri"]),
        (p["a_iri"], RDF_TYPE, SCH + "Person"),
        (p["a_iri"], SCH + "name", p["aname"]),
        (p["a_iri"], SCH + "birthDate", p["birth"]),
        (p["url"], SCH + "publisher", p["p_iri"]),
        (p["p_iri"], RDF_TYPE, SCH + "Organization"),
        (p["p_iri"], SCH + "name", p["pname"]),
    }


def expected_kg_triples(i):
    """Ground-truth post-transform triples, computed from the
    fingerprint convention — NOT via the pipeline code path."""
    p = _page_params(i)
    inst = resource_id(BF + "Instance", [(BF + "isbn", p["isbn"])])
    pers = resource_id(
        BF + "Person",
        [(BF + "name", p["aname"]), (BF + "birthDate", p["birth"])],
    )
    org = resource_id(BF + "Organization", [(BF + "name", p["pname"])])
    return {
        (inst, str(VTYPE_REL), BF + "Instance"),
        (inst, BF + "name", p["title"]),
        (inst, BF + "isbn", p["isbn"]),
        (inst, BF + "date", p["date_pub"]),
        (inst, BF + "language", p["lang"]),
        (inst, BF + "creator", pers),
        (inst, BF + "publisher", org),
        (inst, str(VLABEL_REL), p["title"]),
        (pers, str(VTYPE_REL), BF + "Person"),
        (pers, BF + "name", p["aname"]),
        (pers, BF + "birthDate", p["birth"]),
        (pers, str(VLABEL_REL), p["aname"]),
        (org, str(VTYPE_REL), BF + "Organization"),
        (org, BF + "name", p["pname"]),
        (org, str(VLABEL_REL), p["pname"]),
    }


def _pr(got: set, want: set):
    tp = len(got & want)
    precision = tp / len(got) if got else 0.0
    recall = tp / len(want) if want else 0.0
    return precision, recall


def test_rdfa_extraction_pr():
    got, want = set(), set()
    for i in range(N):
        row = make_page(42, i, N)
        got |= {(str(s), str(r), str(t)) for (s, r, t, _) in extract_rdfa(row["html"], row["url"])}
        want |= expected_rdfa_triples(i)
    precision, recall = _pr(got, want)
    assert precision >= 0.95 and recall >= 0.95, (precision, recall)
    assert precision == 1.0 and recall == 1.0


def test_full_kg_pr(ray_session):
    import ray.data as rd

    from versa_ray.model.linkset import distinct_links
    from versa_ray.web.kgpipeline import extract_links
    from versa_ray.web.synth import page_batch

    pages = rd.from_arrow(page_batch(42, 0, N, N))
    final = distinct_links(extract_links(pages, check_text=True)).to_pandas()
    got = {
        (row.origin, row.rel, row.target)
        for row in final.itertuples()
        if row.target is not None
    }
    want = set()
    for i in range(N):
        want |= expected_kg_triples(i)
    precision, recall = _pr(got, want)
    assert precision >= 0.95 and recall >= 0.95, (precision, recall)
    assert precision == 1.0 and recall == 1.0


def test_strict_rdfa_mode():
    """strict=True enables the W3C behaviors the lite walker
    simplifies; default mode keeps the reference walker's traced
    semantics on the same inputs (hand-derived differential cases —
    the reference walker's deps aren't installable here, so its
    behavior is traced from rdfalite.py:78-172 and asserted as the
    lite expectation)."""
    from versa_ray.web.extract import extract_rdfa

    BASE = "http://ex.org/doc"
    V = "http://s.org/"

    # 1) property + resource chaining: W3C chains (parent, prop, res);
    #    the lite walker overwrites the subject first -> self-triple
    html = (
        f'<div vocab="{V}" resource="#r">'
        f'<span property="knows" resource="#x">x</span></div>'
    )
    strict = {(s, p, o) for (s, p, o, _i) in extract_rdfa(html, BASE, strict=True)}
    lite = {(s, p, o) for (s, p, o, _i) in extract_rdfa(html, BASE)}
    assert (f"{BASE}#r", V + "knows", f"{BASE}#x") in strict
    assert (f"{BASE}#x", V + "knows", f"{BASE}#x") in lite  # reference quirk

    # 2) about sets the subject; lite ignores it (subject stays doc)
    html = f'<div vocab="{V}" about="#me" property="name" content="Uche"></div>'
    strict = {(s, p, o) for (s, p, o, _i) in extract_rdfa(html, BASE, strict=True)}
    lite = {(s, p, o) for (s, p, o, _i) in extract_rdfa(html, BASE)}
    assert strict == {(f"{BASE}#me", V + "name", "Uche")}
    assert lite == {(BASE, V + "name", "Uche")}

    # 3) CURIE property with prefix but NO vocab: works in strict only
    html = (
        '<div prefix="dct: http://purl.org/dc/terms/">'
        '<span property="dct:title">T</span></div>'
    )
    strict = extract_rdfa(html, BASE, strict=True)
    assert [(s, p, o) for (s, p, o, _i) in strict] == [
        (BASE, "http://purl.org/dc/terms/title", "T")
    ]
    assert extract_rdfa(html, BASE) == []

    # 4) typeof with about types the about subject, not a bnode
    html = f'<div vocab="{V}" about="#me" typeof="Person"></div>'
    strict = extract_rdfa(html, BASE, strict=True)
    assert [(s, p, o) for (s, p, o, _i) in strict] == [
        (f"{BASE}#me", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
         V + "Person")
    ]
    lite = extract_rdfa(html, BASE)
    assert len(lite) == 1 and lite[0][0].startswith("_:b")  # bnode in lite

    # 5) descendants inherit the about subject in strict mode
    html = (
        f'<div vocab="{V}" about="#me">'
        f'<span property="name">N</span></div>'
    )
    strict = extract_rdfa(html, BASE, strict=True)
    assert [(s, p, o) for (s, p, o, _i) in strict] == [(f"{BASE}#me", V + "name", "N")]

    # 6) CURIE typeof resolves through prefixes in strict mode
    html = (
        f'<div vocab="{V}" prefix="foo: http://foo.org/" '
        f'resource="#z" typeof="foo:Bar"></div>'
    )
    strict = extract_rdfa(html, BASE, strict=True)
    assert [(s, p, o) for (s, p, o, _i) in strict] == [
        (f"{BASE}#z", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
         "http://foo.org/Bar")
    ]


def test_strict_rdfa_about_resource_typeof():
    """RDFa 1.1: @about wins as the typed resource when @resource
    co-occurs; @resource is the chained object."""
    from versa_ray.web.extract import extract_rdfa

    BASE = "http://ex.org/doc"
    V = "http://s.org/"
    html = (
        f'<div vocab="{V}" about="#s" resource="#r" typeof="Person" '
        f'property="knows"></div>'
    )
    strict = {(s, p, o) for (s, p, o, _i) in extract_rdfa(html, BASE, strict=True)}
    assert (f"{BASE}#s", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
            V + "Person") in strict
    assert (f"{BASE}#s", V + "knows", f"{BASE}#r") in strict
