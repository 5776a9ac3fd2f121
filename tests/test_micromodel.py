"""MicroModel conformance — mirrors the reference driver suite
(/root/reference/test/py/test_memory.py)."""

from versa_ray.model import MicroModel
from versa_ray.model import vutil


RELS_1 = [
    ("http://copia.ogbuji.net", "http://purl.org/dc/elements/1.1/creator", "Uche Ogbuji", {"@context": "http://copia.ogbuji.net#_metadata"}),
    ("http://copia.ogbuji.net", "http://purl.org/dc/elements/1.1/title", "Copia", {"@context": "http://copia.ogbuji.net#_metadata", "@lang": "en"}),
    ("http://uche.ogbuji.net", "http://purl.org/dc/elements/1.1/creator", "Uche Ogbuji", {"@context": "http://uche.ogbuji.net#_metadata"}),
    ("http://uche.ogbuji.net", "http://purl.org/dc/elements/1.1/title", "Uche's home", {"@context": "http://uche.ogbuji.net#_metadata", "@lang": "en"}),
    ("http://uche.ogbuji.net", "http://purl.org/dc/elements/1.1/title", "Ulo Uche", {"@context": "http://uche.ogbuji.net#_metadata", "@lang": "ig"}),
]


def test_match_attr_subset():
    model = MicroModel()
    for l in RELS_1:
        model.add(*l)
    results = tuple(model.match(origin="http://uche.ogbuji.net", attrs={"@lang": "ig"}))
    expected = (
        (
            "http://uche.ogbuji.net",
            "http://purl.org/dc/elements/1.1/title",
            "Ulo Uche",
            {"@context": "http://uche.ogbuji.net#_metadata", "@lang": "ig"},
        ),
    )
    assert results == expected


def test_dup_refusal():
    model = MicroModel()
    model.add("s1", "p1", "t1", {"a": "1"})
    model.add("s1", "p1", "t1", {"a": "1"})
    assert len(model) == 1
    model.add("s1", "p1", "t1", {"a": "2"})
    assert len(model) == 2


def test_ordering_insertion():
    model = MicroModel()
    model.add("s1", "p1", "lit1", {})
    model.add("s1", "p2", "lit2", {})
    model.add("s1", "p0", "lit0", {}, index=1)
    model.add("s2", "p3", "lit3", {})
    order = [link[1] for _, link in model]
    assert order == ["p1", "p0", "p2", "p3"]


def test_removal():
    model = MicroModel()
    model.add("s1", "p0", "lit0", {})
    model.add("s1", "p1", "lit1", {})
    model.add("s1", "p2", "lit2", {})
    model.add("s2", "p3", "lit3", {})
    model.remove([3, 0])
    assert [link[2] for _, link in model] == ["lit1", "lit2"]
    assert model.size() == 2
    model.remove(0)
    assert [link[2] for _, link in model] == ["lit2"]
    assert model.size() == 1


def test_index_return():
    model = MicroModel()
    r1 = model.add("s1", "p0", "lit0", {})
    r2 = model.add("s1", "p1", "lit1", {})
    r3 = model.add("s1", "p2", "lit2", {})
    assert model[r1][0] == "s1"
    assert model[r2][1] == "p1"
    assert model[r3][2] == "lit2"


def test_copy_equality():
    model = MicroModel()
    model.add("s1", "p0", "lit0", {})
    model.add("s1", "p1", "lit1", {})
    model2 = model.copy()
    assert model == model2
    model3 = model.copy(contents=False)
    assert model3.size() == 0


def test_multimatch_sets():
    model = MicroModel()
    for l in RELS_1:
        model.add(*l)
    res = list(model.multimatch(rel={"http://purl.org/dc/elements/1.1/creator"}))
    assert len(res) == 2


def test_utils():
    model = MicroModel()
    for l in RELS_1:
        model.add(*l)
    assert list(vutil.all_origins(model)) == [
        "http://copia.ogbuji.net",
        "http://uche.ogbuji.net",
    ]
    assert vutil.simple_lookup(model, "http://copia.ogbuji.net", "http://purl.org/dc/elements/1.1/title") == "Copia"
    assert len(list(vutil.column(model, 1))) == 2
    idx = vutil.static_index(model, "http://purl.org/dc/elements/1.1/title", include_attrs=False)
    assert idx["http://uche.ogbuji.net"] == ["Uche's home", "Ulo Uche"]


def test_zoom_and_closure():
    m = MicroModel()
    m.add("http://e/a", "http://e/next", "http://e/b")
    m.add("http://e/b", "http://e/next", "http://e/c")
    m.add("http://e/c", "http://e/next", "http://e/a")  # cycle
    assert set(vutil.transitive_closure(m, "http://e/a", "http://e/next")) == {
        "http://e/b",
        "http://e/c",
        "http://e/a",
    }
    zoomed, completed = vutil.zoom_in(m, "http://e/a", depth=1)
    assert completed and zoomed.size() == 2


def test_versa_list_and_make_immutable():
    """util.py:21-22 list extraction and :307-322 recursive freeze."""
    from versa_ray.core import I, VERSA_BASEIRI
    from versa_ray.model.micro import MicroModel
    from versa_ray.model.vutil import make_immutable, versa_list_to_pylist

    m = MicroModel()
    lst = I("http://e/list1")
    m.add(lst, I(VERSA_BASEIRI + "item"), "a")
    m.add(lst, I(VERSA_BASEIRI + "item"), "b")
    m.add(I("http://e/other"), I(VERSA_BASEIRI + "item"), "c")
    assert sorted(versa_list_to_pylist(m, lst)) == ["a", "b"]

    froz = make_immutable({"k": [1, {2, 3}], "n": {"x": "y"}})
    assert isinstance(froz, tuple)
    hash(froz)  # deeply hashable
    assert froz[0][0] == "k" and froz[0][1][0] == 1
    assert make_immutable("s") == "s" and make_immutable(7) == 7
