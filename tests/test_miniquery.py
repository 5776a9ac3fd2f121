"""Mini-query conformance — binding sets of the reference suite
(/root/reference/test/py/test_miniquery.py:10-24), plus Dataset-backed
evaluation equivalence."""

from versa_ray.model import MicroModel
from versa_ray.query import evaluate

DC = "http://purl.org/dc/elements/1.1/"
H5 = "http://www.w3.org/TR/html5/"
H5L = "http://www.w3.org/TR/html5/link-type/"

RELS_1 = [
    ("http://uche.ogbuji.net/ndewo/", H5 + "title", "Ndewo, Colorado", {"@lang": "en"}),
    ("http://uche.ogbuji.net/ndewo/", H5L + "author", "http://uche.ogbuji.net/", {"link/description": "Uche Ogbuji"}),
    ("http://uche.ogbuji.net/ndewo/", H5L + "see-also", "https://www.goodreads.com/book/show/18714145-ndewo-colorado", {"@label": "Goodreads"}),
    ("http://uche.ogbuji.net/", H5L + "see-also", "http://uche.ogbuji.net/ndewo/", {}),
]

VARS = {"DC": DC, "H5": H5, "H5L": H5L}


def _model():
    m = MicroModel()
    for l in RELS_1:
        m.add(*l)
    return m


def test_reference_binding_sets():
    m = _model()
    result = evaluate("?($a, H5 'title', *) and ?($b, H5L 'see-also', $a)", m, VARS)
    assert result == {
        "a": {"http://uche.ogbuji.net/ndewo/"},
        "b": {"http://uche.ogbuji.net/"},
    }
    result = evaluate("?($a, H5L 'see-also', *)", m, VARS)
    assert result == {
        "a": {"http://uche.ogbuji.net/", "http://uche.ogbuji.net/ndewo/"}
    }
    result = evaluate("?($a, H5 'title', *)", m, VARS)
    assert result == {"a": {"http://uche.ogbuji.net/ndewo/"}}


def test_or_union():
    m = _model()
    result = evaluate("?($a, H5 'title', *) or ?($a, H5L 'see-also', *)", m, VARS)
    assert result == {
        "a": {"http://uche.ogbuji.net/", "http://uche.ogbuji.net/ndewo/"}
    }


def test_dataset_backed_evaluation(ray_session):
    from versa_ray.model.linkset import from_links

    ds = from_links(RELS_1)
    result = evaluate("?($a, H5 'title', *) and ?($b, H5L 'see-also', $a)", ds, VARS)
    assert result == {
        "a": {"http://uche.ogbuji.net/ndewo/"},
        "b": {"http://uche.ogbuji.net/"},
    }


def test_miniquery_dataset_or_and_parens(ray_session):
    """or / parenthesized conjunction over a Dataset linkset binds the
    same sets as the MicroModel path."""
    from versa_ray.model import linkset
    from versa_ray.model.micro import MicroModel
    from versa_ray.query import evaluate

    links = [
        ("urn:q:1", "urn:q:type", "urn:q:A"),
        ("urn:q:2", "urn:q:type", "urn:q:B"),
        ("urn:q:3", "urn:q:type", "urn:q:A"),
        ("urn:q:1", "urn:q:tag", "hot"),
        ("urn:q:2", "urn:q:tag", "hot"),
    ]
    q = "(?($x, T, 'urn:q:A') or ?($x, T, 'urn:q:B')) and ?($x, G, 'hot')"
    consts = {"T": "urn:q:type", "G": "urn:q:tag"}

    m = MicroModel()
    for o, r, t in links:
        m.add(o, r, t)
    want = evaluate(q, m, consts)

    ds = linkset.from_links(links)
    got = evaluate(q, ds, consts)
    assert {k: set(v) for k, v in got.items()} == \
        {k: set(v) for k, v in want.items()}
    assert got["x"] == {"urn:q:1", "urn:q:2"}


# ---------------------------------------------------------------------------
# FULL query language (query/full.py) — the surface the reference left
# unfinished (query/parser.py + ast.py), implemented with working
# semantics.


def _vocab_model():
    from versa_ray.core import I
    from versa_ray.model.micro import MicroModel

    m = MicroModel()
    m.add(I("http://e/a"), I("http://v/type"), I("http://v/T"))
    m.add(I("http://e/b"), I("http://v/type"), I("http://v/T"))
    m.add(I("http://e/c"), I("http://v/type"), I("http://v/U"))
    m.add(I("http://e/a"), I("http://v/flag"), "yes")
    m.add(I("http://e/b"), I("http://v/name"), "B")
    return m


V = {"V": "http://v/"}


def test_fullquery_negation_and_precedence():
    from versa_ray.query import execute

    m = _vocab_model()
    r = execute(m, "?($x, V 'type', 'http://v/T') and not ?($x, V 'flag', 'yes')", V)
    assert r["x"] == {"http://e/b"}
    # or binds loosest: (a and b) or c
    r = execute(
        m,
        "?($x, V 'type', 'http://v/T') and ?($x, V 'flag', 'yes') "
        "or ?($x, V 'type', 'http://v/U')",
        V,
    )
    assert r["x"] == {"http://e/a", "http://e/c"}
    # grouped negation over a disjunction
    r = execute(
        m,
        "?($x, V 'type', *) and not "
        "(?($x, V 'flag', 'yes') or ?($x, V 'name', 'B'))",
        V,
    )
    assert r["x"] == {"http://e/c"}


def test_fullquery_funccalls():
    from versa_ray.query import execute

    m = _vocab_model()
    r = execute(m, "?($x, concat(V, 'type'), iri(V, 'U'))", V)
    assert r["x"] == {"http://e/c"}
    # nested calls + case functions compose
    r = execute(m, "?($x, lower(concat(V, 'TYPE')), 'http://v/U')", V)
    assert r["x"] == {"http://e/c"}


def test_fullquery_unsafe_negation_raises():
    import pytest

    from versa_ray.query import execute

    m = _vocab_model()
    with pytest.raises(ValueError, match="unsafe negation"):
        execute(m, "not ?($x, V 'type', *)", V)
    with pytest.raises(ValueError, match="unsafe negation"):
        execute(
            m,
            "?($x, V 'type', 'http://v/T') and not ?($y, V 'flag', 'yes')",
            V,
        )


def test_fullquery_over_dataset(ray_session):
    """The same full-query evaluates against a distributed links
    Dataset (each ?() a vectorized match; negation subtracts binding
    sets driver-side)."""
    from versa_ray.model.linkset import from_model
    from versa_ray.query import execute

    ds = from_model(_vocab_model())
    r = execute(
        ds, "?($x, V 'type', 'http://v/T') and not ?($x, V 'flag', 'yes')", V
    )
    assert r["x"] == {"http://e/b"}


def test_conjunction_empty_left_binding_is_not_wildcard():
    """A variable whose positive conjunct matched NOTHING must
    constrain later conjuncts to nothing — an empty binding set is a
    real (empty) constraint, not 'unbound'."""
    from versa_ray.query import evaluate, execute

    m = _vocab_model()
    # no links with rel http://v/nope → $x binds to the empty set;
    # the second conjunct must then bind $y to nothing
    q = "?($x, V 'nope', 'zzz') and ?($x, V 'type', $y)"
    for run in (evaluate, lambda qq, mm, vv: execute(mm, qq, vv)):
        r = run(q, m, V)
        assert r["x"] == set()
        assert r["y"] == set()


def test_conjunction_empty_left_binding_dataset(ray_session):
    from versa_ray.model.linkset import from_model
    from versa_ray.query import evaluate

    ds = from_model(_vocab_model())
    r = evaluate("?($x, V 'nope', 'zzz') and ?($x, V 'type', $y)", ds, V)
    assert r["x"] == set() and r["y"] == set()


# ---------------------------------------------------------------------------
# Dataset-backed binding sets (DSBindings): above ds_threshold the
# binding sets stay Datasets and thread conjunction/disjunction/safe-
# negation as distributed semi/anti joins. Equality vs the driver-set
# path is the contract (VERDICT r4 item 1).


def _large_links(n=400):
    links = []
    for i in range(n):
        e = f"urn:big:e{i}"
        links.append((e, "urn:big:type", "urn:big:T" if i % 3 else "urn:big:U"))
        links.append((e, "urn:big:grp", f"urn:big:g{i % 5}"))
        if i % 2:
            links.append((e, "urn:big:flag", "hot"))
    return links


_BIG_VARS = {"T": "urn:big:type", "G": "urn:big:grp", "F": "urn:big:flag"}

_BIG_QUERIES = [
    "?($x, T, 'urn:big:T') and ?($x, F, 'hot')",
    "?($x, T, 'urn:big:T') or ?($x, T, 'urn:big:U')",
    "?($x, T, 'urn:big:T') and (?($x, G, 'urn:big:g1') or ?($x, G, 'urn:big:g2'))",
]


def test_ds_bindings_equal_driver_sets(ray_session):
    from versa_ray.model import linkset
    from versa_ray.query import evaluate
    from versa_ray.query.mini import DSBindings

    ds = linkset.from_links(_large_links()).materialize()
    for q in _BIG_QUERIES:
        want = evaluate(q, ds, _BIG_VARS)  # default threshold: driver sets
        got_ds = evaluate(q, ds, _BIG_VARS, ds_threshold=10, as_datasets=True)
        assert isinstance(got_ds["x"], DSBindings), q
        got = {k: v.to_set() for k, v in got_ds.items()}
        assert got == want, q
        # and the auto-collapsing form agrees too
        assert evaluate(q, ds, _BIG_VARS, ds_threshold=10) == want, q


def test_ds_bindings_fullquery_negation(ray_session):
    from versa_ray.model import linkset
    from versa_ray.query import execute
    from versa_ray.query.mini import DSBindings

    ds = linkset.from_links(_large_links()).materialize()
    q = "?($x, T, 'urn:big:T') and not ?($x, F, 'hot')"
    want = execute(ds, q, _BIG_VARS)
    got_ds = execute(ds, q, _BIG_VARS, ds_threshold=10, as_datasets=True)
    assert isinstance(got_ds["x"], DSBindings)
    assert {k: v.to_set() for k, v in got_ds.items()} == want
    assert want["x"] == {f"urn:big:e{i}" for i in range(400) if i % 3 and not i % 2}


def test_ds_bindings_mixed_small_large(ray_session):
    """One conjunct's bindings stay below the threshold (driver set),
    the other's above (Dataset): the set-vs-DS intersection and
    subtraction paths must agree with the all-driver evaluation."""
    from versa_ray.model import linkset
    from versa_ray.query import execute
    from versa_ray.query.mini import evaluate

    links = _large_links() + [(f"urn:big:e{i}", "urn:big:rare", "y")
                              for i in range(0, 40, 2)]
    ds = linkset.from_links(links).materialize()
    vars_ = dict(_BIG_VARS, R="urn:big:rare")
    q = "?($x, T, 'urn:big:T') and ?($x, R, 'y')"
    want = evaluate(q, ds, vars_)
    assert evaluate(q, ds, vars_, ds_threshold=30) == want
    qn = "?($x, T, 'urn:big:T') and not ?($x, R, 'y')"
    assert execute(ds, qn, vars_, ds_threshold=30) == execute(ds, qn, vars_)


def test_empty_binding_set_keeps_string_schema(ray_session):
    """_set_to_ds of an EMPTY driver set must emit a string-typed
    column: the naive empty DataFrame gives float64, which mixes
    schemas when unioned with a string-typed DSBindings dataset
    (strict arrow unification paths reject the query)."""
    import pyarrow as pa

    from versa_ray.query.mini import _set_to_ds

    ds = _set_to_ds(set())
    assert ds.schema().base_schema.field("v").type == pa.string()
    u = _set_to_ds(set()).union(_set_to_ds({"a", "b"}))
    assert sorted(r["v"] for r in u.take_all()) == ["a", "b"]


def test_ds_bindings_store_prunes_partitions(ray_session, tmp_path):
    """A Dataset-backed origin constraint against a STORED linkset
    still prunes at the file level (distinct binding hash-partitions,
    bounded by the store's partition count) and returns the same
    answer as the driver-set path."""
    import pandas as pd
    import ray.data as rd

    from versa_ray.model import linkset
    from versa_ray.model.store import (
        part_ids_of_origins_ds, pruned_fragments, write_linkset)
    from versa_ray.query.mini import StoreModel, evaluate

    path = str(tmp_path / "store")
    write_linkset(linkset.from_links(_large_links(200)), path,
                  num_rel_buckets=4, num_partitions=16)
    sm = StoreModel(path)
    q = "?($x, T, 'urn:big:T') and ?($x, G, 'urn:big:g1')"
    want = evaluate(q, sm, _BIG_VARS)
    assert want["x"]  # non-trivial answer
    assert evaluate(q, sm, _BIG_VARS, ds_threshold=10) == want

    # the part-id hint prunes files: a binding set covering few
    # partitions opens strictly fewer files than the full store
    some = rd.from_pandas(
        pd.DataFrame({"v": [f"urn:big:e{i}" for i in range(3)]}))
    pids = part_ids_of_origins_ds(path, some)
    assert 1 <= len(pids) <= 3
    assert len(pruned_fragments(path, origin_part_ids=pids)) < \
        len(pruned_fragments(path))


def test_repeated_variable_unions_positions(ray_session):
    """A variable repeated across positions of ONE conjunct
    (``?($x, R, $x)``) binds the UNION of the values at each position
    — and the Dataset path must agree with the MicroModel scan."""
    from versa_ray.model import linkset
    from versa_ray.model.micro import MicroModel
    from versa_ray.query import evaluate

    links = [
        ("urn:rv:a", "urn:rv:r", "urn:rv:a"),
        ("urn:rv:b", "urn:rv:r", "urn:rv:c"),
        ("urn:rv:d", "urn:rv:r", "urn:rv:d"),
    ]
    m = MicroModel()
    for l in links:
        m.add(*l)
    vars_ = {"R": "urn:rv:r"}
    q = "?($x, R, $x)"
    want = evaluate(q, m, vars_)
    assert want == {"x": {"urn:rv:a", "urn:rv:b", "urn:rv:c", "urn:rv:d"}}
    ds = linkset.from_links(links)
    assert evaluate(q, ds, vars_) == want
    # ...and on the DSBindings (above-threshold) path
    assert evaluate(q, ds, vars_, ds_threshold=2) == want
