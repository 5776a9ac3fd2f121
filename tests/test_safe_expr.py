"""Safe expression subset for if_ string tests: mirrors the binding
environment of the reference's eval-based if_
(reference pipeline/other_actions.py:213-249) for the safe subset,
and rejects everything outside it."""

import pytest

from versa_ray.pipeline.safe_expr import UnsafeExpression, safe_eval


def test_comparisons_and_bool():
    names = {"target": "Alice", "n": 3}
    assert safe_eval("target == 'Alice'", names)
    assert not safe_eval("target != 'Alice'", names)
    assert safe_eval("n > 1 and n < 5", names)
    assert safe_eval("1 < n < 5", names)  # chained
    assert safe_eval("target in ('Alice', 'Bob')", names)
    assert safe_eval("not (n == 4)", names)
    assert safe_eval("n + 1 == 4", names)
    assert safe_eval("-n == -3", names)


def test_str_methods_and_len():
    names = {"target": "urn:x:abc"}
    assert safe_eval("target.startswith('urn:x:')", names)
    assert safe_eval("target.upper() == 'URN:X:ABC'", names)
    assert safe_eval("len(target) == 9", names)
    assert safe_eval("'x' in target.split(':')", names)


def test_rejects_unsafe():
    for expr in (
        "__import__('os').system('true')",
        "().__class__",
        "target.__class__",
        "open('/etc/passwd')",
        "[x for x in (1,2)]",
        "lambda: 1",
        "target[0]",        # subscript
        "unknown_name",
        "exec('1')",
    ):
        with pytest.raises(UnsafeExpression):
            safe_eval(expr, {"target": "t"})


def test_if_string_test_in_pipeline():
    """A reference-style rulespec using a string test runs end to end
    (semantics of other_actions.py:230-238 for the safe subset)."""
    from versa_ray.core import I, VTYPE_REL
    from versa_ray.model.micro import MicroModel
    from versa_ray.pipeline import generic_pipeline, if_, link, materialize, follow

    SCH = I("https://schema.org/")
    BF = I("http://bibfra.me/vocab/lite/")

    modin = MicroModel()
    modin.add("http://example.org/a", VTYPE_REL, str(SCH("Book")))
    modin.add("http://example.org/a", str(SCH("name")), "Keep Me")
    modin.add("http://example.org/b", VTYPE_REL, str(SCH("Book")))
    modin.add("http://example.org/b", str(SCH("name")), "Drop Me")

    rules_t = {
        SCH("name"): if_(
            "target.startswith('Keep') or target in extra_names",
            link(rel=BF("name")),
            vars_={"extra_names": ("Also Keep",)},
        )
    }
    ppl = generic_pipeline(
        {SCH("Book"): materialize(BF("Instance"),
                                  fprint=[(BF("name"), follow(SCH("name")))])},
        rules_t,
        {},
    )
    modout = ppl.run(input_model=modin)
    names = [l[2] for (_, l) in modout if l[1] == str(BF("name"))]
    assert names == ["Keep Me"]


def test_safe_eval_differential_vs_python():
    """Property: on the SAFE subset, safe_eval agrees with Python eval
    (generated expressions over comparisons / bool ops / arithmetic /
    str methods)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    names = {"target": "urn:x:abc", "n": 3, "s": "Hello World", "f": 2.5}

    num_atoms = st.sampled_from(["n", "f", "7", "2.5", "len(s)", "-n"])
    str_atoms = st.sampled_from(["target", "s", "'lit'", "s.upper()"])

    def cmps(draw_from):
        return st.builds(
            lambda a, op, b: f"({a} {op} {b})",
            draw_from, st.sampled_from(["==", "!=", "<", "<=", ">", ">="]),
            draw_from,
        )

    bool_exprs = st.one_of(
        cmps(num_atoms),
        cmps(str_atoms),
        st.builds(lambda a, b: f"({a} in {b})", str_atoms,
                  st.sampled_from(["('lit', 'urn:x:abc')", "s.split(' ')"])),
    )
    combined = st.recursive(
        bool_exprs,
        lambda kids: st.builds(
            lambda a, op, b: f"({a} {op} {b})",
            kids, st.sampled_from(["and", "or"]), kids,
        ) | st.builds(lambda a: f"(not {a})", kids),
        max_leaves=6,
    )

    from versa_ray.pipeline.safe_expr import safe_eval

    @settings(max_examples=300, deadline=None)
    @given(combined)
    def check(expr):
        assert safe_eval(expr, names) == eval(expr, {"__builtins__": {"len": len}}, dict(names))

    check()
