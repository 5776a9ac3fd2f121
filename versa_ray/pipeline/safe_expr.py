"""Safe mini-expression evaluator for ``if_`` string tests.

The reference evaluates string tests with Python ``eval`` and
``target`` bound (/root/reference/tools/py/pipeline/other_actions.py:
230-238) — unacceptable in a distributed engine where rulespecs ship
to workers. This module evaluates the same test strings over an
explicitly whitelisted expression subset instead (SURVEY §7: "replace
with a safe expression subset"):

* literals: str, int, float, bool, None; tuple/list displays
* names: whatever the caller binds (``target`` + ``vars_``)
* comparisons: == != < <= > >= in "not in", incl. chained
* boolean ops: and, or, not
* arithmetic: + - * / % and unary -
* str methods (whitelisted, side-effect-free): startswith, endswith,
  lower, upper, strip, lstrip, rstrip, split
* len()

Anything else — attribute access beyond those methods, subscripts,
imports, lambdas, comprehensions, arbitrary calls — raises
``UnsafeExpression``. The expression is parsed with ``ast`` and
interpreted by structural dispatch; Python ``eval`` is never invoked.
"""

from __future__ import annotations

import ast

_STR_METHODS = frozenset(
    {"startswith", "endswith", "lower", "upper", "strip", "lstrip",
     "rstrip", "split"}
)


class UnsafeExpression(ValueError):
    """The test string uses a construct outside the safe subset."""


def safe_eval(expr: str, names: dict):
    """Evaluate ``expr`` over ``names`` using only the safe subset."""
    try:
        tree = ast.parse(expr, mode="eval")
    except SyntaxError as e:
        raise UnsafeExpression(f"unparseable test expression: {expr!r}") from e
    return _ev(tree.body, names)


def _ev(node, names):
    if isinstance(node, ast.Constant):
        if isinstance(node.value, (str, int, float, bool, type(None))):
            return node.value
        raise UnsafeExpression(f"literal type not allowed: {node.value!r}")
    if isinstance(node, ast.Name):
        if node.id in names:
            return names[node.id]
        raise UnsafeExpression(f"unbound name: {node.id}")
    if isinstance(node, (ast.Tuple, ast.List)):
        return tuple(_ev(e, names) for e in node.elts)
    if isinstance(node, ast.BoolOp):
        if isinstance(node.op, ast.And):
            result = True
            for v in node.values:
                result = _ev(v, names)
                if not result:
                    return result
            return result
        if isinstance(node.op, ast.Or):
            for v in node.values:
                result = _ev(v, names)
                if result:
                    return result
            return result
    if isinstance(node, ast.UnaryOp):
        if isinstance(node.op, ast.Not):
            return not _ev(node.operand, names)
        if isinstance(node.op, ast.USub):
            return -_ev(node.operand, names)
        raise UnsafeExpression("unary operator not allowed")
    if isinstance(node, ast.Compare):
        left = _ev(node.left, names)
        for op, rhs_node in zip(node.ops, node.comparators):
            right = _ev(rhs_node, names)
            if not _cmp(op, left, right):
                return False
            left = right
        return True
    if isinstance(node, ast.BinOp):
        left, right = _ev(node.left, names), _ev(node.right, names)
        if isinstance(node.op, ast.Add):
            return left + right
        if isinstance(node.op, ast.Sub):
            return left - right
        if isinstance(node.op, ast.Mult):
            return left * right
        if isinstance(node.op, ast.Div):
            return left / right
        if isinstance(node.op, ast.Mod):
            return left % right
        raise UnsafeExpression("binary operator not allowed")
    if isinstance(node, ast.Call):
        return _call(node, names)
    raise UnsafeExpression(
        f"construct not allowed in test expression: {type(node).__name__}"
    )


def _cmp(op, a, b):
    if isinstance(op, ast.Eq):
        return a == b
    if isinstance(op, ast.NotEq):
        return a != b
    if isinstance(op, ast.Lt):
        return a < b
    if isinstance(op, ast.LtE):
        return a <= b
    if isinstance(op, ast.Gt):
        return a > b
    if isinstance(op, ast.GtE):
        return a >= b
    if isinstance(op, ast.In):
        return a in b
    if isinstance(op, ast.NotIn):
        return a not in b
    raise UnsafeExpression("comparison operator not allowed")


def _call(node: ast.Call, names):
    if node.keywords:
        raise UnsafeExpression("keyword arguments not allowed")
    args = [_ev(a, names) for a in node.args]
    fn = node.func
    if isinstance(fn, ast.Name):
        if fn.id == "len" and len(args) == 1:
            return len(args[0])
        raise UnsafeExpression(f"function not allowed: {fn.id}")
    if isinstance(fn, ast.Attribute):
        obj = _ev(fn.value, names)
        if isinstance(obj, str) and fn.attr in _STR_METHODS:
            return getattr(obj, fn.attr)(*args)
        raise UnsafeExpression(f"method not allowed: .{fn.attr}")
    raise UnsafeExpression("call form not allowed")
