"""Versa mini-query language.

Syntax (reference grammar: /root/reference/tools/py/query/miniparser.py,
semantics: query/miniast.py + test/py/test_miniquery.py):

    ?($a, H5 'title', *) and ?($b, H5L 'see-also', $a)

* ``?(origin, rel, target)`` — a match call; each arg is ``*`` (wild),
  ``$var`` (variable to bind / propagate), a ``'string'``, or a
  string-sequence ``IDENT 'literal'...`` concatenating context
  constants with literals.
* ``and`` — evaluate left, thread its bindings into right, intersect
  shared variables (the reference's intersection is a no-op bug; we
  implement the documented semantics, which its tests also satisfy).
* ``or`` — union of binding sets per variable.

This is a fresh recursive-descent implementation (no parser
generator). Evaluation targets either a doc-local MicroModel or a
distributed links Dataset: each ?() is a filtered scan — vectorized
``multimatch`` — that projects the bound columns into small
driver-side sets; conjunction threads those sets as semi-join filters
into the next scan.
"""

from __future__ import annotations

import re

_TOKEN_RE = re.compile(
    r"\s*(?:(?P<var>\$\w+)|(?P<string>\"[^\"]*\"|'[^']*')|(?P<ident>\w+)"
    r"|(?P<punct>[?(),*]))"
)


def tokenize(text: str, keywords=("and", "or")):
    pos = 0
    out = []
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            if text[pos:].strip():
                raise ValueError(f"mini-query: bad token at {text[pos:]!r}")
            break
        pos = m.end()
        if m.group("var"):
            out.append(("var", m.group("var")[1:]))
        elif m.group("string"):
            out.append(("string", m.group("string")[1:-1]))
        elif m.group("ident"):
            word = m.group("ident")
            if word in keywords:
                out.append((word, word))
            else:
                out.append(("ident", word))
        else:
            out.append((m.group("punct"), m.group("punct")))
    return out


class Wild:
    pass


class Var:
    def __init__(self, name):
        self.name = name


class StringSeq:
    """Concatenation of context constants and literals."""

    def __init__(self, items):
        self.items = items  # ('ident', name) | ('string', s)

    def value(self, variables):
        out = []
        for kind, v in self.items:
            out.append(variables[v] if kind == "ident" else v)
        return "".join(out)


class MatchCall:
    def __init__(self, args):
        self.args = args  # origin, rel, target (optionally attrs ignored)


class BoolOp:
    def __init__(self, op, left, right):
        self.op = op
        self.left = left
        self.right = right


class _Parser:
    def __init__(self, tokens):
        self.toks = tokens
        self.ix = 0

    def peek(self):
        return self.toks[self.ix] if self.ix < len(self.toks) else (None, None)

    def eat(self, kind=None):
        tok = self.peek()
        if kind and tok[0] != kind:
            raise ValueError(f"mini-query: expected {kind}, got {tok}")
        self.ix += 1
        return tok

    def parse(self):
        node = self.expr()
        if self.ix != len(self.toks):
            raise ValueError("mini-query: trailing tokens")
        return node

    def expr(self):
        node = self.term()
        while self.peek()[0] in ("and", "or"):
            op = self.eat()[0]
            node = BoolOp(op, node, self.term())
        return node

    def term(self):
        kind, _ = self.peek()
        if kind == "?":
            self.eat("?")
            self.eat("(")
            args = [self.matcharg()]
            while self.peek()[0] == ",":
                self.eat(",")
                args.append(self.matcharg())
            self.eat(")")
            return MatchCall(args)
        if kind == "(":
            self.eat("(")
            node = self.expr()
            self.eat(")")
            return node
        raise ValueError(f"mini-query: unexpected token {self.peek()}")

    def matcharg(self):
        kind, val = self.peek()
        if kind == "*":
            self.eat()
            return Wild()
        if kind == "var":
            self.eat()
            return Var(val)
        if kind in ("ident", "string"):
            items = []
            while self.peek()[0] in ("ident", "string"):
                items.append(self.eat())
            return StringSeq(items)
        raise ValueError(f"mini-query: bad match arg {self.peek()}")


def miniparse(text: str):
    return _Parser(tokenize(text)).parse()


# ---------------------------------------------------------------------------
# Evaluation


class QueryContext:
    def __init__(self, model, variables=None, matchvars=None):
        self.model = model  # MicroModel-like (multimatch) or Dataset
        self.variables = variables or {}
        self.matchvars = matchvars or {}

    def copy(self, matchvars=None):
        return QueryContext(
            self.model, self.variables, matchvars if matchvars is not None else self.matchvars
        )


def _resolve_arg(arg, ctx):
    if isinstance(arg, Wild):
        return None
    if isinstance(arg, Var):
        # None = unconstrained; an EMPTY bound set stays an empty set
        # (matches nothing) — collapsing it to None would let a var
        # whose positive conjunct found no solutions act as a wildcard
        bound = ctx.matchvars.get(arg.name)
        return None if bound is None else set(bound)
    if isinstance(arg, StringSeq):
        return arg.value(ctx.variables)
    raise TypeError(arg)


_POS_COLS = ("origin", "rel", "target")


def _match_bindings(model, args, resolved) -> dict:
    """Binding sets for one ?() call. MicroModel: in-process scan.
    Dataset: vectorized match, then only the DISTINCT values of the
    bound positions reach the driver (distributed dedup first) — the
    driver never materializes match-cardinality rows."""
    var_pos = {
        pos: a.name for pos, a in enumerate(args[:3]) if isinstance(a, Var)
    }
    result = {name: set() for name in var_pos.values()}
    if any(isinstance(r, (set, frozenset)) and not r for r in resolved):
        return result  # a position constrained to the empty set matches nothing
    if hasattr(model, "multimatch"):
        for link in model.multimatch(*resolved):
            for pos, name in var_pos.items():
                result[name].add(link[pos])
        return result
    from ..model import linkset
    from ..ops.dedup import dedup_rows

    if hasattr(model, "pruned_match"):
        # StoreModel: the conjunct's literal rel/origin constraints
        # push down to Hive partition pruning — the index-aware path
        matched = model.pruned_match(resolved[0], resolved[1], resolved[2])
    else:
        matched = linkset.match(
            model, origin=resolved[0], rel=resolved[1], target=resolved[2]
        )
    if not var_pos:
        return result
    cols = [_POS_COLS[p] for p in sorted(var_pos)]
    from ..core.dsutil import rows_of

    for row in rows_of(dedup_rows(matched.select_columns(cols), cols)):
        for pos, name in var_pos.items():
            result[name].add(row[_POS_COLS[pos]])
    return result


def _merge_and(left: dict, right: dict) -> dict:
    """Conjunction merge: intersect shared variables, keep the rest."""
    out = {}
    for k, v in left.items():
        out[k] = v & right[k] if k in right else set(v)
    for k, v in right.items():
        if k not in left:
            out[k] = set(v)
    return out


def _merge_or(left: dict, right: dict) -> dict:
    """Disjunction merge: union of binding sets per variable."""
    out = {k: set(v) for k, v in left.items()}
    for k, v in right.items():
        out[k] = out.get(k, set()) | set(v)
    return out


def _eval(node, ctx: QueryContext) -> dict:
    if isinstance(node, MatchCall):
        args = [_resolve_arg(a, ctx) for a in node.args[:3]]
        return _match_bindings(ctx.model, node.args, args)
    if isinstance(node, BoolOp):
        left = _eval(node.left, ctx)
        if node.op == "and":
            return _merge_and(left, _eval(node.right, ctx.copy(matchvars=left)))
        return _merge_or(left, _eval(node.right, ctx))
    raise TypeError(node)


def evaluate(query, model, variables=None) -> dict:
    """Parse (if needed) and evaluate; returns {var: set(values)}."""
    node = miniparse(query) if isinstance(query, str) else query
    return _eval(node, QueryContext(model, variables))


class StoreModel:
    """Mini-query adapter over a STORED link-set: each ``?()``
    conjunct becomes one partition-pruned ``read_linkset`` call, so a
    conjunct whose rel (or origin) is a literal — or a variable
    already bound by an earlier conjunct — opens only the matching
    Hive partition files instead of scanning the store. This is the
    engine's analogue of the reference sqlite driver's (subj, pred)
    index consultation per query clause."""

    def __init__(self, path: str):
        self.path = path

    def pruned_match(self, origin, rel, target):
        from ..model.store import read_linkset

        return read_linkset(
            self.path, origin=origin, rel=rel, target=target)
