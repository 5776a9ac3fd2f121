"""Versa FULL query language — a working implementation of the
surface the reference left unfinished.

The reference ships a ply grammar (query/parser.py:92-195) over an
AST (query/ast.py) that was never completed: ``conjunction`` and
``disjunction`` both evaluate ``or`` (ast.py:33-58), ``funccall``
raises NotImplementedError for every function, ``match_result``
methods are empty, and no driver wires it up. This module implements
the SAME grammar surface — ``?()`` match calls, ``and`` / ``or`` /
``not`` with proper precedence (``or`` loosest, then ``and``, then
``not``), parenthesized grouping, ``$var`` variables, context
constants, string sequences, and function calls — with coherent
semantics, as a hand-rolled recursive-descent parser (no parser
generator):

* an expression evaluates to a BINDING DICT ``{var: set(values)}``
* ``?()`` contributes bindings from matching links (MicroModel,
  links Dataset, or partition-pruned StoreModel — the same three
  evaluation targets as the mini-query)
* ``A and B`` threads A's bindings into B as constraints and
  intersects shared variables
* ``A or B`` unions binding sets per variable
* ``A and not B`` is SAFE negation: B may only constrain variables
  A already bound (for those, A's values minus B's); a negation
  whose variables have no positive binding raises — the unsafe
  complement over an open domain is never silently guessed
* function calls are string constructors usable anywhere a match
  argument can appear: ``concat(...)``, ``iri(base, local)``,
  ``lower(x)``, ``upper(x)`` — extensible via ``FUNCTIONS``

Deliberate divergence from the reference AST: ``and`` means
conjunction (the reference's conjunction node evaluates ``or`` —
a bug, not a semantic we preserve).
"""

from __future__ import annotations

from .mini import (
    BoolOp,
    DSBindings,
    MatchCall,
    QueryContext,
    StringSeq,
    Var,
    Wild,
    _copy_binding,
    _match_bindings,
    _merge_and,
    _merge_or,
    _resolve_arg as _mini_resolve_arg,
    _subtract,
    tokenize as _mini_tokenize,
)

__all__ = ["parse", "execute", "FUNCTIONS"]

FUNCTIONS = {
    "concat": lambda *args: "".join(args),
    "iri": lambda base, local: str(base) + str(local),
    "lower": lambda s: str(s).lower(),
    "upper": lambda s: str(s).upper(),
}


class Not:
    def __init__(self, node):
        self.node = node


class FuncCall:
    def __init__(self, name, args):
        self.name = name
        self.args = args

    def value(self, variables):
        fn = FUNCTIONS.get(self.name)
        if fn is None:
            raise ValueError(f"full-query: unknown function {self.name}()")
        vals = []
        for a in self.args:
            if isinstance(a, StringSeq):
                vals.append(a.value(variables))
            elif isinstance(a, FuncCall):
                vals.append(a.value(variables))
            else:
                raise ValueError(
                    "full-query: function arguments must be strings, "
                    "constants or nested calls"
                )
        return fn(*vals)


def tokenize(text: str):
    return _mini_tokenize(text, keywords=("and", "or", "not"))


class _Parser:
    """or-expr := and-expr (OR and-expr)*
    and-expr := not-expr (AND not-expr)*
    not-expr := NOT not-expr | atom
    atom := match | '(' or-expr ')' | funccall | stringseq | var"""

    def __init__(self, tokens):
        self.toks = tokens
        self.ix = 0

    def peek(self, ahead=0):
        ix = self.ix + ahead
        return self.toks[ix] if ix < len(self.toks) else (None, None)

    def eat(self, kind=None):
        tok = self.peek()
        if kind and tok[0] != kind:
            raise ValueError(f"full-query: expected {kind}, got {tok}")
        self.ix += 1
        return tok

    def parse(self):
        node = self.or_expr()
        if self.ix != len(self.toks):
            raise ValueError("full-query: trailing tokens")
        return node

    def or_expr(self):
        node = self.and_expr()
        while self.peek()[0] == "or":
            self.eat()
            node = BoolOp("or", node, self.and_expr())
        return node

    def and_expr(self):
        node = self.not_expr()
        while self.peek()[0] == "and":
            self.eat()
            node = BoolOp("and", node, self.not_expr())
        return node

    def not_expr(self):
        if self.peek()[0] == "not":
            self.eat()
            return Not(self.not_expr())
        return self.atom()

    def atom(self):
        kind, val = self.peek()
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
            node = self.or_expr()
            self.eat(")")
            return node
        if kind == "ident" and self.peek(1)[0] == "(":
            return self.funccall()
        raise ValueError(f"full-query: unexpected token {self.peek()}")

    def funccall(self):
        _, name = self.eat("ident")
        self.eat("(")
        args = []
        if self.peek()[0] != ")":
            args.append(self.valuearg())
            while self.peek()[0] == ",":
                self.eat(",")
                args.append(self.valuearg())
        self.eat(")")
        return FuncCall(name, args)

    def valuearg(self):
        kind, _ = self.peek()
        if kind == "ident" and self.peek(1)[0] == "(":
            return self.funccall()
        if kind in ("ident", "string"):
            items = []
            while self.peek()[0] in ("ident", "string"):
                # a nested call starts where an ident is followed by (
                if self.peek()[0] == "ident" and self.peek(1)[0] == "(":
                    break
                items.append(self.eat())
            return StringSeq(items)
        raise ValueError(f"full-query: bad function argument {self.peek()}")

    def matcharg(self):
        kind, val = self.peek()
        if kind == "*":
            self.eat()
            return Wild()
        if kind == "var":
            self.eat()
            return Var(val)
        if kind == "ident" and self.peek(1)[0] == "(":
            return self.funccall()
        if kind in ("ident", "string"):
            items = []
            while self.peek()[0] in ("ident", "string"):
                if self.peek()[0] == "ident" and self.peek(1)[0] == "(":
                    break
                items.append(self.eat())
            return StringSeq(items)
        raise ValueError(f"full-query: bad match arg {self.peek()}")


def parse(text: str):
    return _Parser(tokenize(text)).parse()


# ---------------------------------------------------------------------------
# Evaluation


def _resolve_arg(arg, ctx):
    if isinstance(arg, FuncCall):
        return arg.value(ctx.variables)
    return _mini_resolve_arg(arg, ctx)


def _eval(node, ctx: QueryContext) -> dict:
    if isinstance(node, MatchCall):
        args = [_resolve_arg(a, ctx) for a in node.args[:3]]
        return _match_bindings(
            ctx.model, node.args, args, ds_threshold=ctx.ds_threshold)
    if isinstance(node, Not):
        raise ValueError(
            "full-query: unsafe negation — `not` must appear as the right "
            "side of `and` with its variables bound by a positive conjunct"
        )
    if isinstance(node, BoolOp):
        left = _eval(node.left, ctx)
        if node.op == "and":
            if isinstance(node.right, Not):
                # safe negation: constrain the negated match to the
                # positively-bound candidates, then subtract (an
                # anti-join when both sides are Dataset-backed)
                inner = node.right.node
                neg = _eval(inner, ctx.copy(matchvars=left))
                out = {k: _copy_binding(v) for k, v in left.items()}
                touched = False
                for k, v in neg.items():
                    if k not in left:
                        raise ValueError(
                            f"full-query: unsafe negation — ${k} is not "
                            "bound by a positive conjunct"
                        )
                    out[k] = _subtract(out[k], v, ctx.ds_threshold)
                    touched = True
                if not touched:
                    raise ValueError(
                        "full-query: negation binds no variables — "
                        "nothing to subtract from"
                    )
                return out
            return _merge_and(
                left, _eval(node.right, ctx.copy(matchvars=left)),
                ctx.ds_threshold)
        return _merge_or(left, _eval(node.right, ctx), ctx.ds_threshold)
    if isinstance(node, (StringSeq, FuncCall)):
        raise ValueError(
            "full-query: a bare value expression is not a query — use it "
            "inside a ?() match argument"
        )
    raise TypeError(node)


def execute(model, q, variables=None, ds_threshold=None,
            as_datasets=False) -> dict:
    """Parse (if needed) and evaluate the full query language against
    a MicroModel, a links Dataset, or a StoreModel; returns
    ``{var: set(values)}`` (the reference's query.execute signature,
    query/__init__.py:7-30, with working semantics). Binding sets
    above ``ds_threshold`` distinct values stay Datasets internally
    (semi-join threading — see ``mini.DSBindings``); pass
    ``as_datasets=True`` to receive them un-collapsed."""
    node = parse(q) if isinstance(q, str) else q
    out = _eval(
        node, QueryContext(model, variables, ds_threshold=ds_threshold))
    if as_datasets:
        return out
    return {
        k: v.to_set() if isinstance(v, DSBindings) else v
        for k, v in out.items()
    }
