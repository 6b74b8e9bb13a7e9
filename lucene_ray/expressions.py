"""Compiled scoring expressions — the expressions-module role
(expressions/src/java/org/apache/lucene/expressions/Expression.java:68,
compiled by JavascriptCompiler.java:120) driving FunctionScoreQuery
(queries/src/java/org/apache/lucene/queries/function/
FunctionScoreQuery.java:44).

A JS-like arithmetic mini-language over the query score and numeric
docvalues, parsed once to an AST and "compiled" two ways from the SAME
tree so engine and oracle cannot drift:

- ``eval(env)``: vectorized NumPy with PINNED float op order — every
  arithmetic node computes on float64 operands and rounds its result to
  float32, i.e. exactly ``CAST(CAST(a AS DOUBLE) <op> CAST(b AS DOUBLE)
  AS REAL)``; ``log`` runs per *unique* value through C libm
  (``math.log``, the bm25.py rule — np.log's SIMD path can differ in
  the last ulp) so DuckDB's ``ln`` reproduces it bit-for-bit.
- ``sql(colmap)``: the equivalent DuckDB REAL-cast chain.

Grammar::

    expr  := term (('+' | '-') term)*
    term  := unary (('*' | '/') unary)*
    unary := '-' unary | atom
    atom  := NUMBER | IDENT | IDENT '(' expr (',' expr)* ')'
             | '(' expr ')'

Functions: ``log`` (natural), ``sqrt``, ``abs``, ``min``, ``max``.
"""

from __future__ import annotations

import math
import re

import numpy as np

_TOKEN = re.compile(r"\s*(?:(\d+\.\d*|\.\d+|\d+)|([A-Za-z_]\w*)|(.))")


class _Node:
    def eval(self, env: dict) -> np.ndarray:  # pragma: no cover - abstract
        raise NotImplementedError

    def sql(self, colmap: dict) -> str:  # pragma: no cover - abstract
        raise NotImplementedError


class _Num(_Node):
    def __init__(self, v: float):
        self.v = np.float32(v)

    def eval(self, env):
        return self.v

    def sql(self, colmap):
        # Literal → DOUBLE first: DuckDB parses bare decimal literals as
        # DECIMAL, whose direct cast to REAL can be off by one ulp
        # (measured: CAST(0.09878252446651459 AS REAL) !=
        # float32(0.09878252446651459)); DOUBLE parses exactly and
        # DOUBLE→REAL rounds correctly.
        return f"CAST(CAST({float(self.v)!r} AS DOUBLE) AS REAL)"


class _Var(_Node):
    def __init__(self, name: str):
        self.name = name

    def eval(self, env):
        return env[self.name]

    def sql(self, colmap):
        return colmap[self.name]


class _Neg(_Node):
    def __init__(self, x: _Node):
        self.x = x

    def eval(self, env):
        return -self.x.eval(env)        # sign flip is exact in float32

    def sql(self, colmap):
        return f"(-({self.x.sql(colmap)}))"


class _Bin(_Node):
    def __init__(self, op: str, a: _Node, b: _Node):
        self.op, self.a, self.b = op, a, b

    def eval(self, env):
        a = np.asarray(self.a.eval(env), dtype=np.float64)
        b = np.asarray(self.b.eval(env), dtype=np.float64)
        if self.op == "+":
            r = a + b
        elif self.op == "-":
            r = a - b
        elif self.op == "*":
            r = a * b
        else:
            r = a / b
        return r.astype(np.float32)

    def sql(self, colmap):
        a, b = self.a.sql(colmap), self.b.sql(colmap)
        return (f"CAST((CAST({a} AS DOUBLE) {self.op} "
                f"CAST({b} AS DOUBLE)) AS REAL)")


def _libm_log(x: np.ndarray) -> np.ndarray:
    """Natural log through C libm per unique value (features.log_score
    pattern) → float32, bit-equal to ``CAST(ln(CAST(x AS DOUBLE)) AS
    REAL)``."""
    v = np.asarray(x, dtype=np.float64)
    uniq, inv = np.unique(v, return_inverse=True)
    logs = np.array([math.log(u) for u in uniq], dtype=np.float64)
    return logs.astype(np.float32)[inv].reshape(v.shape)


class _Call(_Node):
    FUNCS = ("log", "sqrt", "abs", "min", "max")

    def __init__(self, name: str, args: list[_Node]):
        if name not in self.FUNCS:
            raise ValueError(f"unknown function {name!r}")
        if name in ("min", "max"):
            if len(args) != 2:
                raise ValueError(f"{name}() takes 2 arguments")
        elif len(args) != 1:
            raise ValueError(f"{name}() takes 1 argument")
        self.name, self.args = name, args

    def eval(self, env):
        a = [np.asarray(x.eval(env)) for x in self.args]
        if self.name == "log":
            return _libm_log(a[0])
        if self.name == "sqrt":                 # correctly rounded (IEEE)
            return np.sqrt(a[0].astype(np.float64)).astype(np.float32)
        if self.name == "abs":
            return np.abs(a[0])
        if self.name == "min":                  # value-picking: exact
            return np.minimum(a[0], a[1])
        return np.maximum(a[0], a[1])

    def sql(self, colmap):
        s = [x.sql(colmap) for x in self.args]
        if self.name == "log":
            return f"CAST(ln(CAST({s[0]} AS DOUBLE)) AS REAL)"
        if self.name == "sqrt":
            return f"CAST(sqrt(CAST({s[0]} AS DOUBLE)) AS REAL)"
        if self.name == "abs":
            return f"abs({s[0]})"
        fn = "least" if self.name == "min" else "greatest"
        return f"{fn}({s[0]}, {s[1]})"


class Expression:
    """A parsed scoring expression (Expression.java:68 role)."""

    def __init__(self, source: str, root: _Node, variables: list[str]):
        self.source = source
        self._root = root
        self.variables = variables

    def eval(self, env: dict) -> np.ndarray:
        """Evaluate over float32 arrays/scalars in ``env`` → float32."""
        missing = [v for v in self.variables if v not in env]
        if missing:
            raise KeyError(f"unbound expression variables: {missing}")
        return np.asarray(self._root.eval(env), dtype=np.float32)

    def sql(self, colmap: dict) -> str:
        """The DuckDB REAL-cast chain over the given column mapping."""
        return self._root.sql(colmap)


def compile_expr(source: str) -> Expression:
    """Parse ``source`` (JavascriptCompiler.compile role — arithmetic
    subset) into an :class:`Expression`."""
    toks: list[tuple[str, str]] = []
    for num, ident, ch in _TOKEN.findall(source):
        if num:
            toks.append(("num", num))
        elif ident:
            toks.append(("id", ident))
        elif ch.strip():
            toks.append(("op", ch))
    pos = 0
    variables: list[str] = []

    def peek():
        return toks[pos] if pos < len(toks) else ("end", "")

    def take(kind=None, val=None):
        nonlocal pos
        k, v = peek()
        if (kind and k != kind) or (val and v != val):
            raise ValueError(f"parse error at {v!r} in {source!r}")
        pos += 1
        return v

    def expr() -> _Node:
        n = term()
        while peek() == ("op", "+") or peek() == ("op", "-"):
            op = take("op")
            n = _Bin(op, n, term())
        return n

    def term() -> _Node:
        n = unary()
        while peek() == ("op", "*") or peek() == ("op", "/"):
            op = take("op")
            n = _Bin(op, n, unary())
        return n

    def unary() -> _Node:
        if peek() == ("op", "-"):
            take("op")
            return _Neg(unary())
        return atom()

    def atom() -> _Node:
        k, v = peek()
        if k == "num":
            take()
            return _Num(float(v))
        if k == "id":
            take()
            if peek() == ("op", "("):
                take("op", "(")
                args = [expr()]
                while peek() == ("op", ","):
                    take("op", ",")
                    args.append(expr())
                take("op", ")")
                return _Call(v, args)
            if v not in variables:
                variables.append(v)
            return _Var(v)
        if (k, v) == ("op", "("):
            take("op", "(")
            n = expr()
            take("op", ")")
            return n
        raise ValueError(f"parse error at {v!r} in {source!r}")

    root = expr()
    if pos != len(toks):
        raise ValueError(f"trailing tokens in {source!r}")
    return Expression(source, root, variables)
