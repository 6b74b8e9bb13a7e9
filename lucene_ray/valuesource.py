"""The classic ValueSource / FunctionQuery family
(``queries/function/valuesource`` + ``FunctionQuery.java``).

Composable per-doc value sources evaluated two ways from the same node
tree (the expressions.py dual-compilation rule, so engine and DuckDB
oracle cannot drift):

- ``eval(ctx)``: vectorized float32 NumPy with Java's float op order —
  every FloatFunction arithmetic step is a single-precision operation
  (np.float32 binary ops ARE IEEE single ops; ``(float)Math.pow`` and
  the idf log run through C libm on doubles);
- ``sql(ctx)``: the equivalent REAL-cast DuckDB chain (house rule:
  ``CAST((a) op (b) AS REAL)`` — double-rounding of single operands is
  exact for + - * /).

Reference semantics reproduced exactly:

- ``TermFreqValueSource`` raw freq, 0 when absent
  (valuesource/TermFreqValueSource.java:41);
- ``TFValueSource`` = ClassicSimilarity ``tf(freq) = (float)sqrt(freq)``
  (TFValueSource.java:40, ClassicSimilarity.java:51);
- ``IDFValueSource`` = ``(float)(log((maxDoc+1)/(df+1)) + 1.0)``
  (IDFValueSource.java:57, ClassicSimilarity.java:69 — maxDoc because
  the source passes ``reader.maxDoc()``);
- ``DocFreqValueSource`` / ``TotalTermFreqValueSource`` /
  ``SumTotalTermFreqValueSource`` / ``NumDocsValueSource`` /
  ``MaxDocValueSource``: index-stat constants;
- ``NormValueSource`` = ClassicSimilarity
  ``SimScorer.score(1f, norm)`` with degenerate stats = the norm table
  ``lengthNorm(byte4ToInt(b)) = (float)(1/sqrt(len))`` with the
  ``normTable[0] = 1f/normTable[255]`` quirk
  (NormValueSource.java:74-86, TFIDFSimilarity.java:442-448);
- Float functions: Linear ``v*slope+intercept``
  (LinearFloatFunction.java:54), Reciprocal ``a/(m*v+b)``
  (ReciprocalFloatFunction.java:66), RangeMap
  (RangeMapFloatFunction.java:81-86), Pow ``(float)Math.pow(a,b)``
  (PowFloatFunction.java:40), Div ``a/b`` (DivFloatFunction.java),
  Product/Sum left-to-right float accumulation
  (ProductFloatFunction.java:36-40, SumFloatFunction.java:36-40),
  Max/Min accumulation (MaxFloatFunction.java:41),
  Scale: global min/max pass over the source then
  ``(v - minSource) * scale + min`` with
  ``scale = (max-min)/(maxVal-minVal)`` or 0 when degenerate
  (ScaleFloatFunction.java:57-130) — at cluster scale the min/max pass
  is a tiny distributed aggregate, the map stage is per-batch;
- ``FunctionQuery`` scoring: ``boost * val`` with negatives/NaN
  clamped to 0 (FunctionQuery.java:130-136); matches all (live) docs.

``IntFieldSource.floatVal`` is ``(float) longVal``
(IntFieldSource.java).
"""

from __future__ import annotations

import math

import numpy as np

from .smallfloat import byte4_to_int

__all__ = [
    "const", "int_field", "term_freq", "tf", "docfreq", "idf",
    "total_term_freq", "sum_total_term_freq", "num_docs", "max_doc",
    "norm", "linear", "reciprocal", "rangemap", "powf", "divf",
    "product", "sumf", "maxf", "minf", "scale", "function_query_scores",
]

_F = np.float32


def _real(expr: str) -> str:
    return f"CAST({expr} AS REAL)"


class VS:
    def eval(self, ctx) -> np.ndarray:      # float32 array over docs
        raise NotImplementedError

    def sql(self, ctx) -> str:              # REAL-typed expression
        raise NotImplementedError


class _Const(VS):
    def __init__(self, v: float):
        self.v = _F(v)

    def eval(self, ctx):
        return np.full(ctx.n_docs, self.v, dtype=np.float32)

    def sql(self, ctx):
        return _real(repr(float(self.v)))


def const(v: float) -> VS:
    return _Const(v)


class _IntField(VS):
    """IntFieldSource over the field_len docvalue column."""

    def eval(self, ctx):
        return ctx.field_len.astype(np.float32)

    def sql(self, ctx):
        return _real(ctx.len_col)


def int_field() -> VS:
    return _IntField()


class _TermFreq(VS):
    def __init__(self, term: str):
        self.term = term

    def eval(self, ctx):
        return ctx.freq(self.term).astype(np.float32)

    def sql(self, ctx):
        return _real(ctx.freq_col(self.term))


def term_freq(term: str) -> VS:
    return _TermFreq(term)


class _Tf(VS):
    def __init__(self, term: str):
        self.term = term

    def eval(self, ctx):
        return np.sqrt(ctx.freq(self.term).astype(np.float64)) \
            .astype(np.float32)

    def sql(self, ctx):
        return _real(f"sqrt(CAST({ctx.freq_col(self.term)} AS DOUBLE))")


def tf(term: str) -> VS:
    return _Tf(term)


class _StatConst(VS):
    def __init__(self, kind: str, term: str | None = None):
        self.kind = kind
        self.term = term

    def _value(self, ctx) -> float:
        k = self.kind
        if k == "docfreq":
            return float(_F(ctx.df(self.term)))
        if k == "idf":
            return float(_F(
                math.log((ctx.n_docs + 1) / float(ctx.df(self.term) + 1))
                + 1.0))
        if k == "ttf":
            return float(_F(ctx.ttf(self.term)))
        if k == "sumttf":
            return float(_F(ctx.sum_ttf))
        if k in ("numdocs", "maxdoc"):      # no deletes here: equal
            return float(_F(ctx.n_docs))
        raise ValueError(k)

    def eval(self, ctx):
        return np.full(ctx.n_docs, _F(self._value(ctx)),
                       dtype=np.float32)

    def sql(self, ctx):
        # the stat is an index constant; inline the float32 literal the
        # engine computed (both sides read the same stats)
        return _real(repr(self._value(ctx)))


def docfreq(term: str) -> VS:
    return _StatConst("docfreq", term)


def idf(term: str) -> VS:
    return _StatConst("idf", term)


def total_term_freq(term: str) -> VS:
    return _StatConst("ttf", term)


def sum_total_term_freq() -> VS:
    return _StatConst("sumttf")


def num_docs() -> VS:
    return _StatConst("numdocs")


def max_doc() -> VS:
    return _StatConst("maxdoc")


def _norm_table() -> np.ndarray:
    t = np.zeros(256, dtype=np.float32)
    for i in range(1, 256):
        t[i] = _F(1.0 / math.sqrt(byte4_to_int(i)))
    t[0] = _F(np.float32(1.0) / t[255])
    return t


class _Norm(VS):
    def eval(self, ctx):
        return _norm_table()[ctx.norm_bytes]

    def sql(self, ctx):
        zero = repr(float(_norm_table()[0]))
        return (f"CAST(CASE WHEN {ctx.qlen_col} = 0 THEN {zero} "
                f"ELSE CAST(1.0 / sqrt(CAST({ctx.qlen_col} AS DOUBLE)) "
                f"AS REAL) END AS REAL)")


def norm() -> VS:
    return _Norm()


class _Lin(VS):
    def __init__(self, src: VS, slope: float, intercept: float):
        self.src, self.slope, self.intercept = src, _F(slope), _F(intercept)

    def eval(self, ctx):
        return self.src.eval(ctx) * self.slope + self.intercept

    def sql(self, ctx):
        s = self.src.sql(ctx)
        return _real(_real(f"({s}) * {float(self.slope)!r}")
                     + f" + {float(self.intercept)!r}")


def linear(src: VS, slope: float, intercept: float) -> VS:
    return _Lin(src, slope, intercept)


class _Recip(VS):
    def __init__(self, src: VS, m: float, a: float, b: float):
        self.src, self.m, self.a, self.b = src, _F(m), _F(a), _F(b)

    def eval(self, ctx):
        return self.a / (self.m * self.src.eval(ctx) + self.b)

    def sql(self, ctx):
        s = self.src.sql(ctx)
        inner = _real(_real(f"{float(self.m)!r} * ({s})")
                      + f" + {float(self.b)!r}")
        return _real(f"{float(self.a)!r} / {inner}")


def reciprocal(src: VS, m: float, a: float, b: float) -> VS:
    return _Recip(src, m, a, b)


class _RangeMap(VS):
    def __init__(self, src: VS, lo: float, hi: float, target: VS,
                 default: VS | None):
        self.src, self.lo, self.hi = src, _F(lo), _F(hi)
        self.target, self.default = target, default

    def eval(self, ctx):
        v = self.src.eval(ctx)
        t = self.target.eval(ctx)
        d = self.default.eval(ctx) if self.default is not None else v
        return np.where((v >= self.lo) & (v <= self.hi), t, d)

    def sql(self, ctx):
        v = self.src.sql(ctx)
        t = self.target.sql(ctx)
        d = self.default.sql(ctx) if self.default is not None else v
        return (f"CAST(CASE WHEN ({v}) >= {float(self.lo)!r} AND ({v}) <= "
                f"{float(self.hi)!r} THEN ({t}) ELSE ({d}) END AS REAL)")


def rangemap(src: VS, lo: float, hi: float, target: VS,
             default: VS | None = None) -> VS:
    return _RangeMap(src, lo, hi, target, default)


class _Pow(VS):
    def __init__(self, a: VS, b: VS):
        self.a, self.b = a, b

    def eval(self, ctx):
        av = self.a.eval(ctx).astype(np.float64)
        bv = self.b.eval(ctx).astype(np.float64)
        # (float) Math.pow — per-unique pair through C libm (the
        # repo's scalar-transcendental rule)
        pairs = np.stack([av, bv], axis=1)
        uniq, inv = np.unique(pairs, axis=0, return_inverse=True)
        # (float)Math.pow follows IEEE 754: negative base with a
        # fractional exponent is NaN, 0^negative is +Inf — math.pow
        # RAISES there, so route those through np.power (same libm
        # pow on the normal path)
        with np.errstate(invalid="ignore", divide="ignore"):
            vals = np.array([np.power(x, y) for x, y in uniq],
                            dtype=np.float64)
        return vals[inv].astype(np.float32)

    def sql(self, ctx):
        return _real(f"pow(CAST({self.a.sql(ctx)} AS DOUBLE), "
                     f"CAST({self.b.sql(ctx)} AS DOUBLE))")


def powf(a: VS, b: VS) -> VS:
    return _Pow(a, b)


class _Div(VS):
    def __init__(self, a: VS, b: VS):
        self.a, self.b = a, b

    def eval(self, ctx):
        with np.errstate(divide="ignore", invalid="ignore"):
            return self.a.eval(ctx) / self.b.eval(ctx)

    def sql(self, ctx):
        return _real(f"({self.a.sql(ctx)}) / ({self.b.sql(ctx)})")


def divf(a: VS, b: VS) -> VS:
    return _Div(a, b)


class _Multi(VS):
    def __init__(self, kind: str, subs: list[VS]):
        self.kind, self.subs = kind, subs

    def eval(self, ctx):
        k = self.kind
        if k == "product":
            acc = np.full(ctx.n_docs, _F(1.0), dtype=np.float32)
            for s in self.subs:
                acc = acc * s.eval(ctx)
            return acc
        if k == "sum":
            acc = np.zeros(ctx.n_docs, dtype=np.float32)
            for s in self.subs:
                acc = acc + s.eval(ctx)
            return acc
        if k in ("max", "min"):
            op = np.maximum if k == "max" else np.minimum
            acc = self.subs[0].eval(ctx)
            for s in self.subs[1:]:
                acc = op(acc, s.eval(ctx))
            return acc
        raise ValueError(k)

    def sql(self, ctx):
        parts = [f"({s.sql(ctx)})" for s in self.subs]
        k = self.kind
        if k in ("product", "sum"):
            op = " * " if k == "product" else " + "
            expr = parts[0]
            for p in parts[1:]:
                expr = _real(f"{expr}{op}{p}")
            return expr if len(parts) > 1 else _real(parts[0])
        fn = "greatest" if k == "max" else "least"
        expr = parts[0]
        for p in parts[1:]:
            expr = _real(f"{fn}({expr}, {p})")
        return expr if len(parts) > 1 else _real(parts[0])


def product(*subs: VS) -> VS:
    return _Multi("product", list(subs))


def sumf(*subs: VS) -> VS:
    return _Multi("sum", list(subs))


def maxf(*subs: VS) -> VS:
    return _Multi("max", list(subs))


def minf(*subs: VS) -> VS:
    return _Multi("min", list(subs))


class _Scale(VS):
    def __init__(self, src: VS, lo: float, hi: float):
        self.src, self.lo, self.hi = src, _F(lo), _F(hi)

    def _info(self, ctx):
        v = self.src.eval(ctx)
        ok = ~np.isnan(v)
        if not ok.any():
            return _F(0.0), _F(0.0)
        return v[ok].min(), v[ok].max()

    def eval(self, ctx):
        v = self.src.eval(ctx)
        ok = ~np.isnan(v)
        if not ok.any():
            mn = mx = _F(0.0)
        else:
            mn, mx = v[ok].min(), v[ok].max()
        scale = _F(0.0) if mx - mn == 0 else (self.hi - self.lo) / (mx - mn)
        return (v - mn) * scale + self.lo

    def sql(self, ctx):
        # the min/max pass is an index-wide aggregate; in SQL it is a
        # scalar subquery over the same per-doc table (ctx.table), so
        # the oracle stays independent of the engine's pass
        s = self.src.sql(ctx)
        table = getattr(ctx, "table", None)
        if table is None:
            mn, mx = self._info(ctx)
            sc = _F(0.0) if mx - mn == 0 \
                else (self.hi - self.lo) / (mx - mn)
            mn_sql, sc_sql = repr(float(mn)), repr(float(sc))
        else:
            mn_sql = (f"(SELECT CAST(min(x) AS REAL) FROM "
                      f"(SELECT {s} AS x FROM {table}))")
            mx_sql = (f"(SELECT CAST(max(x) AS REAL) FROM "
                      f"(SELECT {s} AS x FROM {table}))")
            span = _real(f"{mx_sql} - {mn_sql}")
            hi_lo = repr(float(self.hi - self.lo))
            sc_sql = (f"(CASE WHEN {span} = 0.0 THEN CAST(0.0 AS REAL) "
                      f"ELSE CAST({hi_lo} / {span} AS REAL) END)")
        stepped = _real(f"({s}) - {mn_sql}")
        return _real(_real(f"{stepped} * {sc_sql}")
                     + f" + {float(self.lo)!r}")


def scale(src: VS, lo: float, hi: float) -> VS:
    return _Scale(src, lo, hi)


def function_query_scores(vs: VS, ctx, boost: float = 1.0) -> np.ndarray:
    """FunctionQuery.AllScorer.score (FunctionQuery.java:130-136):
    boost * val, with val < 0 or NaN clamped to 0; matches every doc."""
    val = vs.eval(ctx)
    out = _F(boost) * val
    bad = ~(val >= 0)
    out[bad] = _F(0.0)
    return out


class _CmpBool(VS):
    """ComparisonBoolFunction (valuesource/ComparisonBoolFunction.java:30
    + the gt/gte/lt/lte/eq/neq factories in BoolFunction usage): boolVal
    compares the two sides' floatVal; as a value, true is 1.0f and
    false 0.0f (FunctionValues.floatVal of BoolDocValues)."""

    def __init__(self, op: str, a: VS, b: VS):
        self.op, self.a, self.b = op, a, b

    def bool_eval(self, ctx) -> np.ndarray:
        av, bv = self.a.eval(ctx), self.b.eval(ctx)
        return {"gt": av > bv, "gte": av >= bv, "lt": av < bv,
                "lte": av <= bv, "eq": av == bv,
                "neq": av != bv}[self.op]

    def eval(self, ctx):
        return np.where(self.bool_eval(ctx), _F(1.0), _F(0.0))

    def bool_sql(self, ctx) -> str:
        sym = {"gt": ">", "gte": ">=", "lt": "<", "lte": "<=",
               "eq": "=", "neq": "<>"}[self.op]
        return f"(({self.a.sql(ctx)}) {sym} ({self.b.sql(ctx)}))"

    def sql(self, ctx):
        return (f"CAST(CASE WHEN {self.bool_sql(ctx)} THEN 1.0 "
                f"ELSE 0.0 END AS REAL)")


def cmp(op: str, a: VS, b: VS) -> VS:
    return _CmpBool(op, a, b)


class _If(VS):
    """IfFunction (valuesource/IfFunction.java:61): condition's boolVal
    selects between the two sources; a non-bool condition uses the
    default FunctionValues.boolVal = floatVal != 0."""

    def __init__(self, cond: VS, then: VS, els: VS):
        self.cond, self.then, self.els = cond, then, els

    def _cond_bool(self, ctx) -> np.ndarray:
        if isinstance(self.cond, _CmpBool):
            return self.cond.bool_eval(ctx)
        return self.cond.eval(ctx) != np.float32(0.0)

    def eval(self, ctx):
        return np.where(self._cond_bool(ctx), self.then.eval(ctx),
                        self.els.eval(ctx))

    def sql(self, ctx):
        if isinstance(self.cond, _CmpBool):
            c = self.cond.bool_sql(ctx)
        else:
            c = f"(({self.cond.sql(ctx)}) <> 0.0)"
        return (f"CAST(CASE WHEN {c} THEN ({self.then.sql(ctx)}) "
                f"ELSE ({self.els.sql(ctx)}) END AS REAL)")


def if_(cond: VS, then: VS, els: VS) -> VS:
    return _If(cond, then, els)
