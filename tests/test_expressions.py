"""Expression compiler (lucene_ray/expressions.py): parse, eval, and
engine↔SQL parity on random float32 inputs."""

import duckdb
import numpy as np
import pytest

from lucene_ray.expressions import compile_expr


def test_parse_and_variables():
    ex = compile_expr("score + 0.25 * log(1 + len) - min(score, 2)")
    assert ex.variables == ["score", "len"]
    v = ex.eval({"score": np.float32(1.0), "len": np.float32(0.0)})
    assert v.dtype == np.float32
    # log(1) == 0, min(1,2) == 1 → 1 + 0 - 1 == 0
    assert float(v) == 0.0


def test_parse_errors():
    for bad in ("score +", "foo(1)", "min(1)", "(a", "a b", "log(1,2)"):
        with pytest.raises(ValueError):
            compile_expr(bad)


def test_unbound_variable():
    ex = compile_expr("a + b")
    with pytest.raises(KeyError):
        ex.eval({"a": np.float32(1)})


def test_negation_and_precedence():
    ex = compile_expr("-x * 2 + 3 / (1 + 1)")
    v = ex.eval({"x": np.float32(1.5)})
    assert float(v) == -1.5


@pytest.mark.parametrize("src", [
    "x + 0.25 * log(1 + y)",
    "2 * x + sqrt(y) / (1 + min(x, 1.5))",
    "max(x, 0.5) * (1 + abs(x - 0.4))",
    "-x + y * y - 0.098782524466514587",
])
def test_sql_parity(src):
    """eval() and sql() must agree bit-for-bit on float32 inputs."""
    rng = np.random.default_rng(7)
    x = rng.uniform(0.01, 9.0, 64).astype(np.float32)
    y = rng.uniform(1.0, 500.0, 64).astype(np.float32)
    ex = compile_expr(src)
    got = ex.eval({"x": x, "y": y})
    con = duckdb.connect()
    con.execute("CREATE TABLE t (x REAL, y REAL)")
    con.executemany("INSERT INTO t VALUES (?, ?)",
                    list(zip(map(float, x), map(float, y))))
    sql = ex.sql({"x": "x", "y": "y"})
    want = con.execute(
        f"SELECT CAST({sql} AS REAL) FROM t").df().iloc[:, 0].to_numpy()
    np.testing.assert_array_equal(got.astype(np.float64),
                                  want.astype(np.float64))
