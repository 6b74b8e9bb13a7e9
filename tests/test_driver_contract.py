"""Mimics the driver's correctness gate: run every queries() entry at
sf0.001 and compare against oracle_sql() via DuckDB — row count, column
names, and order-insensitive value equality."""

import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(res):
    import pyarrow as pa
    import ray.data
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def duck(sql: str) -> pd.DataFrame:
    import duckdb
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con.execute(sql).df()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def compare(name, got: pd.DataFrame, want: pd.DataFrame):
    assert sorted(got.columns) == sorted(want.columns), \
        f"{name}: cols {sorted(got.columns)} vs {sorted(want.columns)}"
    assert len(got) == len(want), f"{name}: rows {len(got)} vs {len(want)}"
    g, w = canon(got), canon(want)
    for c in g.columns:
        gv, wv = g[c].to_numpy(), w[c].to_numpy()
        if np.issubdtype(gv.dtype, np.floating) or \
                np.issubdtype(np.asarray(wv).dtype, np.floating):
            np.testing.assert_allclose(
                gv.astype(np.float64), np.asarray(wv, dtype=np.float64),
                rtol=0, atol=0, err_msg=f"{name}.{c}")
        else:
            np.testing.assert_array_equal(gv, wv, err_msg=f"{name}.{c}")


@pytest.fixture(scope="module")
def contract(ray_session):
    import __ray_entry__ as e
    return e.queries(), e.oracle_sql()


def test_all_oracle_queries(contract):
    queries, oracles = contract
    failures = []
    for name, sql in oracles.items():
        fn = queries[name]
        try:
            got = to_pandas(fn(SF_DIR))
            want = duck(sql)
            compare(name, got, want)
        except Exception as ex:  # noqa: BLE001
            failures.append(f"{name}: {type(ex).__name__}: {ex}")
    assert not failures, "\n".join(failures)


def test_rows_only_queries_run(contract):
    queries, oracles = contract
    for name, fn in queries.items():
        if name in oracles:
            continue
        got = to_pandas(fn(SF_DIR))
        assert len(got) >= 0


def test_entry_smoke(ray_session):
    import __ray_entry__ as e
    res = to_pandas(e.entry())
    assert len(res) > 0
    assert set(res.columns) >= {"qid", "rank", "doc_id", "score"}
