"""Temporal joins (asof / lag / range): oracle parity at sf0.001 plus
the block-boundary cases the sf data cannot force — a hot key spanning
many blocks (carry chain depth > 1) and empty inputs."""

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"


def _duck(sql: str, d: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ("events", "orders"):
        p = os.path.join(d, f"{t}.parquet")
        if os.path.isdir(p):
            p = os.path.join(p, "*.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con.execute(sql).df()


def _compare(got: pd.DataFrame, want: pd.DataFrame):
    assert sorted(got.columns) == sorted(want.columns)
    assert len(got) == len(want)
    g = got[sorted(got.columns)].sort_values(
        sorted(got.columns)).reset_index(drop=True)
    w = want[sorted(want.columns)].sort_values(
        sorted(want.columns)).reset_index(drop=True)
    for c in g.columns:
        np.testing.assert_array_equal(
            g[c].to_numpy(), w[c].to_numpy().astype(g[c].dtype),
            err_msg=c)


@pytest.mark.parametrize("op", ["asof", "lag", "range"])
def test_oracle_parity_sf(ray_session, op):
    from lucene_ray.pipelines import temporal as tp

    fn, sql = {
        "asof": (tp.events_asof_join, tp.oracle_asof_join_sql()),
        "lag": (tp.events_lag_delta, tp.oracle_lag_delta_sql()),
        "range": (tp.join_range_orders, tp.oracle_join_range_sql()),
    }[op]
    _compare(fn(SF_DIR).to_pandas(), _duck(sql, SF_DIR))


def _write_corpus(d, ev_ids, ev_user, ev_ep, ev_val,
                  o_ids, o_cust, o_ep, o_price, n_files=8):
    """Write events/orders as DIRECTORIES of n_files parquet files so
    Ray reads many blocks and the sorted-block carry chain is deep."""
    def _ts(ep):
        return pa.array(np.asarray(ep, np.int64) * 1_000_000,
                        pa.timestamp("us"))

    os.makedirs(os.path.join(d, "events.parquet"))
    os.makedirs(os.path.join(d, "orders.parquet"))
    for i, part in enumerate(np.array_split(np.arange(len(ev_ids)),
                                            n_files)):
        pq.write_table(pa.table({
            "event_id": pa.array(np.asarray(ev_ids)[part], pa.int64()),
            "ts": _ts(np.asarray(ev_ep)[part]),
            "user_id": pa.array(np.asarray(ev_user)[part], pa.int64()),
            "event_type": pa.array(["x"] * len(part)),
            "value": pa.array(np.asarray(ev_val, np.float64)[part]),
            "props": pa.array(["{}"] * len(part)),
        }), os.path.join(d, "events.parquet", f"p{i}.parquet"))
    for i, part in enumerate(np.array_split(np.arange(len(o_ids)),
                                            max(1, min(n_files,
                                                       len(o_ids))))):
        pq.write_table(pa.table({
            "o_orderkey": pa.array(np.asarray(o_ids)[part], pa.int64()),
            "o_custkey": pa.array(np.asarray(o_cust)[part], pa.int64()),
            "o_orderstatus": pa.array(["O"] * len(part)),
            "o_totalprice": pa.array(
                np.asarray(o_price, np.float64)[part]),
            "o_orderdate": _ts(np.asarray(o_ep)[part]),
            "o_orderpriority": pa.array(["1"] * len(part)),
        }), os.path.join(d, "orders.parquet", f"p{i}.parquet"))


def test_asof_hot_key_multiblock(ray_session, tmp_path):
    """One user owns 4000 events across 8 files with only 5 early
    orders — the carry must propagate through order-free blocks; a
    second user interleaves ids to catch key-run boundary bugs."""
    from lucene_ray.pipelines import temporal as tp

    rng = np.random.RandomState(7)
    n = 4000
    ev_ep = np.sort(rng.randint(1_000_000, 2_000_000, n))
    ev_user = np.where(np.arange(n) % 17 == 0, 2, 1)
    o_ep = np.array([900_000, 1_100_000, 1_100_000, 1_500_000,
                     2_000_001])
    o_cust = np.array([1, 1, 1, 1, 2])
    o_ids = np.array([10, 11, 12, 13, 14])
    o_price = np.array([1.5, 2.5, 3.5, 4.5, 5.5])
    d = str(tmp_path)
    _write_corpus(d, np.arange(n), ev_user, ev_ep,
                  rng.rand(n), o_ids, o_cust, o_ep, o_price)

    got = tp.events_asof_join(d).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    assert len(got) == n
    # brute-force reference: orders sorted by (ep, id); latest <= ev_ep
    for u in (1, 2):
        om = o_cust == u
        oe, oi, op_ = o_ep[om], o_ids[om], o_price[om]
        order = np.lexsort((oi, oe))
        oe, oi, op_ = oe[order], oi[order], op_[order]
        em = got["user_id"].to_numpy() == u
        pos = np.searchsorted(oe, got["ev_epoch"].to_numpy()[em],
                              side="right") - 1
        hit = pos >= 0
        np.testing.assert_array_equal(
            got["o_orderkey"].to_numpy()[em],
            np.where(hit, oi[np.maximum(pos, 0)], -1))
        np.testing.assert_array_equal(
            got["o_totalprice"].to_numpy()[em],
            np.where(hit, op_[np.maximum(pos, 0)], 0.0))
    # ties on o_epoch resolve to the max orderkey (ids 11 vs 12)
    tied = got[(got["user_id"] == 1) & (got["o_epoch"] == 1_100_000)]
    assert (tied["o_orderkey"] == 12).all() and len(tied) > 0
    # user 2's only order is strictly later than every event
    u2 = got[got["user_id"] == 2]
    assert (u2["o_orderkey"] == -1).all() and (u2["o_totalprice"] == 0).all()


def test_lag_hot_key_multiblock(ray_session, tmp_path):
    from lucene_ray.pipelines import temporal as tp

    rng = np.random.RandomState(3)
    n = 3000
    ev_ep = np.sort(rng.randint(0, 500_000, n))
    ev_val = rng.rand(n) * 10
    d = str(tmp_path)
    _write_corpus(d, np.arange(n), np.ones(n, np.int64), ev_ep, ev_val,
                  [1], [99], [1], [1.0])
    got = tp.events_lag_delta(d).to_pandas()
    want = _duck(tp.oracle_lag_delta_sql(), d)
    _compare(got, want)


def test_temporal_empty_events(ray_session, tmp_path):
    from lucene_ray.pipelines import temporal as tp

    d = str(tmp_path)
    _write_corpus(d, [], [], [], [], [1, 2], [5, 5],
                  [100, 200], [1.0, 2.0], n_files=1)
    assert len(tp.events_asof_join(d).to_pandas()) == 0
    assert len(tp.events_lag_delta(d).to_pandas()) == 0
    # range join is over orders only — both orders fall in one window
    got = tp.join_range_orders(d).to_pandas()
    _compare(got, _duck(tp.oracle_join_range_sql(), d))
