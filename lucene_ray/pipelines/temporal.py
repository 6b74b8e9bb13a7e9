"""Temporal joins over the event/order streams: AS-OF join, per-key
LAG (lag/lead delta), and a time-range (interval) self join.

Ray Data has no asof/range join and the reference engine has no
relational joins at all beyond JoinUtil's key semi-join
(``lucene/join/src/java/org/apache/lucene/search/join/JoinUtil.java:73``)
— these are the stream-/time-shaped operators a training-data pipeline
needs next to the window aggregates in ``streaming.py``, expressed
Ray-Data-first.

Scale design — the SORTED-BLOCK SCAN shape shared by the asof join and
the lag operator:

1. one global range-partitioning ``sort`` on (key, t, ...) — the only
   all-to-all exchange;
2. pass A: a map-only summary pass emitting ONE ROW PER BLOCK (first-row
   identity + per-key tail state);
3. a driver-side carry chain over the block summaries (O(#blocks),
   nothing row-sized — block order is recovered by sorting summaries on
   their first-row identity, which the global sort made monotone);
4. pass B: a map-only resolve pass, each block reading its carry-in from
   one broadcast dict.

Because the sort makes every key's run CONTIGUOUS, only a block's FIRST
key can depend on earlier blocks, so carry state is one tuple per block
regardless of skew — a billion-event hot user costs one dict entry, not
a per-user group (the round-2 verdict's skew rule, same fix shape as
``streaming.events_sessionize``).

The range join instead uses BUCKET REPLICATION: with window radius W and
bucket width W, each right row is replicated into its home bucket ±1 and
each left row joins only inside its home (key, bucket) group — every
qualifying pair meets in exactly one group, and a group holds at most
three buckets' worth of one key's rows (bounded by per-key rate, not by
total key volume).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

_US = 1_000_000


def _epoch_us(col: pa.ChunkedArray) -> np.ndarray:
    ts = col.to_numpy(zero_copy_only=False)
    return ts.astype("datetime64[us]").astype(np.int64)


def _events(sf_dir: str, cols):
    import ray.data

    return ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                                 columns=list(cols))


def _orders(sf_dir: str, cols):
    import ray.data

    return ray.data.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                                 columns=list(cols))


# --------------------------------------------------------------------------
# AS-OF join: each event matched to the user's latest order at-or-before
# the event timestamp (ties on order date broken by max o_orderkey so the
# pick is deterministic and SQL-reproducible).
# --------------------------------------------------------------------------

def events_asof_join(sf_dir: str):
    """ASOF JOIN events → orders on user key, ``o_epoch <= ev_epoch``,
    latest wins (tie-break: max o_orderkey). Returns one row per event:
    (event_id, user_id, ev_epoch, o_orderkey, o_epoch, o_totalprice),
    with (-1, -1, 0.0) for events with no prior order.

    Both sides are tagged and unioned, then ONE global sort on
    (key, t, side, id) — side 0 = order sorts before side 1 = event at
    equal t, giving the >= asof semantics; ascending id makes "last seen
    order" the max-orderkey tie-break. Resolution is a vectorized
    in-block cummax scan; cross-block carry is the sorted-block-scan
    chain described in the module docstring."""
    import ray

    def tag_events(b: pa.Table) -> pa.Table:
        return pa.table({
            "key": b.column("user_id").cast(pa.int64()),
            "t": pa.array(_epoch_us(b.column("ts")) // _US, pa.int64()),
            "side": pa.array(np.ones(b.num_rows, np.int64)),
            "id": b.column("event_id").cast(pa.int64()),
            "price": pa.array(np.zeros(b.num_rows, np.float64)),
        })

    def tag_orders(b: pa.Table) -> pa.Table:
        return pa.table({
            "key": b.column("o_custkey").cast(pa.int64()),
            "t": pa.array(_epoch_us(b.column("o_orderdate")) // _US,
                          pa.int64()),
            "side": pa.array(np.zeros(b.num_rows, np.int64)),
            "id": b.column("o_orderkey").cast(pa.int64()),
            "price": b.column("o_totalprice").cast(pa.float64()),
        })

    ev = _events(sf_dir, ("event_id", "user_id", "ts")) \
        .map_batches(tag_events, batch_format="pyarrow")
    od = _orders(sf_dir, ("o_orderkey", "o_custkey", "o_orderdate",
                          "o_totalprice")) \
        .map_batches(tag_orders, batch_format="pyarrow")
    u = ev.union(od).sort(["key", "t", "side", "id"]).materialize()

    def _arrays(b: pa.Table):
        return (b.column("key").to_numpy(zero_copy_only=False),
                b.column("t").to_numpy(zero_copy_only=False),
                b.column("side").to_numpy(zero_copy_only=False),
                b.column("id").to_numpy(zero_copy_only=False),
                b.column("price").to_numpy(zero_copy_only=False))

    _EMPTY_SUM = pa.table({c: pa.array([], pa.int64()) for c in
                           ("f_key", "f_t", "f_side", "f_id", "last_key",
                            "tail_has", "tail_t", "tail_id")}
                          ).append_column("tail_price",
                                          pa.array([], pa.float64()))

    def summarize(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _EMPTY_SUM
        key, t, side, iid, price = _arrays(b)
        pos = np.arange(len(key), dtype=np.int64)
        new = np.concatenate([[True], key[1:] != key[:-1]])
        run_start = np.maximum.accumulate(np.where(new, pos, -1))
        last_ord = np.maximum.accumulate(np.where(side == 0, pos, -1))
        has = bool(last_ord[-1] >= run_start[-1])
        j = int(last_ord[-1]) if has else 0
        return pa.table({
            "f_key": pa.array([int(key[0])], pa.int64()),
            "f_t": pa.array([int(t[0])], pa.int64()),
            "f_side": pa.array([int(side[0])], pa.int64()),
            "f_id": pa.array([int(iid[0])], pa.int64()),
            "last_key": pa.array([int(key[-1])], pa.int64()),
            "tail_has": pa.array([int(has)], pa.int64()),
            "tail_t": pa.array([int(t[j])], pa.int64()),
            "tail_id": pa.array([int(iid[j])], pa.int64()),
            "tail_price": pa.array([float(price[j])], pa.float64()),
        })

    from lucene_ray.pipelines.util import ensure_cols

    summ = ensure_cols(
        u.map_batches(summarize, batch_size=None,
                      batch_format="pyarrow").to_pandas(),
        _EMPTY_SUM.column_names).sort_values(
            ["f_key", "f_t", "f_side", "f_id"])
    # driver carry chain: O(#blocks) rows, one (t, id, price) per block
    carry: dict = {}
    cur_key, cur = None, None
    for r in summ.itertuples(index=False):
        bid = (int(r.f_key), int(r.f_t), int(r.f_side), int(r.f_id))
        carry[bid] = cur if cur_key == r.f_key else None
        if r.tail_has:
            cur_key, cur = int(r.last_key), (int(r.tail_t), int(r.tail_id),
                                             float(r.tail_price))
        elif int(r.last_key) != cur_key:
            cur_key, cur = int(r.last_key), None
    cref = ray.put(carry)

    _EMPTY_OUT = pa.table({
        "event_id": pa.array([], pa.int64()),
        "user_id": pa.array([], pa.int64()),
        "ev_epoch": pa.array([], pa.int64()),
        "o_orderkey": pa.array([], pa.int64()),
        "o_epoch": pa.array([], pa.int64()),
        "o_totalprice": pa.array([], pa.float64())})

    def resolve(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _EMPTY_OUT
        key, t, side, iid, price = _arrays(b)
        bid = (int(key[0]), int(t[0]), int(side[0]), int(iid[0]))
        cin = ray.get(cref)[bid]
        pos = np.arange(len(key), dtype=np.int64)
        new = np.concatenate([[True], key[1:] != key[:-1]])
        run_start = np.maximum.accumulate(np.where(new, pos, -1))
        last_ord = np.maximum.accumulate(np.where(side == 0, pos, -1))
        evm = side == 1
        ok = last_ord >= run_start
        li = np.where(ok, last_ord, 0)
        o_t = np.where(ok, t[li], -1)
        o_id = np.where(ok, iid[li], -1)
        o_pr = np.where(ok, price[li], 0.0)
        if cin is not None:
            head = evm & ~ok & (key == key[0])
            o_t = np.where(head, cin[0], o_t)
            o_id = np.where(head, cin[1], o_id)
            o_pr = np.where(head, cin[2], o_pr)
        return pa.table({
            "event_id": pa.array(iid[evm]),
            "user_id": pa.array(key[evm]),
            "ev_epoch": pa.array(t[evm]),
            "o_orderkey": pa.array(o_id[evm].astype(np.int64)),
            "o_epoch": pa.array(o_t[evm].astype(np.int64)),
            "o_totalprice": pa.array(o_pr[evm].astype(np.float64))})

    return u.map_batches(resolve, batch_size=None, batch_format="pyarrow")


def oracle_asof_join_sql() -> str:
    return """WITH e AS (
  SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ev_epoch
  FROM events
),
o AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(floor(epoch(o_orderdate)) AS BIGINT) AS o_epoch
  FROM orders
),
m AS (
  SELECT e.event_id, o.o_orderkey, o.o_epoch, o.o_totalprice,
         row_number() OVER (PARTITION BY e.event_id
                            ORDER BY o.o_epoch DESC, o.o_orderkey DESC)
           AS rn
  FROM e JOIN o ON o.o_custkey = e.user_id AND o.o_epoch <= e.ev_epoch
)
SELECT e.event_id, e.user_id, e.ev_epoch,
       COALESCE(m.o_orderkey, -1) AS o_orderkey,
       COALESCE(m.o_epoch, -1) AS o_epoch,
       COALESCE(m.o_totalprice, 0.0) AS o_totalprice
FROM e LEFT JOIN (SELECT * FROM m WHERE rn = 1) m USING (event_id)"""


# --------------------------------------------------------------------------
# Per-key LAG: previous-event epoch / gap / value delta per user.
# --------------------------------------------------------------------------

def events_lag_delta(sf_dir: str):
    """Per-user LAG over the event stream (window-function shape Ray
    Data lacks): for each event, the previous event's epoch, the gap in
    seconds and the value delta, ordered by (ts, event_id) within the
    user. First event per user gets (prev_epoch=-1, gap_s=-1,
    value_delta=0.0).

    Same sorted-block scan as the asof join, with a simpler carry: a
    block's carry-in is just the previous block's LAST ROW (epoch,
    value) when it belongs to the same user."""
    import ray

    def tag(b: pa.Table) -> pa.Table:
        return pa.table({
            "key": b.column("user_id").cast(pa.int64()),
            "tus": pa.array(_epoch_us(b.column("ts")), pa.int64()),
            "id": b.column("event_id").cast(pa.int64()),
            "value": b.column("value").cast(pa.float64())})

    u = (_events(sf_dir, ("event_id", "user_id", "ts", "value"))
         .map_batches(tag, batch_format="pyarrow")
         .sort(["key", "tus", "id"]).materialize())

    def _arrays(b: pa.Table):
        return (b.column("key").to_numpy(zero_copy_only=False),
                b.column("tus").to_numpy(zero_copy_only=False),
                b.column("id").to_numpy(zero_copy_only=False),
                b.column("value").to_numpy(zero_copy_only=False))

    _EMPTY_SUM = pa.table({
        "f_key": pa.array([], pa.int64()),
        "f_tus": pa.array([], pa.int64()),
        "f_id": pa.array([], pa.int64()),
        "l_key": pa.array([], pa.int64()),
        "l_tus": pa.array([], pa.int64()),
        "l_value": pa.array([], pa.float64())})

    def summarize(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _EMPTY_SUM
        key, tus, iid, val = _arrays(b)
        return pa.table({
            "f_key": pa.array([int(key[0])], pa.int64()),
            "f_tus": pa.array([int(tus[0])], pa.int64()),
            "f_id": pa.array([int(iid[0])], pa.int64()),
            "l_key": pa.array([int(key[-1])], pa.int64()),
            "l_tus": pa.array([int(tus[-1])], pa.int64()),
            "l_value": pa.array([float(val[-1])], pa.float64())})

    from lucene_ray.pipelines.util import ensure_cols

    summ = ensure_cols(
        u.map_batches(summarize, batch_size=None,
                      batch_format="pyarrow").to_pandas(),
        _EMPTY_SUM.column_names).sort_values(["f_key", "f_tus", "f_id"])
    carry: dict = {}
    prev = None                       # (last_key, last_tus, last_value)
    for r in summ.itertuples(index=False):
        bid = (int(r.f_key), int(r.f_tus), int(r.f_id))
        carry[bid] = (prev[1], prev[2]) \
            if prev is not None and prev[0] == r.f_key else None
        prev = (int(r.l_key), int(r.l_tus), float(r.l_value))
    cref = ray.put(carry)

    _EMPTY_OUT = pa.table({
        "event_id": pa.array([], pa.int64()),
        "user_id": pa.array([], pa.int64()),
        "ev_epoch": pa.array([], pa.int64()),
        "prev_epoch": pa.array([], pa.int64()),
        "gap_s": pa.array([], pa.int64()),
        "value_delta": pa.array([], pa.float64())})

    def resolve(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _EMPTY_OUT
        key, tus, iid, val = _arrays(b)
        bid = (int(key[0]), int(tus[0]), int(iid[0]))
        cin = ray.get(cref)[bid]
        p_tus = np.concatenate([[np.int64(-1)], tus[:-1]])
        p_val = np.concatenate([[0.0], val[:-1]])
        first = np.concatenate([[True], key[1:] != key[:-1]])
        if cin is not None:
            first[0] = False
            p_tus[0] = cin[0]
            p_val[0] = cin[1]
        ep = tus // _US
        p_ep = np.where(first, np.int64(-1), p_tus // _US)
        return pa.table({
            "event_id": pa.array(iid),
            "user_id": pa.array(key),
            "ev_epoch": pa.array(ep),
            "prev_epoch": pa.array(p_ep),
            "gap_s": pa.array(np.where(first, np.int64(-1), ep - p_ep)),
            "value_delta": pa.array(
                np.where(first, 0.0, val - p_val).astype(np.float64))})

    return u.map_batches(resolve, batch_size=None, batch_format="pyarrow")


def oracle_lag_delta_sql() -> str:
    return """WITH e AS (
  SELECT event_id, user_id, ts, value,
         CAST(floor(epoch(ts)) AS BIGINT) AS ev_epoch,
         lag(CAST(floor(epoch(ts)) AS BIGINT))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS p_ep,
         lag(value)
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS p_val
  FROM events
)
SELECT event_id, user_id, ev_epoch,
       COALESCE(p_ep, -1) AS prev_epoch,
       CASE WHEN p_ep IS NULL THEN -1 ELSE ev_epoch - p_ep END AS gap_s,
       CASE WHEN p_ep IS NULL THEN 0.0 ELSE value - p_val END
         AS value_delta
FROM e"""


# --------------------------------------------------------------------------
# Time-range (interval) self join on orders.
# --------------------------------------------------------------------------

_RANGE_W_S = 90 * 86400          # ±90-day window radius


def join_range_orders(sf_dir: str, w_s: int = _RANGE_W_S):
    """Interval join: for each order, aggregate the SAME CUSTOMER's
    orders dated within ±w_s seconds (inclusive, self included so every
    window is non-empty): count, max price, window min/max epoch.

    Bucket-replication shape: bucket width = w_s; each order is a left
    row in its home bucket and a right row replicated into home ±1, so
    every pair within the window radius meets in exactly the left row's
    group — no all-pairs, group size bounded by a key's 3-bucket rate.
    Per-group work is vectorized: sort rights once, searchsorted both
    window edges, maximum.reduceat over the [lo,hi) slices."""
    import pandas as pd

    def fan(b: pa.Table) -> pa.Table:
        key = b.column("o_custkey").to_numpy(zero_copy_only=False)
        ep = _epoch_us(b.column("o_orderdate")) // _US
        iid = b.column("o_orderkey").to_numpy(zero_copy_only=False)
        price = b.column("o_totalprice").to_numpy(zero_copy_only=False)
        home = ep // w_s
        # left copy (role 1) in home; right copies (role 0) in home ±0,1
        reps = np.array([-1, 0, 1], dtype=np.int64)
        n = len(key)
        rb = np.repeat(home, 3) + np.tile(reps, n)
        return pa.table({
            "key": pa.array(np.concatenate([key, np.repeat(key, 3)])),
            "bucket": pa.array(np.concatenate([home, rb])),
            "role": pa.array(np.concatenate(
                [np.ones(n, np.int64), np.zeros(3 * n, np.int64)])),
            "id": pa.array(np.concatenate([iid, np.repeat(iid, 3)])),
            "ep": pa.array(np.concatenate([ep, np.repeat(ep, 3)])),
            "price": pa.array(np.concatenate(
                [price, np.repeat(price, 3)]))})

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["role"] == 1]
        if len(left) == 0:
            return pd.DataFrame({c: [] for c in
                                 ("o_orderkey", "n_window", "max_price",
                                  "first_ep", "last_ep")})
        right = g[g["role"] == 0].sort_values("ep")
        rep = right["ep"].to_numpy()
        rpr = right["price"].to_numpy()
        lep = left["ep"].to_numpy()
        lo = np.searchsorted(rep, lep - w_s, side="left")
        hi = np.searchsorted(rep, lep + w_s, side="right")
        # self is always inside the window, so hi > lo for every left
        guarded = np.append(rpr, -np.inf)      # legalizes hi == len(rep)
        idx = np.column_stack([lo, hi]).ravel()
        mx = np.maximum.reduceat(guarded, idx)[::2]
        return pd.DataFrame({
            "o_orderkey": left["id"].to_numpy(),
            "n_window": (hi - lo).astype(np.int64),
            "max_price": mx.astype(np.float64),
            "first_ep": rep[lo].astype(np.int64),
            "last_ep": rep[hi - 1].astype(np.int64)})

    return (_orders(sf_dir, ("o_orderkey", "o_custkey", "o_orderdate",
                             "o_totalprice"))
            .map_batches(fan, batch_format="pyarrow")
            .groupby(["key", "bucket"])
            .map_groups(per_group, batch_format="pandas"))


def oracle_join_range_sql(w_s: int = _RANGE_W_S) -> str:
    return f"""WITH o AS (
  SELECT o_orderkey, o_custkey, o_totalprice,
         CAST(floor(epoch(o_orderdate)) AS BIGINT) AS ep
  FROM orders
)
SELECT l.o_orderkey,
       count(*) AS n_window,
       max(r.o_totalprice) AS max_price,
       min(r.ep) AS first_ep,
       max(r.ep) AS last_ep
FROM o l JOIN o r
  ON r.o_custkey = l.o_custkey
 AND r.ep BETWEEN l.ep - {w_s} AND l.ep + {w_s}
GROUP BY l.o_orderkey"""
