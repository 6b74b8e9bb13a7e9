"""Stream-shaped operators over the ``events`` table.

Ray Data is a (streaming-)batch engine with no event-time watermarks; the
reference likewise has no streaming operators (its NRT path is micro-batch
segment publication, ``search/SearcherManager.java:53`` — SURVEY.md §2.10).
Stream-shaped workloads are expressed as an ordered, partitioned log.

Both operators are skew-safe (the round-2 verdict's fix — no per-user
pandas group ever materializes a hot user's full event stream in one
task):

- tumbling window: the window id is a per-row function of the timestamp,
  so the whole operator is a per-batch Arrow partial aggregation followed
  by a small combiner ``groupby`` — a 10⁹-event user contributes only
  (n_windows × n_batches) partial rows to the shuffle.
- sessionize: global ``sort(["user_id", "ts"])`` (range shuffle), then a
  per-batch SEGMENTED session assignment (numpy run boundaries — each
  batch is a contiguous sorted run) emitting one summary row per session
  fragment; fragments are stitched with the same gap rule on the summary
  table, which is smaller than the event log by the mean session length.
  A hot user's cost in any single task is one sorted batch, never the
  whole stream.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

WINDOW_S = 3600  # tumbling 1h windows


def _events(sf_dir: str):
    import ray.data

    return ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                                 columns=["user_id", "ts", "event_type",
                                          "value"])


def _epochs(batch: pa.Table) -> np.ndarray:
    """floor(epoch(ts)) per row as int64 seconds."""
    ts = batch.column("ts").to_numpy(zero_copy_only=False)
    return ts.astype("datetime64[ns]").astype(np.int64) // 1_000_000_000


def events_tumbling_window(sf_dir: str):
    """Per-user tumbling-window aggregate: count + min/max epoch per
    (user, window). win_id is a pure row function, so this is a
    map_batches partial aggregate + combiner groupby — no sort, no
    per-user group."""
    from ray.data.aggregate import Max, Min, Sum

    def partial(batch: pa.Table) -> pa.Table:
        epoch = _epochs(batch)
        t = pa.table({
            "user_id": batch.column("user_id"),
            "win_id": pa.array(epoch // WINDOW_S, pa.int64()),
            "epoch": pa.array(epoch, pa.int64()),
        })
        g = t.group_by(["user_id", "win_id"]).aggregate(
            [("epoch", "count"), ("epoch", "min"), ("epoch", "max")])
        return g.rename_columns(["user_id", "win_id", "n_events",
                                 "first_epoch", "last_epoch"])

    agg = (_events(sf_dir)
           .map_batches(partial, batch_format="pyarrow")
           .groupby(["user_id", "win_id"])
           .aggregate(Sum("n_events", alias_name="n_events"),
                      Min("first_epoch", alias_name="first_epoch"),
                      Max("last_epoch", alias_name="last_epoch")))

    def fmt(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t.column("user_id"),
            "win_id": t.column("win_id").cast(pa.int64()),
            "n_events": t.column("n_events").cast(pa.int64()),
            "first_epoch": t.column("first_epoch").cast(pa.int64()),
            "last_epoch": t.column("last_epoch").cast(pa.int64()),
        })

    return agg.map_batches(fmt, batch_format="pyarrow")


def oracle_tumbling_window_sql() -> str:
    return f"""SELECT user_id,
       CAST(floor(floor(epoch(ts)) / {WINDOW_S}) AS BIGINT) AS win_id,
       count(*) AS n_events,
       min(floor(epoch(ts))::BIGINT) AS first_epoch,
       max(floor(epoch(ts))::BIGINT) AS last_epoch
FROM events GROUP BY user_id, win_id"""


def events_sessionize(sf_dir: str, gap_s: int = 1800):
    """Session windows: per-user sessions split on ts gaps > gap_s.
    Returns (user_id, session, n_events, start_epoch, end_epoch).

    sort(user, ts) → per-batch segmented fragment summaries → gap-rule
    stitch on summaries. The stitch groupby runs on ONE ROW PER FRAGMENT
    (≈ one per session plus one per batch boundary), so even a user with
    a billion events contributes only session-count rows to it."""

    def fragments(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "start_epoch": pa.array([], pa.int64()),
                             "end_epoch": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        u = batch.column("user_id").to_numpy(zero_copy_only=False)
        epoch = _epochs(batch)
        # batch = contiguous (user, ts)-sorted run → run boundaries are
        # user changes or over-gap steps; one summary row per run
        new = np.concatenate(
            [[True], (u[1:] != u[:-1]) | (np.diff(epoch) > gap_s)])
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(u)) - 1
        return pa.table({
            "user_id": pa.array(u[starts].astype(np.int64)),
            "start_epoch": pa.array(epoch[starts], pa.int64()),
            "end_epoch": pa.array(epoch[ends], pa.int64()),
            "n": pa.array((ends - starts + 1).astype(np.int64)),
        })

    def stitch(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["start_epoch", "end_epoch"])
        se = g["start_epoch"].to_numpy()
        ee = g["end_epoch"].to_numpy()
        n = g["n"].to_numpy()
        # fragments are time-disjoint contiguous runs of the sorted log,
        # so the event-level gap rule reduces to start - prev_end > gap
        new = np.concatenate([[True], (se[1:] - ee[:-1]) > gap_s])
        sid = np.cumsum(new) - 1
        b = np.flatnonzero(new)
        return pd.DataFrame({
            "user_id": np.repeat(g["user_id"].iloc[0], len(b)),
            "session": np.arange(len(b), dtype=np.int64),
            "n_events": np.add.reduceat(n, b).astype(np.int64),
            "start_epoch": se[b],
            "end_epoch": ee[np.append(b[1:], len(se)) - 1],
        })

    return (_events(sf_dir)
            .sort(["user_id", "ts"])
            .map_batches(fragments, batch_format="pyarrow")
            .groupby("user_id")
            .map_groups(stitch, batch_format="pandas"))


def oracle_sessionize_sql(gap_s: int = 1800) -> str:
    return f"""WITH e AS (
  SELECT user_id, ts, floor(epoch(ts))::BIGINT AS epoch,
         lag(floor(epoch(ts))::BIGINT) OVER (PARTITION BY user_id ORDER BY ts)
           AS prev_epoch
  FROM events
),
marked AS (
  SELECT user_id, ts, epoch,
         CASE WHEN prev_epoch IS NULL OR epoch - prev_epoch > {gap_s}
              THEN 1 ELSE 0 END AS is_new
  FROM e
),
sessions AS (
  SELECT user_id, epoch,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) - 1
              AS BIGINT) AS session
  FROM marked
)
SELECT user_id, session, count(*) AS n_events,
       min(epoch) AS start_epoch, max(epoch) AS end_epoch
FROM sessions GROUP BY user_id, session"""


SLIDE_WIN_S = 7200          # sliding window length
SLIDE_STEP_S = 1800         # hop


def events_sliding_window(sf_dir: str):
    """Per-user SLIDING (hopping) window aggregate: window length
    SLIDE_WIN_S, hop SLIDE_STEP_S — each event belongs to
    len/hop = 4 overlapping windows (the Flink/Beam hopping-window
    model; same role the tumbling variant plays for aligned windows).
    Window assignment is a pure row function fan-out done VECTORIZED
    inside the map task (np.repeat over the 4 hops), then the identical
    partial + combiner shape as tumbling — no sort, no per-user group,
    ~4x the exchange rows of the tumbling window by construction."""
    from ray.data.aggregate import Max, Min, Sum

    k = SLIDE_WIN_S // SLIDE_STEP_S

    def partial(batch: pa.Table) -> pa.Table:
        epoch = _epochs(batch)
        users = batch.column("user_id").to_numpy(zero_copy_only=False)
        # windows containing epoch e: starts in hops
        # (floor(e/hop) - k + 1 .. floor(e/hop)), clipped at 0
        base = epoch // SLIDE_STEP_S
        starts = (np.repeat(base, k)
                  - np.tile(np.arange(k, dtype=np.int64), len(epoch)))
        keep = starts >= 0
        t = pa.table({
            "user_id": pa.array(np.repeat(users, k)[keep]),
            "win_start": pa.array(starts[keep] * SLIDE_STEP_S, pa.int64()),
            "epoch": pa.array(np.repeat(epoch, k)[keep], pa.int64()),
        })
        g = t.group_by(["user_id", "win_start"]).aggregate(
            [("epoch", "count"), ("epoch", "min"), ("epoch", "max")])
        return g.rename_columns(["user_id", "win_start", "n_events",
                                 "first_epoch", "last_epoch"])

    agg = (_events(sf_dir)
           .map_batches(partial, batch_format="pyarrow")
           .groupby(["user_id", "win_start"])
           .aggregate(Sum("n_events", alias_name="n_events"),
                      Min("first_epoch", alias_name="first_epoch"),
                      Max("last_epoch", alias_name="last_epoch")))

    def fmt(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t.column("user_id"),
            "win_start": t.column("win_start").cast(pa.int64()),
            "n_events": t.column("n_events").cast(pa.int64()),
            "first_epoch": t.column("first_epoch").cast(pa.int64()),
            "last_epoch": t.column("last_epoch").cast(pa.int64()),
        })

    return agg.map_batches(fmt, batch_format="pyarrow")


def oracle_sliding_window_sql() -> str:
    k = SLIDE_WIN_S // SLIDE_STEP_S
    return f"""WITH e AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS epoch FROM events
),
x AS (
  SELECT user_id, epoch,
         (epoch // {SLIDE_STEP_S} - CAST(i AS BIGINT)) * {SLIDE_STEP_S}
           AS win_start
  FROM e, UNNEST(generate_series(0, {k - 1})) AS t(i)
  WHERE epoch // {SLIDE_STEP_S} - CAST(i AS BIGINT) >= 0
)
SELECT user_id, win_start, count(*) AS n_events,
       min(epoch) AS first_epoch, max(epoch) AS last_epoch
FROM x GROUP BY user_id, win_start"""


LATENESS_S = 1800            # allowed lateness (Flink allowedLateness role)
_LATE_SHARD = 2048           # events per prefix-max shard


def events_late_data(sf_dir: str, lateness_s: int = LATENESS_S):
    """Watermark / allowed-lateness accounting — the Flink event-time
    model (watermark = max event time seen so far minus the bound;
    an element whose timestamp is below the watermark at its arrival is
    late and excluded from window results). Deterministic spec: arrival
    order is ``event_id``; high_water(i) = max(epoch over events with a
    STRICTLY smaller event_id); late(i) = epoch_i < high_water(i) −
    lateness (the first event is never late). Returns per (user_id,
    win_id): ``n_events`` (on-time) and ``n_late`` (dropped).

    Scale shape — a DISTRIBUTED PREFIX MAX (the pack_token_budget
    prefix-sum shape with max as the monoid): (1) map-only epochs +
    fixed event_id-range shard keys; (2) one tiny groupby(shard).max;
    (3) the driver turns shard maxima into exclusive running maxima
    (broadcast); (4) per-shard local shifted cummax + offset, flags
    computed vectorized, per-window partials combined by ONE small
    groupby. Nothing row-sized on the driver, no global sort."""
    import ray
    import ray.data
    from ray.data.aggregate import Max, Sum

    from lucene_ray.pipelines.util import ensure_cols

    def keyed(batch: pa.Table) -> pa.Table:
        epoch = _epochs(batch)
        ids = batch.column("event_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "event_id": pa.array(ids, pa.int64()),
            "user_id": batch.column("user_id"),
            "epoch": pa.array(epoch, pa.int64()),
            "shard": pa.array(ids // _LATE_SHARD, pa.int64())})

    import os as _os

    ev = (ray.data.read_parquet(
        _os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts"])
        .map_batches(keyed, batch_format="pyarrow")
        .materialize())                     # two consumers
    shard_max = ensure_cols(
        ev.groupby("shard").aggregate(Max("epoch", alias_name="m"))
        .to_pandas(), ["shard", "m"]).sort_values("shard")
    if len(shard_max) == 0:
        return ray.data.from_arrow(pa.table({
            "user_id": pa.array([], pa.int64()),
            "win_id": pa.array([], pa.int64()),
            "n_events": pa.array([], pa.int64()),
            "n_late": pa.array([], pa.int64())}))
    offs = {}
    run = None
    for sh, m in zip(shard_max["shard"], shard_max["m"]):
        offs[int(sh)] = run                 # None = nothing before shard
        run = int(m) if run is None else max(run, int(m))
    oref = ray.put(offs)

    def local(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "win_id": pa.array([], pa.int64()),
                             "on": pa.array([], pa.int64()),
                             "late": pa.array([], pa.int64())})
        prior = ray.get(oref)[int(g.column("shard")[0].as_py())]
        ids = g.column("event_id").to_numpy(zero_copy_only=False)
        order = np.argsort(ids)
        ep = g.column("epoch").to_numpy(zero_copy_only=False)[order]
        uid = g.column("user_id").to_numpy(zero_copy_only=False)[order]
        # sentinel far below any epoch but safe to subtract from
        # (int64 min would wrap under "- lateness_s")
        base = -(1 << 62) if prior is None else prior
        shifted = np.concatenate([[base], np.maximum.accumulate(ep)[:-1]])
        hw = np.maximum(shifted, base)
        late = ep < hw - lateness_s
        t = pa.table({
            "user_id": pa.array(uid),
            "win_id": pa.array(ep // WINDOW_S, pa.int64()),
            "on": pa.array((~late).astype(np.int64)),
            "late": pa.array(late.astype(np.int64))})
        g2 = t.group_by(["user_id", "win_id"]).aggregate(
            [("on", "sum"), ("late", "sum")])
        return g2.rename_columns(["user_id", "win_id", "on", "late"])

    agg = (ev.groupby("shard").map_groups(local, batch_format="pyarrow")
           .groupby(["user_id", "win_id"])
           .aggregate(Sum("on", alias_name="n_events"),
                      Sum("late", alias_name="n_late")))

    def fmt(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t.column("user_id"),
            "win_id": t.column("win_id").cast(pa.int64()),
            "n_events": t.column("n_events").cast(pa.int64()),
            "n_late": t.column("n_late").cast(pa.int64())})

    return agg.map_batches(fmt, batch_format="pyarrow")


def oracle_late_data_sql(lateness_s: int = LATENESS_S) -> str:
    return f"""WITH e AS (
  SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ep
  FROM events
),
h AS (
  SELECT *, max(ep) OVER (ORDER BY event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS hw
  FROM e
)
SELECT user_id,
       CAST(floor(CAST(ep AS DOUBLE) / {WINDOW_S}) AS BIGINT) AS win_id,
       CAST(SUM(CASE WHEN hw IS NULL OR ep >= hw - {lateness_s}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN hw IS NOT NULL AND ep < hw - {lateness_s}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_late
FROM h GROUP BY user_id, win_id"""


# ---------------------------------------------------------------------------
# Time-decayed per-user counts (bucketed exponential decay)

DECAY_HALF_LIFE_S = 6 * 3600
_DECAY_CAP = 30           # weights below 2^-30 clamp (exactness bound)


def events_decayed_counts(sf_dir: str) -> "pa.Table":
    """Exponentially time-decayed per-user activity counts — the
    recency-weighted engagement aggregate every feature store keeps
    (Flink/Kafka-Streams decayed-counter shape). Decay is BUCKETED:
    weight(e) = 2^(−min(floor((T − t_e)/half_life), 30)) with T the
    corpus watermark (max event time). Half-life buckets make every
    weight an exact dyadic float, so double sums are EXACTLY
    order-independent — the partial/combiner aggregation and the SQL
    oracle produce hash-identical doubles with no float-order pinning
    (the agg_lineitem_pricing exact-arithmetic discipline applied to a
    decayed aggregate; a continuous-exp decay would differ in the last
    ulp across engines).

    Scale shape: one tiny max(ts) aggregate for the watermark, then ONE
    map-only pass emitting per-batch (user, partial sum, n) rows and a
    user-sized combine groupby. Nothing row-sized on the driver."""
    import ray.data
    from ray.data.aggregate import Sum

    from lucene_ray.pipelines.util import ensure_cols

    path = os.path.join(sf_dir, "events.parquet")
    ds = ray.data.read_parquet(path, columns=["ts", "user_id"])
    # watermark: one tiny aggregate over the ts column only
    wm = ds.aggregate(ray.data.aggregate.Max("ts"))["max(ts)"]
    t_ns = np.datetime64(wm, "ns").astype(np.int64)

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[ns]").astype(np.int64)
        users = batch.column("user_id").to_numpy(zero_copy_only=False)
        k = np.minimum((t_ns - ts) // (DECAY_HALF_LIFE_S
                                       * 1_000_000_000), _DECAY_CAP)
        w = np.ldexp(1.0, -k.astype(np.int64))       # exact 2^-k
        uu, inv = np.unique(users, return_inverse=True)
        ws = np.zeros(len(uu))
        np.add.at(ws, inv, w)
        n = np.bincount(inv, minlength=len(uu))
        return pa.table({"user_id": pa.array(uu, pa.int64()),
                         "w": pa.array(ws, pa.float64()),
                         "n": pa.array(n, pa.int64())})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("user_id")
           .aggregate(Sum("w", alias_name="decayed_count"),
                      Sum("n", alias_name="n_events")))
    t = ensure_cols(agg.to_pandas(),
                    ["user_id", "decayed_count", "n_events"])
    t = t.sort_values("user_id").reset_index(drop=True)
    return pa.table({
        "user_id": pa.array(t["user_id"].to_numpy(np.int64)),
        "decayed_count": pa.array(t["decayed_count"].to_numpy(np.float64)),
        "n_events": pa.array(t["n_events"].to_numpy(np.int64))})


def oracle_decayed_counts_sql() -> str:
    return f"""WITH wm AS (SELECT max(ts) AS t FROM events)
SELECT user_id,
       sum(power(2.0, -least(
         CAST((epoch_us((SELECT t FROM wm)) - epoch_us(ts))
              // {DECAY_HALF_LIFE_S * 1000000} AS BIGINT),
         {_DECAY_CAP}))) AS decayed_count,
       count(*) AS n_events
FROM events GROUP BY user_id"""
