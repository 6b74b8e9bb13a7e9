"""Stream-shaped operators over the ``events`` table.

Ray Data is a (streaming-)batch engine with no event-time watermarks; the
reference likewise has no streaming operators (its NRT path is micro-batch
segment publication, ``search/SearcherManager.java:53`` — SURVEY.md §2.10).
Stream-shaped workloads are expressed as an ordered, partitioned log:
partition by key, sort by timestamp within the group, window with pandas
inside ``groupby().map_groups``. The ordering assumption (events of one
user fit one group, sorted by ts) is the partitioning contract a real
deployment would enforce with bucketed ingestion.
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


def events_tumbling_window(sf_dir: str):
    """Per-user tumbling-window aggregate: count + min/max ts per
    (user, window). Windows computed per group over ts-sorted events."""

    def win(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts")
        epoch = g["ts"].astype("datetime64[ns]").astype("int64") // 1_000_000_000
        w = (epoch // WINDOW_S).astype("int64")
        out = g.assign(win_id=w).groupby("win_id", as_index=False).agg(
            n_events=("ts", "size"),
            first_epoch=("ts", lambda s: int(s.astype("datetime64[ns]").astype("int64").min()
                                             // 1_000_000_000)),
            last_epoch=("ts", lambda s: int(s.astype("datetime64[ns]").astype("int64").max()
                                            // 1_000_000_000)),
        )
        out.insert(0, "user_id", g["user_id"].iloc[0])
        return out

    return _events(sf_dir).groupby("user_id").map_groups(
        win, batch_format="pandas")


def oracle_tumbling_window_sql() -> str:
    return f"""SELECT user_id,
       CAST(floor(floor(epoch(ts)) / {WINDOW_S}) AS BIGINT) AS win_id,
       count(*) AS n_events,
       min(floor(epoch(ts))::BIGINT) AS first_epoch,
       max(floor(epoch(ts))::BIGINT) AS last_epoch
FROM events GROUP BY user_id, win_id"""


def events_sessionize(sf_dir: str, gap_s: int = 1800):
    """Session windows: per-user sessions split on ts gaps > gap_s.
    Returns (user_id, session, n_events, start_epoch, end_epoch)."""

    def sess(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts")
        epoch = (g["ts"].astype("datetime64[ns]").astype("int64")
                 // 1_000_000_000).to_numpy()
        new = np.concatenate([[True], np.diff(epoch) > gap_s])
        sid = np.cumsum(new) - 1
        df = pd.DataFrame({"session": sid, "epoch": epoch})
        out = df.groupby("session", as_index=False).agg(
            n_events=("epoch", "size"),
            start_epoch=("epoch", "min"),
            end_epoch=("epoch", "max"))
        out = out.astype({"session": "int64", "n_events": "int64",
                          "start_epoch": "int64", "end_epoch": "int64"})
        out.insert(0, "user_id", g["user_id"].iloc[0])
        return out

    return _events(sf_dir).groupby("user_id").map_groups(
        sess, batch_format="pandas")


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
