"""Stream-style windowed/ordered operators over the events table.

The reference is strictly batch (SURVEY.md §2.9) — these are the
custom operators a training-data / telemetry pipeline needs that Ray
Data has no built-in for, each expressed as a composition of
``map_batches`` (+ per-batch Arrow combiner) and ``groupby`` /
``map_groups``, per the engine's operator playbook:

- **tumbling window** lives in ``relational.py`` (round 1);
- **hopping (sliding) window**: each event explodes into
  window_s/hop_s overlapping windows INSIDE the batch map (vectorized
  np.repeat — the explode never leaves the task), then the same
  partial-combine + keyed-reduce as tumbling;
- **session windows** (gap-based): groupby(user) co-locates each
  user's events, one vectorized pandas pass per group computes gap
  breaks via diff/cumsum — the standard sessionization shuffle; the
  partitioning assumption is "one user's events fit one task", the
  same bound every sessionizer carries (a user with more events than
  task memory needs a time-sliced pre-split);
- **as-of join** (most recent prior event of another type, per key):
  groupby(user) co-locates both sides, searchsorted inside the group —
  the partitioning assumption again per-key locality, NOT a global
  sort: no all-to-all beyond the one hash exchange.

All three return small aggregated/matched results; nothing
corpus-sized reaches the driver. Each has an exact DuckDB oracle
(__ray_entry__: q_hopping_window / q_session_windows / q_event_asof;
the as-of oracle is the tie-safe max-over-inequality-join form).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Sum


def _events(sf_dir: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=columns)


def _e4(x: np.ndarray) -> np.ndarray:
    return np.floor(np.asarray(x, np.float64) * 1e4 + 0.5).astype(np.int64)


def hopping_window_events(
    sf_dir: str, window_s: int = 3600, hop_s: int = 900
) -> pd.DataFrame:
    """Overlapping (hopping/sliding) windows: every event lands in
    window_s/hop_s windows; output one row per (user_id, win) with
    event count + value sum, win = hop index of the window START.
    window_s must be a multiple of hop_s."""
    if window_s % hop_s:
        raise ValueError("window_s must be a multiple of hop_s")
    nwin = window_s // hop_s
    hop_us = hop_s * 1_000_000
    ev = _events(sf_dir, ["user_id", "ts", "value"])

    def explode_and_combine(batch: pa.Table) -> pa.Table:
        t = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        val = batch["value"].to_numpy(zero_copy_only=False)
        base = t // hop_us
        # event at hop index b is inside windows starting at b-k
        wins = np.concatenate([base - k for k in range(nwin)])
        uids = np.tile(uid, nwin)
        vals = np.tile(val, nwin)
        g = pa.TableGroupBy(
            pa.table(
                {
                    "user_id": pa.array(uids, pa.int64()),
                    "win": pa.array(wins, pa.int64()),
                    "value": pa.array(vals, pa.float64()),
                }
            ),
            ["user_id", "win"],
        ).aggregate([("value", "sum"), ("value", "count")])
        return g.rename_columns(["user_id", "win", "sum_p", "n_p"])

    out = (
        ev.map_batches(explode_and_combine, batch_format="pyarrow")
        .groupby(["user_id", "win"])
        .aggregate(Sum("sum_p", alias_name="sum_f"), Sum("n_p", alias_name="n_events"))
        .to_pandas()
    )
    out["value_sum_e4"] = _e4(out["sum_f"].to_numpy())
    return (
        out[["user_id", "win", "n_events", "value_sum_e4"]]
        .sort_values(["user_id", "win"])
        .reset_index(drop=True)
        .astype("int64")
    )


def session_windows_events(sf_dir: str, gap_s: int = 1800) -> pd.DataFrame:
    """Gap-based session windows per user: a new session starts when
    the gap since the previous event exceeds gap_s. One row per
    session: (user_id, session_start_us, session_end_us, n_events,
    value_sum_e4)."""
    gap_us = gap_s * 1_000_000
    ev = _events(sf_dir, ["user_id", "ts", "value"])

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        t = np.sort(g["ts"].astype("int64").to_numpy())
        order = np.argsort(g["ts"].astype("int64").to_numpy(), kind="stable")
        val = g["value"].to_numpy(np.float64)[order]
        brk = np.ones(len(t), dtype=np.int64)
        brk[1:] = (np.diff(t) > gap_us).astype(np.int64)
        sess = np.cumsum(brk) - 1
        df = pd.DataFrame({"sess": sess, "t": t, "value": val})
        agg = df.groupby("sess").agg(
            session_start_us=("t", "min"),
            session_end_us=("t", "max"),
            n_events=("t", "size"),
            value_sum=("value", "sum"),
        )
        agg["user_id"] = int(g["user_id"].iloc[0])
        agg["value_sum_e4"] = _e4(agg["value_sum"].to_numpy())
        return agg[
            ["user_id", "session_start_us", "session_end_us", "n_events", "value_sum_e4"]
        ].reset_index(drop=True)

    out = ev.groupby("user_id").map_groups(sessions, batch_format="pandas").to_pandas()
    return (
        out.sort_values(["user_id", "session_start_us"])
        .reset_index(drop=True)
        .astype("int64")
    )


def running_user_totals(sf_dir: str) -> pd.DataFrame:
    """Cumulative window aggregate (``SUM(...) OVER (PARTITION BY user
    ORDER BY ts)``): per user, the running total of event value over
    the (ts, event_id) order — the per-entity accumulator every
    sessionized metrics pipeline needs. Distributed as
    ``groupby(user_id).map_groups`` (each user's history sorts and
    cumsums inside one task — keyed parallelism, no global sort).
    Values convert to integer cents FIRST (floor(v*100+0.5), the
    percentile op's trick), so the running sum is order-exact integer
    math the SQL window mirrors bit-for-bit. Columns: user_id,
    event_id, ts_us, value_cents, running_cents."""
    ev = _events(sf_dir, ["user_id", "event_id", "ts", "value"])

    def running(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts"].astype("int64").to_numpy()
        eid = g["event_id"].astype("int64").to_numpy()
        order = np.lexsort((eid, ts))
        cents = np.floor(
            g["value"].to_numpy(np.float64)[order] * 100 + 0.5
        ).astype(np.int64)
        return pd.DataFrame({
            "user_id": int(g["user_id"].iloc[0]),
            "event_id": eid[order],
            "ts_us": ts[order],
            "value_cents": cents,
            "running_cents": np.cumsum(cents),
        })

    out = ev.groupby("user_id").map_groups(
        running, batch_format="pandas").to_pandas()
    return (
        out.sort_values(["user_id", "ts_us", "event_id"])
        .reset_index(drop=True).astype("int64")
    )


def user_lag_deltas(sf_dir: str) -> pd.DataFrame:
    """LAG window shape: per user the gap (microseconds) since their
    previous event in (ts, event_id) order — inter-arrival times, the
    input to retention / session-gap analyses. Same keyed
    ``map_groups`` distribution as the running total; each user's
    first event has no predecessor and emits nothing (SQL's
    ``LAG IS NOT NULL``). Columns: user_id, event_id, prev_event_id,
    delta_us."""
    ev = _events(sf_dir, ["user_id", "event_id", "ts"])

    def lags(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts"].astype("int64").to_numpy()
        eid = g["event_id"].astype("int64").to_numpy()
        order = np.lexsort((eid, ts))
        ts, eid = ts[order], eid[order]
        if len(ts) < 2:
            return pd.DataFrame({
                "user_id": pd.Series(dtype="int64"),
                "event_id": pd.Series(dtype="int64"),
                "prev_event_id": pd.Series(dtype="int64"),
                "delta_us": pd.Series(dtype="int64"),
            })
        return pd.DataFrame({
            "user_id": int(g["user_id"].iloc[0]),
            "event_id": eid[1:],
            "prev_event_id": eid[:-1],
            "delta_us": np.diff(ts),
        })

    out = ev.groupby("user_id").map_groups(
        lags, batch_format="pandas").to_pandas()
    if out.empty:
        return pd.DataFrame({c: pd.Series(dtype="int64") for c in
                             ["user_id", "event_id", "prev_event_id",
                              "delta_us"]})
    return (
        out.sort_values(["user_id", "event_id"])
        .reset_index(drop=True).astype("int64")
    )


def event_asof_join(
    sf_dir: str, left_type: str = "purchase", right_type: str = "click"
) -> pd.DataFrame:
    """As-of join: for every ``left_type`` event, the timestamp of the
    most recent ``right_type`` event by the SAME user at or before it
    (NULL -> -1 when none). One hash exchange on user_id; the ordered
    match is a per-group searchsorted."""
    ev = _events(sf_dir, ["event_id", "user_id", "ts", "event_type"])
    ev = ev.filter(
        expr=f"event_type == '{left_type}' or event_type == '{right_type}'"
    )

    def asof(g: pd.DataFrame) -> pd.DataFrame:
        t = g["ts"].astype("int64").to_numpy()
        left = g["event_type"].to_numpy() == left_type
        lt, lid = t[left], g["event_id"].to_numpy(np.int64)[left]
        rt = np.sort(t[~left])
        if len(rt) == 0:  # user has left-side events but no right-side
            matched = np.full(len(lt), -1, dtype=np.int64)
        else:
            pos = np.searchsorted(rt, lt, side="right") - 1
            matched = np.where(pos >= 0, rt[np.maximum(pos, 0)], np.int64(-1))
        return pd.DataFrame(
            {
                "event_id": lid,
                "user_id": np.full(len(lid), int(g["user_id"].iloc[0]), np.int64),
                "t_event_us": lt,
                "t_match_us": matched,
            }
        )

    out = ev.groupby("user_id").map_groups(asof, batch_format="pandas").to_pandas()
    if out.empty:
        return pd.DataFrame(
            {c: pd.Series(dtype="int64")
             for c in ["event_id", "user_id", "t_event_us", "t_match_us"]}
        )
    return out.sort_values("event_id").reset_index(drop=True).astype("int64")


def event_value_percentiles(
    sf_dir: str, quantiles=(0.5, 0.9, 0.99)
) -> pd.DataFrame:
    """EXACT distributed percentiles of the event value per event_type
    — the monitoring-pipeline staple (p50/p90/p99) as a histogram
    combiner instead of a sort:

    values carry two decimals, so each batch reduces to a sparse
    ``(event_type, value_cents) -> count`` histogram (int cents —
    float equality never touches a shuffle key); one hash exchange
    sums histograms (moving DISTINCT-VALUE rows, never events), and a
    per-type ``map_groups`` picks the discrete quantiles by cumulative
    count: index ceil(q*n)-1 in sorted order, IEEE-double q*n —
    bit-compatible with DuckDB's ``quantile_disc``. Exact at any
    event count while the exchange stays bounded by the value
    cardinality; truly continuous values (unbounded cardinality) take
    the standard t-digest/KLL sketch instead — approximate, so it is
    deliberately NOT this operator.
    """
    import math

    ev = _events(sf_dir, ["event_type", "value"])

    def hist(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].to_pylist()
        cents = np.floor(
            batch["value"].to_numpy(zero_copy_only=False) * 100 + 0.5
        ).astype(np.int64)
        counts: dict[tuple[str, int], int] = {}
        for t, c in zip(et, cents):
            counts[(t, int(c))] = counts.get((t, int(c)), 0) + 1
        keys = list(counts)
        return pa.table(
            {
                "event_type": pa.array([k[0] for k in keys], pa.string()),
                "cents": pa.array([k[1] for k in keys], pa.int64()),
                "cnt": pa.array([counts[k] for k in keys], pa.int64()),
            }
        )

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        order = np.argsort(g["cents"].to_numpy(np.int64))
        vals = g["cents"].to_numpy(np.int64)[order]
        cum = np.cumsum(g["cnt"].to_numpy(np.int64)[order])
        n = int(cum[-1])
        row = {"event_type": g["event_type"].iloc[0], "n_events": n}
        for q in quantiles:
            idx = math.ceil(q * n) - 1  # DuckDB quantile_disc's index
            pos = int(np.searchsorted(cum, idx + 1))
            # round, not int(): 0.29*100 is 28.999... in doubles
            row[f"p{round(q * 100)}_cents"] = int(vals[pos])
        return pd.DataFrame([row])

    out = (
        ev.map_batches(hist, batch_format="pyarrow")
        .groupby(["event_type", "cents"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .groupby("event_type")
        .map_groups(pick, batch_format="pandas")
        .to_pandas()
    )
    return (
        out.sort_values("event_type")
        .reset_index(drop=True)
        .astype({c: "int64" for c in out.columns if c != "event_type"})
    )


FUNNEL_STAGES = ("view", "click", "purchase")
_DAY_US = 86_400_000_000


def event_funnel(
    sf_dir: str, stages: tuple[str, ...] = FUNNEL_STAGES
) -> pd.DataFrame:
    """Ordered conversion funnel: per user, the earliest stage-1 event,
    then the earliest stage-2 event AT OR AFTER it, then the earliest
    stage-3 event at or after that — the product-analytics staple
    (strictly ordered funnel, unbounded window). One row per user with
    ``t_<stage>_us`` per stage (-1 from the first broken stage on) and
    ``stage_reached`` (0..len(stages)).

    Scale shape: one hash exchange on user_id co-locates each user's
    events; inside the group a sorted-``searchsorted`` pass per stage.
    The partitioning assumption is the sessionizer's ("one user's
    events fit one task"); the output is one row per user, so nothing
    corpus-sized reaches the driver beyond the user dimension.
    """
    ev = _events(sf_dir, ["user_id", "ts", "event_type"])

    def funnel(g: pd.DataFrame) -> pd.DataFrame:
        t = g["ts"].astype("int64").to_numpy()
        et = g["event_type"].to_numpy()
        times: list[int] = []
        reached = 0
        cur = np.int64(np.iinfo(np.int64).min)
        broken = False
        for s in stages:
            if broken:
                times.append(-1)
                continue
            st = np.sort(t[et == s])
            pos = int(np.searchsorted(st, cur))  # first event >= cur
            if pos < len(st):
                cur = st[pos]
                times.append(int(cur))
                reached += 1
            else:
                times.append(-1)
                broken = True
        return pd.DataFrame(
            {
                "user_id": [int(g["user_id"].iloc[0])],
                **{f"t_{s}_us": [v] for s, v in zip(stages, times)},
                "stage_reached": [reached],
            }
        )

    out = ev.groupby("user_id").map_groups(funnel, batch_format="pandas").to_pandas()
    return out.sort_values("user_id").reset_index(drop=True).astype("int64")


def retention_cohorts(sf_dir: str) -> pd.DataFrame:
    """Cohort retention: users cohorted by the UTC day of their first
    event; one row per (cohort_day, day_offset) with the count of
    cohort users active that many days after their first event.

    Scale shape: one ``groupby(user_id)`` pass emits each user's
    distinct (cohort_day, day_offset) pairs — distinct BY CONSTRUCTION
    inside the group, so the second exchange counts rows and never
    runs a count-distinct shuffle; the second groupby is bounded by
    days^2 cells regardless of event volume.
    """
    ev = _events(sf_dir, ["user_id", "ts"])

    def user_days(g: pd.DataFrame) -> pd.DataFrame:
        days = np.unique(g["ts"].astype("int64").to_numpy() // _DAY_US)
        return pd.DataFrame(
            {
                "cohort_day": np.full(len(days), days[0], np.int64),
                "day_offset": days - days[0],
            }
        )

    out = (
        ev.groupby("user_id")
        .map_groups(user_days, batch_format="pandas")
        .groupby(["cohort_day", "day_offset"])
        .aggregate(Count(alias_name="n_users"))
        .to_pandas()
    )
    return (
        out.sort_values(["cohort_day", "day_offset"])
        .reset_index(drop=True)
        .astype("int64")
    )


def moving_window_sums(sf_dir: str, window: int = 3) -> pd.DataFrame:
    """Bounded-frame moving window (``SUM(...) OVER (PARTITION BY user
    ORDER BY ts, event_id ROWS BETWEEN window-1 PRECEDING AND CURRENT
    ROW)``): per event, the sum over the user's last ``window`` events
    — the smoothing/rate shape monitoring pipelines run. Values go to
    integer cents FIRST (the running-total trick), so the windowed sum
    is order-exact integer math; ts ties break by event_id exactly as
    the SQL frame. Same keyed ``map_groups`` distribution as the other
    per-entity windows: one hash exchange, vectorized
    cumsum-minus-shifted-cumsum inside the group. Columns: user_id,
    event_id, ts_us, value_cents, window_sum_cents, window_n."""
    ev = _events(sf_dir, ["user_id", "event_id", "ts", "value"])

    def windowed(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts"].astype("int64").to_numpy()
        eid = g["event_id"].astype("int64").to_numpy()
        order = np.lexsort((eid, ts))
        cents = np.floor(
            g["value"].to_numpy(np.float64)[order] * 100 + 0.5
        ).astype(np.int64)
        cum = np.cumsum(cents)
        lagged = np.concatenate([np.zeros(min(window, len(cum)), np.int64),
                                 cum[:-window] if len(cum) > window else
                                 np.empty(0, np.int64)])
        wsum = cum - lagged
        n = np.minimum(np.arange(1, len(cum) + 1), window)
        return pd.DataFrame({
            "user_id": int(g["user_id"].iloc[0]),
            "event_id": eid[order],
            "ts_us": ts[order],
            "value_cents": cents,
            "window_sum_cents": wsum,
            "window_n": n,
        })

    out = ev.groupby("user_id").map_groups(
        windowed, batch_format="pandas").to_pandas()
    return (
        out.sort_values(["user_id", "ts_us", "event_id"])
        .reset_index(drop=True).astype("int64")
    )


def windowed_topk_spenders(
    sf_dir: str, window_s: int = 3600, k: int = 3
) -> pd.DataFrame:
    """Continuous top-k over the event stream (the streaming-top-k
    query shape of the retrieved ICDE'18/'19 papers — SAP / top-k
    frequent terms on streams): per tumbling window, the ``k`` users
    with the largest summed spend. Batch form of the standing query a
    stream processor would maintain incrementally:

    1. per-batch (win, user, cents) partials (integer cents first —
       bit-portable ordering), ONE groupby((win, user)).sum exchange;
    2. per-window top-k inside ``groupby(win).map_groups`` — the
       per-group state is one window's user set, never the stream.

    Ties break (spend desc, user_id asc). Returns
    (win, rank, user_id, spend_cents, n_events)."""
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"]
    )
    win_us = window_s * 1_000_000

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        cents = np.floor(
            batch["value"].to_numpy(zero_copy_only=False) * 100 + 0.5
        ).astype(np.int64)
        t = pa.table({
            "win": pa.array(ts // win_us, pa.int64()),
            "user_id": batch["user_id"],
            "cents": pa.array(cents, pa.int64()),
            "n": pa.array(np.ones(len(cents), np.int64), pa.int64()),
        })
        g = pa.TableGroupBy(t, ["win", "user_id"]).aggregate(
            [("cents", "sum"), ("n", "sum")]
        )
        return g.rename_columns(["win", "user_id", "cents", "n"])

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cents", "user_id"], ascending=[False, True],
                          kind="mergesort").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    out = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby(["win", "user_id"])
        .aggregate(Sum("cents", alias_name="cents"),
                   Sum("n", alias_name="n_events"))
        .groupby("win")
        .map_groups(topk, batch_format="pandas")
        .to_pandas()
    )
    return (
        out.rename(columns={"cents": "spend_cents"})
        [["win", "rank", "user_id", "spend_cents", "n_events"]]
        .sort_values(["win", "rank"])
        .reset_index(drop=True)
        .astype("int64")
    )
