"""Stream-operator unit tests beyond the SQL-oracle parity (which
tests/test_entry_oracle.py covers): edge cases the shared testdata
never produces."""

import numpy as np
import pytest
import ray.data

from information_retrieval_images_ray.pipelines import streaming


def _events_dir(tmp_path, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_asof_user_with_no_right_side_events(tmp_path):
    """A user with purchases but zero clicks must yield t_match_us=-1,
    not crash (regression: empty right side raised IndexError)."""
    H = 3_600_000_000
    rows = [
        (0, 1 * H, 1, "purchase", 1.0),   # user 1: no clicks at all
        (1, 2 * H, 2, "click", 1.0),
        (2, 3 * H, 2, "purchase", 1.0),   # user 2: click before purchase
        (3, 1 * H, 3, "purchase", 1.0),   # user 3: click only AFTER
        (4, 2 * H, 3, "click", 1.0),
    ]
    out = streaming.event_asof_join(_events_dir(tmp_path, rows))
    byid = out.set_index("event_id")["t_match_us"]
    assert byid[0] == -1
    assert byid[2] == 2 * H
    assert byid[3] == -1


def test_session_single_event_users(tmp_path):
    H = 3_600_000_000
    rows = [(0, 1 * H, 1, "view", 2.0), (1, 5 * H, 1, "view", 3.0),
            (2, 1 * H, 2, "view", 1.0)]
    out = streaming.session_windows_events(_events_dir(tmp_path, rows), gap_s=1800)
    u1 = out[out["user_id"] == 1]
    assert len(u1) == 2  # 4h gap > 30min -> two sessions
    assert len(out[out["user_id"] == 2]) == 1


def test_event_percentiles_exact_with_ties(tmp_path):
    """The histogram combiner must reproduce numpy's discrete quantile
    (index ceil(q*n)-1) exactly across blocks, including heavy ties and
    n==1 groups — verified against a direct sorted-array oracle."""
    import math

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(13)
    rows = []
    eid = 0
    # 'tied' draws from only 5 distinct values -> massive ties;
    # 'spread' is near-unique; 'single' has exactly one event
    for _ in range(400):
        rows.append((eid, 0, 0, "tied", float(rng.integers(1, 6)) + 0.25))
        eid += 1
    for _ in range(257):
        rows.append((eid, 0, 0, "spread", round(float(rng.uniform(0, 500)), 2)))
        eid += 1
    rows.append((eid, 0, 0, "single", 42.42))

    out_dir = tmp_path
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
    })
    # several row groups so per-batch histograms genuinely merge
    pq.write_table(t, str(out_dir / "events.parquet"), row_group_size=100)

    got = streaming.event_value_percentiles(str(out_dir)).set_index("event_type")
    df = pd.DataFrame(rows, columns=["eid", "ts", "uid", "event_type", "value"])
    for et, g in df.groupby("event_type"):
        cents = np.sort(np.floor(g["value"].to_numpy() * 100 + 0.5).astype(np.int64))
        n = len(cents)
        assert got.loc[et, "n_events"] == n
        for q, col in ((0.5, "p50_cents"), (0.9, "p90_cents"), (0.99, "p99_cents")):
            assert got.loc[et, col] == cents[math.ceil(q * n) - 1], (et, q)


def test_running_totals_and_lag_deltas(tmp_path):
    """Hand-built per-user histories with a ts TIE (event_id breaks
    it): running cents accumulate in (ts, event_id) order; lag deltas
    skip each user's first event; a single-event user emits no lag."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from information_retrieval_images_ray.pipelines import streaming

    rows = [
        # user 1: three events, two at the SAME ts (ids 11 < 12)
        (10, 1000, 1, "a", 1.01),
        (12, 2000, 1, "a", 2.02),
        (11, 2000, 1, "a", 0.40),
        # user 2: single event -> no lag row
        (20, 500, 2, "b", 9.99),
    ]
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))

    run = streaming.running_user_totals(str(tmp_path))
    assert run[run["user_id"] == 1]["event_id"].tolist() == [10, 11, 12]
    assert run[run["user_id"] == 1]["running_cents"].tolist() == \
        [101, 101 + 40, 101 + 40 + 202]
    assert run[run["user_id"] == 2]["running_cents"].tolist() == [999]

    lag = streaming.user_lag_deltas(str(tmp_path))
    assert lag[lag["user_id"] == 1][
        ["event_id", "prev_event_id", "delta_us"]
    ].values.tolist() == [[11, 10, 1000], [12, 11, 0]]
    assert (lag["user_id"] != 2).all()


def test_rollup_revenue_levels(tmp_path):
    """ALL-level rows are exact integer sums of the leaf rows."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from information_retrieval_images_ray.pipelines.relational import (
        rollup_revenue,
    )

    t = pa.table({
        "l_returnflag": pa.array(["A", "A", "R", "R"], pa.string()),
        "l_linestatus": pa.array(["F", "O", "F", "F"], pa.string()),
        "l_quantity": pa.array([1.0, 2.0, 3.0, 4.0], pa.float64()),
        "l_extendedprice": pa.array([10.0, 20.0, 30.0, 40.0], pa.float64()),
        "l_discount": pa.array([0.0, 0.5, 0.1, 0.0], pa.float64()),
    })
    pq.write_table(t, str(tmp_path / "lineitem.parquet"))
    out = rollup_revenue(str(tmp_path)).set_index(
        ["l_returnflag", "l_linestatus"])
    leaf_af = out.loc[("A", "F")]
    assert leaf_af["sum_revenue_e2"] == 1000 and leaf_af["n_rows"] == 1
    # per-flag subtotal = sum of its leaves; grand total = sum of all
    assert out.loc[("A", "ALL"), "sum_revenue_e2"] == 1000 + 1000
    assert out.loc[("R", "ALL"), "sum_revenue_e2"] == 2700 + 4000
    assert out.loc[("ALL", "ALL"), "n_rows"] == 4
    assert out.loc[("ALL", "ALL"), "sum_qty_e2"] == 1000


def test_event_funnel_order_enforced(tmp_path):
    """The funnel is strictly ordered: a purchase BEFORE the first
    click does not count; a later purchase does. A user with no view
    reaches stage 0 with all sentinels."""
    H = 3_600_000_000
    rows = [
        # user 1: view -> click -> purchase in order
        (0, 1 * H, 1, "view", 1.0),
        (1, 2 * H, 1, "click", 1.0),
        (2, 3 * H, 1, "purchase", 1.0),
        # user 2: purchase BEFORE the click -> funnel stops at click
        (3, 1 * H, 2, "view", 1.0),
        (4, 3 * H, 2, "click", 1.0),
        (5, 2 * H, 2, "purchase", 1.0),
        # user 3: clicks but never views -> stage 0
        (6, 1 * H, 3, "click", 1.0),
        (7, 2 * H, 3, "purchase", 1.0),
    ]
    out = streaming.event_funnel(_events_dir(tmp_path, rows))
    got = {int(r.user_id): (int(r.t_view_us), int(r.t_click_us),
                            int(r.t_purchase_us), int(r.stage_reached))
           for r in out.itertuples()}
    assert got[1] == (1 * H, 2 * H, 3 * H, 3)
    assert got[2] == (1 * H, 3 * H, -1, 2)
    assert got[3] == (-1, -1, -1, 0)


def test_event_funnel_same_timestamp_counts(tmp_path):
    """AT-OR-AFTER semantics: a click at exactly the view's timestamp
    advances the funnel (>=, not >) — matching the SQL oracle."""
    H = 3_600_000_000
    rows = [
        (0, 1 * H, 1, "view", 1.0),
        (1, 1 * H, 1, "click", 1.0),
    ]
    out = streaming.event_funnel(_events_dir(tmp_path, rows))
    assert int(out["stage_reached"].iloc[0]) == 2
    assert int(out["t_click_us"].iloc[0]) == 1 * H


def test_retention_cohorts_counts(tmp_path):
    """Two users share a cohort day; repeat activity within one day
    dedups; a later cohort stays its own row."""
    D = 86_400_000_000
    rows = [
        (0, 0 * D + 5, 1, "view", 1.0),      # u1 cohort day 0
        (1, 0 * D + 9, 1, "click", 1.0),     # same day, dedup
        (2, 2 * D + 1, 1, "view", 1.0),      # offset 2
        (3, 0 * D + 7, 2, "view", 1.0),      # u2 cohort day 0
        (4, 1 * D + 1, 2, "view", 1.0),      # offset 1
        (5, 5 * D + 1, 3, "view", 1.0),      # u3 cohort day 5
    ]
    out = streaming.retention_cohorts(_events_dir(tmp_path, rows))
    got = {(int(r.cohort_day), int(r.day_offset)): int(r.n_users)
           for r in out.itertuples()}
    assert got == {(0, 0): 2, (0, 1): 1, (0, 2): 1, (5, 0): 1}


def test_ship_priority_q3_semantics(tmp_path):
    """Q3 join semantics on a hand-built 3-table fixture: only
    BUILDING customers' orders before the cutoff with line items
    shipped after the cutoff qualify; revenue sums only the qualifying
    line items; ordering is revenue desc with date/orderkey ties."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from information_retrieval_images_ray.pipelines.relational import (
        Q3_CUTOFF_US,
        ship_priority_topk,
    )

    before, after = Q3_CUTOFF_US - 10, Q3_CUTOFF_US + 10
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2], pa.int64()),
        "c_mktsegment": pa.array(["BUILDING", "MACHINERY"], pa.string()),
    }), str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        # order 10: qualifies; order 11: wrong segment; order 12: too late
        "o_orderkey": pa.array([10, 11, 12], pa.int64()),
        "o_custkey": pa.array([1, 2, 1], pa.int64()),
        "o_orderdate": pa.array([before, before, after], pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT", "2-HIGH", "3-MEDIUM"], pa.string()),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([10, 10, 10, 11, 12], pa.int64()),
        # two qualifying lines for order 10 (one shipped too early)
        "l_shipdate": pa.array([after, after, before, after, after],
                               pa.timestamp("us")),
        "l_extendedprice": pa.array([100.0, 50.0, 999.0, 10.0, 10.0], pa.float64()),
        "l_discount": pa.array([0.1, 0.0, 0.0, 0.0, 0.0], pa.float64()),
    }), str(tmp_path / "lineitem.parquet"))

    out = ship_priority_topk(str(tmp_path), k=10)
    assert len(out) == 1
    row = out.iloc[0]
    # revenue = 100*0.9 + 50*1.0 = 140.00 -> 14000 cents
    assert (int(row.l_orderkey), int(row.o_orderdate_us),
            row.o_orderpriority, int(row.revenue_e2)) == (
        10, before, "1-URGENT", 14000)


def test_moving_window_sums_frame(tmp_path):
    """ROWS BETWEEN 2 PRECEDING frame: window of 3 with integer-cents
    sums, short prefix windows, ts-tie broken by event_id."""
    H = 3_600_000_000
    rows = [
        (0, 1 * H, 1, "view", 1.00),
        (1, 2 * H, 1, "view", 2.00),
        (2, 3 * H, 1, "view", 4.00),
        (3, 4 * H, 1, "view", 8.00),
        # user 2: two events at the SAME ts -> event_id order
        (4, 1 * H, 2, "view", 1.00),
        (5, 1 * H, 2, "view", 2.00),
    ]
    out = streaming.moving_window_sums(_events_dir(tmp_path, rows), window=3)
    u1 = out[out["user_id"] == 1]
    assert u1["window_sum_cents"].tolist() == [100, 300, 700, 1400]
    assert u1["window_n"].tolist() == [1, 2, 3, 3]
    u2 = out[out["user_id"] == 2]
    assert u2["event_id"].tolist() == [4, 5]
    assert u2["window_sum_cents"].tolist() == [100, 300]


def test_local_supplier_volume_q5(tmp_path):
    """Q5 semantics on a hand-built 6-table fixture: revenue counts
    only when customer and supplier share an in-region nation within
    the order-date year; out-of-region and cross-nation rows drop."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from information_retrieval_images_ray.pipelines.relational import (
        Q5_YEAR_LO_US,
        local_supplier_volume,
    )

    t = Q5_YEAR_LO_US + 10
    pq.write_table(pa.table({
        "r_regionkey": pa.array([0, 1], pa.int32()),
        "r_name": pa.array(["ASIA", "EUROPE"], pa.string()),
    }), str(tmp_path / "region.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array([10, 11, 20], pa.int32()),
        "n_name": pa.array(["JAPAN", "INDIA", "FRANCE"], pa.string()),
        "n_regionkey": pa.array([0, 0, 1], pa.int32()),
    }), str(tmp_path / "nation.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3], pa.int64()),
        "c_nationkey": pa.array([10, 11, 20], pa.int32()),
    }), str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array([100, 101], pa.int64()),
        "s_nationkey": pa.array([10, 11], pa.int32()),
    }), str(tmp_path / "supplier.parquet"))
    pq.write_table(pa.table({
        # order 1: JAPAN customer in-year; order 2: INDIA customer
        # in-year; order 3: FRANCE (out of region); order 4: JAPAN but
        # before the year window
        "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "o_custkey": pa.array([1, 2, 3, 1], pa.int64()),
        "o_orderdate": pa.array([t, t, t, Q5_YEAR_LO_US - 10],
                                pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        # (order 1, JAPAN supplier) local: 100*0.9=90.00 counts
        # (order 1, INDIA supplier) NOT local: drops
        # (order 2, INDIA supplier) local: 50.00 counts
        # (order 3, order 4): excluded upstream
        "l_orderkey": pa.array([1, 1, 2, 3, 4], pa.int64()),
        "l_suppkey": pa.array([100, 101, 101, 100, 100], pa.int64()),
        "l_extendedprice": pa.array([100.0, 7.0, 50.0, 9.0, 9.0], pa.float64()),
        "l_discount": pa.array([0.1, 0.0, 0.0, 0.0, 0.0], pa.float64()),
    }), str(tmp_path / "lineitem.parquet"))

    out = local_supplier_volume(str(tmp_path), region="ASIA")
    got = dict(zip(out["n_name"], out["revenue_e2"]))
    assert got == {"JAPAN": 9000, "INDIA": 5000}
    # ordering: revenue desc
    assert out["n_name"].tolist() == ["JAPAN", "INDIA"]


def test_value_tier_counts_range_join(tmp_path):
    """Broadcast banded range join: band edges are inclusive-lo /
    exclusive-hi on integer cents; counts group by (event_type, tier)."""
    from information_retrieval_images_ray.pipelines.relational import (
        value_tier_counts,
    )

    rows = [
        (0, 1, 1, "view", 9.99),       # 999 cents  -> t0 (hi edge excl.)
        (1, 2, 1, "view", 10.00),      # 1000       -> t1 (lo edge incl.)
        (2, 3, 2, "click", 49.995),    # 5000 (round .5 up) -> t2
        (3, 4, 2, "click", 199.99),    # 19999      -> t2
        (4, 5, 3, "purchase", 500.0),  # 50000      -> t4
        (5, 6, 3, "view", 0.0),        # 0          -> t0
    ]
    out = value_tier_counts(_events_dir(tmp_path, rows))
    got = {(r.event_type, r.tier): int(r.n) for r in out.itertuples()}
    assert got == {
        ("view", "t0_micro"): 2,
        ("view", "t1_small"): 1,
        ("click", "t2_mid"): 2,
        ("purchase", "t4_huge"): 1,
    }


def test_windowed_topk_spenders(tmp_path):
    """Per-window top-k by integer-cents spend: tie on spend breaks
    user-asc, rank is dense 1..k per window, short windows keep all."""
    H = 3_600_000_000
    rows = [
        (0, 0 * H + 1, 1, "view", 10.0),   # w0: u1 = 1000+500
        (1, 0 * H + 2, 1, "view", 5.0),
        (2, 0 * H + 3, 2, "view", 15.0),   # w0: u2 = 1500 (== u1) tie
        (3, 0 * H + 4, 3, "view", 1.0),    # w0: u3 = 100
        (4, 0 * H + 5, 4, "view", 0.5),    # w0: u4 = 50 -> cut at k=3
        (5, 1 * H + 1, 7, "view", 2.0),    # w1: single user
    ]
    from information_retrieval_images_ray.pipelines.streaming import (
        windowed_topk_spenders,
    )

    out = windowed_topk_spenders(_events_dir(tmp_path, rows), k=3)
    w0 = out[out["win"] == 0]
    assert list(w0["user_id"]) == [1, 2, 3]          # tie 1500: u1 < u2
    assert list(w0["spend_cents"]) == [1500, 1500, 100]
    assert list(w0["rank"]) == [1, 2, 3]
    assert list(w0["n_events"]) == [2, 1, 1]
    w1 = out[out["win"] == 1]
    assert list(w1["user_id"]) == [7] and list(w1["rank"]) == [1]
