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
