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
