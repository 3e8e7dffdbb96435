"""Event-stream operators (functions/events.py): semantics checked
against hand-computed expectations on synthetic tables — independent of
the DuckDB oracle mirrors in the driver contract."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from search_engines_ray.functions.events import (
    asof_join, sessionize, sliding_window_aggregate,
    tumbling_window_aggregate,
)

US = 1_000_000


def _ts(seconds):
    return pa.array(np.asarray(seconds, dtype=np.int64) * US,
                    type=pa.timestamp("us"))


@pytest.fixture(scope="module")
def rd(ray_session):
    import ray.data as rd
    return rd


def test_tumbling_window(rd):
    # two 1-h windows, two keys; 0.07+0.01 exercises exact cents sums
    t = pa.table({
        "ts": _ts([10, 3599, 3600, 7100, 20]),
        "event_type": ["a", "a", "a", "b", "b"],
        "value": [0.07, 0.01, 2.00, 1.50, 3.25],
    })
    out = tumbling_window_aggregate(rd.from_arrow(t), window_s=3600) \
        .to_pandas().sort_values(["window_start", "event_type"],
                                 ignore_index=True)
    assert out.to_dict("records") == [
        {"window_start": 0, "event_type": "a", "n_events": 2,
         "sum_value": 0.08, "min_value": 0.01, "max_value": 0.07},
        {"window_start": 0, "event_type": "b", "n_events": 1,
         "sum_value": 3.25, "min_value": 3.25, "max_value": 3.25},
        {"window_start": 3600, "event_type": "a", "n_events": 1,
         "sum_value": 2.0, "min_value": 2.0, "max_value": 2.0},
        {"window_start": 3600, "event_type": "b", "n_events": 1,
         "sum_value": 1.5, "min_value": 1.5, "max_value": 1.5},
    ]


def test_sliding_window_matches_bruteforce(rd):
    # 1-h windows hopping 15 min: every event in exactly 4 windows;
    # brute-force check over a random table, plus partitioning invariance
    rng = np.random.default_rng(3)
    n = 500
    secs = rng.integers(0, 20_000, size=n)
    keys = rng.choice(["a", "b", "c"], size=n)
    vals = rng.integers(0, 10_000, size=n) / 100.0
    t = pa.table({"ts": _ts(secs), "event_type": keys, "value": vals})
    out = sliding_window_aggregate(rd.from_arrow(t), window_s=3600,
                                   stride_s=900) \
        .to_pandas().sort_values(["window_start", "event_type"],
                                 ignore_index=True)
    rows = []
    for ws in range(-3 * 900, 20_000 + 900, 900):
        m = (secs >= ws) & (secs < ws + 3600)
        for k in ("a", "b", "c"):
            mk = m & (keys == k)
            if mk.any():
                rows.append({"window_start": ws, "event_type": k,
                             "n_events": int(mk.sum()),
                             "sum_value": round(vals[mk].sum() * 100) / 100})
    want = pd.DataFrame(rows).sort_values(["window_start", "event_type"],
                                          ignore_index=True)
    want["n_events"] = want["n_events"].astype(np.int64)
    want["window_start"] = want["window_start"].astype(np.int64)
    pd.testing.assert_frame_equal(out, want)
    out8 = sliding_window_aggregate(rd.from_arrow(t).repartition(8),
                                    window_s=3600, stride_s=900) \
        .to_pandas().sort_values(["window_start", "event_type"],
                                 ignore_index=True)
    pd.testing.assert_frame_equal(out, out8)


def test_sliding_window_rejects_ragged_stride(rd):
    t = pa.table({"ts": _ts([1]), "event_type": ["a"], "value": [1.0]})
    with pytest.raises(ValueError, match="multiple"):
        sliding_window_aggregate(rd.from_arrow(t), window_s=3600,
                                 stride_s=700)


def test_sessionize_gap_split(rd):
    # user 1: events at 0 / 10min / 50min with a 30-min gap rule →
    # sessions {0,600} and {3000}; user 2: one event
    t = pa.table({
        "ts": _ts([0, 600, 3000, 100]),
        "user_id": pa.array([1, 1, 1, 2], pa.int64()),
        "value": [1.0, 2.0, 4.0, 8.0],
    })
    out = sessionize(rd.from_arrow(t), gap_s=1800).to_pandas() \
        .sort_values(["user_id", "session_id"], ignore_index=True)
    assert out.to_dict("records") == [
        {"user_id": 1, "session_id": 0, "session_start": 0,
         "session_end": 600 * US, "n_events": 2, "sum_value": 3.0},
        {"user_id": 1, "session_id": 1, "session_start": 3000 * US,
         "session_end": 3000 * US, "n_events": 1, "sum_value": 4.0},
        {"user_id": 2, "session_id": 0, "session_start": 100 * US,
         "session_end": 100 * US, "n_events": 1, "sum_value": 8.0},
    ]


def test_sessionize_exact_gap_not_split(rd):
    # gap strictly-greater rule: a gap of exactly gap_s stays one session
    t = pa.table({
        "ts": _ts([0, 1800]),
        "user_id": pa.array([7, 7], pa.int64()),
        "value": [1.0, 1.0],
    })
    out = sessionize(rd.from_arrow(t), gap_s=1800).to_pandas()
    assert len(out) == 1 and out["n_events"].iloc[0] == 2


def test_asof_join_backward_tie_and_miss(rd):
    left = pa.table({
        "event_id": pa.array([10, 11, 12, 13], pa.int64()),
        "user_id": pa.array([1, 1, 2, 3], pa.int64()),
        "ts": _ts([100, 5, 50, 9]),
    })
    right = pa.table({
        "o_orderkey": pa.array([900, 901, 902, 903], pa.int64()),
        "o_custkey": pa.array([1, 1, 1, 2], pa.int64()),
        # user 1: two orders at t=10 (tie → larger key 902), one at t=90
        "o_orderdate": _ts([10, 90, 10, 60]),
    })
    out = asof_join(rd.from_arrow(left), rd.from_arrow(right),
                    left_key="user_id", right_key="o_custkey",
                    left_ts="ts", right_ts="o_orderdate",
                    left_id="event_id", right_val="o_orderkey") \
        .to_pandas().sort_values("event_id", ignore_index=True)
    assert out.to_dict("records") == [
        {"event_id": 10, "o_orderkey": 901},   # latest ts wins
        {"event_id": 11, "o_orderkey": -1},    # event precedes all orders
        {"event_id": 12, "o_orderkey": -1},    # user 2's order is later
        {"event_id": 13, "o_orderkey": -1},    # user never ordered
    ]


def test_asof_join_same_instant_matches(rd):
    # right_ts == left_ts counts (≤, not <)
    left = pa.table({"event_id": pa.array([1], pa.int64()),
                     "user_id": pa.array([5], pa.int64()),
                     "ts": _ts([42])})
    right = pa.table({"o_orderkey": pa.array([77], pa.int64()),
                      "o_custkey": pa.array([5], pa.int64()),
                      "o_orderdate": _ts([42])})
    out = asof_join(rd.from_arrow(left), rd.from_arrow(right),
                    left_key="user_id", right_key="o_custkey",
                    left_ts="ts", right_ts="o_orderdate",
                    left_id="event_id", right_val="o_orderkey").to_pandas()
    assert out["o_orderkey"].tolist() == [77]
