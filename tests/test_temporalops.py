"""Ninth analytic wave: contract tests beyond the DuckDB twins — the
TWAP seam/weighting kernel vs a slow reference (hypothesis), the
zero-span exclusion gate, burst-dedup gap semantics (gap to previous
EVENT, not previous survivor) and microsecond tie order, and the
running-total window over a gapped year series."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings
from hypothesis import strategies as st

from gotenberg_ray.pipelines import temporalops as TO


def _write_events(tmp_path, rows):
    """rows: list of (event_id, user_id, ts_us, event_type, value)."""
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows]),
            "value": pa.array([float(r[4]) for r in rows]),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    return str(tmp_path)


def _twap_reference(rows):
    by_user: dict[int, list] = {}
    for eid, uid, ts, _, v in rows:
        by_user.setdefault(uid, []).append((ts, eid, round(v * 100)))
    out = []
    for uid, evs in sorted(by_user.items()):
        evs.sort()
        if len(evs) < 2 or evs[-1][0] == evs[0][0]:
            continue
        wsum = dsum = 0
        for (ts, _, v), (nxt, _, _) in zip(evs, evs[1:]):
            wsum += v * (nxt - ts)
            dsum += nxt - ts
        out.append(
            {
                "user_id": uid,
                "n_events": len(evs),
                "span_us": evs[-1][0] - evs[0][0],
                "twap_e2": wsum // dsum,
            }
        )
    return pd.DataFrame(
        out, columns=["user_id", "n_events", "span_us", "twap_e2"]
    ).astype("int64", errors="ignore")


def test_twap_basic_weighting(ray_session, tmp_path):
    # value 100 for 3 us, then 400 for 1 us → (100*3 + 400*1) // 4 = 175
    rows = [
        (1, 7, 0, "view", 1.00),
        (2, 7, 3, "view", 4.00),
        (3, 7, 4, "view", 9.99),  # last reading carries no weight
    ]
    df = TO.user_value_twap(_write_events(tmp_path, rows))
    assert len(df) == 1
    assert int(df["twap_e2"].iloc[0]) == 175
    assert int(df["span_us"].iloc[0]) == 4


def test_twap_excludes_single_and_zero_span(ray_session, tmp_path):
    rows = [
        (1, 1, 5, "view", 1.0),                 # single event
        (2, 2, 9, "view", 1.0), (3, 2, 9, "view", 2.0),  # zero span
        (4, 3, 0, "view", 1.0), (5, 3, 10, "view", 1.0),
    ]
    df = TO.user_value_twap(_write_events(tmp_path, rows))
    assert list(df["user_id"]) == [3]


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=6),    # user
            st.integers(min_value=0, max_value=1000),  # ts_us
            st.integers(min_value=0, max_value=500),   # value cents
        ),
        min_size=1,
        max_size=60,
    )
)
@settings(deadline=None, max_examples=25)
def test_twap_matches_reference(ray_session, tmp_path_factory, raw):
    tmp = tmp_path_factory.mktemp("twap")
    rows = [
        (i + 1, u, ts, "view", c / 100.0) for i, (u, ts, c) in enumerate(raw)
    ]
    got = TO.user_value_twap(_write_events(tmp, rows))
    exp = _twap_reference(rows)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_burst_gap_is_to_previous_event_not_survivor(ray_session, tmp_path):
    """Three events 200 s apart: #2 is dropped (gap 200 < 300) and #3
    is ALSO dropped — its gap to the previous EVENT (#2) is 200 s even
    though #2 did not survive. An anchor-based dedup would keep #3."""
    s = 1_000_000
    rows = [
        (1, 1, 0 * s, "click", 0.0),
        (2, 1, 200 * s, "click", 0.0),
        (3, 1, 400 * s, "click", 0.0),
        (4, 1, 800 * s, "click", 0.0),  # gap 400 s → survives
    ]
    df = TO.events_dedup_burst(_write_events(tmp_path, rows))
    assert list(df["event_id"]) == [1, 4]


def test_burst_independent_per_type_and_tie_order(ray_session, tmp_path):
    s = 1_000_000
    rows = [
        (10, 1, 0, "click", 0.0),
        (11, 1, 0, "view", 0.0),       # different type → independent
        (12, 1, 0, "click", 0.0),      # same us as #10, higher id → dropped
        (13, 1, 400 * s, "click", 0.0),
    ]
    df = TO.events_dedup_burst(_write_events(tmp_path, rows))
    assert list(df["event_id"]) == [10, 11, 13]


def _write_orders(tmp_path, rows):
    """rows: list of (day_num, totalprice, priority)."""
    t = pa.table(
        {
            "o_orderkey": pa.array(list(range(1, len(rows) + 1)), pa.int64()),
            "o_custkey": pa.array([1] * len(rows), pa.int64()),
            "o_orderdate": pa.array(
                [pd.Timestamp("1970-01-01") + pd.Timedelta(days=r[0]) for r in rows],
                pa.timestamp("us"),
            ),
            "o_totalprice": pa.array([float(r[1]) for r in rows]),
            "o_orderpriority": pa.array([r[2] for r in rows]),
        }
    )
    pq.write_table(t, tmp_path / "orders.parquet")
    return str(tmp_path)


def test_running_revenue_gapped_years(ray_session, tmp_path):
    rows = [
        (0, 10.0, "1-URGENT"),     # 1970
        (1200, 20.0, "1-URGENT"),  # 1973 (1971-72 missing: no densify)
        (0, 5.0, "2-HIGH"),
    ]
    df = TO.priority_running_revenue(_write_orders(tmp_path, rows))
    urgent = df[df["o_orderpriority"] == "1-URGENT"]
    assert list(urgent["order_year"]) == [1970, 1973]
    assert list(urgent["running_revenue_e2"]) == [1000, 3000]
    high = df[df["o_orderpriority"] == "2-HIGH"]
    assert list(high["running_revenue_e2"]) == [500]


# ------------------------------------------- global sweep-line peak


def test_peak_concurrency_half_open_and_argmin(ray_session, tmp_path):
    """An interval ending exactly when another starts never overlaps it
    (half-open [ts, ts+300s)); at_ts is the EARLIEST instant the peak
    count is reached."""
    from gotenberg_ray.pipelines import windows as W

    US = 1_000_000
    W300 = 300 * US
    rows = [
        # two overlapping opens at t=0 and t=100s → count 2
        (0, 1, 0, "click", 1.0),
        (1, 2, 100 * US, "click", 1.0),
        # opens exactly at the first interval's end — count stays 2
        (2, 3, W300, "click", 1.0),
        # later, three strictly overlapping opens → peak 3 at 1000s
        (3, 4, 900 * US, "click", 1.0),
        (4, 5, 950 * US, "click", 1.0),
        (5, 6, 1000 * US, "click", 1.0),
        # an even later pair that also reaches only 2
        (6, 7, 5000 * US, "click", 1.0),
        (7, 8, 5001 * US, "click", 1.0),
    ]
    df = W.events_peak_concurrency(_write_events(tmp_path, rows))
    assert len(df) == 1
    assert int(df["peak"].iloc[0]) == 3
    assert df["at_ts"].iloc[0] == pd.Timestamp(1000 * US, unit="us")


def test_peak_concurrency_bucket_layout_invariant(ray_session, tmp_path):
    """The distributed carry combine gives the same (peak, at_ts) for
    any bucket count — including B=1 (fully sequential reference)."""
    from gotenberg_ray.pipelines import windows as W

    US = 1_000_000
    rng = np.random.default_rng(11)
    ts = np.sort(rng.integers(0, 3_600 * US, 400))
    rows = [(i, int(i % 17), int(t), "click", 1.0) for i, t in enumerate(ts)]
    sf = _write_events(tmp_path, rows)
    base = W.events_peak_concurrency(sf)
    import gotenberg_ray.pipelines.windows as WM

    orig = WM._SWEEP_BUCKETS
    try:
        for b in (1, 3, 256):
            WM._SWEEP_BUCKETS = b
            got = W.events_peak_concurrency(sf)
            assert int(got["peak"].iloc[0]) == int(base["peak"].iloc[0]), b
            assert got["at_ts"].iloc[0] == base["at_ts"].iloc[0], b
    finally:
        WM._SWEEP_BUCKETS = orig


def test_peak_concurrency_empty(ray_session, tmp_path):
    from gotenberg_ray.pipelines import windows as W

    df = W.events_peak_concurrency(_write_events(tmp_path, []))
    assert len(df) == 1
    assert int(df["peak"].iloc[0]) == 0
    assert pd.isna(df["at_ts"].iloc[0])
