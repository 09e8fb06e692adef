"""Sixth analytic wave: contract tests beyond the DuckDB twins — the
segmented gap-max kernel (including the skipped-segment adjacency the
naive filtered-reduceat gets wrong), the head-frame divisor of the
moving window, cohort-matrix equality vs a pandas reference, and LAG
over a gapped year series."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings
from hypothesis import strategies as st

from gotenberg_ray.pipelines import windows2 as W2


def _write_orders(tmp_path, rows):
    """rows: list of (custkey, day_num, totalprice, priority)."""
    t = pa.table(
        {
            "o_orderkey": pa.array(list(range(1, len(rows) + 1)), pa.int64()),
            "o_custkey": pa.array([r[0] for r in rows], pa.int64()),
            "o_orderdate": pa.array(
                [pd.Timestamp("1970-01-01") + pd.Timedelta(days=r[1]) for r in rows],
                pa.timestamp("us"),
            ),
            "o_totalprice": pa.array([float(r[2]) for r in rows]),
            "o_orderpriority": pa.array([r[3] for r in rows]),
        }
    )
    pq.write_table(t, tmp_path / "orders.parquet")
    return str(tmp_path)


def _gaps_reference(rows):
    """Per-customer distinct-day gap stats, the slow obvious way."""
    by_cust: dict[int, set[int]] = {}
    for c, d, _, _ in rows:
        by_cust.setdefault(c, set()).add(d)
    out = []
    for c, days in sorted(by_cust.items()):
        ds = sorted(days)
        if len(ds) < 3:
            continue
        gaps = np.diff(ds)
        span = ds[-1] - ds[0]
        out.append(
            {
                "o_custkey": c,
                "n_days": len(ds),
                "span_days": span,
                "max_gap_days": int(gaps.max()),
                "mean_gap_e2": span * 100 // (len(ds) - 1),
            }
        )
    return pd.DataFrame(
        out,
        columns=["o_custkey", "n_days", "span_days", "max_gap_days", "mean_gap_e2"],
    ).astype("int64", errors="ignore")


def test_gap_kernel_skipped_segment_adjacency(ray_session, tmp_path):
    """A <3-day customer with a HUGE internal gap sitting between two
    qualifying customers must not leak its gap into a neighbour's max
    (the filtered-reduceat failure mode)."""
    rows = [
        (1, 0, 10.0, "1-URGENT"),
        (1, 5, 10.0, "1-URGENT"),
        (1, 20, 10.0, "1-URGENT"),  # cust 1: gaps 5, 15
        (2, 100, 10.0, "1-URGENT"),
        (2, 900, 10.0, "1-URGENT"),  # cust 2: 2 days only — excluded
        (3, 0, 10.0, "1-URGENT"),
        (3, 1, 10.0, "1-URGENT"),
        (3, 2, 10.0, "1-URGENT"),  # cust 3: gaps 1, 1
        (3, 2, 10.0, "1-URGENT"),  # same-day duplicate → distinct fold
    ]
    got = W2.customer_order_gaps(_write_orders(tmp_path, rows))
    exp = _gaps_reference(rows)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert got.set_index("o_custkey")["max_gap_days"].to_dict() == {1: 15, 3: 1}


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=8),  # custkey
            st.integers(min_value=0, max_value=400),  # day
        ),
        min_size=1,
        max_size=80,
    )
)
@settings(deadline=None, max_examples=25)
def test_gap_kernel_matches_reference(ray_session, tmp_path_factory, rows):
    tmp = tmp_path_factory.mktemp("gaps")
    full = [(c, d, 10.0, "1-URGENT") for c, d in rows]
    got = W2.customer_order_gaps(_write_orders(tmp, full))
    exp = _gaps_reference(full)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_moving_avg_head_frame_and_gap_fill(ray_session, tmp_path):
    """Days 0, 1 and 9 with a calendar hole: the trailing frame divides
    by the ACTUAL frame length at the head (1, 2, …) and zero-fills
    missing days, matching the SQL twin's densified ROWS frame."""
    rows = [
        (1, 0, 7.00, "1-URGENT"),
        (2, 1, 14.00, "1-URGENT"),
        (3, 9, 70.00, "1-URGENT"),
    ]
    df = W2.orders_moving_avg(_write_orders(tmp_path, rows))
    assert len(df) == 10  # densified 0..9
    cents = df.set_index("day")["revenue_e2"]
    assert cents["1970-01-01"] == 700 and cents["1970-01-10"] == 7000
    assert df["revenue_e2"].iloc[2:9].eq(0).all()  # the hole is zero-filled
    # head frames: day0 avg = 700/1, day1 avg = (700+1400)//2
    assert df["avg7_e2"].iloc[0] == 700
    assert df["avg7_e2"].iloc[1] == 1050
    # day9's trailing-7 window covers days 3..9 → only the 7000
    assert df["sum7_e2"].iloc[9] == 7000
    assert df["avg7_e2"].iloc[9] == 1000
    # day7 window covers days 1..7 → the 1400 from day 1
    assert df["sum7_e2"].iloc[7] == 1400


def test_cohort_matrix_matches_pandas(ray_session, tmp_path):
    rows = [
        (1, 0, 10.0, "1-URGENT"),      # 1970 cohort
        (1, 800, 20.0, "1-URGENT"),    # 1972
        (2, 800, 30.0, "1-URGENT"),    # 1972 cohort
        (2, 900, 40.0, "1-URGENT"),    # 1972
        (3, 400, 50.0, "1-URGENT"),    # 1971 cohort
    ]
    got = W2.first_order_cohort_revenue(_write_orders(tmp_path, rows))
    base = pd.DataFrame(
        {
            "cust": [r[0] for r in rows],
            "yr": [1970 + r[1] // 365 for r in rows],
            "cents": [int(r[2] * 100) for r in rows],
        }
    )
    base["cohort_year"] = base.groupby("cust")["yr"].transform("min")
    exp = (
        base.groupby(["cohort_year", "yr"], as_index=False)
        .agg(revenue_e2=("cents", "sum"), n_orders=("cents", "size"))
        .rename(columns={"yr": "order_year"})
        .sort_values(["cohort_year", "order_year"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_yoy_delta_gapped_years(ray_session, tmp_path):
    """LAG over a series with a missing year steps to the previous
    EXISTING year, and the first year of each priority emits no row."""
    rows = [
        (1, 0, 10.0, "1-URGENT"),       # 1970
        (2, 400, 30.0, "1-URGENT"),     # 1971
        (3, 1200, 70.0, "1-URGENT"),    # 1973 (1972 missing)
        (4, 0, 5.0, "2-HIGH"),          # 1970 only → no delta row
    ]
    df = W2.priority_yoy_delta(_write_orders(tmp_path, rows))
    assert list(df["o_orderpriority"]) == ["1-URGENT", "1-URGENT"]
    assert list(df["order_year"]) == [1971, 1973]
    assert list(df["prev_revenue_e2"]) == [1000, 3000]
    assert list(df["delta_e2"]) == [2000, 4000]
