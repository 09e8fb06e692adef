"""Fifth relational wave: contract tests beyond the DuckDB twins —
the bitmask-universe guard, the packed argmin/argmax decode algebra,
and the DISTINCT ON tie-break."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from gotenberg_ray.pipelines import relational5 as R5


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20000),  # days
            st.integers(min_value=1, max_value=2**33 - 1),  # orderkey
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[1],
    )
)
@settings(deadline=None)
def test_packed_minmax_is_lexicographic_argminmax(rows):
    """min/max over days·2³³+key must pick exactly the lexicographic
    (days, key) extremes — the invariant the SQL twin relies on."""
    pk = np.array([d * (1 << 33) + k for d, k in rows], dtype=np.int64)
    lo, hi = pk.min(), pk.max()
    first = min(rows)  # lexicographic (days, key)
    last = max(rows)
    assert (int(lo) >> 33, int(lo) & ((1 << 33) - 1)) == first
    assert (int(hi) >> 33, int(hi) & ((1 << 33) - 1)) == last


def test_division_rejects_wide_universe(ray_session, tmp_path):
    """>63 distinct classes must fail loudly (the bitmask contract),
    never silently wrap."""
    n = 70
    t = pa.table(
        {
            "o_custkey": pa.array([1] * n, pa.int64()),
            "o_orderpriority": pa.array([f"p{i:02d}" for i in range(n)]),
            "o_orderkey": pa.array(list(range(n)), pa.int64()),
            "o_orderstatus": pa.array(["O"] * n),
            "o_totalprice": pa.array([1.0] * n),
            "o_orderdate": pa.array(
                [pd.Timestamp("1995-01-01")] * n, pa.timestamp("us")
            ),
        }
    )
    pq.write_table(t, tmp_path / "orders.parquet")
    with pytest.raises(NotImplementedError, match="63-bit"):
        R5.customers_all_priorities(str(tmp_path))


def test_latest_event_tie_breaks_on_event_id(ray_session, tmp_path):
    """Two events with the SAME user and SAME timestamp: the higher
    event_id must win (the window twin's ORDER BY ts DESC, id DESC)."""
    ts = pd.Timestamp("2024-03-01 12:00:00")
    t = pa.table(
        {
            "event_id": pa.array([10, 11, 12], pa.int64()),
            "ts": pa.array([ts, ts, ts - pd.Timedelta(hours=1)], pa.timestamp("us")),
            "user_id": pa.array([7, 7, 7], pa.int64()),
            "event_type": pa.array(["view", "purchase", "click"]),
            "value": pa.array([1.0, 2.0, 3.0]),
            "props": pa.array(["{}", "{}", "{}"]),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    got = R5.latest_event_per_user(str(tmp_path))
    assert len(got) == 1
    assert int(got["event_id"][0]) == 11
    assert got["event_type"][0] == "purchase"
    assert int(got["value_e2"][0]) == 200
