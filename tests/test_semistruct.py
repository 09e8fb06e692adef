"""Eighth analytic wave: contract tests beyond the DuckDB twins —
malformed-JSON exclusion in the vectorized extractor, the exact
quantile_disc position (ceil(q*n)) against a numpy reference including
heavy duplicate values, and integer basis-point shares summing to
<= 10000 per year."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings
from hypothesis import strategies as st

from gotenberg_ray.pipelines import semistruct as SS


def _write_events(tmp_path, rows):
    """rows: list of (event_type, props_str)."""
    t = pa.table(
        {
            "event_id": pa.array(list(range(1, len(rows) + 1)), pa.int64()),
            "ts": pa.array(
                [pd.Timestamp("1970-01-01")] * len(rows), pa.timestamp("us")
            ),
            "user_id": pa.array([1] * len(rows), pa.int64()),
            "event_type": pa.array([r[0] for r in rows]),
            "value": pa.array([1.0] * len(rows)),
            "props": pa.array([r[1] for r in rows]),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    return str(tmp_path)


def _write_orders(tmp_path, prices_by_prio):
    """prices_by_prio: dict priority -> list of float prices."""
    rows = [(p, v) for p, vs in prices_by_prio.items() for v in vs]
    t = pa.table(
        {
            "o_orderkey": pa.array(list(range(1, len(rows) + 1)), pa.int64()),
            "o_custkey": pa.array([1] * len(rows), pa.int64()),
            "o_orderdate": pa.array(
                [pd.Timestamp("1995-06-01")] * len(rows), pa.timestamp("us")
            ),
            "o_totalprice": pa.array([float(r[1]) for r in rows]),
            "o_orderpriority": pa.array([r[0] for r in rows]),
        }
    )
    pq.write_table(t, tmp_path / "orders.parquet")
    return str(tmp_path)


def test_props_extract_skips_malformed(ray_session, tmp_path):
    rows = [
        ("click", '{"k": 10}'),
        ("click", '{"k": -3}'),
        ("click", '{"j": 5}'),      # no k → excluded
        ("click", "not json"),      # malformed → excluded
        ("view", '{"k":  7}'),      # whitespace tolerated
    ]
    df = SS.props_value_stats(_write_events(tmp_path, rows))
    got = df.set_index("event_type")
    assert got.loc["click", "n"] == 2
    assert got.loc["click", "sum_k"] == 7
    assert got.loc["click", "min_k"] == -3
    assert got.loc["view", "max_k"] == 7


def _disc_reference(vals, num, den):
    """DuckDB quantile_disc: sorted[ceil(q*n) - 1]."""
    s = sorted(vals)
    pos = -((-len(s) * num) // den)
    return s[pos - 1]


@given(
    st.lists(
        st.integers(min_value=1, max_value=40),  # heavy duplicates
        min_size=1,
        max_size=120,
    )
)
@settings(deadline=None, max_examples=25)
def test_percentiles_match_disc_reference(ray_session, tmp_path_factory, cents):
    tmp = tmp_path_factory.mktemp("pct")
    sf = _write_orders(tmp, {"1-URGENT": [c / 100.0 for c in cents]})
    df = SS.priority_price_percentiles(sf)
    assert len(df) == 1
    row = df.iloc[0]
    assert row["n_orders"] == len(cents)
    for label, num, den in SS.PCTS:
        assert row[label + "_e2"] == _disc_reference(cents, num, den), label


def test_percentiles_multiple_groups(ray_session, tmp_path):
    sf = _write_orders(
        tmp_path,
        {
            "1-URGENT": [0.10, 0.20, 0.30, 0.40],
            "2-HIGH": [1.00],
        },
    )
    df = SS.priority_price_percentiles(sf)
    g = df.set_index("o_orderpriority")
    # n=4: p25→idx0, p50→idx1, p75→idx2, p90→idx3 (ceil(q*4)-1)
    assert list(g.loc["1-URGENT", ["p25_e2", "p50_e2", "p75_e2", "p90_e2"]]) == [
        10, 20, 30, 40,
    ]
    assert all(g.loc["2-HIGH", [l + "_e2" for l, _, _ in SS.PCTS]] == 100)


def test_revenue_share_sums_to_at_most_10000(ray_session, tmp_path):
    sf = _write_orders(
        tmp_path,
        {
            "1-URGENT": [10.00, 20.00],
            "2-HIGH": [30.00],
            "3-MEDIUM": [0.01],
        },
    )
    df = SS.priority_revenue_share(sf)
    tot = int(df["year_revenue_e2"].iloc[0])
    assert tot == 6001
    # integer floor shares: sum over a year never exceeds 10000, and
    # each share is exactly cents * 10000 // total
    per_year = df.groupby("order_year")["share_bp"].sum()
    assert (per_year <= 10_000).all()
    for _, r in df.iterrows():
        assert r["share_bp"] == r["revenue_e2"] * 10_000 // tot
