"""Eighth analytic wave: integer basis-point shares summing to
<= 10000 per year."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from gotenberg_ray.pipelines import semistruct as SS


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
