"""Seventh analytic wave: contract tests beyond the DuckDB twins —
ROLLUP/CUBE expansion from the finest grid (including the empty-input
grand-total contract), pivot column totals, and the integer EWMA
recurrence."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from gotenberg_ray.pipelines import rollup as RU


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


def _write_events(tmp_path, rows):
    """rows: list of (user_id, day_num, event_type)."""
    t = pa.table(
        {
            "event_id": pa.array(list(range(1, len(rows) + 1)), pa.int64()),
            "ts": pa.array(
                [pd.Timestamp("1970-01-01") + pd.Timedelta(days=r[1]) for r in rows],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows]),
            "value": pa.array([1.0] * len(rows)),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    return str(tmp_path)


def test_rollup_levels_and_totals(ray_session, tmp_path):
    rows = [
        (0, 10.0, "1-URGENT"),    # 1970
        (400, 20.0, "1-URGENT"),  # 1971
        (0, 5.0, "2-HIGH"),       # 1970
    ]
    df = RU.priority_year_rollup(_write_orders(tmp_path, rows))
    # finest rows + 2 priority subtotals + grand total
    assert len(df) == 3 + 2 + 1
    total = df[(df["o_orderpriority"] == RU.ALL_PRIORITY)]
    assert len(total) == 1
    assert int(total["revenue_e2"].iloc[0]) == 3500
    assert int(total["n_orders"].iloc[0]) == 3
    sub = df[
        (df["o_orderpriority"] == "1-URGENT") & (df["order_year"] == RU.ALL_YEAR)
    ]
    assert int(sub["revenue_e2"].iloc[0]) == 3000 and int(sub["n_orders"].iloc[0]) == 2
    # every subtotal equals the sum of its finest rows
    fin = df[(df["order_year"] != RU.ALL_YEAR)]
    for p, g in fin.groupby("o_orderpriority"):
        s = df[(df["o_orderpriority"] == p) & (df["order_year"] == RU.ALL_YEAR)]
        assert int(s["revenue_e2"].iloc[0]) == int(g["revenue_e2"].sum())


def test_rollup_empty_input_grand_total_row(ray_session, tmp_path):
    df = RU.priority_year_rollup(_write_orders(tmp_path, []))
    assert len(df) == 1
    assert df["o_orderpriority"].iloc[0] == RU.ALL_PRIORITY
    assert int(df["revenue_e2"].iloc[0]) == 0 and int(df["n_orders"].iloc[0]) == 0


def test_pivot_counts_and_total(ray_session, tmp_path):
    rows = [
        (1, 0, "click"),
        (2, 0, "click"),
        (3, 0, "view"),
        (1, 1, "purchase"),
    ]
    df = RU.events_type_pivot(_write_events(tmp_path, rows))
    assert list(df["day"]) == ["1970-01-01", "1970-01-02"]
    d0 = df.iloc[0]
    assert d0["n_click"] == 2 and d0["n_view"] == 1 and d0["n_purchase"] == 0
    assert d0["n_total"] == 3
    # row total always equals the sum of the type columns here (all
    # types in the fixed list)
    tc = [f"n_{t}" for t in RU.EVENT_TYPES]
    assert (df[tc].sum(axis=1) == df["n_total"]).all()


def test_ewma_recurrence_exact(ray_session, tmp_path):
    rows = [(0, 8.00, "1-URGENT"), (2, 1.60, "1-URGENT")]
    df = RU.orders_ewma(_write_orders(tmp_path, rows))
    # dense days 0..2; e0=800, e1=(0+7*800)//8=700, e2=(160+7*700)//8
    assert list(df["revenue_e2"]) == [800, 0, 160]
    assert list(df["ewma_e2"]) == [800, 700, (160 + 7 * 700) // 8]


def test_ewma_matches_numpy_reference(ray_session, tmp_path):
    rng = np.random.default_rng(7)
    days = sorted(set(rng.integers(0, 60, size=25).tolist()))
    rows = [(d, float(rng.integers(1, 500)) / 100.0, "1-URGENT") for d in days]
    df = RU.orders_ewma(_write_orders(tmp_path, rows))
    dense = np.zeros(days[-1] - days[0] + 1, dtype=np.int64)
    for d, p, _ in rows:
        dense[d - days[0]] += round(p * 100)
    acc, exp = int(dense[0]), [int(dense[0])]
    for r in dense[1:]:
        acc = (int(r) + 7 * acc) // 8
        exp.append(acc)
    assert list(df["ewma_e2"]) == exp


def test_cube_marginals_consistent(ray_session, tmp_path):
    t = pa.table(
        {
            "l_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
            "l_partkey": pa.array([1, 1, 1, 1], pa.int64()),
            "l_suppkey": pa.array([1, 1, 1, 1], pa.int64()),
            "l_linenumber": pa.array([1, 1, 1, 1], pa.int32()),
            "l_quantity": pa.array([1.0, 2.0, 3.0, 4.0]),
            "l_extendedprice": pa.array([10.0, 20.0, 30.0, 40.0]),
            "l_discount": pa.array([0.0] * 4),
            "l_tax": pa.array([0.0] * 4),
            "l_returnflag": pa.array(["A", "A", "R", "R"]),
            "l_linestatus": pa.array(["F", "O", "F", "F"]),
            "l_shipdate": pa.array([pd.Timestamp("1995-01-01")] * 4, pa.timestamp("us")),
        }
    )
    pq.write_table(t, tmp_path / "lineitem.parquet")
    df = RU.returnflag_cube(str(tmp_path))
    # grid(3 distinct pairs) + flag marginals(2) + status marginals(2)
    # + grand total
    assert len(df) == 3 + 2 + 2 + 1
    gt = df[
        (df["l_returnflag"] == RU.ALL_FLAG) & (df["l_linestatus"] == RU.ALL_FLAG)
    ]
    assert int(gt["sum_qty_e2"].iloc[0]) == 1000
    assert int(gt["n_lines"].iloc[0]) == 4
    mf = df[(df["l_returnflag"] == "R") & (df["l_linestatus"] == RU.ALL_FLAG)]
    assert int(mf["sum_price_e2"].iloc[0]) == 7000
    ms = df[(df["l_returnflag"] == RU.ALL_FLAG) & (df["l_linestatus"] == "F")]
    assert int(ms["n_lines"].iloc[0]) == 3
