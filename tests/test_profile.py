"""Column-profiling contract tests for ``analytics.orders_profile``
(previously pinned only by its oracle pair): null accounting (the
synthetic tables carry no nulls, so the null path needs explicit
coverage), distinct-count exactness for every column kind
(int / timestamp / string / double), and cross-block dedup of the
distinct pairs."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from gotenberg_ray.pipelines import analytics as AN

PROFILE_COLS = (
    "o_custkey",
    "o_orderdate",
    "o_orderkey",
    "o_orderpriority",
    "o_orderstatus",
    "o_totalprice",
)


def _write(tmp_path, n, *, dup_every=3, null_every=None):
    prio = ["1-URGENT", "2-HIGH", "3-MEDIUM"]
    key = np.arange(1, n + 1, dtype=np.int64)
    cust = (key % max(1, n // dup_every)).astype(np.int64)  # duplicates
    price = (key % 7).astype(np.float64) + 0.25
    status = pa.array(["O" if i % 2 else "F" for i in range(n)])
    dates = pa.array(
        [pd.Timestamp("1995-01-01") + pd.Timedelta(days=int(i % 11)) for i in range(n)],
        pa.timestamp("us"),
    )
    pr = pa.array([prio[i % 3] for i in range(n)])
    if null_every:
        cust_list = [int(c) if i % null_every else None for i, c in enumerate(cust)]
        cust_arr = pa.array(cust_list, pa.int64())
    else:
        cust_arr = pa.array(cust)
    t = pa.table(
        {
            "o_orderkey": pa.array(key),
            "o_custkey": cust_arr,
            "o_orderstatus": status,
            "o_totalprice": pa.array(price),
            "o_orderdate": dates,
            "o_orderpriority": pr,
        }
    )
    pq.write_table(t, tmp_path / "orders.parquet")
    return str(tmp_path), t


def test_profile_exact_counts_all_kinds(ray_session, tmp_path):
    sf, t = _write(tmp_path, 60)
    df = AN.orders_profile(sf).set_index("col_name")
    for name in PROFILE_COLS:
        col = t.column(name)
        assert df.loc[name, "n_rows"] == 60
        assert df.loc[name, "n_null"] == 0
        exact = len(set(col.drop_null().to_pylist()))
        assert df.loc[name, "n_distinct"] == exact, name


def test_profile_null_accounting(ray_session, tmp_path):
    sf, t = _write(tmp_path, 30, null_every=5)  # rows 0,5,10,... null
    df = AN.orders_profile(sf).set_index("col_name")
    assert df.loc["o_custkey", "n_null"] == 6
    exact = len(set(t.column("o_custkey").drop_null().to_pylist()))
    assert df.loc["o_custkey", "n_distinct"] == exact
    # null-free columns unaffected
    assert df.loc["o_orderkey", "n_null"] == 0
    assert df.loc["o_orderkey", "n_distinct"] == 30
