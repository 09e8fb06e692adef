"""Third relational wave (q2/q9/q11/q12/q13/q16/q20/q21/q22 shapes)
checked vs their DuckDB SQL twins at sf0.001 — the driver re-checks
the same pairs at sf0.01."""

import duckdb
import pandas as pd
import pytest

from gotenberg_ray.pipelines import relational3 as R3


def _con(sf_dir):
    con = duckdb.connect()
    for t in ("nation", "customer", "supplier", "part", "orders", "lineitem"):
        con.sql(f"CREATE VIEW {t} AS FROM '{sf_dir}/{t}.parquet'")
    return con


def _check(got: pd.DataFrame, want: pd.DataFrame):
    g = got.reindex(sorted(got.columns), axis=1).reset_index(drop=True)
    w = want.reindex(sorted(want.columns), axis=1).reset_index(drop=True)
    assert list(g.columns) == list(w.columns)
    for c in w.columns:
        if str(w[c].dtype).startswith("int") or str(g[c].dtype).startswith("int"):
            w[c] = w[c].astype("int64")
            g[c] = g[c].astype("int64")
    pd.testing.assert_frame_equal(g, w)


CASES = [
    ("q2", R3.q2_min_price_supplier, R3.Q2_SQL),
    ("q9", R3.q9_product_profit, R3.Q9_SQL),
    ("q11", R3.q11_important_parts, R3.Q11_SQL),
    ("q12", R3.q12_priority_lines, R3.Q12_SQL),
    ("q13", R3.q13_order_distribution, R3.Q13_SQL),
    ("q16", R3.q16_part_supplier_counts, R3.Q16_SQL),
    ("q20", R3.q20_excess_suppliers, R3.Q20_SQL),
    ("q21", R3.q21_waiting_suppliers, R3.Q21_SQL),
    ("q22", R3.q22_idle_customers, R3.Q22_SQL),
]


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("name,fn,sql", CASES, ids=[c[0] for c in CASES])
def test_matches_oracle(sf_dir, name, fn, sql):
    got = fn(sf_dir)
    con = _con(sf_dir)
    want = con.sql(sql).df()
    _check(got, want)


@pytest.mark.usefixtures("ray_session")
def test_q13_zero_bucket_present(sf_dir):
    """The left-outer join must surface customers with no qualifying
    orders — the k=0 bucket exists only if unmatched rows survive."""
    got = R3.q13_order_distribution(sf_dir)
    con = _con(sf_dir)
    n_cust = con.sql("SELECT count(*) FROM customer").fetchone()[0]
    assert got["custdist"].sum() == n_cust
    n_zero = con.sql(
        "SELECT count(*) FROM customer c WHERE NOT EXISTS "
        "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
        " AND o.o_orderpriority <> '5-LOW')"
    ).fetchone()[0]
    got_zero = int(got.loc[got["c_count"] == 0, "custdist"].sum())
    assert got_zero == n_zero


@pytest.mark.usefixtures("ray_session")
def test_q2_argmin_deterministic_ties(sf_dir):
    """Ties on min price must break to the smallest suppkey — rerun
    yields the identical frame regardless of block layout."""
    a = R3.q2_min_price_supplier(sf_dir)
    b = R3.q2_min_price_supplier(sf_dir)
    pd.testing.assert_frame_equal(a, b)


@pytest.mark.usefixtures("ray_session")
def test_q21_sole_blame_bounds(sf_dir):
    """Every blamed order contributes exactly once: total numwait can't
    exceed the number of finished orders."""
    got = R3.q21_waiting_suppliers(sf_dir, topk=10**6)
    con = _con(sf_dir)
    finished = con.sql(
        "SELECT count(*) FROM orders WHERE o_orderstatus = 'F'"
    ).fetchone()[0]
    assert 0 <= got["numwait"].sum() <= finished
