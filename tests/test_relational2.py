"""Advanced relational queries (q4/q7/q14/q15/q17/q18/q19 shapes)
checked vs their DuckDB SQL twins at sf0.001 — the driver re-checks
the same pairs at sf0.01."""

import duckdb
import pandas as pd
import pytest

from gotenberg_ray.pipelines import relational2 as R2


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
    ("q4", R2.q4_late_ship_orders, R2.Q4_SQL),
    ("q7", R2.q7_nation_trade, R2.Q7_SQL),
    ("q14", R2.q14_promo_revenue, R2.Q14_SQL),
    ("q15", R2.q15_top_supplier, R2.Q15_SQL),
    ("q17", R2.q17_small_quantity, R2.Q17_SQL),
    ("q18", R2.q18_large_orders, R2.Q18_SQL),
    ("q19", R2.q19_branded_revenue, R2.Q19_SQL),
]


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("name,fn,sql", CASES, ids=[c[0] for c in CASES])
def test_matches_oracle(sf_dir, name, fn, sql):
    got = fn(sf_dir)
    con = _con(sf_dir)
    want = con.sql(sql).df()
    _check(got, want)


@pytest.mark.usefixtures("ray_session")
def test_q4_nondegenerate(sf_dir):
    """The EXISTS predicate must neither match everything nor nothing."""
    got = R2.q4_late_ship_orders(sf_dir)
    con = _con(sf_dir)
    total = con.sql("SELECT count(*) FROM orders").fetchone()[0]
    assert 0 < got["n_orders"].sum() < total


@pytest.mark.usefixtures("ray_session")
def test_q15_ties_survive(sf_dir):
    """Argmax keeps ALL suppliers tied at the max revenue."""
    got = R2.q15_top_supplier(sf_dir)
    assert len(got) >= 1
    assert (got["total_rev_e4"] == got["total_rev_e4"].max()).all()


@pytest.mark.usefixtures("ray_session")
def test_q18_threshold_filters(sf_dir):
    got = R2.q18_large_orders(sf_dir)
    assert (got["qty_e2"] > 150 * 100).all()
    # descending by quantity, orderkey tiebreak
    assert got["qty_e2"].is_monotonic_decreasing or len(got) <= 1


@pytest.mark.usefixtures("ray_session")
def test_left_outer_keeps_zero_sale_suppliers(sf_dir):
    got = R2.supplier_window_revenue(sf_dir)
    con = duckdb.connect()
    for t in ("supplier", "lineitem"):
        con.sql(f"CREATE VIEW {t} AS FROM '{sf_dir}/{t}.parquet'")
    _check(got, con.sql(R2.SUPPLIER_WINDOW_SQL).df())
    # the outer join is non-degenerate both ways
    assert (got["n_sales"] == 0).any()
    assert (got["n_sales"] > 0).any()
    assert ((got["n_sales"] == 0) == (got["revenue_e4"] == 0)).all()
