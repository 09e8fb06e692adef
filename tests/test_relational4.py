"""Fourth relational wave: FULL OUTER aggregate join, grouped top-k +
ordered string_agg, and exact distributed NTILE — each vs its DuckDB
twin at sf0.001 plus shape invariants."""

import duckdb
import pandas as pd
import pytest

from gotenberg_ray.pipelines import relational4 as R4


def _con(sf_dir, *tables):
    con = duckdb.connect()
    for t in tables:
        con.sql(f"CREATE VIEW {t} AS FROM '{sf_dir}/{t}.parquet'")
    return con


@pytest.mark.usefixtures("ray_session")
class TestFullOuter:
    def test_matches_sql_twin_and_outer_rows(self, sf_dir):
        a = R4.nation_balance_full_outer(sf_dir)
        b = R4.nation_balance_full_outer(sf_dir)
        pd.testing.assert_frame_equal(a, b)
        con = _con(sf_dir, "customer", "supplier")
        want = con.sql(R4.FULL_OUTER_SQL).df().astype("int64")
        pd.testing.assert_frame_equal(a.reset_index(drop=True), want)
        # outer semantics: at least one nation missing a side shows
        # a zero fill (sparse thresholds guarantee it at small sf)
        assert ((a["n_cust"] == 0) | (a["n_supp"] == 0)).any()
        assert (a[["n_cust", "n_supp"]].sum(axis=1) > 0).all()


@pytest.mark.usefixtures("ray_session")
class TestTopCustomersAgg:
    def test_matches_sql_twin_and_rank_order(self, sf_dir):
        a = R4.nation_top_customers_agg(sf_dir)
        con = _con(sf_dir, "customer")
        want = con.sql(R4.TOP_CUSTOMERS_AGG_SQL).df()
        for c in ("c_nationkey", "top_cents", "n_top"):
            want[c] = want[c].astype("int64")
        pd.testing.assert_frame_equal(a.reset_index(drop=True), want)
        assert (a["n_top"] <= R4.TOP_K).all()
        # names concatenate in rank order, comma-separated
        assert a["top_names"].str.count(",").eq(a["n_top"] - 1).all()


@pytest.mark.usefixtures("ray_session")
class TestNtile:
    def test_matches_sql_twin_and_fill_rule(self, sf_dir):
        a = R4.orders_price_ntile(sf_dir)
        con = _con(sf_dir, "orders")
        want = con.sql(R4.NTILE_SQL).df().astype("int64")
        pd.testing.assert_frame_equal(a.reset_index(drop=True), want)
        n = int(a["n_orders"].sum())
        q, r = divmod(n, R4.NTILE_K)
        sizes = a.sort_values("bucket")["n_orders"].tolist()
        assert sizes == [q + 1] * r + [q] * (R4.NTILE_K - r)
        # buckets partition the price range: descending, disjoint
        assert (
            a.sort_values("bucket")["min_cents"].iloc[:-1].values
            >= a.sort_values("bucket")["max_cents"].iloc[1:].values
        ).all()
