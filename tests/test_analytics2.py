"""Window-rank / pivot / rollup operators vs DuckDB at sf0.001."""

import duckdb
import pandas as pd
import pytest

from gotenberg_ray.pipelines import analytics2 as A2


def _con(sf_dir):
    con = duckdb.connect()
    for t in ("orders", "events", "documents"):
        con.sql(f"CREATE VIEW {t} AS FROM '{sf_dir}/{t}.parquet'")
    return con


def _check(got, want):
    g = got.reindex(sorted(got.columns), axis=1).reset_index(drop=True)
    w = want.reindex(sorted(want.columns), axis=1).reset_index(drop=True)
    for c in w.columns:
        if str(w[c].dtype).startswith("int") or str(g[c].dtype).startswith("int"):
            w[c] = w[c].astype("int64")
            g[c] = g[c].astype("int64")
    pd.testing.assert_frame_equal(g, w)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize(
    "fn,sql",
    [
        (A2.top_orders_per_customer, A2.TOP_PER_CUSTOMER_SQL),
        (A2.event_type_pivot, A2.EVENT_PIVOT_SQL),
        (A2.lang_source_rollup, A2.ROLLUP_SQL),
    ],
    ids=["top_orders_per_customer", "event_type_pivot", "lang_source_rollup"],
)
def test_matches_oracle(sf_dir, fn, sql):
    got = fn(sf_dir)
    con = _con(sf_dir)
    _check(got, con.sql(sql).df())


@pytest.mark.usefixtures("ray_session")
def test_rank_window_shape(sf_dir):
    got = A2.top_orders_per_customer(sf_dir)
    per = got.groupby("o_custkey")
    assert (per.size() <= 3).all()
    # rn is 1..k and prices non-increasing within each customer
    for _, g in per:
        assert list(g["rn"]) == list(range(1, len(g) + 1))
        assert g["price_e2"].is_monotonic_decreasing or len(g) <= 1


@pytest.mark.usefixtures("ray_session")
def test_rollup_subtotals_consistent(sf_dir):
    got = A2.lang_source_rollup(sf_dir)
    total = got[(got["lang"] == "ALL") & (got["source"] == "ALL")]
    fine = got[(got["lang"] != "ALL") & (got["source"] != "ALL")]
    assert total["n_docs"].iloc[0] == fine["n_docs"].sum()
    assert total["total_chars"].iloc[0] == fine["total_chars"].sum()


@pytest.mark.usefixtures("ray_session")
def test_funnel_matches_oracle_and_is_monotone(sf_dir):
    got = A2.event_funnel(sf_dir)
    con = _con(sf_dir)
    want = con.sql(A2.FUNNEL_SQL).df()
    for c in want.columns:
        want[c] = want[c].astype("int64")
        got[c] = got[c].astype("int64")
    pd.testing.assert_frame_equal(got, want[got.columns])
    r = got.iloc[0]
    assert r["n_users"] >= r["n_viewed"] >= r["n_click_after_view"] >= r["n_purchase_funnel"]
    assert r["n_viewed"] > 0


@pytest.mark.usefixtures("ray_session")
def test_props_extraction_matches_json_oracle(sf_dir):
    got = A2.props_key_stats(sf_dir)
    con = _con(sf_dir)
    want = con.sql(A2.PROPS_SQL).df()
    _check(got, want)
    assert (got["n_with_k"] > 0).any()  # extraction actually fires


@pytest.mark.usefixtures("ray_session")
def test_price_page_matches_oracle(sf_dir):
    got = A2.orders_price_page(sf_dir)
    con = _con(sf_dir)
    want = con.sql(A2.PRICE_PAGE_SQL).df()
    _check(got, want)
    assert list(got["rn"]) == list(range(101, 111))
    assert got["price_e2"].is_monotonic_decreasing or got["price_e2"].nunique() < 10


@pytest.mark.usefixtures("ray_session")
class TestCube:
    def test_matches_sql_twin_and_contains_rollup(self, sf_dir):
        import duckdb

        from gotenberg_ray.pipelines import analytics2 as A2

        a = A2.lang_source_cube(sf_dir)
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS FROM '{sf_dir}/documents.parquet'")
        want = con.sql(A2.CUBE_SQL).df()
        for c in ("total_chars", "n_docs"):
            want[c] = want[c].astype("int64")
        pd.testing.assert_frame_equal(a.reset_index(drop=True), want)
        # the cube is a superset of the rollup's grouping sets
        roll = A2.lang_source_rollup(sf_dir)
        merged = roll.merge(a, on=list(roll.columns), how="left", indicator=True)
        assert (merged["_merge"] == "both").all()
