"""Analytics operators: anti-join, sort-free exact quantiles,
two-phase distinct, HLL sketch — checked vs duckdb/pandas at sf0.001
(the driver's oracle re-checks the SQL twins at sf0.01)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from gotenberg_ray.pipelines import analytics as AN


def _con(sf_dir):
    con = duckdb.connect()
    for t in ("customer", "orders", "nation", "events"):
        con.sql(f"CREATE VIEW {t} AS FROM '{sf_dir}/{t}.parquet'")
    return con


@pytest.mark.usefixtures("ray_session")
class TestAntiJoin:
    def test_matches_sql(self, sf_dir):
        got = AN.customers_no_urgent_orders(sf_dir)
        con = _con(sf_dir)
        want = con.sql(AN.NO_ORDERS_SQL).df()
        want["n_customers"] = want["n_customers"].astype("int64")
        pd.testing.assert_frame_equal(got, want)
        assert got["n_customers"].sum() > 0  # non-degenerate input

    def test_all_match_keeps_schema(self, sf_dir):
        """Every customer has SOME order on this corpus, so the anti
        join against an unfiltered right side is empty — the result
        must still carry the (n_name, n_customers) schema."""
        got = AN.customers_no_urgent_orders(sf_dir, priority="0-NONE")
        # right side empty → NOTHING eliminated → all customers present
        assert got["n_customers"].sum() == 150
        con = _con(sf_dir)
        empty = con.sql(
            "SELECT count(DISTINCT o_orderpriority) FROM orders"
        ).fetchone()[0]
        assert empty == 5  # '0-NONE' really is absent


@pytest.mark.usefixtures("ray_session")
class TestQuantiles:
    def test_matches_quantile_disc(self, sf_dir):
        got = AN.order_price_quantiles(sf_dir)
        con = _con(sf_dir)
        want = con.sql(AN.PRICE_QUANTILES_SQL).df()
        for c in ("p50_e2", "p90_e2", "n_orders"):
            want[c] = want[c].astype("int64")
        pd.testing.assert_frame_equal(got, want)

    def test_quantiles_are_order_stats(self, sf_dir):
        got = AN.order_price_quantiles(sf_dir)
        orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
        e2 = np.round(orders["o_totalprice"] * 100).astype("int64")
        for _, row in got.iterrows():
            vals = np.sort(e2[orders["o_orderpriority"] == row["o_orderpriority"]])
            assert row["p50_e2"] in vals and row["p90_e2"] in vals
            assert row["p50_e2"] <= row["p90_e2"]


@pytest.mark.usefixtures("ray_session")
class TestDistinct:
    def test_matches_count_distinct(self, sf_dir):
        got = AN.distinct_users_daily(sf_dir)
        con = _con(sf_dir)
        want = con.sql(AN.DISTINCT_DAILY_SQL).df()
        want["n_users"] = want["n_users"].astype("int64")
        pd.testing.assert_frame_equal(got, want)


@pytest.mark.usefixtures("ray_session")
class TestHll:
    def test_error_bound_vs_exact(self, sf_dir):
        got = AN.hll_users_per_type(sf_dir)
        ev = pd.read_parquet(f"{sf_dir}/events.parquet")
        exact = ev.groupby("event_type")["user_id"].nunique()
        for _, row in got.iterrows():
            true = exact[row["event_type"]]
            # 2^12 registers → σ≈1.6%; allow 5σ plus small-count slack
            assert abs(row["est_users"] - true) <= max(0.1 * true, 3)

    def test_deterministic_and_layout_independent(self, sf_dir):
        a = AN.hll_users_per_type(sf_dir)
        b = AN.hll_users_per_type(sf_dir)
        pd.testing.assert_frame_equal(a, b)

    def test_merge_equals_single_sketch(self):
        """Mergeability: sketching two halves and max-merging equals
        one sketch over the union (the 100 TB correctness property)."""
        from gotenberg_ray.functions.hashing import splitmix64

        ids = np.arange(10_000, dtype=np.uint64)
        h = splitmix64(ids)
        whole = np.zeros(AN.HLL_M, dtype=np.uint8)
        AN._hll_add(whole, h)
        left = np.zeros(AN.HLL_M, dtype=np.uint8)
        right = np.zeros(AN.HLL_M, dtype=np.uint8)
        AN._hll_add(left, h[:6000])
        AN._hll_add(right, h[4000:])  # overlap on purpose
        merged = np.maximum(left, right)
        assert np.array_equal(merged, whole)
        est = AN._hll_estimate(whole)
        assert abs(est - 10_000) <= 0.05 * 10_000


@pytest.mark.usefixtures("ray_session")
class TestQuantileSketch:
    def test_error_bound_and_determinism(self, sf_dir):
        got = AN.quantile_sketch(sf_dir)
        pd.testing.assert_frame_equal(got, AN.quantile_sketch(sf_dir))
        orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
        cents = np.sort(
            np.round(orders["o_totalprice"].to_numpy() * 100).astype("int64")
        )
        n = len(cents)
        for _, row in got.iterrows():
            # rank error ≤ 5/√k (5σ) — generous at small sf where the
            # sample IS the population
            est_rank = np.searchsorted(cents, row["est_cents"]) / n
            assert abs(est_rank - row["quantile"] / 100) <= max(
                5 / np.sqrt(AN.SKETCH_K), 0.03
            )

    def test_sample_is_layout_invariant(self, sf_dir):
        """The survivor set is a pure function of the keys: block
        boundaries can't change which rows the sketch keeps (the
        mergeability property)."""
        import ray.data as rd

        from gotenberg_ray.functions.hashing import splitmix64

        orders = pd.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
        )
        keys = orders["o_orderkey"].to_numpy().astype("uint64")
        pri = splitmix64(keys)
        k = min(AN.SKETCH_K, len(pri))
        expect = np.sort(
            np.round(
                orders["o_totalprice"].to_numpy()[np.argsort(pri)[:k]] * 100
            ).astype("int64")
        )
        got = AN.quantile_sketch(sf_dir)
        # p50 estimate must be an element of the expected survivor set
        assert got["est_cents"].iloc[0] in expect


@pytest.mark.usefixtures("ray_session")
class TestCorrMoments:
    def test_matches_sql_twin(self, sf_dir):
        got = AN.corr_qty_price(sf_dir)
        con = duckdb.connect()
        con.sql(f"CREATE VIEW lineitem AS FROM '{sf_dir}/lineitem.parquet'")
        want = con.sql(AN.CORR_SQL).df()
        for c in want.columns[1:]:
            want[c] = want[c].astype("int64")
        pd.testing.assert_frame_equal(got, want)

    def test_carry_split_roundtrip(self):
        """hi·10⁹+lo must reconstruct exactly, incl. the int64 edge."""
        v = np.array(
            [0, 1, AN.CARRY - 1, AN.CARRY, 123_456_789_012_345_678,
             np.iinfo(np.int64).max], dtype=np.int64
        )
        hi, lo = AN._split_carry(v)
        assert (lo >= 0).all() and (lo < AN.CARRY).all()
        assert all(
            int(h) * AN.CARRY + int(l) == int(x)
            for h, l, x in zip(hi, lo, v)
        )

    def test_moments_match_pandas_exact(self, sf_dir):
        """Python-bigint recombination equals a direct exact
        computation over the raw column values."""
        import pyarrow.parquet as pq

        got = AN.corr_qty_price(sf_dir).set_index("l_returnflag")
        t = pq.read_table(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_returnflag", "l_quantity", "l_extendedprice"],
        ).to_pandas()
        t["x"] = t["l_quantity"].round().astype("int64")
        t["y"] = (t["l_extendedprice"] * 100).round().astype("int64")
        for flag, g in t.groupby("l_returnflag"):
            x = [int(v) for v in g["x"]]
            y = [int(v) for v in g["y"]]
            n = len(x)
            sx, sy = sum(x), sum(y)
            sxy = sum(a * b for a, b in zip(x, y))
            sy2 = sum(b * b for b in y)
            assert got.loc[flag, "n_rows"] == n
            assert got.loc[flag, "sum_qty"] == sx
            assert got.loc[flag, "sum_price_e2"] == sy
            assert got.loc[flag, "cov_qp"] == (n * sxy - sx * sy) // (n * n)
            assert got.loc[flag, "var_p"] == (n * sy2 - sy * sy) // (n * n)


@pytest.mark.usefixtures("ray_session")
class TestPriceMad:
    def test_matches_sql_twin(self, sf_dir):
        got = AN.orders_price_mad(sf_dir)
        con = _con(sf_dir)
        want = con.sql(AN.PRICE_MAD_SQL).df()
        for c in ("p50_e2", "mad_e2", "n_orders"):
            want[c] = want[c].astype("int64")
        pd.testing.assert_frame_equal(got, want)
        # MAD is a real deviation on this data, not degenerate
        assert (got["mad_e2"] > 0).all()


@pytest.mark.usefixtures("ray_session")
class TestPriceOutliers:
    def test_matches_sql_twin_and_consistency(self, sf_dir):
        import duckdb

        from gotenberg_ray.pipelines import analytics as AN

        a = AN.orders_price_outliers(sf_dir)
        con = duckdb.connect()
        con.sql(f"CREATE VIEW orders AS FROM '{sf_dir}/orders.parquet'")
        want = con.sql(AN.PRICE_OUTLIERS_SQL).df()
        for c in ("n_orders", "n_outliers", "p50_e2", "mad_e2"):
            want[c] = want[c].astype("int64")
        pd.testing.assert_frame_equal(a.reset_index(drop=True), want)
        # outliers are a strict minority under a 3-MAD gate
        assert (a["n_outliers"] * 2 < a["n_orders"]).all()
        # per-priority medians agree with the standalone MAD query
        mad = AN.orders_price_mad(sf_dir)
        merged = a.merge(mad, on="o_orderpriority", suffixes=("", "_m"))
        assert (merged["p50_e2"] == merged["p50_e2_m"]).all()
        assert (merged["mad_e2"] == merged["mad_e2_m"]).all()


@pytest.mark.usefixtures("ray_session")
class TestChi2:
    def test_matches_sql_twin_and_dow_convention(self, sf_dir):
        import duckdb

        from gotenberg_ray.pipelines import analytics as AN

        a = AN.events_chi2_type_dow(sf_dir)
        con = duckdb.connect()
        con.sql(f"CREATE VIEW events AS FROM '{sf_dir}/events.parquet'")
        want = con.sql(AN.CHI2_SQL).df()
        for c in want.columns:
            want[c] = want[c].astype("int64")
        pd.testing.assert_frame_equal(a.reset_index(drop=True), want)
        # python dow convention matches DuckDB dayofweek (0=Sunday)
        chk = con.sql(
            "SELECT DISTINCT dayofweek(ts) AS d,"
            " (epoch_us(ts) // 86400000000 + 4) % 7 AS p FROM events"
        ).df()
        assert (chk["d"] == chk["p"]).all()


@pytest.mark.usefixtures("ray_session")
class TestCumeDist:
    def test_matches_sql_twin(self, sf_dir):
        import duckdb

        got = AN.orders_cume_dist(sf_dir)
        con = duckdb.connect()
        con.sql(f"CREATE VIEW orders AS FROM '{sf_dir}/orders.parquet'")
        want = con.sql(AN.CUME_DIST_SQL).df()
        pd.testing.assert_frame_equal(got, want)

    def test_cdf_invariants(self, sf_dir):
        got = AN.orders_cume_dist(sf_dir)
        for _, g in got.groupby("o_orderpriority"):
            assert g["n_le"].is_monotonic_increasing
            assert (g["n_le"] <= g["n_total"]).all()
            assert g["n_le"].iloc[-1] == g["n_total"].iloc[0]


@pytest.mark.usefixtures("ray_session")
class TestMedian2P:
    def test_matches_sql_twin(self, sf_dir):
        import duckdb

        got = AN.order_price_median2p(sf_dir)
        con = duckdb.connect()
        con.sql(f"CREATE VIEW orders AS FROM '{sf_dir}/orders.parquet'")
        want = con.sql(AN.MEDIAN2P_SQL).df()
        pd.testing.assert_frame_equal(got, want)

    def test_agrees_with_full_histogram_path(self, sf_dir):
        two_pass = AN.order_price_median2p(sf_dir).set_index("o_orderpriority")
        full = AN.order_price_quantiles(sf_dir).set_index("o_orderpriority")
        assert (two_pass["p50_e2"] == full["p50_e2"]).all()
