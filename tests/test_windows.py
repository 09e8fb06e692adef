"""Temporal custom operators (as-of join, range join, sliding window)
— each checked against an independent pandas/duckdb recomputation at
sf0.001 (the driver's DuckDB oracle re-checks at sf0.01)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from gotenberg_ray.pipelines import windows as W


def _events(sf_dir) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/events.parquet")


@pytest.mark.usefixtures("ray_session")
class TestAsof:
    def test_matches_duckdb_asof(self, sf_dir):
        got = W.events_asof_attribution(sf_dir)
        con = duckdb.connect()
        con.register("events", _events(sf_dir))
        want = con.sql(W.ASOF_SQL).df()
        pd.testing.assert_frame_equal(
            got.astype("int64"), want.astype("int64")
        )

    def test_attribution_semantics(self, sf_dir):
        """Hand-check one user: purchase latency = ts − latest view ≤ ts."""
        got = W.events_asof_attribution(sf_dir)
        ev = _events(sf_dir)
        uid = int(got["user_id"].iloc[0])
        g = ev[ev["user_id"] == uid]
        p = np.sort(g[g["event_type"] == "purchase"]["ts"].astype("datetime64[us]").astype("int64"))
        v = np.sort(g[g["event_type"] == "view"]["ts"].astype("datetime64[us]").astype("int64"))
        idx = np.searchsorted(v, p, side="right") - 1
        hit = idx >= 0
        row = got[got["user_id"] == uid].iloc[0]
        assert row["n_purchases"] == len(p)
        assert row["n_attributed"] == hit.sum()
        assert row["latency_s"] == int((p[hit] - v[idx[hit]]).sum()) // W.US

    def test_no_purchases_user_absent(self, sf_dir):
        got = W.events_asof_attribution(sf_dir)
        ev = _events(sf_dir)
        buyers = set(ev[ev["event_type"] == "purchase"]["user_id"])
        assert set(got["user_id"]) == buyers


@pytest.mark.usefixtures("ray_session")
class TestRangeJoin:
    def test_matches_pandas_interval_join(self, sf_dir):
        got = W.events_range_campaigns(sf_dir)
        ev = _events(sf_dir)
        ts = ev["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        val = np.round(ev["value"].to_numpy() * 100).astype("int64")
        lo, hi = W.campaign_bounds_us()
        rows = []
        for i in range(W.N_CAMPAIGNS):
            m = (ts >= lo[i]) & (ts < hi[i])
            if m.any():
                rows.append((i, int(m.sum()), int(val[m].sum())))
        want = pd.DataFrame(rows, columns=["campaign_id", "n_events", "sum_value_e2"])
        pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))

    def test_overlap_double_counts(self, sf_dir):
        """5-day windows every 2 days overlap: an event in the overlap
        belongs to >1 campaign, so Σ n_events > #events-in-range."""
        got = W.events_range_campaigns(sf_dir)
        ev = _events(sf_dir)
        ts = ev["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        lo, hi = W.campaign_bounds_us()
        in_any = (ts[None, :] >= lo[:, None]) & (ts[None, :] < hi[:, None])
        assert got["n_events"].sum() > in_any.any(axis=0).sum()


@pytest.mark.usefixtures("ray_session")
class TestRollingPeak:
    def test_matches_duckdb_window(self, sf_dir):
        got = W.events_rolling_peak(sf_dir)
        con = duckdb.connect()
        con.register("events", _events(sf_dir))
        want = con.sql(W.ROLLING_SQL).df()
        pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))

    def test_peak_bounds(self, sf_dir):
        got = W.events_rolling_peak(sf_dir)
        assert (got["peak_1h"] >= 1).all()
        assert (got["peak_1h"] <= got["n_events"]).all()


@pytest.mark.usefixtures("ray_session")
class TestIvf:
    def test_ivf_recall_vs_brute_force(self, sf_dir):
        from gotenberg_ray.pipelines import embedops as E

        exact = E.knn_topk(sf_dir)
        approx = E.knn_ivf(sf_dir)
        assert list(approx.columns) == ["rank", "vec_id"]
        assert approx["vec_id"].is_unique
        # nprobe=4/16 lists: demand ≥half of the true top-10 recalled
        overlap = set(approx["vec_id"]) & set(exact["vec_id"])
        assert len(overlap) >= 5

    def test_ivf_deterministic(self, sf_dir):
        from gotenberg_ray.pipelines import embedops as E

        a = E.knn_ivf(sf_dir)
        b = E.knn_ivf(sf_dir)
        pd.testing.assert_frame_equal(a, b)


@pytest.mark.usefixtures("ray_session")
class TestKnnInt8:
    def test_recall_vs_exact_and_deterministic(self, sf_dir):
        from gotenberg_ray.pipelines import embedops as E

        exact = set(E.knn_topk(sf_dir, k=10)["vec_id"])
        a = E.knn_int8(sf_dir, k=10)
        b = E.knn_int8(sf_dir, k=10)
        pd.testing.assert_frame_equal(a, b)
        assert list(a.columns) == ["rank", "vec_id"]
        recall = len(set(a["vec_id"]) & exact) / 10
        assert recall >= 0.9


@pytest.mark.usefixtures("ray_session")
class TestKnnPq:
    def test_recall_vs_exact_and_deterministic(self, sf_dir):
        from gotenberg_ray.pipelines import embedops as E

        exact = set(E.knn_topk(sf_dir, k=10)["vec_id"])
        a = E.knn_pq(sf_dir, k=10)
        b = E.knn_pq(sf_dir, k=10)
        pd.testing.assert_frame_equal(a, b)
        assert list(a.columns) == ["rank", "vec_id"]
        # ADC shortlist + exact refine: high recall expected
        assert len(set(a["vec_id"]) & exact) / 10 >= 0.9


@pytest.mark.usefixtures("ray_session")
class TestScd2Join:
    def test_matches_sql_twin_and_conserves_orders(self, sf_dir):
        import duckdb

        from gotenberg_ray.pipelines import windows as W

        a = W.orders_scd2_join(sf_dir)
        b = W.orders_scd2_join(sf_dir)
        pd.testing.assert_frame_equal(a, b)
        assert list(a.columns) == ["version", "n_orders", "total_cents"]
        con = duckdb.connect()
        for t in ("orders", "customer"):
            con.sql(f"CREATE VIEW {t} AS FROM '{sf_dir}/{t}.parquet'")
        want = con.sql(W.SCD2_SQL).df().astype("int64")
        pd.testing.assert_frame_equal(a.reset_index(drop=True), want.reset_index(drop=True))
        # every order falls in exactly one validity interval
        n_orders = con.sql("SELECT count(*) c FROM orders").df()["c"][0]
        assert int(a["n_orders"].sum()) == int(n_orders)


@pytest.mark.usefixtures("ray_session")
class TestUserActiveTime:
    def test_matches_sql_twin_and_bounds(self, sf_dir):
        import duckdb

        from gotenberg_ray.pipelines import windows as W

        a = W.user_active_time(sf_dir)
        b = W.user_active_time(sf_dir)
        pd.testing.assert_frame_equal(a, b)
        con = duckdb.connect()
        con.sql(f"CREATE VIEW events AS FROM '{sf_dir}/events.parquet'")
        want = con.sql(W.ACTIVE_TIME_SQL).df().astype("int64")
        pd.testing.assert_frame_equal(a.reset_index(drop=True), want)
        # union length bounded: one interval <= union <= n * interval
        dur = W.ACTIVE_DUR_S * W.US
        assert (a["active_us"] >= dur).all()
        assert (a["active_us"] <= a["n_events"] * dur).all()


@pytest.mark.usefixtures("ray_session")
class TestRetention:
    def test_matches_sql_twin_and_bounds(self, sf_dir):
        import duckdb

        from gotenberg_ray.pipelines import windows as W

        a = W.user_retention(sf_dir)
        con = duckdb.connect()
        con.sql(f"CREATE VIEW events AS FROM '{sf_dir}/events.parquet'")
        want = con.sql(W.RETENTION_SQL).df()
        for c in ("n_active", "n_retained"):
            want[c] = want[c].astype("int64")
        pd.testing.assert_frame_equal(a.reset_index(drop=True), want)
        assert (a["n_retained"] <= a["n_active"]).all()


@pytest.mark.usefixtures("ray_session")
class TestDecayedScore:
    def test_matches_sql_twin_and_weight_bounds(self, sf_dir):
        import duckdb

        from gotenberg_ray.pipelines import windows as W

        a = W.events_decayed_score(sf_dir)
        con = duckdb.connect()
        con.sql(f"CREATE VIEW events AS FROM '{sf_dir}/events.parquet'")
        want = con.sql(W.DECAYED_SQL).df()
        for c in ("decayed_score", "n_events"):
            want[c] = want[c].astype("int64")
        pd.testing.assert_frame_equal(a.reset_index(drop=True), want)
        # weights lie in [1, 2^30]: score bounded by n·2^window
        hi = np.int64(1) << np.int64(W.DECAY_WINDOW_D)
        assert (a["decayed_score"] >= a["n_events"]).all()
        assert (a["decayed_score"] <= a["n_events"] * hi).all()


@pytest.mark.usefixtures("ray_session")
class TestClickPurchasePairs:
    def test_matches_sql_twin_and_band(self, sf_dir):
        import duckdb

        from gotenberg_ray.pipelines import windows as W

        a = W.click_purchase_pairs(sf_dir)
        con = duckdb.connect()
        con.sql(f"CREATE VIEW events AS FROM '{sf_dir}/events.parquet'")
        want = con.sql(W.PAIRS_SQL).df()
        for c in ("user_id", "n_pairs", "total_gap_s"):
            want[c] = want[c].astype("int64")
        pd.testing.assert_frame_equal(a.reset_index(drop=True), want)
        # every pair's gap is < the band width
        assert (a["total_gap_s"] < a["n_pairs"] * W.PAIR_WINDOW_S).all()
        assert (a["n_pairs"] > 0).all()


@pytest.mark.usefixtures("ray_session")
class TestSpikeDays:
    def test_matches_sql_twin(self, sf_dir):
        import duckdb

        from gotenberg_ray.pipelines import windows as W

        a = W.events_spike_days(sf_dir)
        con = duckdb.connect()
        con.sql(f"CREATE VIEW events AS FROM '{sf_dir}/events.parquet'")
        want = con.sql(W.SPIKE_SQL).df()
        for c in ("n", "prev_n"):
            want[c] = want[c].astype("int64")
        pd.testing.assert_frame_equal(a.reset_index(drop=True), want)
        # flagged days really exceed the gate
        assert len(a) > 0  # non-vacuous on this corpus
        assert (
            a["n"] * W.SPIKE_TRAIL_D * W.SPIKE_DEN > W.SPIKE_NUM * a["prev_n"]
        ).all()


@pytest.mark.usefixtures("ray_session")
class TestEventTransitions:
    def test_matches_sql_twin_and_mass(self, sf_dir):
        import duckdb

        from gotenberg_ray.pipelines import windows as W

        a = W.event_transitions(sf_dir)
        con = duckdb.connect()
        con.sql(f"CREATE VIEW events AS FROM '{sf_dir}/events.parquet'")
        want = con.sql(W.TRANSITIONS_SQL).df()
        want["n"] = want["n"].astype("int64")
        pd.testing.assert_frame_equal(a.reset_index(drop=True), want)
        # transition mass = events minus one per active user
        tot = con.sql(
            "SELECT count(*)::BIGINT - count(DISTINCT user_id)::BIGINT c"
            " FROM events"
        ).df()["c"][0]
        assert int(a["n"].sum()) == int(tot)


@pytest.mark.usefixtures("ray_session")
class TestKnnIvfPq:
    def test_recall_vs_exact_and_deterministic(self, sf_dir):
        from gotenberg_ray.pipelines import embedops as E

        exact = set(E.knn_topk(sf_dir, k=10)["vec_id"])
        a = E.knn_ivfpq(sf_dir, k=10)
        b = E.knn_ivfpq(sf_dir, k=10)
        pd.testing.assert_frame_equal(a, b)
        assert list(a.columns) == ["rank", "vec_id"]
        assert a["vec_id"].is_unique
        # bounded above by IVF's probe recall (nprobe=4/16 lists);
        # residual-ADC + exact refine shouldn't lose more within lists
        assert len(set(a["vec_id"]) & exact) >= 5

    def test_probe_subset_of_ivf(self, sf_dir):
        """Every IVF-PQ hit must come from a probed list — i.e. be a
        member of the same candidate universe knn_ivf scans — so the
        two paths can only differ by in-list ranking."""
        from gotenberg_ray.pipelines import embedops as E

        ivf = E.knn_ivf(sf_dir, k=50)
        ivfpq = E.knn_ivfpq(sf_dir, k=10)
        assert set(ivfpq["vec_id"]) <= set(ivf["vec_id"])


@pytest.mark.usefixtures("ray_session")
class TestKnnMulti:
    def test_matches_sql_twin(self, sf_dir):
        import duckdb

        from gotenberg_ray.pipelines import embedops as E

        got = E.knn_multi(sf_dir)
        con = duckdb.connect()
        con.sql(f"CREATE VIEW embeddings AS FROM '{sf_dir}/embeddings.parquet'")
        want = con.sql(E.KNN_MULTI_SQL).df()
        for c in want.columns:
            want[c] = want[c].astype("int64")
        pd.testing.assert_frame_equal(got, want)

    def test_per_query_agrees_with_single(self, sf_dir):
        """Query 0's multi-query ranking must equal knn_topk modulo the
        candidate universe (multi excludes ALL query ids, single only
        its own) — so compare after dropping the other query ids."""
        from gotenberg_ray.pipelines import embedops as E

        single = E.knn_topk(sf_dir, k=10)
        multi = E.knn_multi(sf_dir, k=10 + len(E.MULTI_QUERY_IDS))
        m0 = multi.loc[multi["query_id"] == 0, "vec_id"]
        m0 = m0[~m0.isin(E.MULTI_QUERY_IDS)].head(10).tolist()
        assert m0 == single["vec_id"].tolist()

    def test_deterministic(self, sf_dir):
        from gotenberg_ray.pipelines import embedops as E

        pd.testing.assert_frame_equal(E.knn_multi(sf_dir), E.knn_multi(sf_dir))
