"""Incremental-ingestion dedup vs the DuckDB EXISTS oracle."""

import duckdb
import pandas as pd
import pytest

from gotenberg_ray.pipelines import incremental as I


@pytest.mark.usefixtures("ray_session")
def test_matches_oracle(sf_dir):
    got = I.dedup_incremental(sf_dir)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS FROM '{sf_dir}/documents.parquet'")
    want = con.sql(I.DEDUP_INCREMENTAL_SQL).df()
    for c in want.columns:
        want[c] = want[c].astype("int64")
    pd.testing.assert_frame_equal(got, want)


@pytest.mark.usefixtures("ray_session")
def test_replays_dropped_fresh_kept(sf_dir):
    got = I.dedup_incremental(sf_dir)
    n = 500  # documents table size at every sf for this corpus
    replays = got[got["doc_id"] >= n]
    fresh = got[got["doc_id"] < n]
    # every replayed copy is recognized as already-present
    assert (replays["kept"] == 0).all() and len(replays) == n // 4
    # every genuinely new doc is admitted (no bloom false drop)
    assert (fresh["kept"] == 1).all()


class TestIncrementalAggregate:
    def test_refresh_equals_full_recompute(self, ray_session, sf_dir):
        import duckdb

        from gotenberg_ray.pipelines.incremental import (
            EVENTS_DAILY_INCREMENTAL_SQL,
            events_daily_incremental,
        )

        got = events_daily_incremental(sf_dir)
        con = duckdb.connect()
        con.sql(f"CREATE VIEW events AS FROM '{sf_dir}/events.parquet'")
        want = con.sql(EVENTS_DAILY_INCREMENTAL_SQL).df()
        for c in ("n_events", "spend_cents"):
            want[c] = want[c].astype("int64")
        pd.testing.assert_frame_equal(got, want.reset_index(drop=True))

    def test_split_is_partition(self, ray_session, sf_dir):
        """history ∪ increment must cover every event exactly once:
        the merged counts sum to the full event count."""
        import pyarrow.parquet as pq

        from gotenberg_ray.pipelines.incremental import events_daily_incremental

        got = events_daily_incremental(sf_dir)
        total = pq.read_table(f"{sf_dir}/events.parquet", columns=["event_id"]).num_rows
        assert got["n_events"].sum() == total


@pytest.mark.usefixtures("ray_session")
class TestTableDiff:
    def test_matches_sql_twin_and_partition(self, sf_dir):
        import duckdb

        import pandas as pd

        from gotenberg_ray.pipelines import incremental as INC

        a = INC.orders_table_diff(sf_dir)
        con = duckdb.connect()
        con.sql(f"CREATE VIEW orders AS FROM '{sf_dir}/orders.parquet'")
        want = con.sql(INC.TABLE_DIFF_SQL).df()
        want["n_orders"] = want["n_orders"].astype("int64")
        pd.testing.assert_frame_equal(a.reset_index(drop=True), want)
        # classes partition the union of both versions' key sets
        n_union = con.sql(
            f"""SELECT count(DISTINCT o_orderkey)::BIGINT c FROM orders
                WHERE o_orderkey % {INC.DIFF_ADD_MOD} <> 0
                   OR o_orderkey % {INC.DIFF_DEL_MOD} <> 0"""
        ).df()["c"][0]
        assert int(a["n_orders"].sum()) == int(n_union)
        assert set(a["change_type"]) <= {"added", "deleted", "updated", "unchanged"}
