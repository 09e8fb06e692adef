"""Inverted-index retrieval and bucketed-layout aggregation: pruning
evidence, idempotent rebuild, and SQL parity at sf0.001."""

import os

import duckdb
import pandas as pd
import pytest

from gotenberg_ray.pipelines import layout as LY
from gotenberg_ray.pipelines import search as SE


@pytest.mark.usefixtures("ray_session")
class TestSearch:
    def test_matches_sql_twin_and_prunes(self, sf_dir):
        a = SE.search_topk(sf_dir)
        b = SE.search_topk(sf_dir)  # idempotent: index reused
        pd.testing.assert_frame_equal(a, b)
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS FROM '{sf_dir}/documents.parquet'")
        want = con.sql(SE.SEARCH_SQL).df()
        for c in want.columns:
            want[c] = want[c].astype("int64")
        pd.testing.assert_frame_equal(a.reset_index(drop=True), want)
        # the lookup opens only the query terms' buckets
        assert len(SE._query_buckets(SE.QUERY_TERMS)) < SE.INDEX_P
        # the index is partitioned on disk
        path = SE._index_path(sf_dir)
        assert len([d for d in os.listdir(path) if d.startswith("bucket-")]) > 1
        assert (a["n_terms"] <= len(SE.QUERY_TERMS)).all()


@pytest.mark.usefixtures("ray_session")
class TestBucketedTotals:
    def test_matches_sql_twin(self, sf_dir):
        a = LY.bucketed_customer_totals(sf_dir)
        b = LY.bucketed_customer_totals(sf_dir)  # layout reused
        pd.testing.assert_frame_equal(a, b)
        con = duckdb.connect()
        con.sql(f"CREATE VIEW orders AS FROM '{sf_dir}/orders.parquet'")
        want = con.sql(LY.BUCKETED_SQL).df()
        for c in want.columns:
            want[c] = want[c].astype("int64")
        pd.testing.assert_frame_equal(a.reset_index(drop=True), want)
