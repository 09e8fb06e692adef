"""Sequence packing (distributed order-preserving prefix sum) vs the
DuckDB window oracle, plus partitioning-independence."""

import duckdb
import pandas as pd
import pytest

from gotenberg_ray.pipelines import packing as P


@pytest.mark.usefixtures("ray_session")
def test_matches_window_oracle(sf_dir):
    got = P.pack_sequences(sf_dir)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS FROM '{sf_dir}/documents.parquet'")
    want = con.sql(P.PACK_SQL).df()
    for c in want.columns:
        want[c] = want[c].astype("int64")
        got[c] = got[c].astype("int64")
    pd.testing.assert_frame_equal(
        got.reindex(sorted(got.columns), axis=1),
        want.reindex(sorted(want.columns), axis=1),
    )


@pytest.mark.usefixtures("ray_session")
def test_bucket_count_invariant(sf_dir):
    """The prefix sum must not depend on the range partitioning — the
    100 TB correctness property (more buckets on a bigger cluster,
    same offsets)."""
    a = P.pack_sequences(sf_dir, num_buckets=3)
    b = P.pack_sequences(sf_dir, num_buckets=32)
    pd.testing.assert_frame_equal(a, b)


@pytest.mark.usefixtures("ray_session")
def test_offsets_are_contiguous(sf_dir):
    got = P.pack_sequences(sf_dir).sort_values("doc_id").reset_index(drop=True)
    # each doc starts exactly where the previous one ended
    expect = (got["n_tokens"].cumsum() - got["n_tokens"]).astype("int64")
    assert (got["start_offset"] == expect).all()
    assert (got["pack_id"] == got["start_offset"] // 512).all()


@pytest.mark.usefixtures("ray_session")
def test_chunking_matches_oracle_and_covers(sf_dir):
    got = P.chunk_documents(sf_dir)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS FROM '{sf_dir}/documents.parquet'")
    want = con.sql(P.CHUNK_SQL).df()
    for c in want.columns:
        want[c] = want[c].astype("int64")
    pd.testing.assert_frame_equal(got, want)
    # windows tile each doc: consecutive starts advance by the stride,
    # every chunk is non-empty except possibly for empty docs
    per = got.groupby("doc_id")
    assert (per["chunk_id"].max() + 1 == per.size()).all()
    multi = got[got["doc_id"].isin(per.size()[per.size() > 1].index)]
    assert (multi["n_tok"] > 0).all()


@pytest.mark.usefixtures("ray_session")
def test_shuffled_packing_matches_oracle_and_permutes(sf_dir):
    got = P.pack_shuffled(sf_dir)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS FROM '{sf_dir}/documents.parquet'")
    want = con.sql(P.PACK_SHUFFLED_SQL).df()
    for c in want.columns:
        want[c] = want[c].astype("int64")
    pd.testing.assert_frame_equal(
        got.reindex(sorted(got.columns), axis=1),
        want.reindex(sorted(want.columns), axis=1),
    )
    # the shuffle genuinely permutes: stream order != id order, but
    # still covers every token exactly once
    by_pos = got.sort_values("shuffle_pos")
    assert list(by_pos["doc_id"]) != list(sorted(by_pos["doc_id"]))
    expect = (by_pos["n_tokens"].cumsum() - by_pos["n_tokens"]).astype("int64")
    assert (by_pos["start_offset"].to_numpy() == expect.to_numpy()).all()
