"""Pins for the weak-supervision LF diagnostics."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from gotenberg_ray.pipelines.weaklabel import LFS, lf_diagnostics


@pytest.mark.usefixtures("ray_session")
def test_planted_vote_grid(tmp_path):
    """Hand-computed coverage/overlap/conflict on a fixture where every
    combination (abstain-only, lone vote, agreeing pair, conflicting
    pair) is planted."""
    docs = [
        # doc 0: long (+len), diverse (+ttr), 2x' the ' (+the) — overlap, no conflict
        (0, "alpha " + " ".join(f"w{i}" for i in range(60)) + " the x the y " + "z" * 200),
        # doc 1: short (-len) AND diverse (+ttr) — conflict both ways
        (1, "a b c d"),
        # doc 2: mid-length, repetitive (-ttr): lone-ish vote
        (2, ("dup " * 60).strip()),
        # doc 3: abstain everywhere (mid length, mid ttr, no digits)
        (3, " ".join(f"t{i}" for i in range(20)) + " " + "t0 " * 40),
    ]
    d = tmp_path / "wl"
    d.mkdir()
    pq.write_table(
        pa.table({"doc_id": pa.array([r[0] for r in docs], pa.int64()),
                  "text": pa.array([r[1] for r in docs], pa.string())}),
        d / "documents.parquet",
    )
    out = lf_diagnostics(str(d)).set_index("lf")
    assert list(out.index) == list(LFS)
    # doc1: lf_len=-1 and lf_ttr=+1 conflict
    assert out.loc["lf_len", "conflict_bp"] > 0
    assert out.loc["lf_ttr", "conflict_bp"] > 0
    # doc0 drives lf_the coverage and overlap (votes alongside len/ttr)
    assert out.loc["lf_the", "n_votes"] >= 1
    assert out.loc["lf_the", "overlap_bp"] > 0
    # conflicts never exceed overlaps; overlaps never exceed coverage
    assert (out["conflict_bp"] <= out["overlap_bp"]).all()
    assert (out["overlap_bp"] <= out["coverage_bp"]).all()


@pytest.mark.usefixtures("ray_session")
def test_matches_duckdb_twin(sf_dir):
    import duckdb

    from gotenberg_ray.pipelines.weaklabel import LF_DIAGNOSTICS_SQL

    got = lf_diagnostics(sf_dir).sort_values("lf").reset_index(drop=True)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS FROM '{sf_dir}/documents.parquet'")
    want = con.sql(LF_DIAGNOSTICS_SQL).df().sort_values("lf").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))
