"""Corpus-drift statistics: TV distance and vocab Jaccard between
sources — hand-computable fixtures plus the structural invariants
(symmetric pair grid, 0 ≤ tv_ppm ≤ 10⁶, 0 ≤ jaccard_bp ≤ 10⁴,
identical-source distance 0 / overlap 10⁴)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from gotenberg_ray.pipelines import drift as DF


def _write_docs(tmp_path, rows):
    """rows: list of (source, text)."""
    t = pa.table(
        {
            "doc_id": pa.array(list(range(1, len(rows) + 1)), pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array([r[0] for r in rows], pa.string()),
            "n_chars": pa.array([len(r[1] or "") for r in rows], pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    return str(tmp_path)


def test_tv_hand_computed(ray_session, tmp_path):
    # a: {x:2, y:2} N=4 → f(x)=f(y)=500000
    # b: {x:1, z:3} N=4 → f(x)=250000, f(z)=750000
    sf = _write_docs(tmp_path, [("a", "x y x y"), ("b", "x z z z")])
    df = DF.source_tv_distance(sf)
    assert list(df.columns) == ["source_a", "source_b", "tv_ppm"]
    assert len(df) == 1
    # Σ|f_a−f_b| = |500000−250000| + 500000 + 750000 = 1500000 → //2
    assert df.loc[0, "tv_ppm"] == 750_000


def test_tv_identical_sources_zero(ray_session, tmp_path):
    sf = _write_docs(tmp_path, [("a", "u v w u"), ("b", "u v w u")])
    df = DF.source_tv_distance(sf)
    assert df.loc[0, "tv_ppm"] == 0


def test_tv_disjoint_sources_full(ray_session, tmp_path):
    sf = _write_docs(tmp_path, [("a", "p q"), ("b", "r s t u")])
    df = DF.source_tv_distance(sf)
    # disjoint supports: Σ|·| = 10⁶ + (4 terms whose floors sum ≤ 10⁶)
    assert df.loc[0, "tv_ppm"] == 1_000_000


def test_tv_empty_documents(ray_session, tmp_path):
    sf = _write_docs(tmp_path, [])
    df = DF.source_tv_distance(sf)
    assert len(df) == 0
    assert list(df.columns) == ["source_a", "source_b", "tv_ppm"]


def test_jaccard_hand_computed(ray_session, tmp_path):
    sf = _write_docs(
        tmp_path, [("a", "x y z"), ("b", "y z w"), ("c", "q")]
    )
    df = DF.source_vocab_jaccard(sf).set_index(["source_a", "source_b"])
    ab = df.loc[("a", "b")]
    assert (ab["inter_sz"], ab["union_sz"], ab["jaccard_bp"]) == (2, 4, 5000)
    ac = df.loc[("a", "c")]
    assert (ac["inter_sz"], ac["union_sz"], ac["jaccard_bp"]) == (0, 4, 0)
    assert len(df) == 3  # full pair grid, zero-overlap pairs included


def test_jaccard_identical_sources(ray_session, tmp_path):
    sf = _write_docs(tmp_path, [("a", "m n"), ("b", "n m m")])
    df = DF.source_vocab_jaccard(sf)
    assert df.loc[0, "jaccard_bp"] == 10_000


def test_bounds_on_testdata(ray_session):
    sf = "/root/testdata/sf0.001"
    tv = DF.source_tv_distance(sf)
    assert ((tv["tv_ppm"] >= 0) & (tv["tv_ppm"] <= 1_000_000)).all()
    ja = DF.source_vocab_jaccard(sf)
    assert ((ja["jaccard_bp"] >= 0) & (ja["jaccard_bp"] <= 10_000)).all()
    assert (ja["union_sz"] >= ja["inter_sz"]).all()
    n_src = pd.unique(
        pd.concat([tv["source_a"], tv["source_b"]])
    ).shape[0]
    assert len(tv) == n_src * (n_src - 1) // 2 == len(ja)
