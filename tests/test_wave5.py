"""Round-2 extension wave 5: expectation-suite validation, Z-order
layout + pruned scan, distributed PCA."""

import os
import shutil

import duckdb
import numpy as np
import pandas as pd
import pytest

from gotenberg_ray.pipelines import dimred as DR
from gotenberg_ray.pipelines import layout as LY
from gotenberg_ray.pipelines import validate as VA


def _con(sf_dir, *tables):
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


@pytest.mark.usefixtures("ray_session")
class TestExpectations:
    def test_matches_duckdb(self, sf_dir):
        got = VA.orders_expectations(sf_dir)
        con = _con(sf_dir, "orders", "customer")
        want = con.sql(VA.EXPECTATIONS_SQL).df()
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_has_passing_and_failing_checks(self, sf_dir):
        got = VA.orders_expectations(sf_dir).set_index("check_name")["violations"]
        assert got["totalprice_positive"] == 0  # passing check
        assert got["one_order_per_customer"] > 0  # failing check


class TestMortonKernel:
    def test_interleave_exact(self):
        x = np.array([0b1011, 0, 0b111], np.uint64)
        y = np.array([0b0101, 0b1, 0b000], np.uint64)

        def scalar_morton(a, b):
            out = 0
            for i in range(32):
                out |= ((a >> i) & 1) << (2 * i)
                out |= ((b >> i) & 1) << (2 * i + 1)
            return out

        got = LY.morton2(x, y)
        want = [scalar_morton(int(a), int(b)) for a, b in zip(x, y)]
        assert got.tolist() == want

    def test_locality_monotone_cells(self):
        """Points in the same grid quadrant share a cell id."""
        px = LY._normalize(np.array([10, 11]), 1000)
        py = LY._normalize(np.array([20, 21]), 1000)
        cells = LY._cell_of(px, py)
        assert cells[0] == cells[1]


@pytest.mark.usefixtures("ray_session")
class TestZorderScan:
    def test_matches_duckdb_and_prunes(self, sf_dir):
        shutil.rmtree("/tmp/gotenberg_zorder", ignore_errors=True)
        got = LY.zorder_scan(sf_dir)
        con = _con(sf_dir, "lineitem")
        want = con.sql(LY.ZORDER_SQL).df()
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        # the rectangle is a quarter of each dimension → it must map
        # to a strict subset of the 64 grid cells
        pmax, smax = LY._key_maxes(sf_dir)
        cells = LY.cells_for_rect(*LY._rect(pmax, smax), pmax, smax)
        assert len(cells) < LY.N_CELLS
        from gotenberg_ray.io import scratch_layout_path

        layout_dir = scratch_layout_path("zorder", sf_dir, "lineitem")
        written = [
            d for d in os.listdir(layout_dir) if d.startswith("bucket-")
        ]
        assert len(cells) < len(written), "scan did not prune"

    def test_layout_resumable(self, sf_dir):
        """Second write skips completed buckets (marker protocol)."""
        from gotenberg_ray.io import scratch_layout_path

        pmax, smax = LY._key_maxes(sf_dir)
        path = scratch_layout_path("zorder", sf_dir, "lineitem")
        LY.write_zordered(sf_dir, path, pmax, smax)  # ensure built
        stats = LY.write_zordered(sf_dir, path, pmax, smax)
        assert stats["written_buckets"] == 0
        assert stats["skipped_buckets"] > 0


@pytest.mark.usefixtures("ray_session")
class TestPca:
    def test_deterministic_and_shapes(self, sf_dir):
        a = DR.embedding_pca(sf_dir)
        b = DR.embedding_pca(sf_dir)
        assert a.equals(b)
        emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
        assert len(a) == len(emb)

    def test_variance_ordering_and_orthonormal_basis(self, sf_dir):
        proj = DR.embedding_pca(sf_dir)
        assert proj["pc1_e6"].var() >= proj["pc2_e6"].var()
        comp = DR._fit_components(sf_dir)
        assert np.allclose(comp.T @ comp, np.eye(DR.N_COMPONENTS), atol=1e-9)

    def test_matches_numpy_pca(self, sf_dir):
        """Driver-side numpy PCA on the quantized vectors reproduces
        the distributed projection exactly."""
        emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
        m = np.array(emb["embedding"].tolist(), dtype=np.float64)
        q = np.round(m * (1 << DR.Q_BITS)).astype(np.int64)
        n = len(q)
        s = q.sum(axis=0)
        cov = (q.T @ q - np.outer(s, s) / n) / ((n - 1) * float(1 << DR.Q_BITS) ** 2)
        w, v = np.linalg.eigh(cov)
        comp = v[:, np.argsort(w)[::-1][: DR.N_COMPONENTS]]
        for j in range(comp.shape[1]):
            i = int(np.argmax(np.abs(comp[:, j])))
            if comp[i, j] < 0:
                comp[:, j] = -comp[:, j]
        want = np.round((m @ comp) * DR.PROJ_SCALE).astype(np.int64)
        got = DR.embedding_pca(sf_dir).sort_values("vec_id")
        order = emb["vec_id"].argsort().to_numpy()
        assert (got["pc1_e6"].to_numpy() == want[order, 0]).all()
        assert (got["pc2_e6"].to_numpy() == want[order, 1]).all()
