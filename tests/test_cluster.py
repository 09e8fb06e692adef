"""Full-corpus Lloyd k-means: determinism, size conservation, SSE
descent (up to the floor-centroid slack), and blob separation."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from gotenberg_ray.pipelines import cluster as C


@pytest.mark.usefixtures("ray_session")
class TestKMeans:
    def test_deterministic_and_conserving(self, sf_dir):
        a = C.kmeans_clusters(sf_dir, k=8, iters=4)
        b = C.kmeans_clusters(sf_dir, k=8, iters=4)
        pd.testing.assert_frame_equal(a, b)
        n_rows = pq.read_metadata(f"{sf_dir}/embeddings.parquet").num_rows
        assert a["n_vectors"].sum() == n_rows
        assert (a["sse_q"] >= 0).all()

    def test_sse_descends(self, sf_dir):
        """More Lloyd rounds never raise total SSE beyond the
        floor-centroid slack (<1 quantum per dim per point)."""
        import pyarrow.parquet as _pq

        n = _pq.read_metadata(f"{sf_dir}/embeddings.parquet").num_rows
        dim = 64
        slack = 4 * n * dim * (2 * C.Q_SCALE + 1)  # per-round drift bound
        prev = None
        for it in (1, 2, 4, 8):
            sse = C.kmeans_clusters(sf_dir, k=8, iters=it)["sse_q"].sum()
            if prev is not None:
                assert sse <= prev + slack
            prev = sse

    def test_two_blobs_separate(self, ray_session, tmp_path):
        rng = np.random.default_rng(3)
        a = rng.normal(+1.0, 0.05, size=(40, 8))
        b = rng.normal(-1.0, 0.05, size=(40, 8))
        # vec_ids 0 and 1 (the init centroids) land in different blobs
        vecs = np.empty((80, 8))
        vecs[0::2] = a
        vecs[1::2] = b
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(range(80), pa.int64()),
                    "embedding": pa.array(
                        [list(map(float, v)) for v in vecs],
                        pa.list_(pa.float32()),
                    ),
                    "label": pa.array([0] * 80, pa.int32()),
                }
            ),
            f"{tmp_path}/embeddings.parquet",
        )
        got = C.kmeans_clusters(str(tmp_path), k=2, iters=6)
        assert sorted(got["n_vectors"]) == [40, 40]

    def test_empty_store(self, ray_session, tmp_path):
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "embedding": pa.array([], pa.list_(pa.float32())),
                    "label": pa.array([], pa.int32()),
                }
            ),
            f"{tmp_path}/embeddings.parquet",
        )
        got = C.kmeans_clusters(str(tmp_path), k=4)
        assert len(got) == 0
        assert list(got.columns) == ["cluster", "n_vectors", "sse_q"]


def test_noncontiguous_vec_ids(ray_session, tmp_path):
    """vec_ids need not start at 0 — init falls back to the first
    rows when no vec_id < k exists."""
    import numpy as np

    rng = np.random.default_rng(5)
    vecs = rng.normal(size=(30, 8))
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(1000, 1030), pa.int64()),
                "embedding": pa.array(
                    [list(map(float, v)) for v in vecs], pa.list_(pa.float32())
                ),
                "label": pa.array([0] * 30, pa.int32()),
            }
        ),
        f"{tmp_path}/embeddings.parquet",
    )
    got = C.kmeans_clusters(str(tmp_path), k=4, iters=3)
    assert got["n_vectors"].sum() == 30
    assert len(got) == 4


def test_sparse_low_ids_still_get_k_centroids(ray_session, tmp_path):
    """Only ONE vec_id is < k: init must still produce k centroids
    (fall back to first rows), not silently collapse to one cluster."""
    import numpy as np

    rng = np.random.default_rng(6)
    vecs = rng.normal(size=(30, 8))
    ids = [0] + list(range(500, 529))  # one low id, rest sparse
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(
                    [list(map(float, v)) for v in vecs], pa.list_(pa.float32())
                ),
                "label": pa.array([0] * 30, pa.int32()),
            }
        ),
        f"{tmp_path}/embeddings.parquet",
    )
    got = C.kmeans_clusters(str(tmp_path), k=4, iters=3)
    assert len(got) == 4
    assert got["n_vectors"].sum() == 30
