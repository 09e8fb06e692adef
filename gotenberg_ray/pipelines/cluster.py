"""Distributed k-means over the embedding corpus (full Lloyd).

``knn_ivf`` trains its centroids on a bounded sample (good enough for
routing); this is the full-corpus iterative primitive: every Lloyd
round broadcasts the K×d centroid matrix (``ray.put`` once, read by
every task), every batch assigns its vectors to the nearest centroid
and emits a K-row partial (count + per-dim sum), and the driver folds
the ≤ blocks×K partials into the next centroids. Per round the data
moves ZERO bytes — only centroids (K×d ints) and partials
(blocks×K×(d+2) ints) cross the wire, which is the 100 TB posture for
small-K clustering: the corpus streams, the state is tiny.

Determinism: embeddings are quantized to ×2²⁰ int64 on read; distances
(‖x‖² − 2x·c + ‖c‖², all int64 — exact, no BLAS reduction-order
drift), partial sums (integer, order-independent under any block
layout), and centroid updates (floor division) are all integer, so
the result is bit-identical run to run. Ties in the argmin go to the
lowest cluster index. Init = the quantized vectors of the K smallest
vec_ids (read with a parquet filter, no scan); if the id space is
sparse and that yields fewer than K rows, the first K rows in storage
order are used instead.

Floor-mean caveat: the updated centroid is ⌊mean⌋ per dim, off the
exact mean by <1 quantum, so the classic SSE-monotone proof holds only
up to a per-round slack of O(n·d) quanta — asserted with that bound in
the tests rather than strict monotonicity.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from ..io import read_table

from .dimred import Q_BITS  # one fixed-point scale across operators
from .embedops import _batch_matrix

Q_SCALE = 1 << Q_BITS  # float → ×2²⁰ int64; d·(2·2²⁰)² ≪ 2⁶³ for d ≤ 2¹⁸


def _quantize(batch: pa.Table) -> np.ndarray:
    return np.rint(_batch_matrix(batch) * Q_SCALE).astype(np.int64)


def _assign(xq: np.ndarray, cents: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Nearest centroid per row, exact int64 arithmetic. Returns
    (cluster index, squared distance in quantized units)."""
    x2 = np.einsum("ij,ij->i", xq, xq)
    c2 = np.einsum("ij,ij->i", cents, cents)
    d2 = x2[:, None] - 2 * (xq @ cents.T) + c2[None, :]
    a = np.argmin(d2, axis=1)  # ties → lowest index
    return a, d2[np.arange(len(a)), a]


def _init_centroids(sf_dir: str, k: int) -> np.ndarray:
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", k)],
    ).sort_by("vec_id")
    if t.num_rows == 0:  # ids may not start at 0 — caller falls back
        return np.empty((0, 0), dtype=np.int64)
    return _quantize(t)


def kmeans_clusters(
    sf_dir: str, k: int = 8, iters: int = 8
) -> pd.DataFrame:
    """Full-corpus Lloyd k-means; returns one row per cluster:
    (cluster, n_vectors, sse_q — within-cluster squared error in
    ×2⁴⁰ quantized units). Rows-only check (iterative, not SQL)."""
    ds = read_table(sf_dir, "embeddings", columns=["embedding"]).materialize()
    if ds.count() == 0:
        return pd.DataFrame(
            {"cluster": pd.Series([], dtype="int64"),
             "n_vectors": pd.Series([], dtype="int64"),
             "sse_q": pd.Series([], dtype="int64")}
        )
    cents = _init_centroids(sf_dir, k)
    if len(cents) < k:
        # vec_ids need not be contiguous from 0 (a post-dedup store may
        # keep sparse ids): if the id-filtered init found fewer than k
        # rows, fall back to the first k rows in storage order
        cents = _quantize(ds.take_batch(k, batch_format="pyarrow"))
    k = len(cents)  # corpus smaller than k → fewer centroids
    dim = cents.shape[1]

    def stats_pass(cents: np.ndarray):
        """One streaming pass: per-batch assign + K-row integer
        partials, folded exactly on the driver."""
        cents_ref = ray.put(cents)

        def partial(batch: pa.Table, *, _ref=cents_ref, _k=k, _d=dim) -> pa.Table:
            c = ray.get(_ref)
            xq = _quantize(batch)
            a, d2 = _assign(xq, c)
            n = np.bincount(a, minlength=_k).astype(np.int64)
            sse = np.zeros(_k, dtype=np.int64)
            np.add.at(sse, a, d2)
            sums = np.zeros((_k, _d), dtype=np.int64)
            np.add.at(sums, a, xq)
            return pa.table(
                {
                    "cluster": pa.array(np.arange(_k, dtype=np.int64)),
                    "n": pa.array(n),
                    "sse": pa.array(sse),
                    "sums": pa.array(list(sums)),
                }
            )

        rows = (
            ds.map_batches(partial, batch_format="pyarrow")
            .take_all()
        )  # bounded: blocks × k rows of (d+3) ints — kilobytes
        n = np.zeros(k, dtype=np.int64)
        sse = np.zeros(k, dtype=np.int64)
        sums = np.zeros((k, dim), dtype=np.int64)
        for r in rows:
            ci = int(r["cluster"])
            n[ci] += r["n"]
            sse[ci] += r["sse"]
            sums[ci] += np.asarray(r["sums"], dtype=np.int64)
        return n, sse, sums

    n = sse = None
    for _ in range(iters):
        n, sse, sums = stats_pass(cents)
        nz = n > 0
        new = cents.copy()  # empty cluster keeps its centroid
        new[nz] = sums[nz] // n[nz, None]
        if np.array_equal(new, cents):  # fixed point: stats are final
            break
        cents = new
    else:
        # iters exhausted with a live update: stats must reflect the
        # FINAL centroids, so take one more assignment-only pass
        n, sse, _ = stats_pass(cents)

    return pd.DataFrame(
        {
            "cluster": np.arange(k, dtype=np.int64),
            "n_vectors": n,
            "sse_q": sse,
        }
    )
