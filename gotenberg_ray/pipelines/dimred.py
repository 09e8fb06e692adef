"""Distributed PCA over the embedding store — the dimensionality-
reduction stage an embedding pipeline runs before clustering / ANN
(e.g. reduce 64-d to 2-d for IVF coarse quantizers or visualization).

Exactness contract (the repo's integer-moments pattern,
cf. ``analytics.corr_qty_price``): the covariance accumulates from
per-block INTEGER partial moments — each vector quantizes to
``round(v · 2²⁰)`` int64 once, then count / per-dim sums / d×d outer
sums are exact integer folds, so the Gram matrix (and therefore the
eigenbasis and every projection) is bit-identical under any block
layout or reduction order. Eigendecomposition runs on the driver over
the d×d matrix (model-sized); eigenvector sign fixes to
"largest-|entry| positive" so the basis is unique.

Scale shape: pass 1 moves one (1 + d + d²) int64 row per block; pass
2 broadcasts the d×k component matrix via ``ray.put`` and projects
per batch with one matmul. Nothing row-sized reaches the driver. (At
10¹⁰ rows the int64 outer sums would carry-split into two limbs —
the ``corr_qty_price`` machinery — noted, not needed at demo scale.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from ..functions.frames import ensure_columns

Q_BITS = 20  # fixed-point quantization for exact integer moments
N_COMPONENTS = 2
PROJ_SCALE = 1_000_000


# ONE embedding reader + matrix decoder for the whole engine — a
# future decode fix (fixed-size lists, empty blocks) lands everywhere
from .embedops import _batch_matrix, _emb  # noqa: E402


def _moment_partials(batch: pa.Table) -> pa.Table:
    m = _batch_matrix(batch)
    q = np.round(m * (1 << Q_BITS)).astype(np.int64)
    d = q.shape[1]
    return pa.table(
        {
            "n": pa.array([len(q)], pa.int64()),
            "s": pa.array([q.sum(axis=0, dtype=np.int64)]),
            "ss": pa.array([(q.T @ q).reshape(d * d)]),
        }
    )


def _fit_components(sf_dir: str) -> np.ndarray | None:
    """Exact integer moment fold → covariance → top-k eigenbasis."""
    parts = (
        _emb(sf_dir)
        .map_batches(_moment_partials, batch_format="pyarrow")
        .to_pandas()
    )
    if parts.empty or int(parts["n"].sum()) < 2:
        return None
    n = int(parts["n"].sum())
    s = np.sum(np.stack(parts["s"].to_numpy()), axis=0, dtype=np.int64)
    ss = np.sum(np.stack(parts["ss"].to_numpy()), axis=0, dtype=np.int64)
    d = len(s)
    scale = float(1 << Q_BITS)
    # cov = (ss - s sᵀ/n) / (n-1), rescaled back to value units
    cov = (ss.reshape(d, d).astype(np.float64) - np.outer(s, s) / n) / (
        (n - 1) * scale * scale
    )
    w, v = np.linalg.eigh(cov)
    comp = v[:, np.argsort(w)[::-1][:N_COMPONENTS]]
    # unique sign: largest-|entry| coordinate positive per component
    for j in range(comp.shape[1]):
        i = int(np.argmax(np.abs(comp[:, j])))
        if comp[i, j] < 0:
            comp[:, j] = -comp[:, j]
    return comp


def embedding_pca(sf_dir: str) -> pd.DataFrame:
    """Project every vector onto the top-2 principal components;
    coordinates ship as ×10⁶ integers (deterministic row-local
    rounding — no cross-row float folds anywhere)."""
    comp = _fit_components(sf_dir)
    if comp is None:
        return pd.DataFrame(
            {
                "vec_id": pd.Series([], dtype="int64"),
                "pc1_e6": pd.Series([], dtype="int64"),
                "pc2_e6": pd.Series([], dtype="int64"),
            }
        )
    comp_ref = ray.put(comp)

    class Projector:
        def __init__(self):
            self.comp = ray.get(comp_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _batch_matrix(batch)
            proj = np.round((m @ self.comp) * PROJ_SCALE).astype(np.int64)
            return pa.table(
                {
                    "vec_id": batch["vec_id"],
                    "pc1_e6": pa.array(proj[:, 0]),
                    "pc2_e6": pa.array(proj[:, 1]),
                }
            )

    from .embedops import _task_stage

    df = (
        _emb(sf_dir)
        .map_batches(_task_stage(Projector), batch_format="pyarrow")
        .to_pandas()
    )
    df = ensure_columns(
        df, {"vec_id": "int64", "pc1_e6": "int64", "pc2_e6": "int64"}
    )
    return df.sort_values("vec_id").reset_index(drop=True)
