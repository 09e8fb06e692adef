"""Segment kernels over sorted key arrays — the shared vectorized core
of the bucketed window operators (rank-per-key, sessionize,
prefix-sum closes): given a bucket sorted by its key column, segment
boundaries and within-segment positions come from ONE numpy pass, so
per-key work never touches Python."""

from __future__ import annotations

import numpy as np


def segment_starts(keys: np.ndarray) -> np.ndarray:
    """Indices where a new key segment begins (keys must be sorted)."""
    if len(keys) == 0:
        return np.array([], dtype=np.int64)
    return np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])


def segment_ranks(keys: np.ndarray) -> np.ndarray:
    """1-based rank within each segment of a sorted key array —
    ROW_NUMBER() OVER (PARTITION BY key) for the bucket's presorted
    order, no per-group loop."""
    n = len(keys)
    if n == 0:
        return np.array([], dtype=np.int64)
    new_seg = np.r_[True, keys[1:] != keys[:-1]]
    seg_start = np.maximum.accumulate(np.where(new_seg, np.arange(n), 0))
    return (np.arange(n) - seg_start + 1).astype(np.int64)


#: float64 weighted ``np.bincount`` is exact only while every partial
#: sum stays under 2**53; past that it silently drops low-order bits.
_F64_EXACT = float(1 << 53)


def bincount_i64(
    idx: np.ndarray, weights: np.ndarray, minlength: int = 0
) -> np.ndarray:
    """Grouped int64 sum: exact ``np.bincount(idx, weights)`` for
    integer-valued weights.

    Fast path: the float64 bincount, taken only when
    ``Σ|w| < 2**53`` proves every intermediate partial sum (and hence
    the result) is exactly representable. Otherwise fall back to
    ``np.add.at`` on an int64 accumulator — slower, but wrap-free
    modulo 2**64 and exact for any per-group sum that fits int64. The
    engine's "exact integer partials" contract (holistic/rollup/window
    money folds) rides this guard rather than an unasserted
    assumption about batch sizes (round-4 review finding)."""
    w = np.asarray(weights)
    if not np.issubdtype(w.dtype, np.integer):
        w64 = w.astype(np.int64)
    else:
        w64 = w
    # Σ|w| in float64 is monotone nondecreasing, so comparing against
    # 2**53 is safe even if the true total exceeds it.
    if np.abs(w64).astype(np.float64).sum() < _F64_EXACT:
        return np.bincount(idx, weights=w64.astype(np.float64), minlength=minlength).astype(
            np.int64
        )
    out = np.zeros(max(minlength, int(idx.max()) + 1 if len(idx) else 0), dtype=np.int64)
    np.add.at(out, idx, w64)
    return out
