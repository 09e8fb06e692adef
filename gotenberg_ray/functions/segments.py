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
