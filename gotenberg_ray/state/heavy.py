"""Mergeable Misra–Gries heavy-hitters summary.

The mergeable-summaries form (Agarwal et al., "Mergeable Summaries",
PODS 2012): a summary of capacity k holds at most k (key, count)
entries; combining two summaries = sum counts by key, then if more
than k entries survive, subtract the (k+1)-th largest count from every
entry and drop the non-positive ones. Each compression adds that
subtracted value to a cumulative error bound, and the invariant

    est ≤ true ≤ est + err        (err ≤ N / (k+1) overall)

holds for every key (absent keys have est = 0). Both the per-batch
partial and the driver-side merge are the SAME operation, so the
sketch composes with any block layout — the property the distributed
shape needs: workers emit ≤ k rows per block, the driver folds
block partials pairwise, and nothing key-cardinality-sized moves.

When the true number of distinct keys never exceeds k, no compression
ever fires, err stays 0, and every count is exact — which is what lets
`heavy_hitter_users` pair with an exact SQL oracle at test scale while
the same code degrades gracefully (bounded error) at 100 TB.

Reference parity: the reference engine has no sketches; this serves
the hot-key detection the crawl/join layers need at scale (SURVEY
§4.2 — skew salting) and the training-pipeline "top tokens / top
hosts" analyses.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


class MisraGries:
    """Capacity-bounded (key → lower-bound count) summary.

    Keys are kept in their native dtype (int64 or str) in parallel
    numpy arrays; all folds are vectorized pandas/numpy groupbys —
    no per-key Python in any hot path.
    """

    def __init__(self, capacity: int):
        if capacity < 1:
            raise ValueError("capacity must be >= 1")
        self.capacity = int(capacity)
        self.keys: np.ndarray = np.empty(0, dtype=object)
        self.counts: np.ndarray = np.empty(0, dtype=np.int64)
        self.err: int = 0  # max undercount of any stored/dropped key
        self.n: int = 0  # total weight observed

    # -- core fold ----------------------------------------------------

    def _compress(self, keys: np.ndarray, counts: np.ndarray) -> None:
        k = self.capacity
        if len(keys) > k:
            # (k+1)-th largest count; subtracting it keeps <= k entries
            t = int(np.partition(counts, -(k + 1))[-(k + 1)])
            counts = counts - t
            keep = counts > 0
            keys, counts = keys[keep], counts[keep]
            self.err += t
        self.keys, self.counts = keys, counts.astype(np.int64)

    def update(self, keys, counts=None) -> "MisraGries":
        """Fold a batch of observations (optionally pre-weighted)."""
        keys = np.asarray(keys)
        if counts is None:
            counts = np.ones(len(keys), dtype=np.int64)
        counts = np.asarray(counts, dtype=np.int64)
        self.n += int(counts.sum())
        if len(self.keys):
            if self.keys.dtype == keys.dtype:
                all_keys = np.concatenate([self.keys, keys])
            else:
                # never cast stored keys to a narrower fixed-width
                # string dtype (it would silently truncate them)
                all_keys = np.concatenate(
                    [self.keys.astype(object), keys.astype(object)]
                )
        else:
            all_keys = keys
        s = pd.Series(
            np.concatenate([self.counts, counts]), index=all_keys
        ).groupby(level=0, sort=False).sum()
        self._compress(s.index.to_numpy(), s.to_numpy(dtype=np.int64))
        return self

    def merge(self, other: "MisraGries") -> "MisraGries":
        if other.capacity != self.capacity:
            raise ValueError("capacity mismatch")
        self.err += other.err
        self.n += other.n
        if len(other.keys):
            s = pd.Series(
                np.concatenate([self.counts, other.counts]),
                index=np.concatenate([self.keys, other.keys])
                if len(self.keys)
                else other.keys,
            ).groupby(level=0, sort=False).sum()
            self._compress(s.index.to_numpy(), s.to_numpy(dtype=np.int64))
        return self

    # -- (de)serialization for worker→driver partials -----------------

    def to_partial_row(self, key_type: pa.DataType) -> pa.Table:
        """ONE row: the whole summary as list columns — a block partial
        that survives arbitrary downstream block re-batching (row
        boundaries, unlike block boundaries, are never split)."""
        return pa.table(
            {
                "keys": pa.array([list(self.keys)], pa.list_(key_type)),
                "cnts": pa.array([self.counts.tolist()], pa.list_(pa.int64())),
                "err": pa.array([self.err], pa.int64()),
                "n": pa.array([self.n], pa.int64()),
            }
        )

    @classmethod
    def from_partial_rows(cls, parts: pd.DataFrame, capacity: int) -> "MisraGries":
        """Fold partial rows (as produced by ``to_partial_row``) into
        one summary: concat entry arrays, sum counts by key, compress
        once; err/n add across partials."""
        mg = cls(capacity)
        if parts.empty:
            return mg
        mg.err = int(parts["err"].sum())
        mg.n = int(parts["n"].sum())
        keys = np.concatenate([np.asarray(x) for x in parts["keys"]])
        cnts = np.concatenate(
            [np.asarray(x, dtype=np.int64) for x in parts["cnts"]]
        )
        if len(keys) == 0:
            return mg
        s = pd.Series(cnts, index=keys).groupby(level=0, sort=False).sum()
        mg._compress(s.index.to_numpy(), s.to_numpy(dtype=np.int64))
        return mg

    def top(self, k: int) -> list[tuple[object, int]]:
        """Top-k entries by (count desc, key asc) — deterministic ties."""
        order = np.lexsort((self.keys, -self.counts))
        return [(self.keys[i], int(self.counts[i])) for i in order[:k]]
