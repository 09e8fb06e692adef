"""Count-Min sketch — the fixed-size frequency summary that completes
the engine's mergeable-sketch family (HLL distinct counts in
``state/hll.py``-style queries, Misra–Gries heavy hitters in
``state/heavy.py``, the bottom-k quantile sketch in analytics).

Cormode & Muthukrishnan 2005 (public): a d×w counter matrix; each key
hashes to one column per row and increments d counters; the estimate
is the MIN of its d counters. Guarantees (classic form):

    true ≤ est ≤ true + ε·N   with prob ≥ 1 − δ,
    ε = e / w,  δ = e^(−d)

— one-sided (never underestimates), and the matrix is MERGEABLE by
element-wise addition, so per-block partials fold associatively into
a global sketch with zero key-cardinality-sized movement: workers
each emit one d×w int64 matrix regardless of data size.

Hashing: row i uses the shared splitmix64 mix over (key_hash ⊕
seed_i) — deterministic across processes and layouts, so the folded
sketch is bit-identical however blocks were split (the same layout
invariance the other sketches pin in tests).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import fnv64, hash_family, splitmix64


def _key_domain(keys) -> np.ndarray:
    """Keys → uint64 hash domain (ints splitmix-mixed, strings fnv64)
    — the ONE mixer from functions/hashing.py, so the sketch never
    diverges from the engine's other hash consumers. Null ints fill
    to 0 first (a null otherwise degrades the numpy view to float64
    and reroutes the whole batch through the string branch)."""
    if isinstance(keys, (pa.Array, pa.ChunkedArray)):
        if pa.types.is_integer(keys.type):
            if keys.null_count:
                keys = pc.fill_null(keys, 0)
            keys = keys.to_numpy(zero_copy_only=False)
        else:
            return fnv64(keys)
    keys = np.asarray(keys)
    if keys.dtype.kind in "iu":
        return splitmix64(keys.astype(np.uint64))
    return fnv64(pa.array([str(k) for k in keys]))


class CountMin:
    """d×w counter matrix with vectorized update/merge/query."""

    def __init__(self, width: int = 1 << 12, depth: int = 4):
        self.width = int(width)
        self.depth = int(depth)
        self.table = np.zeros((self.depth, self.width), np.int64)
        self.n = 0  # total weight folded in (for the error bound)

    def _cols(self, dom: np.ndarray) -> np.ndarray:
        """(depth, n) column indices: the shared seeded hash family
        (h_i(x) = splitmix64(x ^ splitmix64(i+1)), hashing.py)."""
        return (
            hash_family(dom, self.depth).T % np.uint64(self.width)
        ).astype(np.int64)

    def update(self, keys, counts=None) -> "CountMin":
        dom = _key_domain(keys)
        if len(dom) == 0:
            return self
        w = (
            np.ones(len(dom), np.int64)
            if counts is None
            else np.asarray(counts, np.int64)
        )
        cols = self._cols(dom)
        for i in range(self.depth):
            np.add.at(self.table[i], cols[i], w)
        self.n += int(w.sum())
        return self

    def merge(self, other: "CountMin") -> "CountMin":
        if (other.width, other.depth) != (self.width, self.depth):
            raise ValueError("CountMin shapes must match to merge")
        self.table += other.table
        self.n += other.n
        return self

    def query(self, keys) -> np.ndarray:
        dom = _key_domain(keys)
        if len(dom) == 0:
            return np.array([], np.int64)
        cols = self._cols(dom)
        ests = np.stack(
            [self.table[i][cols[i]] for i in range(self.depth)]
        )
        return ests.min(axis=0)

    def error_bound(self) -> float:
        """ε·N additive bound (ε = e/width)."""
        return float(np.e / self.width * self.n)

    def to_bytes(self) -> bytes:
        head = np.array([self.width, self.depth, self.n], np.int64)
        return head.tobytes() + self.table.tobytes()

    @classmethod
    def from_bytes(cls, raw: bytes) -> "CountMin":
        head = np.frombuffer(raw[:24], np.int64)
        sk = cls(width=int(head[0]), depth=int(head[1]))
        sk.n = int(head[2])
        sk.table = (
            np.frombuffer(raw[24:], np.int64)
            .reshape(sk.depth, sk.width)
            .copy()
        )
        return sk
