"""HyperLogLog — the fixed-size DISTINCT-COUNT summary that completes
the mergeable-sketch family (Count-Min frequencies in ``state/cms.py``,
Misra–Gries heavy hitters in ``state/heavy.py``, bottom-k quantiles in
analytics).

Flajolet, Fusy, Gandouet & Meunier 2007 (public), with the standard
small-range linear-counting correction: m = 2^p single-byte registers;
each key hashes to one register (top p bits) and the register keeps
the MAX over keys of 1 + leading-zero-count of the remaining 64−p
bits. The estimate is

    E = α_m · m² / Σ_j 2^(−reg_j),      α_16384 ≈ 0.7213/(1+1.079/m)

with E ≤ 2.5m and empty registers present → m·ln(m/V) instead
(linear counting — near-exact when n ≪ m). Relative standard error
≈ 1.04/√m (0.81% at the default p = 14), independent of cardinality.

The register array is MERGEABLE by element-wise max — commutative,
associative and IDEMPOTENT (re-merging the same block is a no-op,
which the resumable sinks rely on): per-block partials fold into a
global sketch with m bytes of movement per block regardless of data
size, the groupby-combine posture every 100 TB distinct-count needs
(an exact distinct is an all-to-all on the full key set).

Hashing: the shared splitmix64/fnv64 domain from
``functions/hashing.py`` via ``cms._key_domain`` — deterministic
across processes and block layouts, so the folded sketch is
bit-identical however the corpus was split (layout invariance, pinned
in tests like the other sketches).

Reference parity: the reference engine has no sketches; this serves
the "how many distinct URLs / hosts / users did the crawl touch"
accounting that an exact count would turn into a full-corpus shuffle.
"""

from __future__ import annotations

import numpy as np

from ..functions.hashing import splitmix64
from .cms import _key_domain

_MAGIC = b"HLL1"


class HyperLogLog:
    """2^p byte registers with vectorized update / merge / estimate."""

    def __init__(self, p: int = 14):
        if not 4 <= p <= 18:
            raise ValueError(f"p must be in [4, 18], got {p}")
        self.p = int(p)
        self.m = 1 << self.p
        self.registers = np.zeros(self.m, np.uint8)

    # ---------------------------------------------------------- update

    def update(self, keys) -> "HyperLogLog":
        """Fold keys (Arrow array / numpy / sequence; ints or strings)
        into the registers. One hash pass, one scatter-max."""
        h = _key_domain(keys)
        if not len(h):
            return self
        # post-mix: HLL reads the TOP p bits as the register index, and
        # fnv64's high bits disperse poorly over short similar strings
        # (measured: 400 distinct "host-i" keys collapsed to ~40
        # occupied registers); one splitmix64 finalizer fixes the
        # avalanche for every key domain
        return self.update_hashes(splitmix64(h))

    def update_hashes(self, h: np.ndarray) -> "HyperLogLog":
        """Fold PRE-HASHED uint64 values (already avalanche-mixed) —
        the entry point for callers that own their hash domain (e.g.
        ``analytics._hll_add``)."""
        if not len(h):
            return self
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        # remaining 64−p bits, left-aligned in a 64-bit word: rho =
        # leading zeros + 1, computed as (64 − bit_length) + 1 over the
        # shifted word; the +1 sentinel bit keeps w > 0 exact (a fully
        # zero tail must yield rho = 64 − p + 1)
        w = (h << np.uint64(self.p)) | np.uint64(1 << (self.p - 1))
        # bit_length via float log2 is unsafe above 2^53; use the
        # exact integer route: 64 − bit_length(w) == clz(w)
        clz = np.zeros(len(h), np.uint8)
        v = w.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            mask = v < (np.uint64(1) << np.uint64(64 - shift))
            clz[mask] += np.uint8(shift)
            v[mask] <<= np.uint64(shift)
        rho = clz + np.uint8(1)
        np.maximum.at(self.registers, idx, rho)
        return self

    # ----------------------------------------------------------- merge

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        if other.p != self.p:
            raise ValueError(f"precision mismatch: {self.p} vs {other.p}")
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    # -------------------------------------------------------- estimate

    def estimate(self) -> int:
        m = float(self.m)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        est = alpha * m * m / np.sum(np.exp2(-self.registers.astype(np.float64)))
        if est <= 2.5 * m:
            zeros = int(np.count_nonzero(self.registers == 0))
            if zeros:
                est = m * np.log(m / zeros)
        return int(round(est))

    # ---------------------------------------------------- serialization

    def to_bytes(self) -> bytes:
        return _MAGIC + bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def from_bytes(cls, raw: bytes) -> "HyperLogLog":
        if raw[:4] != _MAGIC:
            raise ValueError("not an HLL blob")
        sk = cls(p=raw[4])
        sk.registers = np.frombuffer(raw[5:], np.uint8).copy()
        if len(sk.registers) != sk.m:
            raise ValueError("truncated HLL blob")
        return sk
