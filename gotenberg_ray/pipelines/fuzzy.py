"""Blocked fuzzy join — approximate string matching (entity
resolution) with an exact edit-distance kernel.

The classic record-linkage shape: probes and candidates are BLOCKED
on a cheap deterministic key (here the first two characters, which a
single mid-string edit cannot change), and the expensive distance
runs only within a block — the standard way a fuzzy join avoids the
O(N·M) cross product at scale (Christen, "Data Matching", 2012).

Demo instance over the ``part`` table: every part with
``p_partkey <= PROBE_KEYS`` yields a corrupted probe (its 3rd
character deleted); the join finds, per probe, the nearest OTHER
part name by Levenshtein distance within the probe's block
(tie-break: smaller partkey).

Distributed shape:
- probes are a bounded slice → grouped by block and broadcast once
  via ``ray.put`` (a true small side — never re-shipped per batch);
- the candidate (fact) side streams through ``map_batches``; each
  batch compares its rows against the probes of their blocks only
  and emits a per-batch LOCAL argmin per probe — so the exchange
  carries ≤ #probes rows per block, never the scored pairs;
- the driver folds partial argmins (probes-sized, not data-sized).

The Levenshtein kernel is numpy-vectorized across all candidates of
a block at once: the row-wise DP dependence collapses via the
``min-plus prefix`` identity dp[j] = j + cummin(u[k] − k), so the
inner loop is one ``np.minimum.accumulate`` per probe character —
no per-pair Python DP.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from ..functions.frames import ensure_columns

PROBE_KEYS = 100  # parts with p_partkey <= this become probes
BLOCK_CHARS = 2  # block key = first 2 chars (stable under a 3rd-char edit)
DEL_POS = 2  # probes delete the character at this 0-based position


def _to_u32(s: str) -> np.ndarray:
    return np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)


def _pad_matrix(strs: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """utf-32 codepoint matrix (n, max_len) zero-padded + true lengths."""
    arrs = [_to_u32(s) for s in strs]
    lens = np.array([len(a) for a in arrs], dtype=np.int64)
    mat = np.zeros((len(arrs), int(lens.max()) if len(arrs) else 0), np.uint32)
    for i, a in enumerate(arrs):
        mat[i, : len(a)] = a
    return mat, lens


def levenshtein_one_vs_many(
    probe: np.ndarray, mat: np.ndarray, lens: np.ndarray
) -> np.ndarray:
    """Exact Levenshtein distances from one utf-32 probe to every row
    of the padded candidate matrix, vectorized across candidates.

    Per probe character the textbook recurrence
    ``dp[j] = min(prev[j]+1, prev[j-1]+cost, dp[j-1]+1)`` has a
    sequential j-dependence only through the last term; substituting
    ``u[j] = min(prev[j]+1, prev[j-1]+cost)`` gives
    ``dp[j] = j + min_{k<=j}(u[k] − k)`` — one cumulative minimum.
    """
    n, lmax = mat.shape
    rng = np.arange(lmax + 1, dtype=np.int64)
    dp = np.tile(rng, (n, 1))
    for i, ch in enumerate(probe, start=1):
        cost = (mat != ch).astype(np.int64)
        u = np.empty((n, lmax + 1), dtype=np.int64)
        u[:, 0] = i
        np.minimum(dp[:, 1:] + 1, dp[:, :-1] + cost, out=u[:, 1:])
        dp = np.minimum.accumulate(u - rng, axis=1) + rng
    return dp[np.arange(n), lens]


def _probe_table(sf_dir: str) -> dict[str, tuple[list[int], list[np.ndarray]]]:
    """Bounded probe slice, grouped by block key (driver-side: the
    probe set is a fixed small dimension, read with predicate
    pushdown — one row group's worth, not the part table)."""
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_name"],
        filters=[("p_partkey", "<=", PROBE_KEYS)],
    )
    by_block: dict[str, tuple[list[int], list[np.ndarray]]] = {}
    for k, name in zip(t["p_partkey"].to_pylist(), t["p_name"].to_pylist()):
        corrupted = name[:DEL_POS] + name[DEL_POS + 1 :]
        blk = name[:BLOCK_CHARS]
        keys, codes = by_block.setdefault(blk, ([], []))
        keys.append(k)
        codes.append(_to_u32(corrupted))
    return by_block


def fuzzy_part_match(sf_dir: str) -> pd.DataFrame:
    from ..io import read_table

    probes_ref = ray.put(_probe_table(sf_dir))

    from .embedops import _task_stage

    class BlockScorer:
        def __init__(self):
            self.probes = ray.get(probes_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            names = batch["p_name"].to_pylist()
            keys = batch["p_partkey"].to_numpy(zero_copy_only=False)
            blks = [n[:BLOCK_CHARS] for n in names]
            out_p: list[int] = []
            out_m: list[int] = []
            out_d: list[int] = []
            # group the batch's rows by block, score each block's
            # candidates against that block's probes in one DP sweep
            order = np.argsort(np.array(blks, dtype=object), kind="stable")
            i = 0
            while i < len(order):
                j = i
                blk = blks[order[i]]
                while j < len(order) and blks[order[j]] == blk:
                    j += 1
                hit = self.probes.get(blk)
                if hit is not None:
                    idx = order[i:j]
                    mat, lens = _pad_matrix([names[x] for x in idx])
                    cand_keys = keys[idx]
                    for pk, pcode in zip(*hit):
                        d = levenshtein_one_vs_many(pcode, mat, lens)
                        d = np.where(cand_keys == pk, np.iinfo(np.int64).max, d)
                        best = np.lexsort((cand_keys, d))[0]
                        if d[best] < np.iinfo(np.int64).max:
                            out_p.append(pk)
                            out_m.append(int(cand_keys[best]))
                            out_d.append(int(d[best]))
                i = j
            return pa.table(
                {
                    "probe_key": pa.array(out_p, pa.int64()),
                    "match_key": pa.array(out_m, pa.int64()),
                    "dist": pa.array(out_d, pa.int64()),
                }
            )

    partials = (
        read_table(sf_dir, "part", ["p_partkey", "p_name"])
        .map_batches(_task_stage(BlockScorer), batch_format="pyarrow")
        .to_pandas()
    )
    partials = ensure_columns(
        partials, {"probe_key": "int64", "match_key": "int64", "dist": "int64"}
    )
    if partials.empty:
        return partials
    # probes-sized fold: global argmin per probe, partkey tie-break
    best = (
        partials.sort_values(["probe_key", "dist", "match_key"], kind="mergesort")
        .groupby("probe_key", as_index=False)
        .first()
    )
    return best[["probe_key", "match_key", "dist"]].reset_index(drop=True)


FUZZY_MATCH_SQL = f"""
WITH probes AS (
  SELECT p_partkey AS probe_key,
         substr(p_name, 1, {DEL_POS}) || substr(p_name, {DEL_POS + 2})
           AS probe_name,
         substr(p_name, 1, {BLOCK_CHARS}) AS blk
  FROM part WHERE p_partkey <= {PROBE_KEYS}
),
scored AS (
  SELECT probe_key, c.p_partkey AS match_key,
         levenshtein(probe_name, c.p_name) AS dist,
         row_number() OVER (
           PARTITION BY probe_key
           ORDER BY levenshtein(probe_name, c.p_name), c.p_partkey) AS rn
  FROM probes
  JOIN (SELECT p_partkey, p_name, substr(p_name, 1, {BLOCK_CHARS}) AS blk
        FROM part) c USING (blk)
  WHERE c.p_partkey != probe_key
)
SELECT probe_key, match_key, CAST(dist AS BIGINT) AS dist
FROM scored WHERE rn = 1 ORDER BY probe_key
"""
