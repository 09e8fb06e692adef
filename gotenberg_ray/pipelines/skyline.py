"""Distributed skyline (Pareto frontier) query.

The multi-objective filter (Börzsönyi et al., "The Skyline
Operator", ICDE 2001, public): keep every row not DOMINATED by
another — here parts minimizing price while maximizing size. A row q
dominates p iff ``q.cents <= p.cents AND q.size >= p.size`` with at
least one strict inequality; incomparable ties both survive.

Distributed shape (the classic two-phase skyline):
1. per block, compute the LOCAL skyline with one sort + prefix-max
   scan (vectorized; a block's non-skyline rows can never be in the
   global skyline because their dominator is in the same block);
2. the union of local skylines — frontier-sized, orders of magnitude
   smaller than the input — folds through the SAME kernel once more.

Only frontier rows ever leave a block, so the exchange is
O(frontier × #blocks); the input never shuffles. Money is exact
integer cents on both engines.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.frames import ensure_columns


def _local_skyline(cents: np.ndarray, size: np.ndarray) -> np.ndarray:
    """Boolean keep-mask of the exact skyline (min cents, max size).

    Sort by (cents asc, size desc); a row survives iff its size
    strictly exceeds the max size of every strictly-cheaper row AND
    it ties the max size within its own price group (equal-price
    smaller-size rows are dominated; equal (cents, size) pairs are
    incomparable and all survive)."""
    n = len(cents)
    if n == 0:
        return np.zeros(0, dtype=bool)
    order = np.lexsort((-size, cents))
    c_s, s_s = cents[order], size[order]
    grp_start = np.r_[True, c_s[1:] != c_s[:-1]]
    # max size within each price group = size of the group's first row
    seg_ix = np.maximum.accumulate(np.where(grp_start, np.arange(n), 0))
    grp_max = s_s[seg_ix]
    # running max size over STRICTLY cheaper groups (exclusive)
    grp_ids = np.cumsum(grp_start) - 1
    first_rows = np.flatnonzero(grp_start)
    per_grp_max = s_s[first_rows]
    prev_max = np.r_[np.iinfo(np.int64).min, np.maximum.accumulate(per_grp_max)[:-1]]
    keep_sorted = (s_s == grp_max) & (s_s > prev_max[grp_ids])
    keep = np.zeros(n, dtype=bool)
    keep[order] = keep_sorted
    return keep


def skyline_parts(sf_dir: str) -> pd.DataFrame:
    from ..io import read_table

    def local(batch: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(batch["p_retailprice"], 100.0)), pa.int64()
        ).to_numpy(zero_copy_only=False)
        size = batch["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = _local_skyline(cents, size)
        return pa.table(
            {
                "p_partkey": pc.filter(
                    batch["p_partkey"].combine_chunks(), pa.array(keep)
                ),
                "cents": pa.array(cents[keep]),
                "p_size": pa.array(size[keep]),
            }
        )

    cand = (
        read_table(sf_dir, "part", ["p_partkey", "p_retailprice", "p_size"])
        .map_batches(local, batch_format="pyarrow")
        .to_pandas()
    )
    cand = ensure_columns(
        cand, {"p_partkey": "int64", "cents": "int64", "p_size": "int64"}
    )
    if cand.empty:
        return cand
    # frontier-sized final fold (same kernel, driver-side)
    keep = _local_skyline(
        cand["cents"].to_numpy(), cand["p_size"].to_numpy()
    )
    out = cand[keep].copy()
    for c in ("p_partkey", "cents", "p_size"):
        out[c] = out[c].astype("int64")
    return out.sort_values("p_partkey").reset_index(drop=True)


SKYLINE_SQL = """
WITH p AS (
  SELECT p_partkey, CAST(round(p_retailprice * 100) AS BIGINT) AS cents,
         CAST(p_size AS BIGINT) AS p_size
  FROM part)
SELECT p_partkey, cents, p_size
FROM p
WHERE NOT EXISTS (
  SELECT 1 FROM p q
  WHERE q.cents <= p.cents AND q.p_size >= p.p_size
    AND (q.cents < p.cents OR q.p_size > p.p_size))
ORDER BY p_partkey
"""
