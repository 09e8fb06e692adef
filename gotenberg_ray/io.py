"""Table IO seam — every dataset read/write in the engine goes through
here, for two reasons:

1. **Storage-format swap point.** The north rule names Lance tables;
   ``import lance`` fails in this container (verified), so the engine
   runs on parquet. Because callers only see :func:`read_table` /
   :func:`write_table`, swapping the physical format back to Lance is a
   change to THIS file only.

2. **Size-proportional block policy.** Ray's default parallelism
   splits even a tiny file into ~64 blocks (2 × cores); every
   downstream all-to-all (groupby / sort / the bucketed hash join)
   then schedules O(blocks × partitions) tiny tasks whose fixed
   scheduling latency dwarfs the data movement — measured 4.7 s → 0.4 s
   on one sf0.1 join by sizing blocks to the input. Policy: one block
   per ~``TARGET_BLOCK_BYTES`` of file, clamped to [2, 512]. At 100 TB
   the same rule yields thousands of blocks — the correct production
   behavior — while small inputs stop paying a 100-task fixed cost.
"""

from __future__ import annotations

import os

import ray.data as rd

TARGET_BLOCK_BYTES = 32 << 20  # ~32 MB of parquet per block
_MIN_BLOCKS = 2
_MAX_BLOCKS = 512  # single-node cap; a multi-node cluster raises it


def blocks_for(path: str) -> int:
    """Block count ∝ on-disk size (clamped)."""
    try:
        size = os.path.getsize(path)
    except OSError:
        return _MIN_BLOCKS
    return max(_MIN_BLOCKS, min(_MAX_BLOCKS, size // TARGET_BLOCK_BYTES + 1))


def table_path(sf_dir: str, table: str) -> str:
    return f"{sf_dir}/{table}.parquet"


def parallelism_hint() -> int:
    """Cluster CPU count (fallback 8) — the block floor for reads that
    feed CPU-bound per-row compute (tokenize/hash/matmul), where one
    task per block means block count caps core utilization."""
    try:
        import ray

        return int(ray.cluster_resources().get("CPU", 8)) or 8
    except Exception:
        return 8


def read_table(
    sf_dir: str,
    table: str,
    columns: list[str] | None = None,
    num_blocks: int | None = None,
    min_blocks: int | None = None,
) -> rd.Dataset:
    """Columnar-pruned read with size-proportional block count.

    ``min_blocks``: floor for compute-bound consumers (pass
    ``parallelism_hint()``); shuffle-bound consumers omit it so tiny
    inputs don't pay a 100-task all-to-all."""
    path = table_path(sf_dir, table)
    nb = num_blocks or blocks_for(path)
    if min_blocks:
        nb = max(nb, min_blocks)
    return rd.read_parquet(path, columns=columns, override_num_blocks=nb)


def write_table(ds: rd.Dataset, path: str, **kwargs) -> None:
    """Partitioned-parquet sink (one file per block — resumable)."""
    ds.write_parquet(path, **kwargs)
