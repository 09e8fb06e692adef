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


def read_jsonl(
    path: str,
    columns: list[str] | None = None,
    num_blocks: int | None = None,
) -> rd.Dataset:
    """Newline-delimited-JSON source with the same size-∝ block policy
    as :func:`read_table` — training corpora commonly arrive as .jsonl
    shards before the first parquet/Lance conversion. JSON has no
    column pruning at the decoder, so ``columns`` projects right after
    the read (the bytes are already off disk; at scale, convert to a
    columnar format once and use ``read_table``)."""
    nb = num_blocks or blocks_for(path)
    ds = rd.read_json(path, override_num_blocks=nb)
    if columns:
        ds = ds.select_columns(columns)
    return ds


def read_csv(
    path: str,
    columns: list[str] | None = None,
    num_blocks: int | None = None,
) -> rd.Dataset:
    """CSV source, same block policy; ``columns`` projects post-read
    (CSV is row-major — no decoder pruning exists to push into)."""
    nb = num_blocks or blocks_for(path)
    ds = rd.read_csv(path, override_num_blocks=nb)
    if columns:
        ds = ds.select_columns(columns)
    return ds


def write_partitioned(
    ds: rd.Dataset,
    path: str,
    key: str,
    num_partitions: int = 32,
    direct: bool = False,
) -> dict:
    """Resumable partitioned sink: rows are hash-bucketed on ``key``
    into ``num_partitions`` directories, each written atomically (data
    file first, then a ``_COMPLETE`` marker). A re-run after a kill
    SKIPS every directory whose marker exists — only missing buckets
    recompute, so a failed 100 TB job resumes at the partition
    granularity instead of restarting (the brief's resumable-output
    contract; same marker protocol as ``frontier/checkpoint.py``).

    The write happens INSIDE the bucket groups (workers write their own
    partition; the driver sees only per-bucket row counts). Bucket ids
    are content-deterministic (``mix64(key) % P``), so a resume run
    routes every row to the same directory it targeted before.
    Directory names avoid ``key=value`` so a plain ``read_parquet``
    never hive-infers a phantom partition column.

    ``direct=True`` uses the key VALUE itself (mod num_partitions) as
    the bucket id instead of its hash — for layout-aware sinks (z-order
    cells, label partitions) where the caller needs a value→directory
    mapping it can prune on at read time."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from .pipelines.joins import partition_ids

    os.makedirs(path, exist_ok=True)
    done = {
        int(d.split("-")[1])
        for d in os.listdir(path)
        if d.startswith("bucket-")
        and os.path.exists(os.path.join(path, d, "_COMPLETE"))
    }

    def tag(batch: pa.Table) -> pa.Table:
        if direct:
            vals = batch.column(key).to_numpy(zero_copy_only=False)
            pid = pa.array((vals % num_partitions).astype(np.int32))
        else:
            pid = partition_ids(batch.column(key), num_partitions)
        batch = batch.append_column("__bucket__", pid)
        if done:  # resume: finished buckets never re-enter the shuffle
            keep = ~np.isin(pid.to_numpy(zero_copy_only=False), list(done))
            batch = batch.filter(pa.array(keep))
        return batch

    def write_bucket(part: pa.Table) -> pa.Table:
        bid = int(part["__bucket__"][0].as_py())
        part = part.drop_columns(["__bucket__"])
        bdir = os.path.join(path, f"bucket-{bid}")
        os.makedirs(bdir, exist_ok=True)
        pq.write_table(part, os.path.join(bdir, "part.parquet"))
        with open(os.path.join(bdir, "_COMPLETE"), "w") as f:
            f.write(str(part.num_rows))
        return pa.table({"bucket": [bid], "rows": [part.num_rows]})

    written = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("__bucket__", num_partitions=num_partitions)
        .map_groups(write_bucket, batch_format="pyarrow")
        .to_pandas()
    )
    return {
        "written_buckets": len(written),
        "written_rows": int(written["rows"].sum()) if len(written) else 0,
        "skipped_buckets": len(done),
    }


def read_partitioned(path: str, columns: list[str] | None = None) -> rd.Dataset:
    """Read back a ``write_partitioned`` directory (complete buckets
    only — a half-written bucket without its marker is invisible)."""
    files = [
        os.path.join(path, d, "part.parquet")
        for d in sorted(os.listdir(path))
        if d.startswith("bucket-")
        and os.path.exists(os.path.join(path, d, "_COMPLETE"))
    ]
    return rd.read_parquet(files, columns=columns)
