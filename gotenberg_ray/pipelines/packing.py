"""Sequence packing — assign documents to fixed-size training context
windows (the concat-and-chunk packing used for LLM pretraining
batches): documents are concatenated in deterministic ``doc_id`` order
and the token stream is cut into ``ctx``-token windows; each document
is tagged with its start offset in the global token stream and the
window (pack) its first token lands in.

The global start offset is an order-dependent running sum — the one
primitive Ray Data's unordered blocks don't give for free. It runs as
a distributed two-pass prefix sum over an explicit RANGE partitioning
(the same partitioning contract as ``joins.py``, but order-preserving):

1. bucket ``rid = doc_id // span`` (span sized so #buckets ∝ cluster);
   per-batch partial token sums per bucket → a tiny
   ``groupby(rid).sum`` — only (#buckets) rows reach the driver;
2. the driver computes the exclusive prefix over bucket totals
   (#buckets entries, O(cluster) not O(corpus)) and closes it over a
   second pass: ``groupby(rid).map_groups`` sorts each bucket by
   doc_id, local-cumsums, and adds the bucket's base.

Nothing corpus-sized ever sits on the driver; each bucket holds
``N/#buckets`` rows. The DuckDB oracle is the equivalent
``sum() OVER (ORDER BY doc_id)`` window.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Sum

from ..functions.frames import ensure_columns
from ..io import read_table

_RID = "__range_id__"


def _token_counts(batch: pa.Table) -> np.ndarray:
    """Whitespace token count per row, C kernels only (empty tokens
    from leading/duplicate whitespace are excluded, matching the SQL
    ``list_filter(regexp_split_to_array(...), t -> t <> '')``)."""
    texts = batch["text"]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    toks = pc.utf8_split_whitespace(pc.fill_null(texts, ""))
    total = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = toks.values
    empty = pc.equal(pc.utf8_length(flat), 0).to_numpy(zero_copy_only=False)
    if empty.any():
        parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        total -= np.bincount(parents[empty], minlength=len(total)).astype(np.int64)
    return total


def ordered_prefix_sum(
    ds,
    key: str,
    value: str,
    span: int,
    num_partitions: int = 16,
):
    """THE distributed order-preserving prefix sum (shared by
    ``pack_sequences`` and ``train.training_data_pipeline``): returns
    a Dataset of (key, value, start) where ``start`` is the exclusive
    prefix sum of ``value`` in ascending global ``key`` order. Range
    bucket ``rid = key // span``; pass 1 folds per-bucket totals (one
    tiny groupby — only #buckets rows reach the driver for the
    exclusive base scan); pass 2 closes each bucket with a local
    sort + cumsum + base."""

    def add_rid(batch: pa.Table) -> pa.Table:
        rid = pc.cast(
            pc.divide(batch[key], pa.scalar(span, pa.int64())), pa.int64()
        )
        return batch.select([key, value]).append_column(_RID, rid)

    with_rid = ds.map_batches(add_rid, batch_format="pyarrow")

    def bucket_partial(batch: pa.Table) -> pa.Table:
        return (
            batch.select([_RID, value]).group_by(_RID).aggregate([(value, "sum")])
        )

    totals = (
        with_rid.map_batches(bucket_partial, batch_format="pyarrow")
        .groupby(_RID)
        .aggregate(Sum(f"{value}_sum", alias_name="bucket_total"))
        .to_pandas()
    )
    totals = ensure_columns(
        totals, {_RID: "int64", "bucket_total": "int64"}
    ).sort_values(_RID)
    base = {}
    run = 0
    for rid, tot in zip(totals[_RID], totals["bucket_total"]):
        base[int(rid)] = run
        run += int(tot)

    def close_bucket(part: pa.Table) -> pa.Table:
        part = part.sort_by([(key, "ascending")])
        v = part[value].to_numpy(zero_copy_only=False).astype(np.int64)
        rid = int(part[_RID][0].as_py())
        start = base[rid] + np.concatenate(([0], np.cumsum(v)[:-1]))
        return pa.table(
            {
                key: part[key],
                value: pa.array(v),
                "start": pa.array(start),
            }
        )

    return with_rid.groupby(_RID, num_partitions=num_partitions).map_groups(
        close_bucket, batch_format="pyarrow"
    )


def pack_sequences(sf_dir: str, ctx: int = 512, num_buckets: int = 32) -> pd.DataFrame:
    """Per-document packing assignment: (doc_id, n_tokens,
    start_offset, pack_id) under ``ctx``-token windows."""

    def tokenize(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table({"doc_id": ids, "n_tokens": pa.array(_token_counts(batch))})

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        tokenize, batch_format="pyarrow"
    )

    # range span from the id domain (one tiny column scan)
    max_id = read_table(sf_dir, "documents", columns=["doc_id"]).max("doc_id") or 0
    span = max(1, (int(max_id) + num_buckets) // num_buckets)

    df = (
        ordered_prefix_sum(
            docs, "doc_id", "n_tokens", span,
            num_partitions=min(num_buckets, 16),
        )
        .map_batches(
            lambda b: pa.table(
                {
                    "doc_id": b["doc_id"],
                    "n_tokens": b["n_tokens"],
                    "start_offset": b["start"],
                    "pack_id": pc.cast(
                        pc.divide(b["start"], pa.scalar(ctx, pa.int64())), pa.int64()
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    df = ensure_columns(
        df,
        {"doc_id": "int64", "n_tokens": "int64",
         "start_offset": "int64", "pack_id": "int64"},
    )
    return df.sort_values("doc_id").reset_index(drop=True)


PACK_SQL = r"""
WITH tok AS (
  SELECT doc_id,
         CAST(len(list_filter(regexp_split_to_array(text, '\s+'),
                              t -> t <> '')) AS BIGINT) AS n_tokens
  FROM documents)
SELECT doc_id, n_tokens,
       CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) AS start_offset,
       CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) // 512 AS pack_id
FROM tok ORDER BY doc_id
"""


def chunk_documents(
    sf_dir: str, chunk: int = 64, stride: int = 48
) -> pd.DataFrame:
    """RAG-style chunking: each document splits into ``chunk``-token
    windows advancing by ``stride`` tokens (overlapping when stride <
    chunk) — the retrieval-index preparation step. Pure per-batch
    expansion (np.repeat/arange — one output row per window, no
    Python loop, no shuffle); a doc with t tokens yields
    ``1 + max(0, ceil((t - chunk)/stride))`` windows, the last one
    truncated (t=0 docs yield one empty window)."""

    def expand(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = _token_counts(batch)
        n_win = 1 + np.maximum(0, -(-(t - chunk) // stride))
        n_win = np.where(t <= chunk, 1, n_win).astype(np.int64)
        doc = np.repeat(ids, n_win)
        tot = np.repeat(t, n_win)
        within = np.arange(n_win.sum()) - np.repeat(
            np.cumsum(n_win) - n_win, n_win
        )
        start = within * stride
        n_tok = np.minimum(chunk, tot - start)
        return pa.table(
            {
                "doc_id": pa.array(doc),
                "chunk_id": pa.array(within.astype(np.int64)),
                "start_tok": pa.array(start.astype(np.int64)),
                "n_tok": pa.array(n_tok.astype(np.int64)),
            }
        )

    df = (
        read_table(sf_dir, "documents", columns=["doc_id", "text"])
        .map_batches(expand, batch_format="pyarrow")
        .to_pandas()
    )
    df = ensure_columns(
        df,
        {"doc_id": "int64", "chunk_id": "int64",
         "start_tok": "int64", "n_tok": "int64"},
    )
    return df.sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)


CHUNK_SQL = r"""
WITH tok AS (
  SELECT doc_id,
         CAST(len(list_filter(regexp_split_to_array(text, '\s+'),
                              t -> t <> '')) AS BIGINT) AS t
  FROM documents),
win AS (
  SELECT doc_id, t,
         CASE WHEN t <= 64 THEN 1
              ELSE 1 + CAST(ceil((t - 64) / 48.0) AS BIGINT) END AS n_win
  FROM tok)
SELECT doc_id,
       CAST(g AS BIGINT) AS chunk_id,
       CAST(g * 48 AS BIGINT) AS start_tok,
       CAST(least(64, t - g * 48) AS BIGINT) AS n_tok
FROM win, LATERAL unnest(range(n_win)) AS u(g)
ORDER BY doc_id, chunk_id
"""


def pack_shuffled(sf_dir: str, ctx: int = 512, num_buckets: int = 32) -> pd.DataFrame:
    """Inter-document SHUFFLED packing: documents are concatenated in
    a deterministic pseudo-random order — ``pri = (doc_id·2654435761)
    mod 2³²`` (Knuth's bijective multiplicative hash, the sampling
    module's priority) — then chunked into ``ctx``-token windows. This
    is the training-batch global shuffle: neighbors in the token
    stream are unrelated documents, yet the permutation is a pure
    function of the ids, so runs (and resumes) are bit-identical.
    Same two-pass ``ordered_prefix_sum``, keyed on the priority."""
    _KNUTH, _M32 = 2654435761, 1 << 32

    def _pri(ids: np.ndarray) -> np.ndarray:
        return (
            (ids.astype(np.uint64) * np.uint64(_KNUTH)) % np.uint64(_M32)
        ).astype(np.int64)

    def tokenize(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "pri": pa.array(_pri(ids)),
                "doc_id": pa.array(ids),
                "n_tokens": pa.array(_token_counts(batch)),
            }
        )

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        tokenize, batch_format="pyarrow"
    )
    span = max(1, _M32 // num_buckets)  # priorities are uniform in [0, 2³²)

    # carry doc_id through the prefix sum via a composite value? No —
    # the helper keeps (key, value); join doc_id back by priority
    # (bijective ⇒ unique key). The join's build side needs only
    # (pri, doc_id) — a pure function of the id column — so it reads
    # doc_id alone and the corpus is TOKENIZED EXACTLY ONCE.
    from .joins import hash_join
    from .relational import JOIN_PARTITIONS

    summed = ordered_prefix_sum(
        docs, "pri", "n_tokens", span, num_partitions=min(num_buckets, 16)
    )

    def id_side(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"pri": pa.array(_pri(ids)), "doc_id": pa.array(ids)}
        )

    joined = hash_join(
        summed,
        read_table(sf_dir, "documents", columns=["doc_id"]).map_batches(
            id_side, batch_format="pyarrow"
        ),
        on="pri",
        num_partitions=JOIN_PARTITIONS,
        left_schema=[("pri", pa.int64()), ("n_tokens", pa.int64()),
                     ("start", pa.int64())],
        right_schema=[("pri", pa.int64()), ("doc_id", pa.int64())],
    )
    df = (
        joined.map_batches(
            lambda b: pa.table(
                {
                    "doc_id": b["doc_id"],
                    "n_tokens": b["n_tokens"],
                    "shuffle_pos": b["pri"],
                    "start_offset": b["start"],
                    "pack_id": pc.cast(
                        pc.divide(b["start"], pa.scalar(ctx, pa.int64())), pa.int64()
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    df = ensure_columns(
        df,
        {"doc_id": "int64", "n_tokens": "int64", "shuffle_pos": "int64",
         "start_offset": "int64", "pack_id": "int64"},
    )
    return df.sort_values("doc_id").reset_index(drop=True)


PACK_SHUFFLED_SQL = r"""
WITH tok AS (
  SELECT doc_id,
         (doc_id * 2654435761) % 4294967296 AS shuffle_pos,
         CAST(len(list_filter(regexp_split_to_array(text, '\s+'),
                              t -> t <> '')) AS BIGINT) AS n_tokens
  FROM documents)
SELECT doc_id, n_tokens, CAST(shuffle_pos AS BIGINT) AS shuffle_pos,
       CAST(coalesce(sum(n_tokens) OVER (ORDER BY shuffle_pos
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) AS start_offset,
       CAST(coalesce(sum(n_tokens) OVER (ORDER BY shuffle_pos
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) // 512 AS pack_id
FROM tok ORDER BY doc_id
"""
