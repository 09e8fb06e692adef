"""End-to-end training-data assembly: the crawl feeds the curation
and batch-assembly operators in ONE streaming composition —

    crawl+convert (frontier actors, inline conversion, partitioned
    parquet sink)  →  span→text extraction  →  quality gate  →
    exact dedup  →  context-window packing  →  resumable
    hash-partitioned training-shard sink

i.e. the engine's two halves (the Gotenberg-semantics crawl of the
north rule, and the LLM-data operators of the task brief) joined into
the pipeline a user would actually run at 100 TB. Every stage is the
already-tested operator: the same vectorized tokenize/quality kernels
(``quality.py``), the fnv64 content-hash dedup (``textops``), the
two-pass ordered prefix sum (``packing.py``), and the
marker-protocol resumable sink (``io.write_partitioned``).

Correctness: the crawl is seeded and deterministic, so the whole
composition is — the pytest oracle runs it twice and requires
identical output; the driver records a rows-only check (a crawl is
not SQL-expressible).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Min, Sum


def _extract_text(batch: pa.Table) -> pa.Table:
    """Converted pages → (doc_num, part_index, text, n_tokens) rows:
    concatenate the page's text spans in offset order, drop error
    pages. C kernels for the flatten/filter; the per-page join is the
    unavoidable string work."""
    batch = batch.filter(pc.equal(batch["status"], "success"))
    n = batch.num_rows
    if n == 0:
        return pa.table(
            {
                "doc_num": pa.array([], pa.int64()),
                "part_index": pa.array([], pa.int64()),
                "text": pa.array([], pa.string()),
                "n_tokens": pa.array([], pa.int64()),
            }
        )
    spans = batch["spans"]
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    parents = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
    flat = spans.flatten()
    kinds = flat.field("kind")
    texts = flat.field("text")
    is_text = pc.equal(kinds, "text").to_numpy(zero_copy_only=False)
    df = pd.DataFrame(
        {"row": parents[is_text], "t": texts.filter(pa.array(is_text))}
    )
    joined = df.groupby("row", sort=True)["t"].agg(" ".join)
    rows = joined.index.to_numpy()
    text = joined.to_numpy()
    # slice from offset 4 to the end of the id — a fixed upper bound
    # would silently truncate ids wider than 6 digits (>= 10^6 docs)
    doc_num = (
        pc.cast(pc.utf8_slice_codeunits(batch["doc_id"], 4, 2**30), pa.int64())
        .to_numpy(zero_copy_only=False)[rows]
    )
    part = batch["part_index"].to_numpy(zero_copy_only=False)[rows].astype(np.int64)
    toks = pa.array([len(t.split()) for t in text], pa.int64())
    return pa.table(
        {
            "doc_num": pa.array(doc_num),
            "part_index": pa.array(part),
            "text": pa.array(text, pa.string()),
            "n_tokens": toks,
        }
    )


# --- the composition's stages as module-level functions, so the SAME
# callables serve both the direct pipeline below and the stage-registry
# composition (registry.register_builtins → "extract_text",
# "quality_gate", "dedup_parts", "pack_contexts", "shard_sink";
# equality of the two paths is pinned in tests/test_registry.py)


def quality_gate(batch: pa.Table, min_tokens: int = 5) -> pa.Table:
    """Token floor + type-token ratio (the quality.py repetition
    signal, inlined on the already-tokenized rows: a page whose
    distinct-token share falls below 25% is boilerplate/spam)."""
    from ..functions.hashing import fnv64

    keep = pc.greater_equal(batch["n_tokens"], min_tokens)
    texts = batch["text"]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    toks = pc.utf8_split_whitespace(pc.fill_null(texts, ""))
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    flat_h = fnv64(toks.values)
    total = np.bincount(parents, minlength=batch.num_rows)
    # distinct per row: sort (row, hash) pairs, count run starts
    order = np.lexsort((flat_h, parents))
    pr, hr = parents[order], flat_h[order]
    new = np.ones(len(pr), bool)
    if len(pr) > 1:
        new[1:] = (pr[1:] != pr[:-1]) | (hr[1:] != hr[:-1])
    distinct = np.bincount(parents[order][new], minlength=batch.num_rows)
    ttr_ok = (total == 0) | (distinct * 4 >= total)  # TTR ≥ 0.25
    keep = pc.and_(keep, pa.array(ttr_ok))
    return batch.filter(keep)


def _hash_parts(batch: pa.Table) -> pa.Table:
    """(text, doc_num, part_index) → (h, key, n_tokens) dedup rows —
    only these three ints ever shuffle."""
    from ..functions.hashing import fnv64

    h = fnv64(
        batch["text"].combine_chunks()
        if isinstance(batch["text"], pa.ChunkedArray)
        else batch["text"]
    )
    key = pc.add(
        pc.multiply(batch["doc_num"], pa.scalar(1_000_000, pa.int64())),
        pc.cast(batch["part_index"], pa.int64()),
    )
    return pa.table(
        {
            "h": pa.array(h.astype(np.int64)),
            "key": key,
            "n_tokens": batch["n_tokens"],
        }
    )


def dedup_parts(ds):
    """Exact dedup: content hash → min (doc_num, part) wins. Equality
    is 64-bit-hash equality (the dedup_exact convention — a 2^-64
    collision would drop one distinct part; incremental.py shows the
    text-verified variant when that risk is unacceptable)."""
    return (
        ds.map_batches(_hash_parts, batch_format="pyarrow")
        .groupby("h")
        .aggregate(
            Min("key", alias_name="keep_key"), Min("n_tokens", alias_name="n_tokens")
        )
    )


def pack_contexts(ds, ctx: int = 256):
    """Context-window packing over the SHARED ordered prefix sum
    (packing.py), keyed by keep_key; returns the (keep_key, n_tokens,
    pack_id) manifest, materialized (it is unique-parts-sized — tiny
    relative to the corpus) so sink + summary consumers don't re-run
    the dedup/packing plan."""
    from .packing import ordered_prefix_sum

    packed = ordered_prefix_sum(
        ds, "keep_key", "n_tokens", span=100_000_000, num_partitions=8
    ).map_batches(
        lambda b: pa.table(
            {
                "keep_key": b["keep_key"],
                "n_tokens": b["n_tokens"],
                "pack_id": pc.cast(
                    pc.divide(b["start"], pa.scalar(ctx, pa.int64())), pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    )
    return packed.materialize()


def shard_sink(ds, out_dir: str | None = None, num_partitions: int = 8):
    """Resumable hash-partitioned training-shard sink; returns the
    input manifest unchanged (sink-as-stage for the registry path)."""
    import tempfile

    from ..io import write_partitioned

    if out_dir is None:
        out_dir = tempfile.mkdtemp(prefix="gotenberg_ray_shards_")
    write_partitioned(ds, out_dir, key="pack_id", num_partitions=num_partitions)
    return ds


def training_data_pipeline(
    sf_dir: str,
    ctx: int = 256,
    min_tokens: int = 5,
    out_dir: str | None = None,
) -> pd.DataFrame:
    """Run the full crawl→curate→pack→shard composition; returns a
    one-row summary (deterministic under the seeded crawl)."""
    import tempfile

    import pyarrow.parquet as _pq

    from ..io import write_partitioned
    from .flagship import crawl_convert

    # empty corpus → nothing to crawl: the composition degrades to an
    # all-zero summary row (the empty-input totality contract)
    n_docs = _pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    if n_docs == 0:
        return pd.DataFrame(
            {c: [0] for c in ("n_pages", "n_unique_parts", "total_tokens",
                              "n_packs", "written_buckets")}
        )

    pages = crawl_convert(sf_dir)
    text_rows = pages.map_batches(_extract_text, batch_format="pyarrow")
    gated = text_rows.map_batches(
        quality_gate, batch_format="pyarrow", fn_kwargs={"min_tokens": min_tokens}
    )
    winners = dedup_parts(gated)
    packed = pack_contexts(winners, ctx=ctx)

    if out_dir is None:
        out_dir = tempfile.mkdtemp(prefix="gotenberg_ray_shards_")
    sink = write_partitioned(packed, out_dir, key="pack_id", num_partitions=8)

    n_pages = pages.count()
    n_unique = packed.count()
    from ray.data.aggregate import Max

    if n_unique == 0:
        # every page failed the gate (e.g. a min_tokens above the page
        # size) — Dataset.aggregate returns None on empty input, so
        # summarize the empty stream explicitly
        total_tokens, n_packs = 0, 0
    else:
        stats = packed.aggregate(Sum("n_tokens", alias_name="total_tokens"))
        total_tokens = int(stats["total_tokens"])
        n_packs = int(packed.aggregate(Max("pack_id", alias_name="m"))["m"]) + 1
    return pd.DataFrame(
        {
            "n_pages": [int(n_pages)],
            "n_unique_parts": [int(n_unique)],
            "total_tokens": [total_tokens],
            "n_packs": [n_packs],
            "written_buckets": [int(sink["written_buckets"] + sink["skipped_buckets"])],
        }
    )
