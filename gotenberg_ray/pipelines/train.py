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
    pages. ONE shared kernel with the interleaved composition —
    :func:`_extract_text_media` minus its media column (the span
    flatten / page join / id parse must never diverge between the two
    compositions)."""
    return _extract_text_media(batch).drop_columns(["n_media"])


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


def _hash_key_cols(batch: pa.Table) -> tuple[pa.Array, "pa.Array"]:
    """Shared (content-hash, ordering-key) computation for both dedup
    folds — the text and interleaved compositions must never diverge
    on how a part is identified."""
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
    return pa.array(h.astype(np.int64)), key


def _hash_parts(batch: pa.Table) -> pa.Table:
    """(text, doc_num, part_index) → (h, key, n_tokens) dedup rows —
    only these three ints ever shuffle."""
    h, key = _hash_key_cols(batch)
    return pa.table({"h": h, "key": key, "n_tokens": batch["n_tokens"]})


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


def shard_sink(
    ds, out_dir: str | None = None, num_partitions: int = 8, key: str = "pack_id"
):
    """Resumable hash-partitioned training-shard sink; returns the
    input manifest unchanged (sink-as-stage for the registry path).
    ``key`` defaults to the text composition's pack_id; the interleaved
    composition passes its dual-budget ``cell``."""
    import tempfile

    from ..io import write_partitioned

    if out_dir is None:
        out_dir = tempfile.mkdtemp(prefix="gotenberg_ray_shards_")
    write_partitioned(ds, out_dir, key=key, num_partitions=num_partitions)
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


# --- interleaved text+media composition ------------------------------
#
# The graft cell's payload axis is INTERLEAVED text+media documents;
# pack_interleaved's docstring defers per-doc media counts to "a
# production corpus [that] supplies its real span counts" — this
# composition closes that loop: the crawl's converted pages carry
# their media spans, so the dual token+media budget packs on REAL
# counts, not the hash proxy.


def _extract_text_media(batch: pa.Table) -> pa.Table:
    """:func:`_extract_text` plus per-page MEDIA-span counts:
    (doc_num, part_index, text, n_tokens, n_media). Both signals come
    from the same flattened span lists — one pass, no second scan."""
    batch = batch.filter(pc.equal(batch["status"], "success"))
    n = batch.num_rows
    if n == 0:
        return pa.table(
            {
                "doc_num": pa.array([], pa.int64()),
                "part_index": pa.array([], pa.int64()),
                "text": pa.array([], pa.string()),
                "n_tokens": pa.array([], pa.int64()),
                "n_media": pa.array([], pa.int64()),
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
    is_media = pc.equal(kinds, "media").to_numpy(zero_copy_only=False)
    # per-page join + token count, all C kernels (the former pandas
    # groupby-agg ran a Python " ".join per page): rebuild a list
    # column of each page's text spans from the bincount offsets, one
    # arrow binary_join, one whitespace split with empty-token drop —
    # identical values to "  ".join / str.split (parity pinned)
    cnt_text = np.bincount(parents[is_text], minlength=n)
    rows = np.flatnonzero(cnt_text > 0)  # pages w/o text spans drop
    flat_texts = texts.filter(pa.array(is_text))
    if isinstance(flat_texts, pa.ChunkedArray):
        flat_texts = flat_texts.combine_chunks()
    offs = np.zeros(n + 1, np.int64)
    np.cumsum(cnt_text, out=offs[1:])
    tl = pa.ListArray.from_arrays(pa.array(offs.astype(np.int32)), flat_texts)
    joined = pc.binary_join(tl, pa.scalar(" ")).take(pa.array(rows))
    toks = pc.utf8_split_whitespace(joined)
    tp = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    keep = pc.greater(pc.utf8_length(toks.values), 0).to_numpy(
        zero_copy_only=False
    )
    n_tokens = np.bincount(tp[keep], minlength=len(rows)).astype(np.int64)
    media_per_row = np.bincount(parents[is_media], minlength=n).astype(np.int64)
    doc_num = (
        pc.cast(pc.utf8_slice_codeunits(batch["doc_id"], 4, 2**30), pa.int64())
        .to_numpy(zero_copy_only=False)[rows]
    )
    part = batch["part_index"].to_numpy(zero_copy_only=False)[rows].astype(np.int64)
    return pa.table(
        {
            "doc_num": pa.array(doc_num),
            "part_index": pa.array(part),
            "text": joined,
            "n_tokens": pa.array(n_tokens),
            "n_media": pa.array(media_per_row[rows]),
        }
    )


def _hash_parts_media(batch: pa.Table) -> pa.Table:
    """:func:`_hash_parts` plus the media budget column (shared
    hash/key kernel — see :func:`_hash_key_cols`)."""
    h, key = _hash_key_cols(batch)
    return pa.table(
        {
            "h": h,
            "key": key,
            "n_tokens": batch["n_tokens"],
            "n_media": batch["n_media"],
        }
    )


def dedup_parts_media(ds):
    """Exact text dedup carrying the media budget through: content
    hash → min (doc_num, part) wins; the surviving n_media is the MIN
    across copies (copies of one text may differ in media count only
    through page-boundary effects — min is the deterministic,
    layout-invariant choice)."""
    return (
        ds.map_batches(_hash_parts_media, batch_format="pyarrow")
        .groupby("h")
        .aggregate(
            Min("key", alias_name="keep_key"),
            Min("n_tokens", alias_name="n_tokens"),
            Min("n_media", alias_name="n_media"),
        )
    )


def pack_contexts_interleaved(ds, ctx_tokens: int = 256, ctx_media: int = 8):
    """Dual-budget packing over the SHARED multi-column ordered prefix
    sum (``ordered_prefix_sum_multi`` — one exchange for both
    budgets): pack cell = (start_tokens // ctx_tokens,
    start_media // ctx_media), the :func:`~.packing.pack_interleaved`
    composite-floor semantics on REAL media counts. ``cell`` is the
    64-bit mix of the pair — used as the shard-sink key and for the
    distinct-cell count (a 2⁻⁶⁴ mix collision would merge two cells'
    shard directories; same accepted-risk class as dedup_exact)."""
    from ..functions.hashing import splitmix64
    from .packing import ordered_prefix_sum_multi

    def assign(b: pa.Table) -> pa.Table:
        pt = (
            b["start_n_tokens"].to_numpy(zero_copy_only=False)
            // np.int64(ctx_tokens)
        ).astype(np.uint64)
        pm = (
            b["start_n_media"].to_numpy(zero_copy_only=False)
            // np.int64(ctx_media)
        ).astype(np.uint64)
        cell = (
            splitmix64(pt) ^ splitmix64(pm ^ np.uint64(0xA5A5A5A5A5A5A5A5))
        ).astype(np.int64)
        return pa.table(
            {
                "keep_key": b["keep_key"],
                "n_tokens": b["n_tokens"],
                "n_media": b["n_media"],
                "pack_t": pa.array(pt.astype(np.int64)),
                "pack_m": pa.array(pm.astype(np.int64)),
                "cell": pa.array(cell),
            }
        )

    packed = ordered_prefix_sum_multi(
        ds, "keep_key", ["n_tokens", "n_media"], span=100_000_000, num_partitions=8
    ).map_batches(assign, batch_format="pyarrow")
    return packed.materialize()


def training_interleaved_pipeline(
    sf_dir: str,
    ctx_tokens: int = 256,
    ctx_media: int = 8,
    min_tokens: int = 5,
    out_dir: str | None = None,
) -> pd.DataFrame:
    """Interleaved text+media training-data assembly: crawl the
    media-carrying span corpus → extract (text, n_tokens, n_media) per
    page → quality gate → exact dedup (media budget rides along) →
    dual-budget pack on the real span counts → resumable shard sink
    keyed by pack cell. Returns a one-row summary (deterministic under
    the seeded crawl; rows-only — a crawl is not SQL-expressible)."""
    import tempfile

    import pyarrow.parquet as _pq

    from ray.data.aggregate import Count

    from ..io import write_partitioned
    from .flagship import crawl_convert_media

    n_docs = _pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    if n_docs == 0:
        return pd.DataFrame(
            {c: [0] for c in ("n_pages", "n_unique_parts", "total_tokens",
                              "total_media", "n_pack_cells", "written_buckets")}
        )

    pages = crawl_convert_media(sf_dir)
    text_rows = pages.map_batches(_extract_text_media, batch_format="pyarrow")
    gated = text_rows.map_batches(
        quality_gate, batch_format="pyarrow", fn_kwargs={"min_tokens": min_tokens}
    )
    winners = dedup_parts_media(gated)
    packed = pack_contexts_interleaved(
        winners, ctx_tokens=ctx_tokens, ctx_media=ctx_media
    )

    if out_dir is None:
        out_dir = tempfile.mkdtemp(prefix="gotenberg_ray_ishards_")
    sink = write_partitioned(packed, out_dir, key="cell", num_partitions=8)

    n_pages = pages.count()
    n_unique = packed.count()
    if n_unique == 0:
        total_tokens = total_media = n_cells = 0
    else:
        stats = packed.aggregate(
            Sum("n_tokens", alias_name="total_tokens"),
            Sum("n_media", alias_name="total_media"),
        )
        total_tokens = int(stats["total_tokens"])
        total_media = int(stats["total_media"])
        cells = packed.groupby("cell").aggregate(Count(alias_name="n"))
        n_cells = int(cells.count())
    return pd.DataFrame(
        {
            "n_pages": [int(n_pages)],
            "n_unique_parts": [int(n_unique)],
            "total_tokens": [total_tokens],
            "total_media": [total_media],
            "n_pack_cells": [n_cells],
            "written_buckets": [int(sink["written_buckets"] + sink["skipped_buckets"])],
        }
    )
