"""Distributed sampling operators over the documents table.

Three sampling shapes a training-data pipeline needs, all deterministic
(hash-keyed, not RNG-state-keyed) so runs are reproducible, resumable,
and oracle-checkable exactly:

- **Bernoulli**: keep a row iff ``mix(doc_id) mod M < p·M`` — a pure
  per-batch filter, no shuffle, no coordination; the classic
  hash-gated sample that composes with resume (a re-run keeps the
  same rows).
- **Bottom-k**: the k rows with the smallest ``mix(doc_id)`` — a
  uniform fixed-size sample as a mergeable sketch: each batch keeps a
  local bottom-k, the driver merges block results (k·blocks rows move,
  never the corpus). This is the distributed reservoir-sample
  equivalent with deterministic priorities.
- **Stratified bottom-k**: bottom-k per group (``lang``) — local
  per-(group,k) prune per batch, tiny groupby-free merge.

``mix`` is Knuth's multiplicative hash ``(doc_id · 2654435761) mod
2^32`` — bijective for doc_id < 2^32 (odd multiplier), so priorities
are unique (no ties) and the SAME arithmetic runs in the DuckDB oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.frames import ensure_columns
from ..io import read_table

_KNUTH = 2654435761
_M32 = 1 << 32


def _mix(ids: np.ndarray) -> np.ndarray:
    return (ids.astype(np.uint64) * np.uint64(_KNUTH)) % np.uint64(_M32)


def sample_bernoulli(sf_dir: str, pct: int = 10) -> pd.DataFrame:
    """Deterministic p% Bernoulli sample — stateless per-batch filter."""
    thresh = np.uint64(pct * _M32 // 100)

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        keep = _mix(ids) < thresh
        return batch.filter(pa.array(keep))

    df = (
        read_table(sf_dir, "documents", columns=["doc_id", "lang"])
        .map_batches(fn, batch_format="pyarrow")
        .to_pandas()
    )
    df = ensure_columns(df, {"doc_id": "int64", "lang": "object"})
    return df.sort_values("doc_id").reset_index(drop=True)


SAMPLE_BERNOULLI_SQL = f"""
SELECT doc_id, lang FROM documents
WHERE (CAST(doc_id AS HUGEINT) * {_KNUTH}) % {_M32} < {10 * _M32 // 100}
ORDER BY doc_id
"""


def sample_bottomk(sf_dir: str, k: int = 100) -> pd.DataFrame:
    """Fixed-size uniform sample: k smallest hash priorities. Each
    batch prunes to a local bottom-k; only k rows per block reach the
    driver merge."""

    def local_bottomk(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        pri = _mix(ids)
        if len(pri) > k:
            idx = np.argpartition(pri, k)[:k]
            batch = batch.take(pa.array(idx))
            pri = pri[idx]
        return batch.append_column("_pri", pa.array(pri))

    df = (
        read_table(sf_dir, "documents", columns=["doc_id", "lang"])
        .map_batches(local_bottomk, batch_format="pyarrow")
        .to_pandas()
    )
    df = ensure_columns(df, {"doc_id": "int64", "lang": "object", "_pri": "uint64"})
    df = df.nsmallest(k, "_pri").drop(columns=["_pri"])
    return df.sort_values("doc_id").reset_index(drop=True)


SAMPLE_BOTTOMK_SQL = f"""
SELECT doc_id, lang FROM documents
ORDER BY (CAST(doc_id AS HUGEINT) * {_KNUTH}) % {_M32} LIMIT 100
"""
# NOTE: the oracle comparator sorts rows, so the ORDER BY above only
# selects WHICH k rows survive (priorities are unique — no tie risk).


def sample_stratified(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Bottom-k per ``lang`` stratum: per-batch per-group prune, then a
    (groups × k × blocks)-row driver merge — never a corpus shuffle."""

    def local_prune(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        batch = batch.append_column("_pri", pa.array(_mix(ids)))
        t = batch.sort_by([("lang", "ascending"), ("_pri", "ascending")])
        langs = t["lang"].to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, langs[1:] != langs[:-1]])
        ends = np.r_[starts[1:], len(langs)]
        keep = np.concatenate(
            [np.arange(s, min(s + k, e)) for s, e in zip(starts, ends)]
        ) if len(starts) else np.array([], dtype=np.int64)
        return t.take(pa.array(keep))

    df = (
        read_table(sf_dir, "documents", columns=["doc_id", "lang"])
        .map_batches(local_prune, batch_format="pyarrow")
        .to_pandas()
    )
    df = ensure_columns(df, {"doc_id": "int64", "lang": "object", "_pri": "uint64"})
    # dropna=False: the twin's PARTITION BY lang keeps a NULL stratum —
    # pandas' default dropna silently discarded those rows while the
    # local prune forwarded them (review-found silent loss)
    df = (
        df.sort_values(["lang", "_pri"])
        .groupby("lang", sort=True, dropna=False)
        .head(k)
        .drop(columns=["_pri"])
    )
    return df.sort_values("doc_id").reset_index(drop=True)


SAMPLE_STRATIFIED_SQL = f"""
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang
                            ORDER BY (CAST(doc_id AS HUGEINT) * {_KNUTH}) % {_M32}) AS rn
  FROM documents
) WHERE rn <= 20
ORDER BY doc_id
"""


def mix_domains(sf_dir: str) -> pd.DataFrame:
    """Domain-mixture resampling: downsample each source domain so the
    kept corpus approaches target mixture weights — the domain
    reweighting step of pretraining data assembly (DoReMi-style fixed
    weights, here ``w_s = 1 + (source index mod 4)``).

    Two-phase plan: (1) a tiny ``groupby(source).count()`` (domain
    cardinality is small by assumption — sources, not documents);
    (2) the driver turns counts into EXACT integer acceptance
    thresholds ``min(M, w_s·N·M // (Σw·n_s))`` using Python big ints
    (no 64-bit overflow at any corpus size; the oracle mirrors it in
    HUGEINT), then a stateless hash-gated per-batch filter — the same
    deterministic, resumable gate as ``sample_bernoulli``. Nothing
    corpus-sized touches the driver."""

    counts = (
        read_table(sf_dir, "documents", columns=["source"])
        .groupby("source")
        .count()
        .to_pandas()
    )
    counts = ensure_columns(counts, {"source": "object", "count()": "int64"})
    # null-source convention, mirroring the twin exactly: the total
    # count INCLUDES null-source rows (tot = count(*)), the weight sum
    # EXCLUDES them (w is NULL there), and the rows themselves are
    # dropped (JOIN USING never matches NULL)
    n_total = int(counts["count()"].sum())
    counts = counts[counts["source"].notna()]
    weights = {
        s: 1 + int(s[3:]) % 4 for s in counts["source"]
    }  # src<i> → deterministic target weight
    sum_w = sum(weights.values())
    thresh = {
        s: min(
            _M32,
            (weights[s] * n_total * _M32) // (sum_w * int(n_s)),
        )
        for s, n_s in zip(counts["source"], counts["count()"])
    }

    def fn(batch: pa.Table) -> pa.Table:
        srcs = batch["source"]
        if isinstance(srcs, pa.ChunkedArray):
            srcs = srcs.combine_chunks()
        if srcs.null_count:  # twin excludes null-source rows
            import pyarrow.compute as _pc

            batch = batch.filter(_pc.is_valid(srcs))
            srcs = batch["source"]
            if isinstance(srcs, pa.ChunkedArray):
                srcs = srcs.combine_chunks()
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        # vectorized threshold gather: dictionary-encode the source
        # column (one lookup per DISTINCT source), then one np.take —
        # no per-row Python in the corpus-scale gate
        enc = srcs.dictionary_encode()
        per_code = np.fromiter(
            (thresh[s] for s in enc.dictionary.to_pylist()),
            dtype=np.uint64,
            count=len(enc.dictionary),
        )
        cut = per_code[enc.indices.to_numpy(zero_copy_only=False)]
        keep = _mix(ids) < cut
        return batch.filter(pa.array(keep))

    df = (
        read_table(sf_dir, "documents", columns=["doc_id", "source"])
        .map_batches(fn, batch_format="pyarrow")
        .to_pandas()
    )
    df = ensure_columns(df, {"doc_id": "int64", "source": "object"})
    return df.sort_values("doc_id").reset_index(drop=True)


MIX_DOMAINS_SQL = f"""
WITH cnt AS (SELECT source, count(*) AS n_s FROM documents GROUP BY source),
tot AS (SELECT count(*) AS n FROM documents),
wt AS (SELECT source, n_s,
              1 + CAST(substr(source, 4) AS BIGINT) % 4 AS w
       FROM cnt),
sw AS (SELECT sum(w) AS sum_w FROM wt),
th AS (SELECT source,
              least(CAST({_M32} AS HUGEINT),
                    (CAST(w AS HUGEINT) * n * {_M32}) // (sum_w * n_s)) AS thresh
       FROM wt, tot, sw)
SELECT d.doc_id, d.source
FROM documents d JOIN th USING (source)
WHERE (CAST(d.doc_id AS HUGEINT) * {_KNUTH}) % {_M32} < thresh
ORDER BY d.doc_id
"""


# ------------------------------------- token-budget domain mixing

_TOKBUD_NB = 32  # priority-range buckets per source (order-preserving)
_NULL_SRC = "\x00null"  # null-source sentinel (no real source starts \x00)


def mix_token_budget(sf_dir: str) -> pd.DataFrame:
    """Token-budget domain mixing: each source contributes documents in
    deterministic hash order until its TOKEN budget is filled — the
    budgeted variant of ``mix_domains`` (row-count thinning) and the
    shape pretraining mixes are actually specified in (token shares,
    not document shares). Budget ``B_s = w_s · (total_tokens // 4) //
    Σw`` with the same ``w_s = 1 + (source idx mod 4)`` weights; a doc
    is kept iff the summed tokens of the docs BEFORE it (hash order,
    doc_id tie-break) are < B_s — greedy prefix, so the budget may
    overshoot by at most one document, identically in both engines.

    Distributed ordered prefix sum, never a per-source global sort:
    (1) one tokenize pass emits (doc_id, source, n_tok, pri) with an
    order-preserving priority-range bucket ``pb = pri·NB // 2³²``;
    (2) per-(source, pb) token sums fold to ≤ sources·NB rows — the
    driver computes exact exclusive bucket offsets with Python ints;
    (3) one keyed exchange on (source, pb), each group does a local
    argsort + cumsum and keeps rows where offset + local_before < B_s.
    The ``pack_sequences`` prefix-sum pattern applied to selection."""
    import pyarrow.compute as pc

    def tok_stage(batch: pa.Table) -> pa.Table:
        texts = batch["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        toks = pc.utf8_split_whitespace(pc.fill_null(texts, ""))
        parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        keep = pc.greater(
            pc.utf8_length(toks.values), 0
        ).to_numpy(zero_copy_only=False)
        n = batch.num_rows
        n_tok = np.bincount(parents[keep], minlength=n).astype(np.int64)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        pri = _mix(ids)
        pb = ((pri * np.uint64(_TOKBUD_NB)) >> np.uint64(32)).astype(np.int32)
        # null sources ride as a sentinel (Ray's sort-based groupby
        # cannot order None among strings): their tokens count toward
        # the twin's grand total, they receive no budget, and select()
        # drops their rows — exactly the twin's NULL semantics
        src = pc.fill_null(batch["source"], _NULL_SRC)
        return pa.table(
            {
                "doc_id": pa.array(ids.astype(np.int64)),
                "source": src,
                "n_tok": pa.array(n_tok),
                "pri": pa.array(pri),
                "pb": pa.array(pb),
            }
        )

    rows = (
        read_table(sf_dir, "documents", columns=["doc_id", "source", "text"])
        .map_batches(tok_stage, batch_format="pyarrow")
        .materialize()
    )
    spec = {"doc_id": "int64", "source": "object", "n_tok": "int64"}
    # pass 1: per-(source, bucket) token sums → exact driver offsets
    from ray.data.aggregate import Sum

    bt = (
        rows.groupby(["source", "pb"])
        .aggregate(Sum("n_tok", alias_name="toks"))
        .to_pandas()
    )
    bt = ensure_columns(bt, {"source": "object", "pb": "int32", "toks": "int64"})
    if bt.empty:
        return ensure_columns(pd.DataFrame(), spec)
    per_src = bt.groupby("source")["toks"].sum()
    total = int(per_src.sum())  # includes the null-source sentinel
    real = [s for s in per_src.index if s != _NULL_SRC]
    weights = {s: 1 + int(s[3:]) % 4 for s in real}
    sum_w = sum(weights.values())
    budget = {s: weights[s] * (total // 4) // sum_w for s in real}
    bt = bt.sort_values(["source", "pb"])
    bt["before"] = (
        bt.groupby("source")["toks"].cumsum() - bt["toks"]
    )  # exclusive bucket offsets
    offset = {
        (s, int(b)): int(v)
        for s, b, v in zip(bt["source"], bt["pb"], bt["before"])
    }

    def select(part: pa.Table) -> pa.Table:
        src = part["source"][0].as_py()
        pb = int(part["pb"][0].as_py())
        off = offset[(src, pb)]
        bud = budget.get(src, 0)  # null-source sentinel → no budget
        if off >= bud:  # whole bucket past the budget
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "source": pa.array([], pa.string()),
                    "n_tok": pa.array([], pa.int64()),
                }
            )
        ids = part["doc_id"].to_numpy(zero_copy_only=False)
        pri = part["pri"].to_numpy(zero_copy_only=False)
        ntk = part["n_tok"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, pri))
        before = off + np.cumsum(ntk[order]) - ntk[order]
        kept = order[before < bud]
        return pa.table(
            {
                "doc_id": pa.array(ids[kept].astype(np.int64)),
                "source": pa.array(part["source"].take(pa.array(kept))),
                "n_tok": pa.array(ntk[kept].astype(np.int64)),
            }
        )

    df = (
        rows.groupby(["source", "pb"])
        .map_groups(select, batch_format="pyarrow")
        .to_pandas()
    )
    df = ensure_columns(df, spec)
    df["doc_id"] = df["doc_id"].astype("int64")
    df["n_tok"] = df["n_tok"].astype("int64")
    return df.sort_values("doc_id").reset_index(drop=True)


MIX_TOKEN_BUDGET_SQL = rf"""
WITH d AS (
  SELECT doc_id, source,
         coalesce(len(list_filter(regexp_split_to_array(text, '\s+'),
                                  x -> x <> '')), 0)::BIGINT AS n_tok
  FROM documents),
tot AS (SELECT source, sum(n_tok)::HUGEINT AS toks FROM d GROUP BY 1),
g AS (SELECT sum(toks) AS total FROM tot),
wt AS (SELECT source, (1 + CAST(substr(source, 4) AS BIGINT) % 4)::HUGEINT AS w
       FROM tot),
sw AS (SELECT sum(w) AS sum_w FROM wt),
b AS (SELECT wt.source,
             (wt.w * ((SELECT total FROM g) // 4) // (SELECT sum_w FROM sw))
               AS budget
      FROM wt),
r AS (SELECT d.*,
             coalesce(sum(n_tok) OVER (
               PARTITION BY d.source
               ORDER BY (CAST(doc_id AS HUGEINT) * {_KNUTH}) % {_M32}, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
      FROM d)
SELECT r.doc_id, r.source, r.n_tok
FROM r JOIN b ON b.source = r.source
WHERE r.before < b.budget
ORDER BY r.doc_id
"""


def sample_weighted(sf_dir: str, k: int = 100) -> pd.DataFrame:
    """Weighted bottom-k sample: priority ``mix(doc_id) // weight``
    (integer A-ES-style exponential-race approximation — heavier rows
    draw proportionally smaller priorities, so the bottom-k skews
    toward heavy rows while staying a mergeable per-block sketch).
    Weight = document length (``n_chars``): a byte-budgeted corpus
    sample. Deterministic and integer-exact — the oracle runs the
    same arithmetic."""

    def local_bottomk(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        w = np.maximum(batch["n_chars"].to_numpy(zero_copy_only=False), 1)
        pri = _mix(ids) // w.astype(np.uint64)
        if len(pri) > k:
            # deterministic local prune: ties keep the smallest doc_id
            # (matching the twin's ORDER BY pri, doc_id) — the //weight
            # compression CAN collide priorities, and argpartition kept
            # an arbitrary subset there (review-found layout dependence)
            idx = np.lexsort((ids, pri))[:k]
            batch = batch.take(pa.array(idx))
            pri = pri[idx]
        return batch.append_column("_pri", pa.array(pri))

    df = (
        read_table(sf_dir, "documents", columns=["doc_id", "n_chars"])
        .map_batches(local_bottomk, batch_format="pyarrow")
        .to_pandas()
    )
    df = ensure_columns(df, {"doc_id": "int64", "n_chars": "int64", "_pri": "uint64"})
    df = (
        df.sort_values(["_pri", "doc_id"]).head(k).drop(columns=["_pri"])
    )
    df["doc_id"] = df["doc_id"].astype("int64")
    df["n_chars"] = df["n_chars"].astype("int64")
    return df.sort_values("doc_id").reset_index(drop=True)


SAMPLE_WEIGHTED_SQL = f"""
SELECT doc_id, n_chars FROM documents
ORDER BY ((CAST(doc_id AS HUGEINT) * {_KNUTH}) % {_M32}) // greatest(n_chars, 1),
         doc_id
LIMIT 100
"""
# priorities CAN collide after the //weight compression; both sides
# break ties by doc_id, so the selected set is layout- and
# engine-invariant even when a tie straddles the k-boundary.


# ------------------------------------------- leakage-guarded split

TRAIN_PCT, VAL_PCT = 90, 95  # bucket < 90 → train, < 95 → val, else test


def split_by_group(sf_dir: str) -> pd.DataFrame:
    """Group-aware train/val/test split — the eval-contamination guard
    a training-data pipeline needs: assignment is a deterministic hash
    of the GROUP (``source``), not the document, so every document of a
    source lands in the same split and near-duplicate pages from one
    site can never straddle train and eval. (Doc-level splitting leaks:
    two near-dup pages of the same site end up one in train, one in
    test, and the benchmark measures memorization.)

    Scale shape: one corpus scan folds per-batch ``(source → docs,
    chars)`` cells with a pyarrow ``group_by``; the keyed combine moves
    only distinct-source cells (domains ≪ documents at any corpus
    size); the split decision runs once per distinct source. The hash
    is the first 8 hex digits of md5 — chosen over the engine's
    splitmix64 domain because DuckDB computes the identical value
    (``('0x' || substr(md5(s), 1, 8))::BIGINT``), making the twin
    hash-exact rather than rows-only.
    """
    import hashlib

    from ray.data.aggregate import Sum

    def cells(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        src = batch["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        t = pa.table({"source": src, "n_chars": batch["n_chars"]})
        if src.null_count:
            # the twin's JOIN USING(source) never matches NULL keys —
            # drop null-source rows instead of folding them into the
            # '' bucket (which also merged them with a REAL '' source;
            # review-found divergence)
            t = t.filter(pc.is_valid(src))
        g = t.group_by("source").aggregate([("n_chars", "sum"), ([], "count_all")])
        return pa.table(
            {
                "source": g["source"],
                "chars": g["n_chars_sum"],
                "docs": g["count_all"],
            }
        )

    df = (
        read_table(sf_dir, "documents", columns=["source", "n_chars"])
        .map_batches(cells, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("chars", alias_name="chars"), Sum("docs", alias_name="docs"))
        .to_pandas()
    )
    df = ensure_columns(df, {"source": "object", "chars": "int64", "docs": "int64"})
    buckets = np.array(
        [
            int(hashlib.md5(str(s).encode()).hexdigest()[:8], 16) % 100
            for s in df["source"]
        ],
        dtype=np.int64,
    )
    df["split"] = np.where(
        buckets < TRAIN_PCT, "train", np.where(buckets < VAL_PCT, "val", "test")
    )
    out = (
        df.groupby("split", as_index=False)
        .agg(
            n_docs=("docs", "sum"),
            n_sources=("source", "size"),
            total_chars=("chars", "sum"),
        )
        .astype({"n_docs": "int64", "n_sources": "int64", "total_chars": "int64"})
    )
    return out.sort_values("split").reset_index(drop=True)


SPLIT_BY_GROUP_SQL = f"""
WITH assign AS (
    SELECT source,
           CASE
               WHEN b < {TRAIN_PCT} THEN 'train'
               WHEN b < {VAL_PCT} THEN 'val'
               ELSE 'test'
           END AS split
    FROM (
        SELECT source,
               ('0x' || substr(md5(coalesce(source, '')), 1, 8))::BIGINT % 100 AS b
        FROM (SELECT DISTINCT source FROM documents)
    )
)
SELECT a.split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT d.source) AS BIGINT) AS n_sources,
       CAST(sum(d.n_chars) AS BIGINT) AS total_chars
FROM documents d JOIN assign a USING (source)
GROUP BY a.split
ORDER BY a.split
"""


# --------------------------------------- DSIR importance resampling

DSIR_BUCKETS = 8192  # hashed n-gram feature space
DSIR_ALPHA = 1.0  # add-α smoothing on both distributions
DSIR_KEEP_PCT = 25  # resample the top-quartile by importance
_DSIR_SAMPLE_K = 4096  # threshold sample (quantile_sketch posture)


def _dsir_flat_grams(texts) -> tuple[np.ndarray, np.ndarray]:
    """Batch → (flat bucket ids, per-gram DOC INDEX), both sorted by
    (doc, bucket): hashed unigrams + bigrams of whitespace-lowercased
    words — ALL C kernels (arrow lower/split for tokens, one
    take + binary_join for the bigram strings, one fnv64 per stream;
    the former per-document Python loop built every gram string in the
    interpreter across the two hottest dsir scans — review-found). The
    (doc, bucket) sort makes downstream float folds content-ordered
    (layout-invariant), the engine-wide determinism convention."""
    import pyarrow.compute as pc

    from ..functions.hashing import fnv64

    arr = (
        texts
        if isinstance(texts, (pa.Array, pa.ChunkedArray))
        else pa.array([t if t is not None else "" for t in texts], pa.string())
    )
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = pc.utf8_lower(pc.fill_null(arr, ""))
    toks = pc.utf8_split_whitespace(arr)
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    flat = toks.values
    keep = pc.greater(pc.utf8_length(flat), 0).to_numpy(zero_copy_only=False)
    if not keep.all():
        flat = flat.filter(pa.array(keep))
        parents = parents[keep]
    n = len(arr)
    if len(parents) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    lens = np.bincount(parents, minlength=n).astype(np.int64)
    offs = np.zeros(n + 1, np.int64)
    np.cumsum(lens, out=offs[1:])
    full = np.maximum(lens - 1, 0)
    row_of = np.repeat(np.arange(n, dtype=np.int64), full)
    within = np.arange(int(full.sum()), dtype=np.int64) - np.repeat(
        np.cumsum(full) - full, full
    )
    starts = offs[:-1][row_of] + within
    u_hash = fnv64(flat)
    if len(starts):
        bigr = pc.binary_join_element_wise(
            flat.take(pa.array(starts)),
            flat.take(pa.array(starts + 1)),
            pa.scalar(" "),
        )
        b_hash = fnv64(bigr)
    else:
        b_hash = np.empty(0, np.uint64)
    buckets = (
        np.concatenate([u_hash, b_hash]) % np.uint64(DSIR_BUCKETS)
    ).astype(np.int64)
    doc_idx = np.concatenate([parents, row_of]).astype(np.int64)
    order = np.lexsort((buckets, doc_idx))
    return buckets[order], doc_idx[order]


def dsir_select(sf_dir: str) -> pd.DataFrame:
    """DSIR — Data Selection with Importance Resampling (Xie et al.
    2023, arXiv:2302.03169, public): score every document by how much
    more likely its hashed-n-gram features are under a TARGET
    distribution than under the raw-corpus distribution, then keep the
    top ``DSIR_KEEP_PCT``%. Target here = the ``lang == 'en'`` slice (a
    stand-in for the curated target corpus a production run would
    supply as its own table).

    Two streaming scans — the paper's own shape:

    1. **Estimate**: per-batch bucket histograms for raw and target
       (one vectorized fnv64 over the batch's flattened grams; two
       ``np.add.at`` scatters), combined by a ``DSIR_BUCKETS``-row
       groupby — the shuffle moves ≤ 8192 × blocks cells, never text.
       The driver turns the two histograms into per-bucket log-ratios
       ``w_b = log((t_b+α)/Σt) − log((r_b+α)/Σr)`` (64 KB, broadcast).
    2. **Score + select**: per-doc importance = Σ w over its grams
       (gather + ``add.reduceat`` at doc offsets). The keep threshold
       is the exact (100−pct) order statistic of a deterministic
       bottom-k-by-``mix64(doc_id)`` score sample (the mergeable
       ``quantile_sketch`` posture — the paper itself thresholds
       stochastically via Gumbel noise; a sample quantile keeps the
       pass bounded and layout-independent).

    Rows-only (log-ratio floats aren't SQL-hash-reproducible); pytest
    pins an exact pandas reimplementation of both passes."""
    from ray.data.aggregate import Sum

    from ..functions.hashing import splitmix64

    def hist(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        langs = np.asarray(batch["lang"].to_pylist(), dtype=object)
        buckets, doc_idx = _dsir_flat_grams(texts)
        raw = np.zeros(DSIR_BUCKETS, np.int64)
        tgt = np.zeros(DSIR_BUCKETS, np.int64)
        np.add.at(raw, buckets, 1)
        is_tgt = (langs == "en")[doc_idx]
        np.add.at(tgt, buckets[is_tgt], 1)
        nz = np.flatnonzero(raw)
        return pa.table(
            {
                "bucket": pa.array(nz, pa.int64()),
                "raw_n": pa.array(raw[nz], pa.int64()),
                "tgt_n": pa.array(tgt[nz], pa.int64()),
            }
        )

    hdf = (
        read_table(sf_dir, "documents", columns=["text", "lang"])
        .map_batches(hist, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("raw_n", alias_name="raw_n"), Sum("tgt_n", alias_name="tgt_n"))
        .to_pandas()
    )
    hdf = ensure_columns(hdf, {"bucket": "int64", "raw_n": "int64", "tgt_n": "int64"})
    raw = np.full(DSIR_BUCKETS, 0, np.int64)
    tgt = np.full(DSIR_BUCKETS, 0, np.int64)
    raw[hdf["bucket"]] = hdf["raw_n"]
    tgt[hdf["bucket"]] = hdf["tgt_n"]
    w = np.log((tgt + DSIR_ALPHA) / max(tgt.sum(), 1)) - np.log(
        (raw + DSIR_ALPHA) / max(raw.sum(), 1)
    )

    import ray

    w_ref = ray.put(w)

    class Score:
        def __init__(self):
            self.w = ray.get(w_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            buckets, doc_idx = _dsir_flat_grams(batch["text"])
            scores = np.zeros(len(ids))
            if len(buckets):
                vals = self.w[buckets]
                # doc-contiguous stream (sorted by (doc, bucket) in the
                # gram kernel) → one reduceat; fold order is
                # content-determined, layout-invariant
                starts = np.flatnonzero(
                    np.r_[True, doc_idx[1:] != doc_idx[:-1]]
                )
                sums = np.add.reduceat(vals, starts)
                scores[doc_idx[starts]] = sums
            return pa.table(
                {
                    "doc_id": pa.array(ids),
                    "score_e6": pa.array(
                        np.round(scores * 1e6).astype(np.int64)
                    ),
                }
            )

    from .embedops import _task_stage

    scored = (
        read_table(sf_dir, "documents", columns=["doc_id", "text"])
        .map_batches(_task_stage(Score), batch_format="pyarrow")
        .to_pandas()
    )
    scored = ensure_columns(scored, {"doc_id": "int64", "score_e6": "int64"})
    if len(scored) == 0:
        scored["selected"] = pd.Series([], dtype="int64")
        return scored
    # deterministic sample quantile threshold (bottom-k by id hash)
    pri = splitmix64(scored["doc_id"].to_numpy().astype(np.uint64))
    k = min(_DSIR_SAMPLE_K, len(pri))
    sample = scored["score_e6"].to_numpy()[np.argsort(pri, kind="stable")[:k]]
    q = np.sort(sample)[max(int(np.ceil((100 - DSIR_KEEP_PCT) / 100 * k)) - 1, 0)]
    scored["selected"] = (scored["score_e6"] > q).astype("int64")
    for c in scored.columns:
        scored[c] = scored[c].astype("int64")
    return scored.sort_values("doc_id").reset_index(drop=True)
