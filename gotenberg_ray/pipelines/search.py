"""Inverted-index build + pruned query lookup — the retrieval-serving
shape: one distributed pass builds term-partitioned posting lists
through the resumable bucket sink, and a query then opens ONLY the
buckets its terms hash to (index-side pruning, the lexical analogue of
the z-order rectangle scan in ``layout.py``).

Scale story: the posting-list build is the ``tfidf`` explode pass plus
one keyed exchange (the sink's bucket shuffle) — amortized across
every later query. A lookup touches |query| buckets out of P
regardless of corpus size; ranking folds per-doc partials through a
doc-keyed groupby and a global (score, doc) sort+limit, so nothing
corpus-sized reaches the driver.

Reference parity: the reference engine has no search tier; this covers
the SURVEY §2 "similarity search" family's lexical sibling (BM25-style
serving minus the float idf, which ``tfidf_top_terms`` owns).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ray.data.aggregate import Sum

from ..functions.frames import ensure_columns
from ..io import read_table, write_partitioned
from .tfidf import _explode_tf

QUERY_TERMS = ("join", "hash", "merge")  # fixed demo query
INDEX_P = 32
TOP_K = 10


def _index_path(sf_dir: str) -> str:
    """Index directory keyed by the CORPUS IDENTITY (path+size+mtime
    via ``io.scratch_layout_path``) — same-basename corpora get
    distinct indexes and an in-place regeneration invalidates the old
    postings instead of silently reusing them."""
    from ..io import scratch_layout_path

    return scratch_layout_path("index", sf_dir, "documents")


def build_index(sf_dir: str) -> str:
    """Build (idempotent — complete buckets are skipped on re-run)."""
    path = _index_path(sf_dir)
    ds = read_table(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        _explode_tf, batch_format="pyarrow"
    )
    write_partitioned(ds, path, key="term", num_partitions=INDEX_P)
    return path


def _query_buckets(terms: tuple[str, ...]) -> list[int]:
    from .joins import partition_ids

    pids = partition_ids(pa.array(list(terms), pa.string()), INDEX_P)
    return sorted(set(pids.to_numpy(zero_copy_only=False).tolist()))


def search_topk(sf_dir: str) -> pd.DataFrame:
    """Top-``TOP_K`` documents for the fixed query by summed term
    frequency (ties → lower doc_id), reading only the query terms'
    index buckets."""
    import ray.data as rd

    path = build_index(sf_dir)
    files = [
        os.path.join(path, f"bucket-{b}", "part.parquet")
        for b in _query_buckets(QUERY_TERMS)
        if os.path.exists(os.path.join(path, f"bucket-{b}", "part.parquet"))
    ]
    if not files:
        return pd.DataFrame(
            {
                "rank": pd.Series([], dtype="int64"),
                "doc_id": pd.Series([], dtype="int64"),
                "total_tf": pd.Series([], dtype="int64"),
                "n_terms": pd.Series([], dtype="int64"),
            }
        )
    terms = set(QUERY_TERMS)

    def probe(batch: pa.Table) -> pa.Table:
        keep = np.isin(batch["term"].to_pandas().to_numpy(), list(terms))
        b = batch.filter(pa.array(keep))
        # (doc, term) rows are already exact tf's (a doc's text lives
        # in one row), so only per-doc folding remains
        t = pa.table(
            {
                "doc_id": b["doc_id"],
                "total_tf": b["tf"],
                "n_terms": pa.array(np.ones(b.num_rows, np.int64)),
            }
        )
        return (
            t.group_by("doc_id")
            .aggregate([("total_tf", "sum"), ("n_terms", "sum")])
            .rename_columns(["doc_id", "total_tf", "n_terms"])
        )

    def local_top(batch: pa.Table) -> pa.Table:
        # the doc-keyed groupby upstream made each doc's fold complete
        # and partition-local, so the global top-K is the merge of the
        # per-block top-Ks — no global sort exchange; ≤ K·blocks rows
        # (not the corpus) reach the driver
        if batch.num_rows == 0 or "doc_id" not in batch.column_names:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "total_tf": pa.array([], pa.int64()),
                    "n_terms": pa.array([], pa.int64()),
                }
            )
        return batch.sort_by(
            [("total_tf", "descending"), ("doc_id", "ascending")]
        ).slice(0, TOP_K)

    df = (
        rd.read_parquet(files)
        .map_batches(probe, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(
            Sum("total_tf", alias_name="total_tf"),
            Sum("n_terms", alias_name="n_terms"),
        )
        .map_batches(local_top, batch_format="pyarrow")
        .to_pandas()
    )
    df = ensure_columns(
        df,
        {"doc_id": "int64", "total_tf": "int64", "n_terms": "int64"},
    )
    df = (
        df.sort_values(["total_tf", "doc_id"], ascending=[False, True])
        .head(TOP_K)
        .reset_index(drop=True)
    )
    df.insert(0, "rank", np.arange(1, len(df) + 1, dtype=np.int64))
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df


SEARCH_SQL = f"""
WITH w AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(text, '\\s+'),
                            t -> t <> '')) AS term
  FROM documents),
tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM w WHERE term IN {QUERY_TERMS!r}
  GROUP BY doc_id, term),
a AS (
  SELECT doc_id, sum(tf)::BIGINT AS total_tf, count(*)::BIGINT AS n_terms
  FROM tf GROUP BY doc_id),
r AS (
  SELECT doc_id, total_tf, n_terms,
         CAST(row_number() OVER (ORDER BY total_tf DESC, doc_id)
              AS BIGINT) AS rank
  FROM a)
SELECT rank, doc_id, total_tf, n_terms FROM r
WHERE rank <= {TOP_K} ORDER BY rank
"""
