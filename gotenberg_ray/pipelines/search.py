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


# ---- BM25 serving over a dl-carrying index -------------------------

BM25_K1 = 1.2
BM25_B = 0.75


def _explode_tf_dl(batch: pa.Table) -> pa.Table:
    """(doc_id, term, tf, dl) rows — ``_explode_tf`` plus the doc's
    token length denormalized onto every posting (the standard BM25
    index layout: length normalization needs dl AT THE POSTING, not a
    second corpus-sized join at query time)."""
    import pyarrow.compute as pc

    texts = batch["text"]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    toks = pc.utf8_split_whitespace(pc.fill_null(texts, ""))
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    flat = toks.values
    keep = pc.greater(pc.utf8_length(flat), 0).to_numpy(zero_copy_only=False)
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    dl = np.bincount(parents[keep], minlength=batch.num_rows).astype(np.int64)
    import pandas as _pd

    df = _pd.DataFrame(
        {"doc_id": ids[parents[keep]], "term": flat.filter(pa.array(keep)),
         "dl": dl[parents[keep]]}
    )
    c = df.groupby(["doc_id", "term"], sort=False).agg(
        tf=("dl", "size"), dl=("dl", "first")
    ).reset_index()
    return pa.table(
        {
            "doc_id": pa.array(c["doc_id"].to_numpy(), pa.int64()),
            "term": pa.array(c["term"], pa.string()),
            "tf": pa.array(c["tf"].to_numpy(), pa.int64()),
            "dl": pa.array(c["dl"].to_numpy(), pa.int64()),
        }
    )


def _bm25_index_path(sf_dir: str) -> str:
    from ..io import scratch_layout_path

    return scratch_layout_path("bm25index", sf_dir, "documents")


def build_bm25_index(sf_dir: str) -> str:
    """dl-carrying term-partitioned postings (idempotent sink), plus a
    ``_STATS.json`` holding the two corpus scalars BM25 needs at query
    time (``n_docs``, ``total_tokens`` → avgdl). Persisting them HERE
    keeps the serving posture honest: a lookup reads only the query
    terms' probed buckets + one tiny stats file — never the corpus.
    The stats write is atomic (tmp + rename) and keyed to the same
    corpus-identity directory as the postings, so a regenerated corpus
    invalidates both together; a resume run that finds the stats file
    missing (killed between sink and stats) recomputes just the
    aggregate, not the complete buckets."""
    import json

    from ..io import table_rows

    path = _bm25_index_path(sf_dir)
    ds = read_table(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        _explode_tf_dl, batch_format="pyarrow"
    )
    write_partitioned(ds, path, key="term", num_partitions=INDEX_P)
    stats_path = os.path.join(path, "_STATS.json")
    if not os.path.exists(stats_path):
        from .packing import _token_counts

        n_docs = table_rows(sf_dir, "documents")
        total_tokens = (
            read_table(sf_dir, "documents", ["doc_id", "text"])
            .map_batches(
                lambda b: pa.table({"n": pa.array(_token_counts(b))}),
                batch_format="pyarrow",
            )
            .sum("n")
            or 0
        ) if n_docs else 0
        tmp = stats_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"n_docs": int(n_docs), "total_tokens": int(total_tokens)}, f)
        os.replace(tmp, stats_path)
    return path


def _bm25_stats(path: str) -> tuple[int, int]:
    import json

    with open(os.path.join(path, "_STATS.json")) as f:
        s = json.load(f)
    return int(s["n_docs"]), int(s["total_tokens"])


def search_bm25(sf_dir: str, k: int = TOP_K) -> pd.DataFrame:
    """Okapi BM25 top-k for the fixed query — the idf + length-norm
    upgrade of ``search_topk``, still reading ONLY the query terms'
    index buckets. Because the index is term-partitioned, each probed
    bucket computes its terms' df LOCALLY (local == global by
    construction — no df exchange), scores its postings, and only
    per-doc float contributions move through the doc-keyed combine.
    Corpus stats (n_docs, total_tokens → avgdl) come from the index's
    ``_STATS.json``, persisted at build time — a query touches ONLY
    probed buckets + that stats file, never the corpus. The twin
    hashes (rank, doc_id) — the float-ranking convention (ln/÷
    bit-parity is not assumed; ordering is)."""
    import ray.data as rd

    path = build_bm25_index(sf_dir)
    n_docs, total_tokens = _bm25_stats(path)
    if n_docs == 0:
        return pd.DataFrame(
            {"rank": pd.Series([], dtype="int64"),
             "doc_id": pd.Series([], dtype="int64")}
        )
    avgdl = max(total_tokens / n_docs, 1e-9)
    files = [
        os.path.join(path, f"bucket-{b}", "part.parquet")
        for b in _query_buckets(QUERY_TERMS)
        if os.path.exists(os.path.join(path, f"bucket-{b}", "part.parquet"))
    ]
    if not files:
        return pd.DataFrame(
            {"rank": pd.Series([], dtype="int64"),
             "doc_id": pd.Series([], dtype="int64")}
        )
    terms = list(QUERY_TERMS)

    # pass 1 over the probed buckets (postings are query-bounded): df
    # per query term. Folded as per-batch partial counts so the result
    # is exact however Ray blocks the bucket files.
    def df_partial(batch: pa.Table) -> pa.Table:
        t = batch["term"].to_pandas().to_numpy()
        keep = np.isin(t, terms)
        uniq, counts = np.unique(t[keep], return_counts=True)
        return pa.table(
            {"term": pa.array(uniq.astype(object), pa.string()),
             "n": pa.array(counts.astype(np.int64))}
        )

    from ray.data.aggregate import Sum as _Sum

    df_rows = (
        rd.read_parquet(files)
        .map_batches(df_partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(_Sum("n", alias_name="df"))
        .to_pandas()
    )
    df_map = dict(zip(df_rows.get("term", []), df_rows.get("df", [])))
    idf_map = {
        t: float(np.log((n_docs - d + 0.5) / (d + 0.5) + 1.0))
        for t, d in df_map.items()
    }

    # fixed query-term codes so the per-doc fold can order
    # contributions by CONTENT (doc_id, term) — see fold_top
    tcode_map = {t: i for i, t in enumerate(sorted(terms))}

    def score(batch: pa.Table) -> pa.Table:
        t = batch["term"].to_pandas().to_numpy()
        keep = np.isin(t, terms)
        if not keep.any():
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "tcode": pa.array([], pa.int64()),
                 "contrib": pa.array([], pa.float64())}
            )
        t = t[keep]
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)[keep]
        tf = batch["tf"].to_numpy(zero_copy_only=False)[keep].astype(np.float64)
        dl = batch["dl"].to_numpy(zero_copy_only=False)[keep].astype(np.float64)
        idf = np.asarray([idf_map[x] for x in t], dtype=np.float64)
        tcode = np.asarray([tcode_map[x] for x in t], dtype=np.int64)
        denom = tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl)
        contrib = idf * tf * (BM25_K1 + 1.0) / denom
        return pa.table(
            {"doc_id": pa.array(ids), "tcode": pa.array(tcode),
             "contrib": pa.array(contrib)}
        )

    def fold_top(part: pa.Table) -> pa.Table:
        ids = part["doc_id"].to_numpy(zero_copy_only=False)
        tc = part["tcode"].to_numpy(zero_copy_only=False)
        c = part["contrib"].to_numpy(zero_copy_only=False)
        # (doc_id, term) sort → each doc's float fold happens in a
        # content-determined order, whatever block layout the shuffle
        # delivered — layout-invariant ranking (the same contract the
        # maxsim exact-max partials give for free; a sum of floats
        # needs the explicit order)
        order = np.lexsort((tc, ids))
        ids, c = ids[order], c[order]
        starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
        totals = np.add.reduceat(c, starts)
        gids = ids[starts]
        top = np.lexsort((gids, -totals))[:k]
        return pa.table(
            {"doc_id": pa.array(gids[top]), "score": pa.array(totals[top])}
        )

    # one file per posting bucket: score tasks see whole posting lists
    cands = (
        rd.read_parquet(files)
        .map_batches(score, batch_format="pyarrow")
        .groupby("doc_id", num_partitions=8)
        .map_groups(fold_top, batch_format="pyarrow")
        .to_pandas()
    )
    cands = ensure_columns(cands, {"doc_id": "int64", "score": "float64"})
    cands = (
        cands.sort_values(["score", "doc_id"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    return pd.DataFrame(
        {
            "rank": np.arange(1, len(cands) + 1, dtype=np.int64),
            "doc_id": cands["doc_id"].astype("int64"),
        }
    )


SEARCH_BM25_SQL = f"""
WITH w AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(text, '\\s+'),
                            t -> t <> '')) AS term
  FROM documents),
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM w GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
         (SELECT count(*) FROM w)::DOUBLE
           / (SELECT count(*) FROM documents) AS avgdl),
tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf
  FROM w WHERE term IN {QUERY_TERMS!r}
  GROUP BY doc_id, term),
df AS (
  SELECT term, count(DISTINCT doc_id)::DOUBLE AS df
  FROM w WHERE term IN {QUERY_TERMS!r}
  GROUP BY term),
s AS (
  SELECT tf.doc_id,
         sum(ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
             * tf.tf * ({BM25_K1} + 1.0)
             / (tf.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * dl.dl / stats.avgdl))
         ) AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id), stats
  GROUP BY tf.doc_id)
SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
       doc_id
FROM s ORDER BY rank LIMIT {TOP_K}
"""
