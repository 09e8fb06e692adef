"""Text-corpus operators over the ``documents`` table: token counting,
quality scoring, language-ID, fingerprinting, and the dedup family
(exact, MinHash+LSH, SimHash, n-gram Jaccard).

Dedup shapes follow the guide's prescription: content-hash in a
vectorized ``map_batches`` → hash-keyed groupby for exact dedup;
shingle→minhash→band-explode→``groupby(band)`` → candidate pairs →
exact-Jaccard verification for near-dup. Pair generation happens inside
per-band groups (each band bucket is small); candidate verification is
a second vectorized stage.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Count, Sum

from .. import spans as S
from ..functions import textkit as T
from ..functions.hashing import (
    fnv64,
    hamming64,
    minhash_signature,
    shingle_hashes,
    simhash64,
)
from ..schemas import KIND_TEXT, make_span


def _docs(sf_dir: str, columns=None) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


# ----------------------------------------------------------------- analysis


def doc_stats_by_lang(sf_dir: str) -> pd.DataFrame:
    ds = _docs(sf_dir, ["lang", "n_chars"])
    df = (
        ds.groupby("lang")
        .aggregate(Count(alias_name="n_docs"), Sum("n_chars", alias_name="sum_chars"))
        .to_pandas()
    )
    # exact integer-scaled average (no float round ties vs the oracle)
    df["sum_chars"] = df["sum_chars"].astype("int64")
    df["avg_chars_e4"] = (df["sum_chars"] * 10000) // df["n_docs"]
    return df.sort_values("lang").reset_index(drop=True)


DOC_STATS_SQL = """
SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       (CAST(sum(n_chars) AS BIGINT) * 10000) // count(*) AS avg_chars_e4
FROM documents GROUP BY lang ORDER BY lang
"""


def doc_token_counts(sf_dir: str) -> pd.DataFrame:
    def fn(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(T.token_counts(batch["text"].to_pylist())),
            }
        )

    df = _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow").to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


DOC_TOKENS_SQL = """
SELECT doc_id,
       CASE WHEN trim(text) = '' THEN 0
            ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens
FROM documents ORDER BY doc_id
"""


def doc_quality(sf_dir: str) -> pd.DataFrame:
    def fn(batch: pa.Table) -> pa.Table:
        feats = T.quality_features(batch["text"].to_pylist())
        return pa.table({"doc_id": batch["doc_id"], **{k: pa.array(v) for k, v in feats.items()}})

    df = _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow").to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


DOC_QUALITY_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN []::VARCHAR[]
              ELSE string_split_regex(trim(text), '\\s+') END AS t
  FROM documents
)
SELECT doc_id, len(t) AS n_tokens,
       CASE WHEN len(t) = 0 THEN 0
            ELSE CAST(10000 * list_aggregate(list_transform(t, x -> len(x)), 'sum')
                      AS BIGINT) // len(t)
       END AS avg_token_len_e4,
       CASE WHEN len(t) = 0 THEN 0
            ELSE CAST(10000 * len(list_filter(t, x -> x IN {tuple(T.STOPWORDS)}))
                      AS BIGINT) // len(t)
       END AS stopword_ratio_e4
FROM toks ORDER BY doc_id
"""


def lang_id_confusion(sf_dir: str) -> pd.DataFrame:
    """Heuristic language-ID vs the labeled lang column (no SQL oracle
    — the classifier isn't SQL-expressible)."""

    def fn(batch: pa.Table) -> pa.Table:
        pred = T.predict_lang(batch["text"].to_pylist())
        return pa.table({"lang": batch["lang"], "predicted": pa.array(pred, pa.string())})

    df = (
        _docs(sf_dir, ["text", "lang"])
        .map_batches(fn, batch_format="pyarrow")
        .groupby(["lang", "predicted"])
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    return df.sort_values(["lang", "predicted"]).reset_index(drop=True)


def doc_fingerprints(sf_dir: str) -> pd.DataFrame:
    def fn(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "fingerprint": pa.array(T.fingerprint(batch["text"].to_pylist())),
            }
        )

    df = _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow").to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


# -------------------------------------------------------------------- dedup


def dedup_exact(sf_dir: str) -> pd.DataFrame:
    """Exact dedup: content hash per batch → hash-partitioned groupby →
    keep the min doc_id per group. At corpus scale the string column
    never shuffles — only (hash, doc_id) pairs do."""

    def hash_stage(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "h": pa.array(fnv64(batch["text"].to_pylist())),
            }
        )

    from ray.data.aggregate import Min

    df = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(hash_stage, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Min("doc_id", alias_name="keep_id"))
        .to_pandas()
    )
    return (
        pd.DataFrame({"doc_id": sorted(df["keep_id"])})
        .reset_index(drop=True)
    )


DEDUP_EXACT_SQL = """
SELECT min(doc_id) AS doc_id FROM documents GROUP BY text ORDER BY doc_id
"""


MINHASH_PERMS = 64
LSH_BANDS = 16  # 16 bands × 4 rows


def dedup_minhash(sf_dir: str, jaccard_threshold: float = 0.5) -> pd.DataFrame:
    """MinHash+LSH near-dup: shingle→signature per batch, explode to
    (band, band_hash) rows, groupby band-bucket → candidate pairs,
    verify with exact n-gram Jaccard. No SQL oracle (sketch-based)."""
    rows_per_band = MINHASH_PERMS // LSH_BANDS

    def sig_stage(batch: pa.Table) -> pa.Table:
        ids, bands, bhashes = [], [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            sh = shingle_hashes((text or "").split(), n=3)
            sig = minhash_signature(sh, MINHASH_PERMS)
            for b in range(LSH_BANDS):
                chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
                ids.append(doc_id)
                bands.append(b)
                bhashes.append(int(fnv64([" ".join(map(str, chunk))])[0]))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "band": pa.array(bands, pa.int32()),
                "band_hash": pa.array(np.array(bhashes, dtype=np.uint64)),
            }
        )

    def pairs_of(group: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(group["doc_id"]))
        out = [(a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]]
        if not out:
            return pd.DataFrame({"a_id": pd.Series([], dtype="int64"), "b_id": pd.Series([], dtype="int64")})
        return pd.DataFrame(out, columns=["a_id", "b_id"])

    cands = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(sig_stage, batch_format="pyarrow")
        .groupby(["band", "band_hash"])
        .map_groups(pairs_of, batch_format="pandas")
        .to_pandas()
        .drop_duplicates()
    )
    if cands.empty:
        return pd.DataFrame(
            {"a_id": pd.Series([], dtype="int64"), "b_id": pd.Series([], dtype="int64"),
             "jaccard": pd.Series([], dtype="float64")}
        )
    # verify candidates with exact word-3-gram jaccard (small set)
    texts = (
        _docs(sf_dir, ["doc_id", "text"]).to_pandas().set_index("doc_id")["text"].to_dict()
    )
    rows = []
    for a, b in cands.itertuples(index=False):
        j = T.jaccard(T.word_ngrams(texts[a], 3), T.word_ngrams(texts[b], 3))
        if j >= jaccard_threshold:
            rows.append((a, b, round(j, 4)))
    return pd.DataFrame(rows, columns=["a_id", "b_id", "jaccard"]).sort_values(
        ["a_id", "b_id"]
    ).reset_index(drop=True) if rows else pd.DataFrame(
        {"a_id": pd.Series([], dtype="int64"), "b_id": pd.Series([], dtype="int64"),
         "jaccard": pd.Series([], dtype="float64")}
    )


def dedup_simhash(sf_dir: str, max_hamming: int = 10) -> pd.DataFrame:
    """SimHash near-dup: 64-bit signatures per batch, then pairwise
    hamming within 16-bit prefix buckets (the bucketing is the scale
    path — only same-prefix pairs are compared). No SQL oracle."""

    def sig_stage(batch: pa.Table) -> pa.Table:
        sigs = []
        for text in batch["text"].to_pylist():
            toks = (text or "").split()
            sigs.append(simhash64(fnv64(toks)) if toks else 0)
        sigs = np.array(sigs, dtype=np.uint64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "sig": pa.array(sigs),
                "bucket": pa.array((sigs >> np.uint64(48)).astype(np.int64)),
            }
        )

    def pairs_of(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        sigs = g["sig"].to_numpy().astype(np.uint64)
        rows = []
        for i in range(len(ids)):
            d = hamming64(sigs[i + 1 :], int(sigs[i]))
            for off in np.nonzero(d <= max_hamming)[0]:
                rows.append((int(ids[i]), int(ids[i + 1 + off]), int(d[off])))
        if not rows:
            return pd.DataFrame(
                {"a_id": pd.Series([], dtype="int64"), "b_id": pd.Series([], dtype="int64"),
                 "hamming": pd.Series([], dtype="int64")}
            )
        return pd.DataFrame(rows, columns=["a_id", "b_id", "hamming"])

    df = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(sig_stage, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pairs_of, batch_format="pandas")
        .to_pandas()
    )
    return df.sort_values(["a_id", "b_id"]).reset_index(drop=True)


def dedup_ngram_jaccard(sf_dir: str, threshold: float = 0.3) -> pd.DataFrame:
    """Brute-force n-gram Jaccard pairs ≥ threshold — the exact baseline
    the sketch methods approximate. Pairwise within hash-salted blocks
    via a broadcast of the (small) shingle-set list. No SQL oracle."""
    pdf = _docs(sf_dir, ["doc_id", "text"]).to_pandas().sort_values("doc_id")
    ids = pdf["doc_id"].to_numpy()
    grams = [T.word_ngrams(t, 3) for t in pdf["text"]]
    rows = []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            jac = T.jaccard(grams[i], grams[j])
            if jac >= threshold:
                rows.append((int(ids[i]), int(ids[j]), round(jac, 4)))
    if not rows:
        return pd.DataFrame(
            {"a_id": pd.Series([], dtype="int64"), "b_id": pd.Series([], dtype="int64"),
             "jaccard": pd.Series([], dtype="float64")}
        )
    return pd.DataFrame(rows, columns=["a_id", "b_id", "jaccard"])


# ------------------------------------------------- span-pipeline round trip


TOKENS_PER_PAGE = 40
SPLIT_EVERY = 2


def convert_page_counts(sf_dir: str) -> pd.DataFrame:
    """End-to-end span algebra with an ARITHMETIC oracle: build span
    pages of 40 tokens from each document, run the real intervals-2
    split, report page/part counts. The SQL twin computes the closed
    form, so the whole build→split path is value-checked."""

    def fn(batch: pa.Table) -> pa.Table:
        pcs, nparts = [], []
        for text in batch["text"].to_pylist():
            toks = (text or "").split()
            pages = [
                [make_span(KIND_TEXT, text=" ".join(toks[i : i + TOKENS_PER_PAGE]))]
                for i in range(0, len(toks), TOKENS_PER_PAGE)
            ] or [[make_span(KIND_TEXT, text="")]]
            spans = S.join_pages(pages)
            parts = S.split_spans(spans, S.SPLIT_INTERVALS, str(SPLIT_EVERY))
            pcs.append(S.page_count(spans))
            nparts.append(len(parts))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "page_count": pa.array(pcs, pa.int64()),
                "n_parts": pa.array(nparts, pa.int64()),
            }
        )

    df = _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow").to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


CONVERT_PAGES_SQL = f"""
WITH t AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens
  FROM documents
)
SELECT doc_id,
       greatest(1, CAST(ceil(n_tokens / {TOKENS_PER_PAGE}.0) AS BIGINT)) AS page_count,
       CAST(ceil(greatest(1, CAST(ceil(n_tokens / {TOKENS_PER_PAGE}.0) AS BIGINT)) / {SPLIT_EVERY}.0) AS BIGINT) AS n_parts
FROM t ORDER BY doc_id
"""
