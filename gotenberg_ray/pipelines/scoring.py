"""Corpus-trained language-model quality scoring.

The CCNet/KenLM pattern (public): train a small LM on the corpus (or
a reference corpus), score every document, and filter on the score.
Here the model is a bigram token LM trained on the SAME corpus in one
distributed counting pass, and the score is an integer-exact
perplexity analogue so the DuckDB twin matches bit-for-bit:

    score_e6(doc) = Σ_{adjacent (a,b) in doc} ⌊10⁶ · c(a,b) / c₁(a)⌋

where ``c(a,b)`` is the corpus count of the adjacent pair and
``c₁(a)`` the count of ``a`` in pair-first position (so conditional
probabilities normalize). Per-occurrence floor division keeps the sum
associative — any block layout folds to the same integer.

Distributed shape (two passes, the broadcast-model pattern):
1. TRAIN — per batch: tokenize, emit adjacent-pair partial counts
   (pyarrow group_by combiner), one global (a,b) groupby; unigram
   counts fold from the pair counts (model-sized, not corpus-sized).
2. SCORE — the model broadcasts once via ``ray.put`` as THREE sorted
   numpy arrays (vocab, per-vocab first-position counts, pair keys
   ``a_id·V + b_id`` with aligned counts); a second streaming pass
   scores each batch with searchsorted + bincount only — zero
   per-pair Python. The corpus is never collected; the model is the
   only driver-held object, exactly as a KenLM binary would be.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data.aggregate import Sum

from ..functions.frames import ensure_columns
from ..functions.segments import bincount_i64

SCALE = 1_000_000


def _docs(sf_dir: str):
    from ..io import read_table

    return read_table(sf_dir, "documents", ["doc_id", "text"])


def _batch_token_stream(
    batch: pa.Table,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All tokens of the batch as one object array + per-token doc
    index + per-doc token counts."""
    toks_per_doc = [
        (t or "").split(" ")  # null text ≡ "" (null-sweep convention)
        for t in batch["text"].to_pylist()
    ]
    counts = np.array([len(t) for t in toks_per_doc], np.int64)
    flat = np.array(
        [tok for toks in toks_per_doc for tok in toks], dtype=object
    )
    doc_ix = np.repeat(np.arange(len(toks_per_doc)), counts)
    return flat, doc_ix, counts


def _pair_partials(batch: pa.Table) -> pa.Table:
    """Per-batch adjacent-pair partial counts (combiner)."""
    flat, doc_ix, _ = _batch_token_stream(batch)
    if len(flat) == 0:
        return pa.table(
            {
                "a": pa.array([], pa.string()),
                "b": pa.array([], pa.string()),
                "c": pa.array([], pa.int64()),
            }
        )
    same_doc = doc_ix[1:] == doc_ix[:-1]
    t = pa.table(
        {
            "a": pa.array(flat[:-1][same_doc], pa.string()),
            "b": pa.array(flat[1:][same_doc], pa.string()),
            "c": pa.array(np.ones(int(same_doc.sum()), np.int64)),
        }
    )
    g = t.group_by(["a", "b"]).aggregate([("c", "sum")])
    return g.rename_columns(["a", "b", "c"])


def _train_bigram(sf_dir: str):
    """ONE distributed counting pass → sorted-array model:
    (vocab, uni_counts, pair_keys, pair_counts). Model-sized."""
    pairs = (
        _docs(sf_dir)
        .map_batches(_pair_partials, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    pairs = ensure_columns(pairs, {"a": "object", "b": "object", "c": "int64"})
    if pairs.empty:
        return None
    vocab = np.array(
        sorted(set(pairs["a"]).union(pairs["b"])), dtype=object
    )
    a_id = np.searchsorted(vocab, pairs["a"].to_numpy())
    b_id = np.searchsorted(vocab, pairs["b"].to_numpy())
    v = len(vocab)
    keys = a_id * v + b_id
    order = np.argsort(keys)
    pair_keys = keys[order]
    pair_counts = pairs["c"].to_numpy()[order].astype(np.int64)
    uni_counts = bincount_i64(a_id, pairs["c"].to_numpy(), minlength=v)
    return vocab, uni_counts, pair_keys, pair_counts


def doc_lm_score(sf_dir: str) -> pd.DataFrame:
    """Score every document under the corpus-trained bigram LM.
    Returns (doc_id, n_pairs, score_e6) — higher = more typical text;
    the filter a production curation pass would apply is a straight
    predicate on ``score_e6 // n_pairs``."""
    model = _train_bigram(sf_dir)
    if model is None:
        # corpus with no bigram anywhere (all docs empty / one-token):
        # every doc still scores — zero pairs, zero score — matching
        # the twin's totality (hostile_sweep caught the old empty-frame
        # convention diverging on exactly this corpus)
        from ..io import read_table

        frame = ensure_columns(
            read_table(sf_dir, "documents", ["doc_id"]).to_pandas(),
            {"doc_id": "int64"},
        )
        ids = frame["doc_id"].sort_values().reset_index(drop=True)
        return pd.DataFrame(
            {
                "doc_id": ids,
                "n_pairs": np.zeros(len(ids), np.int64),
                "score_e6": np.zeros(len(ids), np.int64),
            }
        )
    model_ref = ray.put(model)

    class Scorer:
        def __init__(self):
            self.vocab, self.uni, self.pair_keys, self.pair_counts = ray.get(
                model_ref
            )
            # the C hashtable builds ONCE per actor, not per batch
            self.vocab_index = pd.Index(self.vocab)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            flat, doc_ix, counts = _batch_token_stream(batch)
            n_docs = len(ids)
            if len(flat) == 0:
                return pa.table(
                    {
                        "doc_id": pa.array(ids),
                        "n_pairs": pa.array(np.zeros(n_docs, np.int64)),
                        "score_e6": pa.array(np.zeros(n_docs, np.int64)),
                    }
                )
            # hash-based lookup (C hashtable) beats per-string binary
            # search; tokens absent from the model (-1) can only come
            # from single-token docs, which contribute no pairs
            tok_id = self.vocab_index.get_indexer(flat)
            same_doc = doc_ix[1:] == doc_ix[:-1]
            v = len(self.vocab)
            a_id = tok_id[:-1][same_doc]
            keys = a_id * v + tok_id[1:][same_doc]
            slot = np.searchsorted(self.pair_keys, keys)
            per_pair = SCALE * self.pair_counts[slot] // self.uni[a_id]
            pair_doc = doc_ix[:-1][same_doc]
            # float64 fold is exact here: integer weights, partial sums
            # < 2^53 by construction (≤1e6 per pair × pairs per block)
            score = np.bincount(
                pair_doc, weights=per_pair, minlength=n_docs
            ).astype(np.int64)
            n_pairs = np.bincount(pair_doc, minlength=n_docs).astype(np.int64)
            return pa.table(
                {
                    "doc_id": pa.array(ids),
                    "n_pairs": pa.array(n_pairs),
                    "score_e6": pa.array(score),
                }
            )

    df = (
        _docs(sf_dir)
        .map_batches(Scorer, batch_format="pyarrow", concurrency=2)
        .to_pandas()
    )
    df = ensure_columns(
        df, {"doc_id": "int64", "n_pairs": "int64", "score_e6": "int64"}
    )
    return df.sort_values("doc_id").reset_index(drop=True)


# NOTE the LEFT JOIN-free shape is safe: every (a,b) of every doc is
# in the model because the model trained on the same corpus. Docs with
# zero pairs (single-token) would drop from the SQL side, so the twin
# re-attaches them with a LEFT JOIN from documents.
LM_SCORE_SQL = f"""
WITH toks AS (
  SELECT doc_id, parts[i + 1] AS a, parts[i + 2] AS b
  FROM (SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS parts
        FROM documents),
       LATERAL (SELECT unnest(range(0, len(parts) - 1)) AS i)
),
pair_c AS (SELECT a, b, count(*) AS c FROM toks GROUP BY a, b),
uni_c AS (SELECT a, count(*) AS c FROM toks GROUP BY a),
per_doc AS (
  SELECT t.doc_id,
         count(*)::BIGINT AS n_pairs,
         sum({SCALE} * p.c // u.c)::BIGINT AS score_e6
  FROM toks t
  JOIN pair_c p ON p.a = t.a AND p.b = t.b
  JOIN uni_c u ON u.a = t.a
  GROUP BY t.doc_id)
SELECT d.doc_id,
       coalesce(pd.n_pairs, 0)::BIGINT AS n_pairs,
       coalesce(pd.score_e6, 0)::BIGINT AS score_e6
FROM documents d LEFT JOIN per_doc pd USING (doc_id)
ORDER BY d.doc_id
"""
