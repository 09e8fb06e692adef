"""Weak-supervision labeling-function diagnostics (the Snorkel
pattern, public: Ratner et al., VLDB 2018): before training a label
model, measure each labeling function's coverage, overlap and conflict
over the corpus — the standard diagnostic grid that decides which LFs
enter the label model.

Four deterministic LFs over the documents table, every predicate
integer-exact so the DuckDB twin matches bit-for-bit:

- ``lf_len``     +1 if n_chars ≥ 300; −1 if n_chars < 120; else 0
- ``lf_digit``   −1 if 20 × digit_count > n_chars (>5%); else 0
- ``lf_ttr``     +1 if 2 × distinct_tokens ≥ tokens; −1 if
                 4 × distinct_tokens < tokens; else 0
- ``lf_the``     +1 if " the " occurs ≥ 2 times (left-to-right
                 non-overlapping count — str.count ≡ SQL replace
                 arithmetic); else 0

Distributed shape: ONE corpus scan computes the 4-vote matrix per
batch (all-vectorized — codepoint views, token hashing, split counts)
and folds it to 4×3 integer counters per block; only those 12 ints
(+ the doc count) move. Per-LF outputs are basis points
(``× 10⁴ // n_docs``):

- coverage = votes ≠ 0
- overlap  = votes ≠ 0 AND ≥ 1 OTHER LF voted ≠ 0
- conflict = votes ≠ 0 AND ≥ 1 OTHER LF voted the OPPOSITE sign
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.frames import ensure_columns
from ..io import read_table

LFS = ("lf_len", "lf_digit", "lf_ttr", "lf_the")


def _votes(batch: pa.Table) -> np.ndarray:
    """(n × 4) int8 vote matrix for one batch, all C-kernel work.

    ``lf_ttr`` counts distinct tokens per doc by 64-bit FNV hash while
    the DuckDB twin uses exact ``list_distinct``: a within-doc token
    hash collision would undercount ``n_dist`` and could flip the vote
    near the 1/2 or 1/4 TTR thresholds. With d distinct tokens per doc
    the collision probability is ≈ d²/2⁶⁵ (< 10⁻¹² even at d = 10⁵) —
    the same accepted-risk convention ``duplicate_span_stats``
    documents for its u64 rolling shingle hash."""
    import pyarrow.compute as pc

    texts = batch["text"]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    texts = pc.fill_null(texts, "")
    n = len(texts)
    n_chars = pc.utf8_length(texts).to_numpy(zero_copy_only=False).astype(np.int64)

    # digits per row: codepoint view of the whole column
    joined = texts.to_pandas().str.count(r"[0-9]").to_numpy().astype(np.int64)

    # tokens / distinct tokens per row
    toks = pc.utf8_split_whitespace(texts)
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    flat = toks.values
    keep = pc.greater(pc.utf8_length(flat), 0).to_numpy(zero_copy_only=False)
    parents = parents[keep]
    from ..functions.hashing import fnv64

    n_tok = np.bincount(parents, minlength=n).astype(np.int64)
    if parents.size:
        h = fnv64(flat.filter(pa.array(keep)))
        order = np.lexsort((h, parents))
        ps, hs = parents[order], h[order]
        first = np.r_[True, (ps[1:] != ps[:-1]) | (hs[1:] != hs[:-1])]
        n_dist = np.bincount(ps[first], minlength=n).astype(np.int64)
    else:
        n_dist = np.zeros(n, np.int64)

    the_counts = texts.to_pandas().str.count(" the ").to_numpy().astype(np.int64)
    # pandas str.count counts OVERLAPPING?  No — re.findall, which is
    # non-overlapping left-to-right, same as str.count / SQL replace.

    v = np.zeros((n, 4), dtype=np.int8)
    v[:, 0] = np.where(n_chars >= 300, 1, np.where(n_chars < 120, -1, 0))
    v[:, 1] = np.where(20 * joined > n_chars, -1, 0)
    v[:, 2] = np.where(
        (n_tok > 0) & (2 * n_dist >= n_tok),
        1,
        np.where((n_tok > 0) & (4 * n_dist < n_tok), -1, 0),
    )
    v[:, 3] = np.where(the_counts >= 2, 1, 0)
    return v


def lf_diagnostics(sf_dir: str) -> pd.DataFrame:
    """Per-LF (lf, n_votes, coverage_bp, overlap_bp, conflict_bp)."""

    def partial(batch: pa.Table) -> pa.Table:
        v = _votes(batch)
        nz = v != 0
        others_nz = nz.sum(axis=1, keepdims=True) - nz
        pos = (v > 0).sum(axis=1, keepdims=True)
        neg = (v < 0).sum(axis=1, keepdims=True)
        # an opposing vote exists among the OTHER LFs
        opp = np.where(v > 0, neg, np.where(v < 0, pos, 0))
        counters = np.empty(4 * 3 + 1, dtype=np.int64)
        for j in range(4):
            counters[3 * j] = int(nz[:, j].sum())
            counters[3 * j + 1] = int((nz[:, j] & (others_nz[:, j] > 0)).sum())
            counters[3 * j + 2] = int((nz[:, j] & (opp[:, j] > 0)).sum())
        counters[-1] = len(v)
        return pa.table({"part": pa.array([counters.tolist()], pa.list_(pa.int64()))})

    rows = (
        read_table(sf_dir, "documents", ["text"])
        .map_batches(partial, batch_format="pyarrow")
        .take_all()
    )
    tot = np.zeros(13, dtype=np.int64)
    for r in rows:
        tot += np.asarray(r["part"], dtype=np.int64)
    n_docs = int(tot[-1])
    out = []
    for j, lf in enumerate(LFS):
        nv, ov, cf = int(tot[3 * j]), int(tot[3 * j + 1]), int(tot[3 * j + 2])
        out.append(
            (
                lf,
                nv,
                nv * 10_000 // n_docs if n_docs else 0,
                ov * 10_000 // n_docs if n_docs else 0,
                cf * 10_000 // n_docs if n_docs else 0,
            )
        )
    df = pd.DataFrame(
        out, columns=["lf", "n_votes", "coverage_bp", "overlap_bp", "conflict_bp"]
    )
    return ensure_columns(
        df,
        {"lf": "object", "n_votes": "int64", "coverage_bp": "int64",
         "overlap_bp": "int64", "conflict_bp": "int64"},
    )


LF_DIAGNOSTICS_SQL = r"""
WITH base AS (
  SELECT doc_id,
         length(coalesce(text, '')) AS n_chars,
         length(coalesce(text, ''))
           - length(regexp_replace(coalesce(text, ''), '[0-9]', '', 'g'))
           AS n_digits,
         CAST(len(list_filter(regexp_split_to_array(coalesce(text, ''), '\s+'),
                              t -> t <> '')) AS BIGINT) AS n_tok,
         CAST(len(list_distinct(list_filter(
                regexp_split_to_array(coalesce(text, ''), '\s+'),
                t -> t <> ''))) AS BIGINT) AS n_dist,
         CAST((length(coalesce(text, ''))
               - length(replace(coalesce(text, ''), ' the ', ''))) / 5
              AS BIGINT) AS the_count
  FROM documents),
v AS (
  SELECT doc_id,
         CASE WHEN n_chars >= 300 THEN 1 WHEN n_chars < 120 THEN -1 ELSE 0 END AS lf_len,
         CASE WHEN 20 * n_digits > n_chars THEN -1 ELSE 0 END AS lf_digit,
         CASE WHEN n_tok > 0 AND 2 * n_dist >= n_tok THEN 1
              WHEN n_tok > 0 AND 4 * n_dist < n_tok THEN -1 ELSE 0 END AS lf_ttr,
         CASE WHEN the_count >= 2 THEN 1 ELSE 0 END AS lf_the
  FROM base),
m AS (
  SELECT *,
         (CASE WHEN lf_len > 0 THEN 1 ELSE 0 END + CASE WHEN lf_digit > 0 THEN 1 ELSE 0 END
          + CASE WHEN lf_ttr > 0 THEN 1 ELSE 0 END + CASE WHEN lf_the > 0 THEN 1 ELSE 0 END) AS n_pos,
         (CASE WHEN lf_len < 0 THEN 1 ELSE 0 END + CASE WHEN lf_digit < 0 THEN 1 ELSE 0 END
          + CASE WHEN lf_ttr < 0 THEN 1 ELSE 0 END + CASE WHEN lf_the < 0 THEN 1 ELSE 0 END) AS n_nz_neg,
         (CASE WHEN lf_len <> 0 THEN 1 ELSE 0 END + CASE WHEN lf_digit <> 0 THEN 1 ELSE 0 END
          + CASE WHEN lf_ttr <> 0 THEN 1 ELSE 0 END + CASE WHEN lf_the <> 0 THEN 1 ELSE 0 END) AS n_nz
  FROM v),
stats AS (
  SELECT 'lf_len' AS lf,
         sum(CASE WHEN lf_len <> 0 THEN 1 ELSE 0 END) AS n_votes,
         sum(CASE WHEN lf_len <> 0 AND n_nz > 1 THEN 1 ELSE 0 END) AS n_overlap,
         sum(CASE WHEN (lf_len > 0 AND n_nz_neg > 0)
                   OR (lf_len < 0 AND n_pos > 0) THEN 1 ELSE 0 END) AS n_conflict
  FROM m
  UNION ALL
  SELECT 'lf_digit',
         sum(CASE WHEN lf_digit <> 0 THEN 1 ELSE 0 END),
         sum(CASE WHEN lf_digit <> 0 AND n_nz > 1 THEN 1 ELSE 0 END),
         sum(CASE WHEN (lf_digit > 0 AND n_nz_neg > 0)
                   OR (lf_digit < 0 AND n_pos > 0) THEN 1 ELSE 0 END)
  FROM m
  UNION ALL
  SELECT 'lf_ttr',
         sum(CASE WHEN lf_ttr <> 0 THEN 1 ELSE 0 END),
         sum(CASE WHEN lf_ttr <> 0 AND n_nz > 1 THEN 1 ELSE 0 END),
         sum(CASE WHEN (lf_ttr > 0 AND n_nz_neg > 0)
                   OR (lf_ttr < 0 AND n_pos > 0) THEN 1 ELSE 0 END)
  FROM m
  UNION ALL
  SELECT 'lf_the',
         sum(CASE WHEN lf_the <> 0 THEN 1 ELSE 0 END),
         sum(CASE WHEN lf_the <> 0 AND n_nz > 1 THEN 1 ELSE 0 END),
         sum(CASE WHEN (lf_the > 0 AND n_nz_neg > 0)
                   OR (lf_the < 0 AND n_pos > 0) THEN 1 ELSE 0 END)
  FROM m)
SELECT lf,
       CAST(coalesce(n_votes, 0) AS BIGINT) AS n_votes,
       CAST(coalesce(n_votes, 0) * 10000
            // (SELECT count(*) FROM documents) AS BIGINT) AS coverage_bp,
       CAST(coalesce(n_overlap, 0) * 10000
            // (SELECT count(*) FROM documents) AS BIGINT) AS overlap_bp,
       CAST(coalesce(n_conflict, 0) * 10000
            // (SELECT count(*) FROM documents) AS BIGINT) AS conflict_bp
FROM stats
ORDER BY lf
"""
