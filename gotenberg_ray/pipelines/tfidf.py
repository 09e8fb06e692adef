"""TF-IDF keyword extraction at corpus scale — top-k terms per
document scored by term frequency × inverse document frequency.

The classic two-shuffle text-analytics plan, nothing driver-sized:

1. one tokenize pass emits per-batch (doc_id, term, tf) partials;
2. document frequency is a distributed ``groupby(term)`` over per-doc
   DISTINCT terms (partial-counted per batch — the ``vocab_top_df``
   combiner shape), so the exchange carries one row per (term, block);
3. the (term→df) side joins back to the (doc, term, tf) rows with the
   bucketed ``hash_join`` ON TERM — the vocabulary is dataset-scale
   and is never broadcast or collected;
4. scores rank per document in hash buckets (``pid = mix64(doc_id)``,
   one P-group shuffle, vectorized segment ranking) — the
   ``top_orders_per_customer`` pattern.

Scoring is exact-integer: ``score = tf · (10⁴·N // df)`` (a plain
inverse ratio — no float log, so the oracle compare is bit-exact).
Ties break (score desc, term asc).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Sum

from ..functions.frames import ensure_columns
from ..io import parallelism_hint, read_table


def _explode_tf(batch: pa.Table) -> pa.Table:
    """(doc_id, term, tf) rows for one batch — C-kernel tokenization,
    pandas C groupby for the per-doc term counts."""
    texts = batch["text"]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    toks = pc.utf8_split_whitespace(pc.fill_null(texts, ""))
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    flat = toks.values
    keep = pc.greater(pc.utf8_length(flat), 0).to_numpy(zero_copy_only=False)
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    df = pd.DataFrame({"doc_id": ids[parents[keep]], "term": flat.filter(pa.array(keep))})
    c = df.groupby(["doc_id", "term"], sort=False).size().reset_index(name="tf")
    return pa.table(
        {
            "doc_id": pa.array(c["doc_id"].to_numpy(), pa.int64()),
            "term": pa.array(c["term"], pa.string()),
            "tf": pa.array(c["tf"].to_numpy(), pa.int64()),
        }
    )


def tfidf_top_terms(sf_dir: str, k: int = 3) -> pd.DataFrame:
    from .joins import hash_join, partition_ids
    from .relational import JOIN_PARTITIONS

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    from ..io import table_rows

    n_docs = table_rows(sf_dir, "documents")  # footer count, no read pass

    # consumed twice (the DF branch and the join's left side) — one
    # materialized exchange of the (doc, term, tf) rows beats running
    # the tokenize pass twice; this is the standard persisted-exchange
    # trade-off of a two-output stage
    tf_rows = docs.map_batches(_explode_tf, batch_format="pyarrow").materialize()

    def df_partial(batch: pa.Table) -> pa.Table:
        # a (doc, term) row is already distinct → df partial = count
        t = pa.table({"term": batch["term"]})
        return t.group_by("term").aggregate([([], "count_all")])

    df_side = (
        tf_rows.map_batches(df_partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("count_all", alias_name="df"))
    )

    joined = hash_join(
        tf_rows,
        df_side,
        on="term",
        num_partitions=JOIN_PARTITIONS,
        left_schema=[("doc_id", pa.int64()), ("term", pa.string()), ("tf", pa.int64())],
        right_schema=[("term", pa.string()), ("df", pa.int64())],
    )

    def score(batch: pa.Table) -> pa.Table:
        idf_e4 = pc.cast(
            pc.divide(pa.scalar(10_000 * n_docs, pa.int64()), batch["df"]), pa.int64()
        )
        s = pc.multiply(batch["tf"], idf_e4)
        t = pa.table(
            {"doc_id": batch["doc_id"], "term": batch["term"], "score": s}
        )
        return t.append_column("pid", partition_ids(t.column("doc_id"), JOIN_PARTITIONS))

    def rank_bucket(part: pa.Table) -> pa.Table:
        from ..functions.segments import segment_ranks

        t = part.select(["doc_id", "term", "score"]).sort_by(
            [("doc_id", "ascending"), ("score", "descending"), ("term", "ascending")]
        )
        rn = segment_ranks(t["doc_id"].to_numpy(zero_copy_only=False))
        t = t.append_column("rn", pa.array(rn))
        return t.filter(pa.array(rn <= k))

    out = (
        joined.map_batches(score, batch_format="pyarrow")
        .groupby("pid", num_partitions=JOIN_PARTITIONS)
        .map_groups(rank_bucket, batch_format="pyarrow")
        .to_pandas()
    )
    out = ensure_columns(
        out,
        {"doc_id": "int64", "term": "object", "score": "int64", "rn": "int64"},
    )
    for c in ("doc_id", "score", "rn"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["doc_id", "rn"]).reset_index(drop=True)


TFIDF_SQL = r"""
WITH w AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(text, '\s+'),
                            t -> t <> '')) AS term
  FROM documents),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM w GROUP BY doc_id, term),
df AS (
  SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
  FROM w GROUP BY term),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
s AS (
  SELECT doc_id, term, tf * ((10000 * n) // df) AS score
  FROM tf JOIN df USING (term), n),
r AS (
  SELECT doc_id, term, score,
         CAST(row_number() OVER (
             PARTITION BY doc_id ORDER BY score DESC, term) AS BIGINT) AS rn
  FROM s)
SELECT doc_id, term, score, rn FROM r WHERE rn <= 3
ORDER BY doc_id, rn
"""


# ------------------------------------------------- OOV rate


def oov_rate(sf_dir: str, vocab_k: int = 1000) -> pd.DataFrame:
    """Out-of-vocabulary rate per document against the corpus top-k
    vocabulary — the cheap LM-free proxy for 'how unusual is this
    document's wording' (tokenizer-coverage / quality signal).

    The vocabulary is BOUNDED (top-k by document frequency via the
    ``vocab_top_df`` local-top-k merge), so unlike the TF-IDF join it
    is legitimately broadcast: one ``ray.put`` of k terms, set-probed
    per batch with an Arrow ``is_in`` kernel. Exact ×10⁴ integer rate."""
    import ray

    from .textops import vocab_top_df

    vocab = vocab_top_df(sf_dir, k=vocab_k)["term"]
    vocab_ref = ray.put(pa.array(sorted(vocab), pa.string()))

    class Rate:
        def __init__(self):
            self.vocab = ray.get(vocab_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            texts = batch["text"]
            if isinstance(texts, pa.ChunkedArray):
                texts = texts.combine_chunks()
            toks = pc.utf8_split_whitespace(pc.fill_null(texts, ""))
            parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
            flat = toks.values
            keep = pc.greater(pc.utf8_length(flat), 0).to_numpy(zero_copy_only=False)
            in_vocab = pc.is_in(flat, value_set=self.vocab).to_numpy(
                zero_copy_only=False
            )
            n_rows = batch.num_rows
            n_tok = np.bincount(parents[keep], minlength=n_rows).astype(np.int64)
            n_oov = np.bincount(
                parents[keep & ~in_vocab], minlength=n_rows
            ).astype(np.int64)
            rate = np.where(n_tok > 0, n_oov * 10_000 // np.maximum(n_tok, 1), 0)
            return pa.table(
                {
                    "doc_id": batch["doc_id"],
                    "n_tokens": pa.array(n_tok),
                    "n_oov": pa.array(n_oov),
                    "oov_rate_e4": pa.array(rate.astype(np.int64)),
                }
            )

    df = (
        read_table(sf_dir, "documents", columns=["doc_id", "text"])
        .map_batches(Rate, batch_format="pyarrow", concurrency=2)
        .to_pandas()
    )
    df = ensure_columns(
        df,
        {"doc_id": "int64", "n_tokens": "int64",
         "n_oov": "int64", "oov_rate_e4": "int64"},
    )
    for c in ("doc_id", "n_tokens", "n_oov", "oov_rate_e4"):
        df[c] = df[c].astype("int64")
    return df.sort_values("doc_id").reset_index(drop=True)


OOV_SQL = r"""
WITH w AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(text, '\s+'),
                            t -> t <> '')) AS term
  FROM documents),
vocab AS (
  SELECT term FROM (
    SELECT term, count(DISTINCT doc_id) AS n_docs FROM w GROUP BY term
    ORDER BY n_docs DESC, term ASC LIMIT 1000)),
per AS (
  SELECT w.doc_id,
         CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(CASE WHEN vocab.term IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_oov
  FROM w LEFT JOIN vocab ON w.term = vocab.term
  GROUP BY w.doc_id)
SELECT d.doc_id,
       coalesce(per.n_tokens, 0) AS n_tokens,
       coalesce(per.n_oov, 0) AS n_oov,
       CASE WHEN coalesce(per.n_tokens, 0) > 0
            THEN per.n_oov * 10000 // per.n_tokens ELSE 0 END AS oov_rate_e4
FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
ORDER BY d.doc_id
"""


# ------------------------------------------- BPE pair counting


def bpe_top_pairs(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Top-k adjacent token pairs by corpus frequency — the inner loop
    of BPE tokenizer training (each merge round picks the most
    frequent adjacent pair). Per batch: C-kernel tokenization, the
    adjacency mask is one shifted compare on the parent indices, pair
    keys assemble with a binary-join kernel, partial counts fold per
    batch — the ``vocab_top_df`` combiner/local-top-k shape, so the
    shuffle carries (pair, block) partials and only blocks×k rows
    reach the driver."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        toks = pc.utf8_split_whitespace(pc.fill_null(texts, ""))
        parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        flat = toks.values
        keep = pc.greater(pc.utf8_length(flat), 0).to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        parents = parents[keep]
        if len(parents) < 2:
            return pa.table(
                {"pair": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        adjacent = parents[1:] == parents[:-1]
        left = flat.slice(0, len(flat) - 1).filter(pa.array(adjacent))
        right = flat.slice(1).filter(pa.array(adjacent))
        pairs = pc.binary_join_element_wise(left, right, " ")
        t = pa.table({"pair": pairs})
        return _rename_cols(
            t.group_by("pair").aggregate([([], "count_all")]), {"count_all": "n"}
        )

    def local_topk(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "pair": batch["pair"].to_pylist(),
                "n": batch["n"].to_numpy(zero_copy_only=False),
            }
        ).sort_values(["n", "pair"], ascending=[False, True])
        return pa.Table.from_pandas(df.head(k), preserve_index=False)

    df = (
        read_table(sf_dir, "documents", columns=["doc_id", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("pair")
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(local_topk, batch_format="pyarrow")
        .to_pandas()
    )
    df = ensure_columns(df, {"pair": "object", "n": "int64"})
    df = (
        df.sort_values(["n", "pair"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    df["n"] = df["n"].astype("int64")
    return df


def _rename_cols(t: pa.Table, mapping: dict) -> pa.Table:
    return t.rename_columns([mapping.get(c, c) for c in t.column_names])


BPE_PAIRS_SQL = r"""
WITH w AS (
  SELECT list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
  FROM documents),
p AS (
  SELECT t[g + 1] || ' ' || t[g + 2] AS pair
  FROM w, LATERAL unnest(range(len(t) - 1)) AS u(g)
  WHERE len(t) >= 2)
SELECT pair, count(*) AS n
FROM p GROUP BY pair
ORDER BY n DESC, pair LIMIT 20
"""


# ------------------------------------------------- BPE tokenizer training


#: session memo for the trained merge table — shared by bpe_train's
#: own query and the serving passes (bpe_encode_stats re-trains the
#: same merges otherwise). Same contract as textops._PAIR_CACHE:
#: corpus-identity keyed, FIFO-bounded, restart-safe pandas payload;
#: the bench clears it before bpe_train's own samples so the encode
#: pass measures serving warm.
_BPE_MEMO: dict[tuple, pd.DataFrame] = {}
_BPE_MEMO_MAX = 4


def clear_bpe_memo() -> None:
    _BPE_MEMO.clear()


def bpe_train(
    sf_dir: str, n_merges: int = 30, min_count: int = 2
) -> pd.DataFrame:
    """Train byte-pair-encoding merges over the corpus — the scalable
    tokenizer-training shape: ONE distributed pass builds the word
    FREQUENCY HISTOGRAM (per-batch partial counts → groupby(word) Sum
    — the same combiner plan as ``vocab_top_df``), and the merge loop
    then runs on the histogram alone, never rescanning the corpus.
    The histogram is the small side by construction (Heaps' law: vocab
    grows ~√corpus) and ``min_count`` floors it, so the driver holds
    (word, n) pairs, not documents — 100 TB of text still reduces to a
    few million histogram rows. This is the standard production
    layout for BPE training (one count pass + in-memory merges).

    Deterministic: pair counts are integer, the argmax breaks ties by
    the lexicographically smallest (left, right), and the histogram
    fold is order-independent. Returns (merge_rank, left, right,
    pair_count); rows-only check (iterative, not SQL-expressible)."""
    from .textops import _pair_cache_key

    _memo_key = (_pair_cache_key(sf_dir, float(n_merges)), int(min_count))
    _hit = _BPE_MEMO.get(_memo_key)
    if _hit is not None:
        return _hit.copy()

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        toks = pc.utf8_split_whitespace(pc.fill_null(texts, ""))
        flat = pc.utf8_lower(toks.values)
        keep = pc.greater(pc.utf8_length(flat), 0)
        t = pa.table({"word": flat.filter(keep)})
        g = t.group_by("word").aggregate([([], "count_all")])
        return g.rename_columns(["word", "n"])

    hist = (
        read_table(sf_dir, "documents", columns=["text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    hist = ensure_columns(hist, {"word": "object", "n": "int64"})
    hist = hist[hist["n"] >= min_count]

    # histogram → symbol sequences (chars + end-of-word marker)
    vocab: dict[tuple[str, ...], int] = {}
    for w, n in zip(hist["word"], hist["n"]):
        vocab[tuple(w) + ("</w>",)] = int(n)

    merges = []
    for rank in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for sym, n in vocab.items():
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                counts[p] = counts.get(p, 0) + n
        if not counts:
            break
        # argmax with deterministic ties: max count, then smallest pair
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), n_best = best
        if n_best < min_count:
            break
        merged = left + right
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, n in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == left and sym[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + n
        vocab = new_vocab
        merges.append(
            {"merge_rank": rank, "left": left, "right": right,
             "pair_count": n_best}
        )

    out = pd.DataFrame(
        merges, columns=["merge_rank", "left", "right", "pair_count"]
    )
    out = ensure_columns(
        out,
        {"merge_rank": "int64", "left": "object", "right": "object",
         "pair_count": "int64"},
    )
    for c in ("merge_rank", "pair_count"):
        out[c] = out[c].astype("int64")
    out = out.reset_index(drop=True)
    while len(_BPE_MEMO) >= _BPE_MEMO_MAX:
        _BPE_MEMO.pop(next(iter(_BPE_MEMO)))
    _BPE_MEMO[_memo_key] = out.copy()
    return out


# -------------------------------------------- collocation lift (PMI-style)


def cooc_lift_top_pairs(
    sf_dir: str, k: int = 20, min_pair: int = 3
) -> pd.DataFrame:
    """Top-k adjacent-token collocations ranked by LIFT
    (= P(x,y)/(P(x)·P(y)), the exponentiated PMI) — the corpus
    statistic behind multi-word-expression extraction. Three
    distributed pieces, all vocabulary-sized after the first combine:
    pair counts (the ``bpe_top_pairs`` partial), unigram counts (the
    ``vocab_top_df`` combiner shape), and two bucketed ``hash_join``s
    stitching c_x and c_y onto each surviving pair (``min_pair``
    floors the pair table before the joins). The lift numerator
    c_xy·10⁴·N outgrows int64 at corpus scale, so the final per-pair
    arithmetic runs in Python bigints over the vocabulary-sized joined
    rows (never corpus rows); the DuckDB twin uses HUGEINT — equality
    is exact. Ties break (lift desc, pair asc)."""
    from ray.data.aggregate import Sum

    from .joins import hash_join

    def tok_flat(batch: pa.Table) -> pa.Array:
        texts = batch["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        toks = pc.utf8_split_whitespace(pc.fill_null(texts, ""))
        flat = toks.values
        keep = pc.greater(pc.utf8_length(flat), 0)
        return toks, flat, keep

    def pair_partial(batch: pa.Table) -> pa.Table:
        toks, flat, keep_m = tok_flat(batch)
        parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        keep = keep_m.to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        parents = parents[keep]
        if len(parents) < 2:
            return pa.table(
                {"pair": pa.array([], pa.string()),
                 "n_pair": pa.array([], pa.int64())}
            )
        adjacent = parents[1:] == parents[:-1]
        left = flat.slice(0, len(flat) - 1).filter(pa.array(adjacent))
        right = flat.slice(1).filter(pa.array(adjacent))
        t = pa.table({"pair": pc.binary_join_element_wise(left, right, " ")})
        return t.group_by("pair").aggregate([([], "count_all")]).rename_columns(
            ["pair", "n_pair"]
        )

    def uni_partial(batch: pa.Table) -> pa.Table:
        _, flat, keep = tok_flat(batch)
        t = pa.table({"tok": flat.filter(keep)})
        return t.group_by("tok").aggregate([([], "count_all")]).rename_columns(
            ["tok", "n_tok"]
        )

    docs = read_table(sf_dir, "documents", columns=["text"]).materialize()
    pairs = (
        docs.map_batches(pair_partial, batch_format="pyarrow")
        .groupby("pair")
        .aggregate(Sum("n_pair", alias_name="n_pair"))
        .filter(expr=f"n_pair >= {min_pair}")
        .map_batches(
            lambda b: pa.table(
                {
                    "pair": b["pair"],
                    "n_pair": b["n_pair"],
                    "tok_l": pc.list_element(
                        pc.split_pattern(b["pair"], " "), 0
                    ),
                    "tok_r": pc.list_element(
                        pc.split_pattern(b["pair"], " "), 1
                    ),
                }
            ),
            batch_format="pyarrow",
        )
    )
    unis = (
        docs.map_batches(uni_partial, batch_format="pyarrow")
        .groupby("tok")
        .aggregate(Sum("n_tok", alias_name="n_tok"))
        .materialize()  # consumed by N and both joins
    )
    n_total = int(unis.sum("n_tok") or 0)
    if n_total == 0:
        return pd.DataFrame(
            {"pair": pd.Series([], dtype="object"),
             "n_pair": pd.Series([], dtype="int64"),
             "lift_e4": pd.Series([], dtype="int64")}
        )

    j1 = hash_join(
        pairs,
        unis.map_batches(
            lambda b: pa.table({"tok_l": b["tok"], "n_l": b["n_tok"]}),
            batch_format="pyarrow",
        ),
        on="tok_l",
        num_partitions=8,
        left_schema=[("pair", pa.string()), ("n_pair", pa.int64()),
                     ("tok_l", pa.string()), ("tok_r", pa.string())],
        right_schema=[("tok_l", pa.string()), ("n_l", pa.int64())],
    )
    j2 = hash_join(
        j1,
        unis.map_batches(
            lambda b: pa.table({"tok_r": b["tok"], "n_r": b["n_tok"]}),
            batch_format="pyarrow",
        ),
        on="tok_r",
        num_partitions=8,
        left_schema=[("pair", pa.string()), ("n_pair", pa.int64()),
                     ("tok_l", pa.string()), ("tok_r", pa.string()),
                     ("n_l", pa.int64())],
        right_schema=[("tok_r", pa.string()), ("n_r", pa.int64())],
    )

    def local_topk(batch: pa.Table) -> pa.Table:
        # bigint lift over vocabulary-sized rows (numerator > int64 at
        # corpus scale), then block-local top-k
        n_pair = batch["n_pair"].to_pylist()
        n_l = batch["n_l"].to_pylist()
        n_r = batch["n_r"].to_pylist()
        lift = [
            (int(a) * 10_000 * n_total) // (int(b) * int(c))
            for a, b, c in zip(n_pair, n_l, n_r)
        ]
        df = pd.DataFrame(
            {"pair": batch["pair"].to_pylist(), "n_pair": n_pair,
             "lift_e4": lift}
        ).sort_values(["lift_e4", "pair"], ascending=[False, True])
        return pa.Table.from_pandas(df.head(k), preserve_index=False)

    df = (
        j2.map_batches(local_topk, batch_format="pyarrow")
        .to_pandas()
    )
    df = ensure_columns(
        df, {"pair": "object", "n_pair": "int64", "lift_e4": "int64"}
    )
    df = (
        df.sort_values(["lift_e4", "pair"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    for c in ("n_pair", "lift_e4"):
        df[c] = df[c].astype("int64")
    return df


COOC_LIFT_SQL = r"""
WITH w AS (
  SELECT list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
  FROM documents),
toks AS (
  SELECT unnest(t) AS tok FROM w),
u AS (
  SELECT tok, CAST(count(*) AS HUGEINT) AS n_tok FROM toks GROUP BY tok),
total AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM toks),
p AS (
  SELECT t[g + 1] AS tok_l, t[g + 2] AS tok_r,
         t[g + 1] || ' ' || t[g + 2] AS pair
  FROM w, LATERAL unnest(range(len(t) - 1)) AS un(g)
  WHERE len(t) >= 2),
pc AS (
  SELECT pair, tok_l, tok_r, CAST(count(*) AS HUGEINT) AS n_pair
  FROM p GROUP BY pair, tok_l, tok_r
  HAVING count(*) >= 3)
SELECT pc.pair,
       CAST(pc.n_pair AS BIGINT) AS n_pair,
       CAST((pc.n_pair * 10000 * total.n) // (ul.n_tok * ur.n_tok)
            AS BIGINT) AS lift_e4
FROM pc
JOIN u ul ON ul.tok = pc.tok_l
JOIN u ur ON ur.tok = pc.tok_r
CROSS JOIN total
ORDER BY lift_e4 DESC, pc.pair LIMIT 20
"""


# ----------------------------------------------------- BPE encoding


def bpe_encode_word(word: str, ranks: dict[tuple[str, str], int]) -> int:
    """Sub-token count of one word under trained merges (classic BPE
    apply: repeatedly merge the lowest-rank adjacent pair)."""
    sym = list(word) + ["</w>"]
    while len(sym) > 1:
        best_rank, best_i = None, -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return len(sym)


def bpe_encode_stats(sf_dir: str, n_merges: int = 30) -> pd.DataFrame:
    """Apply the corpus-trained BPE to the corpus — the tokenizer
    SERVING pass that follows ``bpe_train``: per language, documents /
    words / sub-tokens under the trained merges (the
    compression-per-language signal a data-mix designer reads).

    Distributed shape: the merge table (the tiny training output)
    broadcasts once via ``ray.put``; an ACTOR-POOL stage holds the
    rank dict plus a per-actor word→length cache (Zipf: the cache hits
    almost always, so each distinct word is encoded once per actor,
    not once per occurrence); per-batch partial (lang, docs, words,
    subtokens) rows fold through a language-sized groupby. Rows-only
    check (iterative merges are not SQL-expressible); parity with a
    driver reference encoder is pinned in tests."""
    import ray

    merges = bpe_train(sf_dir, n_merges=n_merges)
    ranks = {
        (l, r): int(k)
        for k, l, r in zip(merges["merge_rank"], merges["left"], merges["right"])
    }
    ranks_ref = ray.put(ranks)

    class BpeEncoder:
        def __init__(self):
            self.ranks = ray.get(ranks_ref)
            self.cache: dict[str, int] = {}

        def _len(self, w: str) -> int:
            n = self.cache.get(w)
            if n is None:
                n = bpe_encode_word(w, self.ranks)
                self.cache[w] = n
            return n

        def __call__(self, batch: pa.Table) -> pa.Table:
            texts = batch["text"]
            if isinstance(texts, pa.ChunkedArray):
                texts = texts.combine_chunks()
            toks = pc.utf8_split_whitespace(pc.fill_null(texts, ""))
            parents = pc.list_parent_indices(toks).to_numpy(
                zero_copy_only=False
            )
            flat = pc.utf8_lower(toks.values)
            keep = pc.greater(pc.utf8_length(flat), 0).to_numpy(
                zero_copy_only=False
            )
            words = flat.filter(pa.array(keep)).to_pylist()
            sub = np.fromiter(
                (self._len(w) for w in words), np.int64, len(words)
            )
            n_rows = batch.num_rows
            subtotal = np.zeros(n_rows, np.int64)
            np.add.at(subtotal, parents[keep], sub)
            wordtotal = np.bincount(
                parents[keep], minlength=n_rows
            ).astype(np.int64)
            t = pa.table(
                {
                    "lang": batch["lang"],
                    "n_docs": pa.array(np.ones(n_rows, np.int64)),
                    "n_words": pa.array(wordtotal),
                    "n_subtokens": pa.array(subtotal),
                }
            )
            return (
                t.group_by("lang")
                .aggregate(
                    [("n_docs", "sum"), ("n_words", "sum"),
                     ("n_subtokens", "sum")]
                )
                .rename_columns(
                    ["lang", "n_docs", "n_words", "n_subtokens"]
                )
            )

    df = (
        read_table(
            sf_dir, "documents", columns=["lang", "text"],
            min_blocks=parallelism_hint(),
        )
        .map_batches(
            BpeEncoder,
            batch_format="pyarrow",
            batch_size=256,
            # leave headroom for the read tasks: an actor pool sized to
            # the whole CPU budget starves its own upstream
            concurrency=max(1, min(4, parallelism_hint() - 2)),
        )
        .groupby("lang")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_words", alias_name="n_words"),
            Sum("n_subtokens", alias_name="n_subtokens"),
        )
        .to_pandas()
    )
    df = ensure_columns(
        df,
        {"lang": "object", "n_docs": "int64", "n_words": "int64",
         "n_subtokens": "int64"},
    )
    for c in ("n_docs", "n_words", "n_subtokens"):
        df[c] = df[c].astype("int64")
    return df.sort_values("lang").reset_index(drop=True)
