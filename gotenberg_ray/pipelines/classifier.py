"""Distributed quality-classifier training (fastText-style linear
model over hashed n-gram features) + exact serving metrics.

The CCNet/fastText curation pattern (public): train a small linear
classifier that separates a *target* slice from the rest of the crawl,
score every document, and keep/weight documents by the score. Here the
target is the ``lang == 'en'`` slice (the same stand-in convention as
``sampling.dsir_select`` — a production run supplies its own labeled
seed set), the features are hashed word uni+bigram counts, and the
trainer is IRLS/Newton with **integer-exact distributed partials** so
training is bit-identical under ANY block layout:

1. **Featurize once** — one streaming pass turns each doc into a
   ``D``-dim int8 count vector (intercept + 63 unigram buckets + 64
   bigram buckets, counts capped at 63) + the 0/1 label; the compact
   feature table (~`D`+1 bytes/doc — orders of magnitude smaller than
   the text) is materialized and every training iteration scans IT,
   never the corpus.
2. **Newton iterations (fixed count)** — the weight vector broadcasts
   inside the task closure; each batch computes per-row
   ``mu = sigmoid(eta)`` and emits the QUANTIZED moment partials

       H_part = X^T diag(round(mu(1-mu)·2^S)) X      (D×D int64)
       g_part = X^T round((y-mu)·2^S)                (D   int64)

   as ONE flattened int64 row. Products run through float64 BLAS,
   which is EXACT here (all values integer, partial sums < 2^53), then
   cast to int64; integer addition commutes, so the fold is
   layout-invariant. Partials tree-combine (batch_size=1024 per level)
   before the driver solves the ridge-damped D×D Newton system —
   floats appear only on the driver, derived from exact integers.
3. **Serve + metrics** — a second pass over the features scores every
   doc (``score_bp = round(sigmoid(eta)·10⁴)``) and folds an exact
   (score_bp, y) histogram (≤ 20002 cells) plus per-lang score sums.
   The driver computes accuracy and the exact Mann–Whitney AUC (tied
   ranks averaged, ``fractions.Fraction`` arithmetic — no float rank
   sums) from the histogram alone.

Determinism contract: ``eta`` folds features in ascending index order
(j = 0..D-1) on every path — per-row results depend only on the row
and ``w``, never on batch composition. The pin test reimplements the
whole procedure single-machine from this spec and asserts exact
equality of the metrics table.

Scale posture (100 TB): the corpus is read once; iterations scan the
materialized ~(D+1)-byte/doc feature table (≈1.3 TB at 10^10 docs —
object-store-spillable). Partial magnitude ≤ 2^14·63²·n, so int64
holds corpus sums to ~2^34 docs; beyond that the two-limb Sum128
pattern (functions/limbs.py) applies. Rows-only by nature (iterative
model fit); reference parity: the scoring/filter role generalizes the
reference's per-request validation gates (pkg/modules/api/context.go,
formdata.go — fixed-rule accept/reject per document) into a trainable
corpus-level curation operator, the form a training-data pipeline
needs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import fnv64, splitmix64
from ..io import read_table

# feature layout: [intercept | U unigram buckets | B bigram buckets]
U_BUCKETS = 63
B_BUCKETS = 64
D = 1 + U_BUCKETS + B_BUCKETS
COUNT_CAP = 63
SCALE = 1 << 16  # quantization of mu(1-mu) and (y-mu)
RIDGE = 1.0  # L2 strength (absolute — vanishes relatively with n)
ITERS = 8
TARGET_LANG = "en"
COMBINE_BATCH = 1024  # tree-combine fan-in per level


def _flat_tokens(texts: pa.Array | pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    """(uint64 token hashes, int64 parent row ids) for a text column,
    tokenized exactly like ``str.split()`` (whitespace runs, no empty
    edge tokens)."""
    import pyarrow.compute as pc

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if texts.null_count:
        texts = pc.fill_null(texts, "")
    toks = pc.utf8_split_whitespace(texts)
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    flat = toks.values
    keep = pc.greater(pc.utf8_length(flat), 0).to_numpy(zero_copy_only=False)
    if not keep.all():
        flat = flat.filter(pa.array(keep))
        parents = parents[keep]
    if len(flat) == 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    return fnv64(flat), parents.astype(np.int64)


def featurize_batch(texts: pa.Array | pa.ChunkedArray, n_rows: int) -> np.ndarray:
    """(n_rows × D) int64 count matrix. Buckets: unigram
    ``1 + fnv64(tok) % U``; bigram (adjacent token pair within a row)
    ``1 + U + splitmix64(h_a ^ splitmix64(h_b)) % B``. Counts capped
    at COUNT_CAP; column 0 is the intercept (=1)."""
    h, parents = _flat_tokens(texts)
    if not len(h):
        X = np.zeros((n_rows, D), dtype=np.int64)
        X[:, 0] = 1
        return X
    # one bincount over flattened (row, bucket) cells — same counts as
    # per-cell scatters, vectorized
    ub = (h % np.uint64(U_BUCKETS)).astype(np.int64) + 1
    cells = [parents * D + ub]
    adj = parents[:-1] == parents[1:]
    if adj.any():
        bh = splitmix64(h[:-1] ^ splitmix64(h[1:]))
        bb = (bh % np.uint64(B_BUCKETS)).astype(np.int64) + 1 + U_BUCKETS
        cells.append(parents[:-1][adj] * D + bb[adj])
    X = np.bincount(np.concatenate(cells), minlength=n_rows * D).reshape(n_rows, D)
    np.minimum(X, COUNT_CAP, out=X)
    X[:, 0] = 1
    return X


def _eta(X: np.ndarray, w: np.ndarray) -> np.ndarray:
    """Linear predictor with the FIXED fold order (j ascending) the
    determinism contract requires — per-row value is independent of
    batch composition."""
    eta = np.zeros(len(X), dtype=np.float64)
    for j in range(D):
        eta += w[j] * X[:, j]
    return eta


def _sigmoid(eta: np.ndarray) -> np.ndarray:
    out = np.empty_like(eta)
    pos = eta >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-eta[pos]))
    e = np.exp(eta[~pos])
    out[~pos] = e / (1.0 + e)
    return out


def moment_partial(X: np.ndarray, y: np.ndarray, w: np.ndarray) -> np.ndarray:
    """Flattened int64 [H (D·D) | g (D)] quantized Newton partial for
    one batch. float64 BLAS is exact: every product/sum is an integer
    below 2^53 for batch sizes ≤ 2^15."""
    eta = _eta(X, w)
    mu = _sigmoid(eta)
    s = np.round(mu * (1.0 - mu) * SCALE)
    g = np.round((y - mu) * SCALE)
    Xf = X.astype(np.float64)
    H = (Xf * s[:, None]).T @ Xf
    gv = Xf.T @ g
    return np.concatenate([H.ravel(), gv]).astype(np.int64)


def _tree_sum(ds, width: int):
    """Sum a one-list-column partial dataset to a single int64 vector:
    fixed-fan-in combine levels keep driver traffic bounded at any
    block count (10^6 blocks → ≤ ~10^3 rows reach the driver after one
    level; a second level runs only if needed)."""

    def combine(batch: pa.Table) -> pa.Table:
        arrs = batch["part"].to_numpy(zero_copy_only=False)
        tot = np.zeros(width, dtype=np.int64)
        for a in arrs:
            tot += np.asarray(a, dtype=np.int64)
        return pa.table({"part": pa.array([tot.tolist()], pa.list_(pa.int64()))})

    rows = ds.map_batches(combine, batch_format="pyarrow", batch_size=COMBINE_BATCH).take_all()
    tot = np.zeros(width, dtype=np.int64)
    for r in rows:
        tot += np.asarray(r["part"], dtype=np.int64)
    return tot


def _features_ds(sf_dir: str):
    """Materialized compact feature table: x fixed-width int64 list,
    y int8, lang (kept for the per-lang serving metrics)."""

    def fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        X = featurize_batch(batch["text"], n)
        langs = batch["lang"]
        if isinstance(langs, pa.ChunkedArray):
            langs = langs.combine_chunks()
        y = (np.asarray(langs.to_pandas()) == TARGET_LANG).astype(np.int8)
        flat = pa.array(X.ravel(), pa.int64())
        lists = pa.FixedSizeListArray.from_arrays(flat, D)
        return pa.table({"x": lists, "y": pa.array(y), "lang": langs})

    return (
        read_table(sf_dir, "documents", ["text", "lang"])
        .map_batches(fn, batch_format="pyarrow")
        .materialize()
    )


def _xy(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    col = batch["x"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    X = col.flatten().to_numpy(zero_copy_only=False).reshape(-1, D)
    y = batch["y"].to_numpy(zero_copy_only=False)
    return X, y


def train_weights(feats) -> np.ndarray:
    """ITERS ridge-damped Newton steps over the feature table; returns
    the float64 weight vector (driver-held, broadcast per iteration
    inside the task closure)."""
    w = np.zeros(D, dtype=np.float64)
    width = D * D + D
    for _ in range(ITERS):
        w_cur = w.copy()

        def partial(batch: pa.Table, w_=w_cur) -> pa.Table:
            X, y = _xy(batch)
            vec = moment_partial(X, y.astype(np.float64), w_)
            return pa.table({"part": pa.array([vec.tolist()], pa.list_(pa.int64()))})

        tot = _tree_sum(feats.map_batches(partial, batch_format="pyarrow"), width)
        H = tot[: D * D].reshape(D, D).astype(np.float64) / SCALE
        g = tot[D * D :].astype(np.float64) / SCALE
        w = w + np.linalg.solve(H + RIDGE * np.eye(D), g - RIDGE * w)
    return w


def _auc_e6(hist: np.ndarray) -> int:
    """Exact Mann–Whitney AUC (×10⁶, floored) from the interleaved
    (score_bp, y) histogram — tied ranks averaged, Fraction-exact."""
    from fractions import Fraction

    pos = hist[1::2].astype(object)
    neg = hist[0::2].astype(object)
    P, N = int(pos.sum()), int(neg.sum())
    if P == 0 or N == 0:
        return -1
    # rank-sum of positives with average ranks per tie group
    before = 0
    rank_sum = Fraction(0)
    for v in range(len(pos)):
        c = int(pos[v] + neg[v])
        if c:
            avg_rank = Fraction(2 * before + c + 1, 2)
            rank_sum += avg_rank * int(pos[v])
            before += c
    u = rank_sum - Fraction(P * (P + 1), 2)
    return int(u * 1_000_000 // (P * N))


def quality_classifier(sf_dir: str) -> pd.DataFrame:
    """Train the hashed-ngram logistic quality classifier and report
    exact serving metrics as (metric, value int64) rows:

    - ``n_docs``, ``n_pos`` — corpus/label sizes
    - ``acc_bp`` — accuracy ×10⁴ at the 0.5 threshold (floored)
    - ``auc_e6`` — exact tie-averaged Mann–Whitney AUC ×10⁶ (floored;
      −1 when a class is empty)
    - ``mean_score_bp:<lang>`` — floored mean score per language

    Rows-only (iterative model fit — no SQL twin); pinned by an exact
    single-machine reimplementation in tests/test_classifier.py."""
    from ray.data.aggregate import Sum

    feats = _features_ds(sf_dir)
    if feats.count() == 0:
        return pd.DataFrame(
            {"metric": ["acc_bp", "auc_e6", "n_docs", "n_pos"], "value": [-1, -1, 0, 0]}
        ).astype({"metric": "object", "value": "int64"})
    w = train_weights(feats)

    def serve_partial(batch: pa.Table) -> pa.Table:
        """ONE scoring pass feeds BOTH serving consumers (the former
        hist_partial/lang_partial each recomputed eta+sigmoid over the
        whole feature table — review-found double scan): per-lang
        score partials ride as rows, the 20,002-cell histogram rides
        as one null-lang sentinel row (lang itself is fill_null'd to
        '' per the engine's null-key convention, so the sentinel can't
        collide)."""
        import pyarrow.compute as _pc

        X, y = _xy(batch)
        score = np.round(_sigmoid(_eta(X, w)) * 10_000).astype(np.int64)
        cells = np.bincount(score * 2 + y, minlength=20_002).astype(np.int64)
        t = pa.table(
            {"lang": _pc.fill_null(batch["lang"], ""), "s": pa.array(score)}
        )
        g = t.group_by("lang").aggregate([("s", "sum"), ("s", "count")])
        nl = g.num_rows
        lang_col = g["lang"]
        if isinstance(lang_col, pa.ChunkedArray):
            lang_col = lang_col.combine_chunks()
        return pa.table(
            {
                "lang": pa.concat_arrays(
                    [lang_col, pa.array([None], pa.string())]
                ),
                "s_sum": pa.concat_arrays(
                    [_pc.cast(g["s_sum"], pa.int64()).combine_chunks()
                     if isinstance(g["s_sum"], pa.ChunkedArray)
                     else _pc.cast(g["s_sum"], pa.int64()),
                     pa.array([0], pa.int64())]
                ),
                "s_count": pa.concat_arrays(
                    [_pc.cast(g["s_count"], pa.int64()).combine_chunks()
                     if isinstance(g["s_count"], pa.ChunkedArray)
                     else _pc.cast(g["s_count"], pa.int64()),
                     pa.array([0], pa.int64())]
                ),
                "part": pa.concat_arrays(
                    [pa.nulls(nl, pa.list_(pa.int64())),
                     pa.array([cells.tolist()], pa.list_(pa.int64()))]
                ),
            }
        )

    # partials are tiny (blocks × (langs+1) rows) — materialize once so
    # the two folds below don't re-execute the scoring map
    partials = feats.map_batches(
        serve_partial, batch_format="pyarrow"
    ).materialize()

    def keep_hist(b: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        return b.filter(_pc.is_valid(b["part"])).select(["part"])

    hist = _tree_sum(
        partials.map_batches(keep_hist, batch_format="pyarrow"), 20_002
    )

    def keep_lang(b: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        return b.filter(_pc.is_valid(b["lang"])).select(
            ["lang", "s_sum", "s_count"]
        )

    lang_rows = (
        partials.map_batches(keep_lang, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("s_sum", alias_name="s"), Sum("s_count", alias_name="c"))
        .to_pandas()
    )

    n_docs = int(hist.sum())
    n_pos = int(hist[1::2].sum())
    # predicted positive ⇔ score_bp ≥ 5000 (sigmoid ≥ 0.5)
    correct = int(hist[1::2][5000:].sum() + hist[0::2][:5000].sum())
    metrics = [
        ("acc_bp", correct * 10_000 // n_docs),
        ("auc_e6", _auc_e6(hist)),
        ("n_docs", n_docs),
        ("n_pos", n_pos),
    ]
    for _, r in lang_rows.sort_values("lang").iterrows():
        metrics.append((f"mean_score_bp:{r['lang']}", int(r["s"]) // int(r["c"])))
    out = pd.DataFrame(metrics, columns=["metric", "value"])
    return out.astype({"metric": "object", "value": "int64"}).reset_index(drop=True)


def score_texts(ds, weights, column: str = "text"):
    """Annotate any text dataset with the classifier score
    (``score_bp`` int64 column): one stateless vectorized pass under
    the broadcast weight vector — the serve half of the fastText
    curation pattern, reusable over crawl pages as well as the
    documents table."""
    w = np.asarray(weights, dtype=np.float64)

    def fn(batch: pa.Table) -> pa.Table:
        X = featurize_batch(batch[column], batch.num_rows)
        score = np.round(_sigmoid(_eta(X, w)) * 10_000).astype(np.int64)
        return batch.append_column("score_bp", pa.array(score))

    return ds.map_batches(fn, batch_format="pyarrow")


def classifier_gate(
    ds,
    sf_dir: str | None = None,
    weights=None,
    min_score_bp: int = 2500,
    column: str = "text",
    keep_score: bool = False,
):
    """Registry stage: filter a text dataset to rows the quality
    classifier scores ≥ ``min_score_bp``. Train-on-seed / apply-to-
    crawl: ``weights`` (pre-trained) wins; otherwise the model trains
    on ``sf_dir``'s labeled documents table first (the supervision
    source), then gates the flowing dataset. Output schema equals the
    input schema (score column dropped unless ``keep_score``), so the
    stage slots anywhere in the training composition."""
    if weights is None:
        if sf_dir is None:
            raise ValueError("classifier_gate needs weights or sf_dir")
        feats = _features_ds(sf_dir)
        weights = (
            train_weights(feats) if feats.count() else np.zeros(D, dtype=np.float64)
        )
    scored = score_texts(ds, weights, column)

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        out = batch.filter(pc.greater_equal(batch["score_bp"], pa.scalar(min_score_bp)))
        return out if keep_score else out.drop_columns(["score_bp"])

    return scored.map_batches(keep, batch_format="pyarrow")
