"""Pin tests for the distributed quality classifier.

The core pin: an EXACT single-machine reimplementation of the whole
procedure (featurize → quantized IRLS → histogram metrics) built from
the documented spec with the SCALAR hash helpers — the distributed
path must match it bit-for-bit, which holds because every cross-task
fold is integer addition and every per-row float depends only on the
row and the broadcast weights (the ascending-j eta contract)."""

from __future__ import annotations

from fractions import Fraction

import numpy as np
import pandas as pd
import pytest

from gotenberg_ray.functions.hashing import fnv64_one, splitmix64
from gotenberg_ray.pipelines import classifier as C


def _reference_metrics(docs: pd.DataFrame) -> pd.DataFrame:
    """Independent single-machine reimplementation from the spec."""
    n = len(docs)
    X = np.zeros((n, C.D), dtype=np.int64)
    X[:, 0] = 1
    for i, t in enumerate(docs["text"].fillna("")):
        toks = t.split()
        hs = [fnv64_one(w) for w in toks]
        for h in hs:
            X[i, 1 + h % C.U_BUCKETS] += 1
        for a, b in zip(hs, hs[1:]):
            bh = splitmix64(a ^ splitmix64(b))
            X[i, 1 + C.U_BUCKETS + bh % C.B_BUCKETS] += 1
    X[:, 1:] = np.minimum(X[:, 1:], C.COUNT_CAP)
    y = (docs["lang"] == C.TARGET_LANG).to_numpy().astype(np.float64)

    def eta_of(w):
        e = np.zeros(n, dtype=np.float64)
        for j in range(C.D):
            e += w[j] * X[:, j]
        return e

    def sigmoid(e):
        out = np.empty_like(e)
        pos = e >= 0
        out[pos] = 1.0 / (1.0 + np.exp(-e[pos]))
        ex = np.exp(e[~pos])
        out[~pos] = ex / (1.0 + ex)
        return out

    w = np.zeros(C.D, dtype=np.float64)
    for _ in range(C.ITERS):
        mu = sigmoid(eta_of(w))
        s = np.round(mu * (1.0 - mu) * C.SCALE).astype(np.int64)
        g = np.round((y - mu) * C.SCALE).astype(np.int64)
        H = (X * s[:, None]).T @ X  # int64-exact
        gv = X.T @ g
        w = w + np.linalg.solve(
            H.astype(np.float64) / C.SCALE + C.RIDGE * np.eye(C.D),
            gv.astype(np.float64) / C.SCALE - C.RIDGE * w,
        )

    score = np.round(sigmoid(eta_of(w)) * 10_000).astype(np.int64)
    yi = y.astype(np.int64)
    hist = np.bincount(score * 2 + yi, minlength=20_002).astype(np.int64)
    P, N = int(yi.sum()), int((1 - yi).sum())
    pos_h, neg_h = hist[1::2], hist[0::2]
    before, rank_sum = 0, Fraction(0)
    for v in range(10_001):
        c = int(pos_h[v] + neg_h[v])
        if c:
            rank_sum += Fraction(2 * before + c + 1, 2) * int(pos_h[v])
            before += c
    auc = (
        int((rank_sum - Fraction(P * (P + 1), 2)) * 1_000_000 // (P * N))
        if P and N
        else -1
    )
    correct = int(pos_h[5000:].sum() + neg_h[:5000].sum())
    rows = [
        ("acc_bp", correct * 10_000 // n),
        ("auc_e6", auc),
        ("n_docs", n),
        ("n_pos", P),
    ]
    for lang in sorted(docs["lang"].unique()):
        m = (docs["lang"] == lang).to_numpy()
        rows.append((f"mean_score_bp:{lang}", int(score[m].sum()) // int(m.sum())))
    return pd.DataFrame(rows, columns=["metric", "value"]).astype(
        {"metric": "object", "value": "int64"}
    )


@pytest.mark.usefixtures("ray_session")
def test_quality_classifier_matches_reference_exactly(sf_dir):
    got = C.quality_classifier(sf_dir)
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text", "lang"])
    want = _reference_metrics(docs)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True)
    )


@pytest.mark.usefixtures("ray_session")
def test_quality_classifier_separates_target(sf_dir):
    got = C.quality_classifier(sf_dir).set_index("metric")["value"]
    assert got["auc_e6"] >= 600_000  # clearly better than chance
    means = {k.split(":", 1)[1]: v for k, v in got.items() if k.startswith("mean_score_bp:")}
    assert means["en"] == max(means.values())  # target slice scores highest
    assert got["acc_bp"] > 5_000


@pytest.mark.usefixtures("ray_session")
def test_quality_classifier_layout_invariance(sf_dir, tmp_path):
    """Bit-identical metrics when the corpus arrives in many tiny
    row-groups (different block layout → different batch composition
    → same integer partial sums)."""
    import pyarrow.parquet as pq

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    d = tmp_path / "relayout"
    d.mkdir()
    import pyarrow as pa

    pq.write_table(pa.Table.from_pandas(docs), d / "documents.parquet", row_group_size=37)
    a = C.quality_classifier(sf_dir)
    b = C.quality_classifier(str(d))
    pd.testing.assert_frame_equal(a, b)


@pytest.mark.usefixtures("ray_session")
def test_quality_classifier_empty_corpus(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "empty"
    d.mkdir()
    pq.write_table(
        pa.table({"text": pa.array([], pa.string()), "lang": pa.array([], pa.string()),
                  "doc_id": pa.array([], pa.int64()), "source": pa.array([], pa.string()),
                  "n_chars": pa.array([], pa.int64())}),
        d / "documents.parquet",
    )
    out = C.quality_classifier(str(d)).set_index("metric")["value"]
    assert out["n_docs"] == 0 and out["auc_e6"] == -1
