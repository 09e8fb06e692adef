"""MMR diverse top-k: slow-loop reference parity, the diversity
property (a near-duplicate of the #1 hit must NOT be picked second
even though it is #2 by relevance), determinism, and shortlist
restriction."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from gotenberg_ray.pipelines import embedops as E


def _write_embeddings(tmp_path, vecs):
    """vecs: dict vec_id -> list[float]; vec_id 0 is the query row."""
    ids = sorted(vecs)
    t = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(
                [list(map(float, vecs[i])) for i in ids], pa.list_(pa.float32())
            ),
            "label": pa.array([0] * len(ids), pa.int32()),
        }
    )
    pq.write_table(t, tmp_path / "embeddings.parquet")
    return str(tmp_path)


def _mmr_reference(vecs, k, k0, lam_e2=E.MMR_LAMBDA_E2):
    """Explicit-loop MMR (independent of the library's mmr_greedy)."""
    q = np.asarray(vecs[0], dtype=np.float64)
    qn = q / np.linalg.norm(q)
    cand = []
    for vid, v in vecs.items():
        if vid == 0:
            continue
        vn = np.asarray(v, dtype=np.float64)
        vn = vn / np.linalg.norm(vn)
        cand.append((vid, vn, float(vn @ qn)))
    cand.sort(key=lambda c: (-c[2], c[0]))
    cand = cand[:k0]
    rel = {vid: int(round(s * 1e6)) for vid, _, s in cand}
    units = {vid: vn for vid, vn, _ in cand}
    selected, out = [], []
    remaining = [vid for vid, _, _ in cand]
    for _ in range(min(k, len(cand))):
        best_vid, best_score = None, None
        for vid in remaining:
            if selected:
                mx = max(
                    int(round(float(units[vid] @ units[s]) * 1e6)) for s in selected
                )
                score = rel[vid] * lam_e2 - mx * (100 - lam_e2)
            else:
                score = rel[vid] * lam_e2
            if best_score is None or score > best_score or (
                score == best_score and vid < best_vid
            ):
                best_vid, best_score = vid, score
        out.append((best_vid, best_score))
        selected.append(best_vid)
        remaining.remove(best_vid)
    return out


def _world(seed=7, n=40, dim=8):
    rng = np.random.RandomState(seed)
    vecs = {0: rng.randn(dim)}
    for i in range(1, n + 1):
        vecs[i] = rng.randn(dim)
    # vec 101: near-duplicate of vec 1 nudged toward the query so the
    # pair holds relevance ranks 1-2
    best = max(
        (i for i in range(1, n + 1)),
        key=lambda i: float(
            (vecs[i] / np.linalg.norm(vecs[i]))
            @ (vecs[0] / np.linalg.norm(vecs[0]))
        ),
    )
    vecs[101] = vecs[best] + 0.001 * rng.randn(dim)
    return vecs, best


def test_mmr_matches_loop_reference(ray_session, tmp_path):
    vecs, _ = _world()
    sf = _write_embeddings(tmp_path, vecs)
    got = E.mmr_diverse_topk(sf, k=8, k0=20)
    exp = _mmr_reference(vecs, k=8, k0=20)
    assert list(zip(got["vec_id"], got["mmr_score_e8"])) == exp


def test_mmr_suppresses_near_duplicate(ray_session, tmp_path):
    vecs, best = _world()
    sf = _write_embeddings(tmp_path, vecs)
    got = E.mmr_diverse_topk(sf, k=5, k0=20)
    picked = got["vec_id"].tolist()
    # the near-dup pair occupies relevance ranks 1-2; MMR must not
    # take both in its first two picks
    assert not ({best, 101} <= set(picked[:2]))


def test_mmr_deterministic(ray_session, tmp_path):
    vecs, _ = _world(seed=11)
    sf = _write_embeddings(tmp_path, vecs)
    a = E.mmr_diverse_topk(sf, k=6, k0=15)
    b = E.mmr_diverse_topk(sf, k=6, k0=15)
    pd.testing.assert_frame_equal(a, b)


def test_unit_rows_zero_norm_guard():
    """An all-zero embedding row gets similarity 0 (ranks last) instead
    of NaN — the ADVICE r4 zero-norm guard."""
    import numpy as np

    from gotenberg_ray.pipelines.embedops import _unit_rows

    m = np.array([[3.0, 4.0], [0.0, 0.0], [1.0, 0.0]])
    u = _unit_rows(m)
    assert np.allclose(u[0], [0.6, 0.8])
    assert np.all(u[1] == 0.0) and not np.isnan(u).any()
    q = np.array([1.0, 0.0])
    sims = u @ q
    assert sims[1] == 0.0  # zero row never outranks a real match
