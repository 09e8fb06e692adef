"""SemDeDup-style semantic dedup: greedy-invariant and determinism
checks (the k-means step has no SQL twin — rows-only at the driver)."""

import numpy as np
import pandas as pd
import pytest

from gotenberg_ray.pipelines import embedops as E


@pytest.fixture(scope="module")
def result(sf_dir):
    return E.semdedup(sf_dir)


@pytest.mark.usefixtures("ray_session")
class TestSemDedup:
    def test_covers_every_vector_once(self, result, sf_dir):
        emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id"])
        assert sorted(result["vec_id"]) == sorted(emb["vec_id"])
        assert result["vec_id"].is_unique

    def test_deterministic(self, result, sf_dir):
        pd.testing.assert_frame_equal(result, E.semdedup(sf_dir))

    def test_greedy_invariants(self, result, sf_dir):
        """Pruned ⇒ an earlier kept in-cluster vector is above the
        threshold; kept ⇒ no earlier kept in-cluster vector is."""
        emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
        vecs = {
            int(r.vec_id): np.asarray(r.embedding, dtype=np.float64)
            for r in emb.itertuples()
        }
        for v in vecs:
            vecs[v] = vecs[v] / np.linalg.norm(vecs[v])
        thr = E.DUP_THRESHOLD
        for cid, grp in result.groupby("cluster_id"):
            grp = grp.sort_values("vec_id")
            kept: list[int] = []
            for row in grp.itertuples():
                sims = [float(vecs[row.vec_id] @ vecs[k]) for k in kept]
                should_keep = not any(s > thr for s in sims)
                assert bool(row.keep) == should_keep, (cid, row.vec_id)
                if should_keep:
                    kept.append(row.vec_id)

    def test_aggressive_threshold_prunes_more(self, sf_dir):
        """Lowering the similarity threshold must prune MORE vectors
        (monotonicity), and an aggressive threshold must prune some
        (non-degeneracy) — the SemDeDup operating regime."""
        tight = E.semdedup(sf_dir, threshold=0.9)
        loose = E.semdedup(sf_dir, threshold=0.2)
        assert (loose["keep"] == 0).sum() > (tight["keep"] == 0).sum()
        assert (loose["keep"] == 0).any()


@pytest.mark.usefixtures("ray_session")
class TestRerank:
    def test_deterministic_and_within_candidates(self, sf_dir):
        a = E.rerank_topk(sf_dir, k=5, k0=30)
        b = E.rerank_topk(sf_dir, k=5, k0=30)
        pd.testing.assert_frame_equal(a, b)
        assert list(a["rank"]) == [1, 2, 3, 4, 5]
        assert a["rerank_score_e6"].is_monotonic_decreasing or len(a) <= 1

    def test_rerank_restricted_to_recall_set(self, sf_dir):
        """Widening k0 can only change results via the candidate set —
        with k0 = corpus the rerank is the global optimum, and the
        k0=30 result must score no higher than it."""
        small = E.rerank_topk(sf_dir, k=1, k0=10)
        wide = E.rerank_topk(sf_dir, k=1, k0=400)
        assert (
            wide["rerank_score_e6"].iloc[0] >= small["rerank_score_e6"].iloc[0]
        )


@pytest.mark.usefixtures("ray_session")
def test_doc_embedding_join_matches_oracle(sf_dir):
    import duckdb

    got = E.doc_embedding_stats(sf_dir)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS FROM '{sf_dir}/documents.parquet'")
    con.sql(f"CREATE VIEW embeddings AS FROM '{sf_dir}/embeddings.parquet'")
    want = con.sql(E.DOC_EMB_SQL).df()
    for c in ("label", "total_chars", "n_docs"):
        want[c] = want[c].astype("int64")
    pd.testing.assert_frame_equal(
        got.reindex(sorted(got.columns), axis=1),
        want.reindex(sorted(want.columns), axis=1),
    )
    # every embedded doc is covered exactly once
    assert got["n_docs"].sum() == 500
