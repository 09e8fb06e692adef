"""Inverted-index retrieval and bucketed-layout aggregation: pruning
evidence, idempotent rebuild, and SQL parity at sf0.001."""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from gotenberg_ray.pipelines import layout as LY
from gotenberg_ray.pipelines import search as SE


@pytest.mark.usefixtures("ray_session")
class TestSearch:
    def test_matches_sql_twin_and_prunes(self, sf_dir):
        a = SE.search_topk(sf_dir)
        b = SE.search_topk(sf_dir)  # idempotent: index reused
        pd.testing.assert_frame_equal(a, b)
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS FROM '{sf_dir}/documents.parquet'")
        want = con.sql(SE.SEARCH_SQL).df()
        for c in want.columns:
            want[c] = want[c].astype("int64")
        pd.testing.assert_frame_equal(a.reset_index(drop=True), want)
        # the lookup opens only the query terms' buckets
        assert len(SE._query_buckets(SE.QUERY_TERMS)) < SE.INDEX_P
        # the index is partitioned on disk
        path = SE._index_path(sf_dir)
        assert len([d for d in os.listdir(path) if d.startswith("bucket-")]) > 1
        assert (a["n_terms"] <= len(SE.QUERY_TERMS)).all()


@pytest.mark.usefixtures("ray_session")
class TestBucketedTotals:
    def test_matches_sql_twin(self, sf_dir):
        a = LY.bucketed_customer_totals(sf_dir)
        b = LY.bucketed_customer_totals(sf_dir)  # layout reused
        pd.testing.assert_frame_equal(a, b)
        con = duckdb.connect()
        con.sql(f"CREATE VIEW orders AS FROM '{sf_dir}/orders.parquet'")
        want = con.sql(LY.BUCKETED_SQL).df()
        for c in want.columns:
            want[c] = want[c].astype("int64")
        pd.testing.assert_frame_equal(a.reset_index(drop=True), want)


class TestMaxSim:
    def test_matches_bruteforce_reference(self, ray_session, sf_dir):
        """Exact maxsim vs a whole-matrix numpy reference."""
        import pyarrow.parquet as pq

        from gotenberg_ray.pipelines import embedops as E

        got = E.maxsim_topk(sf_dir)
        t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
        ids = t.column("vec_id").to_numpy(zero_copy_only=False)
        M = np.stack([np.asarray(v, dtype=np.float64) for v in t.column("embedding").to_pylist()])
        M /= np.linalg.norm(M, axis=1, keepdims=True)
        qmask = np.isin(ids, list(E.MULTI_QUERY_IDS))
        Q = M[qmask][np.argsort(ids[qmask])]
        cmask = ids > max(E.MULTI_QUERY_IDS)
        sims = M[cmask] @ Q.T
        gid = ids[cmask] // E.GROUP_SIZE
        order = np.argsort(gid, kind="stable")
        gid, sims = gid[order], sims[order]
        starts = np.flatnonzero(np.r_[True, gid[1:] != gid[:-1]])
        score = np.maximum.reduceat(sims, starts, axis=0).sum(axis=1)
        gids = gid[starts]
        top = np.lexsort((gids, -score))[:10]
        assert got["gid"].tolist() == gids[top].tolist()
        assert got["rank"].tolist() == list(range(1, len(top) + 1))

    def test_partial_max_layout_invariance(self, ray_session, sf_dir, tmp_path):
        """Groups straddling tiny row groups fold to the same ranking
        (per-term max partials merge exactly)."""
        import pyarrow.parquet as pq

        from gotenberg_ray.pipelines import embedops as E

        d = tmp_path / "relayout"
        d.mkdir()
        t = pq.read_table(f"{sf_dir}/embeddings.parquet")
        pq.write_table(t, d / "embeddings.parquet", row_group_size=7)
        a = E.maxsim_topk(sf_dir)
        b = E.maxsim_topk(str(d))
        pd.testing.assert_frame_equal(a, b)


class TestHardNegatives:
    def test_no_same_label_and_matches_bruteforce(self, ray_session, sf_dir):
        import pyarrow.parquet as pq

        from gotenberg_ray.pipelines import embedops as E

        got = E.hard_negative_mining(sf_dir)
        t = pq.read_table(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding", "label"]
        )
        ids = t.column("vec_id").to_numpy(zero_copy_only=False)
        labels = t.column("label").to_numpy(zero_copy_only=False)
        M = np.stack([np.asarray(v, np.float64) for v in t.column("embedding").to_pylist()])
        M /= np.linalg.norm(M, axis=1, keepdims=True)
        lab = dict(zip(ids.tolist(), labels.tolist()))
        for qid in E.MULTI_QUERY_IDS:
            qrow = np.flatnonzero(ids == qid)[0]
            mask = (~np.isin(ids, list(E.MULTI_QUERY_IDS))) & (labels != labels[qrow])
            sims = M[mask] @ M[qrow]
            cand_ids = ids[mask]
            order = np.lexsort((cand_ids, -sims))[:10]
            want = cand_ids[order].tolist()
            g = got[got["query_id"] == qid]
            assert g["vec_id"].tolist() == want
            # every mined negative has a different label than the query
            assert all(lab[v] != labels[qrow] for v in g["vec_id"])


class TestBM25:
    def test_matches_whole_corpus_reference(self, ray_session, sf_dir):
        """Distributed BM25 ranking == a straight pandas/numpy BM25
        over the whole corpus (raw tokenization, no index)."""
        from gotenberg_ray.pipelines import search as S

        got = S.search_bm25(sf_dir)
        docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        toks = docs["text"].fillna("").str.split()
        dl = toks.str.len().to_numpy()
        n = len(docs)
        avgdl = dl.sum() / n
        scores = {}
        for term in S.QUERY_TERMS:
            tf = toks.apply(lambda ws: ws.count(term)).to_numpy()
            df = int((tf > 0).sum())
            idf = np.log((n - df + 0.5) / (df + 0.5) + 1.0)
            m = tf > 0
            contrib = idf * tf[m] * (S.BM25_K1 + 1.0) / (
                tf[m] + S.BM25_K1 * (1.0 - S.BM25_B + S.BM25_B * dl[m] / avgdl)
            )
            for d, c in zip(docs["doc_id"].to_numpy()[m], contrib):
                scores[d] = scores.get(d, 0.0) + c
        ids = np.array(list(scores))
        sc = np.array([scores[i] for i in ids])
        top = np.lexsort((ids, -sc))[:10]
        assert got["doc_id"].tolist() == ids[top].tolist()

    def test_idf_downweights_common_terms(self, ray_session, tmp_path):
        """A term in every doc contributes ~nothing: ranking follows the
        rare term, not the ubiquitous one."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from gotenberg_ray.pipelines import search as S

        d = tmp_path / "bm"
        d.mkdir()
        rows = []
        for i in range(40):
            text = "join " * 3  # ubiquitous term
            if i == 7:
                text += "hash hash hash hash "  # rare, heavy in doc 7
            if i == 11:
                text += "hash "
            rows.append((i, text + f"filler{i} " * 5))
        pq.write_table(
            pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                      "text": pa.array([r[1] for r in rows], pa.string())}),
            d / "documents.parquet",
        )
        out = S.search_bm25(str(d))
        assert out["doc_id"].iloc[0] == 7
        assert out["doc_id"].iloc[1] == 11


@pytest.mark.usefixtures("ray_session")
class TestIndexKillResume:
    """The retrieval index is a resumable artifact (VERDICT r4 next
    #7): a killed build resumes at bucket granularity, complete buckets
    are never rewritten, the persisted corpus stats survive, and the
    ranking is unchanged after healing."""

    def _mtimes(self, path):
        out = {}
        for d in os.listdir(path):
            if d.startswith("bucket-"):
                f = os.path.join(path, d, "part.parquet")
                if os.path.exists(f):
                    out[d] = os.stat(f).st_mtime_ns
        return out

    def test_bm25_index_build_resumes_after_kill(self, sf_dir, tmp_path):
        import shutil

        # private corpus copy so scratch identity is test-local
        corpus = tmp_path / "corpus"
        corpus.mkdir()
        shutil.copy(f"{sf_dir}/documents.parquet", corpus / "documents.parquet")
        sf = str(corpus)

        baseline = SE.search_bm25(sf)  # full build + probe
        path = SE._bm25_index_path(sf)
        before = self._mtimes(path)
        assert len(before) > 1
        stats_before = open(os.path.join(path, "_STATS.json")).read()

        # simulate a mid-build kill: two buckets torn (marker gone,
        # data gone), stats file lost with them. A killed build never
        # reached the layout-level _ALL_COMPLETE marker either — drop
        # it so the simulation is faithful (the marker is only written
        # after every bucket completed)
        killed = sorted(before)[:2]
        for d in killed:
            shutil.rmtree(os.path.join(path, d))
        os.unlink(os.path.join(path, "_STATS.json"))
        os.unlink(os.path.join(path, "_ALL_COMPLETE"))

        healed = SE.search_bm25(sf)  # resume: rebuild ONLY the holes
        pd.testing.assert_frame_equal(healed, baseline)
        after = self._mtimes(path)
        assert set(after) == set(before)
        for d in before:
            if d in killed:
                assert after[d] > before[d], "killed bucket must rebuild"
            else:
                assert after[d] == before[d], "complete bucket must not rewrite"
        assert open(os.path.join(path, "_STATS.json")).read() == stats_before

    def test_probe_reads_only_probed_buckets(self, sf_dir):
        # query terms hash to a strict subset of the bucket space, and
        # the probe path enumerates exactly those bucket files
        bs = SE._query_buckets(SE.QUERY_TERMS)
        assert 0 < len(bs) <= len(SE.QUERY_TERMS) < SE.INDEX_P
        path = SE.build_bm25_index(sf_dir)
        probed = [
            os.path.join(path, f"bucket-{b}", "part.parquet") for b in bs
        ]
        all_buckets = [
            d for d in os.listdir(path) if d.startswith("bucket-")
        ]
        assert len(probed) < len(all_buckets)

    def test_stats_file_matches_corpus(self, sf_dir):
        import json

        import pyarrow.parquet as pq

        path = SE.build_bm25_index(sf_dir)
        with open(os.path.join(path, "_STATS.json")) as f:
            stats = json.load(f)
        n = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
        assert stats["n_docs"] == n
        assert stats["total_tokens"] > 0
