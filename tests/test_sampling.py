"""Deterministic sampling operators: layout-independence is the key
property — the sampled SET must not depend on block boundaries."""

import pandas as pd
import pytest

from gotenberg_ray.pipelines import sampling as SA


@pytest.mark.usefixtures("ray_session")
class TestSampling:
    def test_bernoulli_rate_and_determinism(self, sf_dir):
        a = SA.sample_bernoulli(sf_dir)
        b = SA.sample_bernoulli(sf_dir)
        pd.testing.assert_frame_equal(a, b)
        # ~10% of the 500 sf0.001 docs (hash-gated, not exact)
        assert 25 <= len(a) <= 75

    def test_bottomk_fixed_size(self, sf_dir):
        df = SA.sample_bottomk(sf_dir, k=17)
        assert len(df) == 17
        assert df["doc_id"].is_unique
        # subset-consistency: bottom-8 ⊂ bottom-17 (mergeable sketch)
        small = SA.sample_bottomk(sf_dir, k=8)
        assert set(small["doc_id"]) <= set(df["doc_id"])

    def test_stratified_per_group_cap(self, sf_dir):
        df = SA.sample_stratified(sf_dir, k=5)
        counts = df.groupby("lang").size()
        assert (counts <= 5).all()
        assert df["doc_id"].is_unique

    def test_mix_domains_tracks_weights(self, sf_dir):
        import duckdb

        got = SA.mix_domains(sf_dir)
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS FROM '{sf_dir}/documents.parquet'")
        want = con.sql(SA.MIX_DOMAINS_SQL).df()
        want["doc_id"] = want["doc_id"].astype("int64")
        pd.testing.assert_frame_equal(got, want)
        # heavier domains keep more docs on average
        kept = got.groupby("source").size()
        w = {s: 1 + int(s[3:]) % 4 for s in kept.index}
        light = [n for s, n in kept.items() if w[s] == 1]
        heavy = [n for s, n in kept.items() if w[s] >= 3]
        if light and heavy:
            assert sum(heavy) / len(heavy) > sum(light) / len(light)

    def test_weighted_sample_matches_oracle_and_skews_heavy(self, sf_dir):
        import duckdb

        got = SA.sample_weighted(sf_dir)
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS FROM '{sf_dir}/documents.parquet'")
        want = (
            con.sql(SA.SAMPLE_WEIGHTED_SQL)
            .df()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        for c in want.columns:
            want[c] = want[c].astype("int64")
        pd.testing.assert_frame_equal(got, want)
        corpus_avg = con.sql("SELECT avg(n_chars) FROM documents").fetchone()[0]
        assert got["n_chars"].mean() > corpus_avg  # heavy-doc skew


@pytest.mark.usefixtures("ray_session")
class TestSplitByGroup:
    def test_matches_oracle_and_dtypes(self, sf_dir):
        import duckdb

        got = SA.split_by_group(sf_dir)
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS FROM '{sf_dir}/documents.parquet'")
        want = con.sql(SA.SPLIT_BY_GROUP_SQL).df()
        pd.testing.assert_frame_equal(got, want)

    def test_no_group_straddles_splits(self, sf_dir):
        # the leakage guard itself: independently recompute the
        # doc-level assignment and check each source maps to ONE split
        import hashlib

        import duckdb

        con = duckdb.connect()
        docs = con.sql(
            f"SELECT source, count(*) AS n FROM '{sf_dir}/documents.parquet' "
            "GROUP BY source"
        ).df()
        buckets = docs["source"].map(
            lambda s: int(hashlib.md5(str(s).encode()).hexdigest()[:8], 16) % 100
        )
        split = buckets.map(
            lambda b: "train" if b < SA.TRAIN_PCT else ("val" if b < SA.VAL_PCT else "test")
        )
        per_split_docs = docs.groupby(split)["n"].sum()
        got = SA.split_by_group(sf_dir).set_index("split")["n_docs"]
        assert got.to_dict() == {k: int(v) for k, v in per_split_docs.items()}
        # every split present iff it owns at least one source; counts sum to corpus
        assert int(got.sum()) == int(docs["n"].sum())

    def test_covers_all_docs_and_determinism(self, sf_dir):
        a = SA.split_by_group(sf_dir)
        b = SA.split_by_group(sf_dir)
        pd.testing.assert_frame_equal(a, b)
        assert set(a["split"]).issubset({"train", "val", "test"})


@pytest.mark.usefixtures("ray_session")
class TestDsir:
    def _pandas_oracle(self, sf_dir):
        """Exact reimplementation of both DSIR passes in pandas."""
        import numpy as np

        from gotenberg_ray.functions.hashing import fnv64, splitmix64

        docs = pd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
        ).sort_values("doc_id")
        raw = np.zeros(SA.DSIR_BUCKETS, np.int64)
        tgt = np.zeros(SA.DSIR_BUCKETS, np.int64)
        per_doc = []
        import pyarrow as pa

        for _, r in docs.iterrows():
            toks = (r["text"] or "").lower().split()
            grams = toks + [a + " " + b for a, b in zip(toks, toks[1:])]
            if grams:
                b = (
                    fnv64(pa.array(grams, pa.string())) % np.uint64(SA.DSIR_BUCKETS)
                ).astype(np.int64)
            else:
                b = np.empty(0, np.int64)
            per_doc.append(b)
            np.add.at(raw, b, 1)
            if r["lang"] == "en":
                np.add.at(tgt, b, 1)
        w = np.log((tgt + SA.DSIR_ALPHA) / max(tgt.sum(), 1)) - np.log(
            (raw + SA.DSIR_ALPHA) / max(raw.sum(), 1)
        )
        scores = np.array([w[b].sum() if len(b) else 0.0 for b in per_doc])
        score_e6 = np.round(scores * 1e6).astype(np.int64)
        ids = docs["doc_id"].to_numpy().astype(np.int64)
        pri = splitmix64(ids.astype(np.uint64))
        k = min(SA._DSIR_SAMPLE_K, len(pri))
        sample = score_e6[np.argsort(pri, kind="stable")[:k]]
        q = np.sort(sample)[
            max(int(np.ceil((100 - SA.DSIR_KEEP_PCT) / 100 * k)) - 1, 0)
        ]
        return pd.DataFrame(
            {"doc_id": ids, "score_e6": score_e6,
             "selected": (score_e6 > q).astype("int64")}
        ).reset_index(drop=True)

    def test_matches_exact_reimplementation(self, sf_dir):
        got = SA.dsir_select(sf_dir)
        want = self._pandas_oracle(sf_dir)
        pd.testing.assert_frame_equal(got, want)

    def test_selected_fraction_and_monotonicity(self, sf_dir):
        got = SA.dsir_select(sf_dir)
        frac = got["selected"].mean()
        assert 0.05 <= frac <= 0.5  # ~KEEP_PCT with sample-quantile slack
        # selection is an upward-closed set in score
        assert got.loc[got["selected"] == 1, "score_e6"].min() > \
            got.loc[got["selected"] == 0, "score_e6"].max() - 1

    def test_deterministic(self, sf_dir):
        pd.testing.assert_frame_equal(SA.dsir_select(sf_dir), SA.dsir_select(sf_dir))


@pytest.mark.usefixtures("ray_session")
class TestMixTokenBudget:
    def test_matches_oracle(self, sf_dir):
        import duckdb

        got = SA.mix_token_budget(sf_dir)
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS FROM '{sf_dir}/documents.parquet'")
        want = con.sql(SA.MIX_TOKEN_BUDGET_SQL).df()
        want["doc_id"] = want["doc_id"].astype("int64")
        want["n_tok"] = want["n_tok"].astype("int64")
        pd.testing.assert_frame_equal(got, want)

    def test_budget_respected_with_one_doc_overshoot(self, sf_dir):
        got = SA.mix_token_budget(sf_dir)
        # recompute budgets exactly as the operator defines them
        import pyarrow.parquet as pq

        docs = pq.read_table(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"]
        ).to_pandas()
        docs["n_tok"] = [
            len([t for t in (s or "").split() if t]) for s in docs["text"]
        ]
        per_src = docs.groupby("source")["n_tok"].sum()
        total = int(per_src.sum())
        w = {s: 1 + int(s[3:]) % 4 for s in per_src.index}
        sum_w = sum(w.values())
        kept = got.groupby("source")["n_tok"].sum()
        max_tok = docs.groupby("source")["n_tok"].max()
        for s, kept_toks in kept.items():
            budget = w[s] * (total // 4) // sum_w
            # greedy prefix: ≥ budget only by the final doc's overshoot
            assert kept_toks < budget + int(max_tok[s]) + 1
            # and the budget is actually used (not under-filled while
            # unkept docs remain)
            if kept_toks < budget:
                assert len(got[got["source"] == s]) == int(
                    (docs["source"] == s).sum()
                )

    def test_deterministic(self, sf_dir):
        a = SA.mix_token_budget(sf_dir)
        b = SA.mix_token_budget(sf_dir)
        pd.testing.assert_frame_equal(a, b)
