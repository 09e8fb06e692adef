"""TF-IDF top terms and q8 market share vs DuckDB at sf0.001."""

import duckdb
import pandas as pd
import pytest

from gotenberg_ray.pipelines import analytics2 as A2
from gotenberg_ray.pipelines import relational2 as R2
from gotenberg_ray.pipelines import tfidf as TF


def _con(sf_dir, tables):
    con = duckdb.connect()
    for t in tables:
        con.sql(f"CREATE VIEW {t} AS FROM '{sf_dir}/{t}.parquet'")
    return con


def _check(got, want):
    g = got.reindex(sorted(got.columns), axis=1).reset_index(drop=True)
    w = want.reindex(sorted(want.columns), axis=1).reset_index(drop=True)
    for c in w.columns:
        if str(w[c].dtype).startswith("int") or str(g[c].dtype).startswith("int"):
            w[c] = w[c].astype("int64")
            g[c] = g[c].astype("int64")
    pd.testing.assert_frame_equal(g, w)


@pytest.mark.usefixtures("ray_session")
def test_tfidf_matches_oracle(sf_dir):
    got = TF.tfidf_top_terms(sf_dir)
    con = _con(sf_dir, ["documents"])
    _check(got, con.sql(TF.TFIDF_SQL).df())
    # rare terms outrank common ones: every doc's rank-1 score >= rank-3
    r1 = got[got["rn"] == 1].set_index("doc_id")["score"]
    r3 = got[got["rn"] == 3].set_index("doc_id")["score"]
    common = r1.index.intersection(r3.index)
    assert (r1[common].values >= r3[common].values).all()


@pytest.mark.usefixtures("ray_session")
def test_half_spend_matches_oracle(sf_dir):
    got = A2.events_half_spend(sf_dir)
    con = _con(sf_dir, ["events"])
    _check(got, con.sql(A2.HALF_SPEND_SQL).df())


@pytest.mark.usefixtures("ray_session")
def test_q8_matches_oracle(sf_dir):
    got = R2.q8_market_share(sf_dir)
    con = _con(
        sf_dir, ["region", "nation", "customer", "supplier", "orders", "lineitem"]
    )
    _check(got, con.sql(R2.Q8_SQL).df())
    # share is a genuine fraction: 0 < nation <= total
    assert (got["nation_e4"] <= got["total_e4"]).all()
    assert got["nation_e4"].sum() > 0


@pytest.mark.usefixtures("ray_session")
def test_oov_rate_matches_oracle(sf_dir):
    got = TF.oov_rate(sf_dir)
    con = _con(sf_dir, ["documents"])
    _check(got, con.sql(TF.OOV_SQL).df())
    # sanity: rates are valid fractions and some docs contain OOV terms
    assert (got["oov_rate_e4"] <= 10_000).all()
    assert (got["n_oov"] <= got["n_tokens"]).all()


@pytest.mark.usefixtures("ray_session")
def test_bpe_pairs_matches_oracle(sf_dir):
    got = TF.bpe_top_pairs(sf_dir)
    con = _con(sf_dir, ["documents"])
    want = con.sql(TF.BPE_PAIRS_SQL).df()
    want["n"] = want["n"].astype("int64")
    pd.testing.assert_frame_equal(got, want)
    assert (got["n"] >= 1).all() and got["n"].is_monotonic_decreasing


@pytest.mark.usefixtures("ray_session")
class TestBpeTrain:
    def test_classic_example(self, ray_session, tmp_path):
        """The textbook BPE corpus: 'low'x5 'lower'x2 'newest'x6
        'widest'x3 — the first merges must assemble 'est</w>' then
        'low', in frequency order with deterministic ties."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        text = " ".join(["low"] * 5 + ["lower"] * 2
                        + ["newest"] * 6 + ["widest"] * 3)
        pq.write_table(
            pa.table({"doc_id": pa.array([0], pa.int64()),
                      "text": pa.array([text]),
                      "lang": pa.array(["en"]),
                      "n_chars": pa.array([len(text)], pa.int64())}),
            f"{tmp_path}/documents.parquet",
        )
        got = TF.bpe_train(str(tmp_path), n_merges=6, min_count=1)
        first = (got.loc[0, "left"], got.loc[0, "right"],
                 got.loc[0, "pair_count"])
        # 'e s' and 's t' both appear in newest(6)+widest(3) = 9;
        # the deterministic tie-break picks the lexicographically
        # smaller pair ('e','s')
        assert first == ("e", "s", 9)
        assert (got["merge_rank"] == range(len(got))).all()
        # 'est</w>' must have been assembled within the first merges
        assert any(got["left"] + got["right"] == "est</w>")

    def test_deterministic_and_bounded(self, sf_dir):
        a = TF.bpe_train(sf_dir, n_merges=10)
        b = TF.bpe_train(sf_dir, n_merges=10)
        pd.testing.assert_frame_equal(a, b)
        assert len(a) <= 10
        # counts are non-increasing? NOT guaranteed for BPE in general
        # (merged symbols create new pairs) — only positivity is
        assert (a["pair_count"] > 0).all()


@pytest.mark.usefixtures("ray_session")
class TestCoocLift:
    def test_known_collocation_wins(self, ray_session, tmp_path):
        """'new york' always co-occurs while filler tokens pair freely:
        the collocation must rank first with the exact lift value."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        rng = __import__("numpy").random.default_rng(11)
        filler = [f"f{i}" for i in range(10)]
        docs = []
        for _ in range(30):
            toks = list(rng.choice(filler, size=20))
            toks[7:7] = ["new", "york"]  # always adjacent
            docs.append(" ".join(toks))
        pq.write_table(
            pa.table({"doc_id": pa.array(range(30), pa.int64()),
                      "text": pa.array(docs),
                      "lang": pa.array(["en"] * 30),
                      "n_chars": pa.array([len(d) for d in docs], pa.int64())}),
            f"{tmp_path}/documents.parquet",
        )
        got = TF.cooc_lift_top_pairs(str(tmp_path), k=5)
        assert got.loc[0, "pair"] == "new york"
        # exact lift: c_xy=30, c_x=c_y=30, N=30*22
        assert got.loc[0, "lift_e4"] == (30 * 10_000 * 660) // (30 * 30)

    def test_matches_sql_twin(self, sf_dir):
        import duckdb

        got = TF.cooc_lift_top_pairs(sf_dir)
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS FROM '{sf_dir}/documents.parquet'")
        want = con.sql(TF.COOC_LIFT_SQL).df()
        for c in ("n_pair", "lift_e4"):
            want[c] = want[c].astype("int64")
        pd.testing.assert_frame_equal(got, want)


@pytest.mark.usefixtures("ray_session")
class TestBpeEncode:
    def test_parity_with_driver_reference_and_bounds(self, sf_dir):
        import duckdb

        from gotenberg_ray.pipelines import tfidf as T

        a = T.bpe_encode_stats(sf_dir)
        b = T.bpe_encode_stats(sf_dir)
        pd.testing.assert_frame_equal(a, b)
        # driver reference: encode every word with the same merges
        merges = T.bpe_train(sf_dir)
        ranks = {
            (l, r): int(k)
            for k, l, r in zip(
                merges["merge_rank"], merges["left"], merges["right"]
            )
        }
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS FROM '{sf_dir}/documents.parquet'")
        docs = con.sql("SELECT lang, text FROM documents").df()
        agg = {}
        cache = {}

        def wlen(w):
            if w not in cache:
                cache[w] = T.bpe_encode_word(w, ranks)
            return cache[w]

        for lang, text in zip(docs["lang"], docs["text"]):
            words = [w for w in (text or "").lower().split() if w]
            st = sum(wlen(w) for w in words)
            d = agg.setdefault(lang, [0, 0, 0])
            d[0] += 1
            d[1] += len(words)
            d[2] += st
        want = (
            pd.DataFrame(
                [
                    {"lang": k, "n_docs": v[0], "n_words": v[1],
                     "n_subtokens": v[2]}
                    for k, v in agg.items()
                ]
            )
            .sort_values("lang")
            .reset_index(drop=True)
        )
        for c in ("n_docs", "n_words", "n_subtokens"):
            want[c] = want[c].astype("int64")
        pd.testing.assert_frame_equal(a.reset_index(drop=True), want)
        # merges compress: fewer subtokens than the unmerged bound
        # (chars + </w> per word), never fewer than one per word
        assert (a["n_subtokens"] >= a["n_words"]).all()
