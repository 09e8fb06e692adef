"""Sequence packing (distributed order-preserving prefix sum) vs the
DuckDB window oracle, plus partitioning-independence."""

import duckdb
import pandas as pd
import pytest

from gotenberg_ray.pipelines import packing as P


@pytest.mark.usefixtures("ray_session")
def test_matches_window_oracle(sf_dir):
    got = P.pack_sequences(sf_dir)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS FROM '{sf_dir}/documents.parquet'")
    want = con.sql(P.PACK_SQL).df()
    for c in want.columns:
        want[c] = want[c].astype("int64")
        got[c] = got[c].astype("int64")
    pd.testing.assert_frame_equal(
        got.reindex(sorted(got.columns), axis=1),
        want.reindex(sorted(want.columns), axis=1),
    )


@pytest.mark.usefixtures("ray_session")
def test_bucket_count_invariant(sf_dir):
    """The prefix sum must not depend on the range partitioning — the
    100 TB correctness property (more buckets on a bigger cluster,
    same offsets)."""
    a = P.pack_sequences(sf_dir, num_buckets=3)
    b = P.pack_sequences(sf_dir, num_buckets=32)
    pd.testing.assert_frame_equal(a, b)


@pytest.mark.usefixtures("ray_session")
def test_offsets_are_contiguous(sf_dir):
    got = P.pack_sequences(sf_dir).sort_values("doc_id").reset_index(drop=True)
    # each doc starts exactly where the previous one ended
    expect = (got["n_tokens"].cumsum() - got["n_tokens"]).astype("int64")
    assert (got["start_offset"] == expect).all()
    assert (got["pack_id"] == got["start_offset"] // 512).all()


@pytest.mark.usefixtures("ray_session")
def test_chunking_matches_oracle_and_covers(sf_dir):
    got = P.chunk_documents(sf_dir)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS FROM '{sf_dir}/documents.parquet'")
    want = con.sql(P.CHUNK_SQL).df()
    for c in want.columns:
        want[c] = want[c].astype("int64")
    pd.testing.assert_frame_equal(got, want)
    # windows tile each doc: consecutive starts advance by the stride,
    # every chunk is non-empty except possibly for empty docs
    per = got.groupby("doc_id")
    assert (per["chunk_id"].max() + 1 == per.size()).all()
    multi = got[got["doc_id"].isin(per.size()[per.size() > 1].index)]
    assert (multi["n_tok"] > 0).all()


@pytest.mark.usefixtures("ray_session")
def test_shuffled_packing_matches_oracle_and_permutes(sf_dir):
    got = P.pack_shuffled(sf_dir)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS FROM '{sf_dir}/documents.parquet'")
    want = con.sql(P.PACK_SHUFFLED_SQL).df()
    for c in want.columns:
        want[c] = want[c].astype("int64")
    pd.testing.assert_frame_equal(
        got.reindex(sorted(got.columns), axis=1),
        want.reindex(sorted(want.columns), axis=1),
    )
    # the shuffle genuinely permutes: stream order != id order, but
    # still covers every token exactly once
    by_pos = got.sort_values("shuffle_pos")
    assert list(by_pos["doc_id"]) != list(sorted(by_pos["doc_id"]))
    expect = (by_pos["n_tokens"].cumsum() - by_pos["n_tokens"]).astype("int64")
    assert (by_pos["start_offset"].to_numpy() == expect.to_numpy()).all()


# ------------------------------------- content-defined chunking dedup


def _gear_reference_chunks(text: str):
    """Independent scalar Gear chunker (recurrence form) — must equal
    the vectorized windowed-sum kernel byte for byte."""
    from gotenberg_ray.pipelines import packing as PK

    G = PK._gear_table()
    M = 0xFFFFFFFFFFFFFFFF
    data = text.encode("utf-8")
    cands = []
    h = 0
    for i, b in enumerate(data):
        h = ((h << 1) + int(G[b])) & M
        if (h >> (64 - PK.GEAR_KBITS)) == 0:
            cands.append(i + 1)
    import numpy as np

    cands = np.asarray(cands, dtype=np.int64)
    cuts, last = [], 0
    while last < len(data):
        j = int(np.searchsorted(cands, last + PK.GEAR_MIN))
        if j < len(cands) and cands[j] - last <= PK.GEAR_MAX:
            nxt = int(cands[j])
        else:
            nxt = min(last + PK.GEAR_MAX, len(data))
        cuts.append(nxt)
        last = nxt
    return [data[a:b] for a, b in zip([0] + cuts[:-1], cuts)]


def test_gear_cut_points_match_scalar_reference():
    import numpy as np

    from gotenberg_ray.pipelines import packing as PK

    rng = np.random.default_rng(5)
    words = ["alpha", "beta", "gamma", "δelta", "εpsilon", "zeta", "η"]
    docs = [
        " ".join(words[i] for i in rng.integers(0, len(words), ln))
        for ln in rng.integers(0, 400, 30)
    ]
    flat = b"".join(d.encode("utf-8") for d in docs)
    offs = np.cumsum([0] + [len(d.encode("utf-8")) for d in docs]).astype(np.int64)
    data = np.frombuffer(flat, dtype=np.uint8).copy()
    got = PK.gear_cut_points(data, offs)
    for d, (doc, cuts) in enumerate(zip(docs, got)):
        ref = _gear_reference_chunks(doc)
        rel = (cuts - offs[d]).tolist()
        exp = np.cumsum([len(c) for c in ref]).tolist()
        assert rel == exp, d
        # invariants: chunks within [MIN, MAX] except the final tail
        sizes = np.diff(np.r_[0, np.asarray(rel)])
        assert all(s <= PK.GEAR_MAX for s in sizes)
        assert all(s >= PK.GEAR_MIN for s in sizes[:-1])


def test_chunk_hashes_distinguish_content_and_respect_equality():
    import numpy as np

    from gotenberg_ray.pipelines import packing as PK

    a = b"the quick brown fox jumps over the lazy dog once more and again"
    data = np.frombuffer(a + a + b"THE QUICK BROWN FOX!", dtype=np.uint8).copy()
    la = len(a)
    starts = np.array([0, la, 2 * la], dtype=np.int64)
    ends = np.array([la, 2 * la, len(data)], dtype=np.int64)
    h = PK._chunk_hashes(data, starts, ends)
    assert h[0] == h[1]  # identical content, different positions
    assert h[0] != h[2]


def test_dedup_gear_chunks_duplication_accounting(ray_session, tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from gotenberg_ray.pipelines import packing as PK

    rng = np.random.default_rng(9)
    words = ["data", "table", "row", "scan", "batch", "merge", "key"]
    mk = lambda ln: " ".join(words[i] for i in rng.integers(0, len(words), ln))
    uniq = [mk(200) for _ in range(6)]
    dup = mk(300)
    docs = uniq + [dup, dup]  # one exact pair
    t = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array(docs),
            "lang": pa.array(["en"] * len(docs)),
            "source": pa.array(
                ["s0"] * 4 + ["s1"] * 2 + ["s1", "s1"]
            ),
            "n_chars": pa.array([len(d) for d in docs], pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    df = PK.dedup_gear_chunks(str(tmp_path))

    # driver reference: chunk every doc with the scalar chunker, count
    # chunk CONTENT occurrences corpus-wide, attribute per source
    from collections import Counter

    chunks = [(_gear_reference_chunks(d), s) for d, s in zip(docs, t["source"].to_pylist())]
    cnt = Counter(c for cs, _ in chunks for c in cs)
    exp = {}
    for cs, s in chunks:
        e = exp.setdefault(s, [0, 0, 0, 0])  # n, dup, total_b, dup_b
        for c in cs:
            e[0] += 1
            e[2] += len(c)
            if cnt[c] > 1:
                e[1] += 1
                e[3] += len(c)
    for _, r in df.iterrows():
        e = exp[r["source"]]
        assert (
            int(r["n_chunks"]),
            int(r["dup_chunks"]),
            int(r["total_bytes"]),
            int(r["dup_bytes"]),
        ) == tuple(e), r["source"]
    assert set(df["source"]) == set(exp)
    # the duplicated doc guarantees s1 has duplicated bytes
    s1 = df[df["source"] == "s1"].iloc[0]
    assert int(s1["dup_bytes"]) >= 2 * len(dup.encode()) - PK.GEAR_MAX


class TestPackInterleaved:
    def test_budgets_hold_within_packs(self, ray_session, sf_dir):
        from gotenberg_ray.pipelines.packing import pack_interleaved

        df = pack_interleaved(sf_dir, ctx_tokens=512, ctx_media=8)
        assert len(df) > 0
        # chunk-split semantics: within a (pack_t, pack_m) cell, the
        # exclusive-prefix token span < ctx_tokens and media span <
        # ctx_media — equivalently, total minus the last member's own
        # count stays under the budget
        for (_, _), g in df.groupby(["pack_t", "pack_m"]):
            assert g["n_tokens"].sum() - g["n_tokens"].iloc[-1] < 512
            assert g["n_media"].sum() - g["n_media"].iloc[-1] < 8
        # both budget dimensions actually bind on this corpus
        assert df["pack_t"].nunique() > 1
        assert df["pack_m"].nunique() > 1

    def test_matches_single_budget_when_media_unbounded(self, ray_session, sf_dir):
        from gotenberg_ray.pipelines.packing import pack_interleaved, pack_sequences

        inter = pack_interleaved(sf_dir, ctx_tokens=512, ctx_media=1 << 40)
        single = pack_sequences(sf_dir, ctx=512)
        assert (inter["pack_m"] == 0).all()
        pd.testing.assert_series_equal(
            inter["pack_t"], single["pack_id"], check_names=False
        )

    def test_prefix_sum_multi_matches_pandas(self, ray_session, sf_dir):
        from gotenberg_ray.io import read_table
        from gotenberg_ray.pipelines.packing import ordered_prefix_sum_multi

        import pyarrow.compute as pc

        def feats(b):
            import pyarrow as pa
            import pyarrow.compute as pc

            return pa.table(
                {
                    "doc_id": b["doc_id"],
                    "a": pc.cast(pc.add(pc.multiply(b["doc_id"], 3), 1), pa.int64()),
                    "b": pc.cast(pc.bit_wise_and(b["doc_id"], 7), pa.int64()),
                }
            )

        ds = read_table(sf_dir, "documents", ["doc_id"]).map_batches(
            feats, batch_format="pyarrow"
        )
        got = (
            ordered_prefix_sum_multi(ds, "doc_id", ["a", "b"], span=37)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        ref = got[["doc_id", "a", "b"]].sort_values("doc_id").reset_index(drop=True)
        assert (got["start_a"] == ref["a"].cumsum().shift(fill_value=0)).all()
        assert (got["start_b"] == ref["b"].cumsum().shift(fill_value=0)).all()
