"""Bucketed shuffle join (pipelines/joins.py) — the non-broadcast join
path VERDICT r1 required for q5/q10-scale sides."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from gotenberg_ray.pipelines.joins import hash_join, partition_ids


def test_partition_ids_cover_and_are_deterministic():
    keys = pa.array(list(range(1000)), pa.int64())
    p1 = partition_ids(keys, 8).to_numpy(zero_copy_only=False)
    p2 = partition_ids(keys, 8).to_numpy(zero_copy_only=False)
    assert (p1 == p2).all()
    # dense integer keys spread over all partitions, no single hot bucket
    counts = np.bincount(p1, minlength=8)
    assert (counts > 0).all() and counts.max() < 1000 * 0.3
    s = partition_ids(pa.array(["a", "b", "a"]), 4).to_pylist()
    assert s[0] == s[2]


def test_hash_join_matches_pandas_merge(ray_session):
    rng = np.random.default_rng(7)
    left = pd.DataFrame(
        {"k": rng.integers(0, 50, 500), "lv": rng.integers(0, 1000, 500)}
    )
    right = pd.DataFrame({"rk": np.arange(0, 40), "rv": np.arange(0, 40) * 10})
    out = (
        hash_join(
            rd.from_pandas(left), rd.from_pandas(right),
            on="k", right_on="rk", num_partitions=4,
        )
        .to_pandas()
        .sort_values(["k", "lv"])
        .reset_index(drop=True)
    )
    exp = (
        left.merge(right, left_on="k", right_on="rk")
        .drop(columns=["rk"])
        .sort_values(["k", "lv"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out[["k", "lv", "rv"]], exp[["k", "lv", "rv"]])


def test_hash_join_left_agg_combines_per_key_without_second_shuffle(ray_session):
    # partial sums per key arriving in different blocks must combine to
    # one row per key inside the join partition
    left = pd.DataFrame({"k": [1, 1, 2, 2, 3], "v": [1.0, 2.0, 3.0, 4.0, 5.0]})
    right = pd.DataFrame({"k": [1, 2, 3], "name": ["a", "b", "c"]})

    def combine(t: pa.Table) -> pa.Table:
        g = t.group_by("k").aggregate([("v", "sum")])
        return g.rename_columns(["v" if c == "v_sum" else c for c in g.column_names])

    out = (
        hash_join(
            rd.from_pandas(left).repartition(3), rd.from_pandas(right),
            on="k", num_partitions=2, left_agg=combine,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert out["k"].tolist() == [1, 2, 3]
    assert out["v"].tolist() == [3.0, 7.0, 5.0]
    assert out["name"].tolist() == ["a", "b", "c"]


def test_hash_join_rejects_clashing_columns(ray_session):
    l = rd.from_pandas(pd.DataFrame({"k": [1], "v": [1]}))
    r = rd.from_pandas(pd.DataFrame({"k": [1], "v": [2]}))
    with pytest.raises(ValueError, match="share non-key columns"):
        hash_join(l, r, on="k")


@pytest.mark.usefixtures("ray_session")
class TestBloomPushdown:
    def test_same_result_as_plain_join(self):
        import numpy as np
        import ray.data as rd

        from gotenberg_ray.pipelines.joins import build_key_bloom, hash_join

        left = rd.from_items([{"k": i, "v": i * 2} for i in range(5_000)])
        right = rd.from_items([{"k": i * 41, "w": i} for i in range(100)])
        sl = [("k", pa.int64()), ("v", pa.int64())]
        sr = [("k", pa.int64()), ("w", pa.int64())]
        plain = (
            hash_join(left, right, on="k", num_partitions=4,
                      left_schema=sl, right_schema=sr)
            .to_pandas().sort_values("k").reset_index(drop=True)
        )
        pruned = (
            hash_join(left, right, on="k", num_partitions=4,
                      left_schema=sl, right_schema=sr,
                      bloom_prune_left=True, bloom_capacity=512)
            .to_pandas().sort_values("k").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(plain, pruned)
        # the bloom itself is selective: most non-matching keys reject
        bloom = build_key_bloom(right, "k", 512)
        keep = bloom.contains(np.arange(5_000, dtype=np.uint64))
        assert keep.sum() < 500  # 100 true + bounded false positives

    def test_rejects_outer_join(self):
        import ray.data as rd

        from gotenberg_ray.pipelines.joins import hash_join

        ds = rd.from_items([{"k": 1}])
        with pytest.raises(ValueError, match="inner"):
            hash_join(ds, ds, on="k", join_type="left outer",
                      bloom_prune_left=True,
                      left_schema=[("k", pa.int64())],
                      right_schema=[("k", pa.int64())])


class TestSkewSalting:
    """hash_join(hot_keys=, salt=): hot probe rows spread over `salt`
    partitions, build rows replicate into them — result sets must be
    IDENTICAL to the unsalted join for every supported join type."""

    def _sides(self, seed=11, hot_frac=0.6):
        rng = np.random.default_rng(seed)
        n = 2000
        # one massively hot key (0) + a uniform tail, incl. keys that
        # match nothing and build keys that probe nothing
        k = np.where(rng.random(n) < hot_frac, 0, rng.integers(0, 60, n))
        left = pd.DataFrame({"k": k, "lv": rng.integers(0, 10**6, n)})
        right = pd.DataFrame(
            {"k": np.arange(0, 50), "rv": np.arange(0, 50) * 7}
        )
        # make the hot key many-to-many: 3 build rows for key 0
        right = pd.concat(
            [right, pd.DataFrame({"k": [0, 0], "rv": [-1, -2]})], ignore_index=True
        )
        return left, right

    @pytest.mark.parametrize("join_type", ["inner", "left outer", "left anti"])
    def test_salted_equals_unsalted(self, ray_session, join_type):
        left, right = self._sides()
        hot = pa.array([0], pa.int64())
        kw = dict(
            on="k",
            num_partitions=8,
            left_schema=[("k", pa.int64()), ("lv", pa.int64())],
            right_schema=[("k", pa.int64()), ("rv", pa.int64())],
            join_type=join_type,
        )
        cols = ["k", "lv"] if join_type == "left anti" else ["k", "lv", "rv"]
        base = (
            hash_join(rd.from_pandas(left), rd.from_pandas(right), **kw)
            .to_pandas()[cols]
            .sort_values(cols)
            .reset_index(drop=True)
        )
        salted = (
            hash_join(
                rd.from_pandas(left), rd.from_pandas(right),
                hot_keys=hot, salt=8, **kw,
            )
            .to_pandas()[cols]
            .sort_values(cols)
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(salted, base)

    def test_salt_pid_collisions_do_not_duplicate(self, ray_session):
        """salt > partitions FORCES several salts onto one pid; the
        replicated build copies must still appear once per partition."""
        left, right = self._sides(seed=3)
        out = (
            hash_join(
                rd.from_pandas(left), rd.from_pandas(right),
                on="k", num_partitions=2,
                left_schema=[("k", pa.int64()), ("lv", pa.int64())],
                right_schema=[("k", pa.int64()), ("rv", pa.int64())],
                hot_keys=pa.array([0], pa.int64()), salt=16,
            )
            .to_pandas()
            .sort_values(["k", "lv", "rv"])
            .reset_index(drop=True)
        )
        exp = (
            left.merge(right, on="k")
            .sort_values(["k", "lv", "rv"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(out[["k", "lv", "rv"]], exp[["k", "lv", "rv"]])

    def test_string_keys_salted(self, ray_session):
        rng = np.random.default_rng(5)
        langs = np.array(["en", "de", "fr"])
        left = pd.DataFrame(
            {
                "lang": np.where(rng.random(500) < 0.7, "en", rng.choice(langs, 500)),
                "v": np.arange(500),
            }
        )
        right = pd.DataFrame({"lang": langs, "w": [1, 2, 3]})
        out = (
            hash_join(
                rd.from_pandas(left), rd.from_pandas(right),
                on="lang", num_partitions=4,
                left_schema=[("lang", pa.string()), ("v", pa.int64())],
                right_schema=[("lang", pa.string()), ("w", pa.int64())],
                hot_keys=pa.array(["en"]), salt=4,
            )
            .to_pandas()
            .sort_values(["lang", "v"])
            .reset_index(drop=True)
        )
        exp = left.merge(right, on="lang").sort_values(["lang", "v"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(out[["lang", "v", "w"]], exp[["lang", "v", "w"]])

    def test_rejects_right_outer(self, ray_session):
        left, right = self._sides()
        with pytest.raises(ValueError, match="salting"):
            hash_join(
                rd.from_pandas(left), rd.from_pandas(right),
                on="k", join_type="right outer",
                hot_keys=pa.array([0], pa.int64()), salt=4,
                left_schema=[("k", pa.int64()), ("lv", pa.int64())],
                right_schema=[("k", pa.int64()), ("rv", pa.int64())],
            )


class TestDetectHotKeys:
    def test_finds_planted_hot_key(self, ray_session):
        from gotenberg_ray.pipelines.joins import detect_hot_keys

        rng = np.random.default_rng(2)
        k = np.where(rng.random(5000) < 0.5, 7, rng.integers(100, 5000, 5000))
        ds = rd.from_pandas(pd.DataFrame({"k": k}))
        hot = detect_hot_keys(ds, "k", num_partitions=16, capacity=512)
        assert 7 in hot.to_pylist()
        # uniform tail keys (each ~0.02%) must NOT be flagged
        assert len(hot) <= 3

    def test_uniform_keys_yield_none(self, ray_session):
        from gotenberg_ray.pipelines.joins import detect_hot_keys

        ds = rd.from_pandas(pd.DataFrame({"k": np.arange(10_000) % 997}))
        hot = detect_hot_keys(ds, "k", num_partitions=8, capacity=2048)
        assert len(hot) == 0


@pytest.mark.usefixtures("ray_session")
class TestAutoJoin:
    def _sides(self):
        import ray.data as rd

        left = rd.from_arrow(
            pa.table(
                {
                    "k": pa.array([1, 2, 3, 4, 5], pa.int64()),
                    "lv": pa.array([10, 20, 30, 40, 50], pa.int64()),
                }
            )
        )
        right = rd.from_arrow(
            pa.table(
                {
                    "k": pa.array([2, 4, 9], pa.int64()),
                    "rv": pa.array([200, 400, 900], pa.int64()),
                }
            )
        )
        return left, right

    def test_broadcast_path_equals_hash_join(self):
        from gotenberg_ray.pipelines import joins as J

        for jt in ("inner", "left outer", "left semi", "left anti"):
            left, right = self._sides()
            got = (
                J.auto_join(left, right, "k", join_type=jt)
                .to_pandas()
                .sort_values("k")
                .reset_index(drop=True)
            )
            left, right = self._sides()
            want = (
                J.hash_join(left, right, "k", join_type=jt,
                            num_partitions=4)
                .to_pandas()
                .sort_values("k")
                .reset_index(drop=True)
            )
            got = got[sorted(got.columns)]
            want = want[sorted(want.columns)]
            pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_big_right_takes_bucketed_path(self):
        from gotenberg_ray.pipelines import joins as J

        left, right = self._sides()
        # force the bucketed path with a 0-byte broadcast budget
        out = J.auto_join(
            left, right, "k", broadcast_max_bytes=0, num_partitions=4
        ).to_pandas()
        assert sorted(out["k"].tolist()) == [2, 4]


@pytest.mark.usefixtures("ray_session")
class TestNullIntKeys:
    def test_null_in_batch_does_not_degrade_big_keys(self):
        """A null in an int64 key column must not float64-degrade the
        batch: keys above 2^53 still route to their matches, and null
        keys drop per SQL semantics."""
        import ray.data as rd

        from gotenberg_ray.pipelines import joins as J

        big = (1 << 60) + 1
        left = rd.from_arrow(
            pa.table(
                {
                    "k": pa.array([big, 7, None], pa.int64()),
                    "lv": pa.array([1, 2, 3], pa.int64()),
                }
            )
        )
        right = rd.from_arrow(
            pa.table(
                {
                    "k": pa.array([big, 7], pa.int64()),
                    "rv": pa.array([10, 20], pa.int64()),
                }
            )
        )
        out = (
            J.hash_join(left, right, "k", num_partitions=4)
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        assert sorted(out["k"].tolist()) == [7, big]
        assert set(out["rv"]) == {10, 20}

    def test_cms_null_ints_stay_one_sided(self):
        import numpy as np

        from gotenberg_ray.state.cms import CountMin

        sk = CountMin(width=1 << 10, depth=4)
        sk.update(pa.array([1, 2, None, 1], pa.int64()))
        est = sk.query(np.array([1, 2], np.int64))
        assert est[0] >= 2 and est[1] >= 1  # never under


@pytest.mark.usefixtures("ray_session")
def test_autojoin_broadcast_and_bucketed_paths_equal(sf_dir, monkeypatch):
    """The q5/q7/q9 conversions ride auto_join's size gate; pin that
    the broadcast plan (bench scale) and the bucketed hash_join
    fallback (the 100 TB path, forced by zeroing the gate at call
    time) produce identical frames."""
    import pandas as pd

    import gotenberg_ray.pipelines.joins as J
    from gotenberg_ray.pipelines.relational import q5_nation_revenue
    from gotenberg_ray.pipelines.relational2 import q7_nation_trade
    from gotenberg_ray.pipelines.relational3 import q9_product_profit

    queries = (q5_nation_revenue, q7_nation_trade, q9_product_profit)
    fast = {q.__name__: q(sf_dir) for q in queries}
    monkeypatch.setattr(J, "BROADCAST_MAX_BYTES", 0)
    for q in queries:
        pd.testing.assert_frame_equal(fast[q.__name__], q(sf_dir))


def test_key_domains_accept_dictionary_and_large_string():
    """Parquet readers routinely hand back dictionary-encoded or
    large_string key columns; routing and bloom domains must hash them
    by VALUE (review-found crash in the per-scalar fnv64 fallback)."""
    import numpy as np
    import pyarrow as pa

    from gotenberg_ray.pipelines.joins import _key_u64, _pid_domain

    plain = pa.array(["a", "b", "c"])
    for enc in (plain.dictionary_encode(), pa.array(["a", "b", "c"], pa.large_string())):
        assert (_pid_domain(enc) == _pid_domain(plain)).all()
        assert (_key_u64(enc) == _key_u64(plain)).all()


def test_pad_to_hashes_cast_key_domain():
    """Sides whose stored key types differ must route by the CAST key
    (the value the local join compares) — raw-column hashing sent
    matching rows to different partitions (review-found)."""
    import pyarrow as pa

    from gotenberg_ray.pipelines.joins import _pad_to

    fields = [("k", pa.string()), ("v", pa.int64())]
    left = pa.table({"k": pa.array(["1", "2"]), "v": pa.array([1, 2], pa.int64())})
    right = pa.table({"k": pa.array([1, 2], pa.int32()), "v": pa.array([3, 4], pa.int64())})
    tl = _pad_to(fields, 0, "k", 8)(left)
    tr = _pad_to(fields, 1, "k", 8)(right)
    pid = [c for c in tl.column_names if "pid" in c.lower()][0]
    assert tl[pid].to_pylist() == tr[pid].to_pylist()


def test_broadcast_join_accepts_pa_schema(ray_session):
    """broadcast_join's declared-schema path must accept pa.Schema like
    hash_join does (auto_join forwards either form; review-found
    TypeError unpacking Fields)."""
    import pyarrow as pa
    import ray.data as rd

    from gotenberg_ray.pipelines.joins import broadcast_join

    left = rd.from_arrow(
        pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                  "x": pa.array([10, 20, 30], pa.int64())})
    )
    right = rd.from_arrow(
        pa.table({"k": pa.array([], pa.int64()), "y": pa.array([], pa.int64())})
    )
    out = broadcast_join(
        left, right, on="k", join_type="left outer",
        left_schema=pa.schema([("k", pa.int64()), ("x", pa.int64())]),
        right_schema=pa.schema([("k", pa.int64()), ("y", pa.int64())]),
    ).to_pandas()
    assert len(out) == 3 and out["y"].isna().all()


def test_detect_hot_keys_ignores_nulls_and_keeps_int_dtype(ray_session):
    """Null keys must not degrade the sketch's key dtype to float64
    (rounding int keys above 2^53) nor count toward the threshold
    (review-found)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from gotenberg_ray.pipelines.joins import detect_hot_keys

    big = (1 << 60) + 1  # survives int64, rounds in float64
    keys = [big] * 50 + [None] * 30 + list(range(10))
    ds = rd.from_arrow(pa.table({"k": pa.array(keys, pa.int64())}))
    hot = detect_hot_keys(ds, "k", num_partitions=32)
    assert big in set(hot.to_pylist())
