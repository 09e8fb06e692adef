"""HyperLogLog sketch: error envelope, merge algebra, layout
invariance, serialization — the same contract battery the other
mergeable sketches (CMS, Misra–Gries) pin."""

import numpy as np
import pandas as pd
import pytest

from gotenberg_ray.state.hll import HyperLogLog


class TestHyperLogLog:
    def test_error_envelope_across_magnitudes(self):
        # rel. std. err. ≈ 1.04/√m ≈ 0.81% at p=14; assert 5σ
        rng = np.random.RandomState(7)
        for n in (100, 5_000, 200_000):
            keys = rng.randint(0, 1 << 62, size=n).astype(np.uint64)
            keys = np.unique(keys)
            est = HyperLogLog().update(keys).estimate()
            assert abs(est - len(keys)) <= max(2, 0.0405 * len(keys))

    def test_small_range_is_near_exact(self):
        # linear-counting regime: n ≪ m ⇒ within ±1 per 100 keys
        keys = np.arange(150, dtype=np.int64)
        est = HyperLogLog().update(keys).estimate()
        assert abs(est - 150) <= 2

    def test_merge_equals_whole_registers_bitwise(self):
        # element-wise max merge is EXACT: partials over any split fold
        # to the identical register array (the layout-invariance
        # contract the distributed shape relies on)
        rng = np.random.RandomState(11)
        keys = rng.randint(0, 1 << 60, size=50_000).astype(np.uint64)
        whole = HyperLogLog().update(keys)
        for n_parts in (2, 7, 32):
            merged = HyperLogLog()
            for part in np.array_split(keys, n_parts):
                merged.merge(HyperLogLog().update(part))
            assert np.array_equal(merged.registers, whole.registers)
            assert merged.estimate() == whole.estimate()

    def test_merge_is_idempotent_and_commutative(self):
        a = HyperLogLog().update(np.arange(1000, dtype=np.int64))
        b = HyperLogLog().update(np.arange(500, 2000, dtype=np.int64))
        ab = HyperLogLog().merge(a).merge(b)
        ba = HyperLogLog().merge(b).merge(a).merge(b)  # re-merge b: no-op
        assert np.array_equal(ab.registers, ba.registers)

    def test_duplicates_do_not_inflate(self):
        once = HyperLogLog().update(np.arange(300, dtype=np.int64))
        thrice = HyperLogLog().update(
            np.tile(np.arange(300, dtype=np.int64), 3)
        )
        assert np.array_equal(once.registers, thrice.registers)

    def test_string_and_int_domains(self):
        import pyarrow as pa

        s = HyperLogLog().update(pa.array([f"host-{i}" for i in range(400)]))
        assert abs(s.estimate() - 400) <= 6
        # deterministic across calls
        s2 = HyperLogLog().update(pa.array([f"host-{i}" for i in range(400)]))
        assert np.array_equal(s.registers, s2.registers)

    def test_roundtrip_and_validation(self):
        sk = HyperLogLog(p=12).update(np.arange(5000, dtype=np.int64))
        rt = HyperLogLog.from_bytes(sk.to_bytes())
        assert rt.p == 12 and np.array_equal(rt.registers, sk.registers)
        with pytest.raises(ValueError):
            HyperLogLog.from_bytes(b"nope" + sk.to_bytes())
        with pytest.raises(ValueError):
            HyperLogLog.from_bytes(sk.to_bytes()[:100])
        with pytest.raises(ValueError):
            HyperLogLog(p=3)
        with pytest.raises(ValueError):
            HyperLogLog(p=12).merge(HyperLogLog(p=14))

    def test_empty(self):
        sk = HyperLogLog()
        assert sk.estimate() == 0
        sk.update(np.array([], dtype=np.int64))
        assert sk.estimate() == 0


def test_hll_daily_users_tracks_exact(ray_session, sf_dir):
    from gotenberg_ray.pipelines.analytics import hll_daily_users

    df = hll_daily_users(sf_dir)
    ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "user_id"])
    exact = (
        ev.assign(day=ev["ts"].dt.strftime("%Y-%m-%d"))
        .groupby("day")["user_id"]
        .nunique()
        .sort_index()
    )
    assert list(df["day"]) == list(exact.index)
    err = (df["n_users_est"].to_numpy() - exact.to_numpy()).astype(np.int64)
    # linear-counting regime at test scale: within ±2% (and ≥ ±2 abs)
    assert (np.abs(err) <= np.maximum(2, 0.02 * exact.to_numpy())).all()


def test_hll_set_ops_tracks_exact(ray_session, sf_dir):
    from gotenberg_ray.pipelines.analytics import hll_set_ops

    df = hll_set_ops(sf_dir).set_index("metric")["est_users"]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "user_id"])
    clicks = set(ev.loc[ev["event_type"] == "click", "user_id"])
    buys = set(ev.loc[ev["event_type"] == "purchase", "user_id"])
    exact = {
        "n_click": len(clicks),
        "n_purchase": len(buys),
        "n_union": len(clicks | buys),
        "n_both": len(clicks & buys),
    }
    for metric in ("n_click", "n_purchase", "n_union"):
        true = exact[metric]
        assert abs(int(df[metric]) - true) <= max(3, 0.02 * true), metric
    # the intersection inherits ABSOLUTE error from all three terms:
    # bound it by 2% of the union, not of itself
    assert abs(int(df["n_both"]) - exact["n_both"]) <= max(5, 0.04 * exact["n_union"])
    # lattice clamps always hold
    assert 0 <= int(df["n_both"]) <= min(int(df["n_click"]), int(df["n_purchase"]))
    assert int(df["n_union"]) <= int(df["n_click"]) + int(df["n_purchase"])


def test_hll_set_ops_deterministic(ray_session, sf_dir):
    from gotenberg_ray.pipelines.analytics import hll_set_ops

    pd.testing.assert_frame_equal(hll_set_ops(sf_dir), hll_set_ops(sf_dir))


def test_hll_rolling_users_tracks_exact(ray_session, sf_dir):
    from gotenberg_ray.pipelines.analytics import hll_rolling_users
    from gotenberg_ray.pipelines.windows import rolling_distinct_users

    approx = hll_rolling_users(sf_dir)
    exact = rolling_distinct_users(sf_dir)
    assert list(approx["day"]) == list(exact["day"])
    a = approx["n_users_7d_est"].to_numpy()
    e = exact["n_users_7d"].to_numpy()
    assert (np.abs(a - e) <= np.maximum(2, 0.02 * e)).all()


def test_hll_rolling_consistency_with_daily(ray_session, sf_dir):
    """A 7-day union can never estimate below the max single day it
    covers (register-wise: merge is a max, estimate is monotone)."""
    from gotenberg_ray.pipelines.analytics import hll_daily_users, hll_rolling_users

    daily = hll_daily_users(sf_dir).set_index("day")["n_users_est"]
    rolling = hll_rolling_users(sf_dir).set_index("day")["n_users_7d_est"]
    for day, est in rolling.items():
        if day in daily.index:
            assert est >= daily[day]
