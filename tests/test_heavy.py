"""Mergeable Misra–Gries summary (state/heavy.py): exactness below
capacity, the est ≤ true ≤ est + err invariant with err ≤ n/(k+1),
and block-layout invariance of the bound — the properties the
distributed heavy-hitters pass and hot-key detection rely on."""

import numpy as np
import pandas as pd
import pytest

from gotenberg_ray.state.heavy import MisraGries


def _true_counts(keys):
    s = pd.Series(keys)
    return s.groupby(s).size()


def test_exact_below_capacity():
    rng = np.random.default_rng(1)
    keys = rng.integers(0, 50, 10_000)
    mg = MisraGries(64)
    for chunk in np.array_split(keys, 7):
        mg.update(chunk)
    assert mg.err == 0 and mg.n == 10_000
    true = _true_counts(keys)
    got = dict(zip(mg.keys, mg.counts))
    assert len(got) == len(true)
    for k, c in true.items():
        assert got[k] == c


@pytest.mark.parametrize("capacity", [8, 32])
def test_error_bound_under_zipf(capacity):
    rng = np.random.default_rng(9)
    keys = rng.zipf(1.3, 20_000) % 1000
    mg = MisraGries(capacity)
    for chunk in np.array_split(keys, 13):
        mg.update(chunk)
    n = len(keys)
    assert mg.n == n
    assert 0 <= mg.err <= n // (capacity + 1) + 1
    true = _true_counts(keys)
    got = dict(zip(mg.keys, mg.counts))
    assert len(mg.keys) <= capacity
    for k, est in got.items():
        t = int(true.get(k, 0))
        assert est <= t <= est + mg.err
    # every key heavier than n/(capacity+1) MUST survive (MG guarantee)
    for k, t in true.items():
        if t > n // (capacity + 1):
            assert k in got


def test_merge_matches_single_pass_bound():
    """Partials over arbitrary layouts merge to a summary honouring the
    same invariant — and identical layouts give identical summaries."""
    rng = np.random.default_rng(4)
    keys = rng.zipf(1.5, 30_000) % 500
    outs = []
    for n_chunks in (1, 5, 23):
        parts = []
        for chunk in np.array_split(keys, n_chunks):
            p = MisraGries(16).update(chunk)
            parts.append(p.to_partial_row(__import__("pyarrow").int64()))
        df = pd.concat([t.to_pandas() for t in parts], ignore_index=True)
        mg = MisraGries.from_partial_rows(df, 16)
        assert mg.n == len(keys)
        true = _true_counts(keys)
        for k, est in zip(mg.keys, mg.counts):
            t = int(true.get(k, 0))
            assert est <= t <= est + mg.err
        outs.append(mg)
    # same layout rerun → bit-identical summary
    again = MisraGries(16)
    for chunk in np.array_split(keys, 5):
        again.update(chunk)
    mid = MisraGries(16)
    for chunk in np.array_split(keys, 5):
        mid.update(chunk)
    assert (np.sort(again.keys) == np.sort(mid.keys)).all()
    assert again.err == mid.err


def test_string_keys_and_top_determinism():
    keys = np.array(["en"] * 50 + ["de"] * 30 + ["fr"] * 30 + ["zh"] * 5)
    mg = MisraGries(10).update(keys)
    top = mg.top(3)
    assert top[0] == ("en", 50)
    # de/fr tie at 30 → lexicographic key order breaks it
    assert [k for k, _ in top[1:]] == ["de", "fr"]


def test_weighted_update_and_capacity_one():
    mg = MisraGries(1)
    mg.update(np.array([1, 2, 1, 1]), np.array([5, 3, 5, 5], dtype=np.int64))
    # n = 18, one survivor at most, bound still holds
    assert mg.n == 18
    assert len(mg.keys) <= 1
    if len(mg.keys):
        k, est = mg.keys[0], int(mg.counts[0])
        true = 15 if k == 1 else 3
        assert est <= true <= est + mg.err


class TestCountMin:
    def test_never_underestimates_and_bound(self):
        import numpy as np

        from gotenberg_ray.state.cms import CountMin

        rng = np.random.RandomState(7)
        keys = rng.zipf(1.5, 20_000).astype(np.int64) % 500
        sk = CountMin(width=1 << 10, depth=4)
        sk.update(keys)
        uniq, true = np.unique(keys, return_counts=True)
        est = sk.query(uniq)
        assert (est >= true).all()  # one-sided
        assert (est - true <= sk.error_bound()).all()

    def test_merge_equals_single_pass_and_layout_invariance(self):
        import numpy as np

        from gotenberg_ray.state.cms import CountMin

        rng = np.random.RandomState(11)
        keys = rng.randint(0, 1000, 30_000).astype(np.int64)
        whole = CountMin().update(keys)
        for split in (2, 7):
            parts = np.array_split(keys, split)
            merged = CountMin()
            for p in parts:
                merged.merge(CountMin().update(p))
            assert np.array_equal(merged.table, whole.table)
            assert merged.n == whole.n

    def test_bytes_roundtrip_and_string_keys(self):
        import numpy as np

        from gotenberg_ray.state.cms import CountMin

        sk = CountMin(width=256, depth=3)
        sk.update(["a", "b", "a", "c"], None)
        rt = CountMin.from_bytes(sk.to_bytes())
        assert np.array_equal(rt.table, sk.table) and rt.n == sk.n
        assert list(rt.query(["a", "b", "c", "zz"])[:3] >= [2, 1, 1]) == [True] * 3

    def test_exact_when_sparse(self):
        import numpy as np

        from gotenberg_ray.state.cms import CountMin

        # 5 keys vs a 4×4096 matrix: exact with overwhelming margin —
        # the property cms_event_counts' oracle pairing relies on
        keys = np.repeat(np.arange(5, dtype=np.int64), [10, 20, 30, 40, 50])
        sk = CountMin()
        sk.update(keys)
        assert sk.query(np.arange(5, dtype=np.int64)).tolist() == [10, 20, 30, 40, 50]
