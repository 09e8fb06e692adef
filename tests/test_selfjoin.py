"""F2 / self-join-size contract tests: the limbed exact fold vs a
plain-python reference (hypothesis, including heavy skew), and the
CMS inner-product estimator's one-sided guarantee
(exact <= estimate <= exact + eps*N^2 on the fixed seeded family)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings
from hypothesis import strategies as st

from gotenberg_ray.pipelines import analytics as AN


def _write_events(tmp_path, user_ids):
    n = len(user_ids)
    t = pa.table(
        {
            "event_id": pa.array(list(range(1, n + 1)), pa.int64()),
            "ts": pa.array([pd.Timestamp("1970-01-01")] * n, pa.timestamp("us")),
            "user_id": pa.array(list(user_ids), pa.int64()),
            "event_type": pa.array(["view"] * n),
            "value": pa.array([1.0] * n),
            "props": pa.array(["{}"] * n),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    return str(tmp_path)


def test_selfjoin_exact_small(ray_session, tmp_path):
    # f = {1: 3, 2: 1} → F2 = 9 + 1 = 10
    sf = _write_events(tmp_path, [1, 1, 1, 2])
    df = AN.user_selfjoin_size(sf)
    row = df.iloc[0]
    assert row["n_events"] == 4 and row["n_users"] == 2
    assert row["selfjoin_size"] == 10 and row["max_f"] == 3


@given(
    st.lists(st.integers(min_value=1, max_value=9), min_size=1, max_size=120)
)
@settings(deadline=None, max_examples=25)
def test_selfjoin_matches_reference(ray_session, tmp_path_factory, users):
    tmp = tmp_path_factory.mktemp("f2")
    df = AN.user_selfjoin_size(_write_events(tmp, users))
    vals, counts = np.unique(np.array(users), return_counts=True)
    row = df.iloc[0]
    assert row["n_events"] == len(users)
    assert row["n_users"] == len(vals)
    assert row["selfjoin_size"] == int((counts.astype(object) ** 2).sum())
    assert row["max_f"] == int(counts.max())


def test_cms_estimate_one_sided_and_bounded(ray_session, tmp_path):
    rng = np.random.default_rng(11)
    users = rng.zipf(1.5, size=3000) % 400  # heavy skew
    sf = _write_events(tmp_path, users.tolist())
    df = AN.selfjoin_size_cms(sf)
    row = df.iloc[0]
    assert row["exact_f2"] <= row["cms_estimate"] <= row["bound"]
    # and the exact column agrees with the exact operator
    assert (
        row["exact_f2"]
        == AN.user_selfjoin_size(sf)["selfjoin_size"].iloc[0]
    )


def _write_typed_events(tmp_path, rows):
    """rows: list of (user_id, event_type)."""
    n = len(rows)
    t = pa.table(
        {
            "event_id": pa.array(list(range(1, n + 1)), pa.int64()),
            "ts": pa.array([pd.Timestamp("1970-01-01")] * n, pa.timestamp("us")),
            "user_id": pa.array([u for u, _ in rows], pa.int64()),
            "event_type": pa.array([ty for _, ty in rows]),
            "value": pa.array([1.0] * n),
            "props": pa.array(["{}"] * n),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    return str(tmp_path)


def test_diversity_exact_small(ray_session, tmp_path):
    # user 1: 2×view + 2×click → N=4, Σn²=8 → ⌊10⁴·8/16⌋ = 5000
    # user 2: 3×view → 0; user 3: view+click+purchase → ⌊10⁴·6/9⌋ = 6666
    sf = _write_typed_events(
        tmp_path,
        [(1, "view"), (1, "view"), (1, "click"), (1, "click"),
         (2, "view"), (2, "view"), (2, "view"),
         (3, "view"), (3, "click"), (3, "purchase")],
    )
    df = AN.user_event_diversity(sf)
    assert list(df["user_id"]) == [1, 2, 3]
    assert list(df["n_events"]) == [4, 3, 3]
    assert list(df["n_types"]) == [2, 1, 3]
    assert list(df["div_bp"]) == [5000, 0, 6666]


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=7),
            st.sampled_from(["view", "click", "purchase"]),
        ),
        min_size=1,
        max_size=120,
    )
)
@settings(deadline=None, max_examples=25)
def test_diversity_matches_reference(ray_session, tmp_path_factory, rows):
    tmp = tmp_path_factory.mktemp("div")
    df = AN.user_event_diversity(_write_typed_events(tmp, rows))
    ref = {}
    for u, ty in rows:
        ref.setdefault(u, {}).setdefault(ty, 0)
        ref[u][ty] += 1
    assert list(df["user_id"]) == sorted(ref)
    for _, r in df.iterrows():
        counts = ref[r["user_id"]]
        n = sum(counts.values())
        s2 = sum(c * c for c in counts.values())
        assert r["n_events"] == n and r["n_types"] == len(counts)
        assert r["div_bp"] == (10_000 * (n * n - s2)) // (n * n)
