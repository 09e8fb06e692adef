"""Range-partitioned global sort (TeraSort plan) — layout.orders_range_sort.

The probe rows are oracle-gated (row_number twin); these tests pin the
physical contract the probe can't see from SQL: the written runs
concatenate GLOBALLY sorted, preserve every row, stay disjoint across
bucket boundaries, and the whole plan is deterministic.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from gotenberg_ray.pipelines import layout as LY


@pytest.fixture(scope="module")
def probe(ray_session, sf_dir) -> pd.DataFrame:
    return LY.orders_range_sort(sf_dir)


def _runs(sf_dir: str) -> list[str]:
    from gotenberg_ray.io import scratch_layout_path

    path = scratch_layout_path("rangesort", sf_dir, "orders")
    return [
        os.path.join(path, f)
        for f in sorted(
            (f for f in os.listdir(path) if f.startswith("run-")),
            key=lambda f: int(f.split("-")[1].split(".")[0]),
        )
    ]


def _expected(sf_dir: str) -> pd.DataFrame:
    orders = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    ).to_pandas()
    # half-away-from-zero on positive prices, matching the engine's
    # round_mode="half_towards_infinity" and DuckDB round()
    cents = np.floor(orders["o_totalprice"].to_numpy() * 100 + 0.5).astype(np.int64)
    df = pd.DataFrame({"o_orderkey": orders["o_orderkey"], "cents": cents})
    return df.sort_values(["cents", "o_orderkey"], kind="mergesort").reset_index(
        drop=True
    )


class TestRangeSort:
    def test_runs_concatenate_globally_sorted(self, probe, sf_dir):
        exp = _expected(sf_dir)
        parts = [pq.read_table(f).to_pandas() for f in _runs(sf_dir)]
        got = pd.concat(parts, ignore_index=True)
        # every row preserved, in exactly the global sort order
        assert len(got) == len(exp)
        assert got["cents"].to_numpy().tolist() == exp["cents"].to_numpy().tolist()
        assert (
            got["o_orderkey"].to_numpy().tolist()
            == exp["o_orderkey"].to_numpy().tolist()
        )

    def test_runs_are_key_disjoint(self, probe, sf_dir):
        prev_max = None
        for f in _runs(sf_dir):
            t = pq.read_table(f, columns=["cents"])
            if t.num_rows == 0:
                continue
            c = t["cents"].to_numpy()
            if prev_max is not None:
                # routing is by cents only, so ranges never overlap
                assert c.min() > prev_max
            prev_max = c.max()

    def test_probe_ranks_exact(self, probe, sf_dir):
        exp = _expected(sf_dir)
        idx = np.arange(0, len(exp), LY.PROBE_STRIDE)
        want = exp.iloc[idx].reset_index(drop=True)
        assert probe["pos"].tolist() == idx.tolist()
        assert probe["o_orderkey"].tolist() == want["o_orderkey"].tolist()
        assert probe["cents"].tolist() == want["cents"].tolist()

    def test_deterministic(self, probe, sf_dir):
        again = LY.orders_range_sort(sf_dir)
        pd.testing.assert_frame_equal(probe, again)

    def test_empty_input(self, ray_session, tmp_path):
        import pyarrow as pa

        t = pa.table(
            {"o_orderkey": pa.array([], pa.int64()), "o_totalprice": pa.array([], pa.float64())}
        )
        pq.write_table(t, tmp_path / "orders.parquet")
        out = LY.orders_range_sort(str(tmp_path))
        assert list(out.columns) == ["pos", "o_orderkey", "cents"]
        assert len(out) == 0
        assert all(str(d) == "int64" for d in out.dtypes)
