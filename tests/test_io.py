"""Storage IO seam: size-proportional block policy."""

import pyarrow as pa
import pyarrow.parquet as pq

from gotenberg_ray import io as gio


def test_blocks_for_scales_with_file_size(tmp_path):
    small = tmp_path / "small.parquet"
    pq.write_table(pa.table({"x": list(range(100))}), small)
    assert gio.blocks_for(str(small)) == 2  # min clamp
    assert gio.blocks_for(str(tmp_path / "missing.parquet")) == 2
    # a 100 TB file would want ~3.3M blocks — clamped to the node cap,
    # raised on a real cluster
    import unittest.mock as mock

    with mock.patch("os.path.getsize", return_value=100 << 40):
        assert gio.blocks_for("huge.parquet") == 512
    with mock.patch("os.path.getsize", return_value=320 << 20):
        assert gio.blocks_for("mid.parquet") == 11  # ~32 MB per block


def test_read_table_respects_floor_and_columns(ray_session, tmp_path):
    p = tmp_path / "t.parquet"
    pq.write_table(pa.table({"a": list(range(1000)), "b": [0] * 1000}), p)
    ds = gio.read_table(str(tmp_path), "t", columns=["a"], min_blocks=7)
    assert ds.schema().names == ["a"]
    assert ds.count() == 1000
    assert ds.materialize().num_blocks() >= 7
