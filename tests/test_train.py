"""End-to-end crawl→curate→pack→shard composition."""

import os

import pandas as pd
import pytest

from gotenberg_ray.pipelines.train import training_data_pipeline


@pytest.mark.usefixtures("ray_session")
class TestTrainingPipeline:
    def test_deterministic_and_consistent(self, sf_dir, tmp_path):
        a = training_data_pipeline(sf_dir, out_dir=str(tmp_path / "a"))
        b = training_data_pipeline(sf_dir, out_dir=str(tmp_path / "b"))
        pd.testing.assert_frame_equal(a, b)
        r = a.iloc[0]
        # the funnel only narrows, and packing covers all tokens
        assert r["n_pages"] >= r["n_unique_parts"] > 0
        assert r["total_tokens"] > 0
        assert r["n_packs"] == r["total_tokens"] // 256 + (
            1 if r["total_tokens"] % 256 else 0
        ) or r["n_packs"] <= r["total_tokens"] // 256 + 1

    def test_shards_written_and_resumable(self, sf_dir, tmp_path):
        out = str(tmp_path / "shards")
        training_data_pipeline(sf_dir, out_dir=out)
        buckets = [d for d in os.listdir(out) if d.startswith("bucket-")]
        assert buckets
        assert all(
            os.path.exists(os.path.join(out, d, "_COMPLETE")) for d in buckets
        )
        # a second run over the same out_dir skips every finished bucket
        again = training_data_pipeline(sf_dir, out_dir=out)
        assert again.iloc[0]["written_buckets"] == len(buckets)


@pytest.mark.usefixtures("ray_session")
class TestInterleavedPipeline:
    def test_deterministic_and_media_budget_flows(self, sf_dir, tmp_path):
        from gotenberg_ray.pipelines.train import training_interleaved_pipeline

        a = training_interleaved_pipeline(sf_dir, out_dir=str(tmp_path / "a"))
        b = training_interleaved_pipeline(sf_dir, out_dir=str(tmp_path / "b"))
        pd.testing.assert_frame_equal(a, b)
        r = a.iloc[0]
        assert r["n_pages"] >= r["n_unique_parts"] > 0
        assert r["total_tokens"] > 0
        # the crawl corpus interleaves media on ~40% of pages — real
        # counts must survive the gate/dedup funnel into the pack
        assert r["total_media"] > 0
        # dual budgets: cell count is at least the single-budget floor
        # of EACH axis (a new cell opens when either budget fills)
        floor_t = r["total_tokens"] // 256
        floor_m = r["total_media"] // 8
        assert r["n_pack_cells"] >= max(floor_t, floor_m, 1)
        assert r["written_buckets"] > 0

    def test_shards_resumable(self, sf_dir, tmp_path):
        from gotenberg_ray.pipelines.train import training_interleaved_pipeline

        out = str(tmp_path / "ishards")
        first = training_interleaved_pipeline(sf_dir, out_dir=out)
        buckets = [d for d in os.listdir(out) if d.startswith("bucket-")]
        assert buckets
        again = training_interleaved_pipeline(sf_dir, out_dir=out)
        assert again.iloc[0]["written_buckets"] == len(buckets)
        pd.testing.assert_frame_equal(first, again)
