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


def test_extract_text_media_matches_pandas_reference():
    """The arrow binary_join extraction kernel must be value-identical
    to the former pandas groupby ' '.join / str.split reference,
    including pages with no text spans (dropped), empty span texts
    (double spaces preserved in text, collapsed in token counts), and
    multibyte content."""
    import numpy as np
    import pyarrow as pa

    from gotenberg_ray.pipelines.train import _extract_text_media

    spans_t = pa.list_(
        pa.struct(
            [("kind", pa.string()), ("text", pa.string()),
             ("media_ref", pa.string()), ("offset", pa.int32())]
        )
    )

    def sp(kind, text=""):
        return {"kind": kind, "text": text, "media_ref": "", "offset": 0}

    rows = [
        [sp("text", "héllo wörld"), sp("media"), sp("text", "")],
        [sp("media"), sp("page_break")],  # no text spans → dropped
        [sp("text", "a  b"), sp("text", "c"), sp("media"), sp("media")],
        [sp("text", "  ")],  # whitespace-only page: 0 tokens
    ]
    batch = pa.table(
        {
            "doc_id": pa.array([f"doc-{i:06d}" for i in range(len(rows))]),
            "part_index": pa.array(list(range(len(rows))), pa.int32()),
            "spans": pa.array(rows, spans_t),
            "status": pa.array(["success"] * len(rows)),
        }
    )
    got = _extract_text_media(batch).to_pandas()

    # reference: the former pandas implementation
    import pandas as pd

    ref_rows = []
    for i, r in enumerate(rows):
        texts = [s["text"] for s in r if s["kind"] == "text"]
        if not texts:
            continue
        t = " ".join(texts)
        ref_rows.append(
            (i, i, t, len(t.split()),
             sum(1 for s in r if s["kind"] == "media"))
        )
    want = pd.DataFrame(
        ref_rows, columns=["doc_num", "part_index", "text", "n_tokens", "n_media"]
    )
    got = got.reset_index(drop=True)
    for c in ("doc_num", "part_index", "n_tokens", "n_media"):
        assert list(got[c]) == list(want[c]), c
    assert list(got["text"]) == list(want["text"])
