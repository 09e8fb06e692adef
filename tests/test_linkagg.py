"""Inbound-link aggregation: brute-force parity against the scalar
``synthetic_links`` reference (the same parity contract the fetch
simulator itself is pinned by), bounded-k host concat semantics, and
determinism of the distributed top-k merge."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from gotenberg_ray.corpus import host_pool
from gotenberg_ray.functions.hashing import fnv64_one
from gotenberg_ray.pipelines import urls as U
from gotenberg_ray.stages.fetcher import synthetic_links


def _write_documents(tmp_path, n_docs):
    t = pa.table(
        {
            "doc_id": pa.array(list(range(n_docs)), pa.int64()),
            "text": pa.array(["hello world"] * n_docs),
            "lang": pa.array(["en"] * n_docs),
            "source": pa.array(["web"] * n_docs),
            "n_chars": pa.array([11] * n_docs, pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    return str(tmp_path)


def _reference(n_docs, k):
    """Recompute the full aggregation with the SCALAR link reference."""
    n_urls = 40 * n_docs
    n_hosts = max(20, n_urls // 500)
    universe = max(100, n_urls // 2)
    hosts = host_pool(n_hosts)
    agg: dict[str, list] = {}
    for i in range(n_urls):
        host = hosts[i % len(hosts)]
        url = f"http://{host}/page/{i}"
        for target in synthetic_links(fnv64_one(url), host, universe, max_links=3):
            agg.setdefault(target, []).append(host)
    rows = []
    for target, srcs in agg.items():
        distinct = sorted(set(srcs))
        rows.append(
            {
                "target": target,
                "in_degree": len(srcs),
                "n_src_hosts": len(distinct),
                "first_hosts": ",".join(distinct[:2]),
            }
        )
    df = pd.DataFrame(rows)
    return (
        df.sort_values(["in_degree", "target"], ascending=[False, True], kind="mergesort")
        .head(k)
        .reset_index(drop=True)
    )


def test_link_indegree_matches_scalar_reference(ray_session, tmp_path):
    sf = _write_documents(tmp_path, 30)  # 1200 source URLs
    got = U.link_indegree_topk(sf, k=40)
    exp = _reference(30, 40)
    pd.testing.assert_frame_equal(got, exp)


def test_link_indegree_deterministic(ray_session, tmp_path):
    sf = _write_documents(tmp_path, 10)
    a = U.link_indegree_topk(sf, k=25)
    b = U.link_indegree_topk(sf, k=25)
    pd.testing.assert_frame_equal(a, b)


def test_link_indegree_single_host_has_no_comma(ray_session, tmp_path):
    sf = _write_documents(tmp_path, 10)
    df = U.link_indegree_topk(sf, k=400)
    ones = df[df["n_src_hosts"] == 1]
    assert len(ones) > 0
    assert not ones["first_hosts"].str.contains(",").any()
    twos = df[df["n_src_hosts"] >= 2]
    if len(twos):
        assert twos["first_hosts"].str.count(",").eq(1).all()
