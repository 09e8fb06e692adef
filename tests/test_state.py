import numpy as np
import pytest

from gotenberg_ray.state.bloom import BloomFilter
from gotenberg_ray.state.cuckoo import CuckooFilter
from gotenberg_ray.state.heap import FrontierHeap
from gotenberg_ray.state.politeness import HostBuckets
from gotenberg_ray.state.robots import RobotsCache, parse_robots


def test_bloom_no_false_negatives_and_bounded_fp():
    rng = np.random.RandomState(0)
    keys = rng.randint(0, 2**63, 5000).astype(np.uint64)
    bf = BloomFilter(capacity=10000, fp_rate=0.01)
    bf.add(keys)
    assert bf.contains(keys).all()
    probe = rng.randint(0, 2**63, 20000).astype(np.uint64)
    fresh = probe[~np.isin(probe, keys)]
    fp = bf.contains(fresh).mean()
    assert fp < 0.03


def test_bloom_roundtrip_bitidentical():
    keys = np.arange(1000, dtype=np.uint64) * 7919
    bf = BloomFilter(2000)
    bf.add(keys)
    raw = bf.to_bytes()
    bf2 = BloomFilter.from_bytes(raw)
    assert bf2.to_bytes() == raw
    assert bf2.contains(keys).all()


def test_cuckoo_exact_membership_and_batch_dedup():
    rng = np.random.RandomState(1)
    keys = rng.randint(0, 2**63, 4000).astype(np.uint64)
    cf = CuckooFilter(capacity=8192, seed=3)
    fresh = cf.add_if_absent(keys)
    # a cuckoo filter has no false negatives but may rarely misreport a
    # new key as seen (fingerprint collision) — bound it, don't forbid it
    assert (~fresh).mean() < 0.002
    again = cf.add_if_absent(keys)
    assert not again.any()
    assert cf.contains(keys).all()
    other = rng.randint(0, 2**63, 4000).astype(np.uint64)
    other = other[~np.isin(other, keys)]
    assert cf.contains(other).mean() < 0.001  # 16-bit fp, 2 buckets
    # duplicate within a single batch: only first occurrence is fresh
    cf2 = CuckooFilter(64, seed=1)
    m = cf2.add_if_absent(np.array([5, 5, 6], dtype=np.uint64))
    assert m.tolist() == [True, False, True]


def test_cuckoo_deterministic_serialization():
    keys = (np.arange(3000, dtype=np.uint64) * 2654435761) % (2**61)
    a = CuckooFilter(8192, seed=7)
    b = CuckooFilter(8192, seed=7)
    a.add_if_absent(keys)
    b.add_if_absent(keys)
    assert a.to_bytes() == b.to_bytes()
    c = CuckooFilter.from_bytes(a.to_bytes())
    assert c.contains(keys).all()
    assert c.to_bytes() == a.to_bytes()


def test_heap_order_and_lazy_deletion():
    h = FrontierHeap()
    h.push(5, 1, 10, 100)
    h.push(3, 0, 11, 101)
    h.push(3, 9, 12, 102)
    h.push(3, 9, 9, 103)
    h.delete(11)
    out = h.pop_ready(horizon=4)
    # ready=3 first; among those priority desc, then seq asc; deleted 11 gone
    assert [(t[2]) for t in out] == [9, 12]
    assert len(h) == 1
    assert h.pop_ready(horizon=10) == [(5, 1, 10, 100)]


def test_heap_delete_index_stays_consistent():
    # deletes interleaved with pushes, bulk pushes and pops must keep
    # the lazily-built live-seq index in sync with the real entry set
    import numpy as np

    h = FrontierHeap()
    h.push(1, 0, 1, 10)
    h.delete(1)  # builds the index
    assert len(h) == 0
    h.push(2, 0, 2, 11)  # scalar push after index exists
    h.push_bulk(
        np.array([3, 4]), np.array([0, 0]), np.array([3, 4]), np.array([12, 13], dtype=np.uint64)
    )
    h.delete(3)
    h.delete(3)  # double delete: no-op
    h.delete(99)  # absent: no-op
    assert len(h) == 2
    out = h.pop_ready(horizon=10)
    assert [t[2] for t in out] == [2, 4]
    h.delete(2)  # popped seq: must be absent from the index now
    assert len(h) == 0
    h.push(5, 0, 2, 11)  # re-push a previously-popped seq
    h.delete(2)
    assert len(h) == 0


def test_heap_canonical_serialization():
    a, b = FrontierHeap(), FrontierHeap()
    for args in [(3, 1, 1, 10), (1, 2, 2, 11), (2, 3, 3, 12)]:
        a.push(*args)
    for args in [(2, 3, 3, 12), (3, 1, 1, 10), (1, 2, 2, 11)]:
        b.push(*args)
    a.delete(2)
    b.delete(2)
    assert a.to_table().equals(b.to_table())
    c = FrontierHeap.from_table(a.to_table())
    assert c.to_table().equals(a.to_table())


def test_politeness_reserve_and_refill():
    hb = HostBuckets(default_delay=3, capacity=1)
    ok, when = hb.reserve("h", 0)
    assert ok and when == 0
    ok, when = hb.reserve("h", 1)
    assert not ok and when == 3  # next token at t=3
    ok, when = hb.reserve("h", 3)
    assert ok and when == 3
    ok, when = hb.reserve("h", 3)
    assert not ok and when == 6


def test_politeness_burst_capacity_and_roundtrip():
    hb = HostBuckets(default_delay=2, capacity=3)
    grants = [hb.reserve("h", 0)[0] for _ in range(4)]
    assert grants == [True, True, True, False]
    t = hb.to_table()
    hb2 = HostBuckets.from_table(t, default_delay=2, capacity=3)
    assert hb2.to_table().equals(t)
    # both replicas evolve identically
    assert hb.reserve("h", 5) == hb2.reserve("h", 5)


def test_robots_parse_and_match():
    txt = """
User-agent: *
Disallow: /private/
Allow: /private/ok
Crawl-delay: 4

User-agent: special
Disallow: /
"""
    r = parse_robots(txt, "gotenberg-ray")
    assert not r.allowed("/private/x")
    assert r.allowed("/private/ok/page")  # allow wins (longer match)
    assert r.allowed("/public")
    assert r.crawl_delay == 4
    r2 = parse_robots(txt, "special")
    assert not r2.allowed("/anything")
    # wildcard + anchor
    r3 = parse_robots("User-agent: *\nDisallow: /*.pdf$", "x")
    assert not r3.allowed("/a/b.pdf")
    assert r3.allowed("/a/b.pdfx")


def test_robots_cache_counts_fetches():
    calls = []

    def fetch(host):
        calls.append(host)
        return "User-agent: *\nDisallow: /no/"

    rc = RobotsCache(fetch)
    assert rc.allowed("h1", "/yes")
    assert not rc.allowed("h1", "/no/x")
    assert rc.crawl_delay("h1") is None
    assert calls == ["h1"]


def test_empty_robots_allows_everything():
    rc = RobotsCache(lambda h: None)
    assert rc.allowed("h", "/anything")


class TestHeapScalarApi:
    def test_push_big_hash_roundtrips(self):
        from gotenberg_ray.state.heap import FrontierHeap

        h = FrontierHeap()
        big = 0xD6E8FEB86659FD93  # ≥ 2^63
        h.push(0, 1, 7, big)
        t = h.to_table()
        assert t.column("url_hash").to_pylist() == [big]

    def test_delete_is_idempotent_and_checks_presence(self):
        from gotenberg_ray.state.heap import FrontierHeap

        h = FrontierHeap()
        h.push(0, 1, 7, 1)
        h.delete(7)
        h.delete(7)  # double delete: no-op
        h.delete(99)  # absent seq: no-op
        assert len(h) == 0
        h.push(1, 1, 8, 2)
        assert len(h) == 1


def test_robots_wildcard_batch_accepts_arrow_arrays():
    """The wildcard ('*'/'$') ruleset fallback must accept pyarrow
    string arrays — the shard admission gate passes them (review-found
    crash: an arrow StringScalar into re.match raised TypeError and
    killed the crawl for any real-world robots.txt with wildcards)."""
    import numpy as np
    import pyarrow as pa

    r = parse_robots("User-agent: *\nDisallow: /*.pdf$", "x")
    paths = ["/a/b.pdf", "/page", "/x.pdfy", "/deep/c.pdf"]
    want = np.array([r.allowed(p) for p in paths])
    got_arr = r.allowed_batch(pa.array(paths, pa.string()))
    got_chunked = r.allowed_batch(pa.chunked_array([paths[:2], paths[2:]]))
    got_list = r.allowed_batch(paths)
    assert (got_arr == want).all()
    assert (got_chunked == want).all()
    assert (got_list == want).all()
    assert list(want) == [False, True, True, False]
