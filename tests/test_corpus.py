from gotenberg_ray import corpus
from gotenberg_ray.schemas import DOCUMENTS_SCHEMA, FRONTIER_SCHEMA, KIND_PAGE_BREAK


def page_count(spans: list[dict]) -> int:
    return sum(1 for s in spans if s["kind"] == KIND_PAGE_BREAK) + 1


def test_documents_deterministic_and_fixture_shapes():
    a = corpus.make_documents(20, seed=42)
    b = corpus.make_documents(20, seed=42)
    assert a.equals(b)
    assert a.schema.equals(DOCUMENTS_SCHEMA)
    spans = a.column("spans").to_pylist()
    assert page_count(spans[0]) == 1
    assert page_count(spans[1]) == 3
    assert page_count(spans[2]) == 12
    # offsets are 0..n-1 in order
    for row in spans:
        assert [s["offset"] for s in row] == list(range(len(row)))


def test_frontier_deterministic_with_rejects_and_dups():
    a = corpus.make_frontier(200, n_docs=20, seed=42)
    b = corpus.make_frontier(200, n_docs=20, seed=42)
    assert a.equals(b)
    assert a.schema.equals(FRONTIER_SCHEMA)
    urls = a.column("url").to_pylist()
    assert any(u.startswith("file://") for u in urls)
    assert any("192.168." in u for u in urls)
    hosts = a.column("host").to_pylist()
    hot = sum(1 for h in hosts if h == corpus.HOT_HOST) / len(hosts)
    assert 0.15 < hot < 0.45


def test_robots_deterministic():
    hosts = corpus.host_pool(10)
    r1 = corpus.make_robots(hosts, seed=42)
    r2 = corpus.make_robots(hosts, seed=42)
    assert r1 == r2
    assert all(t.startswith("User-agent: *") for t in r1.values())
