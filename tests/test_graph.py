"""Connected components (near-dup cluster resolution): the driver
union-find and the distributed hash-min label propagation must produce
identical components, and the dedup_clusters SQL twin must match."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from gotenberg_ray.pipelines import graph as G


def _edges(pairs):
    u = [a for a, _ in pairs]
    v = [b for _, b in pairs]
    return rd.from_arrow(
        pa.table({"u": pa.array(u, pa.int64()), "v": pa.array(v, pa.int64())})
    )


EXPECT = pd.DataFrame(
    {
        # chain 1-2-3-4 → rep 1; pair (10,11) → 10; star 20-{21,22,23} → 20
        "doc_id": [1, 2, 3, 4, 10, 11, 20, 21, 22, 23],
        "cluster_rep": [1, 1, 1, 1, 10, 10, 20, 20, 20, 20],
    }
)
PAIRS = [(2, 1), (2, 3), (4, 3), (10, 11), (20, 21), (22, 20), (20, 23)]


def test_union_find_path(ray_session):
    got = G.connected_components(_edges(PAIRS)).to_pandas()
    pd.testing.assert_frame_equal(got, EXPECT)


def test_distributed_label_propagation_matches(ray_session):
    # driver_max_edges=0 forces the shuffle-join rounds; a chain needs
    # several rounds, so convergence detection is exercised too
    got = G.connected_components(
        _edges(PAIRS), driver_max_edges=0, num_partitions=4
    ).to_pandas()
    pd.testing.assert_frame_equal(got, EXPECT)


def test_empty_edges(ray_session):
    got = G.connected_components(_edges([])).to_pandas()
    assert len(got) == 0
    assert list(got.columns) == ["doc_id", "cluster_rep"]


def test_dedup_clusters_and_sql_twin(ray_session, tmp_path):
    # corpus with two 3-doc near-dup chains (A≈B≈C via one-word edits)
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(80)]
    base1 = " ".join(rng.choice(vocab, size=40))
    base2 = " ".join(rng.choice(vocab, size=40))

    def mutate(t, tag):
        toks = t.split()
        toks[5] = tag
        return " ".join(toks)

    texts = [base1, mutate(base1, "x1"), mutate(base1, "x2"),
             base2, mutate(base2, "y1"), mutate(base2, "y2")]
    texts += [" ".join(rng.choice(vocab, size=40)) for _ in range(10)]
    ids = list(range(len(texts)))
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(ids)),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        f"{tmp_path}/documents.parquet",
    )

    from gotenberg_ray.pipelines import textops as X

    got = X.dedup_clusters(str(tmp_path), threshold=0.5)
    # both chains collapse to their min id
    assert set(got[got["cluster_rep"] == 0]["doc_id"]) == {0, 1, 2}
    assert set(got[got["cluster_rep"] == 3]["doc_id"]) == {3, 4, 5}

    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    sql = con.execute(X.CLUSTERS_SQL.replace(">= 0.3", ">= 0.5")).df()
    pd.testing.assert_frame_equal(
        got.astype("int64"), sql.astype("int64"), check_dtype=False
    )


@pytest.mark.usefixtures("ray_session")
class TestPageRank:
    def test_deterministic_and_nondegenerate(self, sf_dir):
        a = G.pagerank(sf_dir, iters=4)
        b = G.pagerank(sf_dir, iters=4)
        pd.testing.assert_frame_equal(a, b)
        # the squared link map concentrates in-links: real spread
        assert a["rank_e9"].max() > 2 * a["rank_e9"].min()

    def test_mass_approximately_conserved(self, sf_dir):
        """Integer floors lose ≤1 unit per edge per round; total mass
        must stay within that bound of the initial 10⁹."""
        from gotenberg_ray.pipelines.graph import PR_SCALE, _doc_link_edges

        full = G.pagerank(sf_dir, iters=4, k=10_000)
        edges, n = _doc_link_edges(sf_dir)
        n_edges = edges.count()
        total = full["rank_e9"].sum()
        max_loss = 4 * (n_edges + n)  # floor loss per round, 4 rounds
        assert PR_SCALE - max_loss <= total <= PR_SCALE

    def test_driver_and_distributed_paths_identical(self, sf_dir):
        """driver_max_edges=0 forces the shuffle-join rounds; the numpy
        fast path must reproduce them bit-for-bit (same scaled-integer
        floor arithmetic)."""
        fast = G.pagerank(sf_dir, iters=3, k=10_000)
        dist = G.pagerank(sf_dir, iters=3, k=10_000, driver_max_edges=0)
        pd.testing.assert_frame_equal(fast, dist)

    def test_hub_outranks_unlinked(self, sf_dir):
        """A node with many in-links must outrank a node with none."""
        import numpy as np

        from gotenberg_ray.pipelines.graph import _doc_link_edges

        full = G.pagerank(sf_dir, iters=4, k=10_000).set_index("doc_id")
        edges, n = _doc_link_edges(sf_dir)
        dst = edges.to_pandas()["dst"].to_numpy()
        indeg = np.bincount(dst, minlength=n)
        hub = int(np.argmax(indeg))
        lonely = int(np.argmin(indeg))
        assert indeg[hub] > 3 and indeg[lonely] == 0
        assert full.loc[hub, "rank_e9"] > full.loc[lonely, "rank_e9"]


@pytest.mark.usefixtures("ray_session")
class TestTriangleCount:
    def test_matches_sql_twin_and_deterministic(self, sf_dir):
        import duckdb

        a = G.triangle_count(sf_dir)
        b = G.triangle_count(sf_dir)
        pd.testing.assert_frame_equal(a, b)
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW documents AS FROM '{sf_dir}/documents.parquet'"
        )
        want = int(con.sql(G.TRIANGLES_SQL).df()["n_triangles"][0])
        assert int(a["n_triangles"][0]) == want
        assert want >= 0

    def test_driver_and_distributed_paths_identical(self, sf_dir, monkeypatch):
        fast = G.triangle_count(sf_dir)  # gate engaged (small corpus)
        monkeypatch.setattr(G, "DRIVER_MAX_EDGES", 0)  # force joins
        slow = G.triangle_count(sf_dir)
        pd.testing.assert_frame_equal(fast, slow)

    def test_wedge_budget_falls_through_to_distributed(self, sf_dir, monkeypatch):
        monkeypatch.setattr(G, "_DRIVER_MAX_WEDGES", 0)
        capped = G.triangle_count(sf_dir)
        monkeypatch.undo()
        assert int(capped["n_triangles"][0]) == int(
            G.triangle_count(sf_dir)["n_triangles"][0]
        )


@pytest.mark.usefixtures("ray_session")
class TestReachableNodes:
    def test_matches_sql_twin_and_invariants(self, sf_dir):
        import duckdb

        a = G.reachable_nodes(sf_dir)
        b = G.reachable_nodes(sf_dir)
        pd.testing.assert_frame_equal(a, b)
        assert list(a.columns) == ["doc_id", "depth"]
        # seeds are depth 0, everything within the hop budget
        assert set(a[a.depth == 0]["doc_id"]) == set(range(G.BFS_SEEDS))
        assert a["depth"].max() <= G.BFS_DEPTH
        # min-depth claim: each node appears exactly once
        assert a["doc_id"].is_unique
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS FROM '{sf_dir}/documents.parquet'")
        want = con.sql(G.REACHABLE_SQL).df()
        got = a.astype({"doc_id": "int64", "depth": "int64"})
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.astype("int64").reset_index(drop=True)
        )

    def test_distributed_path_matches_driver_gate(self, sf_dir, monkeypatch):
        fast = G.reachable_nodes(sf_dir)
        monkeypatch.setattr(G, "DRIVER_MAX_EDGES", 0)
        slow = G.reachable_nodes(sf_dir)
        pd.testing.assert_frame_equal(fast, slow)


@pytest.mark.usefixtures("ray_session")
class TestShortestPaths:
    def test_matches_sql_twin_and_dominates_bfs(self, sf_dir):
        import duckdb

        a = G.shortest_paths(sf_dir)
        b = G.shortest_paths(sf_dir)
        pd.testing.assert_frame_equal(a, b)
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS FROM '{sf_dir}/documents.parquet'")
        want = con.sql(G.SHORTEST_SQL).df().astype("int64")
        pd.testing.assert_frame_equal(a.reset_index(drop=True), want)
        # same reachable set as the unweighted BFS (same seeds/hops),
        # and cost ≥ depth (every edge weighs ≥ 1)
        bfs = G.reachable_nodes(sf_dir)
        assert set(a["doc_id"]) == set(bfs["doc_id"])
        m = a.merge(bfs, on="doc_id")
        assert (m["cost"] >= m["depth"]).all()
        assert (a.set_index("doc_id").loc[: G.SP_SEEDS - 1, "cost"] == 0).all()

    def test_distributed_path_matches_driver_gate(self, sf_dir, monkeypatch):
        fast = G.shortest_paths(sf_dir)
        monkeypatch.setattr(G, "DRIVER_MAX_EDGES", 0)
        slow = G.shortest_paths(sf_dir)
        pd.testing.assert_frame_equal(fast, slow)


@pytest.mark.usefixtures("ray_session")
class TestHierarchyRollup:
    def test_matches_sql_twin_and_tree_invariants(self, sf_dir):
        import duckdb

        a = G.hierarchy_rollup(sf_dir)
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS FROM '{sf_dir}/documents.parquet'")
        want = con.sql(G.HIERARCHY_SQL).df().astype("int64")
        pd.testing.assert_frame_equal(a.reset_index(drop=True), want)
        # root subsumes everything; leaves subsume only themselves
        total = int(
            con.sql("SELECT sum(n_chars)::BIGINT s FROM documents").df()["s"][0]
        )
        n = len(a)
        root = a.set_index("doc_id").loc[0]
        assert int(root["subtree_chars"]) == total
        assert int(root["n_desc"]) == n
        leaves = a[a["doc_id"] > (n - 1) // 2]
        assert (leaves["n_desc"] == 1).all()

    def test_distributed_path_matches_driver_gate(self, sf_dir, monkeypatch):
        # the size gate routes small inputs to a driver numpy walk;
        # force the pointer-doubling shuffle path and pin equality
        fast = G.hierarchy_rollup(sf_dir)
        monkeypatch.setattr(G, "DRIVER_MAX_EDGES", 0)
        slow = G.hierarchy_rollup(sf_dir)
        pd.testing.assert_frame_equal(fast, slow)


@pytest.mark.usefixtures("ray_session")
class TestKCore:
    def _slow_reference(self, src, dst, n, k):
        """Obvious per-round peeling over adjacency sets."""
        adj = {i: set() for i in range(n)}
        for a, b in zip(src.tolist(), dst.tolist()):
            if a != b:
                adj[a].add(b)
                adj[b].add(a)
        alive = set(range(n))
        changed = True
        while changed:
            dead = {x for x in alive if len(adj[x] & alive) < k}
            changed = bool(dead)
            alive -= dead
        rows = sorted(
            (x, len(adj[x] & alive)) for x in alive
        )
        return pd.DataFrame(
            {
                "doc_id": pd.Series([r[0] for r in rows], dtype="int64"),
                "core_degree": pd.Series([r[1] for r in rows], dtype="int64"),
            }
        )

    def test_matches_slow_reference(self, sf_dir):
        from gotenberg_ray.pipelines.graph import _doc_link_edges

        edges, n = _doc_link_edges(sf_dir)
        df = edges.to_pandas()
        for k in (2, 3, 5):
            got = G.kcore_nodes(sf_dir, k=k)
            exp = self._slow_reference(
                df["src"].to_numpy(np.int64), df["dst"].to_numpy(np.int64), n, k
            )
            pd.testing.assert_frame_equal(got, exp)

    def test_driver_and_distributed_paths_identical(self, sf_dir):
        fast = G.kcore_nodes(sf_dir, k=3)
        dist = G.kcore_nodes(sf_dir, k=3, driver_max_edges=0)
        pd.testing.assert_frame_equal(
            fast.reset_index(drop=True), dist.reset_index(drop=True)
        )

    def test_core_invariants(self, sf_dir):
        """Every survivor has core_degree >= k, and the (k+1)-core is a
        subset of the k-core (nesting property)."""
        k3 = G.kcore_nodes(sf_dir, k=3)
        k4 = G.kcore_nodes(sf_dir, k=4)
        assert (k3["core_degree"] >= 3).all()
        assert set(k4["doc_id"]) <= set(k3["doc_id"])
