"""Distributed connected components — near-dup cluster resolution.

The last step of a production dedup pipeline: near-dup PAIRS (from
minhash / ngram-Jaccard / embedding verification) form a graph whose
connected components are the duplicate clusters; training keeps one
canonical document per component (the minimum doc_id here, so the
result is deterministic).

Algorithm: hash-min label propagation. Every node starts with its own
id as label; each round every node takes the min of its own label and
its neighbours' labels; the fixed point assigns every node the minimum
id of its component. One round = one bucketed shuffle join
(``pipelines/joins.hash_join``: edges ⋈ labels on src) + one groupby
min — both hash-partitioned by node id, so a round moves O(E + V) rows
and nothing lands on the driver. Rounds needed = component diameter,
which for near-dup clusters (cliques plus a few bridges) is small and
bounded by ``max_iters``; a general deep graph would want the
large-star/small-star variant (O(log n) rounds), which this corpus
never needs.

Convergence detection without a second join: labels only ever
decrease, so ``sum(label)`` is strictly monotone until the fixed point
— one cheap distributed aggregate per round instead of an old-vs-new
comparison join.

Driver fast path: a verified near-dup pair list is tiny relative to
the corpus (it is the OUTPUT of dedup). Below ``driver_max_edges``
(16 bytes/edge → ≤32 MB) a fully vectorized numpy min-propagation
with pointer jumping (O(E) per round, O(log n) rounds, no Python per
edge) on the collected edge list is faster than any shuffle; above it
the distributed rounds engage unchanged — mirroring the adaptive
small-pairs path in ``textops._verify_pairs_distributed``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from .joins import hash_join

_I64 = pa.int64()
_EMPTY = pa.table(
    {"doc_id": pa.array([], _I64), "cluster_rep": pa.array([], _I64)}
)

DRIVER_MAX_EDGES = 2_000_000


def _numpy_components(u: np.ndarray, v: np.ndarray) -> pa.Table:
    """Vectorized min-label propagation with pointer jumping over the
    (small) collected edges — O(E) numpy work per round, O(log n)
    rounds, no Python per edge. At the fixed point every edge's
    endpoints share a label c with lbl[c] == c; labels only decrease
    and never leave the component, so c is the component's min node."""
    nodes, inv = np.unique(np.concatenate([u, v]), return_inverse=True)
    ui, vi = inv[: len(u)], inv[len(u) :]
    lbl = np.arange(len(nodes))
    while True:
        new = lbl.copy()
        np.minimum.at(new, ui, lbl[vi])
        np.minimum.at(new, vi, lbl[ui])
        new = new[new]  # pointer jumping: follow one label hop
        if np.array_equal(new, lbl):
            break
        lbl = new
    return pa.table(
        {
            "doc_id": pa.array(nodes, _I64),
            "cluster_rep": pa.array(nodes[lbl], _I64),
        }
    )


def connected_components(
    edges: rd.Dataset,
    *,
    num_partitions: int = 16,
    max_iters: int = 64,
    driver_max_edges: int = DRIVER_MAX_EDGES,
) -> pa.Table:
    """Components of an undirected edge list (columns ``u``, ``v``,
    int64). Returns (doc_id, cluster_rep) for every node that appears
    in at least one edge, sorted by doc_id; cluster_rep is the minimum
    node id of the component."""
    edges = edges.materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return _EMPTY
    if n_edges <= driver_max_edges:
        df = edges.to_pandas()
        return _numpy_components(
            df["u"].to_numpy(np.int64), df["v"].to_numpy(np.int64)
        )

    def bidir(b: pa.Table) -> pa.Table:
        return pa.concat_tables(
            [
                pa.table({"src": b["u"], "dst": b["v"]}),
                pa.table({"src": b["v"], "dst": b["u"]}),
            ]
        )

    bi = edges.map_batches(bidir, batch_format="pyarrow").materialize()

    def init_labels(b: pa.Table) -> pa.Table:
        n = np.unique(b["src"].to_numpy(zero_copy_only=False))
        return pa.table({"node": pa.array(n, _I64), "lbl": pa.array(n, _I64)})

    labels = bi.map_batches(init_labels, batch_format="pyarrow")
    prev_sum: int | None = None
    converged = False
    for _ in range(max_iters):
        msgs = hash_join(
            bi,
            labels,
            on="src",
            right_on="node",
            num_partitions=num_partitions,
            left_schema=[("src", _I64), ("dst", _I64)],
            right_schema=[("node", _I64), ("lbl", _I64)],
        ).map_batches(
            lambda b: pa.table({"node": b["dst"], "lbl": b["lbl"]}),
            batch_format="pyarrow",
        )

        def partial_min(b: pa.Table) -> pa.Table:
            d = (
                pd.DataFrame(
                    {
                        "node": b["node"].to_numpy(zero_copy_only=False),
                        "lbl": b["lbl"].to_numpy(zero_copy_only=False),
                    }
                )
                .groupby("node", sort=False)["lbl"]
                .min()
            )
            return pa.table(
                {
                    "node": pa.array(d.index.to_numpy(), _I64),
                    "lbl": pa.array(d.to_numpy(), _I64),
                }
            )

        new = (
            labels.union(msgs)
            .map_batches(partial_min, batch_format="pyarrow")
            .groupby("node", num_partitions=num_partitions)
            .map_groups(partial_min, batch_format="pyarrow")
            .materialize()
        )
        s = int(new.sum("lbl"))
        labels = new
        if s == prev_sum:  # labels are monotone: equal sum ⇒ fixed point
            converged = True
            break
        prev_sum = s
    if not converged:
        # intermediate labels are NOT component representatives —
        # returning them would silently leak duplicate docs downstream
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} "
            "rounds; the graph has a component deeper than max_iters — "
            "raise max_iters (rounds needed = component diameter)"
        )

    out = labels.map_batches(
        lambda b: pa.table(
            {"doc_id": b["node"], "cluster_rep": b["lbl"]}
        ),
        batch_format="pyarrow",
    ).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)
