"""Crawl scheduler: epoch-synchronous virtual-time driver loop.

The same loop runs in two orchestrations:

- ``mode="local"`` — the *reference scheduler*: plain FrontierShard
  objects driven sequentially in one process. This is the ground truth
  the north rule's determinism criterion compares against.
- ``mode="ray"`` — shards wrapped in Ray actors, the fetch/render
  stage as a Ray Data ``map_batches`` actor pool over Arrow batches.

Shared contract (bit-identical by construction, SURVEY §7.5):
- virtual time in integer ticks; epoch k covers [kW, (k+1)W).
- per epoch: every shard grants all entries ready by the horizon in
  (ready_time, -priority, seq) order under per-host token buckets;
  the global fetch order is the (fetch_time, -priority, seq) sorted
  merge of shard grants (fetch_time never crosses epoch boundaries,
  so epoch-wise concatenation is globally sorted).
- discovered links re-enter the frontier at the NEXT epoch boundary
  with driver-assigned sequence numbers ordered by
  (parent fetch order, link_index) — seq assignment at schedule time
  is what makes ordering independent of Ray task completion order.
- admission (canonicalize → scheme/filter/IP policy) is stateless and
  vectorized; seen-dedup/robots/politeness live in the shards.

Scale notes: partitioning key is fnv64(host) % P (host state locality;
the north rule's frontier redistribution shuffle); P is a config knob
sized so cuckoo shards fit worker heaps (10^10 URLs / P=4096 → ~8 MiB
tables per shard). Links flow back through the object store as Arrow;
pages are written per-epoch to partitioned parquet (resumable output).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import fnv64
from ..functions.urlkit import UrlFilter, canonicalize_batch, host_ip_policy
from ..schemas import ERR_FILTERED, ERR_INVALID_INPUT
from ..stages.fetcher import SimulatedFetcher
from .shard import GRANT_SCHEMA, FrontierShard

LOG_SCHEMA = pa.schema(
    [
        ("fetch_seq", pa.int64()),
        ("seq", pa.int64()),
        ("fetch_time", pa.int64()),
        ("priority", pa.int32()),
        ("url_canon", pa.string()),
        ("host", pa.string()),
        ("status", pa.string()),
        ("error_type", pa.string()),
        ("http_status", pa.uint16()),
        ("epoch", pa.int64()),
    ]
)

CANDIDATE_SCHEMA = pa.schema(
    [
        ("url_canon", pa.string()),
        ("url_hash", pa.uint64()),
        ("host", pa.string()),
        ("priority", pa.int32()),
        ("next_fetch_time", pa.int64()),
        ("route", pa.string()),
        ("doc_id", pa.string()),
        ("options_json", pa.string()),
        ("seq", pa.int64()),
    ]
)


@dataclasses.dataclass
class CrawlConfig:
    n_partitions: int = 4
    epoch_width: int = 8
    max_epochs: int = 10_000
    max_fetches: int | None = None
    seed: int = 42
    default_delay: int = 2
    burst: int = 1
    allow: tuple[str, ...] = ()
    deny: tuple[str, ...] = ()
    link_universe: int = 1000
    max_links: int = 3
    shard_capacity: int = 1 << 16
    checkpoint_every: int = 0  # epochs; 0 = only final
    fetch_batch_size: int = 2048
    fetch_concurrency: int = 4
    fetch_num_cpus: float = 1.0

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), sort_keys=True)


# ---------------------------------------------------------------- admission


def admit_candidates(
    batch: pa.Table, url_filter: UrlFilter
) -> tuple[pa.Table, pa.Table]:
    """Stateless admission: canonicalize + scheme/regex/IP-policy gate.

    In: raw rows with url, priority, next_fetch_time, route, doc_id,
    options_json, seq. Out: (accepted CANDIDATE_SCHEMA rows, rejected
    rows with error_type).
    """
    urls = batch.column("url").to_pylist()
    canon, hosts, hashes = canonicalize_batch(urls)
    canon_l = canon.to_pylist()
    hosts_l = hosts.to_pylist()
    n = len(urls)
    err = [""] * n
    for i in range(n):
        c = canon_l[i]
        if c.startswith("file:") or not c.startswith(("http://", "https://")):
            err[i] = ERR_INVALID_INPUT  # scheme reject, routes.go:417-435
        elif not url_filter.decide(c):
            err[i] = ERR_FILTERED
        elif host_ip_policy(hosts_l[i]) == "non_public":
            err[i] = ERR_FILTERED  # outbound.go IP-class policy
    ok = np.array([e == "" for e in err])
    accepted = pa.table(
        {
            "url_canon": pa.array([c for c, o in zip(canon_l, ok) if o], pa.string()),
            "url_hash": pa.array(hashes[ok]),
            "host": pa.array([h for h, o in zip(hosts_l, ok) if o], pa.string()),
            "priority": batch.column("priority").filter(pa.array(ok)).cast(pa.int32()),
            "next_fetch_time": batch.column("next_fetch_time").filter(pa.array(ok)),
            "route": batch.column("route").filter(pa.array(ok)),
            "doc_id": batch.column("doc_id").filter(pa.array(ok)),
            "options_json": batch.column("options_json").filter(pa.array(ok)),
            "seq": batch.column("seq").filter(pa.array(ok)),
        },
        schema=CANDIDATE_SCHEMA,
    )
    rejected = pa.table(
        {
            "url": pa.array([u for u, o in zip(urls, ok) if not o], pa.string()),
            "error_type": pa.array([e for e in err if e], pa.string()),
        }
    )
    return accepted, rejected


def partition_of(hosts: list[str] | pa.Array, n_partitions: int) -> np.ndarray:
    """North-rule partitioner: fnv64(host) % P."""
    return (fnv64(hosts) % np.uint64(n_partitions)).astype(np.int64)


def _split_by_partition(table: pa.Table, parts: np.ndarray, n: int) -> list[pa.Table]:
    out = []
    for p in range(n):
        mask = parts == p
        out.append(table.filter(pa.array(mask)) if mask.any() else table.schema.empty_table())
    return out


def _sort_grants(tables: list[pa.Table]) -> pa.Table:
    live = [t for t in tables if t.num_rows]
    if not live:
        return GRANT_SCHEMA.empty_table()
    merged = pa.concat_tables(live)
    return merged.sort_by(
        [("fetch_time", "ascending"), ("priority", "descending"), ("seq", "ascending")]
    )


# ---------------------------------------------------------------- shard sets


class LocalShards:
    """Sequential orchestration — the determinism reference."""

    def __init__(self, cfg: CrawlConfig, robots: dict[str, str]):
        self.shards = [
            FrontierShard(
                p,
                capacity=cfg.shard_capacity,
                seed=cfg.seed,
                default_delay=cfg.default_delay,
                burst=cfg.burst,
                robots_texts=robots,
            )
            for p in range(cfg.n_partitions)
        ]

    def offer(self, tables: list[pa.Table]) -> None:
        for shard, t in zip(self.shards, tables):
            if t.num_rows:
                shard.offer(t)

    def pop_epoch(self, horizon: int) -> list[pa.Table]:
        return [s.pop_epoch(horizon) for s in self.shards]

    def min_ready(self) -> int | None:
        vals = [s.min_ready() for s in self.shards]
        vals = [v for v in vals if v is not None]
        return min(vals) if vals else None

    def counters(self) -> dict:
        total: dict[str, int] = {}
        for s in self.shards:
            for k, v in s.get_counters().items():
                total[k] = total.get(k, 0) + v
        return total

    def checkpoints(self) -> list[dict]:
        return [s.checkpoint() for s in self.shards]

    def restore(self, states: list[dict]) -> None:
        for s, st in zip(self.shards, states):
            s.restore(st)


class RayShards:
    """Actor-pool orchestration of the same shards."""

    def __init__(self, cfg: CrawlConfig, robots: dict[str, str]):
        import ray

        actor_cls = ray.remote(num_cpus=0.25)(FrontierShard)
        robots_ref = ray.put(robots)
        self.actors = [
            actor_cls.remote(
                p,
                capacity=cfg.shard_capacity,
                seed=cfg.seed,
                default_delay=cfg.default_delay,
                burst=cfg.burst,
                robots_texts=robots_ref,
            )
            for p in range(cfg.n_partitions)
        ]
        self._ray = ray

    def offer(self, tables: list[pa.Table]) -> None:
        refs = [
            a.offer.remote(t) for a, t in zip(self.actors, tables) if t.num_rows
        ]
        self._ray.get(refs)

    def pop_epoch(self, horizon: int) -> list[pa.Table]:
        return self._ray.get([a.pop_epoch.remote(horizon) for a in self.actors])

    def min_ready(self) -> int | None:
        vals = [v for v in self._ray.get([a.min_ready.remote() for a in self.actors]) if v is not None]
        return min(vals) if vals else None

    def counters(self) -> dict:
        total: dict[str, int] = {}
        for c in self._ray.get([a.get_counters.remote() for a in self.actors]):
            for k, v in c.items():
                total[k] = total.get(k, 0) + v
        return total

    def checkpoints(self) -> list[dict]:
        return self._ray.get([a.checkpoint.remote() for a in self.actors])

    def restore(self, states: list[dict]) -> None:
        self._ray.get(
            [a.restore.remote(st) for a, st in zip(self.actors, states)]
        )


# ------------------------------------------------------------- fetch runners

_LOG_COLS = [
    "seq", "fetch_time", "priority", "url_canon", "host",
    "status", "error_type", "http_status",
]


def _extract_links(result: pa.Table) -> pa.Table:
    """Flatten the links list column → (parent_seq, parent_priority,
    url, link_index) rows, vectorized."""
    links = result.column("links")
    if isinstance(links, pa.ChunkedArray):
        links = links.combine_chunks()
    flat = pc.list_flatten(links)
    parents = pc.list_parent_indices(links)
    if len(flat) == 0:
        return pa.table(
            {
                "parent_seq": pa.array([], pa.int64()),
                "parent_priority": pa.array([], pa.int32()),
                "url": pa.array([], pa.string()),
                "link_index": pa.array([], pa.int32()),
            }
        )
    seqs = result.column("seq").take(parents)
    prios = result.column("priority").take(parents)
    return pa.table(
        {
            "parent_seq": seqs.cast(pa.int64()),
            "parent_priority": prios.cast(pa.int32()),
            "url": flat.field("url"),
            "link_index": flat.field("link_index"),
        }
    )


class LocalFetchRunner:
    def __init__(self, docs: pa.Table, cfg: CrawlConfig, pages_dir: str | None = None):
        self.fetcher = SimulatedFetcher(
            docs, link_universe=cfg.link_universe, max_links=cfg.max_links
        )
        self.pages_dir = pages_dir

    def __call__(self, grants: pa.Table, epoch: int) -> tuple[pa.Table, pa.Table]:
        result = self.fetcher(grants)
        if self.pages_dir:
            import pyarrow.parquet as pq
            import os

            d = f"{self.pages_dir}/epoch={epoch:06d}"
            os.makedirs(d, exist_ok=True)
            pq.write_table(result.drop_columns(["links"]), f"{d}/pages.parquet")
        return result.select(_LOG_COLS), _extract_links(result)


class _FetchWorker(SimulatedFetcher):
    """Actor wrapper: fetches a chunk, writes its page rows straight to
    the partitioned parquet sink, returns only the small log/link
    columns — span payloads never transit the driver."""

    def fetch(
        self, batch: pa.Table, epoch: int, chunk: int, pages_dir: str | None
    ) -> pa.Table:
        result = self(batch)
        if pages_dir:
            import os

            import pyarrow.parquet as pq

            d = f"{pages_dir}/epoch={epoch:06d}"
            os.makedirs(d, exist_ok=True)
            pq.write_table(
                result.drop_columns(["links"]), f"{d}/part-{chunk:04d}.parquet"
            )
        return result.select(_LOG_COLS + ["links"])


class RayFetchRunner:
    """Fetch stage as a PERSISTENT actor pool.

    A fresh ``map_batches`` execution per epoch would rebuild its actor
    pool every epoch (seconds of startup each) — the supervisor
    semantics here are a long-lived pool like the reference's browser
    processes (SURVEY §2.3), fed one epoch's grant table at a time.
    The documents table is broadcast ONCE via ray.put and resolved in
    each actor's __init__, never per batch. Chunk assignment is
    deterministic (round-robin over a deterministic split), and results
    are re-sorted by the schedule-time key downstream, so orchestration
    order never leaks into outputs.
    """

    def __init__(self, docs: pa.Table, cfg: CrawlConfig, pages_dir: str | None = None):
        import ray

        self.cfg = cfg
        self.pages_dir = pages_dir
        self._ray = ray
        docs_ref = ray.put(docs)
        actor_cls = ray.remote(num_cpus=cfg.fetch_num_cpus)(_FetchWorker)
        self.actors = [
            actor_cls.remote(
                docs=docs_ref,
                link_universe=cfg.link_universe,
                max_links=cfg.max_links,
            )
            for _ in range(cfg.fetch_concurrency)
        ]

    def __call__(self, grants: pa.Table, epoch: int) -> tuple[pa.Table, pa.Table]:
        n = grants.num_rows
        size = max(1, min(self.cfg.fetch_batch_size, -(-n // len(self.actors))))
        refs = []
        for ci, off in enumerate(range(0, n, size)):
            chunk = grants.slice(off, size)
            refs.append(
                self.actors[ci % len(self.actors)].fetch.remote(
                    chunk, epoch, ci, self.pages_dir
                )
            )
        small = pa.concat_tables(self._ray.get(refs))
        return small.select(_LOG_COLS), _extract_links(small)


# ------------------------------------------------------------------ the loop


@dataclasses.dataclass
class CrawlResult:
    fetch_log: pa.Table
    counters: dict
    rejected: pa.Table
    epochs: int
    next_seq: int
    fetch_seq: int


def run_crawl(
    frontier: pa.Table,
    docs: pa.Table,
    robots: dict[str, str],
    cfg: CrawlConfig,
    mode: str = "local",
    pages_dir: str | None = None,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    log_sink: Callable[[pa.Table], None] | None = None,
) -> CrawlResult:
    from . import checkpoint as ckpt

    shards = LocalShards(cfg, robots) if mode == "local" else RayShards(cfg, robots)
    runner = (
        LocalFetchRunner(docs, cfg, pages_dir)
        if mode == "local"
        else RayFetchRunner(docs, cfg, pages_dir)
    )
    url_filter = UrlFilter(list(cfg.allow), list(cfg.deny))
    W = cfg.epoch_width

    logs: list[pa.Table] = []
    rejected_parts: list[pa.Table] = []
    if resume:
        state = ckpt.load_latest(checkpoint_dir)
        shards.restore(state["shards"])
        k = state["driver"]["epoch"]
        next_seq = state["driver"]["next_seq"]
        fetch_seq = state["driver"]["fetch_seq"]
        epochs_done = state["driver"]["epochs_done"]
    else:
        accepted, rejected = admit_candidates(frontier, url_filter)
        rejected_parts.append(rejected)
        parts = partition_of(accepted.column("host").to_pylist(), cfg.n_partitions)
        shards.offer(_split_by_partition(accepted, parts, cfg.n_partitions))
        next_seq = (
            int(pc.max(frontier.column("seq")).as_py()) + 1 if frontier.num_rows else 0
        )
        k, fetch_seq, epochs_done = 0, 0, 0

    while epochs_done < cfg.max_epochs and (
        cfg.max_fetches is None or fetch_seq < cfg.max_fetches
    ):
        horizon = (k + 1) * W - 1
        grants = _sort_grants(shards.pop_epoch(horizon))
        if grants.num_rows == 0:
            mr = shards.min_ready()
            if mr is None:
                break  # frontier exhausted
            k = mr // W
            continue
        log, links = runner(grants, k)
        log = log.add_column(
            0, "fetch_seq", pa.array(np.arange(fetch_seq, fetch_seq + log.num_rows))
        )
        # runner output order can be arbitrary (Ray) → re-sort by the
        # schedule-time key to restore the deterministic global order
        log = log.sort_by([("fetch_seq", "ascending")]) if mode == "local" else log
        if mode == "ray":
            log = (
                log.drop_columns(["fetch_seq"])
                .sort_by(
                    [
                        ("fetch_time", "ascending"),
                        ("priority", "descending"),
                        ("seq", "ascending"),
                    ]
                )
                .add_column(
                    0,
                    "fetch_seq",
                    pa.array(np.arange(fetch_seq, fetch_seq + log.num_rows)),
                )
            )
        log = log.append_column("epoch", pa.array(np.full(log.num_rows, k)))
        fetch_seq += log.num_rows
        if log_sink is not None:
            log_sink(log)
        else:
            logs.append(log)

        if links.num_rows:
            links = links.sort_by(
                [("parent_seq", "ascending"), ("link_index", "ascending")]
            )
            cand_raw = pa.table(
                {
                    "url": links.column("url"),
                    "priority": pc.max_element_wise(
                        pc.subtract(links.column("parent_priority"), 1), 0
                    ).cast(pa.int32()),
                    "next_fetch_time": pa.array(
                        np.full(links.num_rows, (k + 1) * W, dtype=np.int64)
                    ),
                    "route": pa.array(["convert/url"] * links.num_rows, pa.string()),
                    "doc_id": pa.array(
                        [f"doc-{i % max(1, docs.num_rows):06d}" for i in
                         (fnv64(links.column("url").to_pylist()) % np.uint64(max(1, docs.num_rows))).tolist()],
                        pa.string(),
                    ),
                    "options_json": pa.array(["{}"] * links.num_rows, pa.string()),
                    "seq": pa.array(
                        np.arange(next_seq, next_seq + links.num_rows, dtype=np.int64)
                    ),
                }
            )
            next_seq += links.num_rows
            accepted, rejected = admit_candidates(cand_raw, url_filter)
            rejected_parts.append(rejected)
            if accepted.num_rows:
                parts = partition_of(
                    accepted.column("host").to_pylist(), cfg.n_partitions
                )
                shards.offer(_split_by_partition(accepted, parts, cfg.n_partitions))
        k += 1
        epochs_done += 1
        if (
            checkpoint_dir
            and cfg.checkpoint_every
            and epochs_done % cfg.checkpoint_every == 0
        ):
            ckpt.write(
                checkpoint_dir,
                shards.checkpoints(),
                {
                    "epoch": k,
                    "next_seq": next_seq,
                    "fetch_seq": fetch_seq,
                    "epochs_done": epochs_done,
                    "config": cfg.to_json(),
                },
            )

    if checkpoint_dir:
        ckpt.write(
            checkpoint_dir,
            shards.checkpoints(),
            {
                "epoch": k,
                "next_seq": next_seq,
                "fetch_seq": fetch_seq,
                "epochs_done": epochs_done,
                "config": cfg.to_json(),
            },
        )
    fetch_log = (
        pa.concat_tables(logs) if logs else LOG_SCHEMA.empty_table()
    )
    rejected = (
        pa.concat_tables([r for r in rejected_parts if r.num_rows])
        if any(r.num_rows for r in rejected_parts)
        else rejected_parts[0] if rejected_parts else pa.table({"url": pa.array([], pa.string()), "error_type": pa.array([], pa.string())})
    )
    return CrawlResult(
        fetch_log=fetch_log,
        counters=shards.counters(),
        rejected=rejected,
        epochs=epochs_done,
        next_seq=next_seq,
        fetch_seq=fetch_seq,
    )
