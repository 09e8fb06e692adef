"""FrontierShard — one partition of the URL frontier (north star core).

Each shard owns, for its partition of the host space:
- the cuckoo-filter URL-seen truth set + bloom fast-reject tier,
- the lazy-deletion binary heap keyed (ready_time, priority desc, seq),
- per-host politeness token buckets + the robots.txt cache,
- the pending-URL payload store and counters.

Partitioning is ``fnv64(host) % P`` so a host's politeness state and
all its URLs are local to one shard (the groupby-host politeness
accounting of the north rule happens shard-locally, with no extra
shuffle); the seen-key is ``fnv64(url_canon)``. The same class runs
sequentially (determinism reference) or wrapped in a Ray actor
(``ray.remote(FrontierShard)``) — ALL scheduling state lives here, so
the two orchestrations are bit-identical by construction.

Virtual-time semantics (shared contract with the reference scheduler,
SURVEY §7.5 "order assigned at schedule time"): pop order within a
shard is (ready_time, -priority, seq); a popped entry either gets a
politeness token and is GRANTED at fetch_time == ready_time, or is
pushed back at the host's next token time. Grant decisions depend only
on (entry, host state), never on a global clock, which is what lets
per-shard simulation reproduce the global sequential schedule exactly.
"""

from __future__ import annotations

from urllib.parse import urlsplit

import numpy as np
import pyarrow as pa

from ..state.bloom import BloomFilter
from ..state.cuckoo import CuckooFilter
from ..state.heap import FrontierHeap
from ..state.politeness import HostBuckets
from ..state.robots import RobotsCache

GRANT_SCHEMA = pa.schema(
    [
        ("seq", pa.int64()),
        ("fetch_time", pa.int64()),
        ("priority", pa.int32()),
        ("url_hash", pa.uint64()),
        ("url_canon", pa.string()),
        ("host", pa.string()),
        ("route", pa.string()),
        ("doc_id", pa.string()),
        ("options_json", pa.string()),
    ]
)

PAYLOAD_SCHEMA = pa.schema(
    [
        ("seq", pa.int64()),
        ("url_canon", pa.string()),
        ("host", pa.string()),
        ("route", pa.string()),
        ("doc_id", pa.string()),
        ("options_json", pa.string()),
    ]
)

COUNTER_KEYS = ("offered", "admitted", "duplicate", "robots_denied", "granted")


class FrontierShard:
    def __init__(
        self,
        partition_id: int,
        capacity: int = 1 << 16,
        seed: int = 0,
        default_delay: int = 2,
        burst: int = 1,
        robots_texts: dict[str, str] | None = None,
    ):
        self.partition_id = int(partition_id)
        self.seed = int(seed)
        self.capacity = int(capacity)
        self.default_delay = int(default_delay)
        self.burst = int(burst)
        self.cuckoo = CuckooFilter(capacity, seed=seed + partition_id)
        self.bloom = BloomFilter(capacity, fp_rate=0.01)
        self.heap = FrontierHeap()
        self.buckets = HostBuckets(default_delay=default_delay, capacity=burst)
        robots_texts = robots_texts or {}
        self.robots = RobotsCache(robots_texts.get)
        # seq -> (url_canon, host, route, doc_id, options_json)
        self.payloads: dict[int, tuple[str, str, str, str, str]] = {}
        self.counters = dict.fromkeys(COUNTER_KEYS, 0)
        self._delay_set: set[str] = set()  # hosts whose crawl-delay is applied
        self._pending: list[pa.Table] = []  # buffered offers, applied at flush

    # ------------------------------------------------------------------ offer
    def offer(self, batch: pa.Table) -> int:
        """Buffer candidate rows; they are APPLIED (seen-dedup, robots,
        heap insert) at the next flush, sorted by seq — so the admitted
        state is a pure function of the candidate SET, not of the order
        worker pushes happened to arrive in (bit-identical checkpoints
        across orchestrations)."""
        if batch.num_rows:
            self._pending.append(batch)
        return batch.num_rows

    def offer_assembled(
        self, parts: list[tuple], ready_time: int
    ) -> int:
        """Assemble candidate rows pushed by fetch workers: each part is
        (payload_handle, row_indices, seqs) where payload_handle is a
        LINK_CANDIDATE table or a ray.ObjectRef to one (resolved here,
        inside the shard — the driver never touches candidate payloads).
        """
        total = 0
        for handle, idx, seqs in parts:
            if not isinstance(handle, pa.Table):  # ObjectRef from a worker
                import ray

                handle = ray.get(handle)
            sub = handle.take(pa.array(np.asarray(idx, dtype=np.int64)))
            n = sub.num_rows
            batch = pa.table(
                {
                    "url_canon": sub.column("url_canon"),
                    "url_hash": sub.column("url_hash"),
                    "host": sub.column("host"),
                    "path": sub.column("path"),
                    "priority": sub.column("priority"),
                    "next_fetch_time": pa.array(
                        np.full(n, ready_time, dtype=np.int64)
                    ),
                    "route": sub.column("route"),
                    "doc_id": sub.column("doc_id"),
                    "options_json": sub.column("options_json"),
                    "seq": pa.array(np.asarray(seqs, dtype=np.int64)),
                }
            )
            self._pending.append(batch)
            total += n
        return total

    def flush(self) -> None:
        """Apply buffered offers in global seq order (deterministic)."""
        if not self._pending:
            return
        merged = (
            pa.concat_tables(self._pending, promote_options="none")
            if len(self._pending) > 1
            else self._pending[0]
        )
        self._pending = []
        self._apply_offer(merged.sort_by([("seq", "ascending")]))

    def _apply_offer(self, batch: pa.Table) -> dict:
        """Admit candidate URLs: seen-dedup (bloom→cuckoo), robots gate,
        heap insert. Batch columns: url_canon, url_hash, host, path,
        priority, next_fetch_time, route, doc_id, options_json, seq.

        A URL enters the seen set the first time it is *considered* —
        robots-denied URLs are seen too (never reconsidered), mirroring
        a frontier that filters before enqueue.
        """
        n = batch.num_rows
        self.counters["offered"] += n
        if n == 0:
            return dict(self.counters)
        hashes = batch.column("url_hash").to_numpy(zero_copy_only=False).astype(np.uint64)
        # bloom fast-reject: definitely-new keys skip nothing here (we
        # must insert them anyway), but definitely-seen answers let us
        # skip the cuckoo probe for the common duplicate case
        maybe_seen = self.bloom.contains(hashes)
        fresh = np.zeros(n, dtype=bool)
        if (~maybe_seen).any():
            idx = np.nonzero(~maybe_seen)[0]
            f = self.cuckoo.add_if_absent(hashes[idx])
            fresh[idx] = f
        if maybe_seen.any():
            idx = np.nonzero(maybe_seen)[0]
            f = self.cuckoo.add_if_absent(hashes[idx])
            fresh[idx] = f
        self.bloom.add(hashes[fresh])
        self.counters["duplicate"] += int(n - fresh.sum())
        if not fresh.any():
            return dict(self.counters)

        urls = batch.column("url_canon").to_pylist()
        hosts = batch.column("host").to_pylist()
        prios = batch.column("priority").to_pylist()
        readies = batch.column("next_fetch_time").to_pylist()
        routes = batch.column("route").to_pylist()
        doc_ids = batch.column("doc_id").to_pylist()
        opts = batch.column("options_json").to_pylist()
        seqs = batch.column("seq").to_pylist()
        paths = (
            batch.column("path").to_pylist()
            if "path" in batch.column_names
            else [None] * n
        )
        for i in np.nonzero(fresh)[0]:
            host = hosts[i]
            path = paths[i] or (urlsplit(urls[i]).path or "/")
            if not self.robots.allowed(host, path):
                self.counters["robots_denied"] += 1
                continue
            if host not in self._delay_set:
                self._delay_set.add(host)
                cd = self.robots.crawl_delay(host)
                if cd is not None:
                    self.buckets.set_delay(host, cd)
            self.counters["admitted"] += 1
            self.payloads[int(seqs[i])] = (urls[i], host, routes[i], doc_ids[i], opts[i])
            self.heap.push(int(readies[i]), int(prios[i]), int(seqs[i]), int(hashes[i]))
        return dict(self.counters)

    # ------------------------------------------------------------------- pop
    def pop_epoch(self, horizon: int, limit: int | None = None) -> pa.Table:
        """Grant fetches for every heap entry ready by ``horizon``.

        Pops in (ready_time, -priority, seq) order; each popped entry is
        assigned its host's earliest politeness slot ≥ ready_time. Slots
        within the horizon are committed immediately (fetch_time = slot);
        slots beyond it push the entry back ONCE at that slot — so every
        entry costs at most one pop per epoch, independent of how deep
        its host's queue is. Per-host slots advance monotonically, so
        grant order per host follows pop order; globally the caller
        sorts by (fetch_time, -priority, seq).
        """
        self.flush()
        rows: list[tuple] = []
        while limit is None or len(rows) < limit:
            popped = self.heap.pop_ready(horizon, limit=1)
            if not popped:
                break
            ready, prio, seq, uh = popped[0]
            url, host, route, doc_id, opts = self.payloads[seq]
            slot = self.buckets.next_slot(host, ready)
            if slot <= horizon:
                self.buckets.commit(host, slot)
                del self.payloads[seq]
                self.counters["granted"] += 1
                rows.append((seq, slot, prio, uh, url, host, route, doc_id, opts))
            else:
                self.heap.push(slot, prio, seq, uh)
        if not rows:
            return GRANT_SCHEMA.empty_table()
        cols = list(zip(*rows))
        arrays = [
            pa.array(cols[0], pa.int64()),
            pa.array(cols[1], pa.int64()),
            pa.array(cols[2], pa.int32()),
            pa.array(np.array(cols[3], dtype=np.uint64)),
            pa.array(cols[4], pa.string()),
            pa.array(cols[5], pa.string()),
            pa.array(cols[6], pa.string()),
            pa.array(cols[7], pa.string()),
            pa.array(cols[8], pa.string()),
        ]
        return pa.Table.from_arrays(arrays, schema=GRANT_SCHEMA)

    def pop_epoch_ref(self, horizon: int, limit: int | None = None):
        """pop_epoch, but the grant table goes to the object store and
        only (ref, key columns) return — grant payloads never transit
        the driver. Requires a ray runtime (used via the actor path)."""
        import ray

        grants = self.pop_epoch(horizon, limit)
        keys = grants.select(["seq", "fetch_time", "priority"])
        return ray.put(grants), keys

    def offer_and_pop(
        self, parts: list[tuple], ready_time: int, horizon: int
    ):
        """One round trip per epoch: deliver the previous epoch's link
        candidates, then grant this epoch's fetches."""
        if parts:
            self.offer_assembled(parts, ready_time)
        return self.pop_epoch_ref(horizon)

    def min_ready(self) -> int | None:
        self.flush()
        return self.heap.peek_ready_time()

    def live_count(self) -> int:
        return len(self.heap)

    def get_counters(self) -> dict:
        self.flush()
        return dict(self.counters)

    # ------------------------------------------------------------ checkpoint
    def checkpoint(self) -> dict:
        """Canonical state snapshot (bit-identical across orchestrations)."""
        self.flush()  # pending offers are part of the state
        seqs = sorted(self.payloads)
        payloads = pa.table(
            {
                "seq": pa.array(seqs, pa.int64()),
                "url_canon": pa.array([self.payloads[s][0] for s in seqs], pa.string()),
                "host": pa.array([self.payloads[s][1] for s in seqs], pa.string()),
                "route": pa.array([self.payloads[s][2] for s in seqs], pa.string()),
                "doc_id": pa.array([self.payloads[s][3] for s in seqs], pa.string()),
                "options_json": pa.array([self.payloads[s][4] for s in seqs], pa.string()),
            },
            schema=PAYLOAD_SCHEMA,
        )
        return {
            "partition_id": self.partition_id,
            "cuckoo": self.cuckoo.to_bytes(),
            "bloom": self.bloom.to_bytes(),
            "heap": self.heap.to_table(),
            "buckets": self.buckets.to_table(),
            "payloads": payloads,
            "counters": dict(self.counters),
            "delay_hosts": sorted(self._delay_set),
        }

    def restore(self, state: dict) -> None:
        self.cuckoo = CuckooFilter.from_bytes(state["cuckoo"])
        self.bloom = BloomFilter.from_bytes(state["bloom"])
        self.heap = FrontierHeap.from_table(state["heap"])
        self.buckets = HostBuckets.from_table(
            state["buckets"], default_delay=self.default_delay, capacity=self.burst
        )
        p = state["payloads"]
        self.payloads = {
            int(s): (u, h, r, d, o)
            for s, u, h, r, d, o in zip(
                p.column("seq").to_pylist(),
                p.column("url_canon").to_pylist(),
                p.column("host").to_pylist(),
                p.column("route").to_pylist(),
                p.column("doc_id").to_pylist(),
                p.column("options_json").to_pylist(),
            )
        }
        self.counters = dict(state["counters"])
        self._delay_set = set(state["delay_hosts"])
