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
        salt_hosts: tuple[str, ...] = (),
        salt_k: int = 1,
    ):
        self.partition_id = int(partition_id)
        self.seed = int(seed)
        self.capacity = int(capacity)
        self.default_delay = int(default_delay)
        self.burst = int(burst)
        self.salt_hosts = tuple(salt_hosts)
        self.salt_k = max(1, int(salt_k))
        self.cuckoo = CuckooFilter(capacity, seed=seed + partition_id)
        self.bloom = BloomFilter(capacity, fp_rate=0.01)
        self.heap = FrontierHeap()
        self.buckets = HostBuckets(
            default_delay=default_delay,
            capacity=burst,
            salted=frozenset(salt_hosts),
            salt_k=self.salt_k,
        )
        robots_texts = robots_texts or {}
        self.robots = RobotsCache(robots_texts.get)
        # pending-URL payload store: admitted rows stay in their Arrow
        # tables; a packed locator (table_idx << 32 | row_idx) maps seq →
        # row, and a liveness mask tracks grants. Strings never become
        # Python objects between admission and grant.
        self._ptables: list[pa.Table | None] = []
        self._pmask: list[np.ndarray] = []
        self._plive: list[int] = []
        self._ploc: dict[int, int] = {}
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
        heap insert — all vectorized. Batch columns: url_canon, url_hash,
        host, path, priority, next_fetch_time, route, doc_id,
        options_json, seq.

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

        sub = batch.take(pa.array(np.nonzero(fresh)[0]))
        m = sub.num_rows
        if "path" in sub.column_names:
            paths = sub.column("path").combine_chunks()
        else:
            paths = pa.array(
                [(urlsplit(u).path or "/") for u in sub.column("url_canon").to_pylist()],
                pa.string(),
            )
        # robots gate, grouped by DISTINCT RULESET rather than by host:
        # RobotsCache dedups identical robots.txt bodies to shared rule
        # objects, so the ~60 distinct rulesets behind thousands of hosts
        # cost one argsort + one allowed_batch each — not a per-host
        # O(hosts × rows) scan. Decisions are identical to the per-host
        # loop (same rules object → same prefix match per path).
        enc = sub.column("host").combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        uhosts = enc.dictionary.to_pylist()
        u = len(uhosts)
        rules_for = self.robots.rules_for
        rules_list = [rules_for(h) for h in uhosts]
        gid_of_host = np.empty(u, dtype=np.int64)
        gid_by_obj: dict[int, int] = {}
        gr_rules: list = []
        for ci, r in enumerate(rules_list):
            g = gid_by_obj.get(id(r))
            if g is None:
                g = len(gr_rules)
                gid_by_obj[id(r)] = g
                gr_rules.append(r)
            gid_of_host[ci] = g
        allowed = np.ones(m, dtype=bool)
        if any(r._compiled for r in gr_rules):
            gid_rows = gid_of_host[codes]
            order = np.argsort(gid_rows, kind="stable")
            sg = gid_rows[order]
            starts = np.nonzero(np.r_[True, sg[1:] != sg[:-1]])[0]
            ends = np.r_[starts[1:], m]
            for a, b in zip(starts, ends):
                r = gr_rules[int(sg[a])]
                if r._compiled:
                    rows = order[a:b]
                    allowed[rows] = r.allowed_batch(paths.take(pa.array(rows)))
        # crawl-delay bookkeeping: once per host, the first time a batch
        # grants it at least one allowed row (hosts without compiled
        # rules always have allowed rows here, so any_ok ≡ bincount > 0)
        new_hosts = [
            (ci, h) for ci, h in enumerate(uhosts) if h not in self._delay_set
        ]
        if new_hosts:
            per_host_ok = (
                np.bincount(codes[allowed], minlength=u) > 0
                if not allowed.all()
                else np.ones(u, dtype=bool)
            )
            for ci, host in new_hosts:
                if per_host_ok[ci]:
                    self._delay_set.add(host)
                    cd = rules_list[ci].crawl_delay
                    if cd is not None:
                        self.buckets.set_delay(host, cd)
        self.counters["robots_denied"] += int(m - allowed.sum())
        if not allowed.any():
            return dict(self.counters)
        adm = sub.filter(pa.array(allowed))
        k = adm.num_rows
        self.counters["admitted"] += k

        seqs = adm.column("seq").to_numpy(zero_copy_only=False)
        ti = len(self._ptables)
        self._ptables.append(adm.select(list(PAYLOAD_SCHEMA.names)))
        self._pmask.append(np.ones(k, dtype=bool))
        self._plive.append(k)
        base = ti << 32
        self._ploc.update(
            zip(seqs.tolist(), (np.arange(k, dtype=np.int64) + base).tolist())
        )
        self.heap.push_bulk(
            adm.column("next_fetch_time").to_numpy(zero_copy_only=False),
            adm.column("priority").to_numpy(zero_copy_only=False).astype(np.int64),
            seqs,
            adm.column("url_hash").to_numpy(zero_copy_only=False).astype(np.uint64),
        )
        return dict(self.counters)

    # ------------------------------------------------------------------- pop
    def _gather_payload(self, seqs: np.ndarray) -> pa.Table:
        """Rows for ``seqs`` (in that order) from the payload tables —
        one take() per source table plus one reorder take."""
        ploc = self._ploc
        locs = np.fromiter((ploc[int(s)] for s in seqs), dtype=np.int64, count=len(seqs))
        order = np.argsort(locs, kind="stable")
        sorted_locs = locs[order]
        tis = sorted_locs >> 32
        ris = sorted_locs & 0xFFFFFFFF
        bounds = np.nonzero(np.r_[True, tis[1:] != tis[:-1]])[0]
        ends = np.r_[bounds[1:], len(tis)]
        parts = [
            self._ptables[int(tis[a])].take(pa.array(ris[a:b]))
            for a, b in zip(bounds, ends)
        ]
        merged = pa.concat_tables(parts) if len(parts) > 1 else parts[0]
        inv = np.empty(len(order), dtype=np.int64)
        inv[order] = np.arange(len(order))
        return merged.take(pa.array(inv))

    def _release_payload(self, seqs: np.ndarray) -> None:
        ploc = self._ploc
        for s in seqs.tolist():
            loc = ploc.pop(s)
            ti = loc >> 32
            self._pmask[ti][loc & 0xFFFFFFFF] = False
            self._plive[ti] -= 1
            if self._plive[ti] == 0:
                self._ptables[ti] = None  # free consumed chunk
                self._pmask[ti] = np.empty(0, dtype=bool)

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

        The bulk pop returns every ready entry in key order; the token
        arithmetic below is the inlined HostBuckets refill/commit over
        per-host state lists — same integer math, no per-row method
        dispatch."""
        self.flush()
        ready, prio, seq, uh = self.heap.pop_ready_bulk(horizon)
        n = len(ready)
        if n == 0:
            return GRANT_SCHEMA.empty_table()
        if limit is not None and n > limit:
            # compatibility path: bounded pops push the overflow back
            self.heap.push_bulk(ready[limit:], prio[limit:], seq[limit:], uh[limit:])
            ready, prio, seq, uh = (
                ready[:limit], prio[:limit], seq[:limit], uh[:limit],
            )
            n = limit
        payload = self._gather_payload(seq)
        hosts_l = payload.column("host").to_pylist()
        ensure = self.buckets._ensure
        slots = np.empty(n, dtype=np.int64)
        granted = np.zeros(n, dtype=bool)
        capacity = self.buckets.capacity
        for i in range(n):
            st = ensure(hosts_l[i])
            d, tok, last = st
            t = int(ready[i])
            # refill(t)
            if t > last:
                gained = (t - last) // d
                if gained:
                    tok = min(capacity, tok + gained)
                    last = last + gained * d
                if tok >= capacity:
                    last = t
            slot = t if tok > 0 else last + d
            if slot <= horizon:
                # commit: refill at slot, then consume
                if slot > last:
                    gained = (slot - last) // d
                    if gained:
                        tok = min(capacity, tok + gained)
                        last = last + gained * d
                    if tok >= capacity:
                        last = slot
                tok -= 1
                granted[i] = True
            slots[i] = slot
            st[1] = tok
            st[2] = last
        n_grant = int(granted.sum())
        self.counters["granted"] += n_grant
        if n_grant < n:
            nb = ~granted
            self.heap.push_bulk(slots[nb], prio[nb], seq[nb], uh[nb])
        if n_grant == 0:
            return GRANT_SCHEMA.empty_table()
        g = np.nonzero(granted)[0]
        self._release_payload(seq[g])
        gp = payload.take(pa.array(g)) if n_grant < n else payload
        arrays = [
            pa.array(seq[g]),
            pa.array(slots[g]),
            pa.array(prio[g].astype(np.int32)),
            pa.array(uh[g]),
            gp.column("url_canon"),
            gp.column("host"),
            gp.column("route"),
            gp.column("doc_id"),
            gp.column("options_json"),
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
        live_parts = [
            t.filter(pa.array(m))
            for t, m, lv in zip(self._ptables, self._pmask, self._plive)
            if t is not None and lv
        ]
        if live_parts:
            payloads = (
                pa.concat_tables(live_parts) if len(live_parts) > 1 else live_parts[0]
            ).sort_by([("seq", "ascending")])
            payloads = payloads.combine_chunks().select(PAYLOAD_SCHEMA.names)
        else:
            payloads = PAYLOAD_SCHEMA.empty_table()
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
            state["buckets"],
            default_delay=self.default_delay,
            capacity=self.burst,
            salted=frozenset(self.salt_hosts),
            salt_k=self.salt_k,
        )
        p = state["payloads"].select(PAYLOAD_SCHEMA.names)
        k = p.num_rows
        self._ptables = [p] if k else []
        self._pmask = [np.ones(k, dtype=bool)] if k else []
        self._plive = [k] if k else []
        seqs = p.column("seq").to_numpy(zero_copy_only=False) if k else np.empty(0, np.int64)
        self._ploc = dict(zip(seqs.tolist(), np.arange(k, dtype=np.int64).tolist()))
        self.counters = dict(state["counters"])
        self._delay_set = set(state["delay_hosts"])
