"""Lazy-deletion binary heap — the per-partition frontier priority queue.

North star: "lazy-deletion binary-heap priority queue keyed by
(priority, next-fetch-time) per partition". Entries order by
``(ready_time asc, priority desc, seq asc)`` — earliest eligible fetch
first, then most important, then stable insertion order. ``seq`` is the
globally-assigned insertion sequence number, which makes pop order a
pure function of heap content (SURVEY §7.5: order assigned at schedule
time).

Lazy deletion: ``delete(seq)`` marks a tombstone; tombstoned entries are
skipped (and dropped) at pop time. Canonical serialization sorts
entries by key — two heaps holding the same live set serialize
identically regardless of sift history, which is what makes resumed
checkpoints comparable bit-for-bit.
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa

ENTRY_SCHEMA = pa.schema(
    [
        ("ready_time", pa.int64()),
        ("priority", pa.int32()),
        ("seq", pa.int64()),
        ("url_hash", pa.uint64()),
    ]
)


class FrontierHeap:
    def __init__(self):
        self._heap: list[tuple[int, int, int, int]] = []  # (ready, -prio, seq, url_hash)
        self._deleted: set[int] = set()
        self._live = 0

    def __len__(self) -> int:
        return self._live

    def push(self, ready_time: int, priority: int, seq: int, url_hash: int) -> None:
        heapq.heappush(self._heap, (int(ready_time), -int(priority), int(seq), int(url_hash)))
        self._live += 1

    def delete(self, seq: int) -> None:
        self._deleted.add(int(seq))
        self._live -= 1

    def peek_ready_time(self) -> int | None:
        self._drop_dead()
        return self._heap[0][0] if self._heap else None

    def _drop_dead(self) -> None:
        while self._heap and self._heap[0][2] in self._deleted:
            _, _, seq, _ = heapq.heappop(self._heap)
            self._deleted.discard(seq)

    def pop_ready(self, horizon: int, limit: int | None = None) -> list[tuple[int, int, int, int]]:
        """Pop all live entries with ready_time <= horizon (up to limit),
        in (ready_time, -priority, seq) order → (ready, prio, seq, url_hash)."""
        out: list[tuple[int, int, int, int]] = []
        while self._heap and (limit is None or len(out) < limit):
            self._drop_dead()
            if not self._heap or self._heap[0][0] > horizon:
                break
            ready, negp, seq, uh = heapq.heappop(self._heap)
            self._live -= 1
            out.append((ready, -negp, seq, uh))
        return out

    # ---- checkpoint format -------------------------------------------------
    def to_table(self) -> pa.Table:
        live = sorted(t for t in self._heap if t[2] not in self._deleted)
        if not live:
            return ENTRY_SCHEMA.empty_table()
        ready, negp, seq, uh = zip(*live)
        return pa.table(
            {
                "ready_time": pa.array(ready, pa.int64()),
                "priority": pa.array([-p for p in negp], pa.int32()),
                "seq": pa.array(seq, pa.int64()),
                "url_hash": pa.array(np.array(uh, dtype=np.uint64)),
            },
            schema=ENTRY_SCHEMA,
        )

    @classmethod
    def from_table(cls, table: pa.Table) -> "FrontierHeap":
        obj = cls()
        for ready, prio, seq, uh in zip(
            table.column("ready_time").to_pylist(),
            table.column("priority").to_pylist(),
            table.column("seq").to_pylist(),
            table.column("url_hash").to_pylist(),
        ):
            obj.push(ready, prio, seq, uh)
        return obj
