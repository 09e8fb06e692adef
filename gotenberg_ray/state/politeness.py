"""Per-host politeness token buckets over virtual time.

The crawl scheduler runs on integer virtual-time ticks (SURVEY §7.5:
bit-identical resume forbids wall-clock scheduling). Each host has a
bucket with ``capacity`` burst tokens refilling one token every
``delay`` ticks (delay from robots Crawl-delay, else the default).

``reserve(host, t)`` either grants a fetch AT tick ``t`` (consuming a
token) or returns the earliest tick at which the host will have a
token — the caller re-heaps the entry at that tick. Pure integer
arithmetic; state serializes to an Arrow table for checkpoints.
"""

from __future__ import annotations

import pyarrow as pa

BUCKET_SCHEMA = pa.schema(
    [
        ("host", pa.string()),
        ("delay", pa.int64()),
        ("tokens", pa.int64()),
        ("last_refill", pa.int64()),
    ]
)

DEFAULT_DELAY = 2
DEFAULT_CAPACITY = 1


class HostBuckets:
    def __init__(
        self,
        default_delay: int = DEFAULT_DELAY,
        capacity: int = DEFAULT_CAPACITY,
        salted: frozenset[str] | set[str] = frozenset(),
        salt_k: int = 1,
    ):
        self.default_delay = int(default_delay)
        self.capacity = int(capacity)
        # skew-salted hosts (crawler.partition_of): their URLs are spread
        # over salt_k shard sub-queues, so EACH sub-queue's bucket runs at
        # delay × salt_k — the host's total steady-state rate across all
        # sub-queues equals the unsalted budget
        self.salted = frozenset(salted)
        self.salt_k = max(1, int(salt_k))
        # host -> [delay, tokens, last_refill]
        self._state: dict[str, list[int]] = {}

    def _stretch(self, host: str, delay: int) -> int:
        if host in self.salted:
            return max(1, int(delay)) * self.salt_k
        return max(1, int(delay))

    def set_delay(self, host: str, delay: int) -> None:
        st = self._ensure(host)
        st[0] = self._stretch(host, delay)

    def _ensure(self, host: str) -> list[int]:
        st = self._state.get(host)
        if st is None:
            st = [self._stretch(host, self.default_delay), self.capacity, 0]
            self._state[host] = st
        return st

    def _refill(self, st: list[int], t: int) -> None:
        delay, tokens, last = st
        if t > last:
            gained = (t - last) // delay
            if gained:
                st[1] = min(self.capacity, tokens + gained)
                st[2] = last + gained * delay
            if st[1] >= self.capacity:
                st[2] = t  # full bucket: refill clock re-anchors at t

    def reserve(self, host: str, t: int) -> tuple[bool, int]:
        """Try to take a token at tick t.

        Returns (granted, when): granted=True → fetch at t; else `when`
        is the earliest tick a token becomes available.
        """
        st = self._ensure(host)
        self._refill(st, t)
        if st[1] > 0:
            st[1] -= 1
            return True, t
        # next token arrives one full delay after the refill anchor
        return False, st[2] + st[0]

    def next_slot(self, host: str, t: int) -> int:
        """Earliest tick ≥ t at which a token is available (no commit)."""
        st = self._ensure(host)
        self._refill(st, t)
        return t if st[1] > 0 else st[2] + st[0]

    def commit(self, host: str, slot: int) -> None:
        """Consume the token at ``slot`` (as returned by next_slot).

        The scheduler pops frontier entries in key order and commits
        each grant's slot immediately, so per-host slots advance
        monotonically — this is what keeps heap churn at one pop per
        entry per epoch instead of one per politeness retry.
        """
        st = self._ensure(host)
        self._refill(st, slot)
        st[1] -= 1  # refill at `slot` guarantees a token is present

    # ---- checkpoint format -------------------------------------------------
    def to_table(self) -> pa.Table:
        hosts = sorted(self._state)
        return pa.table(
            {
                "host": pa.array(hosts, pa.string()),
                "delay": pa.array([self._state[h][0] for h in hosts], pa.int64()),
                "tokens": pa.array([self._state[h][1] for h in hosts], pa.int64()),
                "last_refill": pa.array([self._state[h][2] for h in hosts], pa.int64()),
            },
            schema=BUCKET_SCHEMA,
        )

    @classmethod
    def from_table(
        cls,
        table: pa.Table,
        default_delay: int = DEFAULT_DELAY,
        capacity: int = DEFAULT_CAPACITY,
        salted: frozenset[str] | set[str] = frozenset(),
        salt_k: int = 1,
    ) -> "HostBuckets":
        # stored delays already include the salt stretch; the salt config
        # is re-attached so hosts first seen AFTER the restore stretch too
        obj = cls(default_delay, capacity, salted=salted, salt_k=salt_k)
        for h, d, tok, lr in zip(
            table.column("host").to_pylist(),
            table.column("delay").to_pylist(),
            table.column("tokens").to_pylist(),
            table.column("last_refill").to_pylist(),
        ):
            obj._state[h] = [d, tok, lr]
        return obj
