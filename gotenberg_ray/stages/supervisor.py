"""Process-supervisor semantics for stateful worker stages.

Transplants the reference's ``ProcessSupervisor``
(/root/reference/pkg/gotenberg/supervisor.go:95-618) onto actor-held
worker state:

- lazy start: the underlying "process" launches on first task
  (supervisor.go:475-495),
- scheduled recycling: restart after N conversions — Chromium 100,
  LibreOffice 10 (supervisor.go:539-561, chromium.go:451, api.go:330),
- health probe with a TTL cache and a 2-failure threshold
  (supervisor.go:95-104,227-283),
- bounded semantic retries: LibreOffice core-dump ≤10 attempts, each
  re-metered (api/api.go:674-739),
- per-task deadline → ``timeout`` error rows (runWithDeadline,
  supervisor.go:604-618),
- restart/request counters reset on restart (supervisor.go:220-224).

``Supervisor`` wraps any object with start()/stop()/healthy()/run(task)
— in tests a scripted fake, in the engine the render/office backends.
Concurrency limits are enforced by the POOL configuration
(max_tasks_in_flight ≈ maxConcurrency 6 for render, 1 for office), not
by this class.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable

from ..schemas import (
    COREDUMP_MAX_RETRIES,
    ERR_RESTART,
    ERR_TIMEOUT,
    ERR_UNKNOWN,
)


class CoreDumped(RuntimeError):
    """Transient backend crash — retried up to COREDUMP_MAX_RETRIES."""


@dataclasses.dataclass
class SupervisorConfig:
    restart_after: int = 100  # conversions; 0 = never
    max_retries: int = COREDUMP_MAX_RETRIES
    health_ttl_s: float = 2.0  # result cache (supervisor.go:95-104)
    health_failures_threshold: int = 2
    task_deadline_s: float | None = None


class Supervisor:
    def __init__(self, backend, cfg: SupervisorConfig | None = None,
                 clock: Callable[[], float] = time.monotonic):
        self.backend = backend
        self.cfg = cfg or SupervisorConfig()
        self.clock = clock
        self.started = False
        self.req_count = 0  # since last (re)start
        self.restart_count = 0
        self.total_count = 0
        self._health_cached: bool | None = None
        self._health_at = -1e18
        self._health_failures = 0

    # ------------------------------------------------------------- lifecycle
    def _ensure_started(self) -> None:
        if not self.started:
            self.backend.start()
            self.started = True
            self.req_count = 0  # counters reset on restart

    def _restart(self) -> None:
        if self.started:
            self.backend.stop()
            self.started = False
        self.restart_count += 1
        self._health_cached = None
        # a fresh backend gets the full 2-failure grace — leaking the
        # old count would mark it unhealthy on one transient probe
        self._health_failures = 0
        self._ensure_started()

    def healthy(self) -> bool:
        """Probe with TTL cache; unhealthy only after 2 consecutive
        probe failures (supervisor.go:227-283)."""
        now = self.clock()
        if self._health_cached is not None and now - self._health_at < self.cfg.health_ttl_s:
            return self._health_cached
        ok = bool(self.backend.healthy()) if self.started else True
        if ok:
            self._health_failures = 0
        else:
            self._health_failures += 1
            ok = self._health_failures < self.cfg.health_failures_threshold
        self._health_cached = ok
        self._health_at = now
        return ok

    # ------------------------------------------------------------------ run
    def run(self, task: Callable[[Any], Any], payload: Any) -> tuple[Any, str, int]:
        """Run one conversion. Returns (result, error_type, attempts).

        Error taxonomy: "" success / timeout / restart (crashed and
        exhausted retries) / unknown.
        """
        self._ensure_started()
        if not self.healthy():
            self._restart()  # drain-and-restart before the task
        attempts = 0
        while True:
            attempts += 1
            self.req_count += 1
            self.total_count += 1
            t0 = self.clock()
            try:
                result = task(payload)
            except CoreDumped:
                # semantic retry (libreoffice api.go:674-739): restart
                # the backend, re-meter the attempt
                self._restart()
                if attempts >= self.cfg.max_retries:
                    return None, ERR_RESTART, attempts
                continue
            except Exception:  # noqa: BLE001 — bounded taxonomy, not a crash
                self._maybe_recycle()
                return None, ERR_UNKNOWN, attempts
            if (
                self.cfg.task_deadline_s is not None
                and self.clock() - t0 > self.cfg.task_deadline_s
            ):
                self._maybe_recycle()
                return None, ERR_TIMEOUT, attempts
            self._maybe_recycle()
            return result, "", attempts

    def _maybe_recycle(self) -> None:
        if self.cfg.restart_after and self.req_count >= self.cfg.restart_after:
            self._restart()
