"""Webhook delivery stage — the async output sink.

Mirrors /root/reference/pkg/modules/webhook/middleware.go:33-396 +
client.go: after the pages table is written, each row's output is
POSTed to its webhook URL; failures go to the error URL as the JSON
error body; both paths retry up to 4× with 1–30 s exponential backoff
(webhook.go:50,64-66); delivery emits ``webhook.success`` /
``webhook.error`` events. Content type is sniffed from the first 512
bytes (middleware.go:38-96).

The HTTP transport is injectable (the sandbox has no network) — tests
use a scripted transport; the Ray-side shape is a post-write
``map_batches(WebhookSender, concurrency=N)`` stage whose output is the
delivery-event table.
"""

from __future__ import annotations

import json
from typing import Callable

import pyarrow as pa

from ..schemas import DOWNLOAD_MAX_RETRIES, ERROR_HTTP_STATUS

EVENTS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("event", pa.string()),  # webhook.success | webhook.error
        ("url", pa.string()),
        ("http_status", pa.int32()),
        ("attempts", pa.int32()),
        ("content_type", pa.string()),
    ]
)

_BACKOFF_BASE_S = 1.0
_BACKOFF_MAX_S = 30.0


def sniff_content_type(head: bytes) -> str:
    """First-512-bytes content sniff (middleware.go:38-96 semantics)."""
    head = head[:512]
    if head.startswith(b"%PDF-"):
        return "application/pdf"
    if head.startswith(b"PK\x03\x04"):
        return "application/zip"
    if head.lstrip()[:1] in (b"{", b"["):
        return "application/json"
    probe = head
    # a multibyte sequence can straddle the 512-byte prefix cut — trim
    # up to 3 trailing bytes, and always decode once more after the
    # final strip (a 4-byte sequence cut after lead+2 continuations
    # needs 3 strips plus a 4th judging decode)
    for _ in range(4):
        try:
            probe.decode("utf-8")
            return "text/plain; charset=utf-8"
        except UnicodeDecodeError:
            if probe and probe[-1] & 0xC0 in (0x80, 0xC0):
                probe = probe[:-1]
                continue
            break
    return "application/octet-stream"


class WebhookSender:
    """map_batches stage over written part rows.

    Input rows: (doc_id, webhook_url, error_url, body:binary,
    error_type). Success rows deliver the body to webhook_url; error
    rows deliver the JSON error to error_url (status from the bounded
    error taxonomy, middlewares.go:38-88).

    ``transport(method, url, headers, body) -> int status`` is injected;
    a real deployment passes an HTTP client built once per actor.
    """

    def __init__(
        self,
        transport: Callable[[str, str, dict, bytes], int] | None = None,
        max_retries: int = DOWNLOAD_MAX_RETRIES,
        sleep: Callable[[float], None] | None = None,
    ):
        # deterministic default (no network in this sandbox): delivery
        # succeeds unless the URL hash says otherwise — the same
        # synthetic-transport convention as stages/download.py, so the
        # registry's default config can construct the actor
        self.transport = transport or _synthetic_webhook_transport
        self.max_retries = max_retries
        self.sleep = sleep or (lambda s: None)

    def _deliver(self, method: str, url: str, headers: dict, body: bytes) -> tuple[int, int]:
        attempts = 0
        backoff = _BACKOFF_BASE_S
        while True:
            attempts += 1
            try:
                status = self.transport(method, url, headers, body)
            except Exception:  # noqa: BLE001 — network errors retry too
                status = 0
            if 200 <= status < 300 or attempts > self.max_retries:
                return status, attempts
            self.sleep(backoff)
            backoff = min(backoff * 2, _BACKOFF_MAX_S)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {k: [] for k in ("doc_id", "event", "url", "http_status", "attempts", "content_type")}
        for i in range(batch.num_rows):
            doc_id = batch.column("doc_id")[i].as_py()
            err = batch.column("error_type")[i].as_py() or ""
            if err:
                url = batch.column("error_url")[i].as_py()
                body = json.dumps(
                    {"status": ERROR_HTTP_STATUS.get(err, 500), "message": err},
                    sort_keys=True,
                ).encode()
                ctype = "application/json"
                method = "POST"
            else:
                url = batch.column("webhook_url")[i].as_py()
                body = batch.column("body")[i].as_py() or b""
                ctype = sniff_content_type(body)
                method = "POST"
            status, attempts = self._deliver(
                method, url, {"Content-Type": ctype}, body
            )
            ok = 200 <= status < 300
            out["doc_id"].append(doc_id)
            out["event"].append(
                "webhook.success" if ok and not err else "webhook.error"
            )
            out["url"].append(url)
            out["http_status"].append(status)
            out["attempts"].append(attempts)
            out["content_type"].append(ctype)
        return pa.Table.from_arrays(
            [
                pa.array(out["doc_id"], pa.string()),
                pa.array(out["event"], pa.string()),
                pa.array(out["url"], pa.string()),
                pa.array(out["http_status"], pa.int32()),
                pa.array(out["attempts"], pa.int32()),
                pa.array(out["content_type"], pa.string()),
            ],
            schema=EVENTS_SCHEMA,
        )


def _synthetic_webhook_transport(
    method: str, url: str, headers: dict, body: bytes
) -> int:
    """Deterministic stand-in for an HTTP client (no network in this
    container): ~6% of URLs fail with 503 by hash, everything else
    returns 200 — the same seeded-failure convention the download
    stage and the fetch simulator use."""
    from ..functions.hashing import fnv64_one

    return 503 if fnv64_one(url) % 16 == 0 else 200
