"""Deterministic simulated fetch/render stage (the Renderer actor pool).

Maps the reference's Chromium fetch+render task chain (SURVEY §2.5,
/root/reference/pkg/modules/chromium/browser.go:339-363) onto a
``map_batches`` actor-pool stage. There is no network in the sandbox,
so the fetch is a pure function of ``(url_hash, doc_id)``: the "page
body" is the document's span list from the corpus, HTTP status and
sub-resource outcomes are splitmix64-derived, and discovered links are
hash-derived into a bounded URL universe so crawls converge. What IS
faithfully reimplemented is the semantics around the fetch:

- main-page status vs ``failOnHttpStatusCodes`` with status-class
  expansion (events.go:215-227, default [499,599]),
- event-error-over-run-error priority: the status predicate is
  evaluated before any render processing (browser.go:437-565),
- per-conversion network aggregate: request count / bytes / failures /
  unique origins capped at 64 (network_aggregate.go:12-121),
- bounded error taxonomy columns on every row.

At 100 TB scale the doc-lookup side would be a keyed read against the
document store; here the documents table is broadcast once via
``ray.put`` and each actor builds its dict in ``__init__`` — NOT per
batch.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from ..functions.hashing import fnv64, splitmix64
from ..functions.urlkit import expand_status_codes
from ..schemas import (
    ERR_INVALID_INPUT,
    ERR_NONE,
    MAX_UNIQUE_ORIGINS,
    SPANS_TYPE,
    STATUS_ERROR,
    STATUS_SUCCESS,
)

FETCH_SALT = np.uint64(0xF37C0A8E51D2B964)
LINK_SALT = np.uint64(0x7A1D5E9F3C6B8240)
MEDIA_SALT = np.uint64(0x1B9E4D7F2A8C5E31)

LINKS_TYPE = pa.list_(
    pa.struct([("url", pa.string()), ("link_index", pa.int32())])
)

DEFAULT_FAIL_CODES = (499, 599)


def synthetic_status(url_hashes: np.ndarray) -> np.ndarray:
    """Deterministic HTTP status per URL: ~2% 404, ~1.5% 503, else 200."""
    v = splitmix64(np.asarray(url_hashes, dtype=np.uint64) ^ FETCH_SALT) % np.uint64(1000)
    status = np.full(len(v), 200, dtype=np.uint16)
    status[v < 20] = 404
    status[(v >= 20) & (v < 35)] = 503
    return status


def synthetic_links(
    url_hash: int, host: str, link_universe: int, max_links: int = 3
) -> list[str]:
    """Hash-derived outlinks; mostly same-host, ~10% cross-host."""
    n = splitmix64(url_hash ^ int(LINK_SALT)) % (max_links + 1)
    out = []
    for j in range(n):
        v = splitmix64((url_hash + j + 1) & 0xFFFFFFFFFFFFFFFF)
        target = v % link_universe
        if v % 10 == 0:
            h = f"site-{v % 50:03d}.example.org"
        else:
            h = host
        if v % 13 == 0:  # some links land on robots-disallowed paths
            out.append(f"http://{h}/private{target % 5}/p{target}")
        else:
            out.append(f"http://{h}/page/{target}")
    return out


class SimulatedFetcher:
    """Callable-class stage for ``map_batches(..., concurrency=N)``.

    ``docs`` may be a pyarrow Table, a ``ray.ObjectRef`` to one
    (broadcast with ``ray.put`` — resolved once per actor here, never
    per batch), or a prebuilt dict.
    """

    def __init__(self, docs, link_universe: int = 1000, max_links: int = 3):
        try:  # resolve a broadcast ObjectRef without importing ray eagerly
            import ray

            if isinstance(docs, ray.ObjectRef):
                docs = ray.get(docs)
        except ImportError:
            pass
        if isinstance(docs, tuple):  # prebuilt (docs, doc_stats) state
            self.docs, self.doc_stats = docs
        else:
            if isinstance(docs, pa.Table):
                ids = docs.column("doc_id").to_pylist()
                spans = docs.column("spans").to_pylist()
                docs = dict(zip(ids, spans))
            self.docs = docs
            self.doc_stats = self.build_doc_stats(docs)
        self.link_universe = int(link_universe)
        self.max_links = int(max_links)
        self._fail_cache: dict[str, np.ndarray] = {}

    @staticmethod
    def build_doc_stats(docs: dict[str, list[dict]]) -> dict:
        """Per-doc network aggregates — pure functions of the doc,
        computed ONCE (build centrally, broadcast with the docs dict;
        every actor then skips this work). All media refs are hashed in
        one vectorized pass."""
        all_refs = [
            s["media_ref"]
            for spans in docs.values()
            for s in spans
            if s["kind"] == "media"
        ]
        ref_hash = dict(zip(all_refs, (int(h) for h in fnv64(all_refs))))
        doc_stats: dict[str, tuple[int, int, int, frozenset]] = {}
        for doc_id, spans in docs.items():
            req, byts, failed = 1, 0, 0
            origins: set[str] = set()
            for s in spans:
                if s["kind"] == "media":
                    req += 1
                    mh = ref_hash[s["media_ref"]]
                    if splitmix64(mh ^ int(MEDIA_SALT)) % 100 < 5:
                        failed += 1
                    else:
                        byts += splitmix64(mh) % 50000 + 1000
                    origins.add(
                        s["media_ref"].split("/")[2] if "://" in s["media_ref"] else ""
                    )
                else:
                    byts += len(s["text"])
            doc_stats[doc_id] = (req, byts, failed, frozenset(origins))
        return doc_stats

    @classmethod
    def build_state(cls, docs: pa.Table) -> tuple[dict, dict]:
        ids = docs.column("doc_id").to_pylist()
        spans = docs.column("spans").to_pylist()
        d = dict(zip(ids, spans))
        return d, cls.build_doc_stats(d)

    def _fail_set(self, options_json: str) -> np.ndarray:
        cached = self._fail_cache.get(options_json)
        if cached is None:
            try:
                codes = json.loads(options_json or "{}").get(
                    "failOnHttpStatusCodes", list(DEFAULT_FAIL_CODES)
                )
            except json.JSONDecodeError:
                codes = list(DEFAULT_FAIL_CODES)
            cached = expand_status_codes([int(c) for c in codes])
            self._fail_cache[options_json] = cached
        return cached

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        url_hashes = batch.column("url_hash").to_numpy(zero_copy_only=False)
        hosts = batch.column("host").to_pylist()
        doc_ids = batch.column("doc_id").to_pylist()
        options = batch.column("options_json").to_pylist()
        statuses = synthetic_status(url_hashes)

        spans_out: list[list[dict] | None] = []
        links_out: list[list[dict]] = []
        status_col: list[str] = []
        err_col: list[str] = []
        metrics: dict[str, list[int]] = {
            "request_count": [],
            "bytes_total": [],
            "failed_count": [],
            "unique_origins": [],
        }
        for i in range(n):
            uh = int(url_hashes[i])
            http = int(statuses[i])
            fail_set = self._fail_set(options[i])
            if http != 200 and bool(np.isin(np.uint16(http), fail_set)):
                # failure predicate wins before any render work
                # (ErrInvalidHttpStatusCode, events.go:215-227)
                spans_out.append([])
                links_out.append([])
                status_col.append(STATUS_ERROR)
                err_col.append(ERR_INVALID_INPUT)
                metrics["request_count"].append(1)
                metrics["bytes_total"].append(0)
                metrics["failed_count"].append(1)
                metrics["unique_origins"].append(1)
                continue
            spans = self.docs.get(doc_ids[i])
            if spans is None:
                spans_out.append([])
                links_out.append([])
                status_col.append(STATUS_ERROR)
                err_col.append(ERR_INVALID_INPUT)
                metrics["request_count"].append(1)
                metrics["bytes_total"].append(0)
                metrics["failed_count"].append(1)
                metrics["unique_origins"].append(1)
                continue
            req, byts, failed, origins = self.doc_stats[doc_ids[i]]
            n_origins = min(
                MAX_UNIQUE_ORIGINS, len(origins) + (hosts[i] not in origins)
            )
            spans_out.append(spans)
            links = synthetic_links(uh, hosts[i], self.link_universe, self.max_links)
            links_out.append(
                [{"url": u, "link_index": j} for j, u in enumerate(links)]
            )
            status_col.append(STATUS_SUCCESS)
            err_col.append(ERR_NONE)
            metrics["request_count"].append(req)
            metrics["bytes_total"].append(byts)
            metrics["failed_count"].append(failed)
            metrics["unique_origins"].append(n_origins)

        out = batch.append_column("http_status", pa.array(statuses, pa.uint16()))
        out = out.append_column("spans", pa.array(spans_out, SPANS_TYPE))
        out = out.append_column("status", pa.array(status_col, pa.string()))
        out = out.append_column("error_type", pa.array(err_col, pa.string()))
        out = out.append_column(
            "metrics",
            pa.StructArray.from_arrays(
                [pa.array(metrics[k], pa.int64()) for k in
                 ("request_count", "bytes_total", "failed_count", "unique_origins")],
                ["request_count", "bytes_total", "failed_count", "unique_origins"],
            ),
        )
        out = out.append_column("links", pa.array(links_out, LINKS_TYPE))
        return out
