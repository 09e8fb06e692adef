"""Per-sub-resource admission: the Chromium pause-filter decision
algebra as a pure vectorized stage over media spans.

The reference intercepts every sub-resource request a page render makes
(``Fetch.requestPaused``) and decides allow/deny + extra headers before
the request leaves the browser:

- allow-list OR / deny-list always + IP-class policy —
  /root/reference/pkg/modules/chromium/events.go:46-189 delegating to
  pkg/gotenberg/outbound.go:69-114 (``FilterOutboundURL``);
- ``file://`` sub-resources default-deny unless inside an allowed
  working-directory prefix — events.go:95-98,277-287
  (``isAllowedFileSubResource``);
- scoped extraHttpHeaders: a header applies when it has no scope or its
  scope regex matches the sub-resource URL — events.go:123-150;
- the pinning proxy routes each allowed sub-resource through the
  per-request dial decision — pinning_proxy.go:22-110 (the network dial
  itself is sandbox-blocked; the decision algebra here is the testable
  part).

In the span model a page's sub-resources are its media spans, so the
stage flattens ``spans`` (``list<struct>``) Arrow-natively, decides per
``media_ref``, and emits one decision row per sub-resource. Stateful
setup (regex compile, per-ref memo) happens once per actor in
``__init__`` — pass the class to ``map_batches(..., concurrency=N)``.
"""

from __future__ import annotations

import json
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from urllib.parse import urlsplit

from ..functions.scalars import parse_scoped_header
from ..functions.urlkit import host_ip_policy
from ..schemas import ERR_FILTERED, KIND_MEDIA

DECISION_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("media_ref", pa.string()),
        ("allowed", pa.bool_()),
        ("reason", pa.string()),  # "" | filtered:* | file_prefix
        ("headers", pa.list_(pa.string())),  # "Name: value" applied entries
    ]
)

# bounded deny reasons (all map to the ERR_FILTERED/403 family —
# schemas.ERROR_TYPES stays the outward taxonomy)
REASON_ALLOW_LIST = "filtered:allow_list"
REASON_DENY_LIST = "filtered:deny_list"
REASON_PRIVATE_IP = "filtered:non_public_ip"
REASON_PUBLIC_IP = "filtered:public_ip"
REASON_FILE_PREFIX = "filtered:file_prefix"

assert ERR_FILTERED == "filtered"  # reasons above extend the 403 family


def is_allowed_file_subresource(raw_url: str, prefixes: tuple[str, ...]) -> bool:
    """events.go:277-287: an empty prefix list rejects EVERY ``file://``
    sub-resource (default-deny blocks cross-request /tmp enumeration);
    otherwise the URL must start with ``file://`` + some prefix."""
    if not prefixes:
        return False
    return any(raw_url.startswith("file://" + p) for p in prefixes)


def filter_outbound_url(
    url: str,
    allow: list[re.Pattern],
    deny: list[re.Pattern],
    deny_private_ips: bool = False,
    deny_public_ips: bool = False,
) -> str:
    """``FilterOutboundURL`` (outbound.go:69-114) as a pure function →
    deny reason ("" = pass). Order mirrors the reference: allow-list OR,
    deny-list always, then IP-class policy on the (literal) host —
    IPv4-mapped IPv6 unwraps before classification."""
    if allow and not any(p.search(url) for p in allow):
        return REASON_ALLOW_LIST
    if any(p.search(url) for p in deny):
        return REASON_DENY_LIST
    if deny_private_ips or deny_public_ips:
        try:
            host = urlsplit(url).hostname or ""
        except ValueError:
            host = ""
        if host:
            # only literal-IP hosts classify here; DNS names would need
            # the (sandbox-blocked) resolve step. urlsplit().hostname
            # already strips userinfo (`user@127.0.0.1` trick) and
            # IPv6 brackets; IPv4-mapped v6 unwraps in host_ip_policy.
            cls = host_ip_policy(host)
            if deny_private_ips and cls == "non_public":
                return REASON_PRIVATE_IP
            if deny_public_ips and cls == "public":
                return REASON_PUBLIC_IP
    return ""


class SubResourceAdmission:
    """Actor-pool stage: flatten media spans → one decision row each.

    ``__call__`` input batches need columns ``doc_id``, ``spans`` and
    optionally ``route`` / ``options_json`` (both default to the
    ``convert/url`` posture: no local-file prefix, no extra headers).

    Routes that render local files (anything but ``*/url``) get the
    per-request working directory ``{workdir}/{doc_id}/`` as their one
    allowed file prefix, mirroring the reference populating
    ``allowedFilePrefixes`` with the request's working dir.
    """

    def __init__(
        self,
        allow: tuple[str, ...] = (),
        deny: tuple[str, ...] = (),
        deny_private_ips: bool = False,
        deny_public_ips: bool = False,
        workdir: str = "/tmp/gotenberg",
    ):
        self.allow = [re.compile(p) for p in allow]
        self.deny = [re.compile(p) for p in deny]
        self.deny_private_ips = bool(deny_private_ips)
        self.deny_public_ips = bool(deny_public_ips)
        self.workdir = workdir.rstrip("/")
        # media refs repeat heavily across docs; the outbound verdict is
        # a pure function of the ref under this actor's fixed policy
        self._outbound_memo: dict[str, str] = {}
        # parsed extraHttpHeaders per options_json string
        self._header_memo: dict[str, list[tuple[str, str, re.Pattern | None]]] = {}

    def _outbound(self, ref: str) -> str:
        r = self._outbound_memo.get(ref)
        if r is None:
            r = filter_outbound_url(
                ref,
                self.allow,
                self.deny,
                self.deny_private_ips,
                self.deny_public_ips,
            )
            self._outbound_memo[ref] = r
        return r

    def _headers(self, options_json: str) -> list[tuple[str, str, re.Pattern | None]]:
        parsed = self._header_memo.get(options_json)
        if parsed is None:
            parsed = []
            try:
                raw = json.loads(options_json or "{}").get("extraHttpHeaders", {})
            except (ValueError, AttributeError):
                raw = {}
            if isinstance(raw, dict):
                for name, value in raw.items():
                    try:
                        val, scope = parse_scoped_header(str(value))
                    except re.error:
                        continue  # malformed scope: header skipped (logged upstream)
                    parsed.append((str(name), val, scope))
            self._header_memo[options_json] = parsed
        return parsed

    def __call__(self, batch: pa.Table) -> pa.Table:
        spans = batch.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        flat = spans.flatten()  # child struct rows
        parents = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
        kinds = flat.field("kind")
        is_media = pc.equal(kinds, KIND_MEDIA).to_numpy(zero_copy_only=False)
        if not is_media.any():
            return DECISION_SCHEMA.empty_table()
        midx = np.nonzero(is_media)[0]
        refs = flat.field("media_ref").take(pa.array(midx)).to_pylist()
        rows = parents[midx]

        doc_ids = batch.column("doc_id").to_pylist()
        routes = (
            batch.column("route").to_pylist()
            if "route" in batch.column_names
            else ["convert/url"] * batch.num_rows
        )
        options = (
            batch.column("options_json").to_pylist()
            if "options_json" in batch.column_names
            else ["{}"] * batch.num_rows
        )

        allowed = np.empty(len(refs), dtype=bool)
        reasons: list[str] = []
        headers_col: list[list[str]] = []
        for i, (ref, row) in enumerate(zip(refs, rows)):
            reason = self._outbound(ref)
            if not reason and ref.startswith("file://"):
                # local-file routes allow exactly their own workdir
                route = routes[row] or ""
                prefixes = (
                    (f"{self.workdir}/{doc_ids[row]}/",)
                    if route and not route.endswith("/url")
                    else ()
                )
                if not is_allowed_file_subresource(ref, prefixes):
                    reason = REASON_FILE_PREFIX
            ok = not reason
            allowed[i] = ok
            reasons.append(reason)
            if ok:
                hdrs = [
                    f"{name}: {val}"
                    for name, val, scope in self._headers(options[row])
                    if scope is None or scope.search(ref)
                ]
            else:
                hdrs = []
            headers_col.append(hdrs)

        return pa.table(
            {
                "doc_id": pa.array([doc_ids[r] for r in rows], pa.string()),
                "media_ref": pa.array(refs, pa.string()),
                "allowed": pa.array(allowed),
                "reason": pa.array(reasons, pa.string()),
                "headers": pa.array(headers_col, pa.list_(pa.string())),
            },
            schema=DECISION_SCHEMA,
        )
