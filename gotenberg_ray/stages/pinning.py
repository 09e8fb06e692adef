"""DNS-pinning dial decisions: the rebinding-proof outbound algebra.

The reference closes the DNS-rebinding window by resolving a URL's host
ONCE at validation time and dialing exactly those addresses — never
re-resolving between validation and connect:

- ``DecideOutbound`` — /root/reference/pkg/gotenberg/outbound.go:258-340:
  allow-list OR (a match BYPASSES the IP check — operator opt-in),
  deny-list always, non-http schemes skip pinning, then resolve + judge
  EVERY address against the IP-class policy (one bad address rejects
  the host);
- ``resolveHost`` — outbound.go:131-166: literal IPs classify without
  DNS; named hosts resolve to ≥1 address or fail;
- ``DialPinned`` — outbound.go:473-486: try pinned addresses in order,
  return the first success, surface the last error;
- the pinning proxy routes every Chromium sub-resource through this
  decision — pkg/modules/chromium/pinning_proxy.go:22-110.

The sandbox has no DNS and no sockets, so the resolver and the
connector are INJECTED callables (the reference's own tests override
``decide``/``dialPinned`` the same way — pinning_proxy.go:38-47). The
decision/pinning/ordering algebra here is complete and tested; a real
deployment plugs ``socket.getaddrinfo`` and a TCP connector in.
"""

from __future__ import annotations

import dataclasses
import re
from collections.abc import Callable
from urllib.parse import urlsplit

from ..functions.urlkit import host_ip_policy, is_public_ip

REASON_ALLOW_LIST = "filtered:allow_list"
REASON_DENY_LIST = "filtered:deny_list"
REASON_NO_HOST = "filtered:no_host"
REASON_PRIVATE_IP = "filtered:non_public_ip"
REASON_PUBLIC_IP = "filtered:public_ip"
REASON_RESOLVE = "filtered:resolve_error"


@dataclasses.dataclass(frozen=True)
class OutboundDecision:
    """outbound.go:174-184. ``reason`` "" = allowed."""

    reason: str = ""
    bypass: bool = False  # allow-list match: dial direct, no IP check
    pinned: tuple[str, ...] = ()  # addresses resolved at validation time
    host: str = ""  # original hostname (bypass dials it directly)

    @property
    def allowed(self) -> bool:
        return not self.reason


def _is_ip_literal(host: str) -> bool:
    return host_ip_policy(host) != "name"


def decide_outbound(
    url: str,
    allow: list[re.Pattern],
    deny: list[re.Pattern],
    resolver: Callable[[str], list[str]],
    deny_private_ips: bool = False,
    deny_public_ips: bool = False,
) -> OutboundDecision:
    """DecideOutbound (outbound.go:258-340) as a pure function."""
    try:
        parts = urlsplit(url)
    except ValueError:
        return OutboundDecision(reason=REASON_RESOLVE)
    # scheme+host lowercase before regex matching (outbound.go:268-270)
    normalized = url.replace(parts.scheme, parts.scheme.lower(), 1) if parts.scheme else url
    if parts.netloc:
        normalized = normalized.replace(parts.netloc, parts.netloc.lower(), 1)

    allow_matched = False
    if allow:
        allow_matched = any(p.search(normalized) for p in allow)
        if not allow_matched:
            return OutboundDecision(reason=REASON_ALLOW_LIST)
    # deny always applies — it cannot be bypassed by an allow match
    if any(p.search(normalized) for p in deny):
        return OutboundDecision(reason=REASON_DENY_LIST)
    if allow_matched:
        # operator opt-in: dial the hostname directly (dialBypass,
        # pinning_proxy.go:45-48), no IP check, no pinning
        return OutboundDecision(bypass=True, host=(parts.hostname or "").lower())
    if parts.scheme.lower() not in ("http", "https"):
        return OutboundDecision()  # non-http: nothing to pin
    host = (parts.hostname or "").lower()
    if not host:
        return OutboundDecision(reason=REASON_NO_HOST)

    def check(addr: str) -> str:
        public = is_public_ip(addr)
        if deny_public_ips and public:
            return REASON_PUBLIC_IP
        if deny_private_ips and not public:
            return REASON_PRIVATE_IP
        return ""

    if _is_ip_literal(host):
        bad = check(host.strip("[]"))
        if bad:
            return OutboundDecision(reason=bad)
        return OutboundDecision(pinned=(host.strip("[]"),))
    try:
        addrs = list(resolver(host))
    except Exception:
        return OutboundDecision(reason=REASON_RESOLVE)
    if not addrs:
        return OutboundDecision(reason=REASON_RESOLVE)
    # ONE rejected address rejects the host (outbound.go:160-164) —
    # a rebinding resolver can't smuggle a private addr into the set
    for a in addrs:
        bad = check(a)
        if bad:
            return OutboundDecision(reason=bad)
    return OutboundDecision(pinned=tuple(addrs))


def dial_pinned(
    decision: OutboundDecision,
    port: int,
    connect: Callable[[str, int], object],
) -> object:
    """DialPinned (outbound.go:473-486): try each pinned address in
    resolution order; first success wins; the last error surfaces.
    Never consults DNS — the decision's addresses ARE the dial targets,
    which is the whole rebinding defense."""
    if not decision.allowed:
        raise PermissionError(decision.reason)
    if decision.bypass:
        return connect(decision.host, port)
    last_err: Exception | None = None
    for a in decision.pinned:
        try:
            return connect(a, port)
        except Exception as e:  # noqa: BLE001 — per-addr connect errors
            last_err = e
    if last_err is None:
        raise ConnectionError("no addresses to dial")
    raise last_err


class PinningDialer:
    """Per-request pinning state: ``decide()`` once per URL (resolve +
    validate), ``dial()`` against the frozen decision. One instance per
    conversion context mirrors the proxy's per-request scope."""

    def __init__(
        self,
        resolver: Callable[[str], list[str]],
        allow: tuple[str, ...] = (),
        deny: tuple[str, ...] = (),
        deny_private_ips: bool = False,
        deny_public_ips: bool = False,
    ):
        self.resolver = resolver
        self.allow = [re.compile(p) for p in allow]
        self.deny = [re.compile(p) for p in deny]
        self.deny_private_ips = deny_private_ips
        self.deny_public_ips = deny_public_ips
        self._decisions: dict[str, OutboundDecision] = {}

    def decide(self, url: str) -> OutboundDecision:
        d = self._decisions.get(url)
        if d is None:
            d = decide_outbound(
                url,
                self.allow,
                self.deny,
                self.resolver,
                self.deny_private_ips,
                self.deny_public_ips,
            )
            self._decisions[url] = d  # frozen: later resolver flips can't rebind
        return d

    def dial(self, url: str, port: int, connect: Callable[[str, int], object]):
        return dial_pinned(self.decide(url), port, connect)
