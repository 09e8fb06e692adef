"""DNS-pinning dial algebra vs the reference
(/root/reference/pkg/gotenberg/outbound.go:131-166,258-340,473-486 and
outbound_test.go:128-299): resolve-once validation, every-address IP
judgement, allow-list bypass, pinned dial ordering, rebinding proof."""

import re

import pytest

from gotenberg_ray.stages.pinning import (
    REASON_ALLOW_LIST,
    REASON_DENY_LIST,
    REASON_NO_HOST,
    REASON_PRIVATE_IP,
    REASON_PUBLIC_IP,
    REASON_RESOLVE,
    PinningDialer,
    decide_outbound,
    dial_pinned,
)

HOSTS = {
    "example.com": ["93.184.216.34"],
    "internal.service": ["10.1.2.3"],
    # outbound_test.go "rebind.example": mixed public+private resolution
    "rebind.example": ["93.184.216.34", "10.0.0.5"],
    "multi.example": ["203.0.114.1", "203.0.115.2"],
}


def resolver(host):
    return HOSTS[host]


def test_private_resolution_denied_only_when_opted_in():
    d = decide_outbound("http://internal.service/api", [], [], resolver, deny_private_ips=True)
    assert d.reason == REASON_PRIVATE_IP
    d = decide_outbound("http://internal.service/api", [], [], resolver)
    assert d.allowed and d.pinned == ("10.1.2.3",)


def test_one_bad_address_rejects_the_host():
    # rebinding resolver can't smuggle a private addr into the set
    d = decide_outbound("https://rebind.example/", [], [], resolver, deny_private_ips=True)
    assert d.reason == REASON_PRIVATE_IP


def test_allow_match_bypasses_ip_check_but_not_deny_list():
    allow = [re.compile(r"^https://internal\.allowed/")]
    calls = []

    def spy(host):
        calls.append(host)
        return ["10.9.9.9"]

    d = decide_outbound("https://internal.allowed/x", allow, [], spy, deny_private_ips=True)
    assert d.allowed and d.bypass and d.pinned == ()
    assert calls == []  # bypass skips DNS entirely (outbound.go:313-315)
    # deny-list still wins over an allow match (outbound.go:348-352)
    deny = [re.compile(r"allowed")]
    d = decide_outbound("https://internal.allowed/x", allow, deny, spy)
    assert d.reason == REASON_DENY_LIST
    # allow-list present + no match → filtered
    d = decide_outbound("https://other.example/", allow, [], resolver)
    assert d.reason == REASON_ALLOW_LIST


def test_literal_ips_and_edge_urls():
    d = decide_outbound("https://1.1.1.1/", [], [], resolver, deny_private_ips=True)
    assert d.allowed and d.pinned == ("1.1.1.1",)
    d = decide_outbound("https://1.1.1.1/", [], [], resolver, deny_public_ips=True)
    assert d.reason == REASON_PUBLIC_IP
    d = decide_outbound("http://[::ffff:127.0.0.1]:8080/p", [], [], resolver, deny_private_ips=True)
    assert d.reason == REASON_PRIVATE_IP  # v4-mapped unwrap
    d = decide_outbound("http:///path", [], [], resolver)
    assert d.reason == REASON_NO_HOST
    d = decide_outbound("data:text/html;base64,x", [], [], resolver)
    assert d.allowed and d.pinned == ()  # non-http: nothing to pin
    d = decide_outbound("https://unknown.host/", [], [], resolver)
    assert d.reason == REASON_RESOLVE


def test_dial_pinned_order_and_errors():
    d = decide_outbound("https://multi.example/", [], [], resolver)
    dialed = []

    def connect_fail_first(addr, port):
        dialed.append((addr, port))
        if addr == "203.0.114.1":
            raise OSError("refused")
        return f"conn:{addr}:{port}"

    conn = dial_pinned(d, 443, connect_fail_first)
    assert conn == "conn:203.0.115.2:443"
    assert dialed == [("203.0.114.1", 443), ("203.0.115.2", 443)]

    with pytest.raises(OSError):
        dial_pinned(d, 443, lambda a, p: (_ for _ in ()).throw(OSError("down")))
    from gotenberg_ray.stages.pinning import OutboundDecision

    with pytest.raises(ConnectionError, match="no addresses"):
        dial_pinned(OutboundDecision(), 80, lambda a, p: "x")
    with pytest.raises(PermissionError):
        dial_pinned(OutboundDecision(reason=REASON_DENY_LIST), 80, lambda a, p: "x")


def test_rebinding_cannot_redirect_the_dial():
    """The whole point: after validation, a flipped DNS answer must not
    change where the dial goes."""
    flipping = {"n": 0}

    def evil_resolver(host):
        flipping["n"] += 1
        return ["93.184.216.34"] if flipping["n"] == 1 else ["169.254.169.254"]

    dialer = PinningDialer(evil_resolver, deny_private_ips=True)
    d1 = dialer.decide("https://evil.example/")
    assert d1.allowed and d1.pinned == ("93.184.216.34",)
    dialed = []
    dialer.dial("https://evil.example/", 443, lambda a, p: dialed.append(a))
    dialer.dial("https://evil.example/", 443, lambda a, p: dialed.append(a))
    # both dials hit the validation-time address; the resolver was
    # consulted exactly once
    assert dialed == ["93.184.216.34", "93.184.216.34"]
    assert flipping["n"] == 1


def test_bypass_dials_the_hostname_directly():
    allow = [re.compile(r"^https://trusted\.example/")]
    d = decide_outbound("https://trusted.example/x", allow, [], resolver)
    assert d.bypass and d.host == "trusted.example"
    conn = dial_pinned(d, 443, lambda a, p: f"conn:{a}:{p}")
    assert conn == "conn:trusted.example:443"
