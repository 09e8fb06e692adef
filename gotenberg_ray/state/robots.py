"""robots.txt parsing + per-host cache for the frontier shards.

Implements the de-facto standard (RFC 9309 subset): User-agent groups,
Allow/Disallow longest-prefix-match with Allow winning ties, `*`
wildcard and `$` end anchor in rules, Crawl-delay. The shard actor
holds one `RobotsCache`; in the sandbox the fetch of /robots.txt is a
deterministic lookup into the synthetic corpus (corpus.make_robots).
"""

from __future__ import annotations

import re


class RobotsRules:
    def __init__(self, rules: list[tuple[bool, str]], crawl_delay: int | None):
        # rules = [(is_allow, path_pattern)]
        self.rules = rules
        self.crawl_delay = crawl_delay
        self._compiled = [
            (allow, len(pat), self._compile(pat)) for allow, pat in rules if pat
        ]
        # literal-prefix rules (no * or $) admit a vectorized batch path
        self._all_literal = all("*" not in pat and "$" not in pat for _, pat in rules)
        self._literal = [(allow, len(pat), pat) for allow, pat in rules if pat]

    @staticmethod
    def _compile(pattern: str) -> re.Pattern:
        out = []
        for ch in pattern:
            if ch == "*":
                out.append(".*")
            elif ch == "$":
                out.append("$")
            else:
                out.append(re.escape(ch))
        return re.compile("^" + "".join(out))

    def allowed(self, path: str) -> bool:
        best: tuple[int, bool] | None = None  # (specificity, is_allow)
        for allow, spec, rx in self._compiled:
            if rx.match(path):
                if best is None or spec > best[0] or (spec == best[0] and allow and not best[1]):
                    best = (spec, allow)
        return True if best is None else best[1]

    def allowed_batch(self, paths) -> "np.ndarray":
        """Vectorized ``allowed`` over a path array. Literal-prefix rule
        sets (the overwhelmingly common case) evaluate as one
        ``starts_with`` kernel per rule; wildcard rules fall back to the
        per-row matcher."""
        import numpy as np

        n = len(paths)
        if not self._compiled:
            return np.ones(n, dtype=bool)
        if not self._all_literal:
            # wildcard ('*'/'$') rulesets: per-row regex matcher — which
            # needs PYTHON strings (an arrow StringScalar into re.match
            # raises TypeError; the shard admission gate passes arrow
            # arrays, so coerce first — review-found crash class)
            import pyarrow as pa

            if isinstance(paths, (pa.Array, pa.ChunkedArray)):
                paths = paths.to_pylist()
            return np.fromiter(
                (self.allowed(p) for p in paths), dtype=bool, count=n
            )
        import pyarrow as pa
        import pyarrow.compute as pc

        arr = paths if isinstance(paths, (pa.Array, pa.ChunkedArray)) else pa.array(paths, pa.string())
        best_spec = np.zeros(n, dtype=np.int64)  # 0 = no rule matched
        best_allow = np.ones(n, dtype=bool)
        for allow, spec, pat in self._literal:
            m = pc.starts_with(arr, pat).to_numpy(zero_copy_only=False)
            upd = m & (
                (best_spec < spec)
                | ((best_spec == spec) & allow & ~best_allow)
            )
            best_spec[upd] = spec
            best_allow[upd] = allow
        return best_allow


def parse_robots(text: str, agent: str = "*") -> RobotsRules:
    """Parse robots.txt, honoring the most specific matching UA group."""
    groups: list[tuple[list[str], list[tuple[bool, str]], int | None]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[bool, str]] = []
    cur_delay: int | None = None
    in_group_body = False

    def close():
        nonlocal cur_agents, cur_rules, cur_delay
        if cur_agents:
            groups.append((cur_agents, cur_rules, cur_delay))
        cur_agents, cur_rules, cur_delay = [], [], None

    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if in_group_body:
                close()
                in_group_body = False
            cur_agents.append(value.lower())
        elif field in ("allow", "disallow"):
            in_group_body = True
            if value:
                cur_rules.append((field == "allow", value))
            elif field == "disallow":
                pass  # "Disallow:" empty = allow all, no rule needed
        elif field == "crawl-delay":
            in_group_body = True
            try:
                cur_delay = int(float(value))
            except ValueError:
                pass
    close()

    agent = agent.lower()
    best: tuple[int, list, int | None] | None = None
    for agents, rules, delay in groups:
        for a in agents:
            if a == "*":
                spec = 0
            elif a in agent or agent in a:
                spec = len(a)
            else:
                continue
            if best is None or spec > best[0]:
                best = (spec, rules, delay)
    if best is None:
        return RobotsRules([], None)
    return RobotsRules(best[1], best[2])


class RobotsCache:
    """host → parsed rules; the lookup function is injected (in tests and
    in the sandbox it reads the deterministic synthetic robots corpus)."""

    def __init__(self, fetch_fn, agent: str = "gotenberg-ray"):
        self._fetch = fetch_fn  # (host) -> robots.txt text or None
        self._agent = agent
        self._cache: dict[str, RobotsRules] = {}
        # robots.txt bodies are massively duplicated across hosts (CDN
        # defaults, hosting-provider templates), so identical texts share
        # ONE parsed RobotsRules instance. Rules objects are read-only
        # after construction, and the sharing is what lets the shard's
        # admission gate group hosts by ruleset identity and run one
        # vectorized allowed_batch per DISTINCT ruleset instead of one
        # per host.
        self._by_text: dict[str, RobotsRules] = {}
        self._empty = RobotsRules([], None)
        self.fetches = 0

    def rules_for(self, host: str) -> RobotsRules:
        r = self._cache.get(host)
        if r is None:
            self.fetches += 1
            text = self._fetch(host)
            if text:
                r = self._by_text.get(text)
                if r is None:
                    r = parse_robots(text, self._agent)
                    self._by_text[text] = r
            else:
                r = self._empty
            self._cache[host] = r
        return r

    def allowed(self, host: str, path: str) -> bool:
        return self.rules_for(host).allowed(path)

    def crawl_delay(self, host: str) -> int | None:
        return self.rules_for(host).crawl_delay
