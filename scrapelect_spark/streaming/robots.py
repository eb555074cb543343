"""robots.txt parsing and the per-host politeness ruleset.

Longest-prefix-match semantics (Allow wins ties), ``Crawl-delay``
honored as a per-host per-batch fetch budget.  Rules are parsed once
(driver) from the robots fixture table and broadcast — the crawl never
re-fetches robots.txt mid-run (the reference fetches nothing per-host
at all; this layer is graft-new, SURVEY.md §2.7).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class HostRules:
    rules: list[tuple[str, bool]] = field(default_factory=list)  # (path-prefix, allow)
    crawl_delay: float | None = None
    #: ``Sitemap:`` directives — host-wide per the protocol (they sit
    #: outside user-agent groups); feed sources/sitemap.py ingestion
    sitemaps: list[str] = field(default_factory=list)

    def allowed(self, path: str) -> bool:
        best_len = -1
        best_allow = True
        for prefix, allow in self.rules:
            if path.startswith(prefix) and len(prefix) >= best_len:
                if len(prefix) > best_len or allow:
                    best_allow = allow
                best_len = len(prefix)
        return best_allow


def parse_robots(text: str, user_agent: str = "scrapelect v0.4.0") -> HostRules:
    """Parse one robots.txt body for our UA (specific group wins over
    ``*``)."""
    groups: dict[str, HostRules] = {}
    current: list[str] = []
    sitemaps: list[str] = []
    ua_l = user_agent.lower()
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            current = [value.lower()]
            groups.setdefault(value.lower(), HostRules())
        elif key in ("disallow", "allow"):
            for ua in current:
                if value:
                    groups[ua].rules.append((value, key == "allow"))
                # empty Disallow = allow everything (no rule)
        elif key == "crawl-delay":
            for ua in current:
                try:
                    groups[ua].crawl_delay = float(value)
                except ValueError:
                    pass
        elif key == "sitemap" and value:
            sitemaps.append(value)
    chosen = None
    for ua, rules in groups.items():
        if ua != "*" and (ua in ua_l or ua_l.startswith(ua)):
            chosen = rules
            break
    if chosen is None:
        chosen = groups.get("*", HostRules())
    chosen.sitemaps = sitemaps
    return chosen


class RobotsPolicy:
    """host -> HostRules; picklable, broadcast into UDFs and shared with
    the sequential reference simulator so exclusions match exactly."""

    def __init__(self, per_host: dict[str, HostRules], batch_seconds: float = 60.0):
        self.per_host = per_host
        self.batch_seconds = batch_seconds

    @classmethod
    def from_pairs(
        cls,
        pairs: list[tuple[str, str]],
        user_agent: str = "scrapelect v0.4.0",
        batch_seconds: float = 60.0,
    ) -> "RobotsPolicy":
        return cls(
            {host: parse_robots(txt, user_agent) for host, txt in pairs},
            batch_seconds,
        )

    def allowed(self, host: str, path: str) -> bool:
        rules = self.per_host.get(host)
        return True if rules is None else rules.allowed(path)

    def host_budget(self, host: str, default_limit: int) -> int:
        """Deterministic per-batch fetch budget for a host: the
        configured per-host limit, tightened by Crawl-delay (a delay of
        d seconds allows ~batch_seconds/d fetches per micro-batch)."""
        rules = self.per_host.get(host)
        if rules is None or not rules.crawl_delay:
            return default_limit
        return max(1, min(default_limit, int(self.batch_seconds / rules.crawl_delay)))
