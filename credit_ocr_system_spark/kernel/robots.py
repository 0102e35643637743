"""robots.txt parsing (RFC 9309, stdlib-only).

A web-scale corpus is expected to honor robots exclusion even after
the crawl: takedown-by-robots is re-checked at curation time against
the newest robots snapshot, so the pipeline needs the parser and the
allow/deny evaluation as first-class, oracle-checkable operators (the
filter itself lives in ``operators/weburl.py::robots_gate``).

Grammar (RFC 9309 §2.2): line-based key/value records; ``User-agent``
lines open a group (consecutive UA lines share one group); ``Allow``
/ ``Disallow`` rules belong to the open group; keys are
case-insensitive; ``#`` starts a comment; unknown keys (Crawl-delay,
Sitemap, ...) are ignored for matching. Matching (§2.2.2): the group
is chosen by the most specific User-agent match (exact product token
beats ``*``); within the group the rule with the LONGEST matched
pattern wins, Allow winning length ties; no match → allowed. Patterns
support ``*`` (any chars) and an optional trailing ``$`` (end
anchor).

The reference service has no crawl notion (one upload at a time,
``/root/reference/src/dms/service.py``); this module belongs to the
training-data-pipeline surface of the builder brief. The wildcard →
regex translation lives HERE so the Spark operator and the DuckDB
oracle consume identical pattern literals and only the *evaluation*
logic is written twice.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List

_RULE_KEYS = {"allow": True, "disallow": False}


def pattern_to_regex(pattern: str) -> str:
    """RFC 9309 path pattern → anchored regex string. ``*`` → ``.*``,
    trailing ``$`` → end anchor, everything else literal. The result
    matches a URL *path+query* from its first character."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    out = []
    for ch in body:
        out.append(".*" if ch == "*" else re.escape(ch))
    return "^" + "".join(out) + ("$" if anchored else "")


def parse_robots(payload: bytes) -> List[Dict[str, Any]]:
    """Parse robots.txt bytes into flat rule rows
    ``{agent, allow, pattern, rx, rule_len}`` — one row per
    (group-member-agent × rule). ``rule_len`` is the pattern length
    (the RFC's specificity measure); an empty Disallow ("allow all")
    produces no row, per §2.2.2. Never raises: undecodable bytes
    decode with replacement, malformed lines are skipped — one broken
    robots file must not poison a fetch batch."""
    text = payload.decode("utf-8", errors="replace")
    rules: List[Dict[str, Any]] = []
    agents: List[str] = []
    group_open = False  # False once a rule line closes the UA run
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if group_open:          # a rule was seen: new group opens
                agents = []
                group_open = False
            if value:
                agents.append(value.lower())
        elif key in _RULE_KEYS:
            group_open = True
            if not value or not agents:
                continue            # empty pattern = no restriction
            for agent in agents:
                rules.append({
                    "agent": agent,
                    "allow": _RULE_KEYS[key],
                    "pattern": value,
                    "rx": pattern_to_regex(value),
                    "rule_len": len(value),
                })
        else:
            # Crawl-delay / Sitemap / unknown: closes nothing, per RFC
            # they are non-group or ignorable lines
            continue
    return rules


def parse_sitemaps(payload: bytes) -> List[str]:
    """``Sitemap:`` directives — the sitemaps.org extension RFC 9309
    §2.3 carries as a non-group line: valid anywhere in the file,
    independent of any user-agent group. Values are absolute URLs,
    returned in file order, first occurrence wins (case-sensitive
    dedup). Never raises, same tolerance as :func:`parse_robots`."""
    text = payload.decode("utf-8", errors="replace")
    out: List[str] = []
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        if key.strip().lower() == "sitemap":
            value = value.strip()
            if value and value not in out:
                out.append(value)
    return out


def evaluate(rules: List[Dict[str, Any]], agent: str,
             path: str) -> bool:
    """Pure-Python reference evaluation (the Spark operator and SQL
    oracle re-derive this independently): group selection by exact
    agent else ``*``, longest-match, Allow wins ties, default allow.
    Used by the property tests as the ground truth."""
    agent = agent.lower()
    group = [r for r in rules if r["agent"] == agent]
    if not group:
        group = [r for r in rules if r["agent"] == "*"]
    best_len, best_allow = -1, True
    for r in group:
        if re.match(r["rx"], path):
            if r["rule_len"] > best_len or (
                    r["rule_len"] == best_len and r["allow"]
                    and not best_allow):
                best_len, best_allow = r["rule_len"], r["allow"]
    return best_allow
