"""robots.txt (Robots Exclusion Protocol, RFC 9309) — parse and match.

A crawl-tier hygiene kernel: given a site's robots.txt and a URL path,
decide whether fetching was permitted. Implemented from the PUBLIC
spec only:

- groups start with one or more ``User-agent`` lines; ``Allow`` /
  ``Disallow`` rules belong to the preceding group (RFC 9309 §2.2.1);
  the most specific matching group wins, with ``*`` the fallback;
- rule matching is longest-match in pattern octets, ``Allow`` wins
  ties (§2.2.2); ``*`` matches any octet sequence and ``$`` anchors
  the pattern end (§2.2.3);
- an empty ``Disallow:`` matches nothing; no matching rule means
  allowed.

Patterns compile ONCE per ruleset (the broadcast unit — per host on a
real crawl, shipped via ray.put exactly like the blocklist in
``_docs_url_filter``); matching a path is then one pass over the
compiled rules.
"""

from __future__ import annotations

import re


def parse_robots(text: str, agent: str = "*") -> list[tuple[int, bool, "re.Pattern[str]"]]:
    """robots.txt text -> compiled rules ``(specificity, allow,
    pattern_re)`` for the most specific matching user-agent group
    (``agent`` is compared case-insensitively as a product token;
    ``*`` matches any). Returns an empty list (everything allowed)
    when no group applies."""
    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[bool, str]] = []
    in_agent_run = False
    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not in_agent_run:
                if cur_agents:
                    groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules = [], []
                in_agent_run = True
            cur_agents.append(value.lower())
        elif field in ("allow", "disallow"):
            in_agent_run = False
            if cur_agents:
                cur_rules.append((field == "allow", value))
        else:
            in_agent_run = False  # sitemap, crawl-delay, ...: ignored
    if cur_agents:
        groups.append((cur_agents, cur_rules))

    agent_l = agent.lower()
    chosen: list[tuple[bool, str]] | None = None
    chosen_len = -1
    for agents, rules in groups:
        for a in agents:
            if a != "*" and a in agent_l and len(a) > chosen_len:
                chosen, chosen_len = rules, len(a)
    if chosen is None:
        for agents, rules in groups:
            if "*" in agents:
                chosen = rules
                break
    if chosen is None:
        return []

    compiled = []
    for allow, pat in chosen:
        if not pat:
            if not allow:
                continue  # empty Disallow: matches nothing
            pat = "/"  # empty Allow behaves like "Allow: /"
        anchored = pat.endswith("$")
        body = pat[:-1] if anchored else pat
        rx = ".*".join(re.escape(piece) for piece in body.split("*"))
        rx = "^" + rx + ("$" if anchored else "")
        compiled.append((len(pat), allow, re.compile(rx)))
    return compiled


def is_allowed(rules: list[tuple[int, bool, "re.Pattern[str]"]],
               path: str) -> bool:
    """Longest-match decision over compiled rules; Allow wins ties;
    no match -> allowed (RFC 9309 §2.2.2)."""
    best_len, best_allow = -1, True
    for spec, allow, rx in rules:
        if rx.match(path) and (spec > best_len
                               or (spec == best_len and allow)):
            best_len, best_allow = spec, allow
    return best_allow


def allowed_mask(rules, paths) -> "list[bool]":
    """Vector form over a sequence of paths (compiled rules reused)."""
    return [is_allowed(rules, p) for p in paths]
