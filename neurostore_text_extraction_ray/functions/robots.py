"""robots.txt (Robots Exclusion Protocol, RFC 9309) — parse and match.

A crawl-tier hygiene kernel: given a site's robots.txt and a URL path,
decide whether fetching was permitted. Implemented from the PUBLIC
spec only:

- groups start with one or more ``User-agent`` lines; ``Allow`` /
  ``Disallow`` rules belong to the preceding group (RFC 9309 §2.2.1);
  the crawler's product token is compared case-insensitively for
  EXACT equality against each group token (§2.2.1 — never substring:
  a group named ``a`` must not capture ``graftbot``), ``*`` is the
  fallback, and ALL groups naming the chosen token are merged into
  one ruleset (§2.2.1: "crawlers MUST merge groups with the same
  user-agent");
- rule matching is longest-match in pattern octets, ``Allow`` wins
  ties (§2.2.2); ``*`` matches any octet sequence and ``$`` anchors
  the pattern end (§2.2.3);
- an empty ``Disallow:`` OR ``Allow:`` pattern matches nothing (the
  RFC treats zero-length patterns as no rule); no matching rule
  means allowed.

Patterns compile ONCE per ruleset (the broadcast unit — per host on a
real crawl, shipped via ray.put exactly like the blocklist in
``_docs_url_filter``); matching a path is then one pass over the
compiled rules.
"""

from __future__ import annotations

import re


def parse_robots(text: str, agent: str = "*") -> list[tuple[int, bool, "re.Pattern[str]"]]:
    """robots.txt text -> compiled rules ``(specificity, allow,
    pattern_re)`` for the matching user-agent groups. ``agent``'s
    product token (the part before ``/``) is compared for exact
    case-insensitive equality against each group token; all groups
    naming that token are merged (RFC 9309 §2.2.1), with ``*`` the
    merged fallback. Returns an empty list (everything allowed)
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
        # other records (sitemap, crawl-delay, ...) are ignored and MUST
        # NOT interfere with group parsing (RFC 9309 §2.2.4): a Sitemap
        # line between two User-agent lines does not split their
        # start-of-group run
    if cur_agents:
        groups.append((cur_agents, cur_rules))

    # Product token: RFC 9309 §2.2.1 compares the token before any
    # "/version" suffix, case-insensitively, for EXACT equality.
    token = agent.split("/", 1)[0].strip().lower()
    chosen: list[tuple[bool, str]] = []
    matched = False
    if token != "*":
        for agents, rules in groups:
            if token in agents:  # merge ALL groups naming this token
                chosen.extend(rules)
                matched = True
    if not matched:
        for agents, rules in groups:
            if "*" in agents:  # merge ALL fallback groups too
                chosen.extend(rules)
                matched = True
    if not matched:
        return []

    compiled = []
    for allow, pat in chosen:
        if not pat:
            continue  # empty Allow:/Disallow: matches nothing
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
