"""robots.txt kernel (functions/robots.py): RFC 9309 parsing and
longest-match semantics."""

from neurostore_text_extraction_ray.functions.robots import (
    allowed_mask, is_allowed, parse_robots)

POLICY = """\
# comment
User-agent: badbot
Disallow: /

User-agent: *
Disallow: /private/
Allow: /private/archive/
Disallow: /*.tmp$
Crawl-delay: 5
"""


def test_group_selection_and_longest_match():
    rules = parse_robots(POLICY, agent="graftbot/1.0")
    assert is_allowed(rules, "/public/x")
    assert not is_allowed(rules, "/private/x")
    # longer Allow overrides the shorter Disallow
    assert is_allowed(rules, "/private/archive/x")
    # wildcard + end anchor
    assert not is_allowed(rules, "/cache/9.tmp")
    assert is_allowed(rules, "/cache/9.tmp.bak")  # $ anchors the end
    # specific agent group wins over *
    bad = parse_robots(POLICY, agent="BadBot/2.0")
    assert not is_allowed(bad, "/public/x")


def test_tie_allow_wins_and_empty_disallow():
    pol = ("User-agent: *\n"
           "Disallow: /a/\n"
           "Allow: /a*\n"     # same length (3): Allow wins the tie
           "Disallow:\n")     # empty Disallow matches nothing
    rules = parse_robots(pol)
    assert is_allowed(rules, "/a/x")
    assert is_allowed(rules, "/anything")


def test_no_group_and_vector_form():
    assert parse_robots("User-agent: other\nDisallow: /\n",
                        agent="me") == []
    assert is_allowed([], "/whatever")
    rules = parse_robots(POLICY)
    assert allowed_mask(rules, ["/public/1", "/private/2"]) == [True, False]


def test_multi_agent_group_and_case():
    pol = ("User-agent: A\n"
           "User-agent: B\n"
           "Disallow: /x/\n")
    assert not is_allowed(parse_robots(pol, agent="b"), "/x/1")
    assert is_allowed(parse_robots(pol, agent="c"), "/x/1")


def test_same_agent_groups_merge():
    # RFC 9309 2.2.1: groups naming the same agent MUST be merged —
    # rules from the second '*' group still apply.
    pol = ("User-agent: *\nDisallow: /a/\n\n"
           "User-agent: *\nDisallow: /b/\n")
    rules = parse_robots(pol)
    assert not is_allowed(rules, "/a/x")
    assert not is_allowed(rules, "/b/x")
    # named groups merge the same way
    pol2 = ("User-agent: bot\nDisallow: /a/\n\n"
            "User-agent: bot\nDisallow: /b/\n")
    rules2 = parse_robots(pol2, agent="Bot/3.1")
    assert not is_allowed(rules2, "/a/x") and not is_allowed(rules2, "/b/x")


def test_empty_allow_matches_nothing():
    # An empty Allow: pattern is no rule at all — it must NOT
    # compile to "Allow: /" and override "Disallow: /".
    pol = "User-agent: *\nDisallow: /\nAllow:\n"
    assert not is_allowed(parse_robots(pol), "/anything")


def test_product_token_exact_not_substring():
    # A group token that is a substring of the crawler's product
    # token ("a" in "graftbot") must not capture it.
    pol = ("User-agent: a\nDisallow: /\n\n"
           "User-agent: *\nAllow: /\n")
    assert is_allowed(parse_robots(pol, agent="graftbot/1.0"), "/x")
    # but the exact token (any case, version stripped) does match
    assert not is_allowed(parse_robots(pol, agent="A/2.0"), "/x")


def test_other_records_do_not_split_agent_runs():
    # RFC 9309 2.2.4: parsing of other records (Sitemap, Crawl-delay)
    # MUST NOT interfere with group parsing — a Sitemap line between
    # two User-agent lines does not split their start-of-group run,
    # so both agents share the group's rules.
    pol = ("User-agent: a\nSitemap: http://x/s.xml\n"
           "User-agent: b\nDisallow: /x\n")
    rules_a = parse_robots(pol, agent="a")
    rules_b = parse_robots(pol, agent="b")
    assert not is_allowed(rules_a, "/x/1")
    assert not is_allowed(rules_b, "/x/1")
    # after rules, an other-record line is just ignored; the next
    # User-agent still starts a FRESH group
    pol2 = ("User-agent: a\nDisallow: /y\nCrawl-delay: 5\n"
            "User-agent: b\nDisallow: /z\n")
    assert is_allowed(parse_robots(pol2, agent="b"), "/y/1")
    assert not is_allowed(parse_robots(pol2, agent="b"), "/z/1")
