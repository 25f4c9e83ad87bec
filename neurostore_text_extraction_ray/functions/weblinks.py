"""Anchor/outlink extraction from raw HTML — the web-graph primitive
of an extraction tier (outlink lists feed host-level in-degree /
PageRank-ish quality signals in crawl pipelines).

Pure kernels, no DOM build: a compiled attribute regex over the raw
markup. That is deliberate — at 10^12 pages the link pass must not pay
the full-DOM parse the text-extraction stage pays; href scanning is a
single vectorizable regex. Lookaround-free so Python ``re`` and RE2
agree (same constraint as ``functions/pii.py``).
"""

from __future__ import annotations

import re

import pandas as pd

# <a ... href="..."> / <a ... href='...'>: anchor tags only, first
# href ATTRIBUTE in the tag — the name must start right after
# whitespace so suffixed attributes (data-href=) never match, and each
# quote style owns its value class so a double-quoted href may contain
# apostrophes (and vice versa) without truncating at the opposite
# quote (ADVICE r04 #1). Remaining documented subset: unquoted hrefs
# are skipped, values never span a ">", and a quoted attribute VALUE
# containing " href=" (quote-blind regex) can still false-match —
# acceptable for a link-graph signal that deliberately skips the
# full-DOM parse.
HREF_RE = re.compile(
    r"""<a\s(?:[^>]*?\s)?href\s*=\s*(?:"([^">]*)"|'([^'>]*)')""",
    re.IGNORECASE | re.DOTALL,
)

# full anchor element incl. inner content: the href groups of HREF_RE
# plus a lazy body up to the closing tag. Inner markup is stripped to
# text afterwards; nested <a> elements are outside the documented
# subset (the lazy body stops at the FIRST </a>).
ANCHOR_RE = re.compile(
    r"""<a\s(?:[^>]*?\s)?href\s*=\s*(?:"([^">]*)"|'([^'>]*)')[^>]*>(.*?)</a\s*>""",
    re.IGNORECASE | re.DOTALL,
)

_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")

# scheme://host/... -> host (same shape as extras._docs_url_filter)
HOST_RE = re.compile(r"^[a-z][a-z0-9+.-]*://([^/?#]+)")


def extract_hrefs(html: str) -> list[str]:
    """All quoted anchor hrefs in document order."""
    if not html:
        return []
    # two alternation groups (one per quote style); exactly one
    # participates per match — findall fills the other with ""
    return [a or b for a, b in HREF_RE.findall(html)]


def href_host(url: str) -> str | None:
    """Host part of an absolute url, or None for relative links."""
    m = HOST_RE.match(url or "")
    return m.group(1).lower() if m else None


def outlinks_frame(df: pd.DataFrame, id_col: str = "doc_id",
                   html_col: str = "html") -> pd.DataFrame:
    """Vectorized explode: one row per anchor — (id, ord, href, host).
    ``ord`` is the anchor's document-order index, making the output a
    deterministic total function of the input row."""
    # positional explode: reset the index so level 0 is a row POSITION
    # (batch frames usually carry a RangeIndex, but never rely on it)
    links = (df[html_col].fillna("").reset_index(drop=True)
             .str.extractall(HREF_RE))
    # per-quote-style capture groups: one column per group, the
    # non-participating one NaN — coalesce into a single href column
    hrefs = links[0].fillna(links[1]) if len(links) else None
    out = pd.DataFrame({
        "doc_id": df[id_col].to_numpy()[links.index.get_level_values(0)]
        if len(links) else pd.Series(dtype="int64"),
        "ord": links.index.get_level_values(1).to_numpy(dtype="int64")
        if len(links) else pd.Series(dtype="int64"),
        "href": hrefs.to_numpy(dtype=object)
        if len(links) else pd.Series(dtype=object),
    })
    out["host"] = out["href"].map(href_host) if len(out) else \
        pd.Series(dtype=object)
    out["doc_id"] = out["doc_id"].astype("int64")
    out["ord"] = out["ord"].astype("int64")
    return out.reset_index(drop=True)


def anchor_text(inner: str) -> str:
    """Anchor ELEMENT body -> visible text: strip inner markup,
    collapse whitespace, trim (the anchor-text feature link-graph
    quality models consume)."""
    return _WS_RE.sub(" ", _TAG_RE.sub(" ", inner or "")).strip()


def anchors_frame(df: pd.DataFrame, id_col: str = "doc_id",
                  html_col: str = "html") -> pd.DataFrame:
    """``outlinks_frame`` plus the anchor text: one row per anchor —
    (doc_id, ord, href, host, anchor). ``ord`` counts ANCHOR_RE
    matches, which requires a closing ``</a>``; pages in the
    documented subset (every planted oracle) have identical ord
    numbering in both frames."""
    links = (df[html_col].fillna("").reset_index(drop=True)
             .str.extractall(ANCHOR_RE))
    hrefs = links[0].fillna(links[1]) if len(links) else None
    out = pd.DataFrame({
        "doc_id": df[id_col].to_numpy()[links.index.get_level_values(0)]
        if len(links) else pd.Series(dtype="int64"),
        "ord": links.index.get_level_values(1).to_numpy(dtype="int64")
        if len(links) else pd.Series(dtype="int64"),
        "href": hrefs.to_numpy(dtype=object)
        if len(links) else pd.Series(dtype=object),
        "anchor": links[2].map(anchor_text).to_numpy(dtype=object)
        if len(links) else pd.Series(dtype=object),
    })
    out["host"] = out["href"].map(href_host) if len(out) else \
        pd.Series(dtype=object)
    out["doc_id"] = out["doc_id"].astype("int64")
    out["ord"] = out["ord"].astype("int64")
    return out[["doc_id", "ord", "href", "host", "anchor"]] \
        .reset_index(drop=True)
