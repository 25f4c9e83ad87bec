"""URL canonicalization for web-crawl dedup keys.

A deterministic, RE2-compatible regex chain (no lookaround, so the
exact same rules re-express in the DuckDB oracle):

1. lowercase the scheme://host[:port] prefix (path/query case is
   significant and preserved),
2. strip the scheme's default port (``:443`` for https, ``:80`` for
   http),
3. drop the fragment,
4. collapse duplicate slashes in the path (the ``://`` authority
   marker is protected by the ``[^:]`` guard),
5. drop a leading ``utm_*`` tracking parameter (one per pass — the
   planted corpus shape; repeated application composes),
6. strip a trailing path slash (``/`` before end-of-url or ``?``).

Reference analog: the pond url keying in ``ns_pond/ingest.py`` treats
the url string as the identity key; this kernel is the web-scale
normalization applied before such keying so near-identical crawl urls
collapse. Applied vectorized (pandas ``str.replace``) — one regex pass
per rule over the whole column, no per-row Python in the hot path
beyond the scoped-lowercase callable.
"""

from __future__ import annotations

import re

import pandas as pd

URLNORM_VERSION = 1

_PREFIX = re.compile(r"^([A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*)")

# (pattern, replacement) applied in order AFTER the prefix lowering
_RULES: list[tuple[str, str]] = [
    (r"^(https://[^/?#]*):443([/?#].*)?$", r"\1\2"),
    (r"^(http://[^/?#]*):80([/?#].*)?$", r"\1\2"),
    (r"#.*$", ""),
    (r"([^:])/{2,}", r"\1/"),
    (r"\?utm_[^&#]*&", "?"),
    (r"\?utm_[^&#]*$", ""),
    (r"([^:/])/\?", r"\1?"),
    (r"([^:/])/$", r"\1"),
]


def canonicalize_urls(urls: pd.Series) -> pd.Series:
    """Vectorized canonicalization of a url string column."""
    out = urls.fillna("").str.replace(
        _PREFIX, lambda m: m.group(1).lower(), regex=True)
    for pat, repl in _RULES:
        out = out.str.replace(pat, repl, regex=True)
    return out


def url_host(urls: pd.Series) -> pd.Series:
    """Lowercased host (no port) of a url column."""
    return (
        urls.fillna("")
        .str.extract(r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#:]+)", expand=False)
        .fillna("")
        .str.lower()
    )
