"""PII redaction: detect and mask emails, NANP-style phone numbers and
IPv4 addresses — the standard training-data scrubbing pass (public
construction; the pattern set mirrors the C4/CCNet-era regex scrubbers).

The patterns are deliberately restricted to syntax that Python ``re``
and RE2/DuckDB interpret identically (character classes, ``\\b``,
bounded repetition — no lookaround), so the operator is oracled as
exact ANSI SQL (``regexp_replace(..., 'g')`` + ``regexp_extract_all``
counts). Replacement order is fixed (email -> phone -> ip); the
replacement tokens contain no digits or ``@``, so later patterns can
never match inside an earlier replacement.

Vectorized: pandas ``str.count`` / ``str.replace`` over the batch —
no per-row Python loop.
"""

from __future__ import annotations

import pandas as pd

# (name, pattern, replacement) in application order
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def redact_frame(df: pd.DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> pd.DataFrame:
    """One output row per input row:
    ``(doc_id, n_emails, n_phones, n_ips, redacted_text)``."""
    text = df[text_col].fillna("")
    out = pd.DataFrame()
    out[id_col] = df[id_col]
    for name, pat, repl in PII_PATTERNS:
        out[f"n_{name}s"] = text.str.count(pat).astype("int64")
        text = text.str.replace(pat, repl, regex=True)
    out["redacted_text"] = text
    return out
