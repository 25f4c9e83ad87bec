"""Text normalization + abbreviation kernels (reference parity:
``ns_extract/pipelines/normalize.py``).

- ``normalize_string``: ``normalize.py:8-28`` — capwords + apostrophe
  fold + sentinel-to-null.
- ``detect_abbreviations``: pure-Python Schwartz–Hearst (the public
  algorithm behind scispacy's ``abbreviation_detector`` used at
  ``normalize.py:31-97``; scispacy is unavailable here). Returns the
  same serialized dict shape (``umls_disease/model.py:41-64``).
- ``resolve_abbreviations``: ``normalize.py:100-144`` — expand each
  distinct short form once (first occurrence in the abbreviation list
  wins), plain ``str.replace`` of every occurrence.
- ``find_and_remove_definitions``: ``normalize.py:147-193`` — drop
  parenthetical ``(ABBR)`` tokens that match a known abbreviation or
  the initials of the preceding ``len(ABBR)`` words.
"""

from __future__ import annotations

import string


def normalize_string(input_string: str | None) -> str | None:
    """capwords + curly-apostrophe fold; '', None, Nan, N/a, Null -> None."""
    if input_string is None:
        return None
    clean = string.capwords(input_string.strip())
    clean = clean.replace("’", "'")
    if clean in ("", "None", "Nan", "N/a", "Null"):
        return None
    return clean


_WS_RUN_RE = None
_CTRL_RE = None
_NL_RUN_RE = None


def normalize_web_text(s: str | None) -> str:
    """Web-text normalization (the standard pre-tokenization cleanup):
    unicode NFC, control characters stripped (tab/newline kept),
    horizontal-whitespace runs collapsed to one space, 3+ newline runs
    collapsed to two, outer whitespace trimmed. ASCII input makes NFC
    and the control strip identities, so the operator stays exactly
    ANSI-SQL-expressible on the test corpora; unicode behavior is
    pinned by unit tests."""
    global _WS_RUN_RE, _CTRL_RE, _NL_RUN_RE
    if _WS_RUN_RE is None:
        import re

        _WS_RUN_RE = re.compile(r"[ \t]+")
        _CTRL_RE = re.compile(r"[\x00-\x08\x0b-\x1f\x7f]")  # keeps \t \n
        _NL_RUN_RE = re.compile(r"\n{3,}")
    if not s:
        return ""
    import unicodedata

    s = unicodedata.normalize("NFC", s)
    s = _CTRL_RE.sub("", s)
    s = _WS_RUN_RE.sub(" ", s)
    s = _NL_RUN_RE.sub("\n\n", s)
    return s.strip()


# ---------------------------------------------------------------------------
# Schwartz–Hearst abbreviation detection (Schwartz & Hearst, PSB 2003,
# "A simple algorithm for identifying abbreviation definitions in
# biomedical text") — the algorithm scispacy's AbbreviationDetector
# implements.
# ---------------------------------------------------------------------------


def _valid_short_form(s: str) -> bool:
    if not (2 <= len(s) <= 10):
        return False
    if len(s.split()) > 2:
        return False
    if not any(c.isalpha() for c in s):
        return False
    if not (s[0].isalnum() or s[0] == "("):
        return False
    return True


def _find_long_form(short: str, candidate: str) -> str | None:
    """Schwartz–Hearst character-matching: scan right-to-left aligning
    each short-form alnum char; the first char must match the start of a
    word in the long form."""
    s_idx = len(short) - 1
    l_idx = len(candidate) - 1
    while s_idx >= 0:
        c = short[s_idx].lower()
        if not c.isalnum():
            s_idx -= 1
            continue
        while l_idx >= 0 and (
            candidate[l_idx].lower() != c
            or (s_idx == 0 and l_idx > 0 and candidate[l_idx - 1].isalnum())
        ):
            l_idx -= 1
        if l_idx < 0:
            return None
        l_idx -= 1
        s_idx -= 1
    start = l_idx + 1
    # extend left to a word boundary
    while start > 0 and candidate[start - 1].isalnum():
        start -= 1
    long_form = candidate[start:]
    if not long_form:
        return None
    # sanity constraints from the paper
    if len(long_form.split()) > min(len(short) + 5, len(short) * 2):
        return None
    if long_form.strip() == short:
        return None
    return long_form


def detect_abbreviations(text: str) -> list[dict]:
    """Find (short, long) abbreviation definitions of the form
    ``long form (SF)`` and return scispacy-shaped dicts:
    short_text/short_start/short_end/long_text/long_start/long_end."""
    out = []
    seen: set[str] = set()
    i = 0
    n = len(text)
    while i < n:
        if text[i] != "(":
            i += 1
            continue
        close = text.find(")", i + 1)
        if close == -1 or close - i > 12:
            i += 1
            continue
        short = text[i + 1 : close].strip()
        if not _valid_short_form(short) or short in seen:
            i = close + 1
            continue
        # candidate long form: up to min(|short|+5, |short|*2) preceding words
        # on the same line/sentence fragment.
        before = text[:i].rstrip()
        stop = max(before.rfind("\n"), before.rfind(". "), before.rfind("; "))
        window = before[stop + 1 :].lstrip() if stop != -1 else before
        words = window.split()
        max_words = min(len(short) + 5, len(short) * 2)
        candidate_words = words[-max_words:] if words else []
        candidate = " ".join(candidate_words)
        long_form = _find_long_form(short, candidate) if candidate else None
        if long_form:
            long_start = before.rfind(long_form)
            if long_start != -1:
                out.append(
                    {
                        "short_text": short,
                        "short_start": i + 1,
                        "short_end": close,
                        "long_text": long_form,
                        "long_start": long_start,
                        "long_end": long_start + len(long_form),
                    }
                )
                seen.add(short)
        i = close + 1
    return out


def resolve_abbreviations(target: str | None, abbreviations: list[dict]) -> str | None:
    """Expand each distinct short form found in ``target`` once (all its
    occurrences replaced), in abbreviation-list order."""
    if not target or not abbreviations:
        return target
    processed: set[str] = set()
    result = target
    for abrv in abbreviations:
        short = abrv["short_text"]
        if short in processed or short not in target:
            continue
        result = result.replace(short, abrv["long_text"])
        processed.add(short)
    return result


def find_and_remove_definitions(s: str, abbreviations: list[dict]) -> str:
    """Drop standalone ``(ABBR)`` tokens that are known abbreviations or
    initials of the preceding ``len(ABBR)`` words; re-join with single
    spaces (whitespace-collapsing, matching the reference)."""
    words = s.split()
    known = {a["short_text"] for a in abbreviations}
    kept = []
    for i, word in enumerate(words):
        remove = False
        if word.startswith("(") and word.endswith(")"):
            clause = word[1:-1]
            if clause in known:
                remove = True
            else:
                clause_len = len(clause)
                if i >= clause_len:
                    if not clause:
                        remove = True
                    else:
                        preceding = "".join(w[0] for w in words[i - clause_len : i])
                        if preceding.lower() == clause.lower():
                            remove = True
        if not remove:
            kept.append(word)
    return " ".join(kept)
