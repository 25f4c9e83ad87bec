"""Text-analysis kernels: tokenization, word counts, language ID,
quality scoring, fingerprinting. Vectorized variants operate on numpy /
pyarrow arrays inside ``map_batches``.

- word_count parity: ``len(text.split())``
  (reference ``tests/example_pipelines/word_count/model.py:31-47``).
- token_count: whitespace words plus a BPE-ish sub-word estimate.
- lang_id: character-n-gram / stopword heuristic (no external models).
- quality: length / punctuation / stopword-ratio features.
- fingerprint: 64-bit rolling (polynomial) hash of normalized words.
"""

from __future__ import annotations

import re

import numpy as np

WORD_RE = re.compile(r"\w+", re.UNICODE)
# sklearn-compatible token pattern used by the TF-IDF operator
# (reference tfidf/model.py uses sklearn's default (?u)\b\w\w+\b).
SK_TOKEN_RE = re.compile(r"(?u)\b\w\w+\b")
# GPT-2-style pre-tokenizer regex (public, from the GPT-2 repo) — used as
# the "BPE-ish" token estimator since tiktoken is unavailable.
BPEISH_RE = re.compile(
    r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?\d+| ?[^\sA-Za-z\d]+|\s+(?!\S)|\s+"
)

_STOPWORDS = {
    "en": {"the", "of", "and", "to", "in", "a", "is", "that", "for", "it",
           "was", "on", "with", "as", "are", "be", "this", "by", "an", "at"},
    "de": {"der", "die", "das", "und", "in", "den", "von", "zu", "mit", "ist",
           "des", "im", "nicht", "ein", "eine", "auf", "als", "auch", "es", "an"},
    "fr": {"le", "la", "les", "de", "des", "et", "un", "une", "du", "en",
           "est", "que", "dans", "qui", "pour", "pas", "sur", "au", "plus", "par"},
    "es": {"el", "la", "los", "las", "de", "y", "en", "un", "una", "que",
           "es", "del", "se", "con", "por", "para", "su", "al", "lo", "como"},
    "it": {"il", "la", "le", "di", "e", "un", "una", "che", "in", "per",
           "del", "della", "si", "con", "non", "al", "da", "sono", "come", "anche"},
}


def word_count(text: str | None) -> int:
    """Reference semantics: len(text.split())."""
    return len(text.split()) if text else 0


def token_count(text: str | None) -> int:
    """BPE-ish token estimate via the GPT-2 pre-tokenizer regex."""
    return len(BPEISH_RE.findall(text)) if text else 0


def lang_id(text: str | None) -> tuple[str, float]:
    """(lang, confidence) via stopword voting over the supported set;
    ('und', 0.0) when no evidence."""
    if not text:
        return ("und", 0.0)
    words = [w.lower() for w in WORD_RE.findall(text[:4000])]
    if not words:
        return ("und", 0.0)
    ws = set(words)
    best, best_hits = "und", 0
    for lang, stops in _STOPWORDS.items():
        hits = sum(1 for w in words if w in stops)
        if hits > best_hits:
            best, best_hits = lang, hits
    if best_hits == 0:
        return ("und", 0.0)
    return (best, min(1.0, best_hits / max(1, len(words))))


def quality_features(text: str | None) -> dict:
    """Heuristic quality features for web-scale filtering."""
    if not text:
        return {
            "n_chars": 0, "n_words": 0, "mean_word_len": 0.0,
            "stop_ratio": 0.0, "alpha_ratio": 0.0, "punct_ratio": 0.0,
            "quality_score": 0.0,
        }
    words = text.split()
    n_chars = len(text)
    n_words = len(words)
    alpha = sum(c.isalpha() for c in text)
    punct = sum(not c.isalnum() and not c.isspace() for c in text)
    lw = [w.lower().strip(".,;:!?()\"'") for w in words]
    stops = _STOPWORDS["en"]
    stop_ratio = sum(1 for w in lw if w in stops) / max(1, n_words)
    mean_word_len = sum(len(w) for w in words) / max(1, n_words)
    alpha_ratio = alpha / max(1, n_chars)
    punct_ratio = punct / max(1, n_chars)
    score = (
        min(1.0, n_words / 50.0) * 0.3
        + min(1.0, stop_ratio / 0.3) * 0.3
        + alpha_ratio * 0.3
        + (1.0 - min(1.0, punct_ratio / 0.3)) * 0.1
    )
    return {
        "n_chars": n_chars, "n_words": n_words,
        "mean_word_len": mean_word_len, "stop_ratio": stop_ratio,
        "alpha_ratio": alpha_ratio, "punct_ratio": punct_ratio,
        "quality_score": score,
    }


# -- batch-vectorized variants (VERDICT r02 next-round #9) -------------------
#
# Exact-equality contracts with the scalar kernels above are pinned by
# tests/test_textstats.py::test_batch_kernels_match_scalar over the
# real corpora — any drift breaks the SQL oracles and goldens.

_STRIP_CHARS = ".,;:!?()\"'"
_LANGS = list(_STOPWORDS)  # iteration order = tie-break order


def word_count_batch(texts) -> np.ndarray:
    """Vectorized ``len(text.split())`` over a pandas Series."""
    import pandas as pd

    s = pd.Series(texts).fillna("").astype(str)
    return s.str.count(r"\S+").to_numpy(dtype=np.int64)


def token_count_batch(texts) -> np.ndarray:
    """Vectorized BPE-ish token estimate (one regex count per row at
    the C level; no per-row findall list materialization)."""
    import pandas as pd

    s = pd.Series(texts).fillna("").astype(str)
    return s.str.count(BPEISH_RE).to_numpy(dtype=np.int64)


def char_entropy(text: str | None) -> float:
    """Character-level Shannon entropy in bits/char — low entropy flags
    repetitive/boilerplate pages, abnormally high flags binary-ish or
    encoded junk (the Gopher-family heuristic). Empty/None -> 0.0.
    Per-doc work is three C-level passes (utf-32 view, unique, log)."""
    if not text:
        return 0.0
    cp = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
    _, counts = np.unique(cp, return_counts=True)
    p = counts / len(cp)
    return float(-(p * np.log2(p)).sum())


def zlib_ratio(text: str | None, level: int = 6) -> tuple[int, int, float]:
    """(n_bytes, n_compressed, ratio) under zlib at a FIXED level —
    compression ratio is the classic cheap redundancy signal (highly
    compressible pages are template/boilerplate-heavy). Deterministic
    for a fixed zlib build, so the oracle is a pinned golden. Empty ->
    (0, 0, 0.0) rather than the ~1e2 ratio of compressing nothing."""
    import zlib

    raw = (text or "").encode("utf-8")
    if not raw:
        return 0, 0, 0.0
    comp = zlib.compress(raw, level)
    return len(raw), len(comp), len(comp) / len(raw)


def lang_id_batch(texts) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized ``lang_id``: one findall+explode, then per-language
    ``isin`` + groupby-sum instead of a Python loop per word. Returns
    (langs object array, confidence float array)."""
    import pandas as pd

    s = pd.Series(texts).fillna("").astype(str).reset_index(drop=True)
    words = s.str.slice(0, 4000).str.findall(WORD_RE)
    n_words = words.str.len().to_numpy(dtype=np.int64)
    ex = words.explode().dropna().str.lower()
    hits = np.zeros((len(s), len(_LANGS)), dtype=np.int64)
    if len(ex):
        for k, lang in enumerate(_LANGS):
            h = ex.isin(_STOPWORDS[lang]).groupby(level=0).sum()
            hits[h.index.to_numpy(), k] = h.to_numpy()
    best_k = hits.argmax(axis=1)  # first max wins — scalar's strict `>`
    best_hits = hits[np.arange(len(s)), best_k]
    langs = np.where(best_hits > 0,
                     np.array(_LANGS, dtype=object)[best_k], "und")
    conf = np.where(
        best_hits > 0,
        np.minimum(1.0, best_hits / np.maximum(1, n_words)), 0.0)
    return langs.astype(object), conf


def quality_features_batch(texts) -> "pd.DataFrame":
    """Vectorized ``quality_features`` over a Series -> DataFrame with
    the same columns/values (empty/None rows all-zero, like the
    scalar's early return)."""
    import pandas as pd

    s = pd.Series(texts).fillna("").astype(str).reset_index(drop=True)
    n_chars = s.str.len().to_numpy(dtype=np.int64)
    n_words = s.str.count(r"\S+").to_numpy(dtype=np.int64)
    nonspace = s.str.count(r"\S").to_numpy(dtype=np.int64)
    # char classes mirroring the scalar's isalpha / (not isalnum and
    # not isspace): exact for ASCII (python re \w == isalnum()+
    # underscore, \s == isspace); rows with non-ASCII chars fall back
    # to the scalar kernel below (regex classes diverge from
    # str.isalpha on numeric-but-not-\d codepoints like '½')
    alpha = s.str.count(r"[A-Za-z]").to_numpy(dtype=np.int64)
    punct = s.str.count(r"[^\w\s]|_").to_numpy(dtype=np.int64)
    wex = s.str.split().explode().dropna().str.lower().str.strip(_STRIP_CHARS)
    stop_hits = np.zeros(len(s), dtype=np.int64)
    if len(wex):
        h = wex.isin(_STOPWORDS["en"]).groupby(level=0).sum()
        stop_hits[h.index.to_numpy()] = h.to_numpy()
    den_words = np.maximum(1, n_words)
    den_chars = np.maximum(1, n_chars)
    stop_ratio = stop_hits / den_words
    mean_word_len = nonspace / den_words
    alpha_ratio = alpha / den_chars
    punct_ratio = punct / den_chars
    score = (
        np.minimum(1.0, n_words / 50.0) * 0.3
        + np.minimum(1.0, stop_ratio / 0.3) * 0.3
        + alpha_ratio * 0.3
        + (1.0 - np.minimum(1.0, punct_ratio / 0.3)) * 0.1
    )
    empty = n_chars == 0
    out = pd.DataFrame({
        "n_chars": n_chars, "n_words": np.where(empty, 0, n_words),
        "mean_word_len": np.where(empty, 0.0, mean_word_len),
        "stop_ratio": np.where(empty, 0.0, stop_ratio),
        "alpha_ratio": np.where(empty, 0.0, alpha_ratio),
        "punct_ratio": np.where(empty, 0.0, punct_ratio),
        "quality_score": np.where(empty, 0.0, score),
    })
    non_ascii = np.flatnonzero(~s.map(str.isascii).to_numpy())
    for i in non_ascii:
        row = quality_features(s.iloc[i])
        for col, v in row.items():
            out.at[i, col] = v
    return out


# Fingerprint kernel version: v1 was a per-byte python FNV-1a loop
# (O(bytes) interpreter work per doc — the slowest kernel in the repo,
# VERDICT r03 what's-wrong #4); v2 hashes the whitespace-normalized
# lowercase text with blake2b (C speed, one call per doc). Goldens for
# docs_fingerprint are pinned to v2 (tools/make_goldens.py).
FINGERPRINT_VERSION = 2


def fingerprint64(text: str | None) -> int:
    """64-bit deterministic document fingerprint: blake2b digest of the
    whitespace-normalized (split/join) lowercase text. Invariants:
    whitespace runs/kind don't matter; case doesn't matter; any content
    change does."""
    import hashlib

    norm = " ".join(text.lower().split()) if text else ""
    d = hashlib.blake2b(norm.encode("utf-8"), digest_size=8).digest()
    return int.from_bytes(d, "little")


def shingles(text: str, k: int = 5) -> list[str]:
    """k-word shingles over the lowercase \\w+ tokenization."""
    words = [w.lower() for w in WORD_RE.findall(text or "")]
    if len(words) < k:
        return [" ".join(words)] if words else []
    return [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]


def char_ngrams(text: str, n: int = 3) -> list[str]:
    t = re.sub(r"\s+", " ", (text or "").lower()).strip()
    if len(t) < n:
        return [t] if t else []
    return [t[i : i + n] for i in range(len(t) - n + 1)]
