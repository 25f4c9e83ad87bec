"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003,
the public MOSS algorithm): select, from every window of ``w``
consecutive k-gram hashes, the leftmost minimum — the classic
local-sampling guarantee that any shared substring of length
``k + w - 1`` tokens between two documents yields at least one shared
fingerprint, at ~2/(w+1) the density of the full k-gram set.

Deterministic: token hashes are the self-owned blake2b 64-bit token
hash, k-gram hashes the dupspans order-sensitive polynomial, and ties
break to the leftmost position (documented convention — robust
winnowing's rightmost tie-break trades determinism-simplicity for
marginally lower density; either satisfies the guarantee).

Scale shape: a stateless per-document ``map_batches`` kernel — each
batch hashes its distinct words once, every downstream step is numpy
(sliding-window argmin, unique) — no shuffle, no driver state. The
fingerprint payload per doc is ~n_kgrams/w entries, serialized as
canonical JSON (the repo's nested-output contract)."""

from __future__ import annotations

import json

import numpy as np
import pandas as pd

from ..functions.hashing import _token_hashes
from ..functions.textstats import WORD_RE
from .dupspans import _window_hashes


def winnow_doc(text: str | None, k: int, w: int):
    """(n_kgrams, selected positions, selected hashes) of one doc."""
    words = WORD_RE.findall(text or "")
    wh = _token_hashes(words)
    h = _window_hashes(wh, k)
    n = len(h)
    if n == 0:
        return 0, np.empty(0, np.int64), np.empty(0, np.uint64)
    w_eff = min(w, n)
    win = np.lib.stride_tricks.sliding_window_view(h, w_eff)
    sel = win.argmin(axis=1) + np.arange(len(win), dtype=np.int64)
    pos = np.unique(sel).astype(np.int64)
    return n, pos, h[pos]


def winnow_batch(df: pd.DataFrame, k: int, w: int,
                 id_col: str = "doc_id",
                 text_col: str = "text") -> pd.DataFrame:
    out_n = np.zeros(len(df), dtype=np.int64)
    out_f = np.zeros(len(df), dtype=np.int64)
    fps = []
    for i, t in enumerate(df[text_col].fillna("")):
        n, pos, hs = winnow_doc(t, k, w)
        out_n[i] = n
        out_f[i] = len(pos)
        fps.append(json.dumps(
            [[int(p), format(int(x), "016x")] for p, x in zip(pos, hs)],
            separators=(",", ":")))
    res = pd.DataFrame()
    res[id_col] = df[id_col]
    res["n_kgrams"] = out_n
    res["n_fps"] = out_f
    res["fps_json"] = fps
    return res


def winnow_fingerprints(docs_ds, k: int = 5, w: int = 4):
    """(doc_id, n_kgrams, n_fps, fps_json) per document."""
    return docs_ds.map_batches(
        lambda df: winnow_batch(df, k, w), batch_format="pandas")
