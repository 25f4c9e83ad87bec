"""Winnowing fingerprints (stages/winnow.py): the paper's coverage
guarantee (every window of w consecutive k-grams contributes at least
one selected fingerprint), the shared-substring detection property
(any k+w-1-token overlap yields a shared fingerprint HASH), edge
shapes, and determinism."""

import json

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from neurostore_text_extraction_ray.stages.winnow import (
    winnow_batch, winnow_doc)

K, W = 5, 4


def test_edges():
    for t in (None, "", "one two"):
        n, pos, hs = winnow_doc(t, K, W)
        assert n == 0 and len(pos) == 0
    # exactly k words: one k-gram, one fingerprint
    n, pos, hs = winnow_doc("a b c d e", K, W)
    assert n == 1 and list(pos) == [0] and len(hs) == 1


words_st = st.lists(
    st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"]),
    min_size=0, max_size=60)


@given(words_st)
@settings(max_examples=100, deadline=None)
def test_coverage_guarantee(ws):
    """Every window of W consecutive k-gram positions contains a
    selected position — the winnowing invariant."""
    n, pos, hs = winnow_doc(" ".join(ws), K, W)
    ps = set(pos.tolist())
    for start in range(0, max(0, n - W + 1)):
        assert any(p in ps for p in range(start, start + W))
    # selected hashes really are the k-gram hashes at those positions
    assert len(pos) == len(hs) and (np.diff(pos) > 0).all()


@given(words_st, words_st, words_st)
@settings(max_examples=60, deadline=None)
def test_shared_substring_yields_shared_fingerprint(pre, shared_pad, post):
    """Two documents sharing a K+W-1-token run share at least one
    fingerprint hash (the MOSS detection property)."""
    shared = ["zeta%d" % i for i in range(K + W - 1)]
    d1 = " ".join(pre + shared)
    d2 = " ".join(shared + post)
    _, _, h1 = winnow_doc(d1, K, W)
    _, _, h2 = winnow_doc(d2, K, W)
    assert set(h1.tolist()) & set(h2.tolist())


def test_batch_kernel_and_json(ray_session):
    df = pd.DataFrame({
        "doc_id": np.arange(3, dtype=np.int64),
        "text": ["a b c d e f g h", None, "a b c d e"],
    })
    out = winnow_batch(df, K, W)
    assert out["n_kgrams"].tolist() == [4, 0, 1]
    fps = json.loads(out.loc[0, "fps_json"])
    assert all(len(x) == 2 and len(x[1]) == 16 for x in fps)
    assert out.loc[1, "fps_json"] == "[]"
    # determinism across calls
    out2 = winnow_batch(df, K, W)
    pd.testing.assert_frame_equal(out, out2)
