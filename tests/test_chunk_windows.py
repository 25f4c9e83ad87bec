"""docs_chunk_windows: fixed-token training windows with stride.

The oracle-parity replica (test_oracle_parity.py) covers the sf0.001
corpus end-to-end; here we pin the edge semantics on crafted inputs.
"""

import numpy as np
import pandas as pd
import pytest

from neurostore_text_extraction_ray.pipelines import steps


def _run(texts, window=64, stride=48, tmp_path=None):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(
        pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }),
        d / "documents.parquet",
    )
    out = steps.docs_chunk_windows(str(d), window=window, stride=stride)
    return out.to_pandas().sort_values(
        ["doc_id", "chunk_id"]).reset_index(drop=True)


def test_basic_windows(ray_session, tmp_path):
    # 10 tokens, window 4, stride 3 -> starts 0,3,6,9
    text = " ".join(f"t{i}" for i in range(10))
    df = _run([text], window=4, stride=3, tmp_path=tmp_path)
    assert df["start_tok"].tolist() == [0, 3, 6, 9]
    assert df["chunk_id"].tolist() == [0, 1, 2, 3]
    assert df["n_tok"].tolist() == [4, 4, 4, 1]
    assert df["chunk_text"].tolist() == [
        "t0 t1 t2 t3", "t3 t4 t5 t6", "t6 t7 t8 t9", "t9"]
    # overlap: window - stride = 1 shared token between neighbors
    assert df["chunk_text"][0].split()[-1] == df["chunk_text"][1].split()[0]


def test_empty_and_whitespace_docs_emit_nothing(ray_session, tmp_path):
    df = _run(["", "   ", None, "one"], window=4, stride=3,
              tmp_path=tmp_path)
    assert df["doc_id"].tolist() == [3]
    assert df["chunk_text"].tolist() == ["one"]
    assert df["n_tok"].tolist() == [1]


def test_exact_multiple_has_no_empty_tail(ray_session, tmp_path):
    # 6 tokens, window 3, stride 3 -> exactly two full windows
    df = _run(["a b c d e f"], window=3, stride=3, tmp_path=tmp_path)
    assert df["n_tok"].tolist() == [3, 3]
    assert df["chunk_text"].tolist() == ["a b c", "d e f"]


def test_doc_shorter_than_window(ray_session, tmp_path):
    df = _run(["only two"], window=64, stride=48, tmp_path=tmp_path)
    assert len(df) == 1
    assert df.loc[0, "n_tok"] == 2
    assert df.loc[0, "chunk_text"] == "only two"


def test_dtypes_are_int64(ray_session, tmp_path):
    df = _run(["a b c"], window=2, stride=1, tmp_path=tmp_path)
    for c in ("doc_id", "chunk_id", "start_tok", "n_tok"):
        assert df[c].dtype == np.int64, c


def test_invalid_params_raise():
    with pytest.raises(ValueError):
        steps.docs_chunk_windows("/nonexistent", window=0)
    with pytest.raises(ValueError):
        steps.docs_chunk_windows("/nonexistent", stride=-1)


def test_reconstruction_with_stride_equal_window(ray_session, tmp_path):
    """Non-overlapping windows concatenate back to the token stream."""
    text = " ".join(f"w{i}" for i in range(17))
    df = _run([text], window=5, stride=5, tmp_path=tmp_path)
    joined = " ".join(df["chunk_text"])
    assert joined == text
    assert int(df["n_tok"].sum()) == 17


def test_multirow_batch_offsets(ray_session, tmp_path):
    """Chunk indices restart per doc and starts never exceed lens."""
    texts = [" ".join(f"d{i}_{j}" for j in range(n))
             for i, n in enumerate([1, 7, 0, 12])]
    df = _run(texts, window=5, stride=4, tmp_path=tmp_path)
    g = df.groupby("doc_id")
    assert g["chunk_id"].min().eq(0).all()
    assert (df["start_tok"] % 4 == 0).all()
    lens = pd.Series({0: 1, 1: 7, 3: 12})
    assert (df["start_tok"] < df["doc_id"].map(lens)).all()
