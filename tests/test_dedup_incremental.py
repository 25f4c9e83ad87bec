"""Incremental near-dup (VERDICT r03 next-round #8): on a rerun after
editing 1% of docs, the sketch stage processes ONLY the changed docs
and the labels equal the from-scratch result; doc addition and removal
are also exercised."""

import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"
KW = dict(threshold=0.7, bands=16)


def _docs(ray_session, edit_ids=(), drop_ids=(), extra=()):
    import ray.data as rd

    import duckdb

    con = duckdb.connect()
    df = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet') "
        f"ORDER BY doc_id").fetchdf()
    con.close()
    df = df[~df["doc_id"].isin(drop_ids)].copy()
    edit = df["doc_id"].isin(edit_ids)
    df.loc[edit, "text"] = df.loc[edit, "text"] + " EDITED CONTENT MARKER"
    for did, text in extra:
        df = pd.concat(
            [df, pd.DataFrame({"doc_id": [did], "text": [text]})],
            ignore_index=True)
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(df["doc_id"].to_numpy("int64"), pa.int64()),
        "text": pa.array(df["text"].tolist(), pa.string()),
    }).combine_chunks()), df


def _canon(ds) -> pd.DataFrame:
    return (ds.to_pandas().sort_values("doc_id").reset_index(drop=True))


def _scratch(ds):
    from neurostore_text_extraction_ray.stages.dedup import minhash_near_dup

    return _canon(minhash_near_dup(ds, **KW))


def test_incremental_first_run_equals_scratch(ray_session, tmp_path):
    from neurostore_text_extraction_ray.stages.dedup_incremental import (
        minhash_near_dup_incremental)

    ds, _ = _docs(ray_session)
    labels, stats = minhash_near_dup_incremental(
        ds, str(tmp_path / "state"), **KW)
    assert stats["n_sketched"] == stats["n_docs"] == 500
    pd.testing.assert_frame_equal(_canon(labels), _scratch(ds))


def test_incremental_resketch_only_changed(ray_session, tmp_path):
    from neurostore_text_extraction_ray.stages.dedup_incremental import (
        minhash_near_dup_incremental)

    state = str(tmp_path / "state")
    ds0, _ = _docs(ray_session)
    minhash_near_dup_incremental(ds0, state, **KW)

    # 1% edit: 5 docs
    edited = [0, 100, 200, 300, 400]
    ds1, _ = _docs(ray_session, edit_ids=edited)
    labels, stats = minhash_near_dup_incremental(ds1, state, **KW)
    assert stats["n_sketched"] == len(edited)  # ONLY the changed docs
    assert stats["n_removed"] == 0
    pd.testing.assert_frame_equal(_canon(labels), _scratch(ds1))


def test_incremental_handles_add_and_remove(ray_session, tmp_path):
    import duckdb

    from neurostore_text_extraction_ray.stages.dedup_incremental import (
        minhash_near_dup_incremental)

    state = str(tmp_path / "state")
    ds0, _ = _docs(ray_session)
    minhash_near_dup_incremental(ds0, state, **KW)

    # add near-dup copies of two existing docs (they must join those
    # docs' groups) and remove three docs
    con = duckdb.connect()
    t7, t11 = [r[0] for r in con.execute(
        f"SELECT text FROM read_parquet('{SF}/documents.parquet') "
        f"WHERE doc_id IN (7, 11) ORDER BY doc_id").fetchall()]
    con.close()
    ds1, df1 = _docs(
        ray_session, drop_ids=[2, 3, 5],
        extra=[(90007, t7), (90011, t11)])
    labels, stats = minhash_near_dup_incremental(ds1, state, **KW)
    assert stats["n_sketched"] == 2  # only the two new docs
    assert stats["n_removed"] == 3
    got = _canon(labels)
    assert sorted(got["doc_id"].tolist()) == sorted(df1["doc_id"].tolist())
    pd.testing.assert_frame_equal(got, _scratch(ds1))
    # exact-copy docs collapse onto their originals
    by_id = dict(zip(got["doc_id"], got["dup_group"]))
    assert by_id[90007] == by_id[7]
    assert by_id[90011] == by_id[11]


def test_incremental_config_change_rebuilds(ray_session, tmp_path):
    from neurostore_text_extraction_ray.stages.dedup_incremental import (
        minhash_near_dup_incremental)

    state = str(tmp_path / "state")
    ds, _ = _docs(ray_session)
    minhash_near_dup_incremental(ds, state, **KW)
    # different bands -> full re-sketch, not stale-state reuse
    labels, stats = minhash_near_dup_incremental(
        ds, state, threshold=0.7, bands=8)
    assert stats["n_sketched"] == 500


SIMKW = dict(method="simhash", bands=4, hamming_threshold=3)


def _scratch_simhash(ds):
    from neurostore_text_extraction_ray.stages.dedup import simhash_near_dup

    return _canon(simhash_near_dup(ds, hamming_threshold=3, bands=4))


def test_incremental_simhash_equals_scratch(ray_session, tmp_path):
    from neurostore_text_extraction_ray.stages.dedup_incremental import (
        minhash_near_dup_incremental)

    state = str(tmp_path / "state")
    ds0, _ = _docs(ray_session)
    labels0, stats0 = minhash_near_dup_incremental(ds0, state, **SIMKW)
    assert stats0["n_sketched"] == stats0["n_docs"] == 500
    pd.testing.assert_frame_equal(_canon(labels0), _scratch_simhash(ds0))

    # 1% edit rerun: only the changed docs are re-sketched, labels
    # still equal from-scratch simhash_near_dup
    edited = [0, 100, 200, 300, 400]
    ds1, _ = _docs(ray_session, edit_ids=edited)
    labels1, stats1 = minhash_near_dup_incremental(ds1, state, **SIMKW)
    assert stats1["n_sketched"] == len(edited)
    pd.testing.assert_frame_equal(_canon(labels1), _scratch_simhash(ds1))


def test_incremental_method_change_rebuilds(ray_session, tmp_path):
    from neurostore_text_extraction_ray.stages.dedup_incremental import (
        minhash_near_dup_incremental)

    state = str(tmp_path / "state")
    ds, _ = _docs(ray_session)
    minhash_near_dup_incremental(ds, state, **KW)
    # minhash state must not be served to a simhash run
    labels, stats = minhash_near_dup_incremental(ds, state, **SIMKW)
    assert stats["n_sketched"] == 500
    pd.testing.assert_frame_equal(_canon(labels), _scratch_simhash(ds))


def test_incremental_unknown_method_raises(ray_session, tmp_path):
    from neurostore_text_extraction_ray.stages.dedup_incremental import (
        minhash_near_dup_incremental)

    ds, _ = _docs(ray_session)
    with pytest.raises(ValueError, match="unknown method"):
        minhash_near_dup_incremental(ds, str(tmp_path / "s"), method="nope")


def test_incremental_crashed_promote_recovers(ray_session, tmp_path):
    import os

    from neurostore_text_extraction_ray.stages.dedup_incremental import (
        minhash_near_dup_incremental)

    state = str(tmp_path / "state")
    ds, _ = _docs(ray_session)
    minhash_near_dup_incremental(ds, state, **KW)
    # simulate a crash mid-promote: marker retracted, state half-replaced
    os.remove(os.path.join(state, "state.json"))
    import shutil

    shutil.rmtree(os.path.join(state, "bands"))
    labels, stats = minhash_near_dup_incremental(ds, state, **KW)
    assert stats["n_sketched"] == 500  # full rebuild, never mixed state
    pd.testing.assert_frame_equal(_canon(labels), _scratch(ds))
