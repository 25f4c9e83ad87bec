"""Pond-directory source (S1-S4, J2): read the reference's own on-disk
layout into a Dataset with source-priority resolution."""

import json
import os

import pytest

from neurostore_text_extraction_ray.sources.pond import (
    read_pond,
    resolve_pipeline_dir,
    scan_pond,
)

POND = "/root/reference/tests/data/sample_inputs"

pytestmark = pytest.mark.skipif(not os.path.isdir(POND), reason="reference unavailable")


def test_scan_pond_index():
    idx = {r["dbid"]: r for r in scan_pond(POND)}
    assert len(idx) == 7
    # mixed coverage mirrors the reference corpus (SURVEY §5)
    assert idx["8EVW7TUtC9cx"]["pubget_xml_path"] and not idx["8EVW7TUtC9cx"]["ace_html_path"]
    assert idx["6dYthnbocsU4"]["ace_html_path"] and not idx["6dYthnbocsU4"]["pubget_xml_path"]
    assert idx["3qT3nzK9bLZ7"]["ace_html_path"] and idx["3qT3nzK9bLZ7"]["pubget_xml_path"]
    assert idx["3qT3nzK9bLZ7"]["n_tables"] == 3
    assert idx["3qT3nzK9bLZ7"]["pmid"] == "26507433"


def test_read_pond_priority_resolution(ray_session):
    rows = {r["dbid"]: r for r in read_pond(POND).iter_rows()}
    # both-sources study: pubget wins (base.py:437-445 priority order)
    assert rows["3qT3nzK9bLZ7"]["text_source"] == "pubget"
    # ace-only study falls through to ace
    assert rows["6dYthnbocsU4"]["text_source"] == "ace"
    # db-metadata-only study: no text, metadata from db
    assert rows["4tm6XzAD8xSa"]["text"] is None
    md = json.loads(rows["4tm6XzAD8xSa"]["metadata_json"])
    assert md["publication_year"] == 2013
    # loaded pubget text equals the golden file byte-for-byte
    gold = open(f"{POND}/3qT3nzK9bLZ7/processed/pubget/text.txt", encoding="utf-8").read()
    assert rows["3qT3nzK9bLZ7"]["text"] == gold


def _csv_rows(path):
    """Independent (stdlib csv) parse of a coordinates.csv golden."""
    import csv

    with open(path, newline="", encoding="utf-8") as f:
        return list(csv.DictReader(f))


def test_coordinates_loaded_exactly(ray_session):
    """VERDICT r01 #6: processed/*/coordinates.csv loads into a
    coordinates:list<struct> column with EXACT rows for every study in
    the 7-study fixture corpus (checked against an independent stdlib
    csv parse)."""
    rows = {r["dbid"]: r for r in read_pond(POND).iter_rows()}
    from neurostore_text_extraction_ray.sources.pond import SOURCE_PRIORITY

    checked_studies = 0
    for dbid, row in rows.items():
        golden_path = None
        for src in SOURCE_PRIORITY:
            p = f"{POND}/{dbid}/processed/{src}/coordinates.csv"
            if os.path.exists(p):
                golden_path = p
                break
        if golden_path is None:
            assert row["coordinates"] is None
            continue
        golden = _csv_rows(golden_path)
        got = row["coordinates"]
        assert len(got) == len(golden), dbid
        for g_rec, c_rec in zip(golden, got):
            for col in ("x", "y", "z"):
                gv = g_rec.get(col)
                if gv in (None, ""):
                    assert c_rec[col] is None, (dbid, col)
                else:
                    assert c_rec[col] == float(gv), (dbid, col)
            for col in ("table_id", "table_label", "region", "statistic"):
                gv = g_rec.get(col)
                assert c_rec[col] == (gv if gv not in (None, "") else None), (
                    dbid, col, gv, c_rec[col])
        checked_studies += 1
    assert checked_studies >= 3  # fixture corpus has several coordinate goldens


def test_tables_pairing_loaded(ray_session):
    """CSV-contents + info-JSON pairing (dataset.py:80-96) into
    tables:list<struct> with typed info fields and row-record
    contents."""
    rows = {r["dbid"]: r for r in read_pond(POND).iter_rows()}
    tabs = rows["3qT3nzK9bLZ7"]["tables"]
    assert tabs is not None and len(tabs) == 3
    t0 = {t["table_number"]: t for t in tabs}["000"]
    golden_info = json.load(
        open(f"{POND}/3qT3nzK9bLZ7/source/pubget/tables/table_000_info.json"))
    assert t0["table_id"] == golden_info["table_id"]
    assert t0["table_label"] == golden_info["table_label"]
    assert t0["table_caption"] == golden_info["table_caption"]
    assert t0["table_foot"] == golden_info["table_foot"]
    assert t0["n_header_rows"] == golden_info["n_header_rows"]
    assert t0["table_data_file"] == golden_info["table_data_file"]
    contents = json.loads(t0["contents_json"])
    assert len(contents) == len(_csv_rows(
        f"{POND}/3qT3nzK9bLZ7/source/pubget/tables/table_000.csv"))
    # studies without a tables dir carry a null column, not an error
    assert rows["6dYthnbocsU4"]["tables"] is None


def test_word_count_over_real_pond(ray_session):
    """Derived operator over the REAL reference corpus end-to-end."""
    import pandas as pd

    ds = read_pond(POND)

    def wc(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame()
        out["dbid"] = df["dbid"]
        out["word_count"] = df["text"].fillna("").str.count(r"\S+").astype("int64")
        return out

    got = {r["dbid"]: r["word_count"] for r in
           ds.map_batches(wc, batch_format="pandas").iter_rows()}
    gold = open(f"{POND}/8EVW7TUtC9cx/processed/pubget/text.txt", encoding="utf-8").read()
    assert got["8EVW7TUtC9cx"] == len(gold.split())
    assert got["4tm6XzAD8xSa"] == 0


def test_resolve_pipeline_dir(tmp_path):
    base = tmp_path
    for ver, cfg, date in [("1.0.0", "aaa", "2024-01-01"), ("1.1.0", "bbb", "2024-02-01"),
                           ("1.1.0", "ccc", "2024-03-01")]:
        d = base / "word_count" / ver / cfg
        d.mkdir(parents=True)
        (d / "pipeline_info.json").write_text(json.dumps({"date": date}))
    # latest version -> 1.1.0; latest config within it -> newest date (ccc)
    got = resolve_pipeline_dir(str(base), "word_count")
    assert got.endswith(os.path.join("word_count", "1.1.0", "ccc"))
    assert resolve_pipeline_dir(str(base), "word_count", version="1.0.0").endswith("aaa")
    assert resolve_pipeline_dir(str(base), "missing") is None


def test_eval_corpus_pond():
    """The larger evaluation corpus (14 studies) also scans cleanly."""
    eval_pond = "/root/reference/evaluation/data/ns_pond_inputs"
    if not os.path.isdir(eval_pond):
        pytest.skip("eval corpus unavailable")
    idx = scan_pond(eval_pond)
    assert len(idx) == 14
    assert all(r["pubget_xml_path"] or r["ace_html_path"] for r in idx)


def test_tables_xml_column():
    """The tables_xml input slot (dataset.py:22,153-155) is exposed as
    a path column on pubget studies that ship tables.xml."""
    idx = {r["dbid"]: r for r in scan_pond(POND)}
    rec = idx["3qT3nzK9bLZ7"]
    assert rec["tables_xml_path"] is not None
    assert rec["tables_xml_path"].endswith("source/pubget/tables/tables.xml")
    assert os.path.exists(rec["tables_xml_path"])
    # studies without pubget tables expose None, not a missing key
    assert all("tables_xml_path" in r for r in idx.values())


def test_slice_studies(ray_session):
    """Dataset.slice(ids) analog: subset by dbid."""
    from neurostore_text_extraction_ray.sources.pond import (
        read_pond, slice_studies)

    all_ids = {r["dbid"] for r in scan_pond(POND)}
    keep = sorted(all_ids)[:2]
    out = {r["dbid"] for r in
           slice_studies(read_pond(POND), keep).iter_rows()}
    assert out == set(keep)
