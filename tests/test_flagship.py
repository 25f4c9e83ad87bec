"""Flagship pipeline end-to-end on sf0.001: synthesis -> dedup ->
extract -> resumable parquet sink. Verifies extracted text equals the
SQL-reconstructible expectation, dedup keeps the latest fetch, failure
counters fire, and resume skips completed parts."""

import glob
import json
import os
import shutil

import pyarrow.parquet as pq
import pytest

from neurostore_text_extraction_ray.sources import pages as pages_src
from neurostore_text_extraction_ray.pipelines import flagship

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(not os.path.isdir(SF), reason="testdata unavailable")


@pytest.fixture(scope="module")
def extracted(ray_session, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("flagship"))
    ds = pages_src.read_pages(SF)
    run_dir, summary = flagship.run_flagship_to_parquet(
        ds, out, num_parts=8, input_path=f"{SF}/documents.parquet"
    )
    return run_dir, summary


def _read_all(run_dir):
    files = sorted(glob.glob(os.path.join(run_dir, "parts", "part-*.parquet")))
    return pq.ParquetDataset(files).read()


def test_row_counts_and_dedup(extracted, ray_session):
    run_dir, summary = extracted
    table = _read_all(run_dir)
    # one row per unique url (500 docs; duplicates collapsed)
    assert table.num_rows == 500
    urls = table["url"].to_pylist()
    assert len(set(urls)) == 500


def test_extracted_text_matches_expectation(extracted):
    run_dir, _ = extracted
    table = _read_all(run_dir)
    import duckdb

    docs = duckdb.connect().execute(
        f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    by_url = dict(zip(table["url"].to_pylist(), table["extracted_text"].to_pylist()))
    checked = 0
    for doc_id, text in docs:
        if doc_id % pages_src.BAD_UTF8_MOD == pages_src.BAD_UTF8_REM:
            continue
        if doc_id % pages_src.EMPTY_MOD == pages_src.EMPTY_REM:
            continue
        rev = 1 if doc_id % pages_src.DUP_MOD == 0 else 0  # dedup keeps latest
        assert by_url[pages_src.url_for(doc_id)] == pages_src.expected_text(
            doc_id, text, rev
        ), doc_id
        checked += 1
    assert checked > 450


def test_failure_counters(extracted):
    run_dir, summary = extracted
    mans = [json.load(open(f)) for f in glob.glob(os.path.join(run_dir, "manifests", "*.json"))]
    n_fail = sum(m["n_parse_failed"] for m in mans)
    n_empty = sum(m["n_empty"] for m in mans)
    # deterministic edge rows: doc_id%101==3 -> bad utf8; doc_id%97==5 -> empty
    expect_fail = len([d for d in range(500) if d % 101 == 3])
    expect_empty = len([d for d in range(500) if d % 97 == 5 and d % 101 != 3])
    assert n_fail == expect_fail
    assert n_empty == expect_empty
    for m in mans:
        assert m["parser_version"] >= 1
        assert m["input_file"].endswith("documents.parquet")
        assert m["url_range"][0] <= m["url_range"][1]


def test_spans_and_metadata_columns(extracted):
    run_dir, _ = extracted
    table = _read_all(run_dir)
    row = {n: table[n][0].as_py() for n in table.column_names}
    assert isinstance(row["spans"], list)
    md = row["metadata"]
    assert set(md) >= {"title", "authors", "journal", "publication_year", "text"}


def test_resume_skips_completed_parts(extracted, ray_session, tmp_path):
    """Kill/resume semantics: delete one part's data+manifest, re-run,
    only that part is rewritten and the corpus is complete again."""
    run_dir, _ = extracted
    victim_data = sorted(glob.glob(os.path.join(run_dir, "parts", "part-*.parquet")))[0]
    victim_man = os.path.join(
        run_dir, "manifests", os.path.basename(victim_data).replace(".parquet", ".json")
    )
    os.remove(victim_data)
    os.remove(victim_man)
    before = set(glob.glob(os.path.join(run_dir, "parts", "*.parquet")))
    ds = pages_src.read_pages(SF)
    run_dir2, summary2 = flagship.run_flagship_to_parquet(
        ds, os.path.dirname(run_dir), num_parts=8,
        input_path=f"{SF}/documents.parquet",
    )
    assert run_dir2 == run_dir  # same config -> same run id
    assert len(summary2) == 1  # only the missing part was processed
    assert summary2["partition_id"].iloc[0] == int(
        os.path.basename(victim_data)[5:10]
    )
    table = _read_all(run_dir)
    assert table.num_rows == 500  # complete again


def test_jats_pages_path(ray_session):
    """pages_xml variant through the same flagship stages."""
    ds = pages_src.read_pages_xml(SF)
    out = flagship.flagship_dataset(ds, payload_column="xml", mode="jats",
                                    concurrency=2, batch_size=64)
    table = out.take_batch(50, batch_format="pyarrow")
    text0 = table["extracted_text"][0].as_py()
    assert "## Introduction \n  \n" in text0
    labels = [s["label"] for s in table["spans"][0].as_py()]
    assert labels == ["intro", "results"]


def test_empty_parts_get_manifests(ray_session, tmp_path):
    """num_parts larger than the url space: empty parts still write
    manifests so resume marks them complete."""
    import pyarrow as pa
    import ray.data as rd

    from neurostore_text_extraction_ray.sources import pages as pages_src

    few = pa.table({
        "url": pa.array([pages_src.url_for(i) for i in range(3)], pa.string()),
        "warc_ts": pa.array([pages_src.ts_for(i, 0) for i in range(3)], pa.timestamp("us")),
        "html": pa.array([pages_src.html_for(i, "alpha beta", 0) for i in range(3)], pa.binary()),
    })
    run_dir, summary = flagship.run_flagship_to_parquet(
        rd.from_arrow(few), str(tmp_path), num_parts=8, input_path="<inline>",
    )
    from neurostore_text_extraction_ray.state import manifest as mf

    assert len(mf.completed_parts(run_dir)) == 8
    assert int(summary["rows"].sum()) == 3
    # stage (exchange) dir cleaned once all parts completed
    assert not os.path.isdir(os.path.join(run_dir, "stage"))
    # empty parts share the full output schema -> uniform reads work
    table = _read_all(run_dir)
    assert table.num_rows == 3
    assert "extracted_text" in table.column_names


def test_null_urls_not_collapsed():
    """Null urls must stay distinct rows in dedup, never merged."""
    import numpy as np

    idx = flagship._latest_per_url_indices(
        np.array(["a", None, None, "a"], dtype=object),
        np.array(["2024-01-01", "2024-01-01", "2024-01-02", "2024-01-03"],
                 dtype="datetime64[us]"),
    )
    assert len(idx) == 3  # latest 'a' + both nulls


def test_read_flagship_output(extracted, ray_session):
    run_dir, _ = extracted
    ds, manifests = flagship.read_flagship_output(run_dir)
    assert ds.count() == 500
    assert len(manifests) == 8
    assert all("n_parse_failed" in m for m in manifests)


def test_hot_key_skew(ray_session, tmp_path):
    """5,000 fetches of ONE url (hot key) collapse to a single row and
    don't break partitioning."""
    import pyarrow as pa
    import ray.data as rd

    n = 5000
    hot = pa.table({
        "url": pa.array(["https://hot.example.org/x"] * n, pa.string()),
        "warc_ts": pa.array([pages_src.ts_for(i, 0) for i in range(n)],
                            pa.timestamp("us")),
        "html": pa.array([pages_src.html_for(1, f"rev {i}", 0) for i in range(n)],
                         pa.binary()),
    })
    run_dir, summary = flagship.run_flagship_to_parquet(
        rd.from_arrow(hot), str(tmp_path), num_parts=4, input_path="<hot>",
    )
    table = _read_all(run_dir)
    assert table.num_rows == 1
    assert f"rev {n-1}" in table["extracted_text"][0].as_py()  # latest wins


def test_empty_input(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data as rd

    empty = pa.table({
        "url": pa.array([], pa.string()),
        "warc_ts": pa.array([], pa.timestamp("us")),
        "html": pa.array([], pa.binary()),
    })
    run_dir, summary = flagship.run_flagship_to_parquet(
        rd.from_arrow(empty), str(tmp_path), num_parts=4, input_path="<empty>",
    )
    from neurostore_text_extraction_ray.state import manifest as mf

    assert len(mf.completed_parts(run_dir)) == 4
    assert _read_all(run_dir).num_rows == 0


def test_fragment_ids_distinguish_same_url_sets(ray_session, tmp_path):
    """Regression: two phase-A batches carrying the SAME url set but
    different fetches (the normal case when each batch holds one fetch
    per url) must write DISTINCT fragment files — a content-blind
    fragment id silently drops one batch and latest-wins dedup then
    emits the stale fetch."""
    import pyarrow as pa
    import ray.data as rd

    n = 512
    def fetch_table(rev):
        return pa.table({
            "url": pa.array([pages_src.url_for(i) for i in range(n)], pa.string()),
            "warc_ts": pa.array([pages_src.ts_for(i, rev) for i in range(n)],
                                pa.timestamp("us")),
            "html": pa.array([pages_src.html_for(i, f"payload rev{rev}", rev)
                              for i in range(n)], pa.binary()),
        })

    # newest fetch first, stale second: two blocks, identical url lists
    ds = rd.from_arrow([fetch_table(1), fetch_table(0)])
    run_dir, _ = flagship.run_flagship_to_parquet(
        ds, str(tmp_path), num_parts=4, input_path="<fragcollide>",
    )
    table = _read_all(run_dir)
    assert table.num_rows == n
    checked = 0
    for url, text in zip(table["url"].to_pylist(),
                         table["extracted_text"].to_pylist()):
        did = int(url.rsplit("/", 1)[1])
        if did % pages_src.BAD_UTF8_MOD == pages_src.BAD_UTF8_REM:
            continue
        if did % pages_src.EMPTY_MOD == pages_src.EMPTY_REM:
            continue
        assert "rev1" in text, f"stale fetch won for doc {did} — fragment id collided"
        checked += 1
    assert checked > 490


def test_partitioned_dedup_matches_broadcast(ray_session):
    """dedup_pages (broadcast semi-join) and dedup_pages_partitioned
    (hash-part shuffle) agree row-for-row."""
    ds1 = flagship.dedup_pages(pages_src.read_pages(SF))
    ds2 = flagship.dedup_pages_partitioned(pages_src.read_pages(SF), num_parts=8)
    a = ds1.to_pandas().sort_values("url").reset_index(drop=True)
    b = ds2.to_pandas().sort_values("url").reset_index(drop=True)
    assert len(a) == len(b) == 500
    assert (a["url"] == b["url"]).all()
    assert (a["warc_ts"] == b["warc_ts"]).all()
