"""Edge-shape checks for the page-quality rule operators
(docs_gopher_rules / docs_c4_rules) against DuckDB on an adversarial
synthetic corpus — None/empty text, boundary word counts, symbol-heavy
and stopword-free docs, quote-terminated lines — plus direct kernel
unit checks. The sf corpora only exercise the happy paths."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from neurostore_text_extraction_ray.pipelines.steps import _gopher_frame


@pytest.fixture(scope="module")
def synth_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("qualrules")
    texts = [
        None,                                     # 0: null page
        "",                                       # 1: empty page
        "### ### ### #!",                         # 2: symbol soup
        "the and that have with of to be " * 8,   # 3: all stopwords, 64 words
        " ".join("w%d" % i for i in range(50)),   # 4: exactly min words, no stops
        ("the quick brown fox jumps over and over that lazy dog "
         "with plenty of words to clear the minimum bound ") * 2,  # 5: healthy
        "a " * 120,                               # 6: mean word len 1 (<3)
        "... ... ...... the of",                  # 7: ellipsis runs
        "tok " * 49,                              # 8: one under min words
        "supercalifragilisticexpialidocious " * 60,  # 9: mean len > 10
    ]
    n = len(texts) * 8  # spread doc_id residues for the C4 plant
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "lang": pa.array(["en"] * n),
        "n_chars": pa.array(
            np.array([len(t or "") for t in texts * 8], dtype=np.int64)),
        "text": pa.array([texts[i % len(texts)] for i in range(n)],
                         pa.string()),
    })
    pq.write_table(tbl, os.path.join(str(d), "documents.parquet"))
    return str(d)


def _oracle(synth_dir, sql):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{synth_dir}/documents.parquet')")
    df = con.execute(sql).fetchdf()
    con.close()
    return df


def _canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object and isinstance(
                df[c].dropna().iloc[0] if len(df[c].dropna()) else "", bool):
            df[c] = df[c].astype(bool)
    return (df.sort_values("doc_id", kind="stable")
              .reset_index(drop=True))


def test_gopher_kernel_edges():
    df = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": [None, "", "# " * 60 + "the of words here",
                 "the of " + "word " * 48],
    })
    out = _gopher_frame(df)
    # null/empty: zero words, all fractions 0, not kept
    assert out.loc[0, "n_words"] == 0 and not out.loc[0, "keep"]
    assert out.loc[1, "n_words"] == 0 and not out.loc[1, "keep"]
    # symbol-heavy: symbol_frac >= 0.1 kills it despite enough words
    assert out.loc[2, "symbol_frac"] >= 0.1 and not out.loc[2, "keep"]
    # 50 words, 2 stopwords, mean len in range: kept
    assert out.loc[3, "n_words"] == 50 and bool(out.loc[3, "keep"])


def test_gopher_rules_matches_oracle(ray_session, synth_dir):
    import __ray_entry__ as e

    got = _canon(e.queries()["docs_gopher_rules"](synth_dir).to_pandas())
    gold = _canon(_oracle(synth_dir, e.oracle_sql()["docs_gopher_rules"]))
    pd.testing.assert_frame_equal(
        got.astype({"keep": bool}), gold.astype({"keep": bool}),
        check_dtype=False)
    # the adversarial corpus must exercise both verdicts
    assert got["keep"].any() and (~got["keep"]).any()


def test_c4_rules_matches_oracle(ray_session, synth_dir):
    import __ray_entry__ as e

    got = _canon(e.queries()["docs_c4_rules"](synth_dir).to_pandas())
    gold = _canon(_oracle(synth_dir, e.oracle_sql()["docs_c4_rules"]))
    pd.testing.assert_frame_equal(
        got.astype({"keep": bool}), gold.astype({"keep": bool}),
        check_dtype=False)
    assert got["keep"].any() and (~got["keep"]).any()
    # line filter really drops lines: nav/short/js lines never survive
    assert (got["n_lines_kept"] <= got["n_lines"]).all()
    assert (got["n_lines_kept"] < got["n_lines"]).any()
    # page rule: any doc_id divisible by 11 or 13 is dropped
    # (lorem-ipsum / brace plants)
    planted_bad = got["doc_id"] % 11 == 0
    assert (~got.loc[planted_bad, "keep"]).all()
    planted_brace = got["doc_id"] % 13 == 0
    assert (~got.loc[planted_brace, "keep"]).all()
