"""Local replica of the driver's correctness gate: run every
``queries()`` entry and its ``oracle_sql()`` side by side at sf0.001,
compare row counts and order-insensitive values (columns sorted by
name, rows sorted by all columns)."""

import os

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

pytestmark = pytest.mark.skipif(not os.path.isdir(SF), reason="testdata unavailable")


def _oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    df = con.execute(sql).fetchdf()
    con.close()
    return df


def _to_pandas(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    if hasattr(result, "to_pandas"):
        return result.to_pandas()
    raise TypeError(type(result))


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def _pairs():
    import __ray_entry__ as e

    qs = e.queries()
    sqls = e.oracle_sql()
    return [(name, qs[name], sqls.get(name)) for name in qs]


@pytest.mark.parametrize("name", [
    "flagship_extract", "flagship_titles", "word_count", "word_deviance", "tfidf",
    "tfidf_vocab",
    "docs_en_quality", "docs_join_embeddings", "filter_unprocessed",
    "dedup_exact", "docs_slice", "docs_sample_hash",
    "docs_sample_stratified", "docs_sample_weighted",
    "docs_nchars_quantiles", "docs_nchars_quantiles_sampled",
    "docs_pack_shards",
    "top_terms", "top_terms_cms",
    "top_docs_per_lang",
    "orders_custkey_hll", "lineitem_orders_semijoin",
    "normalize_part_names", "lineitem_agg", "events_hourly",
    "events_sessionize", "events_asof_orders", "events_rolling_count",
    "knn_embeddings",
    "docs_text_features", "docs_repetition_stats",
    "revenue_by_nation", "distinct_langs",
    "top_docs_by_length", "jats_extract_text", "pdf_extract_text",
    # round-2 additions: re-expressed SQL + pinned-golden oracles
    "docs_langid_quality", "docs_fingerprint", "docs_token_count",
    "minhash_dedup_groups", "minhash_dedup_incremental",
    "simhash_dedup_groups", "simhash_dedup_incremental",
    "docs_decontaminate", "docs_line_dedup", "docs_pii_redact",
    "docs_url_filter", "docs_normalize_text", "docs_training_mix",
    "ngram_jaccard_dups",
    "embedding_cosine_dups", "embed_documents", "llm_demographics",
    "llm_task_metadata", "entity_linking", "entity_linking_chained",
    "umls_disease_groups", "abbrev_expand", "abbrev_expand_planted",
    "knn_ivf", "extract_jats_pages", "multimodal_features",
    # round-4 additions: clustering / semantic dedup / LSH-ANN / urls
    "knn_lsh", "embeddings_kmeans", "embeddings_semdedup",
    "docs_url_canonicalize", "docs_lang_temperature_sample",
    "docs_dup_spans",
    "docs_domain_stats", "docs_domain_filter", "docs_rank_by_length",
    "docs_outlinks", "host_indegree", "docs_quality_buckets",
    # round-5 additions
    "evaluation_golden_metrics", "docs_domain_cap",
    "docs_outlinks_anchored", "warc_source_roundtrip",
    "docs_robots_filter", "warc_extract_text",
    "docs_chunk_windows", "docs_lm_score", "docs_bloom_seen",
    "term_postings", "docs_split_assign", "host_pagerank",
    "docs_nb_quality", "docs_char_entropy", "docs_compression_ratio",
    "docs_gopher_rules", "docs_c4_rules", "docs_pack_sequences",
    "docs_bpe_merges", "docs_bpe_encode", "docs_importance_weights",
    "docs_importance_weights_hashed", "docs_winnow_fingerprints",
    "corpus_stats", "embeddings_label_centroids", "events_hourly_top",
    "docs_boilerplate_strip", "docs_diff_planted", "docs_bm25",
    "docs_domain_percentile_filter", "host_anchor_topk",
    "events_user_hll_hourly", "lineitem_rollup", "customer_order_counts",
    "host_components", "docs_lang_quantiles", "events_user_retention",
    "events_range_join", "events_user_running_total",
    "part_name_fuzzy_pairs", "events_funnel", "docs_pmi_bigrams",
    "lineitem_cube", "docs_nchars_quantiles_cont", "docs_lang_corr",
    "events_global_rolling_sum", "events_user_top_type",
    "docs_lang_bucket_pivot",
])
def test_query_matches_oracle(name, ray_session):
    import __ray_entry__ as e

    fn = e.queries()[name]
    sql = e.oracle_sql().get(name)
    mine = _canon(_to_pandas(fn(SF)))
    assert sql is not None, f"{name} lacks an oracle"
    gold = _canon(_oracle(sql))
    assert list(mine.columns) == list(gold.columns), (
        name, list(mine.columns), list(gold.columns))
    assert len(mine) == len(gold), (name, len(mine), len(gold))
    # numeric columns: exact after the declared rounding; compare values
    for c in mine.columns:
        mf = pd.api.types.is_float_dtype(mine[c])
        gf = pd.api.types.is_float_dtype(gold[c])
        # an int-vs-float dtype split (e.g. a DuckDB HUGEINT window sum
        # surfacing as float64) can hash-mismatch on the driver even
        # when values agree — BIGINT-cast the SQL side (repo rule).
        # NULL-driven promotion (pandas int columns with NaN) is exempt.
        if mf != gf and not (mine[c].isna().any() or gold[c].isna().any()):
            raise AssertionError(
                f"{name}.{c}: dtype split {mine[c].dtype} vs {gold[c].dtype}"
                " — cast the oracle SQL (BIGINT/DOUBLE) to match")
        if mf or gf:
            pd.testing.assert_series_equal(
                mine[c].astype(float), gold[c].astype(float),
                check_names=False, rtol=0, atol=1e-9, obj=f"{name}.{c}",
            )
        else:
            assert (mine[c].to_numpy() == gold[c].to_numpy()).all(), f"{name}.{c}"


def test_entry_smoke(ray_session):
    import __ray_entry__ as e

    ds = e.entry()
    df = _to_pandas(ds)
    assert len(df) > 0
    assert set(df.columns) == {"url", "extracted_text"}


def test_tfidf_options(ray_session):
    """Reference tfidf options (tfidf/model.py:29-79): custom_terms
    restricts the vocabulary WITHOUT min_df; text_type='abstract'
    scores only the abstract projection."""
    from neurostore_text_extraction_ray.pipelines import steps

    # 'zzzyx' never occurs; 'the' has df >> 2; a vocab ignores min_df
    vocab = steps.tfidf(SF, min_df=10**9,
                        custom_terms=["the", "zzzyx"]).to_pandas()
    assert set(vocab["term"]) == {"the"}  # min_df NOT applied to vocab
    assert (vocab["score"] > 0).all()
    # a vocabulary fully disjoint from the corpus yields empty, not an error
    assert len(steps.tfidf(SF, custom_terms=["zzzyx"]).to_pandas()) == 0
    # vocabulary dict form == custom_terms form
    vocab2 = steps.tfidf(SF, vocabulary={"the": 0, "zzzyx": 1}).to_pandas()
    pd.testing.assert_frame_equal(
        vocab.sort_values(["doc_id", "term"]).reset_index(drop=True),
        vocab2.sort_values(["doc_id", "term"]).reset_index(drop=True))
    # abstract projection scores a subset of the full-text corpus terms
    ab = steps.tfidf(SF, text_type="abstract", min_df=2).to_pandas()
    full = steps.tfidf(SF, min_df=2).to_pandas()
    assert 0 < len(ab) < len(full)
    with pytest.raises(ValueError):
        steps.tfidf(SF, text_type="nope")


def test_topk_rows_null_group_kept():
    """NULL group keys form their own partition (SQL PARTITION BY
    semantics), not dropped — code-review r03b finding."""
    import numpy as np

    from neurostore_text_extraction_ray.pipelines.steps import _topk_rows

    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "lang": ["en", None, None, "en"],
        "n_chars": [10, 20, 5, 30],
    })
    out = _topk_rows(df, 1, "lang")
    assert len(out) == 2  # one per group incl. the NULL group
    assert set(out["doc_id"]) == {4, 2}
