"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship extraction pipeline on sf0.001;
``queries()`` exposes each implemented operator from SURVEY.md §2 as a
callable over an ``sf_dir``; ``oracle_sql()`` gives the DuckDB
equivalent (same column names) for the value-hash correctness gate.

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init`` / ``ray.shutdown`` here or in the library code.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _flagship(sf_dir: str):
    """pages synthesis -> groupby-url dedup -> extract actor pool ->
    (url, extracted_text) for cleanly extracted rows."""
    from neurostore_text_extraction_ray.pipelines import flagship
    from neurostore_text_extraction_ray.sources import pages as pages_src

    ds = flagship.flagship_dataset(pages_src.read_pages(sf_dir))

    def ok_rows(batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.equal(batch["parse_failed"], False), pc.equal(batch["empty"], False)
        )
        return batch.filter(mask).select(["url", "extracted_text"])

    return ds.map_batches(ok_rows, batch_format="pyarrow")


def _round_cols(ds, spec: dict[str, int]):
    def r(df: pd.DataFrame) -> pd.DataFrame:
        for col, nd in spec.items():
            df[col] = df[col].round(nd)
        return df

    return ds.map_batches(r, batch_format="pandas")


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001."""
    return _flagship("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from neurostore_text_extraction_ray.pipelines import steps

    return {
        "flagship_extract": _flagship,
        "word_count": steps.word_count,
        "word_deviance": steps.word_deviance,
        "tfidf": lambda sf: _round_cols(steps.tfidf(sf), {"score": 6}),
        "docs_en_quality": steps.docs_en_quality,
        "docs_join_embeddings": steps.docs_join_embeddings,
        "filter_unprocessed": steps.filter_unprocessed,
        "dedup_exact": steps.dedup_exact,
        "normalize_part_names": steps.normalize_part_names,
        "lineitem_agg": lambda sf: _round_cols(
            steps.lineitem_agg(sf), {"sum_qty": 4, "sum_revenue": 4, "avg_disc": 6}
        ),
        "events_hourly": lambda sf: _round_cols(
            steps.events_hourly(sf), {"sum_value": 6}
        ),
    }


def oracle_sql() -> dict[str, str]:
    wc = (
        "SELECT doc_id, CASE WHEN trim(text) = '' THEN 0 "
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS word_count "
        "FROM documents"
    )
    return {
        "flagship_extract": (
            "SELECT 'https://corpus.example.org/doc/' || doc_id AS url, "
            "'Doc ' || doc_id || 'Doc ' || doc_id || ' rev' || "
            "(CASE WHEN doc_id % 10 = 0 THEN 1 ELSE 0 END) || chr(10) || text || chr(10) "
            "AS extracted_text FROM documents "
            "WHERE doc_id % 101 <> 3 AND doc_id % 97 <> 5"
        ),
        "word_count": wc,
        "word_deviance": (
            f"WITH wc AS ({wc}) "
            "SELECT doc_id, CAST(abs(word_count - "
            "(SELECT CAST(sum(word_count) AS BIGINT) // count(*) FROM wc)) AS BIGINT) "
            "AS word_deviance FROM wc"
        ),
        "tfidf": (
            "WITH tok AS ("
            "  SELECT doc_id, t AS term, count(*) AS tf FROM ("
            "    SELECT doc_id, unnest(regexp_extract_all(lower(text), '\\w\\w+')) AS t"
            "    FROM documents) GROUP BY doc_id, t"
            "), df AS (SELECT term, count(*) AS df FROM tok GROUP BY term), "
            "n AS (SELECT count(*) AS n FROM documents), "
            "idf AS (SELECT term, ln((1 + n.n) / (1 + df.df)) + 1.0 AS idf "
            "        FROM df, n WHERE df.df >= 2), "
            "scored AS (SELECT t.doc_id, t.term, t.tf * i.idf AS raw "
            "           FROM tok t JOIN idf i USING (term)), "
            "nrm AS (SELECT doc_id, sqrt(sum(raw*raw)) AS nrm FROM scored GROUP BY doc_id) "
            "SELECT s.doc_id, s.term, round(s.raw / nr.nrm, 6) AS score "
            "FROM scored s JOIN nrm nr USING (doc_id)"
        ),
        "docs_en_quality": (
            "SELECT doc_id, source, n_chars, "
            "CAST(CASE WHEN trim(text) = '' THEN 0 "
            "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS n_words "
            "FROM documents WHERE lang = 'en'"
        ),
        "docs_join_embeddings": (
            "SELECT d.doc_id, d.lang, d.n_chars, e.label "
            "FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id"
        ),
        "filter_unprocessed": (
            "SELECT doc_id, lang, n_chars FROM documents "
            "WHERE doc_id NOT IN (SELECT vec_id FROM embeddings WHERE label = 0)"
        ),
        "dedup_exact": (
            "SELECT min(doc_id) AS doc_id, min(n_chars) AS n_chars "
            "FROM documents GROUP BY text"
        ),
        "normalize_part_names": (
            "SELECT p_partkey, array_to_string(list_transform("
            "string_split(trim(p_name), ' '), "
            "x -> upper(substr(x, 1, 1)) || lower(substr(x, 2))), ' ') "
            "AS p_name_normalized FROM part"
        ),
        "lineitem_agg": (
            "SELECT l_returnflag, l_linestatus, "
            "round(sum(l_quantity), 4) AS sum_qty, "
            "round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_revenue, "
            "round(avg(l_discount), 6) AS avg_disc, "
            "count(*) AS n_rows "
            "FROM lineitem GROUP BY l_returnflag, l_linestatus"
        ),
        "events_hourly": (
            "SELECT event_type, date_trunc('hour', ts) AS hour, "
            "count(*) AS n_events, round(sum(value), 6) AS sum_value "
            "FROM events GROUP BY event_type, date_trunc('hour', ts)"
        ),
    }
