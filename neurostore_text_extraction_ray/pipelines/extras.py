"""Query-only pipelines (SURVEY coverage beyond the core operator
library in ``steps.py``): flagship wrappers, rows-only operators, and
modality-specific end-to-end extractions. Each takes ``sf_dir`` and
returns a lazy Dataset; all are registered for the CLI."""

from __future__ import annotations

import json

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _canon_json(value) -> str:
    """Canonical JSON for nested (list<struct>) query outputs so the
    driver's value-hash compare sees a plain string column on both the
    Ray side and the pinned-golden oracle side."""
    return json.dumps(value, sort_keys=True, separators=(",", ":"))


def _vec_hex(vec) -> str:
    """Exact (bit-level) serialization of a float32 vector — avoids any
    float-repr ambiguity in the compare."""
    import numpy as np_

    return np_.asarray(vec, dtype=np_.float32).tobytes().hex()


def _flagship(sf_dir: str):
    """pages synthesis -> groupby-url dedup -> extract actor pool ->
    (url, extracted_text) for cleanly extracted rows."""
    from . import flagship
    from ..sources import pages as pages_src

    ds = flagship.flagship_dataset(
        pages_src.read_pages(sf_dir),
        winners_ds=pages_src.read_pages_keys(sf_dir),
    )

    def ok_rows(batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.equal(batch["parse_failed"], False), pc.equal(batch["empty"], False)
        )
        return batch.filter(mask).select(["url", "extracted_text"])

    return ds.map_batches(ok_rows, batch_format="pyarrow")


def _flagship_titles(sf_dir: str):
    """M11 text-source projection: struct-field projection of the
    extracted metadata (title) — pc.struct_field over the flagship
    output."""
    from . import flagship
    from ..sources import pages as pages_src

    ds = flagship.flagship_dataset(
        pages_src.read_pages(sf_dir),
        winners_ds=pages_src.read_pages_keys(sf_dir),
    )

    def project(batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.equal(batch["parse_failed"], False), pc.equal(batch["empty"], False)
        )
        sub = batch.filter(mask)
        return pa.table({
            "url": sub["url"],
            "title": pc.struct_field(sub["metadata"], "title"),
        })

    return ds.map_batches(project, batch_format="pyarrow")


def _docs_langid_quality(sf_dir: str):
    """Language-ID + quality scoring actor stage over documents
    (rows-only: heuristic kernels are not SQL-expressible)."""
    import pandas as pd_
    import ray.data as rd

    from ..functions.textstats import (
        lang_id, quality_features)

    def f(df: pd_.DataFrame) -> pd_.DataFrame:
        out = pd_.DataFrame()
        out["doc_id"] = df["doc_id"]
        li = df["text"].map(lambda t: lang_id(t))
        out["lang_pred"] = li.map(lambda x: x[0])
        out["lang_conf"] = li.map(lambda x: x[1])
        out["quality_score"] = df["text"].map(
            lambda t: quality_features(t)["quality_score"])
        return out

    return rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"]).map_batches(
        f, batch_format="pandas")


def _docs_fingerprint(sf_dir: str):
    import pandas as pd_
    import ray.data as rd

    from ..functions.textstats import fingerprint64

    def f(df: pd_.DataFrame) -> pd_.DataFrame:
        out = pd_.DataFrame()
        out["doc_id"] = df["doc_id"]
        out["fingerprint"] = df["text"].map(lambda t: fingerprint64(t) >> 1).astype("int64")
        return out

    return rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"]).map_batches(
        f, batch_format="pandas")


def _minhash_groups(sf_dir: str):
    import ray.data as rd

    from ..stages.dedup import minhash_near_dup

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return minhash_near_dup(docs, threshold=0.7, bands=16)


def _simhash_groups(sf_dir: str):
    import ray.data as rd

    from ..stages.dedup import simhash_near_dup

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return simhash_near_dup(docs, hamming_threshold=3)


def _embed_documents(sf_dir: str):
    import ray.data as rd

    from ..stages.embed import embed_documents

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ds = embed_documents(docs, dim=32, concurrency=2)

    def ser(batch: pa.Table) -> pa.Table:
        # bit-exact hex serialization of the vector for the golden
        # oracle compare; library users get the native fixed-size-list
        # from stages/embed.py
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_chunks": batch["n_chunks"],
            "embedding_hex": pa.array(
                [_vec_hex(v) for v in batch["embedding"].to_pylist()], pa.string()),
        })

    return ds.map_batches(ser, batch_format="pyarrow")


def _llm_demographics(sf_dir: str):
    import ray.data as rd

    from ..stages.llm import (
        LLMExtractActor, clean_groups_batch, is_patient_study_batch,
        raw_iff_different_batch)

    import pyarrow as pa_

    def keep_raw(batch: pa_.Table) -> pa_.Table:
        return batch.append_column("groups_raw", batch["groups"])

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ds = (
        docs.map_batches(LLMExtractActor, batch_format="pyarrow", concurrency=2)
        .map_batches(keep_raw, batch_format="pyarrow")
        .map_batches(clean_groups_batch, batch_format="pyarrow")
        # S5 parity: raw retained ONLY when the ladder changed it
        # (utils.py:309-342 writes raw_results iff different)
        .map_batches(raw_iff_different_batch, batch_format="pyarrow")
        .map_batches(is_patient_study_batch, batch_format="pyarrow")
    )

    def ser(batch: pa.Table) -> pa.Table:
        # canonical-JSON the nested group structs for the golden oracle
        return pa.table({
            "doc_id": batch["doc_id"],
            "groups_json": pa.array(
                [_canon_json(g) for g in batch["groups"].to_pylist()], pa.string()),
            "groups_raw_json": pa.array(
                [_canon_json(g) for g in batch["groups_raw"].to_pylist()], pa.string()),
            "is_patient_study": batch["is_patient_study"],
        })

    return ds.map_batches(ser, batch_format="pyarrow")


def _abbrev_expand(sf_dir: str):
    """M7/M8 as a pipeline: detect abbreviations in each document and
    expand them in its own text (rows-only; Schwartz-Hearst kernel)."""
    import pandas as pd_
    import ray.data as rd

    from ..functions.normalize import (
        detect_abbreviations, resolve_abbreviations)

    def f(df: pd_.DataFrame) -> pd_.DataFrame:
        out = pd_.DataFrame()
        out["doc_id"] = df["doc_id"]
        abbrevs = df["text"].map(lambda t: detect_abbreviations(t or ""))
        out["n_abbreviations"] = abbrevs.map(len).astype("int64")
        out["expanded_text"] = [
            resolve_abbreviations(t, a) for t, a in zip(df["text"], abbrevs)
        ]
        return out

    return rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"]).map_batches(
        f, batch_format="pandas")


def _entity_linking(sf_dir: str):
    """Demographics extraction -> candidate entity linking (T4/K1
    chain; rows-only)."""
    import ray.data as rd

    from ..stages.linker import LinkActor
    from ..stages.llm import (
        LLMExtractActor, clean_groups_batch)

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    # autoscaling (1,2) pools: two fixed pools of 2 actors each deadlock
    # a 4-CPU cluster (all CPUs pinned by actors, none left for the
    # read/serialize tasks feeding them)
    ds = (
        docs.map_batches(LLMExtractActor, batch_format="pyarrow", concurrency=(1, 2))
        .map_batches(clean_groups_batch, batch_format="pyarrow")
        .map_batches(LinkActor, batch_format="pyarrow", concurrency=(1, 2))
    )

    def ser(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch["doc_id"],
            "entities_json": pa.array(
                [_canon_json(v) for v in batch["entities"].to_pylist()], pa.string()),
        })

    return ds.map_batches(ser, batch_format="pyarrow")


def _knn_ivf(sf_dir: str):
    import duckdb
    import numpy as np_
    import ray.data as rd

    from ..stages.similarity import knn_ivf

    con = duckdb.connect()
    q = con.execute(
        f"SELECT vec_id, embedding FROM read_parquet('{sf_dir}/embeddings.parquet') "
        f"WHERE vec_id < 3 ORDER BY vec_id").fetchall()
    con.close()
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    # Correctness-gate config: n_probe == n_cells makes IVF exhaustive,
    # so the result provably equals exact brute-force top-k and shares
    # its SQL oracle; approximate recall at n_probe < n_cells is
    # covered by tests/test_dedup_similarity.py.
    return knn_ivf(ds, np_.array([r[1] for r in q]), [r[0] for r in q],
                   k=10, n_cells=8, n_probe=8)


def _pdf_extract_text(sf_dir: str):
    """PDF layout-block e2e with a BYTE-EXACT SQL oracle: one-page PDFs
    synthesized from documents -> pure-python PDF parser -> reading-
    order text."""
    import pyarrow as pa_

    from . import flagship
    from ..sources import pages as pages_src

    ds = flagship.extract_pages(
        pages_src.read_pages_pdf(sf_dir), payload_column="pdf", mode="auto",
        concurrency=2, batch_size=128,
    )

    def project(batch: pa_.Table) -> pa_.Table:
        return batch.select(["url", "extracted_text"])

    return ds.map_batches(project, batch_format="pyarrow")


def _jats_extract_text(sf_dir: str):
    """JATS e2e with a BYTE-EXACT SQL oracle: xml pages synthesized
    from documents -> JATS renderer -> (url, extracted_text)."""
    import pyarrow as pa_

    from . import flagship
    from ..sources import pages as pages_src

    ds = flagship.extract_pages(
        pages_src.read_pages_xml(sf_dir), payload_column="xml", mode="jats",
        concurrency=2, batch_size=128,
    )

    def project(batch: pa_.Table) -> pa_.Table:
        return batch.select(["url", "extracted_text"])

    return ds.map_batches(project, batch_format="pyarrow")


def _extract_jats(sf_dir: str):
    """JATS variant of the flagship (pubget path): xml pages -> extract
    with section spans."""
    import pyarrow as pa_

    from . import flagship
    from ..sources import pages as pages_src

    ds = flagship.extract_pages(
        pages_src.read_pages_xml(sf_dir), payload_column="xml", mode="jats",
        concurrency=2, batch_size=128,
    )

    def project(batch: pa_.Table) -> pa_.Table:
        spans = batch["spans"].to_pylist()
        return pa_.table({
            "url": batch["url"],
            "n_chars": pa_.array(
                [len(t or "") for t in batch["extracted_text"].to_pylist()],
                pa_.int64()),
            "n_spans": pa_.array([len(s) for s in spans], pa_.int64()),
        })

    return ds.map_batches(project, batch_format="pyarrow")


def _llm_task_metadata(sf_dir: str):
    """T2 second flagship pipeline: TaskExtractor analog
    (nv_task/model.py:9-13, schemas.py:6-156) — study modality,
    objective, exclusion, fMRI/behavioral task metadata, validated
    against the pydantic mirror (valid column; rows never dropped)."""
    import ray.data as rd

    from ..stages.task import task_metadata_pipeline

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ds = task_metadata_pipeline(docs, concurrency=(1, 2))

    def ser(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch["doc_id"],
            "study_metadata_json": pa.array(
                [_canon_json(r) for r in batch["study_metadata"].to_pylist()],
                pa.string()),
            "valid": batch["valid"],
        })

    return ds.map_batches(ser, batch_format="pyarrow")


def _multimodal_features(sf_dir: str):
    """Multimodal actor-pool stage over a deterministic synthetic media
    table (decode -> feature extract; stubbed codec, real plumbing)."""
    import ray.data as rd

    from ..stages.multimodal import (
        FeatureActor, media_table)

    ds = rd.from_arrow(media_table(240, size_bytes=2048))
    feats = ds.map_batches(
        FeatureActor, fn_constructor_kwargs={"dim": 16},
        batch_format="pyarrow", batch_size=32, concurrency=2,
    )

    def ser(batch: pa.Table) -> pa.Table:
        return pa.table({
            "media_id": batch["media_id"],
            "kind": batch["kind"],
            "feature_hex": pa.array(
                [_vec_hex(v) for v in batch["feature"].to_pylist()], pa.string()),
        })

    return feats.map_batches(ser, batch_format="pyarrow")


PLANTED_LONG = "functional magnetic resonance imaging"
PLANTED_SHORT = "fMRI"


def planted_abbrev_text(doc_id: int) -> str:
    """Deterministic per-doc text with a planted Schwartz-Hearst
    ``long form (SF)`` definition (docs with doc_id %% 3 == 0 get no
    definition — negative path). The expansion result is a pure string
    function of doc_id, so the oracle is plain ANSI SQL."""
    if doc_id % 3 == 0:
        return f"Study {doc_id} reports baseline results with no definitions."
    return (
        f"Participants in study {doc_id} underwent {PLANTED_LONG} "
        f"({PLANTED_SHORT}) screening. The {PLANTED_SHORT} findings for "
        f"study {doc_id} were stable."
    )


def _abbrev_expand_planted(sf_dir: str):
    """M7/M8 with a REAL SQL oracle: the Schwartz-Hearst detector and
    expander run on planted-pattern text whose expansion is an exact
    SQL-expressible function of doc_id (VERDICT r01 next-round #1a)."""
    import pandas as pd_
    import ray.data as rd

    from ..functions.normalize import (
        detect_abbreviations, resolve_abbreviations)

    def f(df: pd_.DataFrame) -> pd_.DataFrame:
        out = pd_.DataFrame()
        out["doc_id"] = df["doc_id"]
        texts = [planted_abbrev_text(int(d)) for d in df["doc_id"]]
        abbrevs = [detect_abbreviations(t) for t in texts]
        out["n_abbreviations"] = pd_.Series(
            [len(a) for a in abbrevs], index=df.index).astype("int64")
        out["expanded_text"] = [
            resolve_abbreviations(t, a) for t, a in zip(texts, abbrevs)
        ]
        return out

    return rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"]).map_batches(
        f, batch_format="pandas")


