"""Embedding stage (chunker + fake client + mean pool), LLM extraction
stage (fake client), demographics cleanup ladder, patient predicate."""

import numpy as np
import pyarrow as pa
import pytest

from neurostore_text_extraction_ray.stages.embed import (
    EmbedActor,
    FakeEmbeddingClient,
    chunk_text,
)
from neurostore_text_extraction_ray.stages.llm import (
    FakeLLMClient,
    LLMExtractActor,
    build_prompt,
    clean_groups,
    clean_groups_batch,
    escape_prompt,
    is_patient_study_batch,
)


def test_chunk_text_paragraphs():
    text = "one two three four five six.\n\nshort\n\nseven eight nine ten eleven."
    chunks = chunk_text(text, max_tokens=100, min_tokens=5)
    assert len(chunks) == 2  # 'short' dropped (< 5 tokens)
    assert chunks[0].startswith("one")


def test_chunk_text_long_paragraph_packs_sentences():
    para = " ".join(f"Sentence number {i} has several words in it." for i in range(30))
    chunks = chunk_text(para, max_tokens=40, min_tokens=5)
    assert len(chunks) > 1
    from neurostore_text_extraction_ray.stages.embed import _ntokens

    assert all(_ntokens(c) <= 40 for c in chunks)


def test_fake_embedding_deterministic():
    c = FakeEmbeddingClient(dim=16)
    a = c.embed(["hello world"])
    b = c.embed(["hello world"])
    assert np.allclose(a, b)
    assert a.shape == (1, 16)
    assert abs(np.linalg.norm(a[0]) - 1.0) < 1e-5


def test_embed_actor_batch():
    actor = EmbedActor(dim=8)
    batch = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["alpha beta gamma delta epsilon zeta", ""], pa.string()),
    })
    out = actor(batch)
    assert out.column_names == ["doc_id", "embedding", "n_chunks"]
    assert len(out["embedding"][0].as_py()) == 8
    assert out["n_chunks"][1].as_py() == 0
    assert all(v == 0.0 for v in out["embedding"][1].as_py())


def test_prompt_escaping():
    assert escape_prompt("costs $5") == "costs $$5"
    p = build_prompt("Base.", "text $x")
    assert "Call the extractData function" in p
    assert p.endswith("text $$x")


def test_fake_llm_extracts_groups():
    text = ("We recruited 20 patients with major depression and 25 healthy "
            "controls, mean age of 34.5 years; 12 males and 8 females participated.")
    out = FakeLLMClient().extract(text)
    groups = out["groups"]
    assert len(groups) == 2
    pat = groups[0]
    assert pat["count"] == 20 and pat["group_name"] == "patients"
    assert pat["diagnosis"] == "major depression"
    ctl = groups[1]
    assert ctl["count"] == 25 and ctl["group_name"] is None
    assert pat["age_mean"] == 34.5
    assert pat["male_count"] == 12 and pat["female_count"] == 8
    assert pat["imaging_sample"] == "no"  # no imaging vocabulary


def test_fake_llm_full_field_set():
    text = ("We scanned 14 patients with ptsd, aged 18-65, median age of 41, "
            "mean age of 40.2.")
    (g,) = FakeLLMClient().extract(text)["groups"]
    assert g["age_range"] == "18-65"
    assert g["age_minimum"] == 18.0 and g["age_maximum"] == 65.0
    assert g["age_median"] == 41.0
    assert g["imaging_sample"] == "yes"
    from neurostore_text_extraction_ray.stages.llm import GROUP_FIELDS

    assert list(g.keys()) == [c for c, _ in GROUP_FIELDS]


def test_group_field_set_matches_reference_golden():
    """The 12-field GroupImaging set and its order match the
    reference's committed golden results.json exactly."""
    import glob
    import json
    import os

    from neurostore_text_extraction_ray.stages.llm import GROUP_FIELDS

    pats = glob.glob(
        "/root/reference/evaluation/results/*/ParticipantDemographicsExtractor"
        "/*/*/*/results.json"
    )
    if not pats:
        pytest.skip("reference goldens unavailable")
    golden = json.load(open(pats[0]))
    keys = list(golden["groups"][0].keys())
    assert [c for c, _ in GROUP_FIELDS] == keys


def test_pydantic_mirror_validates_golden():
    """Our BaseDemographicsSchema accepts the reference's own golden
    output records."""
    import glob
    import json

    from neurostore_text_extraction_ray.stages.llm import BaseDemographicsSchema

    pats = sorted(glob.glob(
        "/root/reference/evaluation/results/*/ParticipantDemographicsExtractor"
        "/*/*/*/results.json"
    ))
    if not pats:
        pytest.skip("reference goldens unavailable")
    n = 0
    for p in pats:
        rec = json.load(open(p))
        # the goldens carry the literal string "null" for some
        # age_range values (an upstream LLM quirk, kept verbatim)
        BaseDemographicsSchema.model_validate(rec)
        n += 1
    assert n >= 1


def test_raw_iff_different():
    from neurostore_text_extraction_ray.stages.llm import (
        GROUPS_TYPE, raw_iff_different_batch)

    changed = [{"count": 5.0, "diagnosis": None, "group_name": "patients",
                "subgroup_name": None, "male_count": None, "female_count": None,
                "age_mean": None, "age_range": None, "age_minimum": None,
                "age_maximum": None, "age_median": None, "imaging_sample": "no"}]
    cleaned = [dict(changed[0], group_name="healthy")]
    batch = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "groups_raw": pa.array([changed, cleaned], GROUPS_TYPE),
        "groups": pa.array([cleaned, cleaned], GROUPS_TYPE),
    })
    out = raw_iff_different_batch(batch)
    raws = out["groups_raw"].to_pylist()
    assert raws[0] is not None  # ladder changed it -> raw kept
    assert raws[1] is None      # identical -> raw dropped


def test_llm_actor_batch():
    actor = LLMExtractActor()
    batch = pa.table({
        "doc_id": pa.array([7], pa.int64()),
        "text": pa.array(["A study of 15 patients with anxiety."], pa.string()),
    })
    out = actor(batch)
    groups = out["groups"][0].as_py()
    assert groups[0]["count"] == 15.0


def test_clean_groups_ladder():
    raw = [
        # null count -> dropped
        {"count": None, "group_name": "patients", "diagnosis": "MDD"},
        # patients without diagnosis -> healthy
        {"count": 10.0, "group_name": "patients", "diagnosis": None},
        # male imputed from count - female, clipped
        {"count": 20.0, "group_name": "patients", "diagnosis": "MDD",
         "female_count": 8.0},
        # female imputed; negative clip on count
        {"count": -3.0, "group_name": None, "male_count": 2.0},
    ]
    out = clean_groups(raw)
    assert len(out) == 3
    assert out[0]["group_name"] == "healthy"
    assert out[1]["male_count"] == 12.0
    assert out[2]["count"] == 0.0
    assert out[2]["group_name"] == "healthy"
    assert out[2]["female_count"] == 0.0  # 0 - 2 clipped to 0
    assert out[0]["diagnosis"] is None


def test_clean_groups_empty():
    assert clean_groups([]) == []


def test_patient_predicate_batch():
    from neurostore_text_extraction_ray.stages.llm import GROUPS_TYPE

    batch = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "groups": pa.array(
            [
                [{"count": 5.0, "diagnosis": "x", "group_name": "patients",
                  "subgroup_name": None, "male_count": None,
                  "female_count": None, "age_mean": None}],
                [],
            ],
            GROUPS_TYPE,
        ),
    })
    out = is_patient_study_batch(batch)
    assert out["is_patient_study"].to_pylist() == [True, False]


def test_pipeline_llm_to_clean_to_predicate(ray_session):
    """Dependency-chained run shape (SURVEY §3.2): LLM extraction ->
    cleanup -> downstream predicate, all as Dataset stages."""
    import ray.data as rd

    ds = rd.from_items([
        {"doc_id": 1, "text": "Study of 30 patients with schizophrenia and 30 controls."},
        {"doc_id": 2, "text": "No demographics mentioned here."},
    ])
    out = (
        ds.map_batches(LLMExtractActor, batch_format="pyarrow", concurrency=1)
        .map_batches(clean_groups_batch, batch_format="pyarrow")
        .map_batches(is_patient_study_batch, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
    )
    assert list(out["is_patient_study"]) == [True, False]
