"""Candidate linker (T4/K1): char-ngram TF-IDF index, thresholds,
ranking, actor over demographics groups."""

import pyarrow as pa

from neurostore_text_extraction_ray.stages.linker import (
    CandidateIndex,
    LinkActor,
)
from neurostore_text_extraction_ray.stages.llm import GROUPS_TYPE


def test_exact_alias_tops():
    idx = CandidateIndex()
    c = idx.candidates("schizophrenia")
    assert c[0]["umls_cui"] == "C0036341"
    assert c[0]["umls_prob"] > 0.99
    assert c[0]["high_confidence"]


def test_fuzzy_match_and_threshold():
    idx = CandidateIndex()
    c = idx.candidates("major depresion")  # typo
    assert c and c[0]["umls_cui"] == "C0011570"
    assert 0.5 <= c[0]["umls_prob"] < 0.95
    assert idx.candidates("completely unrelated banana phrase") == []
    assert idx.candidates("") == []


def test_top5_and_dedup_by_cui():
    idx = CandidateIndex()
    c = idx.candidates("disorder")  # matches many aliases
    assert len(c) <= 5
    cuis = [x["umls_cui"] for x in c]
    assert len(cuis) == len(set(cuis))  # one candidate per concept
    probs = [x["umls_prob"] for x in c]
    assert probs == sorted(probs, reverse=True)


def test_link_actor():
    batch = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "groups": pa.array(
            [
                [{"count": 10.0, "diagnosis": "PTSD", "group_name": "patient",
                  "subgroup_name": None, "male_count": None,
                  "female_count": None, "age_mean": None}],
                [],
            ],
            GROUPS_TYPE,
        ),
    })
    out = LinkActor()(batch)
    ents = out["entities"][0].as_py()
    assert ents and ents[0]["umls_cui"] == "C0038436"
    assert ents[0]["mention"] == "PTSD"
    assert out["entities"][1].as_py() == []


def test_pipeline_llm_to_linker(ray_session):
    """Dependency chain parity (SURVEY §3.2): demographics extraction
    feeding the linker, both as actor stages."""
    import ray.data as rd

    from neurostore_text_extraction_ray.stages.llm import LLMExtractActor

    ds = rd.from_items([
        {"doc_id": 1, "text": "We scanned 12 patients with schizophrenia."},
    ])
    out = (
        ds.map_batches(LLMExtractActor, batch_format="pyarrow", concurrency=1)
        .map_batches(LinkActor, batch_format="pyarrow", concurrency=1)
        .take_all()
    )
    assert out[0]["entities"][0]["umls_cui"] == "C0036341"
