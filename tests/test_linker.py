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


# -- Positional linking (umls_disease/model.py:214-319 parity) --------------


def test_resolve_mention_expands():
    from neurostore_text_extraction_ray.functions.normalize import (
        detect_abbreviations)
    from neurostore_text_extraction_ray.stages.linker import resolve_mention

    text = "Patients with major depressive disorder (MDD) were scanned."
    abbrevs = detect_abbreviations(text)
    assert resolve_mention("MDD", abbrevs) == "major depressive disorder"
    # unknown short form passes through
    assert resolve_mention("XYZ", abbrevs) == "XYZ"


def test_resolve_mention_positional_window():
    """Windowed expansion: only abbreviations whose short-form span
    lies inside (start_char, end_char) apply."""
    from neurostore_text_extraction_ray.functions.normalize import (
        detect_abbreviations)
    from neurostore_text_extraction_ray.stages.linker import resolve_mention

    text = "major depressive disorder (MDD) and post-traumatic stress disorder (PTSD)."
    abbrevs = detect_abbreviations(text)
    assert len(abbrevs) == 2
    mdd = next(a for a in abbrevs if a["short_text"] == "MDD")
    # window covering only the MDD span: PTSD must NOT expand
    out = resolve_mention("MDD PTSD", abbrevs,
                          start_char=mdd["short_start"], end_char=mdd["short_end"])
    assert out == "major depressive disorder PTSD"
    # no window: both expand
    out2 = resolve_mention("MDD PTSD", abbrevs)
    assert "post-traumatic stress disorder" in out2


def test_positional_link_actor_abbreviation_aware():
    from neurostore_text_extraction_ray.stages.linker import (
        PositionalLinkActor)

    text = ("Participants with major depressive disorder (MDD) were "
            "recruited; 20 patients with MDD underwent scanning.")
    batch = pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array([text], pa.string()),
        "groups": pa.array(
            [[{"count": 20.0, "diagnosis": "MDD", "group_name": "patients",
               "subgroup_name": None, "male_count": None, "female_count": None,
               "age_mean": None, "age_range": None, "age_minimum": None,
               "age_maximum": None, "age_median": None, "imaging_sample": "yes"}]],
            GROUPS_TYPE),
    })
    out = PositionalLinkActor()(batch)
    (rows,) = out["linked_groups"].to_pylist()
    assert len(rows) == 1
    g = rows[0]
    assert g["diagnosis"] == "major depressive disorder"  # mention expanded
    assert g["umls_entities"][0]["umls_cui"] == "C0011570"
    assert g["group_ix"] == 0 and g["count"] == 20.0
    assert g["pmid"] == 0 and g["start_char"] is None


def test_positional_link_actor_drops_entityless_groups():
    from neurostore_text_extraction_ray.stages.linker import (
        PositionalLinkActor)

    batch = pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array(["no abbreviations here"], pa.string()),
        "groups": pa.array(
            [[{"count": 5.0, "diagnosis": "completely unrelated banana phrase",
               "group_name": "patients", "subgroup_name": None,
               "male_count": None, "female_count": None, "age_mean": None,
               "age_range": None, "age_minimum": None, "age_maximum": None,
               "age_median": None, "imaging_sample": "no"},
              {"count": 3.0, "diagnosis": None, "group_name": "healthy",
               "subgroup_name": None, "male_count": None, "female_count": None,
               "age_mean": None, "age_range": None, "age_minimum": None,
               "age_maximum": None, "age_median": None, "imaging_sample": "no"}]],
            GROUPS_TYPE),
    })
    out = PositionalLinkActor()(batch)
    assert out["linked_groups"].to_pylist() == [[]]  # model.py:306-317
