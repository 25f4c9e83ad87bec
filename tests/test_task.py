"""TaskExtractor-analog stage (stages/task.py): deterministic fake
client semantics, pydantic schema mirror of nv_task/schemas.py, encode/
decode roundtrip, validation-never-drops, and the actor e2e."""

import pyarrow as pa
import pytest

from neurostore_text_extraction_ray.stages.task import (
    FakeTaskClient,
    StudyMetadataModel,
    TaskExtractActor,
    decode_record,
    task_metadata_pipeline,
)

GONOGO = (
    "We investigated response inhibition using the Go/No-Go Task in an "
    "event-related fMRI design. Participants completed 10 minutes of "
    "scanning. Accuracy and reaction time were recorded. The conditions "
    "were go trials and no-go trials."
)

RESTING = "Participants underwent a resting state fMRI scan lasting 8 minutes."


def test_fake_client_task_study():
    rec = FakeTaskClient().extract(GONOGO)
    StudyMetadataModel.model_validate(rec)
    assert rec["Modality"] == ["fMRI-BOLD"]
    assert rec["StudyObjective"].startswith("We investigated")
    assert rec["Exclude"] is None
    (task,) = rec["fMRITasks"]
    assert task["TaskName"] == "Go/No-Go Task"
    assert task["TaskDesign"] == ["EventRelated"]
    assert task["RestingState"] is False
    assert task["Concepts"] == ["response inhibition"]
    assert task["Domain"] == ["Executive cognitive control"]
    assert task["TaskMetrics"] == ["accuracy", "reaction time"]
    assert task["TaskDuration"] == "10 minutes"
    assert task["Conditions"] == ["go trials", "no-go trials"]


def test_fake_client_resting_state():
    rec = FakeTaskClient().extract(RESTING)
    StudyMetadataModel.model_validate(rec)
    (task,) = rec["fMRITasks"]
    assert task["RestingState"] is True
    assert task["TaskName"] == "Resting state"
    assert task["RestingStateMetadata"] == {"duration": "8 minutes"}


def test_fake_client_exclusion_and_empty():
    rec = FakeTaskClient().extract("This meta-analysis pools 50 studies.")
    assert rec["Exclude"] == "MetaAnalysis"
    rec2 = FakeTaskClient().extract("")
    StudyMetadataModel.model_validate(rec2)
    assert rec2["Modality"] == ["Other"]
    assert rec2["fMRITasks"] == []


def test_encode_decode_roundtrip():
    rec = FakeTaskClient().extract(RESTING)
    from neurostore_text_extraction_ray.stages.task import _encode_record

    enc = _encode_record(rec)
    assert isinstance(enc["fMRITasks"][0]["RestingStateMetadata"], str)
    dec = decode_record(enc)
    assert dec == rec
    StudyMetadataModel.model_validate(dec)


class _BadClient:
    def extract(self, text):
        return {"Modality": ["not-a-modality"], "fMRITasks": []}


def test_validation_never_drops():
    batch = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array([GONOGO, RESTING], pa.string()),
    })
    out = TaskExtractActor()(batch)
    assert out["valid"].to_pylist() == [True, True]
    bad = TaskExtractActor(client=_BadClient())(batch)
    assert bad.num_rows == 2  # kept
    assert bad["valid"].to_pylist() == [False, False]


def test_pipeline_e2e(ray_session):
    import ray.data as rd

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([GONOGO, RESTING, "no neuroimaging here"], pa.string()),
    }))
    out = task_metadata_pipeline(docs, concurrency=1).to_pandas()
    assert len(out) == 3
    by_id = {r.doc_id: r for r in out.itertuples()}
    rec = decode_record(by_id[0].study_metadata)
    assert rec["fMRITasks"][0]["TaskName"] == "Go/No-Go Task"
    assert decode_record(by_id[2].study_metadata)["fMRITasks"] == []
    assert out["valid"].all()


def test_determinism():
    a = FakeTaskClient().extract(GONOGO)
    b = FakeTaskClient().extract(GONOGO)
    assert a == b
