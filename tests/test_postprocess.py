"""Schema-driven post-processing (M10) + validation (M15)."""

from typing import Optional

import pyarrow as pa
from pydantic import BaseModel, Field

from neurostore_text_extraction_ray.stages.postprocess import (
    PostProcessActor,
    ValidateActor,
    post_process_record,
    read_schema_metadata,
)


class Group(BaseModel):
    diagnosis: Optional[str] = Field(
        default=None,
        json_schema_extra={"normalize_text": True, "expand_abbreviations": True},
    )
    name: Optional[str] = None


class Result(BaseModel):
    title: str = Field(json_schema_extra={"normalize_text": True})
    summary: Optional[str] = Field(
        default=None, json_schema_extra={"expand_abbreviations": True}
    )
    groups: list[Group] = []


def test_read_schema_metadata_paths():
    norm, exp = read_schema_metadata(Result)
    assert norm == {"title", "groups[].diagnosis"}
    assert exp == {"summary", "groups[].diagnosis"}


SOURCE = "Patients with major depressive disorder (MDD) were scanned."


def test_post_process_record_nested():
    record = {
        "title": "a STUDY of depression",
        "summary": "We found MDD effects.",
        "groups": [{"diagnosis": "MDD", "name": "g1"}, {"diagnosis": None, "name": "g2"}],
    }
    norm, exp = read_schema_metadata(Result)
    out = post_process_record(record, SOURCE, norm, exp)
    assert out["title"] == "A Study Of Depression"
    assert out["summary"] == "We found major depressive disorder effects."
    # expand then capwords-normalize
    assert out["groups"][0]["diagnosis"] == "Major Depressive Disorder"
    assert out["groups"][1]["diagnosis"] is None
    # input untouched
    assert record["groups"][0]["diagnosis"] == "MDD"


def test_post_process_actor_and_validate(ray_session):
    import ray.data as rd

    result_type = pa.struct([
        ("title", pa.string()),
        ("summary", pa.string()),
        ("groups", pa.list_(pa.struct([("diagnosis", pa.string()), ("name", pa.string())]))),
    ])
    batch = pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array([SOURCE], pa.string()),
        "result": pa.array(
            [{"title": "mdd study", "summary": "MDD again",
              "groups": [{"diagnosis": "MDD", "name": None}]}],
            result_type,
        ),
    })
    ds = rd.from_arrow(batch)
    out = (
        ds.map_batches(
            PostProcessActor,
            fn_constructor_kwargs={"schema_model": Result},
            batch_format="pyarrow",
            concurrency=1,
        )
        .map_batches(
            ValidateActor,
            fn_constructor_kwargs={"schema_model": Result},
            batch_format="pyarrow",
            concurrency=1,
        )
        .to_pandas()
    )
    r = out["result"][0]
    assert r["title"] == "Mdd Study"
    assert r["groups"][0]["diagnosis"] == "Major Depressive Disorder"
    assert bool(out["valid"][0]) is True


def test_validate_never_drops():
    actor = ValidateActor(Result)
    batch = pa.table({
        "result": pa.array(
            [{"title": None, "summary": None, "groups": []}],  # title required
            pa.struct([("title", pa.string()), ("summary", pa.string()),
                       ("groups", pa.list_(pa.struct([("diagnosis", pa.string())])))]),
        )
    })
    out = actor(batch)
    assert out.num_rows == 1
    assert out["valid"].to_pylist() == [False]
