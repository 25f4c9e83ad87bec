"""Evaluation harness (A5/J4)."""

import numpy as np
import pandas as pd

from neurostore_text_extraction_ray.pipelines.evaluation import (
    field_accuracy,
    normalize_value,
    strip_pmc,
)


def test_normalize_value():
    assert normalize_value("  Major   Depression ") == "major depression"
    assert normalize_value(3.5) == 3.5
    assert strip_pmc("PMC1234") == "1234"
    assert strip_pmc(9) == 9


def test_field_accuracy():
    ext = pd.DataFrame({
        "pmcid": ["1", "2", "3"],
        "diagnosis": ["major depression", "Anxiety  Disorder", "ptsd"],
        "count": [20.0, 15.0, np.nan],
    })
    gt = pd.DataFrame({
        "pmcid": ["1", "2", "3", "4"],
        "diagnosis": ["Major Depression", "anxiety disorder", "schizophrenia", "other"],
        "count": [20.0, 15.5, np.nan, 1.0],
    })
    out = field_accuracy(ext, gt, key="pmcid",
                         fields=["diagnosis", "count"], numeric_tolerance=1.0)
    acc = dict(zip(out["field"], out["accuracy"]))
    assert acc["diagnosis"] == 2 / 3      # normalization matches 1,2; 3 differs
    assert acc["count"] == 1.0            # 20==20; |15-15.5|<=1; NaN==NaN
    assert (out["n"] == 3).all()          # inner join drops gt-only pmcid 4


def test_flatten_groups_and_tasks():
    from neurostore_text_extraction_ray.pipelines.evaluation import (
        flatten_groups, flatten_tasks)

    df = pd.DataFrame({
        "doc_id": [1, 2],
        "groups_json": [
            '[{"count":5.0,"diagnosis":"mdd"},{"count":3.0,"diagnosis":null}]',
            "[]",
        ],
    })
    flat = flatten_groups(df)
    assert len(flat) == 2
    assert list(flat["group_ix"]) == [0, 1]
    tdf = pd.DataFrame({
        "doc_id": [1],
        "study_metadata_json": [
            '{"Modality":["fMRI-BOLD"],"StudyObjective":null,"Exclude":null,'
            '"fMRITasks":[{"TaskName":"Stroop Task","RestingState":false,'
            '"TaskDuration":"10 minutes"}],"BehavioralTasks":null}'
        ],
    })
    tflat = flatten_tasks(tdf)
    assert tflat.iloc[0]["TaskName"] == "Stroop Task"
    assert tflat.iloc[0]["Modality"] == "fMRI-BOLD"


def test_run_standard_evaluation(ray_session):
    """Full §3.3 loop over sf0.001: both standard pipelines, flattened
    and scored against ground truth derived from the planted sentences
    — planted fields must score 1.0."""
    import os

    import pytest as _pytest

    SF = "/root/testdata/sf0.001"
    if not os.path.isdir(SF):
        _pytest.skip("testdata unavailable")
    from neurostore_text_extraction_ray.pipelines.evaluation import (
        run_standard_evaluation)
    from neurostore_text_extraction_ray.pipelines.extras import (
        _llm_demographics, _llm_task_metadata, flatten_ground_truth_demo,
        flatten_ground_truth_tasks)

    gt_g = flatten_ground_truth_demo(500)
    gt_t = flatten_ground_truth_tasks(500)
    out = run_standard_evaluation(SF, gt_g, gt_t)
    demo = out["demographics"].set_index("field")
    assert demo.loc["count", "accuracy"] == 1.0
    assert demo.loc["diagnosis", "accuracy"] == 1.0
    tasks = out["tasks"].set_index("field")
    assert tasks.loc["TaskName", "accuracy"] == 1.0
    assert tasks.loc["RestingState", "accuracy"] == 1.0


def test_flatten_empty_outputs_keep_columns():
    """Empty pipeline outputs flatten to key-columned frames and score
    as empty accuracy, not KeyError (ADVICE r02 #4)."""
    import pandas as pd

    from neurostore_text_extraction_ray.pipelines.evaluation import (
        field_accuracy, flatten_groups, flatten_tasks)

    demo = flatten_groups(pd.DataFrame({"doc_id": [], "groups_json": []}))
    assert list(demo.columns) == ["doc_id", "group_ix"]
    task = flatten_tasks(pd.DataFrame({"doc_id": [],
                                       "study_metadata_json": []}))
    assert "task_ix" in task.columns
    demo["key"] = demo["doc_id"].astype(str) + ":" + demo["group_ix"].astype(str)
    gt = pd.DataFrame({"key": ["0:0"], "count": [1.0]})
    acc = field_accuracy(demo, gt, "key", ["count"])
    assert acc.loc[0, "n"] == 0
