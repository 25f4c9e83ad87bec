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


# ---------------------------------------------------------------------------
# Committed-golden replay (VERDICT r04 #5): the reference's own
# results.json files flow through loader -> alignment -> metrics.
# ---------------------------------------------------------------------------

REF_RESULTS = "/root/reference/evaluation/results"


def test_load_pipeline_results_demographics_pinned():
    import os

    import pytest

    from neurostore_text_extraction_ray.pipelines.evaluation import (
        load_pipeline_results)

    if not os.path.isdir(REF_RESULTS):
        pytest.skip("reference goldens unavailable")
    df = load_pipeline_results(REF_RESULTS, "participant_demographics",
                               "1.1.0")
    # 15 committed study dirs, one without a pmcid -> 14 studies,
    # 19 group records (pinned against the committed files)
    assert len(df) == 19
    assert df["pmcid"].nunique() == 14
    # hand-read from 3XC7fFxU7Sn6/results.json + info.json
    row = df[df["pmcid"] == "5776089"].iloc[0]
    assert row["group_name"] == "healthy"
    assert row["count"] == 21
    assert row["age_mean"] == 25.77
    assert row["male_count"] == 21
    # default version = latest by reverse-sorted path (1.1.0 > 1.0.0)
    latest = load_pipeline_results(REF_RESULTS, "participant_demographics")
    pd.testing.assert_frame_equal(df, latest)


def test_load_pipeline_results_task_pinned():
    import os

    import pytest

    from neurostore_text_extraction_ray.pipelines.evaluation import (
        load_pipeline_results)

    if not os.path.isdir(REF_RESULTS):
        pytest.skip("reference goldens unavailable")
    df = load_pipeline_results(REF_RESULTS, "task", "1.1.0")
    assert len(df) == 14                      # one record per study
    row = df[df["pmcid"] == "5776089"].iloc[0]
    assert row["HasRestingState"] is False or row["HasRestingState"] == False  # noqa: E712
    assert row["TaskName"] == ["Ankle Dorsiflexion Task"]
    assert row["Modality"] == ["fMRI-BOLD"]
    old = load_pipeline_results(REF_RESULTS, "task", "1.0.0")
    # the two committed versions genuinely differ (replay is non-trivial)
    assert old[old["pmcid"] == "5776089"].iloc[0]["TaskName"] == [
        "Dorsiflexion Task"]


def test_field_prf_semantics():
    from neurostore_text_extraction_ray.pipelines.evaluation import (
        field_prf, normalize_numeric, normalize_text_multi)

    # numeric with tolerance; NaN never matches and shrinks the totals
    gt = pd.Series([20.0, 15.0, np.nan, 8.0])
    ex = pd.Series([20.4, 16.0, 3.0, np.nan])
    m = field_prf(gt, ex, normalize=normalize_numeric, tolerance=0.5)
    assert m["matches"] == 1                   # only |20-20.4| <= 0.5
    assert m["total_ground_truth"] == 3 and m["total_extracted"] == 3
    assert m["precision"] == m["recall"] == 1 / 3
    # list fields compare as normalized SETS (order/case insensitive)
    gt = pd.Series([["Stroop Task", "rest"], ["N-Back"]])
    ex = pd.Series([["REST", "stroop  task"], ["Go/NoGo"]])
    m = field_prf(gt, ex, normalize=normalize_text_multi)
    assert m["matches"] == 1 and m["f1"] == 0.5
    # string normalization collapses whitespace/case
    m = field_prf(pd.Series(["Major  Depression"]),
                  pd.Series(["major depression"]),
                  normalize=normalize_text_multi)
    assert m["f1"] == 1.0


def test_golden_replay_self_identity():
    """v1.1.0 scored against itself is a perfect extraction: every
    field with any non-missing values scores P=R=F1=1."""
    import os

    import pytest

    from neurostore_text_extraction_ray.pipelines.evaluation import (
        DEMOGRAPHICS_FIELD_CONFIG, align_best_match,
        calculate_metrics_frame, load_pipeline_results)

    if not os.path.isdir(REF_RESULTS):
        pytest.skip("reference goldens unavailable")
    df = load_pipeline_results(REF_RESULTS, "participant_demographics",
                               "1.1.0")
    gt, ex = align_best_match(df, df, DEMOGRAPHICS_FIELD_CONFIG)
    m = calculate_metrics_frame(gt, ex, DEMOGRAPHICS_FIELD_CONFIG)
    per_field = m[m["field"] != "aggregate"]
    nonempty = per_field[per_field["total_ground_truth"] > 0]
    assert (nonempty["precision"] == 1.0).all()
    assert (nonempty["recall"] == 1.0).all()
    assert (nonempty["f1"] == 1.0).all()


def test_golden_replay_cross_version_pinned():
    """The full replay (1.0.0 scored against 1.1.0) reproduces pinned
    per-field values hand-checked against the committed files."""
    import os

    import pytest

    from neurostore_text_extraction_ray.pipelines.evaluation import (
        golden_replay_metrics)

    if not os.path.isdir(REF_RESULTS):
        pytest.skip("reference goldens unavailable")
    m = golden_replay_metrics(REF_RESULTS, round_to=None).set_index(
        ["dataset", "field"])
    demo = m.loc["participant_demographics"]
    assert demo.loc["age_mean", "matches"] == 10
    assert demo.loc["age_mean", "f1"] == 1.0
    assert demo.loc["group_name", "f1"] == 1.0
    assert demo.loc["diagnosis", "matches"] == 11
    assert demo.loc["count", "matches"] == 12
    task = m.loc["task"]
    assert task.loc["HasRestingState", "f1"] == 1.0
    assert task.loc["Modality", "f1"] == 1.0
    # 'Dorsiflexion Task' vs 'Ankle Dorsiflexion Task' divergences
    assert task.loc["TaskName", "matches"] == 10
    assert abs(task.loc["TaskName", "f1"] - 10 / 14) < 1e-12
