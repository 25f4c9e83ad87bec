"""Evaluation harness (SURVEY A5/J4; reference
``evaluation/run_evaluation.py:32-62,150-260`` and
``evaluation/scripts/calculate_metrics.py:20-60``): join extracted
records to a ground-truth table on the document key and compute
field-wise accuracy with text normalization and numeric tolerance.

Stays driver-side over small result tables (the reference's harness is
pandas over output JSONs); the join itself is a Dataset join shape when
run distributed."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

_WS = re.compile(r"\s+")


def normalize_value(v):
    """Eval-side normalization (calculate_metrics.py:20-41): collapse
    whitespace + lowercase for strings; passthrough otherwise."""
    if isinstance(v, str):
        return _WS.sub(" ", v).strip().lower()
    return v


def strip_pmc(v):
    """'PMC123' -> '123' (run_evaluation.py:152)."""
    if isinstance(v, str):
        return v.lstrip("PMC")
    return v


def field_accuracy(
    extracted: pd.DataFrame,
    ground_truth: pd.DataFrame,
    key: str,
    fields: list[str],
    numeric_tolerance: float = 0.0,
) -> pd.DataFrame:
    """Inner-join on ``key`` and score each field:
    - numeric: |a - b| <= tolerance (NaN == NaN counts as match)
    - string: normalized equality
    Returns a DataFrame (field, n, n_match, accuracy)."""
    joined = extracted.merge(
        ground_truth, on=key, suffixes=("_ext", "_gt"), how="inner"
    )
    rows = []
    for field in fields:
        a = joined[f"{field}_ext"] if f"{field}_ext" in joined else joined[field]
        b = joined[f"{field}_gt"] if f"{field}_gt" in joined else joined[field]
        matches = 0
        n = len(joined)
        for x, y in zip(a, b):
            if isinstance(x, (int, float, np.floating)) and isinstance(
                y, (int, float, np.floating)
            ):
                if (pd.isna(x) and pd.isna(y)) or (
                    not pd.isna(x)
                    and not pd.isna(y)
                    and abs(float(x) - float(y)) <= numeric_tolerance
                ):
                    matches += 1
            else:
                if normalize_value(x) == normalize_value(y):
                    matches += 1
        rows.append(
            {"field": field, "n": n, "n_match": matches,
             "accuracy": matches / n if n else float("nan")}
        )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# Standard-pipelines evaluation loop (run_evaluation.py:65-200): run the
# two flagship LLM pipelines, flatten nested results to flat frames
# keyed by document, and score against ground truth.
# ---------------------------------------------------------------------------


def flatten_groups(df: pd.DataFrame, json_col: str = "groups_json",
                   key: str = "doc_id") -> pd.DataFrame:
    """The ``pd.json_normalize(record_path=['groups'])`` analog
    (run_evaluation.py:104-200): one row per demographics group with
    ``group_ix``."""
    import json

    rows = []
    for k, gj in zip(df[key], df[json_col]):
        for ix, g in enumerate(json.loads(gj) or []):
            rows.append({key: k, "group_ix": ix, **g})
    if not rows:
        # explicit key columns so an empty pipeline output flows
        # through the downstream key build instead of KeyError
        # (ADVICE r02 #4)
        return pd.DataFrame(columns=[key, "group_ix"])
    return pd.DataFrame(rows)


def flatten_tasks(df: pd.DataFrame, json_col: str = "study_metadata_json",
                  key: str = "doc_id") -> pd.DataFrame:
    """Flatten StudyMetadata: one row per fMRI task (study-level fields
    repeated), mirroring the eval harness's task flattening."""
    import json

    rows = []
    for k, sj in zip(df[key], df[json_col]):
        rec = json.loads(sj)
        base = {
            key: k,
            "Modality": ",".join(rec.get("Modality") or []),
            "StudyObjective": rec.get("StudyObjective"),
            "Exclude": rec.get("Exclude"),
        }
        tasks = rec.get("fMRITasks") or []
        if not tasks:
            rows.append({**base, "task_ix": None, "TaskName": None,
                         "RestingState": None, "TaskDuration": None})
            continue
        for ix, t in enumerate(tasks):
            rows.append({
                **base, "task_ix": ix, "TaskName": t.get("TaskName"),
                "RestingState": t.get("RestingState"),
                "TaskDuration": t.get("TaskDuration"),
            })
    if not rows:
        return pd.DataFrame(columns=[
            key, "Modality", "StudyObjective", "Exclude", "task_ix",
            "TaskName", "RestingState", "TaskDuration",
        ])
    return pd.DataFrame(rows)


def run_standard_evaluation(
    sf_dir: str,
    gt_groups: pd.DataFrame,
    gt_tasks: pd.DataFrame,
    demographic_fields: list[str] | None = None,
    task_fields: list[str] | None = None,
    numeric_tolerance: float = 0.0,
) -> dict[str, pd.DataFrame]:
    """Run BOTH standard pipelines (participant demographics and task
    metadata — the two the reference's harness drives,
    run_evaluation.py:65-101), flatten, join to ground truth on
    (doc_id, group_ix)/(doc_id, task_ix), and score field-wise.
    Returns {'demographics': ..., 'tasks': ...} accuracy frames."""
    from .extras import _llm_demographics, _llm_task_metadata

    demo = flatten_groups(_llm_demographics(sf_dir).to_pandas())
    task = flatten_tasks(_llm_task_metadata(sf_dir).to_pandas())
    demo["key"] = demo["doc_id"].astype(str) + ":" + demo["group_ix"].astype(str)
    gt_g = gt_groups.copy()
    gt_g["key"] = gt_g["doc_id"].astype(str) + ":" + gt_g["group_ix"].astype(str)
    task_f = task[task["task_ix"].notna()].copy()
    task_f["key"] = task_f["doc_id"].astype(str) + ":" + task_f["task_ix"].astype(int).astype(str)
    gt_t = gt_tasks.copy()
    gt_t["key"] = gt_t["doc_id"].astype(str) + ":" + gt_t["task_ix"].astype(int).astype(str)
    return {
        "demographics": field_accuracy(
            demo, gt_g, "key",
            demographic_fields or ["count", "diagnosis", "group_name",
                                   "male_count", "female_count", "age_mean"],
            numeric_tolerance=numeric_tolerance,
        ),
        "tasks": field_accuracy(
            task_f, gt_t, "key",
            task_fields or ["TaskName", "RestingState", "TaskDuration", "Modality"],
            numeric_tolerance=numeric_tolerance,
        ),
    }
