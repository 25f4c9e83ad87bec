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


# ---------------------------------------------------------------------------
# Committed-golden replay surface (VERDICT r04 next-round #5): load the
# reference's committed pipeline outputs
# (evaluation/results/<type>/<Extractor>/<version>/<hash>/<dbid>/
# {results,info}.json), align, and score — mirroring
# run_evaluation.py:103-204 (loader), :396-505 (best-match alignment)
# and calculate_metrics.py:87-152 (per-field precision/recall/F1).
# Driver-side over small result tables, like the reference harness.
# ---------------------------------------------------------------------------


def normalize_text_multi(v):
    """calculate_metrics.py:19-39 semantics: lowercase + whitespace
    collapse; lists normalize each non-null element."""
    if isinstance(v, np.ndarray):
        v = v.tolist()
    if isinstance(v, list):
        return [_WS.sub(" ", str(x).strip().lower())
                for x in v if not (x is None or pd.isna(x))]
    if v is None or pd.isna(v):
        return ""
    return _WS.sub(" ", str(v).strip().lower())


def normalize_numeric(v):
    """calculate_metrics.py:42-50: to float, strings stripped to their
    numeric characters."""
    if v is None or (not isinstance(v, (list, np.ndarray)) and pd.isna(v)):
        return np.nan
    if isinstance(v, str):
        cleaned = re.sub(r"[^\d.-]", "", v)
        return float(cleaned) if cleaned else np.nan
    return float(v)


def normalize_boolean(v):
    """calculate_metrics.py:53-61: NaN -> False, strings by keyword."""
    if v is None or (not isinstance(v, (list, np.ndarray)) and pd.isna(v)):
        return False
    if isinstance(v, bool):
        return v
    if isinstance(v, str):
        return v.lower() in ("true", "yes", "1", "t", "y")
    return bool(v)


# field validation grids (run_evaluation.py:43-62), as plain dicts
DEMOGRAPHICS_FIELD_CONFIG = {
    "age_mean": {"normalize": normalize_numeric, "tolerance": 0.5},
    "age_median": {"normalize": normalize_numeric, "tolerance": 0.5},
    "age_minimum": {"normalize": normalize_numeric, "tolerance": 0.5},
    "age_maximum": {"normalize": normalize_numeric, "tolerance": 0.5},
    "diagnosis": {"normalize": normalize_text_multi, "required": True},
    "group_name": {"normalize": normalize_text_multi, "required": True},
    "subgroup_name": {"normalize": normalize_text_multi, "required": True},
    "count": {"normalize": normalize_numeric, "required": True},
    "female_count": {"normalize": normalize_numeric},
    "male_count": {"normalize": normalize_numeric},
}

TASK_FIELD_CONFIG = {
    "HasRestingState": {"normalize": normalize_boolean, "required": True},
    "Modality": {"normalize": normalize_text_multi, "required": True},
    "TaskName": {"normalize": normalize_text_multi, "required": True},
    "TaskDescription": {"normalize": normalize_text_multi},
    "Condition": {"normalize": normalize_text_multi, "required": True},
}


def load_pipeline_results(results_root: str, dataset_type: str,
                          version: str | None = None) -> pd.DataFrame:
    """Load committed pipeline outputs into the flat evaluation frame
    (run_evaluation.py:103-204): latest <Extractor>/<version>/<hash>
    directory (or the one matching ``version``), one record per
    demographics group (pmcid stripped of 'PMC'; studies without a
    pmcid skipped) or one per study for the task extractor
    (HasRestingState = any task, list-valued name/description/
    condition fields). Study dirs are walked in sorted order (the
    reference uses filesystem order; sorting makes the frame
    deterministic)."""
    import glob as _glob
    import json
    import os

    dirs = sorted(
        _glob.glob(os.path.join(results_root, dataset_type, "*/*/*")),
        reverse=True)
    if version is not None:
        dirs = [d for d in dirs if f"{os.sep}{version}{os.sep}" in d]
    if not dirs:
        raise ValueError(
            f"no committed results for {dataset_type} under {results_root}")
    extractor_dir = dirs[0]

    records = []
    for study in sorted(os.listdir(extractor_dir)):
        study_dir = os.path.join(extractor_dir, study)
        if not os.path.isdir(study_dir):
            continue
        try:
            with open(os.path.join(study_dir, "info.json")) as f:
                identifiers = json.load(f)["identifiers"]
            with open(os.path.join(study_dir, "results.json")) as f:
                results = json.load(f)
        except (FileNotFoundError, KeyError, json.JSONDecodeError):
            continue
        if dataset_type == "participant_demographics":
            if not identifiers.get("pmcid"):
                continue
            for group in results.get("groups", []):
                records.append({
                    "pmcid": str(identifiers["pmcid"]).lstrip("PMC"),
                    "group_name": group.get("group_name", ""),
                    "count": group.get("count"),
                    "age_mean": group.get("age_mean"),
                    "age_median": group.get("age_median"),
                    "age_minimum": group.get("age_minimum"),
                    "age_maximum": group.get("age_maximum"),
                    "female_count": group.get("female_count"),
                    "male_count": group.get("male_count"),
                    "subgroup_name": group.get("subgroup_name", "_"),
                    "diagnosis": group.get("diagnosis", ""),
                })
        else:
            tasks = results.get("fMRITasks", [])
            if not tasks or not identifiers.get("pmcid"):
                continue
            conditions = []
            for t in tasks:
                c = t.get("Conditions")
                if isinstance(c, list):
                    conditions.extend(c)
            records.append({
                "pmcid": str(identifiers["pmcid"]).lstrip("PMC"),
                "HasRestingState": any(
                    t.get("RestingState", False) for t in tasks),
                "Modality": ["fMRI-BOLD"],
                "TaskName": [t["TaskName"] for t in tasks
                             if t.get("TaskName")],
                "TaskDescription": [t["TaskDescription"] for t in tasks
                                    if t.get("TaskDescription")],
                "Condition": conditions,
            })
    if not records:
        raise ValueError(f"no valid results found for {dataset_type}")
    return pd.DataFrame(records)


def _is_missing(v) -> bool:
    """Scalar missingness; list values are never missing (the
    reference's scalar pd.isna would raise on them — deliberate
    divergence, documented)."""
    return not isinstance(v, (list, np.ndarray)) and pd.isna(v)


def _pair_matches(gt_val, ext_val, config) -> bool:
    """One normalized pair comparison (run_evaluation.py:478-490)."""
    norm = config.get("normalize")
    if norm is not None:
        gt_val, ext_val = norm(gt_val), norm(ext_val)
    if isinstance(gt_val, (int, float)) and isinstance(ext_val, (int, float)) \
            and not isinstance(gt_val, bool) and not isinstance(ext_val, bool):
        if _is_missing(gt_val) and _is_missing(ext_val):
            return False
        if _is_missing(gt_val) or _is_missing(ext_val):
            return False
        return abs(gt_val - ext_val) <= config.get("tolerance", 0.0)
    return gt_val == ext_val


def align_best_match(ground_truth: pd.DataFrame, extracted: pd.DataFrame,
                     field_configs: dict, key: str = "pmcid"
                     ) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Per-key best-match alignment (run_evaluation.py:455-505): for
    each key in the sorted intersection, the FIRST ground-truth row
    faces the extracted row with the highest weighted field-match
    score. Returns 1:1-aligned (ground_truth, extracted) frames."""
    common = sorted(set(ground_truth[key]) & set(extracted[key]))
    gt_rows, ex_rows = [], []
    for k in common:
        gt_row = ground_truth[ground_truth[key] == k].iloc[0]
        best, best_score = None, -1.0
        for _, ext_row in extracted[extracted[key] == k].iterrows():
            score, total = 0.0, 0.0
            for field, config in field_configs.items():
                if field not in gt_row.index or field not in ext_row.index:
                    continue
                gt_val, ext_val = gt_row[field], ext_row[field]
                if _is_missing(gt_val) or _is_missing(ext_val):
                    continue
                w = config.get("weight", 1.0)
                if _pair_matches(gt_val, ext_val, config):
                    score += w
                total += w
            weighted = score / total if total > 0 else 0.0
            if best is None or weighted > best_score:
                best, best_score = ext_row, weighted
        gt_rows.append(gt_row)
        ex_rows.append(best)
    return (pd.DataFrame(gt_rows).reset_index(drop=True),
            pd.DataFrame(ex_rows).reset_index(drop=True))


def field_prf(ground_truth: pd.Series, extracted: pd.Series,
              normalize=None, tolerance: float = 0.0) -> dict:
    """Per-field precision/recall/F1 over positionally aligned series
    (calculate_metrics.py:87-152): totals are the non-missing counts,
    numeric matches within tolerance, list values compare as
    normalized sets."""
    if normalize is not None:
        ground_truth = ground_truth.apply(normalize)
        extracted = extracted.apply(normalize)
    total_gt = int(sum(not _is_missing(v) for v in ground_truth))
    total_ex = int(sum(not _is_missing(v) for v in extracted))
    matches = 0
    for g, e in zip(ground_truth, extracted):
        if _is_missing(g) or _is_missing(e):
            continue
        if isinstance(g, list) and isinstance(e, list):
            if ({normalize_text_multi(x) for x in g}
                    == {normalize_text_multi(x) for x in e}):
                matches += 1
        elif isinstance(g, (int, float)) and isinstance(e, (int, float)) \
                and not isinstance(g, bool) and not isinstance(e, bool):
            if abs(float(g) - float(e)) <= tolerance:
                matches += 1
        elif g == e:
            matches += 1
    precision = matches / total_ex if total_ex else 0.0
    recall = matches / total_gt if total_gt else 0.0
    f1 = (2 * precision * recall / (precision + recall)
          if (precision + recall) else 0.0)
    return {"precision": precision, "recall": recall, "f1": f1,
            "matches": matches, "total_ground_truth": total_gt,
            "total_extracted": total_ex}


def calculate_metrics_frame(ground_truth: pd.DataFrame,
                            extracted: pd.DataFrame,
                            field_configs: dict) -> pd.DataFrame:
    """All configured fields + the 'aggregate' mean row
    (calculate_metrics.py:155-201), as a flat frame."""
    rows, agg = [], {"precision": [], "recall": [], "f1": []}
    for field, config in field_configs.items():
        if field not in ground_truth.columns or field not in extracted.columns:
            continue
        m = field_prf(ground_truth[field], extracted[field],
                      normalize=config.get("normalize"),
                      tolerance=config.get("tolerance", 0.0))
        rows.append({"field": field, **m})
        for k in agg:
            agg[k].append(m[k])
    rows.append({"field": "aggregate",
                 "precision": float(np.mean(agg["precision"])),
                 "recall": float(np.mean(agg["recall"])),
                 "f1": float(np.mean(agg["f1"])),
                 "matches": -1, "total_ground_truth": -1,
                 "total_extracted": -1})
    return pd.DataFrame(rows)


def _collapse_task_lists(df: pd.DataFrame) -> pd.DataFrame:
    """Task list fields compare by first element
    (run_evaluation.py:509-530)."""
    df = df.copy()
    for field in ("Modality", "TaskName", "TaskDescription", "Condition",
                  "ContrastDefinition"):
        if field in df.columns:
            df[field] = df[field].apply(
                lambda x: x[0] if isinstance(x, list) and x else "")
    return df


def golden_replay_metrics(results_root: str | None = None,
                          round_to: int | None = 6) -> pd.DataFrame:
    """End-to-end replay over the reference's committed pipeline
    outputs: score the 1.0.0 extraction run against the 1.1.0 run as
    ground truth for both extractor families, through the full loader
    -> best-match alignment -> field-metrics chain. Deterministic
    (committed inputs only). Output one row per (dataset, field).

    This is the ONE implementation behind both the registry op and the
    ``queries()`` entry — ``results_root=None`` resolves through
    ``NSE_GOLDEN_RESULTS_ROOT`` then the in-sandbox reference path, and
    P/R/F1 round to ``round_to`` digits here so every surface emits
    identical values (the committed golden was generated rounded)."""
    if results_root is None:
        import os

        results_root = os.environ.get(
            "NSE_GOLDEN_RESULTS_ROOT",
            "/root/reference/evaluation/results")
    frames = []
    for dataset_type, configs in (
            ("participant_demographics", DEMOGRAPHICS_FIELD_CONFIG),
            ("task", TASK_FIELD_CONFIG)):
        gt = load_pipeline_results(results_root, dataset_type, "1.1.0")
        ex = load_pipeline_results(results_root, dataset_type, "1.0.0")
        if dataset_type == "task":
            gt, ex = _collapse_task_lists(gt), _collapse_task_lists(ex)
        gt_a, ex_a = align_best_match(gt, ex, configs)
        m = calculate_metrics_frame(gt_a, ex_a, configs)
        m.insert(0, "dataset", dataset_type)
        frames.append(m)
    out = pd.concat(frames, ignore_index=True)
    if round_to is not None:
        for c in ("precision", "recall", "f1"):
            out[c] = out[c].round(round_to)
    return out


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
