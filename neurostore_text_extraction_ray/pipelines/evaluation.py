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
