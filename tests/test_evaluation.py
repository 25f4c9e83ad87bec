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
