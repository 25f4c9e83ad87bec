"""docs_split_assign: deterministic train/valid/test assignment."""

import numpy as np
import pandas as pd
import pytest

from neurostore_text_extraction_ray.pipelines import steps

SF = "/root/testdata/sf0.001"


def test_partition_complete_and_stable(ray_session):
    df = steps.docs_split_assign(SF).to_pandas()
    assert set(df["split"].unique()) <= {"train", "valid", "test"}
    assert len(df) == 500
    # rerun: byte-stable
    df2 = steps.docs_split_assign(SF).to_pandas()
    pd.testing.assert_frame_equal(
        df.sort_values("doc_id").reset_index(drop=True),
        df2.sort_values("doc_id").reset_index(drop=True))


def test_fractions_near_nominal(ray_session):
    df = steps.docs_split_assign(SF).to_pandas()
    frac = df["split"].value_counts(normalize=True)
    assert 0.80 < frac.get("train", 0) < 0.97
    assert frac.get("valid", 0) < 0.12
    assert frac.get("test", 0) < 0.12


def test_independent_of_sample_hash_stream(ray_session):
    """A doc's split must not be a function of whether the Bernoulli
    sample keeps it — the two hash streams differ by the LCG salt."""
    split = steps.docs_split_assign(SF).to_pandas().set_index("doc_id")
    sampled = set(steps.docs_sample_hash(SF).to_pandas()["doc_id"])
    in_frac = split.loc[list(sampled)]["split"].eq("train").mean()
    out_ids = [i for i in split.index if i not in sampled]
    out_frac = split.loc[out_ids]["split"].eq("train").mean()
    assert abs(in_frac - out_frac) < 0.15


def test_custom_fractions(ray_session):
    df = steps.docs_split_assign(SF, train_pct=0, valid_pct=100).to_pandas()
    assert set(df["split"].unique()) == {"valid"}
    df2 = steps.docs_split_assign(SF, train_pct=100, valid_pct=0).to_pandas()
    assert set(df2["split"].unique()) == {"train"}


def test_invalid_fractions_raise():
    with pytest.raises(ValueError):
        steps.docs_split_assign(SF, train_pct=90, valid_pct=20)
    with pytest.raises(ValueError):
        steps.docs_split_assign(SF, train_pct=-1)


def test_large_doc_id_guard(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(
        pa.table({"doc_id": pa.array([1 << 31], pa.int64()),
                  "lang": pa.array(["en"], pa.string())}),
        d / "documents.parquet")
    with pytest.raises(Exception, match="2\\^31"):
        steps.docs_split_assign(str(d)).to_pandas()
