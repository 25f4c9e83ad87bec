"""LLM-prompt extraction stage (SURVEY T2/M12) with a deterministic
fake client, plus the participant-demographics cleanup kernel
(reference ``participant_demographics/model.py:25-87`` — the canonical
per-document metadata-normalization ladder).

The reference calls OpenAI function-calling through publang
(``api.py:47-163``); its tests replay recorded HTTP. Here the client is
injectable and the default ``FakeLLMClient`` extracts participant
groups from text with deterministic regex rules — same actor
interface, schema and downstream post-processing as a real client.
"""

from __future__ import annotations

import re
from typing import List, Literal, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
from pydantic import BaseModel, Field

# Full GroupImaging field set, in the reference's serialization order
# (participant_demographics/schemas.py:7-73; field order verified
# against the committed golden
# evaluation/results/.../ParticipantDemographicsExtractor/.../results.json).
GROUP_FIELDS = [
    ("count", pa.float64()),
    ("diagnosis", pa.string()),
    ("group_name", pa.string()),
    ("subgroup_name", pa.string()),
    ("male_count", pa.float64()),
    ("female_count", pa.float64()),
    ("age_mean", pa.float64()),
    ("age_range", pa.string()),
    ("age_minimum", pa.float64()),
    ("age_maximum", pa.float64()),
    ("age_median", pa.float64()),
    ("imaging_sample", pa.string()),
]
GROUPS_TYPE = pa.list_(pa.struct(GROUP_FIELDS))


class GroupImaging(BaseModel):
    """Pydantic mirror of ``participant_demographics/schemas.py:7-73``
    (GroupBase + imaging_sample), with the same schema-metadata
    post-processing directives consumed by stages/postprocess.py."""

    count: int
    diagnosis: Optional[str] = Field(
        default=None,
        json_schema_extra={"normalize_text": True, "expand_abbreviations": True},
    )
    group_name: Literal["healthy", "patients"]
    subgroup_name: Optional[str] = Field(
        default=None,
        json_schema_extra={"normalize_text": True, "expand_abbreviations": True},
    )
    male_count: Optional[int] = None
    female_count: Optional[int] = None
    age_mean: Optional[float] = None
    age_range: Optional[str] = Field(
        default=None, json_schema_extra={"normalize_text": True}
    )
    age_minimum: Optional[int] = None
    age_maximum: Optional[int] = None
    age_median: Optional[int] = None
    imaging_sample: Literal["yes", "no"]


class BaseDemographicsSchema(BaseModel):
    """Mirror of ``participant_demographics/schemas.py:76-77``."""

    groups: List[GroupImaging]


def escape_prompt(text: str) -> str:
    """'$' -> '$$' template escaping (api.py:148)."""
    return text.replace("$", "$$")


def build_prompt(base_prompt: str, text: str) -> str:
    """Prompt assembly parity (api.py:133-149)."""
    return (
        base_prompt
        + " Call the extractData function to save the output."
        + escape_prompt(text)
    )


class FakeLLMClient:
    """Deterministic 'LLM': regex extraction of participant groups over
    the FULL GroupImaging field set.

    Patterns: '<N> patients [with <diagnosis>]', '<N> healthy controls',
    '<N> participants', 'mean age [of] <X> [years]', 'median age [of]
    <X>', 'aged <lo>-<hi>' / 'aged <lo> to <hi>',
    '<N> males?/<N> females?'; imaging_sample = 'yes' iff imaging
    vocabulary appears in the text."""

    GROUP_RE = re.compile(
        r"(\d+)\s+(patients|participants|subjects|healthy controls|controls)"
        r"(?:\s+with\s+([a-zA-Z][a-zA-Z \-']{2,40}?))?(?=[.,;()]|\s+(?:and|were|who|underwent)\b|$)",
        re.IGNORECASE,
    )
    AGE_RE = re.compile(r"mean age(?:\s+of)?\s+(\d+(?:\.\d+)?)", re.IGNORECASE)
    MEDIAN_RE = re.compile(r"median age(?:\s+of)?\s+(\d+)", re.IGNORECASE)
    RANGE_RE = re.compile(r"aged\s+(\d+)\s*(?:-|–|to)\s*(\d+)", re.IGNORECASE)
    MALE_RE = re.compile(r"(\d+)\s+males?\b", re.IGNORECASE)
    FEMALE_RE = re.compile(r"(\d+)\s+females?\b", re.IGNORECASE)
    IMAGING_RE = re.compile(
        r"\b(fmri|mri|neuroimaging|imaging|scanner|scanned|scanning)\b", re.IGNORECASE
    )

    def extract(self, text: str) -> dict:
        t = text or ""
        groups = []
        age = self.AGE_RE.search(t)
        median = self.MEDIAN_RE.search(t)
        rng = self.RANGE_RE.search(t)
        male = self.MALE_RE.search(t)
        female = self.FEMALE_RE.search(t)
        imaging = "yes" if self.IMAGING_RE.search(t) else "no"
        for m in self.GROUP_RE.finditer(t):
            count = float(m.group(1))
            kind = m.group(2).lower()
            diagnosis = m.group(3).strip() if m.group(3) else None
            is_patient = kind == "patients" or diagnosis is not None
            groups.append(
                {
                    "count": count,
                    "diagnosis": diagnosis,
                    # schema enum is {'healthy', 'patients'}
                    # (schemas.py:17-21); the cleanup ladder fills the
                    # None branch with 'healthy'
                    "group_name": "patients" if is_patient else None,
                    "subgroup_name": None,
                    "male_count": float(male.group(1)) if male else None,
                    "female_count": float(female.group(1)) if female else None,
                    "age_mean": float(age.group(1)) if age else None,
                    "age_range": f"{rng.group(1)}-{rng.group(2)}" if rng else None,
                    "age_minimum": float(rng.group(1)) if rng else None,
                    "age_maximum": float(rng.group(2)) if rng else None,
                    "age_median": float(median.group(1)) if median else None,
                    "imaging_sample": imaging,
                }
            )
        return {"groups": groups}


class LLMExtractActor:
    """map_batches actor holding the (fake or injected) client."""

    def __init__(self, text_column: str = "text", id_column: str = "doc_id",
                 client=None, base_prompt: str = "Extract participant demographics.",
                 keep_text: bool = False):
        self.text_column = text_column
        self.id_column = id_column
        self.client = client if client is not None else FakeLLMClient()
        self.base_prompt = base_prompt
        self.keep_text = keep_text

    def __call__(self, batch: pa.Table) -> pa.Table:
        groups_col = []
        for text in batch[self.text_column].to_pylist():
            _ = build_prompt(self.base_prompt, text or "")  # parity: prompt built per doc
            groups_col.append(self.client.extract(text or "")["groups"])
        cols = {
            self.id_column: batch[self.id_column],
            "groups": pa.array(groups_col, GROUPS_TYPE),
        }
        if self.keep_text:
            # downstream abbreviation-aware linking needs the source
            # text (umls_disease/model.py:289-299 reads both)
            cols[self.text_column] = batch[self.text_column]
        return pa.table(cols)


# ---------------------------------------------------------------------------
# Cleanup ladder (participant_demographics/model.py:40-87)
# ---------------------------------------------------------------------------


def clean_groups(groups: list[dict]) -> list[dict]:
    """The exact reference ladder on one document's group records:
    fillna group_name -> 'healthy'; drop null-count rows; group_name ->
    'healthy' when non-healthy without diagnosis; clip count >= 0;
    impute male from count-female (clip >= 0) and vice versa; NaN ->
    None."""
    if not groups:
        return []
    df = pd.DataFrame(groups)
    for col, _ in GROUP_FIELDS:
        if col not in df.columns:
            df[col] = np.nan
    # the reference guards the same fillna with this option context
    # (participant_demographics/model.py:40-52); also silences the
    # per-batch FutureWarning about silent downcasting
    with pd.option_context("future.no_silent_downcasting", True):
        df = df.fillna(value=np.nan).infer_objects(copy=False)
    df["group_name"] = df["group_name"].fillna("healthy")
    df = df[~pd.isna(df["count"])]
    df.loc[
        (df["group_name"] != "healthy") & (pd.isna(df["diagnosis"])), "group_name"
    ] = "healthy"
    df["count"] = df["count"].clip(lower=0)
    ix_male_miss = (pd.isna(df["male_count"])) & ~(pd.isna(df["female_count"]))
    df.loc[ix_male_miss, "male_count"] = (
        df.loc[ix_male_miss, "count"] - df.loc[ix_male_miss, "female_count"]
    )
    df["male_count"] = df["male_count"].clip(lower=0)
    ix_female_miss = (pd.isna(df["female_count"])) & ~(pd.isna(df["male_count"]))
    df.loc[ix_female_miss, "female_count"] = (
        df.loc[ix_female_miss, "count"] - df.loc[ix_female_miss, "male_count"]
    )
    df["female_count"] = df["female_count"].clip(lower=0)
    df = df.astype(object).where(pd.notna(df), None)
    return df[[c for c, _ in GROUP_FIELDS]].to_dict(orient="records")


def clean_groups_batch(batch: pa.Table, groups_col: str = "groups") -> pa.Table:
    cleaned = [clean_groups(g) for g in batch[groups_col].to_pylist()]
    i = batch.column_names.index(groups_col)
    return batch.set_column(i, groups_col, pa.array(cleaned, GROUPS_TYPE))


def raw_iff_different_batch(batch: pa.Table, raw_col: str = "groups_raw",
                            clean_col: str = "groups") -> pa.Table:
    """S5 raw-results retention parity (``utils.py:309-342``): the
    reference writes ``raw_results.json`` only when it differs from the
    cleaned results — the columnar analog nulls the raw entry when the
    cleanup ladder was a no-op, so identical payloads are never stored
    twice."""
    raws = batch[raw_col].to_pylist()
    cleans = batch[clean_col].to_pylist()
    out = [None if r == c else r for r, c in zip(raws, cleans)]
    i = batch.column_names.index(raw_col)
    return batch.set_column(i, raw_col, pa.array(out, GROUPS_TYPE))


def is_patient_study_batch(batch: pa.Table, groups_col: str = "groups") -> pa.Table:
    """M16 predicate over demographics groups: any group classified as
    'patients' (the schema enum, schemas.py:17-21). The reference's toy
    patient_study example (tests/example_pipelines/patient_study/
    model.py:35-58) checks a mock upstream's ``name == 'patient'``
    field; over real demographics output the enum value is
    'patients'."""
    flags = [
        any(g.get("group_name") == "patients" for g in (gl or []))
        for gl in batch[groups_col].to_pylist()
    ]
    return batch.append_column("is_patient_study", pa.array(flags, pa.bool_()))
