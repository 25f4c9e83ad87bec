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

import numpy as np
import pandas as pd
import pyarrow as pa

GROUP_FIELDS = [
    ("count", pa.float64()),
    ("diagnosis", pa.string()),
    ("group_name", pa.string()),
    ("subgroup_name", pa.string()),
    ("male_count", pa.float64()),
    ("female_count", pa.float64()),
    ("age_mean", pa.float64()),
]
GROUPS_TYPE = pa.list_(pa.struct(GROUP_FIELDS))


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
    """Deterministic 'LLM': regex extraction of participant groups.

    Patterns: '<N> patients [with <diagnosis>]', '<N> healthy controls',
    '<N> participants', 'mean age [of] <X> [years]',
    '<N> males?/<N> females?'."""

    GROUP_RE = re.compile(
        r"(\d+)\s+(patients|participants|subjects|healthy controls|controls)"
        r"(?:\s+with\s+([a-zA-Z][a-zA-Z \-']{2,40}?))?(?=[.,;()]|\s+(?:and|were|who|underwent)\b|$)",
        re.IGNORECASE,
    )
    AGE_RE = re.compile(r"mean age(?:\s+of)?\s+(\d+(?:\.\d+)?)", re.IGNORECASE)
    MALE_RE = re.compile(r"(\d+)\s+males?\b", re.IGNORECASE)
    FEMALE_RE = re.compile(r"(\d+)\s+females?\b", re.IGNORECASE)

    def extract(self, text: str) -> dict:
        groups = []
        age = self.AGE_RE.search(text or "")
        male = self.MALE_RE.search(text or "")
        female = self.FEMALE_RE.search(text or "")
        for m in self.GROUP_RE.finditer(text or ""):
            count = float(m.group(1))
            kind = m.group(2).lower()
            diagnosis = m.group(3).strip() if m.group(3) else None
            is_patient = kind == "patients" or diagnosis is not None
            groups.append(
                {
                    "count": count,
                    "diagnosis": diagnosis,
                    "group_name": "patient" if is_patient else None,
                    "subgroup_name": None,
                    "male_count": float(male.group(1)) if male else None,
                    "female_count": float(female.group(1)) if female else None,
                    "age_mean": float(age.group(1)) if age else None,
                }
            )
        return {"groups": groups}


class LLMExtractActor:
    """map_batches actor holding the (fake or injected) client."""

    def __init__(self, text_column: str = "text", id_column: str = "doc_id",
                 client=None, base_prompt: str = "Extract participant demographics."):
        self.text_column = text_column
        self.id_column = id_column
        self.client = client if client is not None else FakeLLMClient()
        self.base_prompt = base_prompt

    def __call__(self, batch: pa.Table) -> pa.Table:
        groups_col = []
        for text in batch[self.text_column].to_pylist():
            _ = build_prompt(self.base_prompt, text or "")  # parity: prompt built per doc
            groups_col.append(self.client.extract(text or "")["groups"])
        return pa.table({
            self.id_column: batch[self.id_column],
            "groups": pa.array(groups_col, GROUPS_TYPE),
        })


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


def is_patient_study_batch(batch: pa.Table, groups_col: str = "groups") -> pa.Table:
    """M16 predicate: any group with group_name == 'patient'
    (tests/example_pipelines/patient_study/model.py:35-58)."""
    flags = [
        any(g.get("group_name") == "patient" for g in (gl or []))
        for gl in batch[groups_col].to_pylist()
    ]
    return batch.append_column("is_patient_study", pa.array(flags, pa.bool_()))
