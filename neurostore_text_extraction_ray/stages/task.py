"""Task-metadata extraction stage — the analog of the reference's
second flagship LLM pipeline, ``TaskExtractor``
(``ns_extract/pipelines/nv_task/model.py:9-13``), with the full
``StudyMetadataModel`` schema (``nv_task/schemas.py:6-156``): study
modality, objective, exclusion flag, fMRI tasks (name/description/
design/conditions/metrics/concepts/domains/resting-state/duration) and
behavioral tasks.

As with the demographics stage (stages/llm.py), the LLM client is
injectable and the default is a DETERMINISTIC fake (keyword/regex
extraction) standing in for the OpenAI function-calling path the
reference drives through publang (``api.py:113-163``); the actor
interface, prompt assembly, schema validation (never drops a row) and
downstream serialization are the real thing.

Representation note: ``RestingStateMetadata`` is ``Dict[str, str]`` in
the reference schema; the Arrow column stores it as a canonical-JSON
string (Arrow maps are awkward for optional dict-of-str), and
validation runs on the decoded dict so the pydantic mirror stays
faithful.
"""

from __future__ import annotations

import json
import re
from typing import Dict, List, Literal, Optional

import pyarrow as pa
from pydantic import BaseModel

from .llm import build_prompt

DOMAINS = (
    "Perception",
    "Attention",
    "Reasoning and decision making",
    "Executive cognitive control",
    "Learning and memory",
    "Language",
    "Action",
    "Emotion",
    "Social function",
    "Motivation",
)

MODALITIES = (
    "fMRI-BOLD",
    "StructuralMRI",
    "DiffusionMRI",
    "PET FDG",
    "PET [15O]-water",
    "fMRI-CBF",
    "fMRI-CBV",
    "MEG",
    "EEG",
    "Other",
)

TASK_DESIGNS = ("Blocked", "EventRelated", "Mixed", "Other")


DomainLiteral = Literal[
    "Perception", "Attention", "Reasoning and decision making",
    "Executive cognitive control", "Learning and memory", "Language",
    "Action", "Emotion", "Social function", "Motivation",
]
ModalityLiteral = Literal[
    "fMRI-BOLD", "StructuralMRI", "DiffusionMRI", "PET FDG",
    "PET [15O]-water", "fMRI-CBF", "fMRI-CBV", "MEG", "EEG", "Other",
]
TaskDesignLiteral = Literal["Blocked", "EventRelated", "Mixed", "Other"]


class TaskMetadataModel(BaseModel):
    """Mirror of ``nv_task/schemas.py:6-83``."""

    TaskName: str
    TaskDescription: str
    DesignDetails: str
    Conditions: Optional[List[str]] = None
    TaskMetrics: Optional[List[str]] = None
    Concepts: Optional[List[str]] = None
    Domain: Optional[List[DomainLiteral]] = None


class FMRITaskMetadataModel(TaskMetadataModel):
    """Mirror of ``nv_task/schemas.py:86-119``."""

    RestingState: bool
    RestingStateMetadata: Optional[Dict[str, str]] = None
    TaskDesign: List[TaskDesignLiteral]
    TaskDuration: Optional[str] = None


class StudyMetadataModel(BaseModel):
    """Mirror of ``nv_task/schemas.py:122-156``."""

    Modality: List[ModalityLiteral]
    StudyObjective: Optional[str] = None
    Exclude: Optional[Literal["MetaAnalysis", "Review"]] = None
    fMRITasks: List[FMRITaskMetadataModel]
    BehavioralTasks: Optional[List[TaskMetadataModel]] = None


# Arrow mirror of the schema (RestingStateMetadata JSON-encoded).
TASK_STRUCT = pa.struct([
    ("TaskName", pa.string()),
    ("TaskDescription", pa.string()),
    ("DesignDetails", pa.string()),
    ("Conditions", pa.list_(pa.string())),
    ("TaskMetrics", pa.list_(pa.string())),
    ("Concepts", pa.list_(pa.string())),
    ("Domain", pa.list_(pa.string())),
])
FMRI_TASK_STRUCT = pa.struct(
    list(TASK_STRUCT) + [
        ("RestingState", pa.bool_()),
        ("RestingStateMetadata", pa.string()),
        ("TaskDesign", pa.list_(pa.string())),
        ("TaskDuration", pa.string()),
    ]
)
STUDY_TYPE = pa.struct([
    ("Modality", pa.list_(pa.string())),
    ("StudyObjective", pa.string()),
    ("Exclude", pa.string()),
    ("fMRITasks", pa.list_(FMRI_TASK_STRUCT)),
    ("BehavioralTasks", pa.list_(TASK_STRUCT)),
])


# concept lexicon -> primary cognitive domain (fixed public mapping in
# the spirit of the prompt's examples; deterministic)
CONCEPT_DOMAIN = {
    "working memory": "Learning and memory",
    "episodic memory": "Learning and memory",
    "reward learning": "Motivation",
    "attention": "Attention",
    "visual perception": "Perception",
    "auditory processing": "Perception",
    "response inhibition": "Executive cognitive control",
    "conflict monitoring": "Executive cognitive control",
    "cognitive control": "Executive cognitive control",
    "emotion regulation": "Emotion",
    "language comprehension": "Language",
    "decision making": "Reasoning and decision making",
    "social cognition": "Social function",
    "motor control": "Action",
}

# word-bounded: bare substring matching put 'pet' inside 'competition'
# and 'meg' inside 'omega'
MODALITY_KEYWORDS = [
    (re.compile(r"\bdiffusion\b"), "DiffusionMRI"),
    (re.compile(r"\bstructural mri\b"), "StructuralMRI"),
    (re.compile(r"\bfmri\b"), "fMRI-BOLD"),
    (re.compile(r"\bmeg\b"), "MEG"),
    (re.compile(r"\beeg\b"), "EEG"),
    (re.compile(r"\bpet\b"), "PET FDG"),
]

METRIC_KEYWORDS = ["accuracy", "reaction time", "bold response", "ratings"]

TASK_NAME_RE = re.compile(
    r"\b([A-Z][A-Za-z/-]+(?:\s+[A-Z][A-Za-z/-]+)*\s+[Tt]ask)\b"
)
DURATION_RE = re.compile(r"\b(\d+)\s*(minutes|seconds)\b", re.IGNORECASE)
CONDITION_RE = re.compile(
    r"\bconditions?\s*(?::|were|included)\s+([^.;\n]{3,120})", re.IGNORECASE
)


class FakeTaskClient:
    """Deterministic 'LLM' for study/task metadata: keyword and regex
    extraction producing a ``StudyMetadataModel``-shaped dict."""

    def extract(self, text: str) -> dict:
        t = text or ""
        low = t.lower()
        modality = [m for pat, m in MODALITY_KEYWORDS if pat.search(low)]
        # preserve enum order, dedupe
        modality = [m for m in MODALITIES if m in modality] or ["Other"]

        objective = None
        for sent in re.split(r"(?<=[.!?])\s+", t):
            if re.search(r"\b(aim|objective|investigate[ds]?)\b", sent, re.IGNORECASE):
                objective = sent.strip()
                break

        exclude = None
        if "meta-analysis" in low:
            exclude = "MetaAnalysis"
        elif re.search(r"\breview\b", low):
            exclude = "Review"

        m = TASK_NAME_RE.search(t)
        task_name = m.group(1) if m else None
        resting = "resting state" in low or "resting-state" in low

        designs = []
        if re.search(r"\bblock(?:ed)?\b", low):
            designs.append("Blocked")
        if "event-related" in low or "event related" in low:
            designs.append("EventRelated")
        if "mixed design" in low:
            designs.append("Mixed")
        if not designs:
            designs = ["Other"]

        concepts = [c for c in CONCEPT_DOMAIN if c in low]
        domains = [d for d in DOMAINS
                   if d in {CONCEPT_DOMAIN[c] for c in concepts}]
        metrics = [k for k in METRIC_KEYWORDS if k in low]
        cm = CONDITION_RE.search(t)
        conditions = None
        if cm:
            conditions = [c.strip() for c in re.split(
                r",\s*|\s+and\s+", cm.group(1)) if c.strip()]
        dm = DURATION_RE.search(t)
        duration = f"{dm.group(1)} {dm.group(2).lower()}" if dm else None

        fmri_tasks = []
        if ("fMRI-BOLD" in modality or "scanner" in low) and (task_name or resting):
            fmri_tasks.append({
                "TaskName": task_name or ("Resting state" if resting else "Unnamed task"),
                "TaskDescription": (
                    f"Participants performed {task_name or 'a resting-state acquisition'}."
                ),
                "DesignDetails": f"Design: {', '.join(designs)}.",
                "Conditions": conditions,
                "TaskMetrics": metrics or None,
                "Concepts": concepts or None,
                "Domain": domains or None,
                "RestingState": resting,
                "RestingStateMetadata": (
                    {"duration": duration} if (resting and duration) else None
                ),
                "TaskDesign": designs,
                "TaskDuration": duration,
            })
        behavioral = []
        if "behavioral task" in low and task_name:
            behavioral.append({
                "TaskName": task_name,
                "TaskDescription": f"Behavioral administration of {task_name}.",
                "DesignDetails": f"Design: {', '.join(designs)}.",
                "Conditions": conditions,
                "TaskMetrics": metrics or None,
                "Concepts": concepts or None,
                "Domain": domains or None,
            })
        return {
            "Modality": modality,
            "StudyObjective": objective,
            "Exclude": exclude,
            "fMRITasks": fmri_tasks,
            "BehavioralTasks": behavioral or None,
        }


def _encode_record(rec: dict) -> dict:
    """Python record -> Arrow-storable record (RestingStateMetadata
    dict -> canonical JSON string)."""
    out = json.loads(json.dumps(rec))
    for task in out.get("fMRITasks") or []:
        md = task.get("RestingStateMetadata")
        task["RestingStateMetadata"] = (
            json.dumps(md, sort_keys=True, separators=(",", ":"))
            if md is not None else None
        )
    return out


def decode_record(rec: dict) -> dict:
    """Arrow record -> Python record (JSON string back to dict) for
    pydantic validation. Tolerates numpy arrays from pandas-converted
    struct columns."""
    out = json.loads(json.dumps(
        rec, default=lambda o: o.tolist() if hasattr(o, "tolist") else str(o)
    ))
    for task in out.get("fMRITasks") or []:
        md = task.get("RestingStateMetadata")
        task["RestingStateMetadata"] = json.loads(md) if md else None
    return out


class TaskExtractActor:
    """map_batches actor holding the (fake or injected) task client;
    emits the study struct plus a pydantic ``valid`` flag (validation
    never drops rows — ``base.py:1072-1095``)."""

    BASE_PROMPT = "Extract detailed information about fMRI task design and analysis."

    def __init__(self, text_column: str = "text", id_column: str = "doc_id",
                 client=None):
        self.text_column = text_column
        self.id_column = id_column
        self.client = client if client is not None else FakeTaskClient()

    def __call__(self, batch: pa.Table) -> pa.Table:
        recs, valid = [], []
        for text in batch[self.text_column].to_pylist():
            _ = build_prompt(self.BASE_PROMPT, text or "")  # parity: api.py:133-149
            rec = self.client.extract(text or "")
            try:
                StudyMetadataModel.model_validate(rec)
                valid.append(True)
            except Exception:
                valid.append(False)
            recs.append(_encode_record(rec))
        return pa.table({
            self.id_column: batch[self.id_column],
            "study_metadata": pa.array(recs, STUDY_TYPE),
            "valid": pa.array(valid, pa.bool_()),
        })


def task_metadata_pipeline(ds, text_column: str = "text",
                           id_column: str = "doc_id", concurrency=(1, 4),
                           batch_size: int = 128):
    """documents -> TaskExtractActor -> schema-driven post-process
    (``StudyMetadataModel`` declares no normalize/expand directives, so
    the post-process pass is a faithful no-op, same as the reference's
    ``post_process`` on this schema)."""
    return ds.map_batches(
        TaskExtractActor,
        fn_constructor_kwargs={
            "text_column": text_column, "id_column": id_column,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
