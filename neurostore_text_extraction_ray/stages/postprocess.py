"""Schema-driven post-processing + validation (SURVEY M10/M15):
pydantic field metadata drives which (possibly nested) fields get
definition-removal + abbreviation expansion and/or capwords
normalization, using abbreviations detected once per document from its
source text.

Parity with the reference:
- path collection incl. ``[]`` markers for list/dict-of-model fields —
  ``base.py:896-959``;
- per-field transform order: find_and_remove_definitions ->
  resolve_abbreviations -> normalize_string — ``base.py:1097-1112``;
- path application over iterables — ``base.py:1122-1226``;
- validation NEVER drops a row, it sets ``valid`` — ``base.py:1072-1095``.

Constants ``NORMALIZE_TEXT`` / ``EXPAND_ABBREVIATIONS`` mirror
``ns_extract/pipelines/data_structures.py:15-18``.
"""

from __future__ import annotations

import copy
import json
from functools import reduce

import pyarrow as pa

from ..functions.normalize import (
    detect_abbreviations,
    find_and_remove_definitions,
    normalize_string,
    resolve_abbreviations,
)

NORMALIZE_TEXT = "normalize_text"
EXPAND_ABBREVIATIONS = "expand_abbreviations"


def read_schema_metadata(model, prefix: str = "") -> tuple[set, set]:
    """Collect (normalize_fields, expand_fields) paths from a pydantic
    model, appending ``[]`` for list/dict-of-model fields."""
    normalize_fields: set[str] = set()
    expand_fields: set[str] = set()
    for name, field in model.model_fields.items():
        path = f"{prefix}.{name}" if prefix else name
        ann = field.annotation
        extra = field.json_schema_extra or {}
        if isinstance(extra, dict):
            if extra.get(NORMALIZE_TEXT, False):
                normalize_fields.add(path)
            if extra.get(EXPAND_ABBREVIATIONS, False):
                expand_fields.add(path)
        nested, iter_path = None, None
        origin = getattr(ann, "__origin__", None)
        if origin is list:
            inner = ann.__args__[0]
            if hasattr(inner, "model_fields"):
                nested, iter_path = inner, f"{path}[]"
        elif origin is dict and len(getattr(ann, "__args__", ())) == 2:
            inner = ann.__args__[1]
            if hasattr(inner, "model_fields"):
                nested, iter_path = inner, f"{path}[]"
        elif hasattr(ann, "model_fields"):
            nested, iter_path = ann, path
        if nested is not None:
            sub_n, sub_e = read_schema_metadata(nested, iter_path)
            normalize_fields |= sub_n
            expand_fields |= sub_e
    return normalize_fields, expand_fields


def process_field_value(value, do_normalize: bool, do_expand: bool,
                        abbreviations: list) -> str:
    if not isinstance(value, str):
        return value
    result = value
    if do_expand:
        result = find_and_remove_definitions(result, abbreviations)
        result = resolve_abbreviations(result, abbreviations)
    if do_normalize:
        result = normalize_string(result)
    return result


def post_process_record(record: dict, source_text: str | None,
                        normalize_fields: set, expand_fields: set) -> dict:
    """Apply the declared transforms to one result record."""
    out = json.loads(json.dumps(record, default=str))
    abbreviations = (
        detect_abbreviations(source_text) if (source_text and expand_fields) else []
    )
    for path in normalize_fields | expand_fields:
        do_norm = path in normalize_fields
        do_exp = path in expand_fields
        if "[]" in path:
            base, remainder = path.split("[]", 1)
            remainder = remainder.lstrip(".")
        else:
            base, remainder = path, ""
        base_value = reduce(
            lambda d, k: d.get(k, {}) if isinstance(d, dict) else d,
            base.split("."), out,
        )
        if remainder:
            items = (
                base_value.values() if isinstance(base_value, dict) else base_value
            ) if isinstance(base_value, (list, dict)) else []
            for item in items:
                current = item
                parts = remainder.split(".")
                for i, part in enumerate(parts):
                    if i == len(parts) - 1:
                        if isinstance(current, dict) and isinstance(current.get(part), str):
                            current[part] = process_field_value(
                                current[part], do_norm, do_exp, abbreviations
                            )
                    else:
                        current = current.get(part, {}) if isinstance(current, dict) else {}
        else:
            if isinstance(base_value, str):
                new_value = process_field_value(base_value, do_norm, do_exp, abbreviations)
                current = out
                parts = base.split(".")
                for part in parts[:-1]:
                    current = current[part]
                current[parts[-1]] = new_value
    return out


class PostProcessActor:
    """map_batches stage: schema-driven post-process of a struct/list
    result column, with abbreviations from a source-text column. The
    field-path table is compiled once per actor from the schema."""

    def __init__(self, schema_model, result_column: str = "result",
                 text_column: str = "text"):
        self.result_column = result_column
        self.text_column = text_column
        self.normalize_fields, self.expand_fields = read_schema_metadata(schema_model)

    def __call__(self, batch: pa.Table) -> pa.Table:
        results = batch[self.result_column].to_pylist()
        texts = (
            batch[self.text_column].to_pylist()
            if self.text_column in batch.column_names
            else [None] * len(results)
        )
        processed = [
            post_process_record(r, t, self.normalize_fields, self.expand_fields)
            if isinstance(r, dict) else r
            for r, t in zip(results, texts)
        ]
        i = batch.column_names.index(self.result_column)
        return batch.set_column(
            i, self.result_column, pa.array(processed, batch.schema.field(i).type)
        )


class ValidateActor:
    """M15: pydantic model_validate -> ``valid`` column; never drops
    rows (base.py:1072-1095)."""

    def __init__(self, schema_model, result_column: str = "result"):
        self.model = schema_model
        self.result_column = result_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        valid = []
        for r in batch[self.result_column].to_pylist():
            try:
                self.model.model_validate(r)
                valid.append(True)
            except Exception:
                valid.append(False)
        return batch.append_column("valid", pa.array(valid, pa.bool_()))
