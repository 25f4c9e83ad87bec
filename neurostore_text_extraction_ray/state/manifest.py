"""Per-partition checkpoint manifests (north rule: lineage — input
file, row/key range, parser version — plus counters for parse failures
and empty extractions; reference analog: the per-study ``info.json`` +
``pipeline_info.json`` change-detection machinery,
``ns_extract/pipelines/base.py:300-478`` and ``utils.py:242-307``).

Layout under an output root:

    <out>/<run-id = config hash>/parts/part-<NNNNN>.parquet
    <out>/<run-id>/manifests/part-<NNNNN>.json
    <out>/<run-id>/pipeline_info.json

A part's parquet is written to a temp name and renamed, THEN its
manifest is written (atomically, tmp+rename) — so a manifest's
existence guarantees its data file is complete. Resume = skip part ids
that already have a manifest (anti-join on partition id; the driver
re-runs only missing parts). Deterministic content per part: rows are
sorted by (url, warc_ts) before write, so retries and reruns produce
byte-stable files keyed purely by the input.
"""

from __future__ import annotations

import datetime
import glob
import json
import os


def part_paths(run_dir: str, part: int):
    data = os.path.join(run_dir, "parts", f"part-{part:05d}.parquet")
    man = os.path.join(run_dir, "manifests", f"part-{part:05d}.json")
    return data, man


def completed_parts(run_dir: str) -> set[int]:
    """Part ids whose manifests exist (data files are guaranteed
    complete by write ordering)."""
    out = set()
    for f in glob.glob(os.path.join(run_dir, "manifests", "part-*.json")):
        try:
            out.add(int(os.path.basename(f)[5:10]))
        except ValueError:
            continue
    return out


def write_part(run_dir: str, part: int, table, manifest_extra: dict) -> dict:
    """Atomically write one partition's parquet + manifest.
    Returns the manifest dict."""
    import pyarrow.parquet as pq

    data_path, man_path = part_paths(run_dir, part)
    os.makedirs(os.path.dirname(data_path), exist_ok=True)
    os.makedirs(os.path.dirname(man_path), exist_ok=True)
    tmp = data_path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, data_path)
    manifest = {
        "partition_id": part,
        "rows": table.num_rows,
        "output_file": data_path,
        "written_at": datetime.datetime.now(datetime.timezone.utc).isoformat(),
        **manifest_extra,
    }
    mtmp = man_path + ".tmp"
    with open(mtmp, "w") as f:
        json.dump(manifest, f, indent=2, default=str)
    os.replace(mtmp, man_path)
    return manifest


def inputs_sidecar_path(run_dir: str, part: int) -> str:
    """Per-part input-identity sidecar: (url, warc_ts, content_md5) of
    the part's winning fetches — the reference's per-study
    ``{input_path: md5}`` change-detection map (``utils.py:302``,
    ``base.py:372-411``) at url granularity, stored as parquet so a
    part with millions of urls never rides inside a JSON manifest."""
    return os.path.join(run_dir, "manifests", f"inputs-part-{part:05d}.parquet")


def write_inputs_sidecar(run_dir: str, part: int, table) -> None:
    import pyarrow.parquet as pq

    path = inputs_sidecar_path(run_dir, part)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)


def write_pipeline_info(run_dir: str, info: dict) -> None:
    """Run-level manifest (reference: ``pipeline_info.json``,
    utils.py:242-284): date, version, config hash, kwargs."""
    os.makedirs(run_dir, exist_ok=True)
    path = os.path.join(run_dir, "pipeline_info.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(
            {"date": datetime.datetime.now(datetime.timezone.utc).isoformat(), **info},
            f,
            indent=2,
            default=str,
        )
    os.replace(tmp, path)


def read_manifests(run_dir: str) -> list[dict]:
    out = []
    for f in sorted(glob.glob(os.path.join(run_dir, "manifests", "part-*.json"))):
        with open(f) as fh:
            out.append(json.load(fh))
    return out


def input_fingerprint(paths) -> str:
    """Cheap input-identity fingerprint (path, size, mtime_ns per file;
    directories walk their parquet files). The run id incorporates it,
    so a changed input yields a fresh run directory instead of a bogus
    resume — the run-level analog of the reference's per-study input-MD5
    change detection (base.py:300-478)."""
    import hashlib

    if isinstance(paths, str):
        paths = [paths]
    parts = []
    for p in paths:
        if os.path.isdir(p):
            files = sorted(glob.glob(os.path.join(p, "**", "*.parquet"), recursive=True))
        elif os.path.exists(p):
            files = [p]
        else:
            parts.append(f"{p}:absent")
            continue
        for f in files:
            st = os.stat(f)
            parts.append(f"{f}:{st.st_size}:{st.st_mtime_ns}")
    return hashlib.blake2b("|".join(parts).encode(), digest_size=8).hexdigest()
