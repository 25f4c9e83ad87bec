"""Pond-directory source: read a reference-layout "data pond" (one
directory per study) into a Ray Dataset.

Reference parity:
- directory scan with the 12-char-alnum dbid rule
  (``ns_extract/dataset.py:213-241``, regex at 223-229);
- per-study probing of ``identifiers.json``, ``source/ace/<pmid>.html``,
  ``source/pubget/<pmcid>.xml`` (+ ``tables/``), and
  ``processed/{pubget,ace,db}/{text.txt,metadata.json,coordinates.csv}``
  (``Study.__post_init__``, ``dataset.py:128-177``);
- typed loading: .txt -> str, .json -> dict with the NaN title/abstract
  -> "" fix, .csv -> records (``utils.py:147-195``, ``utils.py:56-75``);
- source-priority resolution: first available of (pubget, ace, db)
  wins per input type (``base.py:437-445``);
- upstream-pipeline output resolution: ``latest`` version = max
  semver-ish directory, ``latest`` config = newest
  ``pipeline_info.json`` date (``dataset.py:243-331``).

The scan itself is a driver-side walk (directory listings are tiny);
file CONTENT is loaded inside ``map_batches`` workers so payload bytes
stream through the cluster, not the driver.
"""

from __future__ import annotations

import glob
import json
import math
import os
import re

import pyarrow as pa

DBID_RE = re.compile(r"^[a-zA-Z0-9]{12}$")

SOURCE_PRIORITY = ("pubget", "ace", "db")


def scan_pond(root: str) -> list[dict]:
    """Index the pond: one record of PATHS per study (content not
    loaded here)."""
    studies = []
    for entry in sorted(os.listdir(root)):
        d = os.path.join(root, entry)
        if not os.path.isdir(d) or not DBID_RE.match(entry):
            continue
        ids_path = os.path.join(d, "identifiers.json")
        ids = {}
        if os.path.exists(ids_path):
            with open(ids_path) as f:
                ids = json.load(f)
        ace_html = glob.glob(os.path.join(d, "source", "ace", "*.html"))
        pubget_xml = [
            f for f in glob.glob(os.path.join(d, "source", "pubget", "*.xml"))
            if os.path.basename(f) != "tables.xml"
        ]
        tables = sorted(glob.glob(os.path.join(d, "source", "pubget", "tables", "table_*.csv")))
        # CSV-contents + info-JSON pairing by table number
        # (dataset.py:80-96: stem.split('_')[1] keys the pair dict);
        # the manifest carries PATHS only — contents load in workers
        pairs: dict[str, dict] = {}
        for f in glob.glob(os.path.join(d, "source", "pubget", "tables", "table_*")):
            base = os.path.basename(f)
            if base == "tables.xml":
                continue
            num = os.path.splitext(base)[0].split("_")[1]
            slot = pairs.setdefault(num, {"table_number": num,
                                          "contents": None, "metadata": None})
            if f.endswith(".json"):
                slot["metadata"] = f
            elif f.endswith(".csv"):
                slot["contents"] = f
        tables_xml = os.path.join(d, "source", "pubget", "tables", "tables.xml")
        rec = {
            "dbid": entry,
            "pmid": str(ids.get("pmid")) if ids.get("pmid") is not None else None,
            "pmcid": str(ids.get("pmcid")) if ids.get("pmcid") is not None else None,
            "doi": ids.get("doi"),
            "ace_html_path": ace_html[0] if ace_html else None,
            "pubget_xml_path": pubget_xml[0] if pubget_xml else None,
            # the tables_xml input slot (dataset.py:22,153-155): exposed
            # as a path column for downstream table-XML consumers; the
            # per-table scan above still excludes it from the pairs
            "tables_xml_path": tables_xml if os.path.exists(tables_xml) else None,
            "n_tables": len(tables),
            "tables_manifest": json.dumps(
                [pairs[k] for k in sorted(pairs)]) if pairs else None,
        }
        for src in SOURCE_PRIORITY:
            base = os.path.join(d, "processed", src)
            rec[f"{src}_text_path"] = (
                p if os.path.exists(p := os.path.join(base, "text.txt")) else None
            )
            rec[f"{src}_metadata_path"] = (
                p if os.path.exists(p := os.path.join(base, "metadata.json")) else None
            )
            rec[f"{src}_coordinates_path"] = (
                p if os.path.exists(p := os.path.join(base, "coordinates.csv")) else None
            )
        studies.append(rec)
    return studies


def _load_json_fixed(path: str) -> dict:
    """JSON load with the reference's NaN title/abstract -> '' fix
    (utils.py:71-74)."""
    with open(path) as f:
        data = json.load(f)
    for key in ("title", "abstract"):
        v = data.get(key)
        if v is None or (isinstance(v, float) and math.isnan(v)):
            if key in data:
                data[key] = ""
    return data


def load_study_content_batch(batch: pa.Table) -> pa.Table:
    """Load text with source-priority resolution (pubget > ace > db)
    and attach which source won. Runs in workers."""
    texts, srcs, metas = [], [], []
    for row in batch.to_pylist():
        text, src_won, meta = None, None, None
        for src in SOURCE_PRIORITY:
            p = row.get(f"{src}_text_path")
            if text is None and p:
                with open(p, encoding="utf-8") as f:
                    text = f.read()
                src_won = src
        for src in SOURCE_PRIORITY:
            mp = row.get(f"{src}_metadata_path")
            if meta is None and mp:
                meta = _load_json_fixed(mp)
        texts.append(text)
        srcs.append(src_won)
        metas.append(json.dumps(meta) if meta is not None else None)
    return (
        batch.append_column("text", pa.array(texts, pa.large_string()))
        .append_column("text_source", pa.array(srcs, pa.string()))
        .append_column("metadata_json", pa.array(metas, pa.large_string()))
    )


# Column set == header of the reference's processed/*/coordinates.csv
# fixtures; x/y/z are stereotactic floats, the rest ride as strings
# (the reference loads the CSV to row dicts via pandas,
# utils.py:185-186 — mixed per-study dtypes, so strings are the stable
# cross-study Arrow type).
COORD_COLUMNS = [
    "table_id", "table_label", "table_caption", "table_number",
    "x", "y", "z", "p_value", "region", "size", "statistic", "groups",
]
COORD_TYPE = pa.list_(pa.struct(
    [(c, pa.float64() if c in ("x", "y", "z") else pa.string())
     for c in COORD_COLUMNS]
))

TABLES_TYPE = pa.list_(pa.struct([
    ("table_number", pa.string()),
    ("table_id", pa.string()),
    ("table_label", pa.string()),
    ("table_caption", pa.string()),
    ("table_foot", pa.string()),
    ("n_header_rows", pa.int32()),
    ("table_data_file", pa.string()),
    ("contents_json", pa.large_string()),
]))


def _coord_records(path: str) -> list[dict]:
    """coordinates.csv -> typed records (x/y/z float, rest string,
    NaN -> None) — the CSV-to-records load of utils.py:185-186 with a
    stable Arrow-friendly dtype policy."""
    import pandas as pd

    try:
        df = pd.read_csv(path, dtype=str)
    except pd.errors.EmptyDataError:
        return []
    out = []
    for row in df.to_dict("records"):
        rec = {}
        for c in COORD_COLUMNS:
            v = row.get(c)
            if v is None or (isinstance(v, float) and math.isnan(v)):
                rec[c] = None
            elif c in ("x", "y", "z"):
                rec[c] = float(v)
            else:
                rec[c] = str(v)
        out.append(rec)
    return out


def load_study_coordinates_batch(batch: pa.Table) -> pa.Table:
    """Priority-resolved ``coordinates:list<struct>`` column from
    ``processed/*/coordinates.csv`` (first source in pubget > ace > db
    order wins, base.py:437-445). Runs in workers."""
    coords = []
    for row in batch.to_pylist():
        recs = None
        for src in SOURCE_PRIORITY:
            p = row.get(f"{src}_coordinates_path")
            if recs is None and p:
                recs = _coord_records(p)
        coords.append(recs)
    return batch.append_column("coordinates", pa.array(coords, COORD_TYPE))


def load_study_tables_batch(batch: pa.Table) -> pa.Table:
    """``tables:list<struct>`` column from the CSV-contents +
    info-JSON pairs (dataset.py:80-96): info fields typed, contents as
    canonical-JSON row records (utils.py:185-186). Runs in workers."""
    import pandas as pd

    tables_col = []
    for row in batch.to_pylist():
        manifest = row.get("tables_manifest")
        if not manifest:
            tables_col.append(None)
            continue
        entries = []
        for pair in json.loads(manifest):
            info = {}
            if pair.get("metadata"):
                with open(pair["metadata"]) as f:
                    info = json.load(f)
            contents_json = None
            if pair.get("contents"):
                try:
                    recs = pd.read_csv(pair["contents"]).to_dict("records")
                except pd.errors.EmptyDataError:
                    recs = []
                contents_json = json.dumps(
                    recs, sort_keys=True, separators=(",", ":"), default=str)
            nh = info.get("n_header_rows")
            entries.append({
                "table_number": pair["table_number"],
                "table_id": info.get("table_id"),
                "table_label": info.get("table_label"),
                "table_caption": info.get("table_caption"),
                "table_foot": info.get("table_foot"),
                "n_header_rows": int(nh) if nh is not None else None,
                "table_data_file": info.get("table_data_file"),
                "contents_json": contents_json,
            })
        tables_col.append(entries)
    return batch.append_column("tables", pa.array(tables_col, TABLES_TYPE))


def read_pond(root: str):
    """Pond -> Dataset with loaded text/metadata (priority-resolved),
    coordinates and source-table columns."""
    import ray.data as rd

    index = scan_pond(root)
    if not index:
        return rd.from_items([])
    ds = rd.from_arrow(pa.Table.from_pylist(index))
    return (
        ds.map_batches(load_study_content_batch, batch_format="pyarrow")
        .map_batches(load_study_coordinates_batch, batch_format="pyarrow")
        .map_batches(load_study_tables_batch, batch_format="pyarrow")
    )


def slice_studies(ds, ids, id_col: str = "dbid"):
    """``Dataset.slice(ids)`` analog (dataset.py:207-211): keep only
    rows whose id is in ``ids`` — the id set broadcast once (``ray.put``)
    and applied as a vectorized ``pc.is_in`` filter per batch (the
    resume anti-join shape with the polarity flipped). Works for any
    id column type."""
    import ray

    value_set = pa.array(sorted(set(ids)))
    ref = ray.put(value_set)

    def f(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ..stages.broadcast import get_broadcast

        return batch.filter(pc.is_in(batch[id_col],
                                     value_set=get_broadcast(ref)))

    return ds.map_batches(f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Upstream-pipeline output resolution (S4; dataset.py:243-331)
# ---------------------------------------------------------------------------

_VER_RE = re.compile(r"^\d+(?:\.\d+)*")


def _ver_key(v: str):
    m = _VER_RE.match(v)
    return tuple(int(x) for x in m.group(0).split(".")) if m else (0,)


def resolve_pipeline_dir(base: str, name: str, version: str = "latest",
                         config: str = "latest") -> str | None:
    """<base>/<name>/<version>/<config-hash> with 'latest' = max
    version (numeric-tuple order, parity with parse_version use at
    dataset.py:274-296) and 'latest' config = newest
    pipeline_info.json date (dataset.py:299-331)."""
    pdir = os.path.join(base, name)
    if not os.path.isdir(pdir):
        return None
    if version == "latest":
        versions = [v for v in os.listdir(pdir) if os.path.isdir(os.path.join(pdir, v))]
        if not versions:
            return None
        version = max(versions, key=_ver_key)
    vdir = os.path.join(pdir, version)
    if not os.path.isdir(vdir):
        return None
    if config == "latest":
        best, best_date = None, ""
        for c in os.listdir(vdir):
            info = os.path.join(vdir, c, "pipeline_info.json")
            if not os.path.exists(info):
                continue
            with open(info) as f:
                date = json.load(f).get("date", "")
            if date >= best_date:
                best, best_date = c, date
        config = best
    if config is None:
        return None
    cdir = os.path.join(vdir, config)
    return cdir if os.path.isdir(cdir) else None
