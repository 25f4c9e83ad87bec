"""The flagship pipeline: Common-Crawl-style pages -> dedup-by-url ->
extract -> (url, extracted_text, spans, metadata, counters), optionally
written as resumable partitioned Parquet with per-partition manifests.

Shape (north rule):

    read_parquet(pages)                       # columns pruned at the read
      -> map_batches(partial_dedup)           # combiner: drop within-batch
                                              #   stale fetches (cheap, cuts
                                              #   shuffle volume when dups
                                              #   arrive co-located)
      -> groupby(url).map_groups(latest)      # THE shuffle: url is the one
                                              #   partitioning key
      -> map_batches(ExtractActor, ...)       # stateful actor pool
      [-> per-part atomic write + manifest]   # resumable sink

Scale notes: the single all-to-all exchange is the groupby on ``url``
(semantically required by dedup); the partial-dedup combiner shrinks it
and the extract stage streams block-by-block after it with backpressure.
For the manifest sink the partition key is ``hash(url) % num_parts`` —
a deterministic function of the data, so reruns/retries produce
identical part files and resume is a part-id anti-join
(state/manifest.py). Oversized html blobs are bounded per-batch by
``batch_size`` rows and Ray's target block size; the one multi-MB blob
in the synthetic corpus rides through a normal batch.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.extract import ExtractActor, PARSER_VERSION, extract_batch
from ..state import manifest as mf


def _url_hash_mod(urls: pa.ChunkedArray | pa.Array, mod: int) -> pa.Array:
    """Deterministic (process-independent) url -> bucket in [0, mod)."""
    out = np.empty(len(urls), dtype=np.int64)
    for i, u in enumerate(urls.to_pylist()):
        h = hashlib.blake2b(u.encode("utf-8"), digest_size=8).digest()
        out[i] = int.from_bytes(h, "little") % mod
    return pa.array(out, pa.int64())


def partial_dedup_batch(batch: pa.Table) -> pa.Table:
    """Within-batch combiner: keep only the latest warc_ts per url.
    Correctness is unaffected (the groupby finishes the job); this only
    shrinks the shuffle."""
    if batch.num_rows == 0:
        return batch
    df_idx = pa.table(
        {
            "url": batch["url"],
            "warc_ts": batch["warc_ts"],
            "_i": pa.array(np.arange(batch.num_rows), pa.int64()),
        }
    ).to_pandas()
    keep = df_idx.sort_values(["url", "warc_ts", "_i"]).groupby("url", sort=False).tail(1)["_i"].to_numpy()
    keep.sort()
    return batch.take(pa.array(keep))


def dedup_group(group: pd.DataFrame) -> pd.DataFrame:
    """Per-url group: latest warc_ts wins (ties broken stably by last
    occurrence — matches 'newest result wins', base.py:342-370)."""
    return group.sort_values("warc_ts", kind="stable").tail(1)


def dedup_pages(ds):
    """groupby-url dedup-then-extract, dedup half."""
    ds = ds.map_batches(partial_dedup_batch, batch_format="pyarrow")
    return ds.groupby("url").map_groups(dedup_group, batch_format="pandas")


def extract_pages(
    ds,
    payload_column: str = "html",
    mode: str = "auto",
    concurrency=(2, 8),
    batch_size: int = 64,
):
    """The stateful extract stage as an autoscaling actor pool."""
    return ds.map_batches(
        ExtractActor,
        fn_constructor_kwargs={"payload_column": payload_column, "mode": mode},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def flagship_dataset(pages_ds, mode: str = "auto", payload_column: str = "html",
                     concurrency=(2, 8), batch_size: int = 64):
    """pages Dataset -> extracted Dataset (no sink). Streaming end to end."""
    return extract_pages(
        dedup_pages(pages_ds),
        payload_column=payload_column,
        mode=mode,
        concurrency=concurrency,
        batch_size=batch_size,
    )


# ---------------------------------------------------------------------------
# Resumable sink: deterministic parts + manifests
# ---------------------------------------------------------------------------


class _PartWriter:
    """Per-part processor used inside groupby(part).map_groups: final
    url-dedup, extract, sort, atomic write + manifest. Runs only for
    parts missing from the manifest dir (resume)."""

    def __init__(self, run_dir: str, input_path: str, payload_column: str, mode: str):
        self.run_dir = run_dir
        self.input_path = input_path
        self.payload_column = payload_column
        self.mode = mode

    def __call__(self, group: pa.Table) -> pa.Table:
        part = int(group["part"][0].as_py())
        # final dedup within the part (all fetches of a url share a part)
        pdf = pa.table(
            {
                "url": group["url"],
                "warc_ts": group["warc_ts"],
                "_i": pa.array(np.arange(group.num_rows), pa.int64()),
            }
        ).to_pandas()
        keep = (
            pdf.sort_values(["url", "warc_ts", "_i"], kind="stable")
            .groupby("url", sort=False)
            .tail(1)
            .sort_values("url")["_i"]
            .to_numpy()
        )
        deduped = group.take(pa.array(keep))
        out = extract_batch(
            deduped, payload_column=self.payload_column, mode=self.mode,
            keep_columns=("url", "warc_ts"),
        )
        n_fail = pc.sum(pc.cast(out["parse_failed"], pa.int64())).as_py() or 0
        n_empty = pc.sum(pc.cast(out["empty"], pa.int64())).as_py() or 0
        urls = out["url"].to_pylist()
        manifest = mf.write_part(
            self.run_dir,
            part,
            out,
            {
                "input_file": self.input_path,
                "url_range": [min(urls), max(urls)] if urls else None,
                "input_rows": group.num_rows,
                "parser_version": PARSER_VERSION,
                "n_ok": out.num_rows - n_fail - n_empty,
                "n_parse_failed": n_fail,
                "n_empty": n_empty,
            },
        )
        return pa.table(
            {
                "partition_id": pa.array([part], pa.int64()),
                "rows": pa.array([manifest["rows"]], pa.int64()),
                "n_parse_failed": pa.array([n_fail], pa.int64()),
                "n_empty": pa.array([n_empty], pa.int64()),
            }
        )


def run_flagship_to_parquet(
    pages_ds,
    out_dir: str,
    num_parts: int = 16,
    payload_column: str = "html",
    mode: str = "auto",
    input_path: str = "<inline>",
    config: dict | None = None,
):
    """Resumable run: write <out>/<config-hash>/parts/part-*.parquet +
    manifests. Returns (run_dir, per-part summary DataFrame). A re-run
    with the same config skips completed parts (manifest anti-join).
    """
    import os

    from ..functions.hashing import config_hash

    config = dict(config or {})
    config.setdefault("num_parts", num_parts)
    config.setdefault("parser_version", PARSER_VERSION)
    config.setdefault("mode", mode)
    run_id = config_hash(config)
    run_dir = os.path.join(out_dir, run_id)
    mf.write_pipeline_info(run_dir, {"config": config, "run_id": run_id})
    done = mf.completed_parts(run_dir)

    ds = pages_ds.map_batches(
        lambda b: b.append_column("part", _url_hash_mod(b["url"], num_parts)),
        batch_format="pyarrow",
    )
    if done:
        done_arr = np.array(sorted(done), dtype=np.int64)
        ds = ds.map_batches(
            lambda b: b.filter(
                pa.array(~np.isin(b["part"].to_numpy(zero_copy_only=False), done_arr))
            ),
            batch_format="pyarrow",
        )
    writer = _PartWriter(run_dir, input_path, payload_column, mode)

    def write_part_group(group: pa.Table) -> pa.Table:
        return writer(group)

    summary = ds.groupby("part").map_groups(write_part_group, batch_format="pyarrow")
    sdf = summary.to_pandas()  # small: one row per partition
    return run_dir, sdf
