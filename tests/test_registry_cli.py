"""Registry, YAML config runner, CLI surface."""

import json
import os
import subprocess
import sys

import pytest

from neurostore_text_extraction_ray.pipelines import registry

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(not os.path.isdir(SF), reason="testdata unavailable")


def test_registry_contents():
    ops = registry.list_ops()
    for name in ("word_count", "tfidf", "dedup_exact", "events_hourly"):
        assert name in ops


def test_camel_to_snake():
    assert registry.camel_to_snake("WordCountExtractor") == "word_count_extractor"
    assert registry.camel_to_snake("TFIDFExtractor") == "tfidf_extractor"


def test_run_config_yaml(ray_session, tmp_path):
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(
        "pipelines:\n"
        "  - name: word_count\n"
        "  - name: tfidf\n"
        "    args: {min_df: 3}\n"
    )
    out = registry.run_config(str(cfg), SF, str(tmp_path / "out"))
    assert set(out) == {"word_count", "tfidf"}
    for name, dest in out.items():
        # versioned, config-hashed layout: <name>/<version>/<12-hex>
        parts = dest.split(os.sep)
        assert parts[-3] == name
        assert len(parts[-1]) == 12
        files = os.listdir(dest)
        assert any(f.endswith(".parquet") for f in files)
    # different args -> different hash dir
    h1 = registry.run_config.__wrapped__ if hasattr(registry.run_config, "__wrapped__") else None
    from neurostore_text_extraction_ray.functions.hashing import config_hash

    assert config_hash({"name": "tfidf", "min_df": 3}) != config_hash({"name": "tfidf"})


def test_cli_list():
    out = subprocess.run(
        [sys.executable, "-m", "neurostore_text_extraction_ray.cli", "--list"],
        capture_output=True, text=True, cwd="/root/repo", check=True,
    ).stdout
    assert "word_count" in out


def test_cli_runs_pipeline(tmp_path):
    out = subprocess.run(
        [sys.executable, "-m", "neurostore_text_extraction_ray.cli",
         "--sf-dir", SF, "--out", str(tmp_path), "--pipelines", "word_count",
         "--num-cpus", "2"],
        capture_output=True, text=True, cwd="/root/repo", check=True, timeout=180,
    ).stdout
    res = json.loads(out.strip().splitlines()[-1])
    assert "word_count" in res
    assert os.path.isdir(res["word_count"])


def test_rerun_same_config_no_new_hash_dir(ray_session, tmp_path):
    """Incremental parity (reference test_word_count.py:81-83): a rerun
    with identical config reuses the same hash dir — no new dirs."""
    cfg = tmp_path / "c.yaml"
    cfg.write_text("pipelines:\n  - name: word_count\n")
    out = tmp_path / "out"
    registry.run_config(str(cfg), SF, str(out))
    dirs1 = set((out / "word_count" / "1.0.0").iterdir())
    registry.run_config(str(cfg), SF, str(out))
    dirs2 = set((out / "word_count" / "1.0.0").iterdir())
    assert dirs1 == dirs2 and len(dirs1) == 1


def test_dependent_op_hash_includes_input(tmp_path):
    """Corpus-global ops hash the input identity (base.py:646-669
    analog): different sf dirs -> different hash dirs."""
    from neurostore_text_extraction_ray.functions.hashing import config_hash
    from neurostore_text_extraction_ray.state.manifest import input_fingerprint

    assert registry._REGISTRY["tfidf"]["dependent"] is True
    assert registry._REGISTRY["word_count"].get("dependent", False) is False
    f1 = input_fingerprint("/root/testdata/sf0.001")
    f2 = input_fingerprint("/root/testdata/sf0.01")
    assert f1 != f2
    assert config_hash({"name": "tfidf", "input_fingerprint": f1}) != config_hash(
        {"name": "tfidf", "input_fingerprint": f2}
    )


# -- Post-process modes + overwrite interplay (cli/run.py:156-216,
#    base.py:174-215) --------------------------------------------------------


def _read_groups(dest):
    import glob

    import pandas as pd
    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(dest, "*.parquet")))
    df = pq.ParquetDataset(files).read().to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


def test_post_process_modes(ray_session, tmp_path):
    """All three modes: full, --no-post-process (raw only), then
    --post-process-only over the raw output reproduces the full run."""
    entries = [("llm_demographics", {})]
    full = registry.run_entries(entries, SF, str(tmp_path / "full"))
    full_df = _read_groups(full["llm_demographics"])

    raw = registry.run_entries(entries, SF, str(tmp_path / "stage"),
                               post_process=False)
    raw_df = _read_groups(raw["llm_demographics"])
    # raw run: no cleaned/raw split — groups carry the raw extraction
    assert (raw_df["groups_raw_json"] == "null").all()
    assert not raw_df["groups_json"].equals(full_df["groups_json"])

    only = registry.run_entries(entries, SF, str(tmp_path / "stage"),
                                post_process="only")
    only_df = _read_groups(only["llm_demographics"])
    # post-process-only over the raw output == the full pipeline
    assert only_df["groups_json"].equals(full_df["groups_json"])
    assert only_df["groups_raw_json"].equals(full_df["groups_raw_json"])
    assert only_df["is_patient_study"].equals(full_df["is_patient_study"])


def test_post_process_only_idempotent(ray_session, tmp_path):
    """post-process-only over already-cleaned output is a no-op (the
    ladder is idempotent; raw-first-else-results fallback)."""
    entries = [("llm_demographics", {})]
    full = registry.run_entries(entries, SF, str(tmp_path))
    before = _read_groups(full["llm_demographics"])
    again = registry.run_entries(entries, SF, str(tmp_path), post_process="only")
    after = _read_groups(again["llm_demographics"])
    assert before.equals(after)


def test_skip_existing_unless_overwrite(ray_session, tmp_path):
    """Default rerun skips an existing output dir; --overwrite reruns
    (base.py:157-162 short-circuit analog)."""
    import glob

    entries = [("word_count", {})]
    out = registry.run_entries(entries, SF, str(tmp_path))
    dest = out["word_count"]
    files1 = {f: os.path.getmtime(f) for f in glob.glob(os.path.join(dest, "*.parquet"))}
    registry.run_entries(entries, SF, str(tmp_path))  # skip
    files2 = {f: os.path.getmtime(f) for f in glob.glob(os.path.join(dest, "*.parquet"))}
    assert files1 == files2
    registry.run_entries(entries, SF, str(tmp_path), overwrite=True)
    files3 = set(glob.glob(os.path.join(dest, "*.parquet")))
    assert files3  # rewritten (fresh part files)


def test_post_process_only_without_prior_is_noop(ray_session, tmp_path):
    """'only' with no existing output: warns and leaves nothing (the
    reference returns with a warning, base.py:211-214)."""
    import glob

    out = registry.run_entries([("llm_demographics", {})], SF, str(tmp_path),
                               post_process="only")
    assert not glob.glob(os.path.join(out["llm_demographics"], "*.parquet"))


def test_cli_post_process_flags(tmp_path):
    """Subprocess e2e: --no-post-process then --post-process-only on
    the same output tree."""
    base_cmd = [sys.executable, "-m", "neurostore_text_extraction_ray.cli",
                "--sf-dir", SF, "--out", str(tmp_path),
                "--pipelines", "llm_demographics", "--num-cpus", "4"]
    out1 = subprocess.run(base_cmd + ["--no-post-process"], capture_output=True,
                          text=True, cwd="/root/repo", check=True, timeout=300).stdout
    dest = json.loads(out1.strip().splitlines()[-1])["llm_demographics"]
    raw_df = _read_groups(dest)
    assert (raw_df["groups_raw_json"] == "null").all()
    subprocess.run(base_cmd + ["--post-process-only"], capture_output=True,
                   text=True, cwd="/root/repo", check=True, timeout=300)
    pp_df = _read_groups(dest)
    # cleaned now differs from the raw run wherever the ladder fired
    assert not pp_df["groups_json"].equals(raw_df["groups_json"])
    # mutually exclusive flags rejected
    bad = subprocess.run(base_cmd + ["--no-post-process", "--post-process-only"],
                         capture_output=True, text=True, cwd="/root/repo")
    assert bad.returncode != 0


def test_pipeline_on_pipeline_dependency(ray_session, tmp_path):
    """Reference _input_pipelines analog: entity_linking_chained reads
    the STORED llm_demographics output (resolved latest version/config)
    and reproduces the inline entity_linking query exactly; running it
    without its upstream is tolerated (skipped with None)."""
    # missing upstream -> skipped
    out0 = registry.run_entries([("entity_linking_chained", {})], SF,
                                str(tmp_path / "solo"))
    assert out0["entity_linking_chained"] is None

    out = registry.run_entries(
        [("llm_demographics", {}), ("entity_linking_chained", {})],
        SF, str(tmp_path / "chain"))
    assert out["entity_linking_chained"] is not None
    # upstream dir recorded in the run manifest (S6)
    info = json.load(open(os.path.join(out["entity_linking_chained"],
                                       "pipeline_info.json")))
    assert info["upstream_dirs"]["llm_demographics"] == out["llm_demographics"]

    chained = _read_groups(out["entity_linking_chained"])  # sorted by doc_id
    from neurostore_text_extraction_ray.pipelines.extras import _entity_linking

    inline = (_entity_linking(SF).to_pandas()
              .sort_values("doc_id").reset_index(drop=True))
    assert chained["entities_json"].equals(inline["entities_json"])
    assert (chained["entities_json"] != "[]").any()  # non-trivial content


def test_incomplete_output_dir_reruns(ray_session, tmp_path):
    """A dest with parquet files but no pipeline_info.json (a run
    killed mid-move) must rerun, never be served as complete."""
    import glob

    entries = [("word_count", {})]
    out = registry.run_entries(entries, SF, str(tmp_path))
    dest = out["word_count"]
    os.remove(os.path.join(dest, "pipeline_info.json"))
    victim = sorted(glob.glob(os.path.join(dest, "*.parquet")))[0]
    os.remove(victim)  # simulate partial move
    registry.run_entries(entries, SF, str(tmp_path))  # no overwrite flag
    assert os.path.exists(os.path.join(dest, "pipeline_info.json"))
    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(dest, "*.parquet")))
    assert pq.ParquetDataset(files).read().num_rows == 500  # complete again


def test_corrupt_pipeline_info_falls_back_to_rerun(ray_session, tmp_path):
    """A corrupt/hand-edited pipeline_info.json must make the next run
    rerun (safe default) instead of crashing (ADVICE r03 #3)."""
    entries = [("llm_demographics", {})]
    out = registry.run_entries(entries, SF, str(tmp_path))
    dest = out["llm_demographics"]
    info_path = os.path.join(dest, "pipeline_info.json")
    with open(info_path, "w") as fh:
        fh.write("{not json")
    out2 = registry.run_entries(entries, SF, str(tmp_path))
    assert out2["llm_demographics"] == dest
    json.load(open(info_path))  # rewritten valid by the rerun


def test_chained_tolerates_partial_upstream_rows(ray_session, tmp_path):
    """Reference warn-and-continue on missing per-study upstream results
    (dataset.py:349-382): if the stored upstream output covers only SOME
    doc_ids, the chained op completes with exactly the surviving ids
    instead of assuming full coverage (VERDICT r03 next-round #6)."""
    import glob

    import pyarrow.parquet as pq

    out = registry.run_entries(
        [("llm_demographics", {}), ("entity_linking_chained", {})],
        SF, str(tmp_path))
    up_dir = out["llm_demographics"]
    files = sorted(glob.glob(os.path.join(up_dir, "*.parquet")))
    full = pq.ParquetDataset(files).read()
    keep_mask = [int(d) % 7 != 0 for d in full["doc_id"].to_pylist()]
    import pyarrow as pa

    pruned = full.filter(pa.array(keep_mask))
    assert 0 < pruned.num_rows < full.num_rows
    for f in files:
        os.remove(f)
    pq.write_table(pruned, os.path.join(up_dir, "part-pruned.parquet"))
    # content fingerprint changed -> the chained op reruns in a fresh
    # hash dir over the pruned upstream
    out2 = registry.run_entries([("entity_linking_chained", {})], SF,
                                str(tmp_path))
    chained = _read_groups(out2["entity_linking_chained"])
    surviving = sorted(d for d in full["doc_id"].to_pylist() if int(d) % 7 != 0)
    assert chained["doc_id"].tolist() == surviving


def test_chained_invalidates_on_upstream_overwrite(ray_session, tmp_path):
    """The chained op hashes the upstream CONTENT fingerprint: after
    the upstream is overwritten in place, a rerun lands in a fresh
    hash dir instead of serving stale linked entities."""
    import time

    entries = [("llm_demographics", {}), ("entity_linking_chained", {})]
    out1 = registry.run_entries(entries, SF, str(tmp_path))
    d1 = out1["entity_linking_chained"]
    time.sleep(0.02)  # ensure distinct mtime_ns on rewrite
    registry.run_entries([("llm_demographics", {})], SF, str(tmp_path),
                         overwrite=True)
    out2 = registry.run_entries([("entity_linking_chained", {})], SF,
                                str(tmp_path))
    assert out2["entity_linking_chained"] != d1  # fresh hash dir


def test_unknown_pipeline_raises_configuration_error(tmp_path):
    from neurostore_text_extraction_ray.exceptions import (
        ConfigurationError, PipelineError)

    with pytest.raises(ConfigurationError) as ei:
        registry.run_entries([("no_such_op", {})], SF, str(tmp_path))
    assert isinstance(ei.value, PipelineError)  # reference hierarchy
    assert "no_such_op" in str(ei.value)


def test_reference_pipeline_name_aliases(ray_session, tmp_path):
    """A reference user's pipeline names work at the CLI/registry
    (cli/run.py:13-33 name map): participant_demographics, task,
    semantic_embeddings, umls_disease run the engine ops."""
    ops = registry.list_ops()
    for name, version in [("participant_demographics", "1.1.0"),
                          ("task", "1.1.0"), ("semantic_embeddings", "1.0.0"),
                          ("umls_disease", "1.0.0")]:
        assert ops[name] == version
    out = registry.run_entries([("participant_demographics", {})], SF,
                               str(tmp_path))
    df = _read_groups(out["participant_demographics"])
    assert len(df) == 500 and "groups_json" in df.columns


def test_post_process_mode_mismatch_reruns(ray_session, tmp_path):
    """A complete --no-post-process dir must NOT be served as current
    by a default (post-processed) rerun (ADVICE r02 #2): the stored
    post_processed state gates the skip."""
    entries = [("llm_demographics", {})]
    raw = registry.run_entries(entries, SF, str(tmp_path), post_process=False)
    raw_df = _read_groups(raw["llm_demographics"])
    assert (raw_df["groups_raw_json"] == "null").all()
    # old behavior: skip-unless-overwrite served the raw output here
    full = registry.run_entries(entries, SF, str(tmp_path))
    full_df = _read_groups(full["llm_demographics"])
    assert not full_df["groups_json"].equals(raw_df["groups_json"])
    assert not (full_df["groups_raw_json"] == "null").all()
    import json

    with open(os.path.join(full["llm_demographics"], "pipeline_info.json")) as f:
        assert json.load(f)["post_processed"] is True


def test_promotion_crash_window_leaves_incomplete(ray_session, tmp_path,
                                                  monkeypatch):
    """A crash between data promotion and the manifest write leaves the
    dir WITHOUT pipeline_info.json (ADVICE r02 #1: the marker is
    retracted before data is replaced), so the next run reruns instead
    of serving a mixed dir."""
    from neurostore_text_extraction_ray.state import manifest as mf

    entries = [("word_count", {})]
    out = registry.run_entries(entries, SF, str(tmp_path))
    dest = out["word_count"]
    assert os.path.exists(os.path.join(dest, "pipeline_info.json"))

    def boom(*a, **k):
        raise RuntimeError("simulated crash before manifest write")

    monkeypatch.setattr(mf, "write_pipeline_info", boom)
    try:
        registry.run_entries(entries, SF, str(tmp_path), overwrite=True)
    except RuntimeError:
        pass
    # marker retracted -> dir reads as incomplete
    assert not os.path.exists(os.path.join(dest, "pipeline_info.json"))
    monkeypatch.undo()
    again = registry.run_entries(entries, SF, str(tmp_path))  # no overwrite
    assert os.path.exists(os.path.join(again["word_count"],
                                       "pipeline_info.json"))
