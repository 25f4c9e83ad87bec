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
