"""L6 CLI smoke test: scripts/train_stage.py end to end in a subprocess.

Covers the unified stage-training entry point (reference
scripts/train_semantic_stage.py) on the preprocessed-token path with a tiny
model geometry: JSONL + checkpoint outputs and the artifact_fn wiring
(predicted-token dumps at the save_results cadence)."""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

from tests.test_data import make_token_db

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.slow
def test_train_stage_cli_semantic(tmp_path):
    db_dir = tmp_path / "tokens"
    db_dir.mkdir()
    make_token_db(db_dir, n_tracks=8, seconds=12)

    mc = json.loads((REPO / "configs/model/musiclm_small.json").read_text())
    for cfg in ("semantic_cfg", "coarse_cfg", "fine_cfg"):
        mc[cfg].update(dim=32, depth=1, heads=2)
    (tmp_path / "model.json").write_text(json.dumps(mc))

    tc = json.loads(
        (REPO / "configs/training/train_musiclm_fma.json").read_text()
    )
    tc["semantic_trainer_cfg"].update(
        folder=str(db_dir),
        batch_size=8,  # dp=8 virtual devices -> batch must divide
        grad_accum_every=2,
        num_train_steps=3,
        save_results_every=2,
        save_model_every=2,
        lr_warmup=1,
        valid_frac=0.25,
        use_preprocessed_data=True,
    )
    (tmp_path / "train.json").write_text(json.dumps(tc))

    results = tmp_path / "results"
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=8",
        PYTHONPATH=str(REPO),
    )
    proc = subprocess.run(
        [
            sys.executable,
            "train_stage.py",
            "--stage", "semantic",
            "--model_config", str(tmp_path / "model.json"),
            "--training_config", str(tmp_path / "train.json"),
            "--results_folder", str(results),
            "--num_workers", "1",
        ],
        cwd=str(REPO / "scripts"),
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"

    log = results / "semantic.log.jsonl"
    assert log.exists(), proc.stderr
    records = [json.loads(l) for l in log.read_text().splitlines()]
    train_losses = [r["train_loss"] for r in records if "train_loss" in r]
    assert len(train_losses) == 3
    assert all(l == l and l > 0 for l in train_losses)  # finite, positive CE
    assert any("valid_loss" in r for r in records)

    # step-stamped checkpoint at save_model_every cadence
    assert (results / "semantic.transformer.2.ckpt").exists()
    # artifact_fn: predicted-token dump at the save_results cadence
    assert (results / "semantic.tokens.2.txt").exists()
    tokens_txt = (results / "semantic.tokens.2.txt").read_text()
    assert "predicted:" in tokens_txt and "accuracy:" in tokens_txt
