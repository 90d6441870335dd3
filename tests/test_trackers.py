"""Tracker surface: optional wandb (stubbed — not installed here), audio
artifact logging, and the trainer's artifact_logits step.

Mirrors the reference's optional wandb tracker + audio artifacts
(trainer.py:38-41, 348-351, 481-526).
"""

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_musiclm_tpu.models.token_cond import StageLossConfig
from open_musiclm_tpu.parallel.mesh import make_mesh
from open_musiclm_tpu.train.trainer import StageTrainer
from tests.test_trainer import CB, make_model, synthetic_batch


class _FakeRun:
    def __init__(self):
        self.records = []

    def log(self, data, step=None):
        self.records.append((step, data))


class _FakeAudio:
    def __init__(self, data, sample_rate=None, caption=None):
        self.data = np.asarray(data)
        self.sample_rate = sample_rate


@pytest.fixture
def fake_wandb(monkeypatch):
    mod = types.ModuleType("wandb")
    runs = []

    def init(**kwargs):
        run = _FakeRun()
        run.init_kwargs = kwargs
        runs.append(run)
        return run

    mod.init = init
    mod.Audio = _FakeAudio
    monkeypatch.setitem(sys.modules, "wandb", mod)
    return runs


def make_trainer(tmp_path, **kw):
    return StageTrainer(
        model=make_model(),
        loss_cfg=StageLossConfig(cross_entropy_loss_weights=(0.0, 1.0), mask_prob=0.0),
        mesh=make_mesh(),
        results_folder=str(tmp_path),
        stage_name="trk",
        use_tensorboard=False,
        **kw,
    )


def test_wandb_tracker_logs_scalars_and_audio(tmp_path, fake_wandb):
    trainer = make_trainer(
        tmp_path, use_wandb=True, wandb_run_config={"lr": 3e-4}
    )
    assert len(fake_wandb) == 1
    run = fake_wandb[0]
    assert run.init_kwargs["config"] == {"lr": 3e-4}

    trainer.log(3, train_loss=1.25)
    assert run.records[-1] == (3, {"train_loss": 1.25})

    waves = np.zeros((2, 100), np.float32)
    trainer.log_audio(7, "recon", waves, sample_rate=24000)
    step, data = run.records[-1]
    assert step == 7
    assert len(data["recon"]) == 2
    assert data["recon"][0].sample_rate == 24000

    # JSONL sink stays primary alongside wandb
    log = (tmp_path / "trk.log.jsonl").read_text()
    assert "train_loss" in log


def test_wandb_absent_is_noop(tmp_path, monkeypatch):
    # simulate uninstalled wandb even if some env provides it
    monkeypatch.setitem(sys.modules, "wandb", None)
    trainer = make_trainer(tmp_path, use_wandb=True)
    assert trainer._wandb is None
    trainer.log(0, train_loss=1.0)  # must not raise
    trainer.log_audio(0, "recon", np.zeros(10, np.float32), sample_rate=24000)


def test_artifact_logits_shapes(tmp_path):
    trainer = make_trainer(tmp_path)
    ids = [jnp.zeros((1, 6), jnp.int32), jnp.zeros((1, 8), jnp.int32)]
    params = trainer.model.init(jax.random.PRNGKey(0), ids)
    state = trainer.init_state(params)
    batch = tuple(b[0] for b in synthetic_batch(jax.random.PRNGKey(1), 1, 8))
    logits, labels = trainer.artifact_logits(state, batch, jax.random.PRNGKey(2))
    # final sequence: pred_len tokens + appended EOS label
    assert labels.shape == (8, 9)
    assert logits.shape[:2] == (8, 9)
    pred = jnp.argmax(logits, axis=-1)
    assert pred.shape == labels.shape


def test_reconstructed_wave_returns_waves(tmp_path):
    from open_musiclm_tpu.models.encodec import EncodecModel
    from open_musiclm_tpu.train.artifacts import save_reconstructed_wave

    codec = EncodecModel(
        sample_rate=60, ratios=(2, 2), num_quantizers=4, codebook_size=CB,
        dimension=8, n_filters=2,
    )
    codec_params = codec.init(jax.random.PRNGKey(0), jnp.zeros((1, 240)))
    pred = jax.random.randint(jax.random.PRNGKey(1), (2, 12 * 2), 0, CB)
    paths, waves = save_reconstructed_wave(
        "coarse", pred, None, codec, codec_params, 2, 2, str(tmp_path), step=5
    )
    assert len(paths) == 2 and all(p.endswith(".wav") for p in paths)
    assert waves.shape[0] == 2 and np.all(np.isfinite(np.asarray(waves)))
    assert save_reconstructed_wave(
        "semantic", pred, None, codec, codec_params, 2, 2, str(tmp_path), 5
    ) is None
