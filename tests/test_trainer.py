"""Trainer tests on the 8-device virtual CPU mesh: dp-sharded train step,
grad accumulation, loss decrease on a learnable synthetic task,
checkpoint save/resume."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_musiclm_tpu.core.sequence import TokenSequenceSpec
from open_musiclm_tpu.models.token_cond import StageLossConfig, TokenConditionedTransformer
from open_musiclm_tpu.parallel.mesh import make_mesh
from open_musiclm_tpu.train.trainer import StageTrainer, TrainState

CB = 16


def make_model():
    specs = (
        TokenSequenceSpec(CB, 2),
        TokenSequenceSpec(CB, 1),
    )
    return TokenConditionedTransformer(specs=specs, dim=32, depth=1, heads=2, dim_head=8)


def synthetic_batch(key, accum, batch, cond_len=6, pred_len=8):
    """Learnable task: pred tokens = (cond token 0) repeated."""
    k1, k2 = jax.random.split(key)
    cond = jax.random.randint(k1, (accum, batch, cond_len), 0, CB)
    pred = jnp.broadcast_to(cond[..., :1], (accum, batch, pred_len)) % CB
    return (cond, pred)


@pytest.fixture(scope="module")
def trainer_and_state(tmp_path_factory):
    model = make_model()
    mesh = make_mesh()  # 8 devices, dp=8
    trainer = StageTrainer(
        model=model,
        loss_cfg=StageLossConfig(cross_entropy_loss_weights=(0.0, 1.0), mask_prob=0.0),
        lr=3e-3,
        lr_warmup=5,
        grad_accum_every=2,
        mesh=mesh,
        results_folder=str(tmp_path_factory.mktemp("results")),
        stage_name="test",
    )

    def new_state():
        # fresh state per test: train_step donates its input state buffers
        ids = [jnp.zeros((1, 6), jnp.int32), jnp.zeros((1, 8), jnp.int32)]
        params = model.init(jax.random.PRNGKey(0), ids)
        return trainer.init_state(params)

    return trainer, new_state


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_train_step_runs_and_loss_decreases(trainer_and_state):
    trainer, new_state = trainer_and_state
    state = new_state()
    rng = jax.random.PRNGKey(1)
    losses = []
    for i in range(30):
        rng, bk, sk = jax.random.split(rng, 3)
        batch = synthetic_batch(bk, accum=2, batch=16)
        state, loss = trainer.train_step(state, batch, sk)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.8
    assert int(state.step) == 30


def test_eval_step_metrics(trainer_and_state):
    trainer, new_state = trainer_and_state
    state = new_state()
    batch = synthetic_batch(jax.random.PRNGKey(2), accum=1, batch=8)
    vb = tuple(b[0] for b in batch)
    loss, acc = trainer.eval_step(state, vb, jax.random.PRNGKey(3))
    assert np.isfinite(float(loss))
    assert 0.0 <= float(acc) <= 1.0


def test_checkpoint_roundtrip(trainer_and_state, tmp_path):
    trainer, new_state = trainer_and_state
    state = new_state()
    trainer.results_folder = str(tmp_path)
    trainer.save(state, int(state.step))
    path = trainer.checkpoint_path(int(state.step))
    model = trainer.model
    ids = [jnp.zeros((1, 6), jnp.int32), jnp.zeros((1, 8), jnp.int32)]
    params_like = model.init(jax.random.PRNGKey(0), ids)
    restored = trainer.load(path, params_like)
    assert int(restored.step) == int(state.step)
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))


def test_find_latest_checkpoint(tmp_path):
    from open_musiclm_tpu.checkpoint import find_latest_checkpoint, save_checkpoint

    for step in [10, 200, 30]:
        save_checkpoint(str(tmp_path / f"sem.transformer.{step}.ckpt"), {"x": np.ones(2)})
    best = find_latest_checkpoint(str(tmp_path), "sem.transformer")
    assert best is not None and best.endswith("sem.transformer.200.ckpt")


def test_batch_actually_sharded(trainer_and_state):
    trainer, _ = trainer_and_state
    batch = synthetic_batch(jax.random.PRNGKey(4), accum=1, batch=16)
    from jax.sharding import NamedSharding, PartitionSpec as P

    b = jax.device_put(batch[0], NamedSharding(trainer.mesh, P(None, "dp")))
    assert len(b.sharding.device_set) == 8


def test_preemption_guard_checkpoints(trainer_and_state, tmp_path):
    import os
    import signal

    trainer, new_state = trainer_and_state
    trainer.results_folder = str(tmp_path)
    state = new_state()

    def gen():
        i = 0
        while True:
            if i == 1:
                os.kill(os.getpid(), signal.SIGTERM)  # preempt after step 1
            i += 1
            yield synthetic_batch(jax.random.PRNGKey(i), accum=1, batch=8)

    out = trainer.train(
        state, gen(), num_steps=10, rng=jax.random.PRNGKey(0)
    )
    # stopped early and saved a checkpoint at the preemption step
    assert int(out.step) < 10
    from open_musiclm_tpu.checkpoint import find_latest_checkpoint

    assert find_latest_checkpoint(str(tmp_path), "test.transformer") is not None
