"""Tensor-parallel sharding tests: rule application, dp x tp training step
equivalence with the dp-only result."""

import jax
import jax.numpy as jnp
import numpy as np

from open_musiclm_tpu.core.sequence import TokenSequenceSpec
from open_musiclm_tpu.models.token_cond import StageLossConfig, TokenConditionedTransformer
from open_musiclm_tpu.parallel.mesh import MODEL_AXIS, make_mesh
from open_musiclm_tpu.parallel.sharding import param_shardings, shard_params
from open_musiclm_tpu.train.trainer import StageTrainer

CB = 16


def make_model():
    specs = (TokenSequenceSpec(CB, 2), TokenSequenceSpec(CB, 1))
    return TokenConditionedTransformer(specs=specs, dim=32, depth=1, heads=2, dim_head=8)


def init_params(model):
    ids = [jnp.zeros((1, 6), jnp.int32), jnp.zeros((1, 8), jnp.int32)]
    return model.init(jax.random.PRNGKey(0), ids)


def test_param_shardings_rules():
    model = make_model()
    params = init_params(model)
    mesh = make_mesh(dp=4, tp=2)
    sh = param_shardings(mesh, params)
    flat = dict(
        (
            "/".join(str(getattr(k, "key", k)) for k in path),
            s.spec,
        )
        for path, s in jax.tree_util.tree_flatten_with_path(sh)[0]
    )
    # column-parallel to_q, row-parallel to_out
    to_q = [v for k, v in flat.items() if "to_q/kernel" in k][0]
    to_out = [v for k, v in flat.items() if "to_out/kernel" in k][0]
    assert to_q == (None, MODEL_AXIS)
    assert to_out == (MODEL_AXIS, None)
    # norms replicated
    gamma = [v for k, v in flat.items() if "gamma" in k][0]
    assert gamma == ()


def test_tp_params_actually_sharded():
    model = make_model()
    params = init_params(model)
    mesh = make_mesh(dp=4, tp=2)
    sharded = shard_params(mesh, params)
    q = sharded["params"]["transformer"]["attn_0"]["to_q"]["kernel"]
    # each device holds half the output columns
    shard_shapes = {s.data.shape for s in q.addressable_shards}
    assert shard_shapes == {(32, 8)}  # full (32, 16) split over tp=2


def test_tp_training_matches_dp_only():
    model = make_model()
    cfg = StageLossConfig(cross_entropy_loss_weights=(0.0, 1.0), mask_prob=0.0)

    def run(mesh):
        trainer = StageTrainer(
            model=model, loss_cfg=cfg, lr=1e-3, grad_accum_every=1, mesh=mesh,
            results_folder="/tmp/tp_test", stage_name="tp",
        )
        state = trainer.init_state(init_params(model))
        rng = jax.random.PRNGKey(1)
        losses = []
        for i in range(3):
            k1 = jax.random.fold_in(jax.random.PRNGKey(2), i)
            cond = jax.random.randint(k1, (1, 8, 6), 0, CB)
            pred = jax.random.randint(jax.random.fold_in(k1, 1), (1, 8, 8), 0, CB)
            state, loss = trainer.train_step(state, (cond, pred), jax.random.fold_in(rng, i))
            losses.append(float(loss))
        return losses

    dp_losses = run(make_mesh(dp=8, tp=1))
    tp_losses = run(make_mesh(dp=4, tp=2))
    np.testing.assert_allclose(dp_losses, tp_losses, rtol=2e-4)
