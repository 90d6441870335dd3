"""Multi-chip inference: generation with the batch sharded over the dp mesh
axis must produce exactly the per-example results of unsharded generation
(prompt-parallel serving across chips)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from open_musiclm_tpu.core.sequence import TokenSequenceSpec
from open_musiclm_tpu.models.token_cond import TokenConditionedTransformer, generate
from open_musiclm_tpu.parallel.mesh import make_mesh

CB = 16


def test_generate_with_dp_sharded_batch():
    model = TokenConditionedTransformer(
        specs=(TokenSequenceSpec(CB, 2), TokenSequenceSpec(CB, 1)),
        dim=32, depth=1, heads=2, dim_head=8,
    )
    ids = [jnp.zeros((1, 6), jnp.int32), jnp.zeros((1, 5), jnp.int32)]
    params = model.init(jax.random.PRNGKey(0), ids)
    cond = jax.random.randint(jax.random.PRNGKey(1), (8, 6), 0, CB)

    fn = jax.jit(
        lambda p, c, k: generate(model, p, [c], k, max_time_steps=4, temperature=0.0)
    )
    expected = np.asarray(fn(params, cond, jax.random.PRNGKey(2)))

    mesh = make_mesh(dp=8)
    cond_sharded = jax.device_put(cond, NamedSharding(mesh, P("dp", None)))
    params_rep = jax.device_put(params, NamedSharding(mesh, P()))
    got = np.asarray(fn(params_rep, cond_sharded, jax.random.PRNGKey(2)))

    np.testing.assert_array_equal(expected, got)


def test_generate_with_tp_sharded_params():
    """Tensor-parallel serving: params sharded by the tp rules (column/row
    parallel attention+FF, vocab-sharded embeddings) must generate exactly
    the replicated path's tokens — GSPMD inserts the activation collectives
    through the whole KV-cached decode scan."""
    from open_musiclm_tpu.parallel.sharding import shard_params

    model = TokenConditionedTransformer(
        specs=(TokenSequenceSpec(CB, 2), TokenSequenceSpec(CB, 1)),
        dim=32, depth=2, heads=2, dim_head=8,
    )
    ids = [jnp.zeros((1, 6), jnp.int32), jnp.zeros((1, 5), jnp.int32)]
    params = model.init(jax.random.PRNGKey(0), ids)
    cond = jax.random.randint(jax.random.PRNGKey(1), (8, 6), 0, CB)

    fn = jax.jit(
        lambda p, c, k: generate(model, p, [c], k, max_time_steps=4, temperature=0.0)
    )
    expected = np.asarray(fn(params, cond, jax.random.PRNGKey(2)))

    mesh = make_mesh(dp=4, tp=2)
    params_tp = shard_params(mesh, params)
    cond_sharded = jax.device_put(cond, NamedSharding(mesh, P("dp", None)))
    got = np.asarray(fn(params_tp, cond_sharded, jax.random.PRNGKey(2)))

    np.testing.assert_array_equal(expected, got)


def test_quantized_flash_generate_on_mesh():
    """Multi-chip int8 serving: Stage.generate(mesh=...) shard_maps the
    Pallas int8 decode path over dp; with per-row keys every row must equal
    the unsharded run exactly (row i depends only on its own key)."""
    import dataclasses as dc

    from open_musiclm_tpu.models.stages import Stage
    from open_musiclm_tpu.models.token_cond import StageLossConfig

    model = TokenConditionedTransformer(
        specs=(TokenSequenceSpec(CB, 2), TokenSequenceSpec(CB, 1)),
        dim=32, depth=2, heads=2, dim_head=8,
    )
    ids = [jnp.zeros((1, 6), jnp.int32), jnp.zeros((1, 5), jnp.int32)]
    params = model.init(jax.random.PRNGKey(0), ids)
    stage = Stage(
        model, params, StageLossConfig(cross_entropy_loss_weights=(0.0, 1.0)),
        quantized=True, flash_kv="int8",
    )
    cond = [jax.random.randint(jax.random.PRNGKey(1), (8, 6), 0, CB)]
    row_keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(8))

    expected = np.asarray(
        stage.generate(cond, None, max_time_steps=4, per_row_keys=row_keys)
    )
    mesh = make_mesh(dp=8)
    got = np.asarray(
        stage.generate(
            cond, None, max_time_steps=4, per_row_keys=row_keys, mesh=mesh
        )
    )
    np.testing.assert_array_equal(expected, got)


def test_musiclm_serving_mesh_end_to_end():
    """MusicLM.generate with serving_mesh set: the full 3-stage pipeline
    (int8 + flash int8 stages) sharded over dp produces the same waveform
    as the unsharded pipeline for the same per-row keys."""
    import dataclasses as dc

    import tests.test_musiclm as m
    from tests.test_musiclm import GEN_KW

    fixture_fn = m.tiny_musiclm.__wrapped__
    musiclm = fixture_fn()
    musiclm = dc.replace(
        musiclm,
        semantic_stage=dc.replace(
            musiclm.semantic_stage, quantized=True, flash_kv="int8"
        ),
        coarse_stage=dc.replace(musiclm.coarse_stage, quantized=True, flash_kv="int8"),
        fine_stage=dc.replace(musiclm.fine_stage, quantized=True, flash_kv="int8"),
    )
    texts = [f"prompt {i}" for i in range(4)]
    row_keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(4))

    base = np.asarray(
        musiclm.generate(text=texts, per_row_keys=row_keys, **GEN_KW)
    )
    mesh = make_mesh(dp=4, devices=jax.devices()[:4])
    sharded = dc.replace(musiclm, serving_mesh=mesh)
    got = np.asarray(
        sharded.generate(text=texts, per_row_keys=row_keys, **GEN_KW)
    )
    # tokens are bit-identical; the waveform drifts by ~1 ulp because the
    # sharded arrays reach the Encodec decode with a different layout
    # (float reduction order in the convs)
    np.testing.assert_allclose(base, got, atol=1e-5)
