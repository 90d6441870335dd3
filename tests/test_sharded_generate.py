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
