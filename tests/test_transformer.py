"""Core transformer tests: shapes, causality, mask handling, and the
load-bearing invariant that KV-cached incremental decode reproduces the full
forward pass exactly (this is what makes our O(n)-per-token decode a faithful
replacement for the reference's full re-forward loop)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_musiclm_tpu.models.transformer import Transformer
from open_musiclm_tpu.ops.relpos import ContinuousPositionBias, T5RelativePositionBias


def make_model(**kw):
    defaults = dict(dim=64, depth=2, heads=4, dim_head=16)
    defaults.update(kw)
    return Transformer(**defaults)


@pytest.fixture(scope="module")
def model_and_params():
    model = make_model()
    x = jnp.zeros((2, 12, 64))
    params = model.init(jax.random.PRNGKey(0), x)
    return model, params


def test_forward_shape(model_and_params):
    model, params = model_and_params
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 12, 64))
    y = model.apply(params, x)
    assert y.shape == (2, 12, 64)
    assert jnp.all(jnp.isfinite(y))


def test_causality(model_and_params):
    """Perturbing position t must not change outputs at positions < t."""
    model, params = model_and_params
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 10, 64))
    y1 = model.apply(params, x)
    x2 = x.at[:, 7, :].add(100.0)
    y2 = model.apply(params, x2)
    np.testing.assert_allclose(y1[:, :7], y2[:, :7], atol=1e-5)
    assert not np.allclose(y1[:, 7:], y2[:, 7:])


def test_key_mask_hides_positions(model_and_params):
    """A masked key position must not influence later outputs."""
    model, params = model_and_params
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 10, 64))
    mask = jnp.ones((1, 10), bool).at[0, 3].set(False)
    y1 = model.apply(params, x, self_attn_mask=mask)
    x2 = x.at[:, 3, :].add(50.0)
    y2 = model.apply(params, x2, self_attn_mask=mask)
    # outputs at other positions unchanged (pos 3's own output does change,
    # since it still attends to itself's value? no: key mask hides it from
    # everyone including itself, but its query path still uses its own x via
    # residual)
    np.testing.assert_allclose(y1[:, 4:], y2[:, 4:], atol=1e-4)


@pytest.mark.parametrize("bias_type", ["continuous", "t5", "none"])
def test_decode_matches_full_forward(bias_type):
    """prefill + step-by-step decode == full forward, to float tolerance."""
    model = make_model(relative_position_bias_type=bias_type)
    n_total, n_prefill = 14, 5
    x = jax.random.normal(jax.random.PRNGKey(4), (2, n_total, 64))
    params = model.init(jax.random.PRNGKey(0), x)

    y_full = model.apply(params, x)

    cache = model.apply(params, 2, n_total, method=Transformer.init_cache)
    table = model.apply(params, n_total, method=Transformer.bias_table)
    y_pre, cache = model.apply(params, x[:, :n_prefill], cache, method=Transformer.prefill)

    outs = [y_pre]
    for t in range(n_prefill, n_total):
        y_t, cache = model.apply(
            params, x[:, t], cache, jnp.int32(t), table, method=Transformer.decode_step
        )
        outs.append(y_t[:, None, :])
    y_inc = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(y_full), np.asarray(y_inc), atol=2e-4)


def test_decode_respects_prefill_key_mask():
    """Conditioning mask set at prefill persists through decode steps."""
    model = make_model()
    n_total, n_prefill = 10, 6
    x = jax.random.normal(jax.random.PRNGKey(5), (1, n_total, 64))
    params = model.init(jax.random.PRNGKey(0), x)
    key_mask = jnp.ones((1, n_prefill), bool).at[0, 2].set(False)

    def run(xx):
        cache = model.apply(params, 1, n_total, method=Transformer.init_cache)
        table = model.apply(params, n_total, method=Transformer.bias_table)
        _, cache = model.apply(
            params, xx[:, :n_prefill], cache, key_mask=key_mask, method=Transformer.prefill
        )
        outs = []
        for t in range(n_prefill, n_total):
            y_t, cache = model.apply(
                params, xx[:, t], cache, jnp.int32(t), table, method=Transformer.decode_step
            )
            outs.append(y_t)
        return jnp.stack(outs, 1)

    y1 = run(x)
    y2 = run(x.at[:, 2, :].add(30.0))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-4)


def test_non_causal_prefix():
    model = make_model(non_causal_prefix_size=3)
    x = jax.random.normal(jax.random.PRNGKey(6), (1, 8, 64))
    params = model.init(jax.random.PRNGKey(0), x)
    y1 = model.apply(params, x)
    # position 0 sees positions 1-2 through the bidirectional prefix
    x2 = x.at[:, 2, :].add(10.0)
    y2 = model.apply(params, x2)
    assert not np.allclose(y1[:, 0], y2[:, 0])


def test_rel_pos_bias_table_consistency():
    """distance_table[d] must equal full-matrix bias at distance d."""
    for mod in [
        ContinuousPositionBias(dim=16, heads=4),
        T5RelativePositionBias(heads=4),
    ]:
        params = mod.init(jax.random.PRNGKey(0), 8)
        full = mod.apply(params, 8)  # [h, 8, 8]
        table = mod.apply(params, 8, method=type(mod).distance_table)  # [8, h]
        for d in range(8):
            np.testing.assert_allclose(
                np.asarray(full[:, 7, 7 - d]), np.asarray(table[d]), atol=1e-6
            )


def test_grad_shrink_gradient_scaling():
    from open_musiclm_tpu.models.transformer import grad_shrink

    g = jax.grad(lambda x: jnp.sum(grad_shrink(x, 0.1) ** 2))(jnp.ones(4))
    # d/dx [gs(x)^2] = 2 * gs(x) * alpha = 2 * 1 * 0.1
    np.testing.assert_allclose(np.asarray(g), 0.2 * np.ones(4), atol=1e-6)


def test_ff_variants():
    for conv in [True, False]:
        model = make_model(use_conv_ff=conv)
        x = jax.random.normal(jax.random.PRNGKey(7), (1, 6, 64))
        params = model.init(jax.random.PRNGKey(0), x)
        y = model.apply(params, x)
        assert y.shape == x.shape


def test_remat_preserves_values_and_grads():
    """jax.checkpoint per block: same forward values and gradients."""
    x = jax.random.normal(jax.random.PRNGKey(8), (2, 10, 64))
    base = make_model()
    remat = make_model(remat=True)
    params = base.init(jax.random.PRNGKey(0), x)

    def loss(model, p):
        return jnp.sum(model.apply(p, x) ** 2)

    l0, g0 = jax.value_and_grad(lambda p: loss(base, p))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(remat, p))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_toeplitz_matches_gather_values_and_grads():
    """The reshape-based Toeplitz bias construction must be element- and
    gradient-identical to the legacy n^2-gather path (ops/relpos.py)."""
    import os

    from open_musiclm_tpu.ops.relpos import toeplitz_from_table

    n, h = 9, 4
    table = jax.random.normal(jax.random.PRNGKey(0), (2 * n - 1, h))
    i = jnp.arange(n)[:, None]
    j = jnp.arange(n)[None, :]
    gathered = table[i - j + (n - 1)]
    built = toeplitz_from_table(table, n)
    np.testing.assert_array_equal(np.asarray(gathered), np.asarray(built))

    w = jax.random.normal(jax.random.PRNGKey(1), (n, n, h))
    g_gather = jax.grad(lambda t: jnp.sum(w * t[i - j + (n - 1)]))(table)
    g_built = jax.grad(lambda t: jnp.sum(w * toeplitz_from_table(t, n)))(table)
    np.testing.assert_allclose(np.asarray(g_gather), np.asarray(g_built), atol=1e-5)

    # the module-level A/B switch produces identical biases too
    for mod in [
        ContinuousPositionBias(dim=16, heads=4),
        T5RelativePositionBias(heads=4),
    ]:
        params = mod.init(jax.random.PRNGKey(2), 8)
        fast = mod.apply(params, 8)
        os.environ["OPEN_MUSICLM_RELPOS_GATHER"] = "1"
        try:
            legacy = mod.apply(params, 8)
        finally:
            del os.environ["OPEN_MUSICLM_RELPOS_GATHER"]
        np.testing.assert_allclose(np.asarray(fast), np.asarray(legacy), atol=1e-6)
