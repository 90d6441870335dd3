"""Pallas fused attention parity vs the XLA reference path (interpret mode on
CPU): forward with bias/mask/causal combinations, and gradients through the
custom VJP."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_musiclm_tpu.ops.attention import shared_kv_attention
from open_musiclm_tpu.ops.pallas_attention import (
    shared_kv_attention_fused,
    shared_kv_attention_pallas,
)

B, H, N, M, D = 2, 3, 24, 24, 16


def make_inputs(key, m=M):
    ks = jax.random.split(key, 5)
    q = jax.random.normal(ks[0], (B, H, N, D))
    k = jax.random.normal(ks[1], (B, m, D))
    v = jax.random.normal(ks[2], (B, m, D))
    bias = jax.random.normal(ks[3], (H, N, m))
    mask = jax.random.bernoulli(ks[4], 0.8, (B, m))
    mask = mask.at[:, 0].set(True)
    return q, k, v, bias, mask


@pytest.mark.parametrize("use_bias", [True, False])
@pytest.mark.parametrize("use_mask", [True, False])
@pytest.mark.parametrize("causal", [True, False])
def test_forward_parity(use_bias, use_mask, causal):
    q, k, v, bias, mask = make_inputs(jax.random.PRNGKey(0))
    expected = shared_kv_attention(
        q, k, v, scale=8.0,
        attn_bias=bias if use_bias else None,
        key_mask=mask if use_mask else None,
        causal=causal,
    )
    got = shared_kv_attention_pallas(
        q, k, v,
        bias if use_bias else None,
        mask if use_mask else None,
        scale=8.0, causal=causal, block_n=8, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-5)


def test_forward_parity_unpadded_blocks():
    """n not a multiple of block_n exercises the padding path."""
    q, k, v, bias, mask = make_inputs(jax.random.PRNGKey(1))
    q = q[:, :, :19]
    bias = bias[:, :19]
    expected = shared_kv_attention(
        q, k, v, scale=8.0, attn_bias=bias, key_mask=mask, causal=True
    )
    got = shared_kv_attention_pallas(
        q, k, v, bias, mask, scale=8.0, causal=True, block_n=8, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-5)


def test_prefix_window_parity():
    q, k, v, bias, _ = make_inputs(jax.random.PRNGKey(2))
    expected = shared_kv_attention(
        q, k, v, scale=8.0, attn_bias=bias, causal=True, non_causal_prefix=5
    )
    got = shared_kv_attention_pallas(
        q, k, v, bias, None, scale=8.0, causal=True, non_causal_prefix=5,
        block_n=8, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-5)


@pytest.mark.parametrize("use_bias", [True, False])
def test_gradient_parity(use_bias):
    q, k, v, bias, mask = make_inputs(jax.random.PRNGKey(3))
    bias_arg = bias if use_bias else None

    def loss_ref(q, k, v, bias):
        out = shared_kv_attention(
            q, k, v, scale=8.0, attn_bias=bias, key_mask=mask, causal=True
        )
        return jnp.sum(out * jnp.cos(out))

    def loss_pallas(q, k, v, bias):
        out = shared_kv_attention_fused(
            q, k, v, bias, mask, 8.0, True, 0, 8, True
        )
        return jnp.sum(out * jnp.cos(out))

    argnums = (0, 1, 2, 3) if use_bias else (0, 1, 2)
    g_ref = jax.grad(loss_ref, argnums)(q, k, v, bias_arg)
    g_pal = jax.grad(loss_pallas, argnums)(q, k, v, bias_arg)
    for a, b, name in zip(g_ref, g_pal, ["dq", "dk", "dv", "dbias"]):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-4, err_msg=name
        )
