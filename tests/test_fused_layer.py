"""Fused per-layer decode mega-kernel parity (ops/fused_layer.py).

Kernel (interpret mode) vs the XLA fallback must match exactly; the
fallback vs the two-kernel flash path (quantized cache row j <= pos) must
agree within the row-quantization tolerance — the mega-kernel consumes the
fresh K/V row unquantized from registers, the flash path reads it back
quantized from the cache.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_musiclm_tpu.ops.decode_attention import (
    CHUNK,
    flash_decode_step_xla,
    quantize_kv_row,
)
from open_musiclm_tpu.ops.fused_ff import fused_ff_apply_xla
from open_musiclm_tpu.ops.fused_layer import (
    fused_layer_decode_step,
    fused_layer_decode_step_xla,
    pack_layer_weights,
)

DIM, HEADS, D = 96, 2, 8
INNER = int(DIM * 2 * 4 / 3)  # conv-FF inner
N = 2 * CHUNK
B = 4


def make_layer(seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 8)
    s = 0.1
    a_params = {
        "norm": {"gamma": jnp.ones((DIM,))},
        "to_q": {"kernel": s * jax.random.normal(ks[0], (DIM, HEADS * D))},
        "to_kv": {"kernel": s * jax.random.normal(ks[1], (DIM, 2 * D))},
        "to_out": {"kernel": s * jax.random.normal(ks[2], (HEADS * D, DIM))},
        "q_scale": jnp.ones((D,)) * 1.1,
        "k_scale": jnp.ones((D,)) * 0.9,
    }
    f_params = {
        "norm_in": {"gamma": jnp.ones((DIM,))},
        "proj_in": {"kernel": s * jax.random.normal(ks[3], (DIM, 2 * INNER))},
        "conv_w": s * jax.random.normal(ks[4], (3, 2 * INNER)),
        "norm_mid": {"gamma": jnp.ones((INNER,))},
        "proj_out": {"kernel": s * jax.random.normal(ks[5], (INNER, DIM))},
    }
    return a_params, f_params


def make_state(pos_val, seed=1):
    ks = jax.random.split(jax.random.PRNGKey(seed), 6)
    x = jax.random.normal(ks[0], (B, DIM))
    k_rows = jax.random.normal(ks[1], (B, N, D))
    k_rows = k_rows / jnp.linalg.norm(k_rows, axis=-1, keepdims=True)
    v_rows = jax.random.normal(ks[2], (B, N, D))
    kq, ksc = jax.vmap(quantize_kv_row, in_axes=1, out_axes=1)(k_rows)
    vq, vsc = jax.vmap(quantize_kv_row, in_axes=1, out_axes=1)(v_rows)
    kv_cache = jnp.concatenate([kq, vq], axis=-1)
    kv_scale = jnp.stack([ksc, vsc])
    ff_state = jax.random.normal(ks[3], (B, 2, 2 * INNER))
    bias_row = jax.random.normal(ks[4], (N, HEADS))
    add_mask = jnp.zeros((B, N), jnp.float32)
    return x, kv_cache, kv_scale, ff_state, bias_row, add_mask


@pytest.mark.parametrize("pos_val", [0, 5, CHUNK, CHUNK + 33])
def test_kernel_interpret_matches_xla(pos_val):
    a_params, f_params = make_layer()
    packed = pack_layer_weights(a_params, f_params)
    x, kv_cache, kv_scale, ff_state, bias_row, add_mask = make_state(pos_val)
    pos = jnp.int32(pos_val)
    ref = fused_layer_decode_step_xla(
        x, packed, kv_cache, kv_scale, ff_state, pos, bias_row, add_mask,
        heads=HEADS,
    )
    got = fused_layer_decode_step(
        x, packed, kv_cache, kv_scale, ff_state, pos, bias_row, add_mask,
        heads=HEADS, interpret=True,
    )
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=2e-4)


def test_kernel_batch_grid_matches_unblocked():
    a_params, f_params = make_layer(seed=2)
    packed = pack_layer_weights(a_params, f_params)
    x, kv_cache, kv_scale, ff_state, bias_row, add_mask = make_state(7, seed=3)
    pos = jnp.int32(CHUNK + 7)
    whole = fused_layer_decode_step(
        x, packed, kv_cache, kv_scale, ff_state, pos, bias_row, add_mask,
        heads=HEADS, interpret=True,
    )
    blocked = fused_layer_decode_step(
        x, packed, kv_cache, kv_scale, ff_state, pos, bias_row, add_mask,
        heads=HEADS, interpret=True, block_batch=2,
    )
    for g, r in zip(blocked, whole):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=1e-5)


def test_fallback_matches_two_kernel_flash_path():
    """The mega step must reproduce the flash path (attention over the
    quantized cache INCLUDING the freshly written row, then fused FF) up to
    the fresh-row quantization it skips."""
    a_params, f_params = make_layer(seed=4)
    packed = pack_layer_weights(a_params, f_params)
    x, kv_cache, kv_scale, ff_state, bias_row, add_mask = make_state(0, seed=5)
    pos_val = CHUNK + 17
    pos = jnp.int32(pos_val)

    y, krow, new_state = fused_layer_decode_step_xla(
        x, packed, kv_cache, kv_scale, ff_state, pos, bias_row, add_mask,
        heads=HEADS,
    )

    # flash path: quantize the fresh row, write it, attend over j <= pos
    xf = x.astype(jnp.float32)
    h = (xf - xf.mean(-1, keepdims=True)) / jnp.sqrt(xf.var(-1, keepdims=True) + 1e-5)
    wq = jnp.transpose(packed["wqT"]).astype(jnp.float32)
    qv = (h @ wq) * packed["sqh"].reshape(-1)[None, :]
    q = qv.reshape(B, HEADS, D)
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True) * packed["q_scale"][None, None, :]
    k_t, v_t = krow[:, :D], krow[:, D:]
    kq, ksc = quantize_kv_row(k_t)
    vq, vsc = quantize_kv_row(v_t)
    cache2 = kv_cache.at[:, pos_val, :].set(jnp.concatenate([kq, vq], -1))
    scale2 = kv_scale.at[0, :, pos_val].set(ksc).at[1, :, pos_val].set(vsc)
    attn = flash_decode_step_xla(q, cache2, pos, bias_row, add_mask, scale2)
    out = (attn @ packed["wo_attn"].astype(jnp.float32)) * packed["so_attn"][None, :]
    x2 = (xf + out).astype(x.dtype)
    y2, state2 = fused_ff_apply_xla(x2, packed["ff"], ff_state)

    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), atol=0.05)
    np.testing.assert_allclose(np.asarray(new_state), np.asarray(state2), atol=0.05)
