"""Flash-decode attention kernel parity (ops/decode_attention.py).

Reference numerics: ops/attention.py:shared_kv_decode_step (itself parity-
tested against the reference torch transformer in test_reference_parity.py).
The kernel path runs in interpret mode on CPU. Caches use the packed
[b, N, 2d] K|V layout.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_musiclm_tpu.ops.attention import shared_kv_decode_step
from open_musiclm_tpu.ops.decode_attention import (
    CHUNK,
    flash_decode_step,
    flash_decode_step_xla,
    quantize_kv_row,
)

B, H, D = 4, 8, 64
N = 2 * CHUNK


def _setup(pos_val, with_mask=True, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 6)
    q = jax.random.normal(ks[0], (B, H, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, N, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, N, D), jnp.float32)
    bias_table = jax.random.normal(ks[3], (2 * N - 1, H), jnp.float32)
    if with_mask:
        key_mask = jax.random.bernoulli(ks[4], 0.9, (B, N))
        # keep row pos attendable so softmax has support
        key_mask = key_mask.at[:, pos_val].set(True)
    else:
        key_mask = jnp.ones((B, N), bool)
    pos = jnp.int32(pos_val)
    bias_row = jax.lax.dynamic_slice(bias_table, (N - 1 - pos, 0), (N, H))
    add_mask = jnp.where(key_mask, 0.0, -1e9).astype(jnp.float32)
    kv = jnp.concatenate([k, v], axis=-1)  # packed layout
    return q, k, v, kv, pos, bias_table, bias_row, key_mask, add_mask


def _quantize_packed(k, v):
    kq, ksc = jax.vmap(quantize_kv_row, in_axes=1, out_axes=1)(k)
    vq, vsc = jax.vmap(quantize_kv_row, in_axes=1, out_axes=1)(v)
    return jnp.concatenate([kq, vq], axis=-1), jnp.stack([ksc, vsc])


@pytest.mark.parametrize("pos_val", [0, 3, CHUNK - 1, CHUNK, N - 1])
def test_xla_fallback_matches_reference_step(pos_val):
    q, k, v, kv, pos, table, bias_row, key_mask, add_mask = _setup(pos_val)
    ref = shared_kv_decode_step(
        q, k, v, pos, scale=8.0, bias_table=table, key_mask=key_mask
    )
    got = flash_decode_step_xla(q, kv, pos, bias_row, add_mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("pos_val", [0, CHUNK - 1, CHUNK, N - 1])
def test_kernel_interpret_matches_xla(pos_val):
    q, _, _, kv, pos, _, bias_row, _, add_mask = _setup(pos_val, seed=1)
    ref = flash_decode_step_xla(q, kv, pos, bias_row, add_mask)
    got = flash_decode_step(q, kv, pos, bias_row, add_mask, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_kernel_interpret_int8_matches_xla_int8():
    pos_val = CHUNK + 17
    q, k, v, _, pos, _, bias_row, _, add_mask = _setup(pos_val, seed=2)
    kvq, sc = _quantize_packed(k, v)
    ref = flash_decode_step_xla(q, kvq, pos, bias_row, add_mask, sc)
    got = flash_decode_step(q, kvq, pos, bias_row, add_mask, sc, interpret=True)
    # scale folding differs (post-dot vs pre-dot) -> last-ulp rounding drift
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_int8_cache_quantization_error_small():
    pos_val = N - 1
    q, k, v, kv, pos, _, bias_row, _, add_mask = _setup(
        pos_val, with_mask=False, seed=3
    )
    # K rows as produced by the model: l2norm * k_scale -> bounded entries
    k = k / jnp.linalg.norm(k, axis=-1, keepdims=True)
    kv = jnp.concatenate([k, v], axis=-1)
    exact = flash_decode_step_xla(q, kv, pos, bias_row, add_mask)
    kvq, sc = _quantize_packed(k, v)
    approx = flash_decode_step_xla(q, kvq, pos, bias_row, add_mask, sc)
    diff = np.abs(np.asarray(approx) - np.asarray(exact))
    # serving-mode tolerance: per-row int8 V rows carry ~0.4% step error;
    # the attention-weighted sum keeps the mean error well below it
    assert diff.mean() < 0.02, diff.mean()
    assert diff.max() < 0.15, diff.max()


def test_early_exit_ignores_dead_tail():
    """Rows beyond pos must not affect the output (they are skipped, not
    merely masked): poison the tail with huge values."""
    pos_val = CHUNK - 5  # second chunk entirely dead
    q, _, _, kv, pos, _, bias_row, _, add_mask = _setup(
        pos_val, with_mask=False, seed=4
    )
    kv_poison = kv.at[:, CHUNK:, :].set(1e9)
    ref = flash_decode_step(q, kv, pos, bias_row, add_mask, interpret=True)
    got = flash_decode_step(q, kv_poison, pos, bias_row, add_mask, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_kernel_batch_grid_matches_unblocked():
    """block_batch < b (the VMEM cap path used at fine-stage batches) must
    be value-identical to the single-program kernel."""
    pos_val = CHUNK + 33
    q, _, _, kv, pos, _, bias_row, _, add_mask = _setup(pos_val, seed=5)
    whole = flash_decode_step(q, kv, pos, bias_row, add_mask, interpret=True)
    blocked = flash_decode_step(
        q, kv, pos, bias_row, add_mask, interpret=True, block_batch=2
    )
    np.testing.assert_allclose(np.asarray(blocked), np.asarray(whole), atol=1e-6)
