"""Fused int8 conv-feed-forward decode kernel.

The conv-FF block holds ~88 % of the decode step's weight bytes
(proj_in 1024x5460 + proj_out 2730x1024 per layer). This kernel computes the
ENTIRE block for one decode step in a single Pallas launch:

    LN -> x @ W_in(int8) -> causal-conv taps -> GEGLU -> LN -> @ W_out(int8)

with the int8 weights streamed HBM->VMEM once and dequantized in registers,
and the [b, 2*inner] intermediate never touching HBM. Versus the
per-matmul int8 path this replaces ~12 ops with 1 launch and versus the bf16
path it halves the dominant byte term.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln_rows(x: jnp.ndarray, gamma: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * gamma[None, :]


def _kernel(
    x_ref,  # [b, dim]
    gin_ref,  # [1, dim] norm_in gamma
    win_ref,  # [dim, 2*inner] int8
    sin_ref,  # [1, 2*inner] f32
    conv_ref,  # [4, 2*inner] f32 conv taps w0,w1,w2 (row 3 unused pad)
    state_ref,  # [b, 2, 2*inner]
    gmid_ref,  # [1, inner]
    wout_ref,  # [inner, dim] int8
    sout_ref,  # [1, dim] f32
    y_ref,  # [b, dim]   (x + ff(x))
    state_out_ref,  # [b, 2, 2*inner]
    *,
    inner: int,
):
    x = x_ref[:].astype(jnp.float32)
    h = _ln_rows(x, gin_ref[0].astype(jnp.float32))
    w_in = win_ref[:].astype(jnp.float32)
    u = jax.lax.dot_general(
        h, w_in, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * sin_ref[0][None, :]

    w0 = conv_ref[0].astype(jnp.float32)[None, :]
    w1 = conv_ref[1].astype(jnp.float32)[None, :]
    w2 = conv_ref[2].astype(jnp.float32)[None, :]
    s0 = state_ref[:, 0, :].astype(jnp.float32)
    s1 = state_ref[:, 1, :].astype(jnp.float32)
    conv = s0 * w0 + s1 * w1 + u * w2

    val = conv[:, :inner]
    gate = conv[:, inner:]
    g = jax.nn.gelu(gate, approximate=False) * val
    g = _ln_rows(g, gmid_ref[0].astype(jnp.float32))

    w_out = wout_ref[:].astype(jnp.float32)
    out = jax.lax.dot_general(
        g, w_out, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * sout_ref[0][None, :]

    y_ref[:] = (x + out).astype(y_ref.dtype)
    state_out_ref[:, 0, :] = s1.astype(state_out_ref.dtype)
    state_out_ref[:, 1, :] = u.astype(state_out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_ff_int8(
    x: jnp.ndarray,  # [b, dim]
    gamma_in: jnp.ndarray,  # [dim]
    w_in_q: jnp.ndarray,  # [dim, 2*inner] int8
    s_in: jnp.ndarray,  # [2*inner] f32
    conv_w: jnp.ndarray,  # [3, 2*inner]
    state: jnp.ndarray,  # [b, 2, 2*inner]
    gamma_mid: jnp.ndarray,  # [inner]
    w_out_q: jnp.ndarray,  # [inner, dim] int8
    s_out: jnp.ndarray,  # [dim] f32
    *,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (x + FF(x), new conv state)."""
    b, dim = x.shape
    inner2 = w_in_q.shape[1]
    inner = inner2 // 2
    conv_pad = jnp.pad(conv_w, ((0, 1), (0, 0)))  # sublane-friendly 4 rows

    kernel = functools.partial(_kernel, inner=inner)
    y, new_state = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x
            pl.BlockSpec(memory_space=pltpu.VMEM),  # gamma_in
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w_in int8
            pl.BlockSpec(memory_space=pltpu.VMEM),  # s_in
            pl.BlockSpec(memory_space=pltpu.VMEM),  # conv taps
            pl.BlockSpec(memory_space=pltpu.VMEM),  # state
            pl.BlockSpec(memory_space=pltpu.VMEM),  # gamma_mid
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w_out int8
            pl.BlockSpec(memory_space=pltpu.VMEM),  # s_out
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, dim), x.dtype),
            jax.ShapeDtypeStruct(state.shape, state.dtype),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * dim * inner2 + 2 * b * inner * dim,
            bytes_accessed=dim * inner2 + inner * dim + b * inner2 * 4 * 3,
            transcendentals=b * inner,
        ),
    )(
        x,
        gamma_in[None, :],
        w_in_q,
        s_in[None, :],
        conv_pad,
        state,
        gamma_mid[None, :],
        w_out_q,
        s_out[None, :],
    )
    return y, new_state


def fused_ff_int8_xla(
    x, gamma_in, w_in_q, s_in, conv_w, state, gamma_mid, w_out_q, s_out
):
    """Reference/fallback with identical numerics."""
    xf = x.astype(jnp.float32)
    h = _ln_rows(xf, gamma_in.astype(jnp.float32))
    u = (h @ w_in_q.astype(jnp.float32)) * s_in[None, :]
    conv = (
        state[:, 0].astype(jnp.float32) * conv_w[0][None]
        + state[:, 1].astype(jnp.float32) * conv_w[1][None]
        + u * conv_w[2][None]
    )
    inner = u.shape[1] // 2
    g = jax.nn.gelu(conv[:, inner:], approximate=False) * conv[:, :inner]
    g = _ln_rows(g, gamma_mid.astype(jnp.float32))
    out = (g @ w_out_q.astype(jnp.float32)) * s_out[None, :]
    y = (xf + out).astype(x.dtype)
    new_state = jnp.stack([state[:, 1], u.astype(state.dtype)], axis=1)
    return y, new_state
