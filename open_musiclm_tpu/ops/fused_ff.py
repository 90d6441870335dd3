"""Fused int8 conv-feed-forward decode kernel.

The conv-FF block holds ~88 % of the decode step's weight bytes
(proj_in 1024x5460 + proj_out 2730x1024 per layer). This kernel computes the
ENTIRE block for one decode step in a single Pallas launch:

    LN -> x @ W_in(int8) -> causal-conv taps -> GEGLU -> LN -> @ W_out(int8)

with the int8 weights streamed HBM->VMEM once and dequantized in registers,
and the [b, 2*inner] intermediate never touching HBM.

Alignment design: Mosaic cannot slice at the unaligned GEGLU boundary
(inner = 2730 for dim 1024), so the value/gate halves are stored as SEPARATE
weight matrices zero-padded to a 128-lane multiple P. Zero pad columns give
zero activations; the mid LayerNorm uses masked-sum statistics (sum / inner,
zeros contribute nothing) and a zero-padded gamma, so padded lanes stay
exactly zero through the second matmul (whose pad rows are zero).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .quant import quantize_weight


def _round_up(x: int, m: int = 128) -> int:
    return ((x + m - 1) // m) * m


def _erf_poly(x: jnp.ndarray) -> jnp.ndarray:
    """Abramowitz-Stegun 7.1.26 erf (max abs err 1.5e-7) — Mosaic has no
    erf/erfc lowering."""
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    )
    p = 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * x * (1.0 + _erf_poly(x * 0.7071067811865476))


def _kernel(
    x_ref,  # [b, dim]
    gin_ref,  # [1, dim]
    wv_ref,  # [dim, P] int8   (proj_in value half, padded)
    sv_ref,  # [1, P]
    wg_ref,  # [dim, P] int8   (proj_in gate half, padded)
    sg_ref,  # [1, P]
    convv_ref,  # [4, P] taps w0,w1,w2 for value half (row 3 pad)
    convg_ref,  # [4, P]
    sv0_ref, sv1_ref, sg0_ref, sg1_ref,  # [b, P] conv states
    gmid_ref,  # [1, P] (padded with zeros)
    wout_ref,  # [P, dim] int8  (pad rows zero)
    sout_ref,  # [1, dim]
    y_ref,  # [b, dim]
    sv1o_ref, sg1o_ref,  # [b, P] new last-tap states (u_v, u_g)
    *,
    inner: int,
):
    x = x_ref[:].astype(jnp.float32)
    gin = gin_ref[0].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    h = (x - mean) * jax.lax.rsqrt(var + 1e-5) * gin[None, :]

    u_v = jax.lax.dot_general(
        h, wv_ref[:].astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * sv_ref[0][None, :]
    u_g = jax.lax.dot_general(
        h, wg_ref[:].astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * sg_ref[0][None, :]

    conv_v = (
        sv0_ref[:].astype(jnp.float32) * convv_ref[0].astype(jnp.float32)[None, :]
        + sv1_ref[:].astype(jnp.float32) * convv_ref[1].astype(jnp.float32)[None, :]
        + u_v * convv_ref[2].astype(jnp.float32)[None, :]
    )
    conv_g = (
        sg0_ref[:].astype(jnp.float32) * convg_ref[0].astype(jnp.float32)[None, :]
        + sg1_ref[:].astype(jnp.float32) * convg_ref[1].astype(jnp.float32)[None, :]
        + u_g * convg_ref[2].astype(jnp.float32)[None, :]
    )

    g = _gelu_exact(conv_g) * conv_v  # [b, P]; pad lanes are exactly 0

    # masked-sum LayerNorm over the REAL `inner` elements (pads contribute 0)
    mu = jnp.sum(g, axis=-1, keepdims=True) / inner
    var_g = jnp.sum(g * g, axis=-1, keepdims=True) / inner - mu * mu
    gmid = gmid_ref[0].astype(jnp.float32)  # zero-padded gamma
    gn = (g - mu) * jax.lax.rsqrt(var_g + 1e-5) * gmid[None, :]

    out = jax.lax.dot_general(
        gn, wout_ref[:].astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * sout_ref[0][None, :]

    y_ref[:] = (x + out).astype(y_ref.dtype)
    sv1o_ref[:] = u_v.astype(sv1o_ref.dtype)
    sg1o_ref[:] = u_g.astype(sg1o_ref.dtype)


def pack_ff_weights(f_params) -> dict:
    """Quantize + align one layer's conv-FF weights for the fused kernel.

    f_params: the flax ``ff_l`` subtree (norm_in/proj_in/conv_w/norm_mid/
    proj_out). Returns the aligned int8 bundle.
    """
    w_in = f_params["proj_in"]["kernel"]  # [dim, 2*inner]
    inner = w_in.shape[1] // 2
    P = _round_up(inner)
    pad = P - inner

    wv_q, sv = quantize_weight(w_in[:, :inner])
    wg_q, sg = quantize_weight(w_in[:, inner:])
    wv_q = jnp.pad(wv_q, ((0, 0), (0, pad)))
    wg_q = jnp.pad(wg_q, ((0, 0), (0, pad)))
    sv = jnp.pad(sv, (0, pad))
    sg = jnp.pad(sg, (0, pad))

    conv = f_params["conv_w"]  # [3, 2*inner]
    conv_v = jnp.pad(conv[:, :inner], ((0, 1), (0, pad)))
    conv_g = jnp.pad(conv[:, inner:], ((0, 1), (0, pad)))

    gmid = jnp.pad(f_params["norm_mid"]["gamma"], (0, pad))

    w_out = f_params["proj_out"]["kernel"]  # [inner, dim]
    wo_q, so = quantize_weight(w_out)
    wo_q = jnp.pad(wo_q, ((0, pad), (0, 0)))

    return {
        "gin": f_params["norm_in"]["gamma"],
        "wv": wv_q, "sv": sv, "wg": wg_q, "sg": sg,
        "conv_v": conv_v, "conv_g": conv_g,
        "gmid": gmid,
        "wo": wo_q, "so": so,
    }


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_ff_apply(
    x: jnp.ndarray,  # [b, dim]
    packed: dict,
    state: jnp.ndarray,  # [b, 2, 2*inner] (cache layout)
    *,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (x + FF(x), new cache-layout state)."""
    b, dim = x.shape
    inner = state.shape[2] // 2  # static (packed["inner"] would trace under jit)
    P = packed["wv"].shape[1]
    pad = P - inner

    def split_pad(row):  # [b, 2*inner] -> ([b, P], [b, P])
        return (
            jnp.pad(row[:, :inner], ((0, 0), (0, pad))),
            jnp.pad(row[:, inner:], ((0, 0), (0, pad))),
        )

    sv0, sg0 = split_pad(state[:, 0, :])
    sv1, sg1 = split_pad(state[:, 1, :])

    # Row-block the grid: the kernel holds ~6 f32 [rows, P] intermediates in
    # VMEM, so one monolithic launch blows the 16 MB scoped-VMEM limit past
    # ~300 rows (hit at musiclm_large's 64 prompts x 20 batched fine windows
    # = 1280 rows). Blocks of 64 rows keep the activation working set under
    # ~5 MB while the int8 weights (constant index_map) stay resident across
    # grid steps, so the weights are still streamed from HBM only once per
    # launch.
    BB = 64
    if b <= BB:
        bp, block_b, grid = b, b, 1
    else:
        bp = _round_up(b, BB)
        block_b, grid = BB, bp // BB

    def pad_rows(a):
        return jnp.pad(a, ((0, bp - b), (0, 0))) if bp != b else a

    x_p = pad_rows(x)
    sv0, sg0, sv1, sg1 = map(pad_rows, (sv0, sg0, sv1, sg1))

    def rows(width):  # per-grid-step row block
        return pl.BlockSpec((block_b, width), lambda i: (i, 0))

    def whole(shape):  # same block every step: stays resident in VMEM
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape))

    kernel = functools.partial(_kernel, inner=inner)
    y, sv1o, sg1o = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            rows(dim),  # x
            whole((1, dim)),  # gin
            whole((dim, P)), whole((1, P)),  # wv, sv
            whole((dim, P)), whole((1, P)),  # wg, sg
            whole((4, P)), whole((4, P)),  # conv taps
            rows(P), rows(P), rows(P), rows(P),  # conv states
            whole((1, P)),  # gmid
            whole((P, dim)), whole((1, dim)),  # wo, so
        ],
        out_specs=(rows(dim), rows(P), rows(P)),
        out_shape=(
            jax.ShapeDtypeStruct((bp, dim), x.dtype),
            jax.ShapeDtypeStruct((bp, P), state.dtype),
            jax.ShapeDtypeStruct((bp, P), state.dtype),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * bp * dim * P + 2 * bp * P * dim,
            bytes_accessed=2 * dim * P + P * dim + bp * P * 4 * 6,
            transcendentals=bp * P,
        ),
    )(
        x_p,
        packed["gin"][None, :],
        packed["wv"], packed["sv"][None, :],
        packed["wg"], packed["sg"][None, :],
        packed["conv_v"], packed["conv_g"],
        sv0, sv1, sg0, sg1,
        packed["gmid"][None, :],
        packed["wo"], packed["so"][None, :],
    )
    y, sv1o, sg1o = y[:b], sv1o[:b], sg1o[:b]

    u = jnp.concatenate([sv1o[:, :inner], sg1o[:, :inner]], axis=-1)
    new_state = jnp.stack([state[:, 1, :], u], axis=1)
    return y, new_state


def fused_ff_apply_xla(x, packed, state):
    """Fallback with identical numerics (no kernel)."""
    inner = state.shape[2] // 2
    P = packed["wv"].shape[1]
    xf = x.astype(jnp.float32)
    gin = packed["gin"].astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    h = (xf - mean) * jax.lax.rsqrt(var + 1e-5) * gin[None, :]
    u_v = (h @ packed["wv"].astype(jnp.float32)) * packed["sv"][None, :]
    u_g = (h @ packed["wg"].astype(jnp.float32)) * packed["sg"][None, :]
    pad = P - inner
    s0 = state[:, 0, :].astype(jnp.float32)
    s1 = state[:, 1, :].astype(jnp.float32)
    sv0 = jnp.pad(s0[:, :inner], ((0, 0), (0, pad)))
    sg0 = jnp.pad(s0[:, inner:], ((0, 0), (0, pad)))
    sv1 = jnp.pad(s1[:, :inner], ((0, 0), (0, pad)))
    sg1 = jnp.pad(s1[:, inner:], ((0, 0), (0, pad)))
    conv_v = sv0 * packed["conv_v"][0][None] + sv1 * packed["conv_v"][1][None] + u_v * packed["conv_v"][2][None]
    conv_g = sg0 * packed["conv_g"][0][None] + sg1 * packed["conv_g"][1][None] + u_g * packed["conv_g"][2][None]
    g = jax.nn.gelu(conv_g, approximate=False) * conv_v
    mu = jnp.sum(g, axis=-1, keepdims=True) / inner
    var_g = jnp.sum(g * g, axis=-1, keepdims=True) / inner - mu * mu
    gn = (g - mu) * jax.lax.rsqrt(var_g + 1e-5) * packed["gmid"].astype(jnp.float32)[None, :]
    out = (gn @ packed["wo"].astype(jnp.float32)) * packed["so"][None, :]
    y = (xf + out).astype(x.dtype)
    u = jnp.concatenate([u_v[:, :inner], u_g[:, :inner]], axis=-1).astype(state.dtype)
    new_state = jnp.stack([state[:, 1, :], u], axis=1)
    return y, new_state
