"""Weight-only int8 quantization for the decode path.

The KV-cached decode step is weight-HBM-bandwidth-bound (DESIGN.md): every
sampled token streams the stage's ~57M matmul parameters. Per-output-channel
symmetric int8 halves that traffic. The Pallas kernel reads int8 weight
tiles HBM->VMEM, dequantizes in registers and feeds the MXU — the bf16
weights never exist in HBM (XLA's naive dequant materializes them).

``quantize_weight``/``dequantize_weight`` define the numerics;
``int8_matmul`` is the kernel (XLA fallback under ``interpret``/CPU).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def quantize_weight(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[in, out] float -> (int8 [in, out], scale f32 [out]) per-out-channel."""
    absmax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0)
    scale = jnp.maximum(absmax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def dequantize_weight(q: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    return q.astype(jnp.float32) * scale


def _kernel(x_ref, w_ref, s_ref, o_ref):
    # x: [B, in] f32/bf16 (whole); w: [in, BLK] int8; s: [1, BLK] f32
    x = x_ref[:].astype(jnp.float32)
    w = w_ref[:].astype(jnp.float32)  # dequant int8 -> f32 in VMEM
    acc = jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[:] = (acc * s_ref[0][None, :]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_out", "interpret"))
def int8_matmul(
    x: jnp.ndarray,  # [B, in]
    w_q: jnp.ndarray,  # [in, out] int8
    scale: jnp.ndarray,  # [out] f32
    *,
    block_out: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """x @ dequant(w_q) with weights streamed as int8. Returns x.dtype."""
    B, IN = x.shape
    OUT = w_q.shape[1]
    blk = min(block_out, OUT)
    pad = (-OUT) % blk
    if pad:
        w_q = jnp.pad(w_q, ((0, 0), (0, pad)))
        scale = jnp.pad(scale, (0, pad))
    nblk = (OUT + pad) // blk

    # Row-block large batches (musiclm_large batches its fine windows into
    # one decode: 64 prompts x 20 windows = 1280 rows) so the f32 x/acc
    # working set stays bounded. Rows are the INNER grid dim, so each weight
    # column block is fetched once and row blocks stream past it — decode
    # stays weight-read-bound. Small batches keep the original single-row-
    # block schedule unchanged.
    RB = 256
    if B <= RB:
        bp, rb, nrow = B, B, 1
    else:
        bp = ((B + RB - 1) // RB) * RB
        rb, nrow = RB, ((B + RB - 1) // RB)
        if bp != B:
            x = jnp.pad(x, ((0, bp - B), (0, 0)))

    out = pl.pallas_call(
        _kernel,
        grid=(nblk, nrow),
        in_specs=[
            pl.BlockSpec((rb, IN), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((IN, blk), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (rb, blk), lambda j, i: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bp, OUT + pad), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * IN * (OUT + pad),
            bytes_accessed=bp * IN * x.dtype.itemsize + IN * (OUT + pad) + bp * (OUT + pad) * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x, w_q, scale[None, :])
    return out[:B, :OUT]


def int8_matmul_xla(x, w_q, scale):
    """Reference/fallback: same numerics without the kernel."""
    acc = jax.lax.dot_general(
        x.astype(jnp.float32), w_q.astype(jnp.float32),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    return (acc * scale[None, :]).astype(x.dtype)
