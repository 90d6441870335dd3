"""Flash-decode kernel for the KV-cached shared-KV attention step.

Why a kernel: at serving batch sizes the decode step's HBM traffic is no
longer dominated by weights alone — reading the [b, N, d] K/V caches every
token (b=32, N~1.1k, bf16: ~9 MB per layer per step on the coarse stage)
rivals the int8 weight bytes. Two structural savings XLA cannot express:

  1. **Early exit at ``pos``.** The cache buffer is allocated at the full
     static ``max_len``, but at decode position ``pos`` only rows ``<= pos``
     are live. XLA's static shapes force it to stream the whole buffer per
     step; this kernel runs a ``fori_loop`` whose trip count is the DYNAMIC
     number of live 256-row chunks (``pos // 256 + 1``) and never touches
     the dead tail. Over a full stage decode that cuts 25-50 % of average
     cache traffic (the live fraction ramps from prefill_len/N to 1).
  2. **int8 cache residency (optional).** Rows are quantized per-token at
     write time (K rows are l2norm * k_scale, so they are bounded); the
     kernel dequantizes chunk-by-chunk in VMEM, so bf16/f32 rows never
     exist in HBM. Halves cache bytes again. Serving-mode numerics (same
     contract as the int8 weight path, models/quant_decode.py).

Layout: K and V live INTERLEAVED in one [b, N, 2d] cache — K in lanes
0:d, V in d:2d. With d=64 that makes the last dim exactly one 128-lane
tile, which (a) makes the chunk DMA legal (Mosaic cannot slice a
64-lane-padded HBM memref) and (b) fetches K and V in ONE DMA per chunk.
Row scales (int8 mode) are a [2, b, N] array (K row 0, V row 1) for the
same reason. The decode step writes one [b, 2d] row per token, so the
interleaved write is exactly as cheap as two separate ones.

Structure: one program (no grid), the packed cache stays in HBM
(`pl.ANY`) and is double-buffered into VMEM 256 rows at a time (guide
pattern); the online softmax (running max / denominator / f32 accumulator,
flash-attention style) lives in VMEM scratch. The rel-pos bias row and the
key-validity additive mask are precomputed in XLA ([N, h] slice / [b, N]
f32) — they are tiny next to the cache.

Replaces ops/attention.py:shared_kv_decode_step (XLA path kept as the
CPU/interpret fallback and parity reference). Reference behavior:
open_musiclm/transformer.py:269-333, open_musiclm.py:299-319.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9

CHUNK = 256  # cache rows per DMA; cache buffers must be padded to a multiple


def round_up_chunk(n: int) -> int:
    return ((n + CHUNK - 1) // CHUNK) * CHUNK


def _kernel(
    pos_ref,  # SMEM (1,) int32
    q_ref,  # [bb, h, d] VMEM (this program's batch block)
    bias_ref,  # [N, h] VMEM (decode-layout row, already sliced for pos)
    addmask_ref,  # [bb, N] VMEM f32 additive key mask (0 / NEG_INF)
    kv_hbm,  # [b, N, 2d] ANY (bf16/f32 or int8): K lanes 0:d, V lanes d:2d
    sc_hbm,  # [2, b, N] ANY f32 row scales (int8 mode) or dummy
    o_ref,  # [bb, h, d] VMEM out
    kvbuf,  # VMEM (2, bb, CHUNK, 2d) cache dtype
    scbuf,  # VMEM (2, 2, bb, CHUNK) f32
    macc,  # VMEM (bb, h) f32 running max
    lacc,  # VMEM (bb, h) f32 running denom
    oacc,  # VMEM (bb, h, d) f32 accumulator
    sems,  # DMA sems (2, 2)
    *,
    scale: float,
    quantized: bool,
):
    # grid over batch blocks keeps the VMEM chunk buffers bounded regardless
    # of serving batch (the fine stage batches independent windows, so b can
    # reach 256+); each program streams its own rows of the HBM cache
    b, h, d = q_ref.shape
    pid = pl.program_id(0)
    pos = pos_ref[0]
    nvalid = pos // CHUNK + 1  # dynamic chunk count — the early exit

    def get_dmas(slot, c):
        off = pl.multiple_of(c * CHUNK, CHUNK)
        boff = pl.multiple_of(pid * b, b)
        dmas = [
            pltpu.make_async_copy(
                kv_hbm.at[pl.ds(boff, b), pl.ds(off, CHUNK), :],
                kvbuf.at[slot],
                sems.at[slot, 0],
            )
        ]
        if quantized:
            dmas.append(pltpu.make_async_copy(
                sc_hbm.at[:, pl.ds(boff, b), pl.ds(off, CHUNK)],
                scbuf.at[slot],
                sems.at[slot, 1],
            ))
        return dmas

    def start_dma(slot, c):
        for dma in get_dmas(slot, c):
            dma.start()

    def wait_dma(slot, c):
        for dma in get_dmas(slot, c):
            dma.wait()

    macc[:] = jnp.full((b, h), NEG_INF, jnp.float32)
    lacc[:] = jnp.zeros((b, h), jnp.float32)
    oacc[:] = jnp.zeros((b, h, d), jnp.float32)

    start_dma(0, 0)
    q = q_ref[:].astype(jnp.float32)  # [b, h, d]

    def body(c, _):
        slot = c % 2

        @pl.when(c + 1 < nvalid)
        def _():
            start_dma((c + 1) % 2, c + 1)

        wait_dma(slot, c)
        kv = kvbuf[slot].astype(jnp.float32)  # [b, C, 2d]
        k = kv[:, :, :d]
        v = kv[:, :, d:]

        # sim [b, h, C]: batched over b, contract d
        sim = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        if quantized:
            sim = sim * scbuf[slot][0][:, None, :]  # fold K row scales post-dot
        sim = sim * scale

        bias = bias_ref[pl.ds(c * CHUNK, CHUNK), :].astype(jnp.float32)  # [C, h]
        sim = sim + jnp.transpose(bias)[None]  # [1, h, C]
        sim = sim + addmask_ref[:, pl.ds(c * CHUNK, CHUNK)][:, None, :]

        cols = c * CHUNK + jax.lax.broadcasted_iota(jnp.int32, (b, h, CHUNK), 2)
        sim = jnp.where(cols <= pos, sim, NEG_INF)

        m_new = jnp.maximum(macc[:], jnp.max(sim, axis=-1))  # [b, h]
        alpha = jnp.exp(macc[:] - m_new)
        p = jnp.exp(sim - m_new[:, :, None])  # [b, h, C]
        lacc[:] = lacc[:] * alpha + jnp.sum(p, axis=-1)
        if quantized:
            p = p * scbuf[slot][1][:, None, :]  # fold V row scales pre-dot
        pv = jax.lax.dot_general(  # [b, h, d]: contract C
            p, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        oacc[:] = oacc[:] * alpha[:, :, None] + pv
        macc[:] = m_new
        return 0

    jax.lax.fori_loop(0, nvalid, body, 0)
    o_ref[:] = (oacc[:] / jnp.maximum(lacc[:], 1e-30)[:, :, None]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret", "block_batch"))
def flash_decode_step(
    q_t: jnp.ndarray,  # [b, h, d] processed query (l2norm * q_scale)
    kv_cache: jnp.ndarray,  # [b, N, 2d] packed K|V; N % CHUNK == 0
    pos: jnp.ndarray,  # scalar int32
    bias_row: jnp.ndarray,  # [N, h] f32: bias at (pos, j), junk rows j > pos ok
    add_mask: jnp.ndarray,  # [b, N] f32 additive (0 / NEG_INF)
    kv_scale: Optional[jnp.ndarray] = None,  # [2, b, N] f32 (int8 cache mode)
    *,
    scale: float = 8.0,
    interpret: bool = False,
    block_batch: Optional[int] = None,  # override the auto VMEM-capped block
) -> jnp.ndarray:
    """Returns [b, h*d]. ``kv_cache`` may be bf16/f32 (kv_scale None) or int8
    rows with per-row f32 scales."""
    b, h, d = q_t.shape
    N = kv_cache.shape[1]
    assert N % CHUNK == 0, f"cache len {N} must be padded to {CHUNK}"
    assert kv_cache.shape[2] == 2 * d
    quantized = kv_scale is not None
    if not quantized:
        kv_scale = jnp.zeros((2, b, N), jnp.float32)

    # batch block: largest divisor of b keeping the double-buffered chunk
    # scratch <= ~4 MB (the fine stage batches independent windows, so b
    # reaches 256+ and unblocked scratch would blow VMEM)
    per_row = 2 * CHUNK * 2 * d * kv_cache.dtype.itemsize
    cap = max(1, (4 << 20) // per_row)
    bb = block_batch or next(x for x in range(min(b, cap), 0, -1) if b % x == 0)
    assert b % bb == 0

    kernel = functools.partial(_kernel, scale=float(scale), quantized=quantized)
    out = pl.pallas_call(
        kernel,
        grid=(b // bb,),
        in_specs=[
            pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((bb, h, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((bb, h, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, d), q_t.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, bb, CHUNK, 2 * d), kv_cache.dtype),
            pltpu.VMEM((2, 2, bb, CHUNK), jnp.float32),
            pltpu.VMEM((bb, h), jnp.float32),
            pltpu.VMEM((bb, h), jnp.float32),
            pltpu.VMEM((bb, h, d), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * N * d,
            bytes_accessed=b * N * 2 * d * kv_cache.dtype.itemsize,
            transcendentals=b * h * N,
        ),
    )(
        jnp.reshape(pos.astype(jnp.int32), (1,)),
        q_t, bias_row.astype(jnp.float32), add_mask.astype(jnp.float32),
        kv_cache, kv_scale,
    )
    return out.reshape(b, h * d)


def flash_decode_step_xla(
    q_t, kv_cache, pos, bias_row, add_mask, kv_scale=None, *, scale: float = 8.0
) -> jnp.ndarray:
    """XLA fallback with identical numerics (CPU path / parity reference)."""
    b, h, d = q_t.shape
    N = kv_cache.shape[1]
    kvf = kv_cache.astype(jnp.float32)
    kf, vf = kvf[:, :, :d], kvf[:, :, d:]
    if kv_scale is not None:
        kf = kf * kv_scale[0][:, :, None]
        vf = vf * kv_scale[1][:, :, None]
    sim = jnp.einsum("bhd,bnd->bhn", q_t.astype(jnp.float32), kf) * scale
    sim = sim + jnp.transpose(bias_row.astype(jnp.float32))[None]
    sim = sim + add_mask.astype(jnp.float32)[:, None, :]
    j = jnp.arange(N)
    sim = jnp.where(j[None, None, :] <= pos, sim, NEG_INF)
    attn = jax.nn.softmax(sim, axis=-1)
    out = jnp.einsum("bhn,bnd->bhd", attn, vf)
    return out.reshape(b, h * d).astype(q_t.dtype)


def quantize_kv_row(row: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[b, d] f32/bf16 -> (int8 [b, d], scale f32 [b]) per-row symmetric."""
    absmax = jnp.max(jnp.abs(row.astype(jnp.float32)), axis=-1)
    s = jnp.maximum(absmax / 127.0, 1e-12)
    q = jnp.clip(
        jnp.round(row.astype(jnp.float32) / s[:, None]), -127, 127
    ).astype(jnp.int8)
    return q, s.astype(jnp.float32)
