"""Fused per-layer decode mega-kernel: attention + conv-FF in ONE launch.

**Measured verdict (v5e, batch 64): 6x SLOWER than the two-kernel flash
path (25x vs 157x RT end-to-end) — kept as a documented experiment, not a
serving default.** Mosaic cannot shape-cast a [b, h*d] lane vector into
[b, h, d] inside a kernel, so the multi-head attention here runs per-head
on the VPU (broadcast-multiply-reduce); at 8 heads x 256-row chunks that
VPU work dominates the step, while the separate flash kernel
(ops/decode_attention.py) receives its queries pre-shaped [b, h, d] from
XLA and batches all heads onto the MXU. Until Mosaic supports the reshape
(or 2-non-contracting-dim dots), attention + FF stay as two launches.

The original motivation: the serving decode step at batch 64 runs ~3x
above its HBM speed-of-light (profile_pipeline.py), with per-layer time
partly in launch gaps and XLA glue between the flash-attention kernel and
the fused conv-FF kernel (ops/fused_ff.py), plus the attention projections
still streaming bf16 weights. This kernel computes an ENTIRE transformer
layer for one decode step in a single Pallas launch:

    LN -> q/kv proj (int8) -> cosine-sim flash attention over the packed
    int8 KV cache (early exit at ``pos``) -> out proj (int8) -> residual ->
    fused int8 conv-FF -> residual

with every weight matrix int8 in HBM and the activations never leaving
VMEM. Structural points:

  * **The current token's K/V row is consumed from registers**, not from
    the cache: cached chunks cover rows ``j < pos`` only and the fresh
    row's contribution is folded into the online softmax at the end. The
    caller then quantizes and writes the row AFTER the kernel (plain XLA
    dynamic_update_slice) — the kernel never writes HBM, and the row write
    no longer serializes against the attention read.
  * **Per-head attention over 2D vectors.** Mosaic cannot shape-cast a
    [b, h*d] lane vector into [b, h, d], so the Q/KV projections use
    TRANSPOSED weight layouts whose per-head rows are legal static sublane
    slices ([h*d, dim] -> rows h*d..(h+1)*d), and the online softmax runs
    per head on [b, d]/[b, C] tiles with the rel-pos bias passed
    transposed ([h, N] row reads).
  * **Grid over batch blocks** with constant weight index maps: Mosaic
    keeps the ~9.4 MB of int8 weights resident across blocks while the
    per-block KV chunk buffers stay bounded (fine-stage batches reach
    256+).

Weight packing reuses ops/fused_ff.pack_ff_weights for the FF block and
adds the attention matrices (pack_layer_weights). Numerics match the
flash_kv="int8" path (models/quant_decode.flash_quant_decode_step) —
parity-tested on the XLA fallback; serving-mode contract as the other int8
paths. Reference behavior: open_musiclm/transformer.py:166-333 (attention),
:140-150 (conv-FF), open_musiclm.py:299-319 (decode loop).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .decode_attention import CHUNK
from .fused_ff import _gelu_exact
from .quant import quantize_weight

NEG_INF = -1e9


def pack_layer_weights(a_params, f_params) -> Dict[str, Any]:
    """Quantize one layer's attention weights and bundle them with the FF
    pack (ops/fused_ff.pack_ff_weights layout) for the mega-kernel.

    Q/KV weights are stored TRANSPOSED ([out, in]) so the kernel can take
    per-head rows as static sublane slices; scales are reshaped to
    [heads, d] / [2, d] for the same reason."""
    from .fused_ff import pack_ff_weights

    d = a_params["q_scale"].shape[0]
    wq, sq = quantize_weight(a_params["to_q"]["kernel"])  # [dim, h*d], [h*d]
    wkv, skv = quantize_weight(a_params["to_kv"]["kernel"])  # [dim, 2d], [2d]
    wo, so = quantize_weight(a_params["to_out"]["kernel"])  # [h*d, dim], [dim]
    heads = wq.shape[1] // d
    return {
        "attn_gamma": a_params["norm"]["gamma"],
        "wqT": jnp.transpose(wq),  # [h*d, dim] int8
        "sqh": sq.reshape(heads, d),
        "wkvT": jnp.transpose(wkv),  # [2d, dim] int8
        "skv2": skv.reshape(2, d),
        "wo_attn": wo, "so_attn": so,
        "q_scale": a_params["q_scale"],
        "k_scale": a_params["k_scale"],
        "ff": pack_ff_weights(f_params),
    }


def _l2norm(x, eps=1e-12):
    n = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return x / jnp.maximum(n, eps)


def _ln(x, gamma, eps=1e-5):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * gamma[None, :]


def _kernel(
    # scalars
    pos_ref,  # SMEM (1,)
    # per-block activations
    x_ref,  # [bb, dim] VMEM
    # attention weights (index maps constant across blocks)
    gin_a_ref,  # [1, dim]
    wqt_ref,  # [h*d, dim] int8 (transposed)
    sqh_ref,  # [heads, d]
    wkvt_ref,  # [2d, dim] int8 (transposed)
    skv2_ref,  # [2, d]
    qsc_ref, ksc_ref,  # [1, d]
    woa_ref, soa_ref,  # [h*d, dim] int8, [1, dim]
    # attention cache inputs
    biasT_ref,  # [h, N] (transposed decode-layout row, shared)
    bias0_ref,  # [h, 1]: bias at causal distance 0
    addmask_ref,  # [bb, N]
    kv_hbm,  # [b, N, 2d] int8 ANY
    sc_hbm,  # [2, b, N] f32 ANY
    # FF weights
    gin_f_ref,  # [1, dim]
    wv_ref, sv_ref, wg_ref, sg_ref,  # [dim, P] int8 + [1, P]
    convv_ref, convg_ref,  # [4, P]
    gmid_ref,  # [1, P]
    wof_ref, sof_ref,  # [P, dim] int8, [1, dim]
    # FF conv state (split+padded, fused_ff layout)
    sv0_ref, sv1_ref, sg0_ref, sg1_ref,  # [bb, P]
    # outputs
    y_ref,  # [bb, dim]
    kt_ref,  # [bb, d] f32 processed fresh K row (caller writes the cache)
    vt_ref,  # [bb, d] f32 fresh V row
    sv1o_ref, sg1o_ref,  # [bb, P]
    # scratch
    kvbuf,  # (2, bb, CHUNK, 2d) int8
    scbuf,  # (2, 2, bb, CHUNK) f32
    sems,  # DMA (2, 2)
    *,
    heads: int,
    scale: float,
    inner: int,
):
    bb, dim = x_ref.shape
    d = qsc_ref.shape[1]
    pid = pl.program_id(0)
    pos = pos_ref[0]

    x = x_ref[:].astype(jnp.float32)

    # ---- attention projections (reference quirk: K/V from the UN-normed
    # residual stream, only Q prenormed; transformer.py:228,250,254) ----
    h_ln = _ln(x, gin_a_ref[0].astype(jnp.float32))
    qs = []
    for hh in range(heads):
        q_h = jax.lax.dot_general(
            h_ln, wqt_ref[hh * d:(hh + 1) * d, :].astype(jnp.float32),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        ) * sqh_ref[hh][None, :]
        qs.append(_l2norm(q_h) * qsc_ref[0][None, :])  # [bb, d]
    k_t = jax.lax.dot_general(
        x, wkvt_ref[0:d, :].astype(jnp.float32),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    ) * skv2_ref[0][None, :]
    v_t = jax.lax.dot_general(
        x, wkvt_ref[d:2 * d, :].astype(jnp.float32),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    ) * skv2_ref[1][None, :]
    k_t = _l2norm(k_t) * ksc_ref[0][None, :]
    kt_ref[:] = k_t.astype(kt_ref.dtype)
    vt_ref[:] = v_t.astype(vt_ref.dtype)

    # ---- flash attention over cached rows j < pos, + the fresh row ----
    nvalid = (pos + CHUNK - 1) // CHUNK  # chunks covering [0, pos)

    def get_dmas(slot, c):
        off = pl.multiple_of(c * CHUNK, CHUNK)
        boff = pl.multiple_of(pid * bb, bb)
        return [
            pltpu.make_async_copy(
                kv_hbm.at[pl.ds(boff, bb), pl.ds(off, CHUNK), :],
                kvbuf.at[slot], sems.at[slot, 0],
            ),
            pltpu.make_async_copy(
                sc_hbm.at[:, pl.ds(boff, bb), pl.ds(off, CHUNK)],
                scbuf.at[slot], sems.at[slot, 1],
            ),
        ]

    @pl.when(nvalid > 0)
    def _():
        for dma in get_dmas(0, 0):
            dma.start()

    def body(c, carry):
        ms, ls, accs = carry
        slot = c % 2

        @pl.when(c + 1 < nvalid)
        def _():
            for dma in get_dmas((c + 1) % 2, c + 1):
                dma.start()

        for dma in get_dmas(slot, c):
            dma.wait()
        kv = kvbuf[slot].astype(jnp.float32)  # [bb, C, 2d]
        k = kv[:, :, :d]
        v = kv[:, :, d:]
        ksc_c = scbuf[slot][0] * scale  # [bb, C] K row scales * sim scale
        vsc_c = scbuf[slot][1]
        am_c = addmask_ref[:, pl.ds(c * CHUNK, CHUNK)]  # [bb, C]
        cols = c * CHUNK + jax.lax.broadcasted_iota(jnp.int32, (bb, CHUNK), 1)
        dead = cols >= pos  # fresh row is NOT cached: strictly j < pos

        new_ms, new_ls, new_accs = [], [], []
        for hh in range(heads):
            # broadcast-multiply-reduce instead of a batched dot: Mosaic's
            # dot requires a non-contracting lhs dim, and bb*C*d VPU ops are
            # ~us next to the chunk DMA
            sim = jnp.sum(qs[hh][:, None, :] * k, axis=-1) * ksc_c  # [bb, C]
            sim = sim + biasT_ref[hh, pl.ds(c * CHUNK, CHUNK)][None, :]
            sim = sim + am_c
            sim = jnp.where(dead, NEG_INF, sim)
            m_new = jnp.maximum(ms[hh], jnp.max(sim, axis=-1, keepdims=True))
            alpha = jnp.exp(ms[hh] - m_new)
            p = jnp.exp(sim - m_new)
            new_ls.append(ls[hh] * alpha + jnp.sum(p, axis=-1, keepdims=True))
            pv = jnp.sum((p * vsc_c)[:, :, None] * v, axis=1)  # [bb, d]
            new_accs.append(accs[hh] * alpha + pv)
            new_ms.append(m_new)
        return tuple(new_ms), tuple(new_ls), tuple(new_accs)

    m0 = tuple(jnp.full((bb, 1), NEG_INF, jnp.float32) for _ in range(heads))
    l0 = tuple(jnp.zeros((bb, 1), jnp.float32) for _ in range(heads))
    a0 = tuple(jnp.zeros((bb, d), jnp.float32) for _ in range(heads))
    ms, ls, accs = jax.lax.fori_loop(0, nvalid, body, (m0, l0, a0))

    # fresh row (distance-0 bias; always key-valid) + output projection:
    # out = sum_h attn_h @ wo[h*d:(h+1)*d, :], then the per-column scale
    out_pre = jnp.zeros((bb, dim), jnp.float32)
    for hh in range(heads):
        sim_self = jnp.sum(qs[hh] * k_t, axis=-1, keepdims=True) * scale
        sim_self = sim_self + bias0_ref[hh, 0]
        m_new = jnp.maximum(ms[hh], sim_self)
        alpha = jnp.exp(ms[hh] - m_new)
        p_self = jnp.exp(sim_self - m_new)  # [bb, 1]
        l_fin = ls[hh] * alpha + p_self
        acc = accs[hh] * alpha + p_self * v_t
        attn_h = acc / jnp.maximum(l_fin, 1e-30)  # [bb, d]
        out_pre = out_pre + jax.lax.dot_general(
            attn_h, woa_ref[hh * d:(hh + 1) * d, :].astype(jnp.float32),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
    x2 = x + out_pre * soa_ref[0][None, :]

    # ---- fused conv-FF (ops/fused_ff.py numerics) ----
    hf = _ln(x2, gin_f_ref[0].astype(jnp.float32))
    u_v = jax.lax.dot_general(
        hf, wv_ref[:].astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * sv_ref[0][None, :]
    u_g = jax.lax.dot_general(
        hf, wg_ref[:].astype(jnp.float32), (((1,), (0,)), ((), ())),
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
    g = _gelu_exact(conv_g) * conv_v  # pad lanes exactly 0
    mu = jnp.sum(g, axis=-1, keepdims=True) / inner
    var_g = jnp.sum(g * g, axis=-1, keepdims=True) / inner - mu * mu
    gn = (g - mu) * jax.lax.rsqrt(var_g + 1e-5) * gmid_ref[0].astype(jnp.float32)[None, :]
    ffo = jax.lax.dot_general(
        gn, wof_ref[:].astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * sof_ref[0][None, :]

    y_ref[:] = (x2 + ffo).astype(y_ref.dtype)
    sv1o_ref[:] = u_v.astype(sv1o_ref.dtype)
    sg1o_ref[:] = u_g.astype(sg1o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("heads", "scale", "interpret", "block_batch")
)
def fused_layer_decode_step(
    x: jnp.ndarray,  # [b, dim] residual input
    packed: Dict[str, Any],  # pack_layer_weights bundle
    kv_cache: jnp.ndarray,  # [b, N, 2d] int8, rows j < pos live
    kv_scale: jnp.ndarray,  # [2, b, N] f32
    ff_state: jnp.ndarray,  # [b, 2, 2*inner] cache-layout conv taps
    pos: jnp.ndarray,  # scalar int32
    bias_row: jnp.ndarray,  # [N, h]
    add_mask: jnp.ndarray,  # [b, N] f32 additive
    *,
    heads: int,
    scale: float = 8.0,
    interpret: bool = False,
    block_batch: Optional[int] = None,  # override the auto VMEM-capped block
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (y [b, dim], krow [b, 2d] processed k|v to quantize+write,
    new ff_state). The caller owns the cache-row write."""
    b, dim = x.shape
    N = kv_cache.shape[1]
    two_d = kv_cache.shape[2]
    d = two_d // 2
    assert N % CHUNK == 0
    ff = packed["ff"]
    P = ff["wv"].shape[1]
    inner = ff_state.shape[2] // 2
    pad = P - inner

    def split_pad(row):  # [b, 2*inner] -> ([b, P], [b, P])
        return (
            jnp.pad(row[:, :inner], ((0, 0), (0, pad))),
            jnp.pad(row[:, inner:], ((0, 0), (0, pad))),
        )

    sv0, sg0 = split_pad(ff_state[:, 0, :])
    sv1, sg1 = split_pad(ff_state[:, 1, :])

    per_row = 2 * CHUNK * two_d * kv_cache.dtype.itemsize
    cap = max(1, (2 << 20) // per_row)
    bb = block_batch or next(i for i in range(min(b, cap), 0, -1) if b % i == 0)
    assert b % bb == 0

    vm = pltpu.VMEM
    const2 = lambda blk: pl.BlockSpec(blk, lambda i: (0, 0), memory_space=vm)
    batched = lambda blk: pl.BlockSpec(blk, lambda i: (i, 0), memory_space=vm)

    kernel = functools.partial(
        _kernel, heads=heads, scale=float(scale), inner=inner
    )
    hd = heads * d
    biasT = jnp.transpose(bias_row.astype(jnp.float32))  # [h, N]
    bias0 = jax.lax.dynamic_slice(biasT, (0, pos), (heads, 1))
    y, k_t, v_t, sv1o, sg1o = pl.pallas_call(
        kernel,
        grid=(b // bb,),
        in_specs=[
            pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM),
            batched((bb, dim)),
            const2((1, dim)),
            const2((hd, dim)),
            const2((heads, d)),
            const2((two_d, dim)),
            const2((2, d)),
            const2((1, d)), const2((1, d)),
            const2((hd, dim)), const2((1, dim)),
            const2((heads, N)),
            const2((heads, 1)),
            batched((bb, N)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            const2((1, dim)),
            const2((dim, P)), const2((1, P)),
            const2((dim, P)), const2((1, P)),
            const2((4, P)), const2((4, P)),
            const2((1, P)),
            const2((P, dim)), const2((1, dim)),
            batched((bb, P)), batched((bb, P)),
            batched((bb, P)), batched((bb, P)),
        ],
        out_specs=(
            batched((bb, dim)),
            batched((bb, d)),
            batched((bb, d)),
            batched((bb, P)),
            batched((bb, P)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, dim), x.dtype),
            jax.ShapeDtypeStruct((b, d), jnp.float32),
            jax.ShapeDtypeStruct((b, d), jnp.float32),
            jax.ShapeDtypeStruct((b, P), ff_state.dtype),
            jax.ShapeDtypeStruct((b, P), ff_state.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, bb, CHUNK, two_d), kv_cache.dtype),
            pltpu.VMEM((2, 2, bb, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            # ~9.4 MB of int8 weights + block activations + chunk buffers;
            # the default 16 MB scoped limit counts Mosaic's own block
            # double-buffering, so raise it explicitly
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * dim * (hd + two_d + hd) + 6 * b * dim * P
            + 4 * b * heads * N * d,
            bytes_accessed=dim * (hd + two_d + hd) + 3 * dim * P
            + b * N * two_d,
            transcendentals=b * (heads * N + P),
        ),
    )(
        jnp.reshape(pos.astype(jnp.int32), (1,)),
        x,
        packed["attn_gamma"][None, :],
        packed["wqT"],
        packed["sqh"].astype(jnp.float32),
        packed["wkvT"],
        packed["skv2"].astype(jnp.float32),
        packed["q_scale"][None, :].astype(jnp.float32),
        packed["k_scale"][None, :].astype(jnp.float32),
        packed["wo_attn"], packed["so_attn"][None, :],
        biasT,
        bias0,
        add_mask.astype(jnp.float32),
        kv_cache, kv_scale,
        ff["gin"][None, :],
        ff["wv"], ff["sv"][None, :],
        ff["wg"], ff["sg"][None, :],
        ff["conv_v"], ff["conv_g"],
        ff["gmid"][None, :],
        ff["wo"], ff["so"][None, :],
        sv0, sv1, sg0, sg1,
    )
    krow = jnp.concatenate([k_t, v_t], axis=-1)
    u = jnp.concatenate([sv1o[:, :inner], sg1o[:, :inner]], axis=-1)
    new_state = jnp.stack([ff_state[:, 1, :], u], axis=1)
    return y, krow, new_state


def fused_layer_decode_step_xla(
    x, packed, kv_cache, kv_scale, ff_state, pos, bias_row, add_mask,
    *, heads: int, scale: float = 8.0,
):
    """Identical numerics without the kernel (CPU path / parity reference)."""
    from .fused_ff import fused_ff_apply_xla

    b, dim = x.shape
    d = kv_cache.shape[2] // 2
    xf = x.astype(jnp.float32)
    h = _ln(xf, packed["attn_gamma"].astype(jnp.float32))
    wq = jnp.transpose(packed["wqT"]).astype(jnp.float32)  # [dim, h*d]
    sq = packed["sqh"].reshape(-1)
    qv = (h @ wq) * sq[None, :]
    wkv = jnp.transpose(packed["wkvT"]).astype(jnp.float32)
    skv = packed["skv2"].reshape(-1)
    kvp = (xf @ wkv) * skv[None, :]
    q = _l2norm(qv.reshape(b, heads, d)) * packed["q_scale"].astype(jnp.float32)[None, None, :]
    k_t = _l2norm(kvp[:, :d]) * packed["k_scale"].astype(jnp.float32)[None, :]
    v_t = kvp[:, d:]
    krow = jnp.concatenate([k_t, v_t], axis=-1)

    # cached rows (j < pos), then fold in the fresh row with the same
    # online-softmax update the kernel uses
    N = kv_cache.shape[1]
    j = jnp.arange(N)
    kf = kv_cache[:, :, :d].astype(jnp.float32) * kv_scale[0][:, :, None]
    vf = kv_cache[:, :, d:].astype(jnp.float32) * kv_scale[1][:, :, None]
    sim = jnp.einsum("bhd,bnd->bhn", q, kf) * scale
    sim = sim + jnp.transpose(bias_row.astype(jnp.float32))[None]
    sim = sim + add_mask.astype(jnp.float32)[:, None, :]
    sim = jnp.where(j[None, None, :] < pos, sim, NEG_INF)
    sim_self = jnp.sum(q * k_t[:, None, :], axis=-1) * scale
    sim_self = sim_self + bias_row[pos][None, :].astype(jnp.float32)
    m = jnp.maximum(jnp.max(sim, axis=-1), sim_self)
    p = jnp.exp(sim - m[:, :, None])
    p_self = jnp.exp(sim_self - m)
    denom = jnp.sum(p, axis=-1) + p_self
    acc = jnp.einsum("bhn,bnd->bhd", p, vf) + p_self[:, :, None] * v_t[:, None, :]
    attn = acc / jnp.maximum(denom, 1e-30)[:, :, None]

    out = (attn.reshape(b, heads * d) @ packed["wo_attn"].astype(jnp.float32)) * packed["so_attn"][None, :]
    x2 = (xf + out).astype(x.dtype)
    y, new_state = fused_ff_apply_xla(x2, packed["ff"], ff_state)
    return y, krow, new_state
