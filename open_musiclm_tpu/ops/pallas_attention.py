"""Fused Pallas attention kernel for the shared-KV cosine-sim attention.

Why a kernel: the XLA path materializes the [b, h, n, m] similarity/attention
tensors in HBM (for musiclm_small coarse training, 2x8x1117x1117 floats per
layer per direction). This kernel keeps them in VMEM.

Design (TPU-first): K/V are a SINGLE shared head of dim 64 (transformer.py:204)
— the entire K/V for a 1.25k-token window is ~160 KB in bf16, so each grid
step loads the FULL K/V into VMEM and computes an exact softmax over the key
axis without online-softmax bookkeeping. Grid = (batch, heads, n_blocks);
each step computes one [Bn, d] query block: two MXU matmuls + a VPU softmax,
with the additive rel-pos bias block and causal/key masks applied in
registers. f32 accumulation, outputs in the input dtype.

Falls back to the XLA reference (ops/attention.py) under interpret mode on
CPU; parity-tested against it.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _attn_kernel(
    q_ref,  # [1, 1, Bn, d]
    k_ref,  # [1, m, d]
    v_ref,  # [1, m, d]
    bias_ref,  # [1, Bn, m] or None
    addmask_ref,  # [1, 1, m] additive (0 / NEG_INF) or None
    o_ref,  # [1, 1, Bn, d]
    *,
    scale: float,
    causal: bool,
    n_total: int,
    block_n: int,
    non_causal_prefix: int,
):
    ni = pl.program_id(2)
    q = q_ref[0, 0].astype(jnp.float32)  # [Bn, d]
    k = k_ref[0].astype(jnp.float32)  # [m, d]
    v = v_ref[0].astype(jnp.float32)

    sim = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [Bn, m]

    if bias_ref is not None:
        sim = sim + bias_ref[0].astype(jnp.float32)
    if addmask_ref is not None:
        sim = sim + addmask_ref[0, 0].astype(jnp.float32)[None, :]

    if causal:
        m = k.shape[0]
        rows = ni * block_n + jax.lax.broadcasted_iota(jnp.int32, sim.shape, 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 1)
        allowed = cols <= rows + (m - n_total)
        if non_causal_prefix > 0:
            prefix = (rows < non_causal_prefix) & (
                cols < (non_causal_prefix + m - n_total)
            )
            allowed = allowed | prefix
        sim = jnp.where(allowed, sim, NEG_INF)

    sim = sim - jnp.max(sim, axis=-1, keepdims=True)
    p = jnp.exp(sim)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) / jnp.maximum(denom, 1e-30)
    o_ref[0, 0] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "causal", "non_causal_prefix", "block_n", "interpret"),
)
def shared_kv_attention_pallas(
    q: jnp.ndarray,  # [b, h, n, d] processed queries
    k: jnp.ndarray,  # [b, m, d] processed keys
    v: jnp.ndarray,  # [b, m, d]
    attn_bias: Optional[jnp.ndarray] = None,  # [h, n, m]
    key_mask: Optional[jnp.ndarray] = None,  # [b, m] bool
    *,
    scale: float = 8.0,
    causal: bool = True,
    non_causal_prefix: int = 0,
    block_n: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns [b, n, h*d] like ops.attention.shared_kv_attention."""
    b, h, n, d = q.shape
    m = k.shape[1]
    block_n = min(block_n, max(8, n))
    n_pad = (-n) % block_n
    if n_pad:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, n_pad), (0, 0)))
        if attn_bias is not None:
            attn_bias = jnp.pad(attn_bias, ((0, 0), (0, n_pad), (0, 0)))
    np_blocks = (n + n_pad) // block_n

    add_mask = None
    if key_mask is not None:
        # [b, 1, m]: Mosaic requires a block's last-two dims be divisible by
        # (8, 128) or equal to the array dims — a [b, m] array with (1, m)
        # blocks violates the sublane rule; (1, 1, m) blocks of [b, 1, m]
        # don't
        add_mask = jnp.where(key_mask, 0.0, NEG_INF).astype(q.dtype)[:, None, :]

    in_specs = [
        pl.BlockSpec((1, 1, block_n, d), lambda bi, hi, ni: (bi, hi, ni, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, m, d), lambda bi, hi, ni: (bi, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, m, d), lambda bi, hi, ni: (bi, 0, 0), memory_space=pltpu.VMEM),
    ]
    args = [q, k, v]
    if attn_bias is not None:
        in_specs.append(
            pl.BlockSpec((1, block_n, m), lambda bi, hi, ni: (hi, ni, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(attn_bias)
    if add_mask is not None:
        in_specs.append(
            pl.BlockSpec((1, 1, m), lambda bi, hi, ni: (bi, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(add_mask)

    def kernel(*refs):
        q_ref, k_ref, v_ref = refs[0], refs[1], refs[2]
        idx = 3
        bias_ref = None
        if attn_bias is not None:
            bias_ref = refs[idx]
            idx += 1
        mask_ref = None
        if add_mask is not None:
            mask_ref = refs[idx]
            idx += 1
        o_ref = refs[-1]
        _attn_kernel(
            q_ref, k_ref, v_ref, bias_ref, mask_ref, o_ref,
            scale=scale, causal=causal, n_total=n, block_n=block_n,
            non_causal_prefix=non_causal_prefix,
        )

    out = pl.pallas_call(
        kernel,
        grid=(b, h, np_blocks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, block_n, d), lambda bi, hi, ni: (bi, hi, ni, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, n + n_pad, d), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * (n + n_pad) * m * d * 2,
            bytes_accessed=(q.size + 2 * b * m * d + b * h * n * d) * q.dtype.itemsize,
            transcendentals=b * h * (n + n_pad) * m,
        ),
    )(*args)

    out = out[:, :, :n, :]
    return out.transpose(0, 2, 1, 3).reshape(b, n, h * d)


# ---------------------------------------------------------------------------
# differentiable wrapper: pallas forward + pallas backward (recompute)
# ---------------------------------------------------------------------------


def _bwd_kernel(
    q_ref,  # [1, 1, Bn, d]
    k_ref,  # [1, m, d]
    v_ref,  # [1, m, d]
    bias_ref,  # [1, Bn, m] or None
    addmask_ref,  # [1, 1, m] or None
    do_ref,  # [1, 1, Bn, d]
    dq_ref,  # [1, 1, Bn, d]
    dk_ref,  # [1, m, d]   accumulated over (h, ni) — inner dims, consecutive
    dv_ref,  # [1, m, d]
    *,
    scale: float,
    causal: bool,
    n_total: int,
    block_n: int,
    non_causal_prefix: int,
):
    hi, ni = pl.program_id(1), pl.program_id(2)
    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0, 0].astype(jnp.float32)

    sim = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    if bias_ref is not None:
        sim = sim + bias_ref[0].astype(jnp.float32)
    if addmask_ref is not None:
        sim = sim + addmask_ref[0, 0].astype(jnp.float32)[None, :]
    if causal:
        m = k.shape[0]
        rows = ni * block_n + jax.lax.broadcasted_iota(jnp.int32, sim.shape, 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 1)
        allowed = cols <= rows + (m - n_total)
        if non_causal_prefix > 0:
            prefix = (rows < non_causal_prefix) & (
                cols < (non_causal_prefix + m - n_total)
            )
            allowed = allowed | prefix
        sim = jnp.where(allowed, sim, NEG_INF)

    sim = sim - jnp.max(sim, axis=-1, keepdims=True)
    e = jnp.exp(sim)
    denom = jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
    p = e / denom  # [Bn, m]

    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [Bn, m]
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))  # [Bn, m]

    dq = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)

    dk = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [m, d]
    dv = jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [m, d]

    first_inner = jnp.logical_and(hi == 0, ni == 0)

    @pl.when(first_inner)
    def _():
        dk_ref[0] = dk.astype(dk_ref.dtype)
        dv_ref[0] = dv.astype(dv_ref.dtype)

    @pl.when(jnp.logical_not(first_inner))
    def _():
        dk_ref[0] = dk_ref[0] + dk.astype(dk_ref.dtype)
        dv_ref[0] = dv_ref[0] + dv.astype(dv_ref.dtype)


def _dbias_kernel(
    q_ref,  # [1, 1, Bn, d]   (grid: h, ni, b — b innermost)
    k_ref,  # [1, m, d]
    v_ref,  # [1, m, d]
    bias_ref,  # [1, Bn, m]
    addmask_ref,  # [1, 1, m] or None
    do_ref,  # [1, 1, Bn, d]
    dbias_ref,  # [1, Bn, m] accumulated over b (innermost — consecutive)
    *,
    scale: float,
    causal: bool,
    n_total: int,
    block_n: int,
    non_causal_prefix: int,
):
    ni, bi = pl.program_id(1), pl.program_id(2)
    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0, 0].astype(jnp.float32)

    sim = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    sim = sim + bias_ref[0].astype(jnp.float32)
    if addmask_ref is not None:
        sim = sim + addmask_ref[0, 0].astype(jnp.float32)[None, :]
    if causal:
        m = k.shape[0]
        rows = ni * block_n + jax.lax.broadcasted_iota(jnp.int32, sim.shape, 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 1)
        allowed = cols <= rows + (m - n_total)
        if non_causal_prefix > 0:
            prefix = (rows < non_causal_prefix) & (
                cols < (non_causal_prefix + m - n_total)
            )
            allowed = allowed | prefix
        sim = jnp.where(allowed, sim, NEG_INF)

    sim = sim - jnp.max(sim, axis=-1, keepdims=True)
    e = jnp.exp(sim)
    denom = jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
    p = e / denom
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))

    @pl.when(bi == 0)
    def _():
        dbias_ref[0] = ds.astype(dbias_ref.dtype)

    @pl.when(bi != 0)
    def _():
        dbias_ref[0] = dbias_ref[0] + ds.astype(dbias_ref.dtype)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9)
)
def shared_kv_attention_fused(
    q, k, v, attn_bias, key_mask,
    scale: float = 8.0,
    causal: bool = True,
    non_causal_prefix: int = 0,
    block_n: int = 256,
    interpret: bool = False,
):
    """Differentiable fused attention. attn_bias/key_mask may be None."""
    return shared_kv_attention_pallas(
        q, k, v, attn_bias, key_mask,
        scale=scale, causal=causal, non_causal_prefix=non_causal_prefix,
        block_n=block_n, interpret=interpret,
    )


def _fused_fwd(q, k, v, attn_bias, key_mask, scale, causal, non_causal_prefix,
               block_n, interpret):
    out = shared_kv_attention_pallas(
        q, k, v, attn_bias, key_mask,
        scale=scale, causal=causal, non_causal_prefix=non_causal_prefix,
        block_n=block_n, interpret=interpret,
    )
    return out, (q, k, v, attn_bias, key_mask)


def _fused_bwd(scale, causal, non_causal_prefix, block_n, interpret, res, g):
    q, k, v, attn_bias, key_mask = res
    b, h, n, d = q.shape
    m = k.shape[1]
    bn = min(block_n, max(8, n))
    n_pad = (-n) % bn
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, n_pad), (0, 0))) if n_pad else q
    bias_p = attn_bias
    if attn_bias is not None and n_pad:
        bias_p = jnp.pad(attn_bias, ((0, 0), (0, n_pad), (0, 0)))
    np_blocks = (n + n_pad) // bn

    # g: [b, n, h*d] -> [b, h, n(+pad), d]
    do = g.reshape(b, n, h, d).transpose(0, 2, 1, 3)
    if n_pad:
        do = jnp.pad(do, ((0, 0), (0, 0), (0, n_pad), (0, 0)))

    add_mask = None
    if key_mask is not None:
        # [b, 1, m]: Mosaic requires a block's last-two dims be divisible by
        # (8, 128) or equal to the array dims — a [b, m] array with (1, m)
        # blocks violates the sublane rule; (1, 1, m) blocks of [b, 1, m]
        # don't
        add_mask = jnp.where(key_mask, 0.0, NEG_INF).astype(q.dtype)[:, None, :]

    has_bias = attn_bias is not None

    in_specs = [
        pl.BlockSpec((1, 1, bn, d), lambda bi, hi, ni: (bi, hi, ni, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, m, d), lambda bi, hi, ni: (bi, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, m, d), lambda bi, hi, ni: (bi, 0, 0), memory_space=pltpu.VMEM),
    ]
    args = [qp, k, v]
    if has_bias:
        in_specs.append(pl.BlockSpec((1, bn, m), lambda bi, hi, ni: (hi, ni, 0),
                                     memory_space=pltpu.VMEM))
        args.append(bias_p)
    if add_mask is not None:
        in_specs.append(pl.BlockSpec((1, 1, m), lambda bi, hi, ni: (bi, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(add_mask)
    in_specs.append(pl.BlockSpec((1, 1, bn, d), lambda bi, hi, ni: (bi, hi, ni, 0),
                                 memory_space=pltpu.VMEM))
    args.append(do)

    out_shapes = [
        jax.ShapeDtypeStruct((b, h, n + n_pad, d), jnp.float32),  # dq
        jax.ShapeDtypeStruct((b, m, d), jnp.float32),  # dk
        jax.ShapeDtypeStruct((b, m, d), jnp.float32),  # dv
    ]
    out_specs = [
        pl.BlockSpec((1, 1, bn, d), lambda bi, hi, ni: (bi, hi, ni, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, m, d), lambda bi, hi, ni: (bi, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, m, d), lambda bi, hi, ni: (bi, 0, 0), memory_space=pltpu.VMEM),
    ]

    def kernel(*refs):
        q_ref, k_ref, v_ref = refs[0], refs[1], refs[2]
        idx = 3
        bias_ref = None
        if has_bias:
            bias_ref = refs[idx]; idx += 1
        mask_ref = None
        if add_mask is not None:
            mask_ref = refs[idx]; idx += 1
        do_ref = refs[idx]; idx += 1
        dq_ref, dk_ref, dv_ref = refs[idx], refs[idx + 1], refs[idx + 2]
        _bwd_kernel(
            q_ref, k_ref, v_ref, bias_ref, mask_ref, do_ref,
            dq_ref, dk_ref, dv_ref,
            scale=scale, causal=causal, n_total=n, block_n=bn,
            non_causal_prefix=non_causal_prefix,
        )

    outs = pl.pallas_call(
        kernel,
        grid=(b, h, np_blocks),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(*args)

    dq = outs[0][:, :, :n, :].astype(q.dtype)
    dk = outs[1].astype(k.dtype)
    dv = outs[2].astype(v.dtype)

    dbias = None
    if has_bias:
        # second pass: dbias accumulated over batch, which must be the
        # INNERMOST grid dim (Pallas TPU only supports consecutive revisits
        # of an output block)
        db_in_specs = [
            pl.BlockSpec((1, 1, bn, d), lambda hi, ni, bi: (bi, hi, ni, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, d), lambda hi, ni, bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, d), lambda hi, ni, bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn, m), lambda hi, ni, bi: (hi, ni, 0),
                         memory_space=pltpu.VMEM),
        ]
        db_args = [qp, k, v, bias_p]
        if add_mask is not None:
            db_in_specs.append(
                pl.BlockSpec((1, 1, m), lambda hi, ni, bi: (bi, 0, 0),
                             memory_space=pltpu.VMEM)
            )
            db_args.append(add_mask)
        db_in_specs.append(
            pl.BlockSpec((1, 1, bn, d), lambda hi, ni, bi: (bi, hi, ni, 0),
                         memory_space=pltpu.VMEM)
        )
        db_args.append(do)

        def db_kernel(*refs):
            q_ref, k_ref, v_ref, bias_ref = refs[0], refs[1], refs[2], refs[3]
            idx = 4
            mask_ref = None
            if add_mask is not None:
                mask_ref = refs[idx]; idx += 1
            do_ref = refs[idx]; idx += 1
            dbias_ref = refs[idx]
            _dbias_kernel(
                q_ref, k_ref, v_ref, bias_ref, mask_ref, do_ref, dbias_ref,
                scale=scale, causal=causal, n_total=n, block_n=bn,
                non_causal_prefix=non_causal_prefix,
            )

        dbias_out = pl.pallas_call(
            db_kernel,
            grid=(h, np_blocks, b),
            in_specs=db_in_specs,
            out_specs=pl.BlockSpec((1, bn, m), lambda hi, ni, bi: (hi, ni, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((h, n + n_pad, m), jnp.float32),
            interpret=interpret,
        )(*db_args)
        dbias = dbias_out[:, :n, :].astype(attn_bias.dtype)

    return dq, dk, dv, dbias, None


shared_kv_attention_fused.defvjp(_fused_fwd, _fused_bwd)
