"""int8 weight-only decode path for serving.

A functional mirror of ``Transformer.decode_step`` + ``step_logits`` that
streams the big matmul weights (to_q/to_kv/to_out/proj_in/proj_out, logit
heads) as per-channel int8 through the Pallas kernel (ops/quant.py), halving
the HBM weight traffic that bounds decode throughput. Norms, per-dim scales,
conv taps, embeddings and the rel-pos table stay full precision (they are a
rounding error of the byte budget).

Opt-in serving mode: quantization perturbs logits slightly, so fixed-seed
token parity versus the full-precision path is approximate (argmax tokens
typically agree; guaranteed parity requires the fp path). Verified
numerically against the flax decode step in tests.

Measured on one v5e chip (coarse geometry, batch 8):
  * per-matmul int8 kernels (fused_ff=False): 0.92x — launch overhead
    (~31 Pallas calls/step) offsets the bandwidth saving;
  * fused conv-FF kernel + bf16 XLA attention (fused_ff=True, the default):
    1.25x (38k -> 47k tok/s) — one launch covers 88 % of the weight bytes
    at int8. This is the serving configuration `Stage(quantized=True)` uses.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from ..core.sampling import (
    NEG_INF,
    append_eos_id,
    mask_out_after_eos_id,
    sample_top_k_gumbel,
    sample_top_k_gumbel_per_row,
    split_row_keys,
)
from ..ops.attention import l2norm, shared_kv_decode_step
from ..ops.decode_attention import (
    flash_decode_step,
    flash_decode_step_xla,
    quantize_kv_row,
    round_up_chunk,
)
from ..ops.quant import int8_matmul, int8_matmul_xla, quantize_weight
from .token_cond import (
    PAD_ID,
    TokenConditionedTransformer,
    _tfm_bias_table,
    _tfm_init_cache,
    _tfm_prefill,
)


def _ln(x: jnp.ndarray, gamma: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps) * gamma).astype(x.dtype)


def quantize_stage_params(
    model: TokenConditionedTransformer, params, fused: bool = False
) -> Dict[str, Any]:
    """Build the int8 side-tree for the decode path. ``fused=True`` also
    packs per-layer attention weights for the mega-kernel
    (ops/fused_layer.py, flash_kv="fused")."""
    p = params["params"]
    t = p["transformer"]
    q: Dict[str, Any] = {}
    for l in range(model.depth):
        a = t[f"attn_{l}"]
        f = t[f"ff_{l}"]
        q[f"attn_{l}"] = {
            "to_q": quantize_weight(a["to_q"]["kernel"]),
            "to_kv": quantize_weight(a["to_kv"]["kernel"]),
            "to_out": quantize_weight(a["to_out"]["kernel"]),
        }
        from ..ops.fused_ff import pack_ff_weights

        q[f"ff_{l}"] = {
            "proj_in": quantize_weight(f["proj_in"]["kernel"]),
            "proj_out": quantize_weight(f["proj_out"]["kernel"]),
            "packed": pack_ff_weights(f),
        }
        if fused:
            from ..ops.fused_layer import pack_layer_weights

            q[f"layer_{l}"] = pack_layer_weights(a, f)
    # final-sequence logit heads: [Q, C, d] -> per-head [d, C] int8
    w = p[f"logits_{len(model.specs) - 1}"]
    heads_q, heads_s = [], []
    for i in range(w.shape[0]):
        wq, ws = quantize_weight(jnp.transpose(w[i]))  # [d, C]
        heads_q.append(wq)
        heads_s.append(ws)
    q["logit_heads"] = (jnp.stack(heads_q), jnp.stack(heads_s))
    return q


def quant_decode_step(
    model: TokenConditionedTransformer,
    params,
    qparams,
    x_t: jnp.ndarray,  # [b, dim]
    cache: Dict[str, jnp.ndarray],
    pos: jnp.ndarray,
    bias_table: Optional[jnp.ndarray],
    matmul: Callable = int8_matmul,
    fused_ff: bool = False,
):
    """One decode step with int8 weights. Returns (normed h [b, dim], cache).

    ``fused_ff=True`` runs the conv-FF block (88 % of the step's weight
    bytes) through the single-launch fused kernel (ops/fused_ff.py) while
    attention uses plain XLA bf16 matmuls — the best-measured serving config.
    """
    from ..ops.fused_ff import fused_ff_apply, fused_ff_apply_xla

    t = params["params"]["transformer"]
    d = model.dim_head
    heads = model.heads
    x = x_t
    # single-row in-place writes on the stacked cache buffers (see
    # Transformer.decode_step) — slice/update/stack would copy the whole
    # cache every step
    k_all, v_all, ff_all = cache["k"], cache["v"], cache["ff"]
    for l in range(model.depth):
        a, qa = t[f"attn_{l}"], qparams[f"attn_{l}"]
        h = _ln(x, a["norm"]["gamma"])
        # reference quirk: K/V project from the UN-normed residual stream,
        # only Q from the prenormed one (reference transformer.py:228,250,254)
        if fused_ff:
            # attention weights stay bf16/XLA (they are ~12 % of the bytes)
            qv = h @ a["to_q"]["kernel"].astype(h.dtype)
            kv = x @ a["to_kv"]["kernel"].astype(x.dtype)
        else:
            qv = matmul(h, *qa["to_q"])  # [b, heads*d]
            kv = matmul(x, *qa["to_kv"])  # [b, 2d]
        b = x.shape[0]
        qh = qv.reshape(b, heads, d)
        k_t, v_t = jnp.split(kv, 2, axis=-1)
        qh = l2norm(qh) * a["q_scale"].astype(qh.dtype)
        k_t = l2norm(k_t) * a["k_scale"].astype(k_t.dtype)
        k_all = jax.lax.dynamic_update_slice(
            k_all, k_t[None, :, None, :], (l, 0, pos, 0)
        )
        v_all = jax.lax.dynamic_update_slice(
            v_all, v_t[None, :, None, :], (l, 0, pos, 0)
        )
        attn = shared_kv_decode_step(
            qh, k_all[l], v_all[l], pos, scale=8.0, bias_table=bias_table,
            key_mask=cache["mask"],
        )
        if fused_ff:
            x = x + attn @ a["to_out"]["kernel"].astype(attn.dtype)
        else:
            x = x + matmul(attn, *qa["to_out"])

        f, qf = t[f"ff_{l}"], qparams[f"ff_{l}"]
        ff_state = ff_all[l]
        if fused_ff:
            ff_fn = fused_ff_apply if matmul is int8_matmul else fused_ff_apply_xla
            x, new_state = ff_fn(x, qf["packed"], ff_state)
        else:
            h2 = _ln(x, f["norm_in"]["gamma"])
            u_t = matmul(h2, *qf["proj_in"])  # [b, 2*inner]
            w = f["conv_w"].astype(u_t.dtype)
            conv = ff_state[:, 0] * w[0] + ff_state[:, 1] * w[1] + u_t * w[2]
            val, gate = jnp.split(conv, 2, axis=-1)
            g = jax.nn.gelu(gate, approximate=False) * val
            g = _ln(g, f["norm_mid"]["gamma"])
            x = x + matmul(g, *qf["proj_out"])
            new_state = jnp.stack([ff_state[:, 1], u_t], axis=1)
        ff_all = jax.lax.dynamic_update_slice(ff_all, new_state[None], (l, 0, 0, 0))

    cache = {"k": k_all, "v": v_all, "ff": ff_all, "mask": cache["mask"]}
    return _ln(x, t["final_norm"]["gamma"]), cache


def pack_kv_cache(
    cache: Dict[str, jnp.ndarray], int8: bool, cache_dtype: Optional[Any] = None
):
    """Convert the prefit separate-K/V cache to the flash kernel's packed
    layout (ops/decode_attention.py): kv [depth, b, N, 2d] with K in lanes
    0:d, V in d:2d; int8 mode adds per-row scales [depth, 2, b, N].
    ``cache_dtype`` overrides the resident row dtype for the non-int8 modes
    (flash_kv="f32" keeps full-precision rows: 2x the bytes of bf16 but no
    row-rounding of the softmax inputs — the r4 deviation ladder showed the
    fine stage's 36% per-step mismatch comes from cache-row precision, not
    int8 weights)."""
    kv = jnp.concatenate([cache["k"], cache["v"]], axis=-1)
    if cache_dtype is not None:
        kv = kv.astype(cache_dtype)
    out = {"ff": cache["ff"], "mask": cache["mask"]}
    if int8:
        d = cache["k"].shape[-1]

        def quant_rows(rows):  # [b, N, d] -> (int8, scales [b, N])
            q, s = jax.vmap(quantize_kv_row, in_axes=1, out_axes=1)(rows)
            return q, s

        kq, ks = jax.vmap(quant_rows)(cache["k"])
        vq, vs = jax.vmap(quant_rows)(cache["v"])
        out["kv"] = jnp.concatenate([kq, vq], axis=-1)
        out["kvs"] = jnp.stack([ks, vs], axis=1)  # [depth, 2, b, N]
    else:
        out["kv"] = kv
    return out


def flash_quant_decode_step(
    model: TokenConditionedTransformer,
    params,
    qparams,
    x_t: jnp.ndarray,  # [b, dim]
    cache: Dict[str, jnp.ndarray],  # packed layout (pack_kv_cache)
    pos: jnp.ndarray,
    bias_row: jnp.ndarray,  # [N, h] decode-layout row for this pos
    add_mask: jnp.ndarray,  # [b, N] f32 additive key mask
    *,
    int8_kv: bool,
    use_pallas: bool,
):
    """quant_decode_step twin over the packed KV cache + flash kernel
    (fused_ff attention weights stay bf16/XLA as in the measured-best
    serving config)."""
    from ..ops.fused_ff import fused_ff_apply, fused_ff_apply_xla

    t = params["params"]["transformer"]
    d = model.dim_head
    heads = model.heads
    x = x_t
    kv_all, ff_all = cache["kv"], cache["ff"]
    kvs_all = cache.get("kvs")
    step_fn = flash_decode_step if use_pallas else flash_decode_step_xla
    ff_fn = fused_ff_apply if use_pallas else fused_ff_apply_xla
    for l in range(model.depth):
        a = t[f"attn_{l}"]
        h = _ln(x, a["norm"]["gamma"])
        # reference quirk: K/V project from the UN-normed residual stream
        qv = h @ a["to_q"]["kernel"].astype(h.dtype)
        kv = x @ a["to_kv"]["kernel"].astype(x.dtype)
        b = x.shape[0]
        qh = qv.reshape(b, heads, d)
        k_t, v_t = jnp.split(kv, 2, axis=-1)
        qh = l2norm(qh) * a["q_scale"].astype(qh.dtype)
        k_t = l2norm(k_t) * a["k_scale"].astype(k_t.dtype)
        if int8_kv:
            kq, ks = quantize_kv_row(k_t)
            vq, vs = quantize_kv_row(v_t)
            row = jnp.concatenate([kq, vq], axis=-1)  # [b, 2d] int8
            kvs_all = jax.lax.dynamic_update_slice(
                kvs_all, jnp.stack([ks, vs])[None, :, :, None], (l, 0, 0, pos)
            )
        else:
            row = jnp.concatenate([k_t, v_t], axis=-1).astype(kv_all.dtype)
        kv_all = jax.lax.dynamic_update_slice(
            kv_all, row[None, :, None, :], (l, 0, pos, 0)
        )
        attn = step_fn(
            qh, kv_all[l], pos, bias_row, add_mask,
            kvs_all[l] if int8_kv else None, scale=8.0,
        )
        x = x + attn @ a["to_out"]["kernel"].astype(attn.dtype)

        f, qf = t[f"ff_{l}"], qparams[f"ff_{l}"]
        x, new_state = ff_fn(x, qf["packed"], ff_all[l])
        ff_all = jax.lax.dynamic_update_slice(ff_all, new_state[None], (l, 0, 0, 0))

    cache = {"kv": kv_all, "ff": ff_all, "mask": cache["mask"]}
    if kvs_all is not None:
        cache["kvs"] = kvs_all
    return _ln(x, t["final_norm"]["gamma"]), cache


def fused_layer_step(
    model: TokenConditionedTransformer,
    params,
    qparams,
    x_t: jnp.ndarray,  # [b, dim]
    cache: Dict[str, jnp.ndarray],  # packed int8 layout (pack_kv_cache)
    pos: jnp.ndarray,
    bias_row: jnp.ndarray,
    add_mask: jnp.ndarray,
    *,
    use_pallas: bool,
):
    """One decode step through the per-layer mega-kernel
    (ops/fused_layer.py): attention + conv-FF in one launch per layer, all
    weights int8, the fresh K/V row consumed from registers and written
    back (quantized) by this wrapper AFTER the kernel."""
    from ..ops.fused_layer import (
        fused_layer_decode_step,
        fused_layer_decode_step_xla,
    )

    t = params["params"]["transformer"]
    d = model.dim_head
    step_fn = fused_layer_decode_step if use_pallas else fused_layer_decode_step_xla
    kv_all, kvs_all, ff_all = cache["kv"], cache["kvs"], cache["ff"]
    x = x_t
    for l in range(model.depth):
        x, krow, new_ff = step_fn(
            x, qparams[f"layer_{l}"], kv_all[l], kvs_all[l], ff_all[l],
            pos, bias_row, add_mask, heads=model.heads,
        )
        kq, ks = quantize_kv_row(krow[:, :d])
        vq, vs = quantize_kv_row(krow[:, d:])
        kv_all = jax.lax.dynamic_update_slice(
            kv_all, jnp.concatenate([kq, vq], -1)[None, :, None, :], (l, 0, pos, 0)
        )
        kvs_all = jax.lax.dynamic_update_slice(
            kvs_all, jnp.stack([ks, vs])[None, :, :, None], (l, 0, 0, pos)
        )
        ff_all = jax.lax.dynamic_update_slice(ff_all, new_ff[None], (l, 0, 0, 0))
    cache = {"kv": kv_all, "kvs": kvs_all, "ff": ff_all, "mask": cache["mask"]}
    return _ln(x, t["final_norm"]["gamma"]), cache


def generate_quantized(
    model: TokenConditionedTransformer,
    params,
    qparams,
    conditioning_token_ids: Sequence[jnp.ndarray],
    rng: Optional[jax.Array],
    *,
    max_time_steps: int,
    init_pred_ids: Optional[jnp.ndarray] = None,
    filter_thres: float = 0.9,
    temperature: float = 1.0,
    allow_eos_in_output: bool = False,
    include_eos_in_output: bool = False,
    append_eos_to_conditioning_tokens: bool = True,
    use_pallas: Optional[bool] = None,
    fused_ff: bool = True,
    per_row_keys: Optional[jnp.ndarray] = None,
    flash_kv: Optional[str] = None,  # None | "bf16" | "f32" | "int8" | "fused"
    approx_topk: Optional[bool] = None,
    teacher_ids: Optional[jnp.ndarray] = None,  # see token_cond.generate
    return_logits: bool = False,  # see token_cond.generate
) -> jnp.ndarray:
    """int8-decode twin of token_cond.generate: fp prefill (one pass), int8
    scan decode. ``use_pallas=None`` auto-selects (kernel off on CPU, which
    only supports interpret mode).

    ``flash_kv`` switches attention-over-cache to the packed-KV flash-decode
    kernel (ops/decode_attention.py): early exit at ``pos``, one DMA per
    256-row chunk, with bf16 ("bf16"), f32 ("f32") or int8 ("int8") cache
    rows. "fused" runs the whole layer (attention + conv-FF, all weights
    int8) as ONE launch per layer (ops/fused_layer.py)."""
    if flash_kv not in (None, "bf16", "f32", "int8", "fused"):
        raise ValueError(
            f"unknown flash_kv mode {flash_kv!r}: expected None, 'bf16', "
            "'f32', 'int8' or 'fused'"
        )
    specs = model.specs
    pred_spec = specs[-1]
    q_num = pred_spec.num_quantizers
    eos_id = pred_spec.eos_id
    batch = conditioning_token_ids[0].shape[0]
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)
    matmul = int8_matmul if use_pallas else int8_matmul_xla

    # Mosaic DMA slices of the flash cache's per-row arrays must align to
    # the f32 sublane tiling: a batch like 3 (one prompt x 3 batched fine
    # windows, musiclm_large latency lane) fails to compile. Pad the decode
    # rows up to a multiple of 8 (row 0 replicated), run the padded decode,
    # slice the real rows back out. per_row_keys rows are row-local, so
    # their tokens are exactly what the unpadded decode would sample; the
    # shared-rng path draws its gumbel noise at the padded shape (threefry
    # zips the two halves of the flat counter range, so the stream depends
    # on total length) — real rows get a different-but-equally-valid sample
    # stream. Kernel path only — CPU (tests/goldens) uses the XLA twins and
    # is untouched.
    if flash_kv and use_pallas and batch % 8 != 0:
        bp = -(-batch // 8) * 8

        def _pad_rows(a):
            if a is None:
                return None
            reps = jnp.broadcast_to(a[:1], (bp - batch,) + a.shape[1:])
            return jnp.concatenate([a, reps], axis=0)

        out = generate_quantized(
            model, params, qparams,
            [_pad_rows(t) for t in conditioning_token_ids], rng,
            max_time_steps=max_time_steps,
            init_pred_ids=_pad_rows(init_pred_ids),
            filter_thres=filter_thres, temperature=temperature,
            allow_eos_in_output=allow_eos_in_output,
            include_eos_in_output=include_eos_in_output,
            append_eos_to_conditioning_tokens=append_eos_to_conditioning_tokens,
            use_pallas=use_pallas, fused_ff=fused_ff,
            per_row_keys=_pad_rows(per_row_keys), flash_kv=flash_kv,
            approx_topk=approx_topk, teacher_ids=_pad_rows(teacher_ids),
            return_logits=return_logits,
        )
        if return_logits:
            return out[0][:batch], out[1][:batch]
        return out[:batch]

    cond = [jnp.reshape(t, (t.shape[0], -1)) for t in conditioning_token_ids]
    if append_eos_to_conditioning_tokens:
        cond = [append_eos_id(t, s.eos_id) for t, s in zip(cond, specs[:-1])]
    if init_pred_ids is not None:
        init_flat = jnp.reshape(init_pred_ids, (batch, -1))
        n_init = int(init_flat.shape[-1])
    else:
        init_flat = jnp.zeros((batch, 0), jnp.int32)
        n_init = 0

    total_steps = max_time_steps * q_num
    n_new = total_steps - n_init
    prefill_ids = list(cond) + [init_flat]
    prefill_len = sum(t.shape[-1] for t in prefill_ids) + len(specs)
    max_len = prefill_len + n_new

    alloc_len = round_up_chunk(max_len) if flash_kv else max_len
    x = model.apply(params, prefill_ids, method=TokenConditionedTransformer.assemble_stream)
    cache = model.apply(params, batch, alloc_len, method=_tfm_init_cache)
    table = model.apply(params, alloc_len, method=_tfm_bias_table)
    h_all, cache = model.apply(params, x, cache, method=_tfm_prefill)
    h_last = h_all[:, -1]
    if flash_kv:
        cache = pack_kv_cache(
            cache,
            int8=flash_kv in ("int8", "fused"),
            cache_dtype=jnp.float32 if flash_kv == "f32" else None,
        )
        add_mask = jnp.where(cache["mask"], 0.0, NEG_INF).astype(jnp.float32)
        if table is None:
            table = jnp.zeros((2 * alloc_len - 1, model.heads), jnp.float32)

    sampled = jnp.full((batch, total_steps), eos_id, jnp.int32)
    if n_init > 0:
        sampled = sampled.at[:, :n_init].set(init_flat)

    emb_table = jnp.asarray(params["params"][f"embed_{len(specs) - 1}"]["embedding"])
    heads_q, heads_s = qparams["logit_heads"]

    per_row = per_row_keys is not None
    rng_carry = per_row_keys if per_row else rng
    teacher_flat = (
        jnp.reshape(teacher_ids, (batch, -1)).astype(jnp.int32)
        if teacher_ids is not None
        else None
    )

    def step(carry, s):
        cache, h_last, sampled, rng = carry
        flat_idx = n_init + s
        q_idx = flat_idx % q_num
        wq = jax.lax.dynamic_index_in_dim(heads_q, q_idx, 0, keepdims=False)
        ws = jax.lax.dynamic_index_in_dim(heads_s, q_idx, 0, keepdims=False)
        logits = matmul(h_last, wq, ws)  # [b, C]
        is_last_q = q_idx == (q_num - 1)
        eos_ok = jnp.logical_and(allow_eos_in_output, is_last_q)
        logits = logits.at[:, -1].set(jnp.where(eos_ok, logits[:, -1], NEG_INF))
        if per_row:
            sub, rng = split_row_keys(rng)
            tok = sample_top_k_gumbel_per_row(
                sub, logits, temperature, filter_thres, approx_topk
            ).astype(jnp.int32)
        else:
            rng, sub = jax.random.split(rng)
            tok = sample_top_k_gumbel(
                sub, logits, temperature, filter_thres, approx_topk
            ).astype(jnp.int32)
        sampled = jax.lax.dynamic_update_slice(sampled, tok[:, None], (0, flat_idx))
        fed = (
            jax.lax.dynamic_slice(teacher_flat, (0, flat_idx), (batch, 1))[:, 0]
            if teacher_flat is not None
            else tok
        )
        offset = q_idx * pred_spec.codebook_size if q_num > 1 else 0
        emb = emb_table[fed + offset].astype(model.dtype)
        if model.use_absolute_position_embeddings:
            pos_table = params["params"][f"abs_pos_embed_{len(specs) - 1}"]["embedding"]
            emb = emb + pos_table[flat_idx].astype(model.dtype)
        pos = prefill_len + s
        if flash_kv:
            bias_row = jax.lax.dynamic_slice(
                table, (alloc_len - 1 - pos, 0), (alloc_len, table.shape[1])
            )
            if flash_kv == "fused":
                h_last, cache = fused_layer_step(
                    model, params, qparams, emb, cache, pos, bias_row,
                    add_mask, use_pallas=use_pallas,
                )
            else:
                h_last, cache = flash_quant_decode_step(
                    model, params, qparams, emb, cache, pos, bias_row, add_mask,
                    int8_kv=flash_kv == "int8", use_pallas=use_pallas,
                )
        else:
            h_last, cache = quant_decode_step(
                model, params, qparams, emb, cache, pos, table, matmul=matmul,
                fused_ff=fused_ff,
            )
        out = logits.astype(jnp.float32) if return_logits else None
        return (cache, h_last, sampled, rng), out

    (cache, h_last, sampled, rng), step_logits = jax.lax.scan(
        step, (cache, h_last, sampled, rng_carry), jnp.arange(n_new)
    )
    sampled = mask_out_after_eos_id(
        sampled, eos_id, mask_value=PAD_ID, keep_eos=include_eos_in_output
    )
    sampled = sampled.reshape(batch, max_time_steps, q_num)
    if return_logits:
        return sampled, jnp.swapaxes(step_logits, 0, 1)  # [b, n_new, C]
    return sampled
