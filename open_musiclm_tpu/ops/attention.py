"""Cosine-similarity shared-KV attention primitives.

Behavioral spec from the reference (open_musiclm/transformer.py:166-333):
  * queries are multi-head [b, h, n, d]; keys/values are a SINGLE shared head
    [b, m, d] (``to_kv`` projects to ``2 * dim_head``, transformer.py:204).
  * q and k are l2-normalized over the head dim, then multiplied by learned
    per-dim scales, and the similarity uses a fixed scale (default 8)
    (transformer.py:269-271,178).
  * additive per-head bias [h, n, m]; boolean key mask [b, m]; causal mask with
    optional bidirectional prefix.

These are free functions over arrays so the XLA path, the Pallas kernels and
the KV-cached decode step all share one definition of the math.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e9


def l2norm(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    # matches torch F.normalize: x / max(||x||, eps)
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True))
    return x / jnp.maximum(norm, eps)


def shared_kv_attention(
    q: jnp.ndarray,  # [b, h, n, d] (already l2norm * q_scale)
    k: jnp.ndarray,  # [b, m, d]    (already l2norm * k_scale)
    v: jnp.ndarray,  # [b, m, d]
    *,
    scale: float = 8.0,
    attn_bias: Optional[jnp.ndarray] = None,  # [h, n, m]
    key_mask: Optional[jnp.ndarray] = None,  # [b, m] True = attend
    causal: bool = False,
    non_causal_prefix: int = 0,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Full-sequence attention. Returns [b, n, h*d]."""
    b, h, n, d = q.shape
    m = k.shape[1]
    sim = jnp.einsum("bhnd,bmd->bhnm", q, k) * scale

    if attn_bias is not None:
        sim = sim + attn_bias[None].astype(sim.dtype)

    if key_mask is not None:
        sim = jnp.where(key_mask[:, None, None, :], sim, NEG_INF)

    if causal:
        i = jnp.arange(n)[:, None]
        j = jnp.arange(m)[None, :]
        # queries are the last n of m keys (prefix offset m - n)
        allowed = j <= (i + (m - n))
        if non_causal_prefix > 0:
            prefix = (i < non_causal_prefix) & (j < (non_causal_prefix + m - n))
            allowed = allowed | prefix
        sim = jnp.where(allowed[None, None], sim, NEG_INF)

    attn = jax.nn.softmax(sim, axis=-1)
    if dropout_rate > 0.0 and dropout_rng is not None:
        from .fastrand import fast_bernoulli

        keep = fast_bernoulli(dropout_rng, 1.0 - dropout_rate, attn.shape)
        attn = jnp.where(keep, attn / (1.0 - dropout_rate), 0.0)

    out = jnp.einsum("bhnm,bmd->bhnd", attn, v)
    return out.transpose(0, 2, 1, 3).reshape(b, n, h * d)


def shared_kv_decode_step(
    q_t: jnp.ndarray,  # [b, h, d] query at position `pos` (l2norm * q_scale)
    k_cache: jnp.ndarray,  # [b, N, d] processed keys (l2norm * k_scale); rows > pos are garbage
    v_cache: jnp.ndarray,  # [b, N, d]
    pos: jnp.ndarray,  # scalar int32: current position (0-based)
    *,
    scale: float = 8.0,
    bias_table: Optional[jnp.ndarray] = None,  # [2N-1, h] decode layout
    key_mask: Optional[jnp.ndarray] = None,  # [b, N] True = attend
) -> jnp.ndarray:
    """One KV-cached decode step. Returns [b, h*d].

    Replaces the reference's full-sequence re-forward per sampled token
    (open_musiclm.py:299-319). ``bias_table`` uses the reversed-padded
    decode layout built by Transformer.bias_table: row (N-1-pos)+j is the
    bias at causal distance pos-j, so the step's bias row is ONE
    dynamic_slice (a dynamic-index gather per step is much slower on TPU).
    Rows at j > pos are junk but masked by the causal `allowed` mask.
    """
    b, h, d = q_t.shape
    N = k_cache.shape[1]
    # f32 scores + softmax: the step is cache-bandwidth-bound so the upcast
    # is free, and it matches the flash-decode kernel's online-softmax
    # precision (ops/decode_attention.py) — with bf16 scores the fp path
    # itself was the least-precise decode variant, which the r4 deviation
    # ladder misread as "flash-KV deviation" (.lanes/deviation_r4.json)
    sim = (
        jnp.einsum(
            "bhd,bnd->bhn", q_t, k_cache, preferred_element_type=jnp.float32
        )
        * scale
    )

    j = jnp.arange(N)
    if bias_table is not None:
        bias = jax.lax.dynamic_slice(
            bias_table, (N - 1 - pos, 0), (N, bias_table.shape[1])
        )  # [N, h]
        sim = sim + bias.T[None].astype(sim.dtype)

    allowed = j <= pos
    sim = jnp.where(allowed[None, None, :], sim, NEG_INF)
    if key_mask is not None:
        sim = jnp.where(key_mask[:, None, :], sim, NEG_INF)

    attn = jax.nn.softmax(sim, axis=-1)
    out = jnp.einsum(
        "bhn,bnd->bhd", attn, v_cache, preferred_element_type=jnp.float32
    )
    return out.reshape(b, h * d).astype(q_t.dtype)
