"""Sampling primitives under ``jax.random``.

Functional counterparts of the reference sampling helpers
(reference: open_musiclm/utils.py:63-97). All shapes are static; the top-k
cutoff is computed from the static vocab size so the whole sampler fuses into
the autoregressive decode step.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

NEG_INF = -1e9


def _approx_topk_default() -> bool:
    """Serving knob: $OPEN_MUSICLM_APPROX_TOPK=1 switches the top-k cutoff
    to jax.lax.approx_max_k (TPU-optimized partial reduction, measured ~20%
    faster than the exact sort on the 1025-way heads). Approximate recall
    can only keep MORE logits than exact top-k, a mild widening of the
    sampling pool — opt-in, like the int8 serving modes."""
    return os.environ.get("OPEN_MUSICLM_APPROX_TOPK", "0") == "1"


def log(t: jnp.ndarray, eps: float = 1e-20) -> jnp.ndarray:
    return jnp.log(t + eps)


def gumbel_noise(key: jax.Array, shape, dtype=jnp.float32) -> jnp.ndarray:
    # matches reference: uniform(0,1) -> -log(-log(u))  (utils.py:71-73)
    u = jax.random.uniform(key, shape, dtype=dtype, minval=0.0, maxval=1.0)
    return -log(-log(u))


def gumbel_sample(
    key: jax.Array, logits: jnp.ndarray, temperature: float = 1.0, axis: int = -1
) -> jnp.ndarray:
    """argmax(logits/T + gumbel). temperature==0 falls back to greedy."""
    if isinstance(temperature, (int, float)) and temperature == 0.0:
        return jnp.argmax(logits, axis=axis)
    noise = gumbel_noise(key, logits.shape, logits.dtype)
    return jnp.argmax(logits / temperature + noise, axis=axis)


def top_k_filter(
    logits: jnp.ndarray, thres: float = 0.9, approx: bool | None = None
) -> jnp.ndarray:
    """Keep top ``max(int((1-thres)*C), 1)`` logits, set the rest to -inf.

    Static-k version of reference utils.py:78-84. ``approx=None`` reads the
    $OPEN_MUSICLM_APPROX_TOPK serving knob (see _approx_topk_default).
    """
    vocab = logits.shape[-1]
    k = max(int((1.0 - thres) * vocab), 1)
    if approx is None:
        approx = _approx_topk_default()
    if approx:
        vals, _ = jax.lax.approx_max_k(logits, k, recall_target=0.95)
    else:
        vals, _ = jax.lax.top_k(logits, k)
    kth = vals[..., -1:]
    return jnp.where(logits < kth, jnp.full_like(logits, NEG_INF), logits)


def sample_top_k_gumbel(
    key: jax.Array,
    logits: jnp.ndarray,
    temperature: float = 1.0,
    filter_thres: float = 0.9,
    approx: bool | None = None,
) -> jnp.ndarray:
    return gumbel_sample(key, top_k_filter(logits, filter_thres, approx), temperature)


def sample_top_k_gumbel_per_row(
    row_keys: jax.Array,  # [b] independent keys, one per batch row
    logits: jnp.ndarray,  # [b, C]
    temperature: float = 1.0,
    filter_thres: float = 0.9,
    approx: bool | None = None,
) -> jnp.ndarray:
    """Per-row-keyed sampling: row i's outcome is a function of row_keys[i]
    and logits[i] ONLY — independent of batch composition. Serving uses this
    so a request's audio is determined by its own seed, not by which batch
    it landed in."""
    filt = top_k_filter(logits, filter_thres, approx)
    if isinstance(temperature, (int, float)) and temperature == 0.0:
        return jnp.argmax(filt, axis=-1)
    u = jax.vmap(
        lambda k, row: jax.random.uniform(k, row.shape, dtype=row.dtype)
    )(row_keys, filt)
    noise = -log(-log(u))
    return jnp.argmax(filt / temperature + noise, axis=-1)


def split_row_keys(row_keys: jax.Array) -> tuple:
    """vmap'd split: [b] keys -> ([b] subkeys, [b] new carry keys)."""
    pairs = jax.vmap(lambda k: jax.random.split(k, 2))(row_keys)
    return pairs[:, 0], pairs[:, 1]


def fold_in_rows(row_keys: jax.Array, *data: int) -> jax.Array:
    """vmap'd fold_in of one or more constants into each row key."""

    def fold(k):
        for d in data:
            k = jax.random.fold_in(k, d)
        return k

    return jax.vmap(fold)(row_keys)


def mask_out_after_eos_id(
    ids: jnp.ndarray, eos_id: int, mask_value: int = -1, keep_eos: bool = True
) -> jnp.ndarray:
    """Replace everything after (optionally including) the first EOS with
    ``mask_value`` (reference utils.py:86-93)."""
    eos_mask = (ids == eos_id).astype(jnp.int32)
    if keep_eos:
        eos_mask = jnp.pad(eos_mask, [(0, 0)] * (ids.ndim - 1) + [(1, 0)])[..., :-1]
    after = jnp.cumsum(eos_mask, axis=-1) > 0
    return jnp.where(after, mask_value, ids)


def append_eos_id(ids: jnp.ndarray, eos_id: int) -> jnp.ndarray:
    """Append an EOS column (reference utils.py:112-117)."""
    eos = jnp.full(ids.shape[:-1] + (1,), eos_id, dtype=ids.dtype)
    return jnp.concatenate([ids, eos], axis=-1)


def all_rows_have_eos_id(ids: jnp.ndarray, eos_id: int) -> jnp.ndarray:
    """True iff every row contains EOS (reference utils.py:95-97)."""
    return jnp.all(jnp.any(ids == eos_id, axis=-1))


def unique_consecutive_mask(ids: jnp.ndarray) -> jnp.ndarray:
    """[..., n] -> bool mask of first-of-run positions.

    Fixed-shape building block for the reference's ``batch_unique_consecutive``
    (utils.py:119-121): inside jit we cannot compact sequences, so duplicate
    runs are instead masked out (see ``mask_unique_consecutive``). Position 0
    is always kept.
    """
    prev = jnp.pad(ids, [(0, 0)] * (ids.ndim - 1) + [(1, 0)], constant_values=-(10 ** 9))[
        ..., :-1
    ]
    return ids != prev


def mask_unique_consecutive(ids: jnp.ndarray, pad_id: int = -1) -> jnp.ndarray:
    """Replace consecutive duplicates with ``pad_id`` (fixed-shape stand-in
    for compaction: the attention key-mask and CE padding then ignore them —
    positions are preserved instead of shifted)."""
    return jnp.where(unique_consecutive_mask(ids), ids, pad_id)


def batch_unique_consecutive_np(ids, pad_id: int = -1):
    """Host-side exact compaction (reference semantics: runs collapse and the
    batch right-pads to the longest row; utils.py:119-121)."""
    import numpy as np

    ids = np.asarray(ids)
    rows = []
    for row in ids:
        keep = np.concatenate([[True], row[1:] != row[:-1]])
        rows.append(row[keep])
    width = max(len(r) for r in rows)
    out = np.full((len(rows), width), pad_id, dtype=ids.dtype)
    for i, r in enumerate(rows):
        out[i, : len(r)] = r
    return out
