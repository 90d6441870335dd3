"""Fixed-shape mask construction.

The reference builds attention masks with dynamic tensor concatenation per
batch (open_musiclm.py:358-376) and a "forgetful causal mask" dropout
(utils.py:49-56). Here every mask is a fixed-shape jnp op so it can live
inside one jitted train step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def causal_mask(n: int, non_causal_prefix: int = 0, dtype=jnp.bool_) -> jnp.ndarray:
    """[n, n] boolean mask, True = attend. Optionally a bidirectional prefix
    (reference transformer.py:288-289,319-320)."""
    i = jnp.arange(n)[:, None]
    j = jnp.arange(n)[None, :]
    mask = j <= i
    if non_causal_prefix > 0:
        prefix = (i < non_causal_prefix) & (j < non_causal_prefix)
        mask = mask | prefix
    return mask.astype(dtype)


def forgetful_causal_mask(
    key: jax.Array, batch: int, seq: int, mask_prob: float
) -> jnp.ndarray:
    """[batch, seq] keep-mask with ``min(int(seq*p), seq-1)`` random dropped
    key positions per row, never dropping position 0 (reference utils.py:49-56).
    """
    num_mask = min(int(seq * mask_prob), seq - 1)
    if num_mask <= 0:
        return jnp.ones((batch, seq), dtype=jnp.bool_)
    rand = jax.random.normal(key, (batch, seq))
    rand = rand.at[:, 0].set(-jnp.inf)
    _, drop_idx = jax.lax.top_k(rand, num_mask)
    drop = jnp.zeros((batch, seq), dtype=jnp.bool_)
    drop = drop.at[jnp.arange(batch)[:, None], drop_idx].set(True)
    return ~drop


def conditioning_attn_mask(
    token_ids_list, eos_ids, pad_id: int, pred_len_with_start: int
) -> jnp.ndarray:
    """[batch, total] key-mask: conditioning pad/EOS tokens are hidden, start
    tokens and the predicted sequence are visible
    (reference open_musiclm.py:358-371).

    token_ids_list: flattened conditioning id arrays [b, n_i] (all but the
    final predicted sequence). Returns the concatenated mask including a
    leading True column per sequence (for its start token) and a True block of
    width ``pred_len_with_start`` for the final sequence.
    """
    parts = []
    for ids, eos_id in zip(token_ids_list, eos_ids):
        keep = (ids != pad_id) & (ids != eos_id)
        b = ids.shape[0]
        start_col = jnp.ones((b, 1), dtype=jnp.bool_)
        parts.append(jnp.concatenate([start_col, keep], axis=-1))
    b = token_ids_list[0].shape[0]
    parts.append(jnp.ones((b, pred_len_with_start), dtype=jnp.bool_))
    return jnp.concatenate(parts, axis=-1)
