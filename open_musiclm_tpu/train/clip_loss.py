"""Contrastive CLAP loss (CLIP-style) with mesh-native feature gathering.

Rebuild of laion_clap/clap_module/loss.py:15-138: symmetric cross-entropy
over audio<->text similarity logits, optionally in the paper's "mlp_loss"
form (audio vs text_transform(text) and vice versa). The reference's
torch.distributed/horovod ``gather_features`` becomes a
``jax.lax.all_gather`` over the mesh data axis — usable inside shard_map /
pjit-sharded train steps; single-device callers just pass gathered features.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def gather_features(features: jnp.ndarray, axis_name: Optional[str] = None):
    """All-gather along the data-parallel axis (loss.py:15-56). Inside
    shard_map/pmap, pass the axis name; otherwise identity."""
    if axis_name is None:
        return features
    return jax.lax.all_gather(features, axis_name, tiled=True)


def _sym_ce(logits_a: jnp.ndarray, logits_t: jnp.ndarray) -> jnp.ndarray:
    n = logits_a.shape[0]
    labels = jnp.arange(n)
    lp_a = jax.nn.log_softmax(logits_a, axis=-1)
    lp_t = jax.nn.log_softmax(logits_t, axis=-1)
    loss_a = -jnp.mean(lp_a[jnp.arange(n), labels])
    loss_t = -jnp.mean(lp_t[jnp.arange(n), labels])
    return (loss_a + loss_t) / 2.0


def clip_loss(
    audio_features: jnp.ndarray,  # [N, D] L2-normalized
    text_features: jnp.ndarray,  # [N, D]
    logit_scale_a: jnp.ndarray,
    *,
    axis_name: Optional[str] = None,
) -> jnp.ndarray:
    """Standard symmetric contrastive loss (loss.py:93-138, mlp_loss=False)."""
    a = gather_features(audio_features, axis_name)
    t = gather_features(text_features, axis_name)
    logits = logit_scale_a * a @ t.T
    return _sym_ce(logits, logits.T)


def clip_loss_mlp(
    audio_features: jnp.ndarray,
    text_features: jnp.ndarray,
    audio_features_mlp: jnp.ndarray,
    text_features_mlp: jnp.ndarray,
    logit_scale_a: jnp.ndarray,
    logit_scale_t: jnp.ndarray,
    *,
    axis_name: Optional[str] = None,
) -> jnp.ndarray:
    """The CLAP paper's mlp_loss variant: audio vs text_mlp under scale_a and
    text vs audio_mlp under scale_t, averaged."""
    a = gather_features(audio_features, axis_name)
    t = gather_features(text_features, axis_name)
    am = gather_features(audio_features_mlp, axis_name)
    tm = gather_features(text_features_mlp, axis_name)

    a_logits = logit_scale_a * a @ tm.T
    t_logits = logit_scale_t * t @ am.T
    return (_sym_ce(a_logits, a_logits.T) + _sym_ce(t_logits, t_logits.T)) / 2.0
