"""Attentional feature fusion (AFF / iAFF / DAF) for long-audio CLAP.

Rebuild of laion_clap/clap_module/feature_fusion.py (Dai et al., WACV 2021),
used by fusion-mode CLAP (musiclm_large): a >10 s clip contributes a global
(shrunk) mel plus 3 local chunks, fused at patch-embed time
(htsat.py:100-133). Channel-last layout; BatchNorm runs on stored running
stats (the torch batch-size-1 duplication hack is a train-mode artifact and
is functionally a no-op in eval).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class _AttBranch(nn.Module):
    """Conv1x1 -> BN -> ReLU -> Conv1x1 -> BN (local or global branch)."""

    channels: int
    r: int = 4
    global_pool: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        inter = self.channels // self.r
        h = x
        if self.global_pool:
            h = jnp.mean(h, axis=(1, 2), keepdims=True)
        h = nn.Conv(inter, (1, 1), dtype=self.dtype, name="conv1")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, name="bn1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="conv2")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, name="bn2")(h)
        return h


class DAF(nn.Module):
    """Direct add fuse (feature_fusion.py:11-20)."""

    @nn.compact
    def __call__(self, x, residual, train: bool = False):
        return x + residual


class AFF(nn.Module):
    """x, residual: [B, H, W, C] -> attentional blend (feature_fusion.py:133-193)."""

    channels: int = 64
    r: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, residual, train: bool = False):
        xa = x + residual
        xl = _AttBranch(self.channels, self.r, dtype=self.dtype, name="local_att")(xa, train)
        xg = _AttBranch(self.channels, self.r, global_pool=True, dtype=self.dtype,
                        name="global_att")(xa, train)
        wei = jax.nn.sigmoid(xl + xg)
        return 2.0 * x * wei + 2.0 * residual * (1.0 - wei)


class iAFF(nn.Module):
    """Iterative AFF (feature_fusion.py:23-131). Note the reference reuses
    ``global_att`` (not global_att2) in the second pass — we mirror that."""

    channels: int = 64
    r: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, residual, train: bool = False):
        local1 = _AttBranch(self.channels, self.r, dtype=self.dtype, name="local_att")
        global1 = _AttBranch(self.channels, self.r, global_pool=True, dtype=self.dtype,
                             name="global_att")
        local2 = _AttBranch(self.channels, self.r, dtype=self.dtype, name="local_att2")
        # defined for checkpoint parity; unused in the reference forward
        _AttBranch(self.channels, self.r, global_pool=True, dtype=self.dtype,
                   name="global_att2")

        xa = x + residual
        wei = jax.nn.sigmoid(local1(xa, train) + global1(xa, train))
        xi = x * wei + residual * (1.0 - wei)
        wei2 = jax.nn.sigmoid(local2(xi, train) + global1(xi, train))
        return x * wei2 + residual * (1.0 - wei2)


def make_fusion(fusion_type: str, channels: int, dtype=jnp.float32):
    kind = fusion_type.split("_")[0]
    if kind == "daf":
        return DAF()
    if kind == "aff":
        return AFF(channels=channels, dtype=dtype)
    if kind == "iaff":
        return iAFF(channels=channels, dtype=dtype)
    raise ValueError(f"unknown fusion type {fusion_type}")


def build_mel_fusion(
    mel: jnp.ndarray, chunk_frames: int, deterministic: bool = True,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """[T, F] full-track log-mel -> [4, chunk_frames, F] fusion stack:
    shrunk global + front/middle/back chunks (hook.py:164-254; random chunk
    positions at train time, deterministic at inference)."""
    T, F = mel.shape
    if T <= chunk_frames:
        pad = chunk_frames - T
        m = jnp.pad(mel, ((0, pad), (0, 0)))
        return jnp.stack([m, m, m, m])
    shrink = jax.image.resize(mel, (chunk_frames, F), method="linear")
    max_start = T - chunk_frames
    if deterministic or rng is None:
        starts = [0, max_start // 2, max_start]
    else:
        ks = jax.random.split(rng, 3)
        third = max(max_start // 3, 1)
        starts = [
            jax.random.randint(ks[0], (), 0, third),
            jax.random.randint(ks[1], (), third, max(2 * third, third + 1)),
            jax.random.randint(ks[2], (), 2 * third, max_start + 1),
        ]
    chunks = [
        jax.lax.dynamic_slice(mel, (jnp.asarray(s), 0), (chunk_frames, F))
        for s in starts
    ]
    return jnp.stack([shrink] + chunks)
