"""CLIP-style text transformer branch (text_cfg.model_type='transformer').

Rebuild of the CLIP-lineage text tower in laion_clap/clap_module/model.py
(Transformer :258-303, encode_text :604-616): token embedding + learned
positional embedding -> pre-LN causal transformer -> ln_final -> feature at
the EOT position (highest token id) -> projection MLP into the joint space.
Used by the non-RoBERTa CLAP model configs; the MusicLM-shipped configs use
RoBERTa, but the capability surface includes this branch.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ClipTextConfig:
    context_length: int = 77
    vocab_size: int = 49408
    width: int = 512
    heads: int = 8
    layers: int = 12
    quick_gelu: bool = False


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class ResidualAttentionBlock(nn.Module):
    cfg: ClipTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, causal_mask: jnp.ndarray) -> jnp.ndarray:
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_1")(x)
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.cfg.heads,
            qkv_features=self.cfg.width,
            use_bias=True,
            dtype=self.dtype,
            name="attn",
        )(h, h, mask=causal_mask)
        x = x + attn
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_2")(x)
        h = nn.Dense(self.cfg.width * 4, dtype=self.dtype, name="c_fc")(h)
        h = quick_gelu(h) if self.cfg.quick_gelu else nn.gelu(h, approximate=False)
        h = nn.Dense(self.cfg.width, dtype=self.dtype, name="c_proj")(h)
        return x + h


class ClipTextTransformer(nn.Module):
    cfg: ClipTextConfig = ClipTextConfig()
    joint_embed_shape: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, token_ids: jnp.ndarray) -> jnp.ndarray:
        """[B, 77] CLIP-BPE ids -> joint-space features [B, joint]."""
        cfg = self.cfg
        B, T = token_ids.shape
        tok = nn.Embed(
            cfg.vocab_size, cfg.width, dtype=self.dtype,
            embedding_init=nn.initializers.normal(0.02),
            name="token_embedding",
        )(token_ids)
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (cfg.context_length, cfg.width),
            jnp.float32,
        )
        x = tok + pos[:T].astype(self.dtype)
        causal = jnp.tril(jnp.ones((T, T), bool))[None, None]
        for i in range(cfg.layers):
            x = ResidualAttentionBlock(cfg, dtype=self.dtype, name=f"resblock_{i}")(
                x, causal
            )
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_final")(x)
        # feature at EOT = highest token id per row (model.py:615)
        eot = jnp.argmax(token_ids, axis=-1)
        feat = x[jnp.arange(B), eot]
        h = nn.Dense(self.joint_embed_shape, dtype=self.dtype, name="proj_fc1")(feat)
        h = nn.relu(h)
        return nn.Dense(self.joint_embed_shape, dtype=self.dtype, name="proj_fc2")(h)
