"""RoBERTa-base text encoder — JAX/XLA rebuild.

Replaces ``transformers.RobertaModel`` used as the CLAP text branch
(laion_clap/clap_module/model.py:505-514, encode_text :631-638). The CLAP
path consumes only ``pooler_output`` (CLS -> dense -> tanh), which then goes
through ``text_projection`` (Linear 768->512, ReLU, Linear 512->512).

Post-LN BERT-style layers; position ids follow the RoBERTa convention
(pad_token_id=1, positions = cumsum(mask) + pad_token_id for non-pad tokens).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class RobertaConfig:
    vocab_size: int = 50265
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 514
    type_vocab_size: int = 1
    layer_norm_eps: float = 1e-5
    pad_token_id: int = 1


class RobertaLayer(nn.Module):
    cfg: RobertaConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, attn_mask: Optional[jnp.ndarray]) -> jnp.ndarray:
        cfg = self.cfg
        mask = None
        if attn_mask is not None:
            # [B, T] -> [B, 1, 1, T] boolean
            mask = attn_mask[:, None, None, :].astype(bool)
        attn_out = nn.MultiHeadDotProductAttention(
            num_heads=cfg.num_attention_heads,
            qkv_features=cfg.hidden_size,
            use_bias=True,
            dtype=self.dtype,
            name="attention",
        )(x, x, mask=mask)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="attn_norm")(
            x + attn_out
        )
        ff = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="intermediate")(x)
        ff = nn.gelu(ff, approximate=False)
        ff = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="output")(ff)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="ffn_norm")(
            x + ff
        )


class RobertaModel(nn.Module):
    cfg: RobertaConfig = RobertaConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, input_ids: jnp.ndarray, attention_mask: Optional[jnp.ndarray] = None
    ):
        cfg = self.cfg
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)
        word = nn.Embed(
            cfg.vocab_size, cfg.hidden_size, dtype=self.dtype, name="word_embeddings"
        )(input_ids)
        # RoBERTa position ids: cumsum over mask, offset by pad_token_id
        positions = jnp.cumsum(attention_mask, axis=-1) * attention_mask + cfg.pad_token_id
        pos = nn.Embed(
            cfg.max_position_embeddings, cfg.hidden_size, dtype=self.dtype,
            name="position_embeddings",
        )(positions)
        tok_type = nn.Embed(
            cfg.type_vocab_size, cfg.hidden_size, dtype=self.dtype,
            name="token_type_embeddings",
        )(jnp.zeros_like(input_ids))
        h = word + pos + tok_type
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="emb_norm")(h)
        for i in range(cfg.num_hidden_layers):
            h = RobertaLayer(cfg, dtype=self.dtype, name=f"layer_{i}")(h, attention_mask)
        pooled = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="pooler")(h[:, 0])
        pooled = jnp.tanh(pooled)
        return {"last_hidden_state": h, "pooler_output": pooled}
