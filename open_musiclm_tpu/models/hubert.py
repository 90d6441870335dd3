"""HuBERT encoder (MERT-v0 checkpoint family) — JAX/XLA rebuild.

Replaces the reference's ``transformers.HubertModel``
(hf_hubert_kmeans.py:11,154-158): 16 kHz waveform -> 7-layer conv feature
extractor (320x downsample, 50 Hz) -> feature projection -> 12-layer
post-LN transformer with a grouped-conv relative positional embedding.
``hidden_states[embed_layer]`` (layer 7 by default) feeds the k-means
semantic tokenizer, matching HF's hidden-state indexing exactly
(entry 0 = pre-layer-0 activations, entry i = output of layer i-1).

Combined with models/kmeans.py this forms the TPU-native
``HubertWithKmeans``: the whole 10 s-audio -> 499 semantic tokens path is one
jitted program — no sklearn CPU round trip (hf_hubert_kmeans.py:87-88).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class HubertConfig:
    """Subset of HF HubertConfig needed for MERT-v0 / hubert-base."""

    conv_dim: Tuple[int, ...] = (512,) * 7
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_bias: bool = False
    feat_extract_norm: str = "group"  # 'group' (base) | 'layer' (large)
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    layer_norm_eps: float = 1e-5
    do_stable_layer_norm: bool = False

    @property
    def downsample_factor(self) -> int:
        out = 1
        for s in self.conv_stride:
            out *= s
        return out


class FeatureEncoder(nn.Module):
    cfg: HubertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B, T] -> [B, T', C]
        h = x[..., None]
        for i, (dim, k, s) in enumerate(
            zip(self.cfg.conv_dim, self.cfg.conv_kernel, self.cfg.conv_stride)
        ):
            h = nn.Conv(
                dim,
                kernel_size=(k,),
                strides=(s,),
                padding="VALID",
                use_bias=self.cfg.conv_bias,
                dtype=self.dtype,
                name=f"conv_{i}",
            )(h)
            if self.cfg.feat_extract_norm == "group" and i == 0:
                h = nn.GroupNorm(
                    num_groups=dim, epsilon=self.cfg.layer_norm_eps, dtype=self.dtype,
                    name="group_norm",
                )(h)
            elif self.cfg.feat_extract_norm == "layer":
                h = nn.LayerNorm(epsilon=self.cfg.layer_norm_eps, dtype=self.dtype,
                                 name=f"layer_norm_{i}")(h)
            h = nn.gelu(h, approximate=False)
        return h


class PositionalConvEmbedding(nn.Module):
    cfg: HubertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B, T, H]
        k = self.cfg.num_conv_pos_embeddings
        pad = k // 2
        h = nn.Conv(
            self.cfg.hidden_size,
            kernel_size=(k,),
            padding=((pad, pad),),
            feature_group_count=self.cfg.num_conv_pos_embedding_groups,
            use_bias=True,
            dtype=self.dtype,
            name="conv",
        )(x)
        if k % 2 == 0:  # HF SamePad removes the trailing element
            h = h[:, :-1, :]
        return nn.gelu(h, approximate=False)


class EncoderLayer(nn.Module):
    """Post-LN transformer layer (do_stable_layer_norm=False, hubert-base)."""

    cfg: HubertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        head_dim = cfg.hidden_size // cfg.num_attention_heads
        attn_out = nn.MultiHeadDotProductAttention(
            num_heads=cfg.num_attention_heads,
            qkv_features=cfg.hidden_size,
            use_bias=True,
            dtype=self.dtype,
            name="attention",
        )(x, x)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="layer_norm")(
            x + attn_out
        )
        ff = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="ff_intermediate")(x)
        ff = nn.gelu(ff, approximate=False)
        ff = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="ff_output")(ff)
        return nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="final_layer_norm"
        )(x + ff)


class HubertModel(nn.Module):
    cfg: HubertConfig = HubertConfig()
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        self.feature_encoder = FeatureEncoder(cfg, dtype=self.dtype, name="feature_encoder")
        self.fp_norm = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="fp_norm"
        )
        self.fp_proj = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="fp_proj")
        self.pos_conv = PositionalConvEmbedding(cfg, dtype=self.dtype, name="pos_conv")
        self.enc_norm = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="enc_norm"
        )
        self.layers = [
            EncoderLayer(cfg, dtype=self.dtype, name=f"layer_{i}")
            for i in range(cfg.num_hidden_layers)
        ]

    def __call__(
        self, wav: jnp.ndarray, output_hidden_states: bool = True
    ):
        """wav: [B, T] at 16 kHz. Returns (last_hidden, tuple of hidden states
        with HF indexing: [0]=pre-layer-0, [i]=after layer i-1)."""
        feats = self.feature_encoder(wav)
        h = self.fp_proj(self.fp_norm(feats))
        h = h + self.pos_conv(h)
        h = self.enc_norm(h)
        hidden_states = [h] if output_hidden_states else None
        for layer in self.layers:
            h = layer(h)
            if output_hidden_states:
                hidden_states.append(h)
        return h, tuple(hidden_states) if output_hidden_states else None

    def extract_features(self, wav: jnp.ndarray, layer: int = 7) -> jnp.ndarray:
        """hidden_states[layer] — the reference's embed_layer tap
        (hf_hubert_kmeans.py:49,78)."""
        _, hs = self(wav, output_hidden_states=True)
        return hs[layer]


def zero_mean_unit_var(x: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Per-example normalization over the last axis (utils.py:154-155)."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True) * x.shape[-1] / max(x.shape[-1] - 1, 1)
    return (x - mean) / jnp.sqrt(var + eps)


class HubertWithKmeans:
    """Functional bundle: HuBERT features + k-means assignment.

    TPU-native equivalent of reference ``HfHubertWithKmeans``
    (hf_hubert_kmeans.py:19-94). ``__call__`` maps [B, T] 16 kHz audio to
    [B, T'] semantic token ids in one jittable program.
    """

    def __init__(
        self,
        model: HubertModel,
        params,
        centroids: jnp.ndarray,
        *,
        embed_layer: int = 7,
        normalize_embeds: bool = True,
        target_sample_hz: int = 16000,
        seq_len_multiple_of: int = 320,
        output_hz: int = 50,
    ):
        self.model = model
        self.params = params
        self.centroids = centroids
        self.embed_layer = embed_layer
        self.normalize_embeds = normalize_embeds
        self.target_sample_hz = target_sample_hz
        self.seq_len_multiple_of = seq_len_multiple_of
        self.output_hz = output_hz
        self.codebook_size = int(centroids.shape[0])

    def features(self, wav: jnp.ndarray) -> jnp.ndarray:
        if self.seq_len_multiple_of:
            T = (wav.shape[-1] // self.seq_len_multiple_of) * self.seq_len_multiple_of
            wav = wav[..., :T]
        emb = self.model.apply(
            self.params, wav, self.embed_layer, method=HubertModel.extract_features
        )
        if self.normalize_embeds:
            emb = zero_mean_unit_var(emb)
        return emb

    def __call__(self, wav: jnp.ndarray) -> jnp.ndarray:
        from .kmeans import kmeans_predict

        return kmeans_predict(self.features(wav), self.centroids)
