"""CLAP joint audio/text embedding model + quantized conditioning tokens.

TPU-native rebuild of the reference CLAP stack:
  * towers + projections: laion_clap/clap_module/model.py:422-747 (HTSAT
    audio branch -> audio_projection MLP; RoBERTa pooler -> text_projection
    MLP; both L2-normalized into the 512-d joint space)
  * public hook API: laion_clap/hook.py:150-310 (int16 quantize round trip,
    repeatpad/crop to 10 s @ 48 kHz)
  * ClapQuantized: clap_quantized.py:17-111 (frozen CLAP -> ResidualVQ ->
    12 conditioning tokens)

The audio/text towers are flax modules; quantization state is a functional
RVQState (models/rvq.py) so the EMA training step jits and shards.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..rvq import RVQState, rvq_encode, rvq_update
from .fusion import build_mel_fusion
from .htsat import HTSAT, HTSATConfig
from .mel import logmel
from .roberta import RobertaConfig, RobertaModel

JOINT_EMBED = 512


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


def wav_to_mel_fusion(cfg: "HTSATConfig", wav: jnp.ndarray):
    """[B, T] wav -> ([B, 4, chunk_frames, mels] stack, [B] ``longer``).

    ``longer`` is a static property of the input length (T > clip_samples),
    matching the laion hook's is-long decision (hook.py:164-189)."""
    mel = logmel(
        wav,
        sr=cfg.sample_rate,
        n_fft=cfg.window_size_fft,
        hop=cfg.hop_size,
        n_mels=cfg.mel_bins,
        fmin=cfg.fmin,
        fmax=cfg.fmax,
    )  # [B, frames, mels]
    chunk_frames = cfg.clip_samples // cfg.hop_size + 1
    stacks = jax.vmap(lambda m: build_mel_fusion(m, chunk_frames))(mel)
    longer = jnp.full((wav.shape[0],), bool(wav.shape[-1] > cfg.clip_samples))
    return stacks, longer


class Projection(nn.Module):
    """Linear -> ReLU -> Linear into the joint space (model.py:539-543)."""

    out_dim: int = JOINT_EMBED
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="fc1")(x)
        x = nn.relu(x)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="fc2")(x)


class MLPLayers(nn.Module):
    """units=[512,512,512] MLP used for the *_transform heads
    (model.py:27-40); part of the contrastive-training surface."""

    units: Tuple[int, ...] = (JOINT_EMBED, JOINT_EMBED, JOINT_EMBED)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, u in enumerate(self.units[1:]):
            x = nn.Dense(u, dtype=self.dtype, name=f"fc{i}")(x)
            if i < len(self.units) - 2:
                x = nn.relu(x)
        return x


class CLAP(nn.Module):
    """Dual-tower CLAP (HTSAT-tiny + RoBERTa-base by default)."""

    audio_cfg: HTSATConfig = None  # type: ignore[assignment]
    text_cfg: RobertaConfig = RobertaConfig()
    joint_embed_shape: int = JOINT_EMBED
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        from .model_configs import PANNConfig
        from .pann import PANN

        if isinstance(self.audio_cfg, PANNConfig):
            # alternative CNN tower (model.py:464-470, PANN-* presets)
            self.audio_branch = PANN(
                arch=self.audio_cfg.arch,
                num_classes=self.audio_cfg.num_classes,
                sample_rate=self.audio_cfg.sample_rate,
                window_size_fft=self.audio_cfg.window_size_fft,
                hop_size=self.audio_cfg.hop_size,
                mel_bins=self.audio_cfg.mel_bins,
                fmin=self.audio_cfg.fmin,
                fmax=self.audio_cfg.fmax,
                dtype=self.dtype,
                name="audio_branch",
            )
        else:
            self.audio_branch = HTSAT(cfg=self.audio_cfg, dtype=self.dtype, name="audio_branch")
        self.text_branch = RobertaModel(cfg=self.text_cfg, dtype=self.dtype, name="text_branch")
        self.audio_projection = Projection(self.joint_embed_shape, dtype=self.dtype, name="audio_projection")
        self.text_projection = Projection(self.joint_embed_shape, dtype=self.dtype, name="text_projection")
        self.audio_transform = MLPLayers(dtype=self.dtype, name="audio_transform")
        self.text_transform = MLPLayers(dtype=self.dtype, name="text_transform")
        self.logit_scale_a = self.param(
            "logit_scale_a", lambda k: jnp.array(np.log(1 / 0.07), jnp.float32)
        )
        self.logit_scale_t = self.param(
            "logit_scale_t", lambda k: jnp.array(np.log(1 / 0.07), jnp.float32)
        )

    def get_audio_embedding(self, wav: jnp.ndarray) -> jnp.ndarray:
        """[B, T] 48 kHz -> normalized [B, 512] (hook.py:256-284 ->
        model.py:720-741).

        Fusion-mode CLAP (musiclm_large, enable_fusion) ALWAYS goes through
        the 4-view mel-fusion patch embed — even clip-length audio, with
        ``longer=False`` (laion hook.py:164-254); the wav is converted to the
        stack here so every caller path shares one parameter structure."""
        if self.audio_cfg.enable_fusion:
            mel_fusion, longer = wav_to_mel_fusion(self.audio_cfg, wav)
            out = self.audio_branch(mel_fusion=mel_fusion, longer=longer)
        else:
            out = self.audio_branch(wav)
        emb = self.audio_projection(out["embedding"])
        return l2_normalize(emb)

    def get_audio_embedding_fusion(
        self, mel_fusion: jnp.ndarray, longer: jnp.ndarray
    ) -> jnp.ndarray:
        """Fusion-mode audio path for >10 s clips (hook.py:164-254):
        mel_fusion [B, 4, frames, mels], longer [B] bool."""
        out = self.audio_branch(mel_fusion=mel_fusion, longer=longer)
        emb = self.audio_projection(out["embedding"])
        return l2_normalize(emb)

    def get_text_embedding(
        self, input_ids: jnp.ndarray, attention_mask: jnp.ndarray
    ) -> jnp.ndarray:
        """Tokenized [B, 77] -> normalized [B, 512] (model.py:698-716)."""
        pooled = self.text_branch(input_ids, attention_mask)["pooler_output"]
        return l2_normalize(self.text_projection(pooled))

    def __call__(self, wav, input_ids, attention_mask):
        """Contrastive-training forward: both towers + MLP heads
        (model.py:655-696)."""
        a = self.get_audio_embedding(wav)
        t = self.get_text_embedding(input_ids, attention_mask)
        return (
            a,
            t,
            self.audio_transform(a),
            self.text_transform(t),
            jnp.exp(self.logit_scale_a),
            jnp.exp(self.logit_scale_t),
        )


# ---------------------------------------------------------------------------
# audio prep (host/device-agnostic jnp; hook.py:150-254)
# ---------------------------------------------------------------------------


def int16_round_trip(x: jnp.ndarray) -> jnp.ndarray:
    """float32 -> int16 -> float32 quantization (utils.py:147-152;
    hook.py:272 applies this before the audio tower)."""
    q = jnp.clip(x, -1.0, 1.0)
    q = (q * 32767.0).astype(jnp.int16)
    return q.astype(jnp.float32) / 32767.0


def prepare_clap_audio(
    wav: jnp.ndarray, clip_samples: int = 480000
) -> jnp.ndarray:
    """Pad (repeatpad) or center-crop[0] each [B, T] wave to clip_samples.

    Deterministic variant of hook.get_audio_features (rand_trunc picks a
    random crop at TRAIN time; for inference the reference effectively sees
    the first clip_samples after generation windows are stitched)."""
    T = wav.shape[-1]
    if T > clip_samples:
        return wav[..., :clip_samples]
    if T < clip_samples:
        n_repeat = clip_samples // T
        wav = jnp.tile(wav, (1, n_repeat))
        wav = jnp.pad(wav, ((0, 0), (0, clip_samples - wav.shape[-1])))
    return wav


# ---------------------------------------------------------------------------
# ClapQuantized (clap_quantized.py)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class ClapQuantized:
    """Frozen CLAP + residual VQ over the joint embedding.

    ``tokenize_text`` / ``tokenize_audio`` produce the [B, 12, 1]
    conditioning token layout the stage transformers expect
    (clap_quantized.py:86-87).
    """

    model: CLAP
    params: dict
    rvq: RVQState
    num_quantizers: int = 12
    codebook_size: int = 1024
    sample_rate: int = 48000
    clip_samples: int = 480000

    def text_embedding(self, input_ids, attention_mask) -> jnp.ndarray:
        return self.model.apply(
            self.params, input_ids, attention_mask, method=CLAP.get_text_embedding
        )

    def audio_embedding(self, wav: jnp.ndarray) -> jnp.ndarray:
        wav = int16_round_trip(wav)
        fusion = self.model.audio_cfg.enable_fusion
        if not (fusion and wav.shape[-1] > self.clip_samples):
            # short clips: repeatpad/crop to clip length; fusion-long clips
            # keep their full length (the mel-fusion stack consumes it)
            wav = prepare_clap_audio(wav, self.clip_samples)
        return self.model.apply(self.params, wav, method=CLAP.get_audio_embedding)

    def quantize(self, embedding: jnp.ndarray) -> jnp.ndarray:
        """[B, 512] -> [B, Q, 1] token ids."""
        idx = rvq_encode(self.rvq, embedding)
        return idx[..., None].astype(jnp.int32)

    def tokenize_text(self, input_ids, attention_mask) -> jnp.ndarray:
        return self.quantize(self.text_embedding(input_ids, attention_mask))

    def tokenize_text_jit(self, input_ids, attention_mask) -> jnp.ndarray:
        """jit-compiled tokenize_text with params passed as jit ARGUMENTS.

        Never wrap the bound methods in jax.jit directly: they capture
        ``self.params`` (~125 M floats for roberta-base) as closure
        constants, which get inlined into the compiled HLO — under a
        remote-compile backend (axon tunnel) that overflows the compile
        request (HTTP 413)."""
        return _jitted_tokenize_text(self.model)(
            self.params, self.rvq, input_ids, attention_mask
        )

    def tokenize_audio(self, wav: jnp.ndarray) -> jnp.ndarray:
        return self.quantize(self.audio_embedding(wav))

    def learn_rvq_step(
        self, embedding: jnp.ndarray, key: jax.Array, *,
        decay: float = 0.95, threshold_ema_dead_code: float = 0.0,
    ) -> Tuple["ClapQuantized", jnp.ndarray]:
        """EMA RVQ update on a batch of embeddings (ClapRVQTrainer step,
        trainer.py:689-734). Returns (updated self, mse loss)."""
        new_state, quant, _ = rvq_update(
            self.rvq, embedding, key, decay=decay,
            threshold_ema_dead_code=threshold_ema_dead_code,
        )
        mse = jnp.mean(jnp.square(quant - embedding))
        return dataclasses.replace(self, rvq=new_state), mse


@functools.lru_cache(maxsize=8)
def _jitted_tokenize_text(model: CLAP):
    """Shape-cached jit of text -> conditioning tokens; params/rvq are
    arguments (not closure constants — see ClapQuantized.tokenize_text_jit)."""

    def fn(params, rvq: RVQState, input_ids, attention_mask):
        emb = model.apply(
            params, input_ids, attention_mask, method=CLAP.get_text_embedding
        )
        return rvq_encode(rvq, emb)[..., None].astype(jnp.int32)

    return jax.jit(fn)
