"""Public CLAP convenience API — counterpart of laion_clap's CLAP_Module
(hook.py:30-310): one object that tokenizes text, preps audio of any length
(int16 round trip, repeatpad / crop, fusion mel stacks for >10 s clips) and
returns normalized joint-space embeddings.

Everything device-side is jitted per shape; text tokenization is host-side
(models/clap/tokenizer.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .clap import CLAP, int16_round_trip, prepare_clap_audio


@dataclasses.dataclass
class ClapModule:
    """Frozen CLAP with the reference hook's ergonomics."""

    model: CLAP
    params: Any
    tokenizer: Any  # host-side text tokenizer
    sample_rate: int = 48000
    clip_samples: int = 480000
    enable_fusion: bool = False

    def __post_init__(self):
        self._text_fn = jax.jit(
            lambda p, i, m: self.model.apply(p, i, m, method=CLAP.get_text_embedding)
        )
        self._audio_fn = jax.jit(
            lambda p, w: self.model.apply(p, w, method=CLAP.get_audio_embedding)
        )
        self._audio_fusion_fn = jax.jit(
            lambda p, mf, lg: self.model.apply(
                p, mf, lg, method=CLAP.get_audio_embedding_fusion
            )
        )

    # ---- text ----

    def get_text_embedding(self, texts: List[str]) -> jnp.ndarray:
        """[B] strings -> normalized [B, 512] (hook.py:286-310)."""
        enc = self.tokenizer(texts)
        return self._text_fn(
            self.params, jnp.asarray(enc["input_ids"]), jnp.asarray(enc["attention_mask"])
        )

    # ---- audio ----

    def get_audio_embedding_from_data(self, wavs: jnp.ndarray) -> jnp.ndarray:
        """[B, T] float waveforms at 48 kHz -> normalized [B, 512]
        (hook.py:256-284). Long clips: fusion mode when enabled, else crop.

        ``CLAP.get_audio_embedding`` is fusion-aware (it builds the 4-view
        mel stack itself for fusion models), so both short and long clips
        route through one jitted wav entry point."""
        wavs = int16_round_trip(jnp.asarray(wavs))
        if not (self.enable_fusion and wavs.shape[-1] > self.clip_samples):
            wavs = prepare_clap_audio(wavs, self.clip_samples)
        return self._audio_fn(self.params, wavs)

    def get_audio_embedding_from_filelist(self, paths: List[str]) -> jnp.ndarray:
        """Decode + resample files host-side, then embed (hook.py:216-254)."""
        from ...data.audio_io import read_wav

        wavs = []
        max_len = 0
        for p in paths:
            w, _ = read_wav(p, target_sr=self.sample_rate)
            max_len = max(max_len, len(w))
            wavs.append(w)
        max_len = min(max_len, self.clip_samples)
        batch = np.zeros((len(wavs), max_len), np.float32)
        for i, w in enumerate(wavs):
            n = min(len(w), max_len)
            batch[i, :n] = w[:n]
        return self.get_audio_embedding_from_data(jnp.asarray(batch))

    def cosine_similarity(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        return jnp.sum(a * b, axis=-1) / (
            jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1) + 1e-12
        )
