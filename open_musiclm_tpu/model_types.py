"""Interface protocols for pluggable tokenizer models.

Counterpart of reference open_musiclm/model_types.py (type aliases for the
wav2vec/codec slots). Here they are structural Protocols so alternative
semantic tokenizers or codecs (e.g. SoundStream instead of Encodec, true
w2v-BERT instead of MERT) plug into the stages without inheritance.
"""

from __future__ import annotations

from typing import Protocol, runtime_checkable

import jax.numpy as jnp


@runtime_checkable
class Wav2Vec(Protocol):
    """Semantic tokenizer: waveform -> discrete token ids."""

    target_sample_hz: int
    seq_len_multiple_of: int
    codebook_size: int
    output_hz: int

    def __call__(self, wav: jnp.ndarray) -> jnp.ndarray:
        """[B, T] audio at target_sample_hz -> [B, T'] token ids."""
        ...


@runtime_checkable
class NeuralCodec(Protocol):
    """Acoustic codec: waveform <-> multi-quantizer codes."""

    sample_rate: int
    num_quantizers: int
    codebook_size: int

    def encode(self, wav: jnp.ndarray) -> jnp.ndarray:
        """[B, T] -> [B, T', n_q] codes."""
        ...

    def decode(self, codes: jnp.ndarray) -> jnp.ndarray:
        """[B, T', n_q] -> [B, T]."""
        ...
