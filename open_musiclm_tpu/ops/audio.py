"""Audio resampling + prep as XLA ops.

Replaces torchaudio.functional.resample (reference utils.py:164,
open_musiclm.py:1061, data.py:120): polyphase windowed-sinc resampling
expressed as a strided conv — one [new_freq, K] filter bank applied with
stride ``orig_freq`` (after gcd reduction), which XLA lowers to MXU matmuls.
Kernel construction mirrors torchaudio's ``sinc_interp_hann`` (width 6,
rolloff 0.99) so resampled waveforms match the reference pipeline closely.

Also hosts ``prepare_audio`` (utils.py:157-166): mono mix, optional
zero-mean/unit-var normalize, crop, resample, int16 round trip.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=32)
def _resample_kernel(
    orig_freq: int, new_freq: int, lowpass_filter_width: int = 6, rolloff: float = 0.99
) -> Tuple[np.ndarray, int]:
    """Returns (kernels [new_freq, K], width) for reduced orig/new freqs."""
    assert orig_freq > 0 and new_freq > 0
    base_freq = min(orig_freq, new_freq) * rolloff
    width = math.ceil(lowpass_filter_width * orig_freq / base_freq)
    idx = np.arange(-width, width + orig_freq, dtype=np.float64) / orig_freq
    t = idx[None, :] - np.arange(new_freq, dtype=np.float64)[:, None] / new_freq
    t = t * base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)
    window = np.cos(t * np.pi / lowpass_filter_width / 2) ** 2
    t_pi = t * np.pi
    kernel = np.where(t_pi == 0, 1.0, np.sin(t_pi) / np.where(t_pi == 0, 1.0, t_pi))
    kernel = kernel * window * (base_freq / orig_freq)
    return kernel.astype(np.float32), width


def resample(
    wav: jnp.ndarray, orig_freq: int, new_freq: int, **kw
) -> jnp.ndarray:
    """[..., T] -> [..., ceil(T * new/orig)], torchaudio-compatible."""
    if orig_freq == new_freq:
        return wav
    g = math.gcd(int(orig_freq), int(new_freq))
    orig, new = int(orig_freq) // g, int(new_freq) // g
    kernels, width = _resample_kernel(orig, new, **kw)

    shape = wav.shape
    T = shape[-1]
    x = wav.reshape(-1, 1, T)
    x = jnp.pad(x, ((0, 0), (0, 0), (width, width + orig)))
    # conv: [B, 1, T_pad] * [new, 1, K] stride orig -> [B, new, frames]
    y = jax.lax.conv_general_dilated(
        x,
        jnp.asarray(kernels)[:, None, :],
        window_strides=(orig,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    # interleave phases: output[n*frame + phase]
    B, P, F = y.shape
    y = jnp.transpose(y, (0, 2, 1)).reshape(B, F * P)
    target_len = int(math.ceil(new * T / orig))
    y = y[:, :target_len]
    return y.reshape(shape[:-1] + (target_len,))


def zero_mean_unit_var_norm(x: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """utils.py:154-155 (unbiased variance, torch semantics)."""
    n = x.shape[-1]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True) * n / max(n - 1, 1)
    return (x - mean) / jnp.sqrt(var + eps)


def int16_round_trip(x: jnp.ndarray) -> jnp.ndarray:
    q = (jnp.clip(x, -1.0, 1.0) * 32767.0).astype(jnp.int16)
    return q.astype(jnp.float32) / 32767.0


def prepare_audio(
    wav: jnp.ndarray,  # [C, T] or [B, T]
    sample_hz: int,
    target_sample_hz: int,
    *,
    normalize: bool = True,
    target_length_seconds: Optional[float] = None,
) -> jnp.ndarray:
    """Reference utils.py:157-166: mono mix over leading channel dim,
    normalize, crop, resample, int16 round trip."""
    if wav.ndim == 2 and wav.shape[0] > 1:
        wav = jnp.mean(wav, axis=0, keepdims=True)
    if normalize:
        wav = zero_mean_unit_var_norm(wav)
    if target_length_seconds is not None:
        max_len = int(target_length_seconds * sample_hz)
        if wav.shape[-1] > max_len:
            wav = wav[..., :max_len]
    wav = resample(wav, sample_hz, target_sample_hz)
    return int16_round_trip(wav)
