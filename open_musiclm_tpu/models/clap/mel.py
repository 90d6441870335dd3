"""Mel spectrogram frontend for CLAP/HTSAT — JAX/XLA.

Replaces torchlibrosa's Spectrogram + LogmelFilterBank
(reference laion_clap/clap_module/htsat.py:676-685): power STFT (hann,
center=True, reflect pad) -> slaney-norm mel filterbank -> power_to_db
(ref=1.0, amin=1e-10, top_db=None). CLAP audio geometry: 48 kHz, n_fft 1024,
hop 480, 64 mels, fmin 50, fmax 14000 -> 1001 frames for a 10 s clip.

The STFT is an rfft over framed windows — XLA fuses the framing gather +
window multiply + fft; the mel projection is a single [F_bins, n_mels]
matmul (MXU). SpecAugment masking is pure jnp for the training path.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def hz_to_mel_slaney(f: np.ndarray) -> np.ndarray:
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = math.log(6.4) / 27.0
    log_region = f >= min_log_hz
    mels = np.where(log_region, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mels)
    return mels


def mel_to_hz_slaney(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = m * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = math.log(6.4) / 27.0
    log_region = m >= min_log_mel
    freqs = np.where(log_region, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)
    return freqs


@functools.lru_cache(maxsize=8)
def mel_filterbank(
    sr: int, n_fft: int, n_mels: int, fmin: float, fmax: float
) -> np.ndarray:
    """librosa.filters.mel equivalent (htk=False, norm='slaney').
    Returns [1 + n_fft//2, n_mels]."""
    fftfreqs = np.linspace(0.0, sr / 2.0, 1 + n_fft // 2)
    mel_pts = np.linspace(
        hz_to_mel_slaney(np.array(fmin)), hz_to_mel_slaney(np.array(fmax)), n_mels + 2
    )
    mel_f = mel_to_hz_slaney(mel_pts)
    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels])
    weights = weights * enorm[:, None]
    return weights.T.astype(np.float32)  # [F, n_mels]


@functools.lru_cache(maxsize=8)
def hann_window(n: int) -> np.ndarray:
    """Periodic hann (librosa get_window fftbins=True)."""
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)).astype(np.float32)


def stft_power(
    x: jnp.ndarray, n_fft: int, hop: int, *, center: bool = True
) -> jnp.ndarray:
    """[B, T] -> power spectrogram [B, frames, 1 + n_fft//2]."""
    if center:
        x = jnp.pad(x, ((0, 0), (n_fft // 2, n_fft // 2)), mode="reflect")
    T = x.shape[-1]
    num_frames = 1 + (T - n_fft) // hop
    idx = jnp.arange(num_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    frames = x[:, idx]  # [B, frames, n_fft]
    frames = frames * jnp.asarray(hann_window(n_fft))
    spec = jnp.fft.rfft(frames, axis=-1)
    return jnp.square(jnp.real(spec)) + jnp.square(jnp.imag(spec))


def logmel(
    x: jnp.ndarray,
    *,
    sr: int = 48000,
    n_fft: int = 1024,
    hop: int = 480,
    n_mels: int = 64,
    fmin: float = 50.0,
    fmax: float = 14000.0,
    amin: float = 1e-10,
    ref: float = 1.0,
    top_db: Optional[float] = None,
) -> jnp.ndarray:
    """[B, T] waveform -> [B, frames, n_mels] log-mel (dB)."""
    power = stft_power(x, n_fft, hop)
    mel = power @ jnp.asarray(mel_filterbank(sr, n_fft, n_mels, fmin, fmax))
    log_spec = 10.0 * jnp.log10(jnp.maximum(mel, amin))
    log_spec = log_spec - 10.0 * math.log10(max(amin, ref))
    if top_db is not None:
        log_spec = jnp.maximum(log_spec, jnp.max(log_spec) - top_db)
    return log_spec


def spec_augment(
    key: jax.Array,
    mel: jnp.ndarray,  # [B, frames, n_mels]
    *,
    time_drop_width: int = 64,
    time_stripes_num: int = 2,
    freq_drop_width: int = 8,
    freq_stripes_num: int = 2,
) -> jnp.ndarray:
    """Training-time SpecAugment (torchlibrosa SpecAugmentation semantics:
    per-example random stripes of random width up to drop_width)."""
    B, T, F = mel.shape

    def mask_axis(key, size, width, num, axis_len):
        ks = jax.random.split(key, 2 * num)
        mask = jnp.ones((B, axis_len), mel.dtype)
        pos_grid = jnp.arange(axis_len)[None, :]
        for i in range(num):
            w = jax.random.randint(ks[2 * i], (B, 1), 0, width + 1)
            start = jax.random.randint(ks[2 * i + 1], (B, 1), 0, jnp.maximum(axis_len - w, 1))
            hit = (pos_grid >= start) & (pos_grid < start + w)
            mask = mask * (1.0 - hit.astype(mel.dtype))
        return mask

    kt, kf = jax.random.split(key)
    tmask = mask_axis(kt, B, time_drop_width, time_stripes_num, T)  # [B, T]
    fmask = mask_axis(kf, B, freq_drop_width, freq_stripes_num, F)  # [B, F]
    return mel * tmask[:, :, None] * fmask[:, None, :]
