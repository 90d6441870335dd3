"""PANN CNN audio towers (Cnn14/Cnn10/Cnn6) — alternative CLAP audio branch.

Rebuild of laion_clap/clap_module/pann_model.py (selectable via the model
config's ``model_type: PANN``; not used by shipped MusicLM configs, which all
pick HTSAT-tiny — SURVEY.md 2.1 #12). Inference path: log-mel -> BN over mel
bins -> stacked 3x3 (or 5x5) conv blocks with 2x2 avg pooling -> time/freq
global pooling -> fc1 -> 'embedding' (2048-d for Cnn14, 512-d for Cnn6/10).

NHWC layout; dropout is inference-off; BN uses running stats at eval.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .mel import logmel


class ConvBlock(nn.Module):
    """Two 3x3 conv+BN+ReLU then pool (pann_model.py:30-76)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pool_size=(2, 2), pool_type="avg", train: bool = False):
        for i in (1, 2):
            x = nn.Conv(
                self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                use_bias=False, dtype=self.dtype, name=f"conv{i}",
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name=f"bn{i}",
            )(x)
            x = nn.relu(x)
        return _pool(x, pool_size, pool_type)


class ConvBlock5x5(nn.Module):
    """Single 5x5 conv+BN+ReLU then pool (pann_model.py:78-105, Cnn6)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pool_size=(2, 2), pool_type="avg", train: bool = False):
        x = nn.Conv(
            self.out_channels, (5, 5), padding=((2, 2), (2, 2)),
            use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn1",
        )(x)
        x = nn.relu(x)
        return _pool(x, pool_size, pool_type)


def _pool(x, pool_size, pool_type):
    if pool_size == (1, 1):
        return x
    if pool_type == "avg":
        return nn.avg_pool(x, pool_size, strides=pool_size)
    if pool_type == "max":
        return nn.max_pool(x, pool_size, strides=pool_size)
    if pool_type == "avg+max":
        return nn.avg_pool(x, pool_size, strides=pool_size) + nn.max_pool(
            x, pool_size, strides=pool_size
        )
    raise ValueError(pool_type)


class PANN(nn.Module):
    """Cnn14 (default), Cnn10, Cnn6 — chosen by `arch`."""

    arch: str = "Cnn14"
    num_classes: int = 527
    sample_rate: int = 48000
    window_size_fft: int = 1024
    hop_size: int = 480
    mel_bins: int = 64
    fmin: float = 50.0
    fmax: float = 14000.0
    dtype: jnp.dtype = jnp.float32

    @property
    def channels(self) -> Sequence[int]:
        # per-arch block widths (pann_model.py: Cnn14 :182-188, Cnn10
        # :460-466, Cnn6 :365-369); Cnn10 has FIVE blocks ending at 1024 —
        # caught by tests/test_reference_tower_parity.py executed parity
        return {
            "Cnn14": (64, 128, 256, 512, 1024, 2048),
            "Cnn10": (64, 128, 256, 512, 1024),
            "Cnn6": (64, 128, 256, 512),
        }[self.arch]

    @property
    def embed_dim(self) -> int:
        return {"Cnn14": 2048, "Cnn10": 1024, "Cnn6": 512}[self.arch]

    @nn.compact
    def __call__(self, wav: Optional[jnp.ndarray] = None, *,
                 mel: Optional[jnp.ndarray] = None, train: bool = False):
        if mel is None:
            assert wav is not None
            mel = logmel(
                wav, sr=self.sample_rate, n_fft=self.window_size_fft,
                hop=self.hop_size, n_mels=self.mel_bins, fmin=self.fmin,
                fmax=self.fmax,
            )  # [B, T, F]
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn0",
        )(mel)
        x = x[..., None]  # [B, T, F, 1]

        block_cls = ConvBlock5x5 if self.arch == "Cnn6" else ConvBlock
        chans = self.channels
        for i, c in enumerate(chans):
            last = i == len(chans) - 1 and self.arch == "Cnn14"
            x = block_cls(c, dtype=self.dtype, name=f"conv_block{i + 1}")(
                x, pool_size=(1, 1) if last else (2, 2), pool_type="avg", train=train
            )

        # [B, T', F', C] -> mean over freq -> max+mean over time
        x = jnp.mean(x, axis=2)  # [B, T', C]
        x1 = jnp.max(x, axis=1)
        x2 = jnp.mean(x, axis=1)
        x = x1 + x2
        x = nn.relu(nn.Dense(self.embed_dim, dtype=self.dtype, name="fc1")(x))
        clipwise = jax.nn.sigmoid(
            nn.Dense(self.num_classes, dtype=self.dtype, name="fc_audioset")(x)
        )
        return {"embedding": x, "clipwise_output": clipwise}
