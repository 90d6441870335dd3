"""Encodec 24 kHz neural codec — JAX/XLA rebuild (inference path).

Replaces the reference's external ``encodec`` pip package
(encodec_wrapper.py:5,56-69): SEANet causal conv encoder/decoder with a
2-layer LSTM bottleneck and residual VQ (8 quantizers x 1024 codes at 75 Hz
for bandwidth 6.0). Weight layout matches ``EncodecModel.encodec_model_24khz``
so checkpoints import directly (weight_norm folded at import time).

Architecture constants (24 kHz causal model): channels=1, n_filters=32,
dimension=128, ratios=[8,5,4,2] (hop 320), n_residual_layers=1,
residual kernel 3, compress=2, kernel 7 in/out, ELU activations, 1x1-conv
residual shortcuts, left-only (causal) padding in reflect mode.

TPU notes: convolutions run as NTC `lax.conv_general_dilated` (XLA maps them
onto the MXU); the LSTM is a `lax.scan` over time with fused gate matmuls;
codebook lookups are matmul-argmin (models/rvq.py). Everything is
fixed-shape and jittable end to end, so Encodec encode/tokenize can fuse into
the training input pipeline instead of living in a host-side torch call.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _pad1d_reflect(x: jnp.ndarray, left: int, right: int) -> jnp.ndarray:
    """Reflect-pad the time axis of [B, T, C]. When the signal is shorter than
    the padding, zero-extend first then trim — matches encodec's pad1d guard
    for very short inputs."""
    T = x.shape[1]
    max_pad = max(left, right)
    extra = 0
    if max_pad >= T:
        extra = max_pad - T + 1
        x = jnp.pad(x, ((0, 0), (0, extra), (0, 0)))
    y = jnp.pad(x, ((0, 0), (left, right), (0, 0)), mode="reflect")
    if extra:
        y = y[:, : y.shape[1] - extra, :]
    return y


class CausalConv1d(nn.Module):
    """Conv1d with encodec's causal left padding (+ extra right padding so a
    partial final frame is still produced)."""

    out_ch: int
    kernel: int
    stride: int = 1
    dilation: int = 1
    pad_mode: str = "reflect"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B, T, C]
        eff_k = (self.kernel - 1) * self.dilation + 1
        pad_total = eff_k - self.stride
        T = x.shape[1]
        # extra right padding so the last window is complete
        n_frames = (T - eff_k + pad_total) / self.stride + 1
        ideal = (math.ceil(n_frames) - 1) * self.stride + (eff_k - pad_total)
        extra = max(ideal - T, 0)
        if self.pad_mode == "reflect":
            x = _pad1d_reflect(x, pad_total, extra)
        else:
            x = jnp.pad(x, ((0, 0), (pad_total, extra), (0, 0)))
        y = nn.Conv(
            self.out_ch,
            kernel_size=(self.kernel,),
            strides=(self.stride,),
            kernel_dilation=(self.dilation,),
            padding="VALID",
            use_bias=True,
            dtype=self.dtype,
            name="conv",
        )(x)
        return y


class CausalConvTranspose1d(nn.Module):
    """ConvTranspose1d trimming `kernel - stride` samples from the right."""

    out_ch: int
    kernel: int
    stride: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = nn.ConvTranspose(
            self.out_ch,
            kernel_size=(self.kernel,),
            strides=(self.stride,),
            padding="VALID",
            use_bias=True,
            dtype=self.dtype,
            name="convtr",
        )(x)
        pad_total = self.kernel - self.stride
        if pad_total > 0:
            y = y[:, :-pad_total, :]
        return y


class SEANetResnetBlock(nn.Module):
    dim: int
    compress: int = 2
    residual_kernel: int = 3
    dilation: int = 1
    pad_mode: str = "reflect"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        hidden = self.dim // self.compress
        h = nn.elu(x)
        h = CausalConv1d(
            hidden, self.residual_kernel, dilation=self.dilation,
            pad_mode=self.pad_mode, dtype=self.dtype, name="block_conv1",
        )(h)
        h = nn.elu(h)
        h = CausalConv1d(self.dim, 1, pad_mode=self.pad_mode, dtype=self.dtype, name="block_conv2")(h)
        # encodec true_skip=False: 1x1-conv shortcut
        sc = CausalConv1d(self.dim, 1, pad_mode=self.pad_mode, dtype=self.dtype, name="shortcut")(x)
        return sc + h


class StreamLSTM(nn.Module):
    """2-layer LSTM with skip connection (encodec SLSTM), torch gate order."""

    hidden: int
    num_layers: int = 2
    skip: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B, T, C]
        B, T, C = x.shape
        y = x
        for layer in range(self.num_layers):
            w_ih = self.param(
                f"w_ih_{layer}", nn.initializers.lecun_normal(), (4 * self.hidden, y.shape[-1]), jnp.float32
            )
            w_hh = self.param(
                f"w_hh_{layer}", nn.initializers.lecun_normal(), (4 * self.hidden, self.hidden), jnp.float32
            )
            b_ih = self.param(f"b_ih_{layer}", nn.initializers.zeros, (4 * self.hidden,), jnp.float32)
            b_hh = self.param(f"b_hh_{layer}", nn.initializers.zeros, (4 * self.hidden,), jnp.float32)

            # precompute input projections for all timesteps in one matmul
            xp = jnp.einsum("btc,gc->btg", y, w_ih) + b_ih + b_hh  # [B, T, 4H]

            def step(carry, x_t):
                h, c = carry
                gates = x_t + jnp.einsum("bh,gh->bg", h, w_hh)
                i, f, g, o = jnp.split(gates, 4, axis=-1)
                i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
                g = jnp.tanh(g)
                c = f * c + i * g
                h = o * jnp.tanh(c)
                return (h, c), h

            # carry dtype must follow the actual compute dtype (params may be
            # cast to bf16 after init)
            init = (
                jnp.zeros((B, self.hidden), xp.dtype),
                jnp.zeros((B, self.hidden), xp.dtype),
            )
            # unroll: each scan iteration is a tiny [B,H]x[4H,H] matmul whose
            # cost is dominated by per-iteration loop overhead (w_hh reload,
            # dynamic-update of the stacked output), measured ~0.25 ms/step
            # on v5e — unrolling amortizes it 8x without changing the math
            _, hs = jax.lax.scan(
                step, init, jnp.swapaxes(xp, 0, 1), unroll=8
            )
            y = jnp.swapaxes(hs, 0, 1)
        return x + y if self.skip else y


class SEANetEncoder(nn.Module):
    channels: int = 1
    dimension: int = 128
    n_filters: int = 32
    ratios: Sequence[int] = (8, 5, 4, 2)
    n_residual_layers: int = 1
    kernel_size: int = 7
    last_kernel_size: int = 7
    residual_kernel_size: int = 3
    dilation_base: int = 2
    compress: int = 2
    lstm_layers: int = 2
    pad_mode: str = "reflect"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B, T, 1] -> [B, T', D]
        mult = 1
        h = CausalConv1d(
            mult * self.n_filters, self.kernel_size, pad_mode=self.pad_mode,
            dtype=self.dtype, name="conv_in",
        )(x)
        for si, ratio in enumerate(reversed(list(self.ratios))):
            for j in range(self.n_residual_layers):
                h = SEANetResnetBlock(
                    mult * self.n_filters,
                    compress=self.compress,
                    residual_kernel=self.residual_kernel_size,
                    dilation=self.dilation_base ** j,
                    pad_mode=self.pad_mode,
                    dtype=self.dtype,
                    name=f"res_{si}_{j}",
                )(h)
            h = nn.elu(h)
            h = CausalConv1d(
                mult * self.n_filters * 2, ratio * 2, stride=ratio,
                pad_mode=self.pad_mode, dtype=self.dtype, name=f"down_{si}",
            )(h)
            mult *= 2
        h = StreamLSTM(mult * self.n_filters, self.lstm_layers, dtype=self.dtype, name="lstm")(h)
        h = nn.elu(h)
        h = CausalConv1d(
            self.dimension, self.last_kernel_size, pad_mode=self.pad_mode,
            dtype=self.dtype, name="conv_out",
        )(h)
        return h


class SEANetDecoder(nn.Module):
    channels: int = 1
    dimension: int = 128
    n_filters: int = 32
    ratios: Sequence[int] = (8, 5, 4, 2)
    n_residual_layers: int = 1
    kernel_size: int = 7
    last_kernel_size: int = 7
    residual_kernel_size: int = 3
    dilation_base: int = 2
    compress: int = 2
    lstm_layers: int = 2
    pad_mode: str = "reflect"
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        # setup-style (not @nn.compact) so ``stem``/``head`` can be applied
        # independently: the stem (conv_in + LSTM, 75 Hz) is memory-cheap but
        # pays a sequential lax.scan, while the head (upsampling convs to
        # 24 kHz) is the HBM-heavy part — MusicLM._decode runs the stem once
        # for the whole batch and row-chunks only the head. Attribute names
        # match the old compact `name=` strings so the param tree (and the
        # import_torch.py layout contract) is unchanged.
        mult = int(2 ** len(self.ratios))
        self.conv_in = CausalConv1d(
            mult * self.n_filters, self.kernel_size, pad_mode=self.pad_mode,
            dtype=self.dtype,
        )
        self.lstm = StreamLSTM(mult * self.n_filters, self.lstm_layers, dtype=self.dtype)
        for si, ratio in enumerate(self.ratios):
            setattr(
                self,
                f"up_{si}",
                CausalConvTranspose1d(
                    mult * self.n_filters // 2, ratio * 2, stride=ratio,
                    dtype=self.dtype,
                ),
            )
            for j in range(self.n_residual_layers):
                setattr(
                    self,
                    f"res_{si}_{j}",
                    SEANetResnetBlock(
                        mult * self.n_filters // 2,
                        compress=self.compress,
                        residual_kernel=self.residual_kernel_size,
                        dilation=self.dilation_base ** j,
                        pad_mode=self.pad_mode,
                        dtype=self.dtype,
                    ),
                )
            mult //= 2
        self.conv_out = CausalConv1d(
            self.channels, self.last_kernel_size, pad_mode=self.pad_mode,
            dtype=self.dtype,
        )

    def stem(self, z: jnp.ndarray) -> jnp.ndarray:  # [B, T', D] -> [B, T', C]
        """Frame-rate prefix: input conv + 2-layer LSTM. Cheap in HBM
        ([B, T', 16*n_filters]) but sequential in time — run it unchunked."""
        return self.lstm(self.conv_in(z))

    def head(self, h: jnp.ndarray) -> jnp.ndarray:  # [B, T', C] -> [B, T, 1]
        """Upsampling suffix: transposed convs + resblocks to sample rate.
        Rows are independent, so callers may chunk the batch to cap HBM."""
        for si in range(len(self.ratios)):
            h = nn.elu(h)
            h = getattr(self, f"up_{si}")(h)
            for j in range(self.n_residual_layers):
                h = getattr(self, f"res_{si}_{j}")(h)
        h = nn.elu(h)
        return self.conv_out(h)

    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:  # [B, T', D] -> [B, T, 1]
        return self.head(self.stem(z))


class EncodecModel(nn.Module):
    """Full codec. ``encode``: [B, T] waveform -> [B, T', n_q] codes.
    ``decode``: codes -> [B, T] waveform. Mirrors the reference wrapper API
    (encodec_wrapper.py:29-54): coarse = codes[..., :3], fine = codes[..., 3:].
    """

    sample_rate: int = 24000
    channels: int = 1
    num_quantizers: int = 8  # bandwidth 6.0 -> 8 of the 32 trained quantizers
    codebook_size: int = 1024
    dimension: int = 128
    n_filters: int = 32
    ratios: Sequence[int] = (8, 5, 4, 2)
    dtype: jnp.dtype = jnp.float32

    @property
    def hop_length(self) -> int:
        out = 1
        for r in self.ratios:
            out *= r
        return out

    @property
    def frame_rate(self) -> int:
        return self.sample_rate // self.hop_length

    def setup(self):
        self.encoder = SEANetEncoder(
            channels=self.channels, dimension=self.dimension, n_filters=self.n_filters,
            ratios=tuple(self.ratios), dtype=self.dtype, name="encoder",
        )
        self.decoder = SEANetDecoder(
            channels=self.channels, dimension=self.dimension, n_filters=self.n_filters,
            ratios=tuple(self.ratios), dtype=self.dtype, name="decoder",
        )
        self.codebooks = self.param(
            "codebooks",
            nn.initializers.normal(stddev=1.0),
            (self.num_quantizers, self.codebook_size, self.dimension),
            jnp.float32,
        )

    def embed(self, x: jnp.ndarray) -> jnp.ndarray:
        """[B, T] -> latent [B, T', D] (pre-quantization)."""
        return self.encoder(x[..., None])

    def quantize_embedding(self, z: jnp.ndarray) -> jnp.ndarray:
        """[B, T', D] -> codes [B, T', n_q] (residual nearest-code loop)."""
        resid = z
        idxs = []
        for q in range(self.num_quantizers):
            cb = self.codebooks[q]
            dots = jnp.einsum("btd,kd->btk", resid, cb)
            c2 = jnp.sum(jnp.square(cb), axis=-1)
            idx = jnp.argmax(2.0 * dots - c2[None, None, :], axis=-1)
            resid = resid - cb[idx]
            idxs.append(idx)
        return jnp.stack(idxs, axis=-1)

    def dequantize(self, codes: jnp.ndarray) -> jnp.ndarray:
        """[B, T', n_q] -> latent [B, T', D]."""
        n_q = codes.shape[-1]
        out = 0.0
        for q in range(n_q):
            out = out + self.codebooks[q][codes[..., q]]
        return out

    def encode(self, x: jnp.ndarray) -> jnp.ndarray:
        """[B, T] waveform -> [B, T', n_q] codes."""
        return self.quantize_embedding(self.embed(x))

    def decode(self, codes: jnp.ndarray) -> jnp.ndarray:
        """[B, T', n_q] codes (n_q may be < num_quantizers) -> [B, T]."""
        z = self.dequantize(codes)
        return self.decoder(z)[..., 0]

    def decode_stem(self, codes: jnp.ndarray) -> jnp.ndarray:
        """codes -> frame-rate decoder state [B, T', C]: dequantize + the
        decoder's conv_in + LSTM. Split out so the sequential LSTM scan runs
        ONCE for a batch whose HBM-heavy upsampling must be row-chunked
        (MusicLM._decode); decode == decode_head(decode_stem(codes))."""
        return self.decoder.stem(self.dequantize(codes))

    def decode_head(self, h: jnp.ndarray) -> jnp.ndarray:
        """Frame-rate decoder state [B, T', C] -> [B, T] waveform (the
        row-independent upsampling convs; safe to chunk over rows)."""
        return self.decoder.head(h)[..., 0]

    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Round trip: returns (codes, reconstruction)."""
        codes = self.encode(x)
        return codes, self.decode(codes)


def create_encodec_24khz(
    bandwidth: float = 6.0, codebook_size: int = 1024, **kwargs
) -> EncodecModel:
    """Factory mirroring the reference (encodec_wrapper.py:56-69).
    num_quantizers = bandwidth / 24 * 32 trained quantizers."""
    assert bandwidth in (1.5, 3.0, 6.0, 12.0, 24.0)
    n_q = int(bandwidth / 24.0 * 32)
    return EncodecModel(num_quantizers=n_q, codebook_size=codebook_size, **kwargs)
