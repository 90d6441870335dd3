"""HTSAT (hierarchical token-semantic audio transformer) — JAX/XLA rebuild.

Replaces the reference's torch HTSAT Swin tower
(laion_clap/clap_module/htsat.py:599-980). Pipeline for the MusicLM path
(HTSAT-tiny, no fusion): 48 kHz waveform -> log-mel [B, 1001, 64] ->
BatchNorm over mel bins -> (train: SpecAugment) -> fold into a 256x256
"image" with freq_ratio=4 (reshape_wav2img, htsat.py:833-848) -> 4 Swin
stages (embed 96, depths [2,2,6,2], heads [4,8,16,32], window 8, patch 4) ->
freq-unfold + avgpool -> 768-d 'embedding' (htsat.py:774-819).

TPU notes: window partitioning is pure reshape/transpose (layout ops XLA
folds away); window attention is batched [B*nW, 64, C] matmuls on the MXU;
relative-position indices and shifted-window masks are static numpy
constants baked at trace time. Stochastic depth and dropout are inference-
off; bicubic time interpolation implements torch's align_corners=True
convention (a = -0.75) since jax.image.resize only offers half-pixel.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .mel import logmel, spec_augment


# ---------------------------------------------------------------------------
# bicubic interpolation with align_corners=True (torch convention, a=-0.75)
# ---------------------------------------------------------------------------


def _cubic_weights(t: jnp.ndarray, a: float = -0.75):
    """Cubic convolution weights for fractional offset t in [0,1)."""
    # distances of the 4 taps from the sample point: 1+t, t, 1-t, 2-t
    d0, d1, d2, d3 = 1.0 + t, t, 1.0 - t, 2.0 - t

    def w_near(d):  # |d| <= 1
        return (a + 2.0) * d ** 3 - (a + 3.0) * d ** 2 + 1.0

    def w_far(d):  # 1 < |d| < 2
        return a * d ** 3 - 5.0 * a * d ** 2 + 8.0 * a * d - 4.0 * a

    return w_far(d0), w_near(d1), w_near(d2), w_far(d3)


def bicubic_resize_axis_align_corners(x: jnp.ndarray, new_len: int, axis: int) -> jnp.ndarray:
    """Resize one axis with bicubic interpolation, align_corners=True."""
    old_len = x.shape[axis]
    if old_len == new_len:
        return x
    x = jnp.moveaxis(x, axis, -1)
    pos = jnp.arange(new_len) * ((old_len - 1) / max(new_len - 1, 1))
    i0 = jnp.floor(pos).astype(jnp.int32)
    t = pos - i0
    idx = jnp.stack([i0 - 1, i0, i0 + 1, i0 + 2], axis=0)
    idx = jnp.clip(idx, 0, old_len - 1)
    w = jnp.stack(_cubic_weights(t), axis=0)  # [4, new_len]
    gathered = x[..., idx]  # [..., 4, new_len]
    return jnp.moveaxis(jnp.sum(gathered * w, axis=-2), -1, axis)


# ---------------------------------------------------------------------------
# static Swin geometry helpers
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=32)
def relative_position_index(wh: int, ww: int) -> np.ndarray:
    """[wh*ww, wh*ww] indices into the (2wh-1)(2ww-1) bias table
    (htsat.py:305-316)."""
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    return rel.sum(-1)


@functools.lru_cache(maxsize=32)
def shifted_window_mask(H: int, W: int, window: int, shift: int) -> np.ndarray:
    """[nW, w*w, w*w] additive mask (0 / -100) for SW-MSA (htsat.py:426-444)."""
    img = np.zeros((H, W))
    cnt = 0
    for h in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for w in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            img[h, w] = cnt
            cnt += 1
    mw = img.reshape(H // window, window, W // window, window)
    mw = mw.transpose(0, 2, 1, 3).reshape(-1, window * window)
    diff = mw[:, None, :] - mw[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def window_partition(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B*nW, window*window, C]."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // window, window, W // window, window, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, window * window, C)


def window_reverse(win: jnp.ndarray, window: int, H: int, W: int) -> jnp.ndarray:
    B = win.shape[0] // ((H // window) * (W // window))
    x = win.reshape(B, H // window, W // window, window, window, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, -1)


# ---------------------------------------------------------------------------
# modules
# ---------------------------------------------------------------------------


class WindowAttention(nn.Module):
    dim: int
    window: int
    num_heads: int
    qkv_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[np.ndarray] = None) -> jnp.ndarray:
        B_, N, C = x.shape
        h = self.num_heads
        head_dim = C // h
        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B_, N, 3, h, head_dim).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum("bhnd,bhmd->bhnm", q * (head_dim ** -0.5), k)

        table = self.param(
            "rel_pos_bias_table",
            nn.initializers.normal(stddev=0.02),
            ((2 * self.window - 1) ** 2, h),
            jnp.float32,
        )
        rpi = jnp.asarray(relative_position_index(self.window, self.window))
        bias = table[rpi.reshape(-1)].reshape(N, N, h).transpose(2, 0, 1)
        attn = attn + bias[None].astype(attn.dtype)

        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(B_ // nW, nW, h, N, N) + jnp.asarray(mask)[None, :, None]
            attn = attn.reshape(B_, h, N, N)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B_, N, C)
        return nn.Dense(C, use_bias=True, dtype=self.dtype, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    resolution: Tuple[int, int]
    num_heads: int
    window: int = 8
    shift: int = 0
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        H, W = self.resolution
        window, shift = self.window, self.shift
        if min(H, W) <= window:
            window, shift = min(H, W), 0

        B, L, C = x.shape
        shortcut = x
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        h = h.reshape(B, H, W, C)
        if shift > 0:
            h = jnp.roll(h, (-shift, -shift), axis=(1, 2))
        windows = window_partition(h, window)
        mask = shifted_window_mask(H, W, window, shift) if shift > 0 else None
        attn_out = WindowAttention(
            dim=C, window=window, num_heads=self.num_heads, dtype=self.dtype, name="attn"
        )(windows, mask)
        h = window_reverse(attn_out, window, H, W)
        if shift > 0:
            h = jnp.roll(h, (shift, shift), axis=(1, 2))
        h = h.reshape(B, L, C)
        x = shortcut + h  # drop_path: identity at inference

        m = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        m = nn.Dense(int(C * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1")(m)
        m = nn.gelu(m, approximate=False)
        m = nn.Dense(C, dtype=self.dtype, name="mlp_fc2")(m)
        return x + m


class PatchMerging(nn.Module):
    dim: int
    resolution: Tuple[int, int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        H, W = self.resolution
        B, L, C = x.shape
        x = x.reshape(B, H, W, C)
        x = jnp.concatenate(
            [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]],
            axis=-1,
        ).reshape(B, (H // 2) * (W // 2), 4 * C)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return nn.Dense(2 * C, use_bias=False, dtype=self.dtype, name="reduction")(x)


class HTSATConfig:
    """Audio-side geometry (model_configs/HTSAT-tiny.json)."""

    def __init__(
        self,
        spec_size: int = 256,
        patch_size: int = 4,
        patch_stride: Tuple[int, int] = (4, 4),
        embed_dim: int = 96,
        depths: Tuple[int, ...] = (2, 2, 6, 2),
        num_heads: Tuple[int, ...] = (4, 8, 16, 32),
        window_size: int = 8,
        num_classes: int = 527,
        mel_bins: int = 64,
        sample_rate: int = 48000,
        window_size_fft: int = 1024,
        hop_size: int = 480,
        fmin: float = 50.0,
        fmax: float = 14000.0,
        clip_samples: int = 480000,
        enable_fusion: bool = False,
        fusion_type: str = "aff_2d",
    ):
        self.enable_fusion = enable_fusion
        self.fusion_type = fusion_type
        self.spec_size = spec_size
        self.patch_size = patch_size
        self.patch_stride = patch_stride
        self.embed_dim = embed_dim
        self.depths = depths
        self.num_heads = num_heads
        self.window_size = window_size
        self.num_classes = num_classes
        self.mel_bins = mel_bins
        self.sample_rate = sample_rate
        self.window_size_fft = window_size_fft
        self.hop_size = hop_size
        self.fmin = fmin
        self.fmax = fmax
        self.clip_samples = clip_samples
        self.freq_ratio = spec_size // mel_bins
        self.num_features = int(embed_dim * 2 ** (len(depths) - 1))


class HTSAT(nn.Module):
    """Swin audio tower. `__call__` takes [B, T] 48 kHz waveform and returns
    a dict with 'embedding' [B, 768] (+ clipwise/framewise heads)."""

    cfg: HTSATConfig = None  # type: ignore[assignment]
    dtype: jnp.dtype = jnp.float32

    def _cfg(self) -> HTSATConfig:
        return self.cfg if self.cfg is not None else HTSATConfig()

    def _fusion_patch_embed(self, imgs, longer, train):
        """Fusion-mode patch embed (reference htsat.py:100-133, aff_2d family):
        global channel 0 through the standard patch conv; local channels 1..3
        through mel_conv2d (kernel (P, 3P), stride (S, 3S)), concatenated
        along width and attentionally fused into the global patches for
        `longer` clips. Fixed-shape SPMD style: both branches always compute;
        `longer` selects per example."""
        from .fusion import make_fusion

        cfg = self._cfg()
        B, C, H, W = imgs.shape
        global_x = nn.Conv(
            cfg.embed_dim,
            kernel_size=(cfg.patch_size, cfg.patch_size),
            strides=cfg.patch_stride,
            padding="VALID",
            dtype=self.dtype,
            name="patch_embed",
        )(imgs[:, 0][..., None])  # [B, H/P, W/P, E]
        TW = global_x.shape[2]

        local = imgs[:, 1:].reshape(B * (C - 1), H, W)[..., None]
        local = nn.Conv(
            cfg.embed_dim,
            kernel_size=(cfg.patch_size, cfg.patch_size * 3),
            strides=(cfg.patch_stride[0], cfg.patch_stride[1] * 3),
            padding="VALID",
            dtype=self.dtype,
            name="mel_conv2d",
        )(local)  # [B*3, H/P, W/(3S), E]
        hh, ww = local.shape[1], local.shape[2]
        local = local.reshape(B, C - 1, hh, ww, cfg.embed_dim)
        # concat the chunks along width (torch permute(0,2,3,1,4)+flatten)
        local = local.transpose(0, 2, 1, 3, 4).reshape(B, hh, (C - 1) * ww, cfg.embed_dim)
        if local.shape[2] < TW:
            local = jnp.pad(local, ((0, 0), (0, 0), (0, TW - local.shape[2]), (0, 0)))
        else:
            local = local[:, :, :TW]

        fused = make_fusion(cfg.fusion_type, cfg.embed_dim, dtype=self.dtype)(
            global_x, local, train=train
        )
        if longer is None:
            longer = jnp.ones((B,), bool)
        return jnp.where(longer[:, None, None, None], fused, global_x)

    @nn.compact
    def __call__(
        self,
        wav: Optional[jnp.ndarray] = None,
        *,
        mel: Optional[jnp.ndarray] = None,
        mel_fusion: Optional[jnp.ndarray] = None,  # [B, 4, T, F]
        longer: Optional[jnp.ndarray] = None,  # [B] bool: clip was > 10 s
        train: bool = False,
        rng: Optional[jax.Array] = None,
    ):
        """Pass `wav` [B, T] (the normal path), a precomputed log-mel
        `mel` [B, frames, mel_bins] (pre-bn0), or — in fusion mode — a
        `mel_fusion` [B, 4, frames, mel_bins] stack + `longer` mask
        (htsat.py:866-934 fusion branch)."""
        cfg = self._cfg()
        fusion = cfg.enable_fusion and mel_fusion is not None
        if fusion:
            mel = mel_fusion  # [B, 4, T, F]
        elif mel is None:
            assert wav is not None
            mel = logmel(
                wav,
                sr=cfg.sample_rate,
                n_fft=cfg.window_size_fft,
                hop=cfg.hop_size,
                n_mels=cfg.mel_bins,
                fmin=cfg.fmin,
                fmax=cfg.fmax,
            )  # [B, T, F]
        mel = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name="bn0",
        )(mel)
        if train and rng is not None and not fusion:
            mel = spec_augment(rng, mel)
        fr = cfg.freq_ratio
        target_T = cfg.spec_size * fr
        target_F = cfg.spec_size // fr

        def fold(m):
            # reshape_wav2img (htsat.py:833-848): [B, T, F] -> [B, H, W]
            Bm = m.shape[0]
            x = bicubic_resize_axis_align_corners(m, target_T, axis=1)
            if m.shape[2] < target_F:
                x = bicubic_resize_axis_align_corners(x, target_F, axis=2)
            x = x.transpose(0, 2, 1)  # [B, F, T]
            x = x.reshape(Bm, target_F, fr, target_T // fr)
            x = x.transpose(0, 2, 1, 3)  # [B, fr, F, T/fr]
            return x.reshape(Bm, fr * target_F, target_T // fr)

        grid = (cfg.spec_size // cfg.patch_stride[0], cfg.spec_size // cfg.patch_stride[1])
        if fusion:
            B, C = mel.shape[0], mel.shape[1]
            imgs = fold(mel.reshape(B * C, mel.shape[2], mel.shape[3]))
            imgs = imgs.reshape(B, C, imgs.shape[1], imgs.shape[2])
            h = self._fusion_patch_embed(imgs, longer, train)
        else:
            B = mel.shape[0]
            img = fold(mel)[..., None]  # [B, H, W, 1]
            h = nn.Conv(
                cfg.embed_dim,
                kernel_size=(cfg.patch_size, cfg.patch_size),
                strides=cfg.patch_stride,
                padding="VALID",
                dtype=self.dtype,
                name="patch_embed",
            )(img)
        h = h.reshape(B, grid[0] * grid[1], cfg.embed_dim)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="patch_norm")(h)

        res = grid
        dim = cfg.embed_dim
        for si, (depth, heads) in enumerate(zip(cfg.depths, cfg.num_heads)):
            for bi in range(depth):
                shift = 0 if bi % 2 == 0 else cfg.window_size // 2
                h = SwinBlock(
                    dim=dim,
                    resolution=res,
                    num_heads=heads,
                    window=cfg.window_size,
                    shift=shift,
                    dtype=self.dtype,
                    name=f"stage_{si}_block_{bi}",
                )(h)
            if si < len(cfg.depths) - 1:
                h = PatchMerging(dim=dim, resolution=res, dtype=self.dtype, name=f"merge_{si}")(h)
                res = (res[0] // 2, res[1] // 2)
                dim *= 2

        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(h)

        # freq-unfold latent pooling (htsat.py:786-801)
        SF, ST = res
        C = dim
        g = h.transpose(0, 2, 1).reshape(B, C, SF, ST)
        c_freq_bin = SF // fr
        g = g.reshape(B, C, SF // c_freq_bin, c_freq_bin, ST)
        g = g.transpose(0, 1, 3, 2, 4).reshape(B, C, c_freq_bin, fr * ST)
        embedding = jnp.mean(g.reshape(B, C, -1), axis=-1)

        # token-semantic CAM head (clipwise output; htsat.py:803-812)
        tc = nn.Conv(
            cfg.num_classes,
            kernel_size=(c_freq_bin, 3),
            padding=((0, 0), (1, 1)),
            dtype=self.dtype,
            name="tscam_conv",
        )(g.transpose(0, 2, 3, 1))  # NHWC
        tc = tc.reshape(B, -1, cfg.num_classes)  # [B, T'', classes]
        clipwise = jax.nn.sigmoid(jnp.mean(tc, axis=1))
        framewise = jax.nn.sigmoid(tc)

        return {
            "embedding": embedding,
            "clipwise_output": clipwise,
            "framewise_output": framewise,
        }
