"""Fusion CLAP tests: AFF/iAFF/DAF modules, mel-fusion stack construction,
fusion-mode HTSAT forward, fusion vs non-fusion selection via `longer`."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_musiclm_tpu.models.clap.fusion import AFF, DAF, build_mel_fusion, iAFF
from open_musiclm_tpu.models.clap.htsat import HTSAT, HTSATConfig
from tests.test_clap import TINY_AUDIO


def fusion_cfg():
    c = TINY_AUDIO
    return HTSATConfig(
        spec_size=c.spec_size, patch_size=c.patch_size, patch_stride=c.patch_stride,
        embed_dim=c.embed_dim, depths=c.depths, num_heads=c.num_heads,
        window_size=c.window_size, num_classes=c.num_classes, mel_bins=c.mel_bins,
        sample_rate=c.sample_rate, window_size_fft=c.window_size_fft,
        hop_size=c.hop_size, fmin=c.fmin, fmax=c.fmax, clip_samples=c.clip_samples,
        enable_fusion=True, fusion_type="aff_2d",
    )


@pytest.mark.parametrize("mod", [AFF(channels=8), iAFF(channels=8), DAF()])
def test_fusion_modules_shapes(mod):
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 8))
    r = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 8))
    params = mod.init(jax.random.PRNGKey(2), x, r)
    out = mod.apply(params, x, r)
    assert out.shape == x.shape
    assert np.all(np.isfinite(np.asarray(out)))


def test_daf_is_add():
    mod = DAF()
    x = jnp.ones((1, 2, 2, 4))
    r = 2 * jnp.ones((1, 2, 2, 4))
    params = mod.init(jax.random.PRNGKey(0), x, r)
    np.testing.assert_allclose(np.asarray(mod.apply(params, x, r)), 3.0)


def test_build_mel_fusion_long_and_short():
    mel = jax.random.normal(jax.random.PRNGKey(0), (300, 8))
    stack = build_mel_fusion(mel, chunk_frames=100)
    assert stack.shape == (4, 100, 8)
    # chunks are real slices of the mel
    np.testing.assert_allclose(np.asarray(stack[1]), np.asarray(mel[:100]))
    np.testing.assert_allclose(np.asarray(stack[3]), np.asarray(mel[200:300]))
    short = build_mel_fusion(mel[:50], chunk_frames=100)
    assert short.shape == (4, 100, 8)
    np.testing.assert_allclose(np.asarray(short[0]), np.asarray(short[1]))


def test_fusion_htsat_forward():
    cfg = fusion_cfg()
    model = HTSAT(cfg=cfg)
    frames = 128
    mel_fusion = jax.random.normal(jax.random.PRNGKey(0), (2, 4, frames, cfg.mel_bins))
    longer = jnp.array([True, False])
    params = model.init(
        jax.random.PRNGKey(1), mel_fusion=mel_fusion, longer=longer
    )
    out = model.apply(params, mel_fusion=mel_fusion, longer=longer)
    assert out["embedding"].shape == (2, cfg.num_features)
    assert np.all(np.isfinite(np.asarray(out["embedding"])))


def test_longer_mask_selects_fusion():
    """longer=False example must equal the global-only path (local branch
    ignored)."""
    cfg = fusion_cfg()
    model = HTSAT(cfg=cfg)
    frames = 128
    mel_fusion = jax.random.normal(jax.random.PRNGKey(0), (1, 4, frames, cfg.mel_bins))
    params = model.init(
        jax.random.PRNGKey(1), mel_fusion=mel_fusion, longer=jnp.array([False])
    )
    out1 = model.apply(params, mel_fusion=mel_fusion, longer=jnp.array([False]))
    # changing the local channels must not affect a not-longer example
    mel2 = mel_fusion.at[:, 1:].add(5.0)
    out2 = model.apply(params, mel_fusion=mel2, longer=jnp.array([False]))
    np.testing.assert_allclose(
        np.asarray(out1["embedding"]), np.asarray(out2["embedding"]), atol=1e-5
    )
    out3 = model.apply(params, mel_fusion=mel2, longer=jnp.array([True]))
    assert not np.allclose(np.asarray(out1["embedding"]), np.asarray(out3["embedding"]))
