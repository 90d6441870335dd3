"""PANN alternative tower + contrastive CLAP loss tests."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_musiclm_tpu.models.clap.pann import PANN
from open_musiclm_tpu.train.clip_loss import clip_loss, clip_loss_mlp


@pytest.mark.parametrize("arch,embed", [("Cnn14", 2048), ("Cnn10", 1024), ("Cnn6", 512)])
def test_pann_embedding_shapes(arch, embed):
    model = PANN(
        arch=arch, sample_rate=8000, window_size_fft=64, hop_size=40,
        mel_bins=64, fmax=3500.0, num_classes=10,
    )
    wav = jax.random.normal(jax.random.PRNGKey(0), (2, 8000)) * 0.1
    params = model.init(jax.random.PRNGKey(1), wav)
    out = model.apply(params, wav)
    assert out["embedding"].shape == (2, embed)
    assert out["clipwise_output"].shape == (2, 10)
    assert np.all(np.isfinite(np.asarray(out["embedding"])))


def test_clip_loss_prefers_matched_pairs():
    key = jax.random.PRNGKey(0)
    d = 16
    f = jax.random.normal(key, (8, d))
    f = f / jnp.linalg.norm(f, axis=-1, keepdims=True)
    scale = jnp.exp(jnp.log(1 / 0.07))
    matched = clip_loss(f, f, scale)
    mismatched = clip_loss(f, jnp.roll(f, 1, axis=0), scale)
    assert float(matched) < float(mismatched)
    assert float(matched) < 0.1  # identical pairs ~ zero loss at high scale


def test_clip_loss_mlp_runs_and_grads():
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 4)
    a, t, am, tm = (jax.random.normal(k, (6, 8)) for k in ks)

    def loss(a):
        return clip_loss_mlp(a, t, am, tm, jnp.asarray(10.0), jnp.asarray(10.0))

    g = jax.grad(loss)(a)
    assert np.isfinite(float(loss(a)))
    assert float(jnp.abs(g).max()) > 0


def test_clip_loss_gather_under_shard_map():
    from jax.sharding import Mesh, PartitionSpec as P

    try:  # jax >= 0.8: top-level; jax.experimental.shard_map is deprecated
        from jax import shard_map
    except ImportError:  # pragma: no cover — older jax
        from jax.experimental.shard_map import shard_map

    devices = np.array(jax.devices()[:4])
    mesh = Mesh(devices, ("dp",))
    a = jax.random.normal(jax.random.PRNGKey(0), (8, 16))
    t = jax.random.normal(jax.random.PRNGKey(1), (8, 16))

    @functools.partial(
        shard_map, mesh=mesh, in_specs=(P("dp"), P("dp")), out_specs=P(),
        check_vma=False,  # jax >= 0.8 name (was check_rep)
    )
    def sharded_loss(a_shard, t_shard):
        return clip_loss(a_shard, t_shard, jnp.asarray(5.0), axis_name="dp")

    expected = clip_loss(a, t, jnp.asarray(5.0))
    got = sharded_loss(a, t)
    np.testing.assert_allclose(float(got), float(expected), atol=1e-5)
