"""Encodec + HuBERT structural tests: token geometry (75 Hz x 8 quantizers,
the MERT 499-frame off-by-one), round-trip shapes, jittability, causality."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_musiclm_tpu.models.encodec import EncodecModel, create_encodec_24khz
from open_musiclm_tpu.models.hubert import (
    HubertConfig,
    HubertModel,
    HubertWithKmeans,
    zero_mean_unit_var,
)

SMALL_HUBERT = HubertConfig(
    conv_dim=(32,) * 7,
    hidden_size=64,
    num_hidden_layers=4,
    num_attention_heads=4,
    intermediate_size=128,
    num_conv_pos_embeddings=16,
    num_conv_pos_embedding_groups=4,
)


@pytest.fixture(scope="module")
def encodec_small():
    model = EncodecModel(num_quantizers=4, codebook_size=32, dimension=16, n_filters=4)
    wav = jnp.zeros((1, 3200))
    params = model.init(jax.random.PRNGKey(0), wav)
    return model, params


def test_encodec_token_geometry(encodec_small):
    model, params = encodec_small
    assert model.hop_length == 320
    assert model.frame_rate == 75
    wav = jax.random.normal(jax.random.PRNGKey(1), (2, 3200)) * 0.1
    codes = model.apply(params, wav, method=EncodecModel.encode)
    # 3200 samples / 320 hop = 10 frames
    assert codes.shape == (2, 10, 4)
    assert int(codes.min()) >= 0 and int(codes.max()) < 32


def test_encodec_decode_length(encodec_small):
    model, params = encodec_small
    codes = jax.random.randint(jax.random.PRNGKey(2), (2, 10, 4), 0, 32)
    wav = model.apply(params, codes, method=EncodecModel.decode)
    assert wav.shape == (2, 3200)


def test_encodec_decode_subset_quantizers(encodec_small):
    """Decoding from only coarse codes must work (reference
    CoarseStage.generate reconstruct_wave, open_musiclm.py:676-679)."""
    model, params = encodec_small
    codes = jax.random.randint(jax.random.PRNGKey(3), (1, 10, 2), 0, 32)
    wav = model.apply(params, codes, method=EncodecModel.decode)
    assert wav.shape == (1, 3200)


def test_encodec_roundtrip_jit(encodec_small):
    model, params = encodec_small
    fn = jax.jit(lambda p, w: model.apply(p, w))
    codes, recon = fn(params, jax.random.normal(jax.random.PRNGKey(4), (1, 3200)) * 0.1)
    assert codes.shape == (1, 10, 4)
    assert recon.shape == (1, 3200)
    assert np.all(np.isfinite(np.asarray(recon)))


def test_encodec_encoder_is_causal(encodec_small):
    """Future samples must not affect earlier latent frames."""
    model, params = encodec_small
    wav = jax.random.normal(jax.random.PRNGKey(5), (1, 3200)) * 0.1
    z1 = model.apply(params, wav, method=EncodecModel.embed)
    wav2 = wav.at[:, 3000:].add(1.0)
    z2 = model.apply(params, wav2, method=EncodecModel.embed)
    # frames strictly before sample 3000 (frame 9 ends at 2880... frame i
    # covers up to (i+1)*320) are unchanged
    np.testing.assert_allclose(
        np.asarray(z1[:, :9]), np.asarray(z2[:, :9]), atol=1e-5
    )


def test_hubert_mert_frame_count():
    """10 s @ 16 kHz -> 499 frames (the 50 Hz - 1 off-by-one, SURVEY 2.4)."""
    model = HubertModel(cfg=SMALL_HUBERT)
    wav = jnp.zeros((1, 160000))
    params = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), wav))
    out_shape = jax.eval_shape(
        lambda p, w: model.apply(p, w, 2, method=HubertModel.extract_features),
        params,
        wav,
    )
    assert out_shape.shape == (1, 499, 64)


def test_hubert_hidden_state_indexing():
    model = HubertModel(cfg=SMALL_HUBERT)
    wav = jax.random.normal(jax.random.PRNGKey(1), (1, 3200)) * 0.1
    params = model.init(jax.random.PRNGKey(0), wav)
    last, hs = model.apply(params, wav)
    assert len(hs) == SMALL_HUBERT.num_hidden_layers + 1
    np.testing.assert_allclose(np.asarray(hs[-1]), np.asarray(last), atol=1e-6)


def test_hubert_with_kmeans_end_to_end():
    model = HubertModel(cfg=SMALL_HUBERT)
    wav = jax.random.normal(jax.random.PRNGKey(1), (2, 3300)) * 0.1
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3200)))
    cents = jax.random.normal(jax.random.PRNGKey(2), (16, 64))
    hk = HubertWithKmeans(model, params, cents, embed_layer=2)
    ids = jax.jit(hk.__call__)(wav)
    # 3300 curtailed to 3200 -> (3200-10)/5+1=639 -> /2 via (k3s2)x5,(k2s2)... compute via shape
    assert ids.ndim == 2 and ids.shape[0] == 2
    assert int(ids.min()) >= 0 and int(ids.max()) < 16


def test_zero_mean_unit_var_matches_torch_semantics():
    import torch

    x = np.random.RandomState(0).randn(2, 5, 32).astype(np.float32)
    xt = torch.from_numpy(x)
    expected = (xt - xt.mean(dim=-1, keepdim=True)) / torch.sqrt(
        xt.var(dim=-1, keepdim=True) + 1e-7
    )
    got = zero_mean_unit_var(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), expected.numpy(), atol=1e-5)
