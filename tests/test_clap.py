"""CLAP stack tests: mel frontend vs librosa-style reference math, HTSAT
geometry, RoBERTa tower, BPE tokenizer, quantized conditioning tokens."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_musiclm_tpu.models.clap.clap import (
    CLAP,
    ClapQuantized,
    int16_round_trip,
    prepare_clap_audio,
)
from open_musiclm_tpu.models.clap.htsat import (
    HTSAT,
    HTSATConfig,
    bicubic_resize_axis_align_corners,
    shifted_window_mask,
    window_partition,
    window_reverse,
)
from open_musiclm_tpu.models.clap.mel import hann_window, logmel, mel_filterbank
from open_musiclm_tpu.models.clap.roberta import RobertaConfig, RobertaModel
from open_musiclm_tpu.models.clap.tokenizer import ByteLevelBPE, RobertaTokenizer
from open_musiclm_tpu.models.rvq import rvq_init

from open_musiclm_tpu.testing import TINY_AUDIO, TINY_TEXT  # noqa: E402


def test_mel_filterbank_matches_librosa_formula():
    fb = mel_filterbank(48000, 1024, 64, 50.0, 14000.0)
    assert fb.shape == (513, 64)
    # every filter is nonnegative with a single peak and positive area
    assert fb.min() >= 0
    assert (fb.sum(axis=0) > 0).all()


def test_stft_matches_torch():
    import torch

    x = np.random.RandomState(0).randn(1, 4800).astype(np.float32)
    n_fft, hop = 256, 120
    win = torch.from_numpy(hann_window(n_fft).copy())
    spec_t = torch.stft(
        torch.from_numpy(x),
        n_fft=n_fft,
        hop_length=hop,
        window=win,
        center=True,
        pad_mode="reflect",
        return_complex=True,
    )
    power_t = spec_t.abs().pow(2).numpy().transpose(0, 2, 1)  # [B, T, F]
    from open_musiclm_tpu.models.clap.mel import stft_power

    power_j = np.asarray(stft_power(jnp.asarray(x), n_fft, hop))
    assert power_j.shape == power_t.shape
    np.testing.assert_allclose(power_j, power_t, atol=1e-2, rtol=1e-3)


def test_bicubic_align_corners_matches_torch():
    import torch
    import torch.nn.functional as F

    x = np.random.RandomState(1).randn(2, 1, 19, 7).astype(np.float32)
    out_t = F.interpolate(torch.from_numpy(x), (32, 7), mode="bicubic", align_corners=True)
    out_j = bicubic_resize_axis_align_corners(jnp.asarray(x), 32, axis=2)
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(), atol=2e-5)


def test_window_partition_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 3))
    w = window_partition(x, 4)
    assert w.shape == (2 * 4, 16, 3)
    back = window_reverse(w, 4, 8, 8)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_shifted_window_mask_static():
    m = shifted_window_mask(8, 8, 4, 2)
    assert m.shape == (4, 16, 16)
    assert set(np.unique(m)) <= {0.0, -100.0}


def test_htsat_embedding_shape():
    model = HTSAT(cfg=TINY_AUDIO)
    wav = jax.random.normal(jax.random.PRNGKey(0), (2, TINY_AUDIO.clip_samples)) * 0.1
    params = model.init(jax.random.PRNGKey(1), wav)
    out = model.apply(params, wav)
    assert out["embedding"].shape == (2, TINY_AUDIO.num_features)
    assert out["clipwise_output"].shape == (2, TINY_AUDIO.num_classes)
    assert np.all(np.isfinite(np.asarray(out["embedding"])))


def test_roberta_shapes_and_mask():
    model = RobertaModel(cfg=TINY_TEXT)
    ids = jnp.array([[0, 5, 6, 2, 1, 1], [0, 7, 8, 9, 10, 2]], jnp.int32)
    mask = jnp.array([[1, 1, 1, 1, 0, 0], [1, 1, 1, 1, 1, 1]], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, mask)
    out = model.apply(params, ids, mask)
    assert out["pooler_output"].shape == (2, 32)
    # padding must not affect the pooled output
    ids2 = ids.at[0, 4].set(33)
    out2 = model.apply(params, ids2, mask)
    np.testing.assert_allclose(
        np.asarray(out["pooler_output"][0]), np.asarray(out2["pooler_output"][0]), atol=1e-5
    )


def test_bpe_tokenizer(tmp_path):
    vocab = {"<s>": 0, "<pad>": 1, "</s>": 2, "<unk>": 3}
    for i, tok in enumerate(["h", "e", "l", "o", "he", "ll", "hell", "Ġ", "Ġhe"]):
        vocab[tok] = 4 + i
    merges = [("h", "e"), ("l", "l"), ("he", "ll"), ("Ġ", "he")]
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "merges.txt").write_text(
        "#version\n" + "\n".join(f"{a} {b}" for a, b in merges)
    )
    tok = RobertaTokenizer.from_dir(str(tmp_path))
    enc = tok(["hell", "hello hell"], max_length=8)
    assert enc["input_ids"].shape == (2, 8)
    # 'hell' -> bos, hell, eos, pad...
    assert enc["input_ids"][0, 0] == 0 and enc["input_ids"][0, 1] == vocab["hell"]
    assert enc["input_ids"][0, 2] == 2 and enc["input_ids"][0, 3] == 1
    assert enc["attention_mask"][0].sum() == 3


def test_prepare_clap_audio_repeatpad():
    wav = jnp.ones((1, 1000))
    out = prepare_clap_audio(wav, 2500)
    assert out.shape == (1, 2500)
    np.testing.assert_array_equal(np.asarray(out[0, :2000]), 1.0)
    np.testing.assert_array_equal(np.asarray(out[0, 2000:]), 0.0)
    out2 = prepare_clap_audio(jnp.ones((1, 3000)), 2500)
    assert out2.shape == (1, 2500)


def test_int16_round_trip_matches_torch_semantics():
    x = jnp.array([[-1.5, -0.5, 0.0, 0.33333, 1.5]])
    out = np.asarray(int16_round_trip(x))
    expected = (np.clip(np.asarray(x), -1, 1) * 32767).astype(np.int16) / 32767.0
    np.testing.assert_allclose(out, expected.astype(np.float32), atol=1e-7)


def test_clap_quantized_tokenize_text():
    clap = CLAP(audio_cfg=TINY_AUDIO, text_cfg=TINY_TEXT, joint_embed_shape=16)
    ids = jnp.zeros((2, 6), jnp.int32)
    mask = jnp.ones((2, 6), jnp.int32)
    wav = jnp.zeros((1, TINY_AUDIO.clip_samples))
    params = clap.init(jax.random.PRNGKey(0), wav, ids, mask)
    rvq = rvq_init(num_quantizers=12, codebook_size=32, dim=16, key=jax.random.PRNGKey(1))
    cq = ClapQuantized(model=clap, params=params, rvq=rvq, codebook_size=32)
    toks = cq.tokenize_text(ids, mask)
    assert toks.shape == (2, 12, 1)
    assert int(toks.min()) >= 0 and int(toks.max()) < 32
    emb = cq.text_embedding(ids, mask)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=-1), 1.0, atol=1e-5)
    # jit variant (params as jit args, not closure constants) matches exactly
    np.testing.assert_array_equal(
        np.asarray(cq.tokenize_text_jit(ids, mask)), np.asarray(toks)
    )


def test_clap_audio_tokens():
    clap = CLAP(audio_cfg=TINY_AUDIO, text_cfg=TINY_TEXT, joint_embed_shape=16)
    ids = jnp.zeros((1, 6), jnp.int32)
    mask = jnp.ones((1, 6), jnp.int32)
    wav0 = jnp.zeros((1, TINY_AUDIO.clip_samples))
    params = clap.init(jax.random.PRNGKey(0), wav0, ids, mask)
    rvq = rvq_init(num_quantizers=12, codebook_size=32, dim=16, key=jax.random.PRNGKey(1))
    cq = ClapQuantized(model=clap, params=params, rvq=rvq, codebook_size=32)
    wav = jax.random.normal(jax.random.PRNGKey(2), (2, 3000)) * 0.1  # short -> repeatpad
    toks = jax.jit(cq.tokenize_audio)(wav)
    assert toks.shape == (2, 12, 1)
