"""Full-pipeline MusicLM test with tiny components: text -> clap tokens ->
sliding-window semantic -> coarse -> fine -> Encodec decode, plus
top-match reranking."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_musiclm_tpu.core.sequence import TokenSequenceSpec
from open_musiclm_tpu.models.musiclm import unfold_windows
from open_musiclm_tpu.testing import (
    CB,
    N_CLAP_Q,
    FakeTokenizer,
    make_tiny_stage as make_stage,
    tiny_musiclm as build_tiny_musiclm,
)


@pytest.fixture(scope="module")
def tiny_musiclm():
    return build_tiny_musiclm()


def test_unfold_windows():
    x = jnp.arange(20).reshape(1, 20, 1)
    w = unfold_windows(x, 9, 4)
    assert w.shape == (3, 1, 9, 1)
    np.testing.assert_array_equal(np.asarray(w[1, 0, :, 0]), np.arange(4, 13))


from open_musiclm_tpu.testing import TINY_GEN_KW as GEN_KW  # noqa: E402


def test_text_to_music_end_to_end(tiny_musiclm):
    wave = tiny_musiclm.generate(
        key=jax.random.PRNGKey(0), text=["warm synth chords"], **GEN_KW
    )
    assert wave.ndim == 2 and wave.shape[0] == 1
    # acoustic length: coarse stitched to 15+8*n windows, aligned with fine
    assert wave.shape[1] % 4 == 0  # hop multiple
    assert wave.shape[1] >= 30 * 4  # at least target acoustic frames * hop
    assert np.all(np.isfinite(np.asarray(wave)))


def test_coarse_only_wave(tiny_musiclm):
    wave = tiny_musiclm.generate(
        key=jax.random.PRNGKey(1),
        text=["drum loop"],
        return_coarse_generated_wave=True,
        **GEN_KW,
    )
    assert wave.ndim == 2 and np.all(np.isfinite(np.asarray(wave)))


def test_generate_top_match(tiny_musiclm):
    samples, sims = tiny_musiclm.generate_top_match(
        key=jax.random.PRNGKey(2),
        text=["piano", "guitar"],
        num_samples=2,
        num_top_matches=1,
        **GEN_KW,
    )
    assert len(samples) == 2 and len(sims) == 2
    assert samples[0].shape[0] == 1
    assert sims[0].shape == (1,)
    assert float(sims[0][0]) <= 1.0 + 1e-5


def test_prime_wave_continuation(tiny_musiclm):
    from open_musiclm_tpu.models.hubert import HubertConfig, HubertModel, HubertWithKmeans
    import dataclasses

    hcfg = HubertConfig(
        conv_dim=(16,) * 7,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=64,
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        conv_kernel=(4, 3, 2, 2, 1, 1, 1),
        conv_stride=(2, 2, 2, 2, 1, 1, 1),
    )
    hmodel = HubertModel(cfg=hcfg)
    hparams = hmodel.init(jax.random.PRNGKey(0), jnp.zeros((1, 64)))
    wav2vec = HubertWithKmeans(
        hmodel,
        hparams,
        jax.random.normal(jax.random.PRNGKey(1), (CB, 32)),
        embed_layer=1,
        target_sample_hz=160,  # 10 Hz tokens at stride 16
        seq_len_multiple_of=16,
        output_hz=10,
    )
    m = dataclasses.replace(tiny_musiclm, wav2vec=wav2vec)
    prime = jax.random.normal(jax.random.PRNGKey(3), (1, 320)) * 0.1  # 2 s at 160 Hz
    wave = m.generate(
        key=jax.random.PRNGKey(4),
        text=["continuation"],
        prime_wave=prime,
        prime_wave_sample_hz=160,
        **GEN_KW,
    )
    assert wave.ndim == 2 and np.all(np.isfinite(np.asarray(wave)))


def test_overlapping_fine_windows_continuation(tiny_musiclm):
    """fine_sliding_window_step_percent < 1 exercises the sequential fine
    loop with continuation prefixes (reference open_musiclm.py:1002-1023)."""
    wave = tiny_musiclm.generate(
        key=jax.random.PRNGKey(5),
        text=["overlapping fine"],
        output_seconds=3,
        semantic_window_seconds=2,
        coarse_window_seconds=1,
        fine_window_seconds=1,
        semantic_steps_per_second=10,
        acoustic_steps_per_second=16,
        fine_sliding_window_step_percent=0.5,
    )
    assert wave.ndim == 2 and np.all(np.isfinite(np.asarray(wave)))


def test_custom_sliding_percent_coarse(tiny_musiclm):
    wave = tiny_musiclm.generate(
        key=jax.random.PRNGKey(6),
        text=["custom overlap"],
        output_seconds=3,
        semantic_window_seconds=2,
        coarse_window_seconds=1,
        fine_window_seconds=1,
        semantic_steps_per_second=10,
        acoustic_steps_per_second=16,
        coarse_sliding_window_step_percent=0.75,
    )
    assert wave.ndim == 2 and np.all(np.isfinite(np.asarray(wave)))


def test_generate_shorter_than_coarse_window_raises():
    """output_seconds < coarse window would unfold zero windows — must fail
    with a clear error instead of a NoneType crash."""
    from open_musiclm_tpu.models.musiclm import MusicLM

    m = MusicLM(
        clap=None, codec=None, codec_params=None,
        semantic_stage=None, coarse_stage=None, fine_stage=None,
    )
    with pytest.raises(ValueError, match="coarse"):
        m.generate(
            key=jax.random.PRNGKey(0),
            clap_token_ids=jnp.zeros((1, 12, 1), jnp.int32),
            output_seconds=2,
            coarse_window_seconds=4,
        )


def test_codec_decode_batch_chunking_exact(tiny_musiclm, monkeypatch):
    """The final Encodec decode chunks its batch to cap HBM (an unchunked
    32-row x 48 s musiclm_large clip needs 27.5 G on a 16 G v5e,
    .lanes/large_longform_r5.err). Rows are independent through the SEANet
    decoder, so any cap must reproduce the unchunked waveform exactly."""
    codes = jax.random.randint(jax.random.PRNGKey(3), (5, 12, 8), 0, 16)
    full = np.asarray(tiny_musiclm._decode(tiny_musiclm.codec_params, codes))
    # cap of 2*T forces ceil(5/2) = 3 chunks incl. a ragged tail
    monkeypatch.setenv("OPEN_MUSICLM_MAX_DECODE_FRAMES", str(2 * codes.shape[1]))
    chunked = np.asarray(tiny_musiclm._decode(tiny_musiclm.codec_params, codes))
    np.testing.assert_array_equal(full, chunked)


def test_codec_decode_stem_head_split_exact(tiny_musiclm):
    """decode == decode_head(decode_stem(codes)): the chunked _decode path
    runs the sequential LSTM stem once for the whole batch and chunks only
    the row-independent upsampling head, so the split must reproduce the
    monolithic decode exactly."""
    from open_musiclm_tpu.models.encodec import EncodecModel

    codec, params = tiny_musiclm.codec, tiny_musiclm.codec_params
    codes = jax.random.randint(jax.random.PRNGKey(9), (3, 12, 8), 0, 16)
    mono = codec.apply(params, codes, method=EncodecModel.decode)
    h = codec.apply(params, codes, method=EncodecModel.decode_stem)
    split = codec.apply(params, h, method=EncodecModel.decode_head)
    np.testing.assert_array_equal(np.asarray(mono), np.asarray(split))
