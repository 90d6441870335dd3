"""Tokenizer trainers + on-the-fly tokenization pipeline tests (tiny models)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_musiclm_tpu.data.pipeline import accumulate_token_batches, tokenizing_iterator
from open_musiclm_tpu.models.clap.clap import CLAP, ClapQuantized
from open_musiclm_tpu.models.encodec import EncodecModel
from open_musiclm_tpu.models.hubert import HubertConfig, HubertModel, HubertWithKmeans
from open_musiclm_tpu.models.rvq import rvq_init
from open_musiclm_tpu.train.tokenizer_trainers import ClapRVQTrainer, HubertKmeansTrainer
from tests.test_clap import TINY_AUDIO, TINY_TEXT


@pytest.fixture(scope="module")
def tiny_tokenizers():
    clap_model = CLAP(audio_cfg=TINY_AUDIO, text_cfg=TINY_TEXT, joint_embed_shape=16)
    ids = jnp.zeros((1, 8), jnp.int32)
    clap_params = clap_model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, TINY_AUDIO.clip_samples)), ids, jnp.ones_like(ids)
    )
    clap = ClapQuantized(
        model=clap_model, params=clap_params,
        rvq=rvq_init(4, 16, 16, jax.random.PRNGKey(1)),
        num_quantizers=4, codebook_size=16,
        sample_rate=TINY_AUDIO.sample_rate, clip_samples=TINY_AUDIO.clip_samples,
    )
    hcfg = HubertConfig(
        conv_dim=(16,) * 7, hidden_size=32, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=64,
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        conv_kernel=(4, 3, 2, 2, 1, 1, 1), conv_stride=(2, 2, 2, 2, 1, 1, 1),
    )
    hmodel = HubertModel(cfg=hcfg)
    hparams = hmodel.init(jax.random.PRNGKey(2), jnp.zeros((1, 64)))
    wav2vec = HubertWithKmeans(
        hmodel, hparams,
        jnp.asarray(np.random.RandomState(0).randn(16, 32).astype(np.float32)),
        embed_layer=1, target_sample_hz=160, seq_len_multiple_of=16, output_hz=10,
    )
    codec = EncodecModel(
        sample_rate=240, ratios=(4, 4), num_quantizers=8, codebook_size=16,
        dimension=8, n_filters=2,
    )
    codec_params = codec.init(jax.random.PRNGKey(3), jnp.zeros((1, 480)))
    return clap, wav2vec, codec, codec_params


def audio_batches(stage, n_views, batch=2):
    rng = np.random.RandomState(0)
    lens = {"semantic": (1600, 320), "coarse": (1600, 320, 480), "fine": (1600, 480)}[stage]
    while True:
        yield tuple(
            (0.1 * rng.randn(batch, L)).astype(np.float32) for L in lens
        )


@pytest.mark.parametrize("stage,n_seqs", [("semantic", 2), ("coarse", 3), ("fine", 3)])
def test_tokenizing_iterator(tiny_tokenizers, stage, n_seqs):
    clap, wav2vec, codec, codec_params = tiny_tokenizers
    it = tokenizing_iterator(
        stage, audio_batches(stage, n_seqs), clap, wav2vec, codec, codec_params,
        num_coarse_quantizers=3, accum=2,
    )
    batch = next(it)
    assert len(batch) == n_seqs
    for b in batch:
        assert b.shape[0] == 2 and b.shape[1] == 2  # [accum, B, n]
        assert b.dtype == jnp.int32
    assert batch[0].shape[-1] == 4  # clap quantizers


def test_accumulate_token_batches():
    def gen():
        while True:
            yield (np.zeros((2, 5), np.int32), np.ones((2, 7), np.int32))

    it = accumulate_token_batches(gen(), 3)
    b = next(it)
    assert b[0].shape == (3, 2, 5) and b[1].shape == (3, 2, 7)


def test_clap_rvq_trainer(tiny_tokenizers, tmp_path):
    clap, *_ = tiny_tokenizers
    rng = np.random.RandomState(0)

    def audio_iter():
        while True:
            yield (0.1 * rng.randn(4, 2000)).astype(np.float32)

    trainer = ClapRVQTrainer(
        clap=clap, results_folder=str(tmp_path),
        num_train_steps=3, accumulate_batches=2,
        save_model_every=2, save_results_every=1,
    )
    logs = []
    state = trainer.train(
        audio_iter(), jax.random.PRNGKey(0), log=lambda **kw: logs.append(kw)
    )
    assert bool(state.initted)
    assert any("rvq_mse" in l for l in logs)
    assert (tmp_path / "clap.rvq.2.ckpt").exists()


def test_hubert_kmeans_trainer(tiny_tokenizers, tmp_path):
    _, wav2vec, *_ = tiny_tokenizers
    rng = np.random.RandomState(0)

    def audio_iter():
        while True:
            yield (0.1 * rng.randn(2, 320)).astype(np.float32)

    trainer = HubertKmeansTrainer(
        hubert_kmeans=wav2vec, results_folder=str(tmp_path),
        feature_extraction_num_steps=4, n_clusters=8, fit_batch_size=16,
    )
    centroids = trainer.train(audio_iter(), jax.random.PRNGKey(0))
    assert centroids.shape == (8, 32)
    assert (tmp_path / "kmeans.ckpt").exists()
    # the bound wav2vec now uses the new codebook
    ids = wav2vec(jnp.zeros((1, 320)))
    assert int(ids.max()) < 8
