"""Data layer tests: native WAV I/O, multi-rate nested crops, token store,
offline preprocessing end-to-end with tiny tokenizers, aligned crops,
threaded batch iterator."""

import numpy as np
import pytest

from open_musiclm_tpu.data.audio_io import read_wav, write_wav
from open_musiclm_tpu.data.dataset import (
    PreprocessedDataset,
    SoundDataset,
    SoundDatasetForPreprocessing,
    batch_iterator,
    pad_to_longest,
    train_valid_split,
)
from open_musiclm_tpu.data.tokenstore import ShardedTokenStore, TokenStore, writer_for_rank


@pytest.fixture(scope="module")
def wav_folder(tmp_path_factory):
    folder = tmp_path_factory.mktemp("wavs")
    rng = np.random.RandomState(0)
    for i, seconds in enumerate([2.0, 3.5, 1.2]):
        sr = 8000
        sig = (0.3 * rng.randn(int(sr * seconds))).astype(np.float32)
        write_wav(str(folder / f"track_{i}.wav"), sig, sr)
    return str(folder)


def test_wav_roundtrip(tmp_path):
    sig = (0.5 * np.sin(np.linspace(0, 200, 8000))).astype(np.float32)
    write_wav(str(tmp_path / "x.wav"), sig, 8000)
    back, sr = read_wav(str(tmp_path / "x.wav"))
    assert sr == 8000
    np.testing.assert_allclose(back, sig, atol=1e-4)


def test_sound_dataset_multirate_views(wav_folder):
    ds = SoundDataset(
        folder=wav_folder,
        max_length_seconds=(2.0, 1.0, 1.0),
        normalize=(False, True, False),
        target_sample_hz=(8000, 4000, 6000),
        seq_len_multiple_of=(None, 320, None),
        seed=1,
    )
    views = ds[0]
    assert len(views) == 3
    assert views[0].shape == (16000,)
    assert views[1].shape[0] % 320 == 0 and views[1].shape[0] <= 4000
    assert views[2].shape == (6000,)
    # normalized view roughly unit variance
    assert 0.5 < views[1].std() < 2.0
    # non-normalized views are int16-quantized
    q = np.round(views[0] * 32767.0)
    np.testing.assert_allclose(q, views[0] * 32767.0, atol=1e-3)


def test_sound_dataset_short_file_pads(wav_folder):
    ds = SoundDataset(
        folder=wav_folder,
        max_length_seconds=(5.0,),
        normalize=(False,),
        target_sample_hz=(8000,),
        seq_len_multiple_of=(None,),
    )
    v = ds[2]  # 1.2 s file -> padded to 5 s
    assert v.shape == (40000,)


def test_preprocessing_dataset_whole_track(wav_folder):
    ds = SoundDatasetForPreprocessing(
        folder=wav_folder,
        pad_to_seconds=2,
        max_length_seconds=(None, None),
        normalize=(False, True),
        target_sample_hz=(8000, 4000),
        seq_len_multiple_of=(None, None),
    )
    item = ds[2]  # 1.2 s -> repeat-pad to 2 s
    assert item is not None
    assert item["data"][0].shape == (16000,)
    assert item["data"][1].shape == (8000,)


def test_tokenstore_roundtrip_and_shards(tmp_path):
    w0 = writer_for_rank(str(tmp_path), 0, 2)
    w1 = writer_for_rank(str(tmp_path), 1, 2)
    clap = np.arange(12, dtype=np.uint16).reshape(4, 3)
    sem = np.arange(20, dtype=np.uint16).reshape(1, 20)
    coarse = np.zeros((1, 10, 3), np.uint16)
    fine = np.ones((1, 10, 5), np.uint16)
    w0.put(0, "a.wav", clap, sem, coarse, fine)
    w1.put(1, "b.wav", clap + 1, sem, coarse, fine)
    assert w0.has(0) and not w0.has(1)

    reader = ShardedTokenStore(str(tmp_path))
    assert len(reader) == 2
    got = reader.get(0, ("clap", "semantic", "coarse", "fine"))
    np.testing.assert_array_equal(got[0], clap)
    assert got[2].shape == (1, 10, 3)


def make_token_db(tmp_path, n_tracks=3, seconds=12):
    """Synthesize a preprocessed db with consistent geometry."""
    store = writer_for_rank(str(tmp_path), 0, 1)
    rng = np.random.RandomState(0)
    sem_hz, ac_hz, win = 50, 75, 10
    for i in range(n_tracks):
        W = seconds - win + 1
        clap = rng.randint(0, 100, (W, 12, 1)).astype(np.uint16)
        sem = rng.randint(0, 100, (1, seconds * sem_hz - 1)).astype(np.uint16)
        coarse = rng.randint(0, 100, (1, seconds * ac_hz, 3)).astype(np.uint16)
        fine = rng.randint(0, 100, (1, seconds * ac_hz, 5)).astype(np.uint16)
        store.put(i, f"t{i}.wav", clap, sem, coarse, fine)
    return store


@pytest.mark.parametrize("stage,widths", [
    ("semantic", (12, 499)),
    ("coarse", (12, 199, 300 * 3)),
    ("fine", (12, 150 * 3, 150 * 5)),
])
def test_preprocessed_dataset_crops(tmp_path, stage, widths):
    make_token_db(tmp_path)
    ds = PreprocessedDataset(folder=str(tmp_path), stage=stage)
    item = ds[0]
    assert len(item) == len(widths)
    flat = [np.asarray(x).reshape(-1) for x in item]
    for f, w in zip(flat, widths):
        assert f.shape[0] == w, (stage, [x.shape for x in item])


def test_batch_iterator_flattens(tmp_path):
    make_token_db(tmp_path)
    ds = PreprocessedDataset(folder=str(tmp_path), stage="semantic")
    it = batch_iterator(ds, batch_size=4, num_workers=2, seed=0)
    batch = next(it)
    assert batch[0].shape == (4, 12)
    assert batch[1].shape == (4, 499)


def test_train_valid_split():
    tr, va = train_valid_split(100, 0.05)
    assert len(tr) == 95 and len(va) == 5
    assert set(tr) | set(va) == set(range(100))


def test_preprocessor_end_to_end(tmp_path, wav_folder):
    import jax
    import jax.numpy as jnp

    from open_musiclm_tpu.data.preprocess import DataPreprocessor
    from open_musiclm_tpu.models.clap.clap import CLAP, ClapQuantized
    from open_musiclm_tpu.models.encodec import EncodecModel
    from open_musiclm_tpu.models.hubert import HubertConfig, HubertModel, HubertWithKmeans
    from open_musiclm_tpu.models.rvq import rvq_init
    from tests.test_clap import TINY_AUDIO, TINY_TEXT

    clap_model = CLAP(audio_cfg=TINY_AUDIO, text_cfg=TINY_TEXT, joint_embed_shape=16)
    ids = np.zeros((1, 8), np.int32)
    clap_params = clap_model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, TINY_AUDIO.clip_samples)),
        jnp.asarray(ids),
        jnp.ones_like(jnp.asarray(ids)),
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
        hmodel, hparams, np.random.RandomState(0).randn(16, 32).astype(np.float32),
        embed_layer=1, target_sample_hz=160, seq_len_multiple_of=16, output_hz=10,
    )
    codec = EncodecModel(
        sample_rate=240, ratios=(4, 4), num_quantizers=8, codebook_size=16,
        dimension=8, n_filters=2,
    )
    codec_params = codec.init(jax.random.PRNGKey(3), jnp.zeros((1, 480)))

    # clap window = 1 s at the tiny clip length: use clip_samples/sr seconds
    pre = DataPreprocessor(
        clap=clap, wav2vec=wav2vec, codec=codec, codec_params=codec_params,
        folder=wav_folder, results_folder=str(tmp_path),
        max_audio_length_seconds=4,
        clap_audio_length_seconds=1, semantic_audio_length_seconds=1,
        clap_batch_size=4,
    )
    # patch the clap window to the tiny tower's clip length (< 1 s real audio)
    n = pre.process()
    assert n >= 1
    reader = ShardedTokenStore(str(tmp_path))
    clap_t, sem_t, coarse_t, fine_t = reader.get(0, ("clap", "semantic", "coarse", "fine"))
    assert clap_t.shape[1] == 4  # rvq quantizers
    assert coarse_t.shape[-1] == 3 and fine_t.shape[-1] == 5
    assert sem_t.ndim == 2


def test_fma_ignore_files(tmp_path):
    from open_musiclm_tpu.data.fma import fma_ignore_files

    csv_text = (
        ",album,track,track,track\n"
        "track_id,title,genres_all,listens,favorites\n"
        "1,a,\"[38, 2]\",500,1\n"       # experimental + low listens -> ignored
        "2,b,\"[38]\",5000,100\n"        # experimental but popular -> kept
        "3,c,\"[10]\",10,0\n"            # not experimental -> kept
        "4,d,\"[1, 38]\",2000,3\n"       # experimental + low favorites -> ignored
    )
    (tmp_path / "tracks.csv").write_text(csv_text)
    ignore = fma_ignore_files(str(tmp_path))
    assert ignore == ["000001.mp3", "000004.mp3"]
