"""musiclm_large: config parses by name (reference
configs/model/musiclm_large.json), and a scaled-down assembled pipeline test
— fusion CLAP (enable_fusion -> mel_fusion + `longer`) conditioning
remat-enabled stages trained with tp=2 on the CPU mesh, plus one windowed
generate through the MusicLM hierarchy."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_musiclm_tpu.config import load_model_config, load_training_config

REPO = Path(__file__).resolve().parents[1]


def test_musiclm_large_config_loads_by_name():
    mc = load_model_config(str(REPO / "configs/model/musiclm_large.json"))
    assert mc.clap_rvq_cfg.enable_fusion is True
    assert mc.semantic_cfg.depth == 24 and mc.semantic_cfg.heads == 16
    assert mc.coarse_cfg.depth == 24 and mc.fine_cfg.depth == 24
    # long-form window geometry (30 s / 10 s / 3 s)
    g = mc.global_cfg
    assert g.semantic_audio_length_seconds == 30.0
    assert g.coarse_audio_length_seconds == 10.0
    assert g.fine_audio_length_seconds == 3.0
    assert g.clap_audio_length_seconds == 30.0


def test_train_fma_preprocess_config_loads_by_name():
    tc = load_training_config(str(REPO / "configs/training/train_fma_preprocess.json"))
    assert tc.semantic_trainer_cfg.use_preprocessed_data is True
    assert tc.semantic_trainer_cfg.folder == "./data/fma_preprocessed"
    assert tc.data_preprocessor_cfg.results_folder == "./data/fma_preprocessed"
    assert tc.data_preprocessor_cfg.max_audio_length_seconds == 30
    assert tc.data_preprocessor_cfg.clap_batch_size == 32


def test_large_shape_pipeline_scaled_down():
    """The musiclm_large *structure* at toy scale: fusion CLAP conditioning,
    remat=True stages, a tp=2 train step matching the dp-only loss, and a
    multi-window generate — the pieces the large config turns on together."""
    from open_musiclm_tpu.core.sequence import TokenSequenceSpec
    from open_musiclm_tpu.models.clap.clap import CLAP, ClapQuantized
    from open_musiclm_tpu.models.encodec import EncodecModel
    from open_musiclm_tpu.models.musiclm import MusicLM
    from open_musiclm_tpu.models.rvq import rvq_init
    from open_musiclm_tpu.models.stages import (
        Stage,
        create_coarse_transformer,
        create_fine_transformer,
        create_semantic_transformer,
    )
    from open_musiclm_tpu.models.token_cond import StageLossConfig
    from open_musiclm_tpu.parallel.mesh import make_mesh
    from open_musiclm_tpu.train.trainer import StageTrainer
    from tests.test_fusion import fusion_cfg
    from tests.test_clap import TINY_TEXT
    from tests.test_musiclm import FakeTokenizer

    CB = 16
    N_CLAP_Q = 4

    # fusion CLAP (enable_fusion=True: mel_fusion stack + `longer` select)
    audio_cfg = fusion_cfg()
    clap_model = CLAP(audio_cfg=audio_cfg, text_cfg=TINY_TEXT, joint_embed_shape=16)
    ids = jnp.zeros((1, 8), jnp.int32)
    clap_params = clap_model.init(
        jax.random.PRNGKey(1),
        jnp.zeros((1, audio_cfg.clip_samples)),
        ids,
        jnp.ones_like(ids),
    )
    clap = ClapQuantized(
        model=clap_model,
        params=clap_params,
        rvq=rvq_init(N_CLAP_Q, CB, 16, jax.random.PRNGKey(2)),
        num_quantizers=N_CLAP_Q,
        codebook_size=CB,
        sample_rate=audio_cfg.sample_rate,
        clip_samples=audio_cfg.clip_samples,
    )
    # fusion audio tokenization end to end (the `longer` path musiclm_large
    # enables): a >clip_samples wave builds the 4-view mel stack
    wave = jax.random.normal(jax.random.PRNGKey(9), (1, audio_cfg.clip_samples * 2))
    toks = clap.tokenize_audio(wave)
    assert toks.shape == (1, N_CLAP_Q, 1)

    def make_stage(factory, key, **kw):
        model = factory(
            dim=32, depth=2, heads=2, dim_head=8,
            clap_codebook_size=CB, num_clap_quantizers=N_CLAP_Q,
            remat=True,  # musiclm_large runs 24L with remat
            **kw,
        )
        lens = [4 * s.num_quantizers for s in model.specs]
        params = model.init(key, [jnp.zeros((1, n), jnp.int32) for n in lens])
        weights = tuple(0.0 for _ in model.specs[:-1]) + (1.0,)
        return Stage(model, params, StageLossConfig(cross_entropy_loss_weights=weights))

    semantic = make_stage(
        create_semantic_transformer, jax.random.PRNGKey(4), semantic_codebook_size=CB
    )
    coarse = make_stage(
        create_coarse_transformer, jax.random.PRNGKey(5),
        semantic_codebook_size=CB, acoustic_codebook_size=CB, num_coarse_quantizers=2,
    )
    fine = make_stage(
        create_fine_transformer, jax.random.PRNGKey(6),
        acoustic_codebook_size=CB, num_coarse_quantizers=2, num_fine_quantizers=2,
    )

    # one tp=2 train step on the remat model, vs dp-only (loss parity)
    batch = (
        jax.random.randint(jax.random.PRNGKey(7), (1, 8, N_CLAP_Q), 0, CB),
        jax.random.randint(jax.random.PRNGKey(8), (1, 8, 4), 0, CB),
    )

    def one_loss(mesh):
        trainer = StageTrainer(
            model=semantic.model, loss_cfg=semantic.loss_cfg, lr=1e-3,
            grad_accum_every=1, mesh=mesh,
            results_folder="/tmp/large_shape_test", stage_name="sem",
        )
        lens = [4 * s.num_quantizers for s in semantic.model.specs]
        params = semantic.model.init(
            jax.random.PRNGKey(4), [jnp.zeros((1, n), jnp.int32) for n in lens]
        )
        state = trainer.init_state(params)
        _, loss = trainer.train_step(state, batch, jax.random.PRNGKey(10))
        return float(loss)

    tp_loss = one_loss(make_mesh(dp=4, tp=2))
    dp_loss = one_loss(make_mesh(dp=8, tp=1))
    np.testing.assert_allclose(tp_loss, dp_loss, rtol=2e-4)

    # windowed generate through the full hierarchy with the fusion CLAP
    codec = EncodecModel(
        sample_rate=60, ratios=(2, 2), num_quantizers=4, codebook_size=CB,
        dimension=8, n_filters=2,
    )
    codec_params = codec.init(jax.random.PRNGKey(3), jnp.zeros((1, 240)))
    m = MusicLM(
        clap=clap, codec=codec, codec_params=codec_params,
        semantic_stage=semantic, coarse_stage=coarse, fine_stage=fine,
        tokenizer=FakeTokenizer(),
    )
    wave_out = m.generate(
        key=jax.random.PRNGKey(0),
        text=["long-form fusion test"],
        output_seconds=3,           # > semantic window -> multi-window path
        semantic_window_seconds=2,
        coarse_window_seconds=1,
        fine_window_seconds=1,
        semantic_steps_per_second=10,
        acoustic_steps_per_second=15,
    )
    assert wave_out.ndim == 2 and wave_out.shape[0] == 1
    assert np.all(np.isfinite(np.asarray(wave_out)))


@pytest.mark.slow
def test_large_assembly_by_name():
    """load.py assembles the full musiclm_large config (random weights):
    24-layer d1024 stages + fusion CLAP + Encodec, shapes line up."""
    from open_musiclm_tpu.load import create_musiclm_from_config

    mc = load_model_config(str(REPO / "configs/model/musiclm_large.json"))
    m = create_musiclm_from_config(mc)
    assert m.semantic_stage.model.depth == 24
    assert m.coarse_stage.model.depth == 24
    assert m.fine_stage.model.depth == 24
    assert m.clap.model.audio_cfg.enable_fusion is True

    def count(p):
        return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(p))

    sem_params = count(m.semantic_stage.params)
    assert 200e6 < sem_params < 400e6, sem_params  # d1024 x 24L
