"""CLAP arch preset registry: every reference model_configs/*.json audio
preset resolves by name (laion_clap factory.py:16-46 surface), and a
PANN-based CLAP assembles + embeds end to end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_musiclm_tpu.models.clap.htsat import HTSATConfig
from open_musiclm_tpu.models.clap.model_configs import (
    PANNConfig,
    audio_config_from_name,
    list_audio_presets,
)

REFERENCE_PRESETS = [
    "HTSAT-tiny", "HTSAT-base", "HTSAT-large", "HTSAT-tiny-win-1536",
    "PANN-14", "PANN-14-fmax-18k", "PANN-14-fmax-8k-20s",
    "PANN-14-win-1536", "PANN-14-tiny-transformer", "PANN-10", "PANN-6",
]


def test_all_reference_audio_presets_resolve():
    assert set(REFERENCE_PRESETS) <= set(list_audio_presets())
    for name in REFERENCE_PRESETS:
        cfg = audio_config_from_name(name)
        assert isinstance(cfg, (HTSATConfig, PANNConfig))


def test_htsat_size_geometry():
    tiny = audio_config_from_name("HTSAT-tiny")
    base = audio_config_from_name("HTSAT-base")
    large = audio_config_from_name("HTSAT-large")
    # reference htsat.py:985-1026
    assert (tiny.embed_dim, tiny.depths) == (96, (2, 2, 6, 2))
    assert (base.embed_dim, base.depths) == (128, (2, 2, 12, 2))
    assert (large.embed_dim, large.depths) == (256, (2, 2, 12, 2))
    assert tiny.num_features == 96 * 8  # 768-d HTSAT-tiny output
    win = audio_config_from_name("HTSAT-tiny-win-1536")
    assert win.window_size_fft == 1536 and win.embed_dim == 96


def test_pann_mel_geometry_variants():
    p20s = audio_config_from_name("PANN-14-fmax-8k-20s")
    assert (p20s.fmax, p20s.hop_size, p20s.clip_samples) == (8000.0, 360, 960000)
    p18k = audio_config_from_name("PANN-14-fmax-18k")
    assert p18k.fmax == 18000.0 and p18k.clip_samples == 480000
    assert audio_config_from_name("PANN-10").arch == "Cnn10"
    assert audio_config_from_name("PANN-6").arch == "Cnn6"


def test_full_presets_carry_embed_dim_and_text_cfg():
    """clap_config_from_name mirrors each JSON's embed_dim + text_cfg
    (model_configs/*.json), not just the audio geometry."""
    from open_musiclm_tpu.models.clap.model_configs import clap_config_from_name

    # per reference model_configs/*.json `embed_dim`
    expect_embed = {
        "HTSAT-tiny": 768, "HTSAT-base": 1024, "HTSAT-large": 2048,
        "HTSAT-tiny-win-1536": 768, "PANN-14": 2048,
        "PANN-14-fmax-18k": 2048, "PANN-14-fmax-8k-20s": 2048,
        "PANN-14-win-1536": 2048, "PANN-14-tiny-transformer": 2048,
        "PANN-10": 1024, "PANN-6": 512,
    }
    for name in REFERENCE_PRESETS:
        full = clap_config_from_name(name)
        assert full.embed_dim == expect_embed[name], name
        # every preset declares the 77-ctx CLIP text transformer ...
        assert (full.text_cfg.context_length, full.text_cfg.vocab_size) == (77, 49408)
        assert (full.text_cfg.width, full.text_cfg.heads) == (512, 8)
        # ... 12-layer except the tiny-transformer variant (its JSON:17-23)
        expected_layers = 4 if name == "PANN-14-tiny-transformer" else 12
        assert full.text_cfg.layers == expected_layers, name
        assert full.audio_cfg is not None


def test_tiny_transformer_preset_assembles_clip_text_tower():
    """The PANN-14-tiny-transformer preset's declared 4-layer CLIP text
    tower actually instantiates and embeds into the declared joint space."""
    from open_musiclm_tpu.models.clap.clip_text import ClipTextTransformer
    from open_musiclm_tpu.models.clap.model_configs import clap_config_from_name

    full = clap_config_from_name("PANN-14-tiny-transformer")
    tower = ClipTextTransformer(cfg=full.text_cfg, joint_embed_shape=full.embed_dim)
    ids = jnp.zeros((2, 77), jnp.int32)
    params = tower.init(jax.random.PRNGKey(0), ids)
    emb = tower.apply(params, ids)
    assert emb.shape == (2, 2048)


def test_unknown_preset_raises():
    with pytest.raises(KeyError):
        audio_config_from_name("ViT-B-32")  # CLIP-vision: not carried


def test_pann_clap_assembles_and_embeds():
    """CLAP with a PANN audio tower: wav -> joint 512-d embedding."""
    from open_musiclm_tpu.models.clap.clap import CLAP
    from tests.test_clap import TINY_TEXT

    cfg = audio_config_from_name("PANN-6")
    model = CLAP(audio_cfg=cfg, text_cfg=TINY_TEXT, joint_embed_shape=16)
    ids = jnp.zeros((1, 8), jnp.int32)
    wav = jax.random.normal(jax.random.PRNGKey(0), (1, 24000))
    params = model.init(jax.random.PRNGKey(1), wav, ids, jnp.ones_like(ids))
    emb = model.apply(params, wav, method=CLAP.get_audio_embedding)
    assert emb.shape == (1, 16)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=-1), 1.0, rtol=1e-5)


def test_amodel_type_threads_through_model_config():
    """config.py build_clap resolves clap_rvq_cfg.amodel_type by preset."""
    from open_musiclm_tpu.config import (
        ClapRVQConfig, EncodecConfig, GlobalConfig, HubertKmeansConfig,
        MusicLMModelConfig, SemanticConfig, CoarseConfig, FineConfig,
        build_clap,
    )

    mc = MusicLMModelConfig(
        clap_rvq_cfg=ClapRVQConfig(
            rq_num_quantizers=12, codebook_size=1024, amodel_type="HTSAT-base"
        ),
        hubert_kmeans_cfg=HubertKmeansConfig(model_name="x", normalize_embeds=True),
        encodec_cfg=EncodecConfig(bandwidth=6.0, codebook_size=1024),
        semantic_cfg=SemanticConfig(),
        coarse_cfg=CoarseConfig(),
        fine_cfg=FineConfig(),
        global_cfg=GlobalConfig(),
    )
    clap = build_clap(mc)
    assert clap.audio_cfg.embed_dim == 128
    assert clap.audio_cfg.depths == (2, 2, 12, 2)
