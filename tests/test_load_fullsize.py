"""Full-size assembly smoke: create_musiclm_from_config at the real
musiclm_small geometry (random weights) — validates every tower builds and
the parameter shapes line up end to end. Init-only (no generation)."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]


@pytest.mark.slow
def test_full_size_assembly():
    from open_musiclm_tpu.config import load_model_config
    from open_musiclm_tpu.load import create_musiclm_from_config

    mc = load_model_config(str(REPO / "configs/model/musiclm_small.json"))
    m = create_musiclm_from_config(mc)

    # stage geometry (SURVEY.md 2.4)
    assert m.semantic_stage.model.specs[0].num_quantizers == 12
    assert m.semantic_stage.model.specs[1].codebook_size == 1024
    assert m.coarse_stage.model.specs[2].num_quantizers == 3
    assert m.fine_stage.model.specs[2].num_quantizers == 5
    assert m.codec.num_quantizers == 8
    assert m.codec.frame_rate == 75
    assert m.wav2vec.codebook_size == 1024

    # parameter counts in the expected ballpark
    def count(p):
        return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(p))

    sem_params = count(m.semantic_stage.params)
    assert 60e6 < sem_params < 120e6, sem_params  # d1024 x 6L + embeddings
    clap_params = count(m.clap.params)
    assert 100e6 < clap_params < 300e6, clap_params  # HTSAT-tiny + RoBERTa-base

    # a tiny real call through the frozen quantizer path
    emb = jax.random.normal(jax.random.PRNGKey(0), (2, 512))
    toks = m.clap.quantize(emb)
    assert toks.shape == (2, 12, 1)
