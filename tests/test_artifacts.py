"""Artifact dump tests: token text files and teacher-forced reconstructions."""

import jax
import jax.numpy as jnp
import numpy as np

from open_musiclm_tpu.models.encodec import EncodecModel
from open_musiclm_tpu.train.artifacts import (
    save_predicted_tokens,
    save_reconstructed_wave,
)


def test_save_predicted_tokens(tmp_path):
    logits = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 10))
    labels = jnp.argmax(logits, axis=-1)  # perfect predictions
    path = save_predicted_tokens(logits, labels, str(tmp_path), "semantic", 5)
    text = open(path).read()
    assert "accuracy:  1.0000" in text
    assert "example 1" in text


def test_save_reconstructed_wave_coarse_and_fine(tmp_path):
    codec = EncodecModel(
        sample_rate=240, ratios=(4, 4), num_quantizers=8, codebook_size=16,
        dimension=8, n_filters=2,
    )
    params = codec.init(jax.random.PRNGKey(0), jnp.zeros((1, 480)))
    coarse_flat = jax.random.randint(jax.random.PRNGKey(1), (2, 10 * 3), 0, 16)
    fine_flat = jax.random.randint(jax.random.PRNGKey(2), (2, 10 * 5), 0, 16)

    paths, waves = save_reconstructed_wave(
        "coarse", coarse_flat, None, codec, params, 3, 5, str(tmp_path), 7
    )
    assert len(paths) == 2 and all(p.endswith(".wav") for p in paths)
    assert waves.shape[0] == 2

    paths, waves = save_reconstructed_wave(
        "fine", fine_flat, coarse_flat, codec, params, 3, 5, str(tmp_path), 7
    )
    assert len(paths) == 2 and waves.shape[0] == 2

    assert save_reconstructed_wave(
        "semantic", coarse_flat, None, codec, params, 3, 5, str(tmp_path), 7
    ) is None
