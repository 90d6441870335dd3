"""Qualitative training artifacts (reference trainer.py:481-526).

* ``save_predicted_tokens``: interleaved ground-truth / argmax-predicted
  token rows as a step-stamped text file;
* ``save_reconstructed_wave``: teacher-forced Encodec reconstructions —
  coarse stage decodes predicted coarse codes, fine stage decodes
  ground-truth coarse + predicted fine — capped at 4 examples.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..models.encodec import EncodecModel

MAX_ARTIFACT_EXAMPLES = 4


def save_predicted_tokens(
    logits: jnp.ndarray,  # [B, n, vocab] final-sequence logits
    labels: jnp.ndarray,  # [B, n]
    results_folder: str,
    stage: str,
    step: int,
) -> str:
    path = Path(results_folder) / f"{stage}.tokens.{step}.txt"
    pred = np.asarray(jnp.argmax(logits, axis=-1))
    lab = np.asarray(labels)
    with open(path, "w") as f:
        for b in range(min(pred.shape[0], MAX_ARTIFACT_EXAMPLES)):
            f.write(f"# example {b}\n")
            f.write("target:    " + " ".join(map(str, lab[b])) + "\n")
            f.write("predicted: " + " ".join(map(str, pred[b])) + "\n")
            acc = float((pred[b] == lab[b]).mean())
            f.write(f"accuracy:  {acc:.4f}\n\n")
    return str(path)


def save_reconstructed_wave(
    stage: str,
    pred_tokens: jnp.ndarray,  # [B, n] flattened predicted final-seq tokens
    cond_tokens: Optional[jnp.ndarray],  # fine stage: ground-truth coarse [B, n]
    codec: EncodecModel,
    codec_params,
    num_coarse_quantizers: int,
    num_fine_quantizers: int,
    results_folder: str,
    step: int,
):
    """Returns (written wav paths, waves [b, T]), or None for the semantic
    stage. The waves are returned so trackers can log them as audio
    (reference wandb audio artifacts, trainer.py:524-526)."""
    from ..data.audio_io import write_wav

    if stage == "semantic":
        return None
    b = min(pred_tokens.shape[0], MAX_ARTIFACT_EXAMPLES)
    if stage == "coarse":
        q = num_coarse_quantizers
        codes = pred_tokens[:b].reshape(b, -1, q)
        codes = jnp.clip(codes, 0, codec.codebook_size - 1)
    else:  # fine: ground-truth coarse + predicted fine
        qc, qf = num_coarse_quantizers, num_fine_quantizers
        coarse = cond_tokens[:b].reshape(b, -1, qc)
        fine = pred_tokens[:b].reshape(b, -1, qf)
        T = min(coarse.shape[1], fine.shape[1])
        codes = jnp.concatenate([coarse[:, :T], fine[:, :T]], axis=-1)
        codes = jnp.clip(codes, 0, codec.codebook_size - 1)
    waves = codec.apply(codec_params, codes, method=EncodecModel.decode)
    paths = []
    for i in range(b):
        p = Path(results_folder) / f"{stage}.recon.{step}.{i}.wav"
        write_wav(str(p), np.asarray(waves[i]), codec.sample_rate)
        paths.append(str(p))
    return paths, waves
