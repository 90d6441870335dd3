"""On-the-fly tokenization pipeline for stage training from raw audio.

Reference equivalent: SemanticStage/CoarseStage/FineStage.forward computing
clap/semantic/acoustic token ids from raw waves inside the train step
(open_musiclm.py:585-602, 683-712, 787-814 via trainer ds_fields,
trainer.py:173-216). Here the frozen tokenizers run as their own jitted
programs over each host batch — on device, fixed shapes, no sklearn/CPU
escape — and the stage trainer consumes pure token batches.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.clap.clap import ClapQuantized
from ..models.encodec import EncodecModel
from ..models.hubert import HubertWithKmeans


def stage_ds_config(stage: str, clap, wav2vec, codec, global_cfg):
    """Per-stage SoundDataset view configuration (trainer.py:173-216)."""
    sem_s = global_cfg.semantic_audio_length_seconds
    coarse_s = global_cfg.coarse_audio_length_seconds
    fine_s = global_cfg.fine_audio_length_seconds
    if stage == "semantic":
        return dict(
            max_length_seconds=(sem_s, sem_s),
            target_sample_hz=(clap.sample_rate, wav2vec.target_sample_hz),
            normalize=(False, True),
            seq_len_multiple_of=(None, wav2vec.seq_len_multiple_of),
        )
    if stage == "coarse":
        return dict(
            max_length_seconds=(sem_s, coarse_s, coarse_s),
            target_sample_hz=(
                clap.sample_rate, wav2vec.target_sample_hz, codec.sample_rate
            ),
            normalize=(False, True, False),
            seq_len_multiple_of=(None, wav2vec.seq_len_multiple_of, None),
        )
    if stage == "fine":
        return dict(
            max_length_seconds=(sem_s, fine_s),
            target_sample_hz=(clap.sample_rate, codec.sample_rate),
            normalize=(False, False),
            seq_len_multiple_of=(None, None),
        )
    raise ValueError(stage)


def tokenizing_iterator(
    stage: str,
    audio_batches: Iterator[Tuple[np.ndarray, ...]],
    clap: ClapQuantized,
    wav2vec: HubertWithKmeans,
    codec: EncodecModel,
    codec_params,
    num_coarse_quantizers: int = 3,
    accum: int = 1,
) -> Iterator[Tuple[jnp.ndarray, ...]]:
    """Yields flattened token batches [accum, B, n_i] for StageTrainer."""
    tok_clap = jax.jit(clap.tokenize_audio)
    tok_sem = jax.jit(wav2vec.__call__)
    tok_codes = jax.jit(
        lambda w: codec.apply(codec_params, w, method=EncodecModel.encode)
    )

    def tokenize(batch):
        if stage == "semantic":
            wav_clap, wav_sem = batch
            clap_ids = tok_clap(jnp.asarray(wav_clap))[..., 0]
            sem_ids = tok_sem(jnp.asarray(wav_sem))
            return (clap_ids.astype(jnp.int32), sem_ids.astype(jnp.int32))
        if stage == "coarse":
            wav_clap, wav_sem, wav_ac = batch
            clap_ids = tok_clap(jnp.asarray(wav_clap))[..., 0]
            sem_ids = tok_sem(jnp.asarray(wav_sem))
            codes = tok_codes(jnp.asarray(wav_ac))
            coarse = codes[..., :num_coarse_quantizers]
            b = coarse.shape[0]
            return (
                clap_ids.astype(jnp.int32),
                sem_ids.astype(jnp.int32),
                coarse.reshape(b, -1).astype(jnp.int32),
            )
        if stage == "fine":
            wav_clap, wav_ac = batch
            clap_ids = tok_clap(jnp.asarray(wav_clap))[..., 0]
            codes = tok_codes(jnp.asarray(wav_ac))
            coarse = codes[..., :num_coarse_quantizers]
            fine = codes[..., num_coarse_quantizers:]
            b = coarse.shape[0]
            return (
                clap_ids.astype(jnp.int32),
                coarse.reshape(b, -1).astype(jnp.int32),
                fine.reshape(b, -1).astype(jnp.int32),
            )
        raise ValueError(stage)

    while True:
        micro = [tokenize(next(audio_batches)) for _ in range(accum)]
        yield tuple(jnp.stack([m[i] for m in micro]) for i in range(len(micro[0])))


def accumulate_token_batches(
    token_batches: Iterator[Tuple[np.ndarray, ...]], accum: int
) -> Iterator[Tuple[jnp.ndarray, ...]]:
    """Stack `accum` already-tokenized batches into [accum, B, n] arrays."""
    while True:
        micro = [next(token_batches) for _ in range(accum)]
        yield tuple(
            jnp.stack([jnp.asarray(m[i], jnp.int32) for m in micro])
            for i in range(len(micro[0]))
        )
