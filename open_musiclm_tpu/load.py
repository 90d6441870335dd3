"""Inference-model assembly from checkpoints.

TPU-native counterpart of reference ``create_musiclm_from_config``
(config.py:427-454): loads the five artifacts (semantic/coarse/fine stage
weights, CLAP RVQ, semantic k-means) plus the frozen towers (CLAP bundle,
MERT/HuBERT, Encodec) and assembles a ``MusicLM``.

Every path auto-detects its format: an orbax checkpoint directory produced by
this framework, or a torch artifact (``.pt`` state dict / HF ``.bin`` /
joblib) converted through import_torch.py. A missing optional path yields
randomly initialized weights (useful for benchmarks and smoke tests).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import import_torch as it
from .checkpoint import load_checkpoint
from .config import (
    MusicLMModelConfig,
    build_clap,
    build_encodec,
    build_hubert,
    init_stage,
    stage_example_lengths,
)
from .models.clap.clap import ClapQuantized
from .models.clap.htsat import HTSATConfig
from .models.clap.roberta import RobertaConfig
from .models.clap.tokenizer import load_tokenizer
from .models.hubert import HubertWithKmeans
from .models.musiclm import MusicLM
from .models.rvq import RVQState, rvq_init
from .models.stages import Stage


def _is_orbax(path: str) -> bool:
    return Path(path).is_dir()


def load_stage_params(path: str, model) -> Any:
    """Stage weights from an orbax dir (ours) or a torch .pt (reference)."""
    if _is_orbax(path):
        tree = load_checkpoint(path)
        if "params" in tree:  # TrainState checkpoint
            inner = tree["params"]
            return inner if "params" in inner else {"params": inner}
        return tree
    sd = it.load_torch_state_dict(path)
    return it.import_stage_transformer(sd, model)


def load_stage(
    mc: MusicLMModelConfig,
    stage_name: str,
    path: Optional[str],
    key: jax.Array,
    dtype=jnp.float32,
) -> Stage:
    stage = init_stage(mc, stage_name, key, dtype=dtype)
    if path is not None:
        params = load_stage_params(path, stage.model)
        params = jax.tree_util.tree_map(jnp.asarray, params)
        stage = Stage(stage.model, params, stage.loss_cfg, name=stage_name)
    return stage


def load_rvq(path: Optional[str], mc: MusicLMModelConfig, key: jax.Array) -> RVQState:
    if path is None:
        return rvq_init(
            mc.clap_rvq_cfg.rq_num_quantizers, mc.clap_rvq_cfg.codebook_size, 512, key
        )
    if _is_orbax(path):
        tree = load_checkpoint(path)
        return RVQState(
            codebooks=jnp.asarray(tree["codebooks"]),
            cluster_size=jnp.asarray(tree["cluster_size"]),
            embed_avg=jnp.asarray(tree["embed_avg"]),
            initted=jnp.asarray(tree["initted"]),
        )
    return it.import_rvq(it.load_torch_state_dict(path))


def load_kmeans(path: Optional[str], mc: MusicLMModelConfig, key: jax.Array) -> np.ndarray:
    if path is None:
        return np.asarray(
            jax.random.normal(key, (mc.hubert_kmeans_cfg.codebook_size, 768))
        )
    if _is_orbax(path):
        return np.asarray(load_checkpoint(path)["centroids"])
    return it.import_kmeans_joblib(path)


def create_musiclm_from_config(
    mc: MusicLMModelConfig,
    *,
    semantic_path: Optional[str] = None,
    coarse_path: Optional[str] = None,
    fine_path: Optional[str] = None,
    rvq_path: Optional[str] = None,
    kmeans_path: Optional[str] = None,
    clap_path: Optional[str] = None,
    hubert_path: Optional[str] = None,
    encodec_path: Optional[str] = None,
    tokenizer_path: Optional[str] = None,
    dtype=jnp.float32,
    seed: int = 0,
) -> MusicLM:
    key = jax.random.PRNGKey(seed)
    keys = jax.random.split(key, 8)

    # frozen towers
    clap_model = build_clap(mc, dtype=dtype)
    if clap_path is not None:
        clap_params = it.import_clap(
            it.load_torch_state_dict(clap_path), HTSATConfig(), RobertaConfig()
        )
        clap_params = jax.tree_util.tree_map(jnp.asarray, clap_params)
    else:
        ids = jnp.zeros((1, 8), jnp.int32)
        clap_params = clap_model.init(
            keys[0], jnp.zeros((1, 480000)), ids, jnp.ones_like(ids)
        )
    clap = ClapQuantized(
        model=clap_model,
        params=clap_params,
        rvq=load_rvq(rvq_path, mc, keys[1]),
        num_quantizers=mc.clap_rvq_cfg.rq_num_quantizers,
        codebook_size=mc.clap_rvq_cfg.codebook_size,
    )

    hubert_model = build_hubert(mc, dtype=dtype)
    hcfg = hubert_model.cfg
    if hubert_path is not None:
        hubert_params = jax.tree_util.tree_map(
            jnp.asarray, it.import_hubert(it.load_torch_state_dict(hubert_path), hcfg)
        )
    else:
        hubert_params = hubert_model.init(keys[2], jnp.zeros((1, 3200)))
    wav2vec = HubertWithKmeans(
        hubert_model,
        hubert_params,
        jnp.asarray(load_kmeans(kmeans_path, mc, keys[3])),
        embed_layer=mc.hubert_kmeans_cfg.embed_layer,
        normalize_embeds=mc.hubert_kmeans_cfg.normalize_embeds,
        target_sample_hz=mc.hubert_kmeans_cfg.target_sample_hz,
        seq_len_multiple_of=mc.hubert_kmeans_cfg.seq_len_multiple_of,
        output_hz=mc.hubert_kmeans_cfg.output_hz,
    )

    codec = build_encodec(mc, dtype=dtype)
    if encodec_path is not None:
        codec_params = jax.tree_util.tree_map(
            jnp.asarray, it.import_encodec(it.load_torch_state_dict(encodec_path), codec)
        )
    else:
        codec_params = codec.init(keys[4], jnp.zeros((1, 2400)))

    tokenizer = None
    try:
        tokenizer = load_tokenizer(tokenizer_path)
    except Exception:
        pass  # text path unavailable; clap_token_ids input still works

    return MusicLM(
        clap=clap,
        codec=codec,
        codec_params=codec_params,
        semantic_stage=load_stage(mc, "semantic", semantic_path, keys[5], dtype),
        coarse_stage=load_stage(mc, "coarse", coarse_path, keys[6], dtype),
        fine_stage=load_stage(mc, "fine", fine_path, keys[7], dtype),
        wav2vec=wav2vec,
        tokenizer=tokenizer,
    )
