"""Config system + factories — JSON-compatible with the reference configs.

Mirrors reference open_musiclm/config.py: the same two-file JSON layout
(model config: clap_rvq / hubert_kmeans / encodec / semantic / coarse / fine /
global; training config: per-stage trainer blocks) loads unchanged —
``configs/model/musiclm_small.json`` from the reference repo parses as-is.
Factories assemble flax models + parameter pytrees; checkpoint paths accept
either orbax/msgpack checkpoints produced by this framework or converted
torch state dicts (checkpoint.py / import_torch.py).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from .models.clap.clap import CLAP, ClapQuantized
from .models.clap.htsat import HTSATConfig
from .models.clap.roberta import RobertaConfig
from .models.encodec import EncodecModel, create_encodec_24khz
from .models.hubert import HubertConfig, HubertModel, HubertWithKmeans
from .models.rvq import rvq_init
from .models.stages import (
    Stage,
    create_coarse_transformer,
    create_fine_transformer,
    create_semantic_transformer,
)
from .models.token_cond import StageLossConfig, TokenConditionedTransformer


# ---------------------------------------------------------------------------
# dataclasses (reference config.py:21-165, field-for-field)
# ---------------------------------------------------------------------------


@dataclass
class ClapRVQConfig:
    rq_num_quantizers: int
    codebook_size: int
    enable_fusion: bool = False
    rq_ema_decay: float = 0.95
    threshold_ema_dead_code: float = 0.0
    checkpoint_path: Optional[str] = None
    amodel_type: str = "HTSAT-tiny"


@dataclass
class HubertKmeansConfig:
    model_name: str
    normalize_embeds: bool
    embed_layer: int = 7
    target_sample_hz: int = 16000
    seq_len_multiple_of: int = 320
    codebook_size: int = 1024
    output_hz: int = 50


@dataclass
class EncodecConfig:
    bandwidth: float
    codebook_size: int
    output_hz: int = 75


@dataclass
class StageTransformerConfig:
    dim: int = 1024
    depth: int = 6
    heads: int = 8
    attn_dropout: float = 0.0
    ff_dropout: float = 0.1
    use_conv_ff: bool = True
    grad_shrink_alpha: float = 0.1
    non_causal_prefix_size: int = 0
    relative_position_bias_type: str = "continuous"
    use_memory_efficient_attention: bool = False  # accepted for config parity
    use_absolute_position_embeddings: bool = False
    max_absolute_position_embeddings: int = 262


@dataclass
class SemanticConfig(StageTransformerConfig):
    max_absolute_position_embeddings: int = 12 + 250


@dataclass
class CoarseConfig(StageTransformerConfig):
    max_absolute_position_embeddings: int = 12 + 100 + 600


@dataclass
class FineConfig(StageTransformerConfig):
    max_absolute_position_embeddings: int = 12 + 300 + 900


@dataclass
class GlobalConfig:
    semantic_audio_length_seconds: float = 10.0
    coarse_audio_length_seconds: float = 4.0
    fine_audio_length_seconds: float = 2.0
    clap_audio_length_seconds: float = 10.0
    num_coarse_quantizers: int = 3
    num_fine_quantizers: int = 5


@dataclass
class MusicLMModelConfig:
    clap_rvq_cfg: ClapRVQConfig
    hubert_kmeans_cfg: HubertKmeansConfig
    encodec_cfg: EncodecConfig
    semantic_cfg: SemanticConfig
    coarse_cfg: CoarseConfig
    fine_cfg: FineConfig
    global_cfg: GlobalConfig


@dataclass
class ClapRVQTrainerConfig:
    folder: str
    num_train_steps: int
    batch_size: int
    accumulate_batches: int
    save_model_every: int
    save_results_every: int


@dataclass
class HubertKmeansTrainerConfig:
    folder: str
    feature_extraction_num_steps: int
    feature_extraction_batch_size: int


@dataclass
class SingleStageTrainerConfig:
    stage: str
    folder: str
    valid_frac: float
    lr: float
    lr_warmup: int
    batch_size: int
    grad_accum_every: int
    wd: float
    max_grad_norm: float
    cross_entropy_loss_weights: List[float]
    num_train_steps: int
    save_results_every: int
    save_model_every: int
    save_predicted_tokens: bool
    save_reconstructed_wave: bool
    use_preprocessed_data: bool


@dataclass
class DataPreprocessorConfig:
    folder: str = "./data/fma_large"
    metadata_folder: str = "./data/fma_metadata"
    results_folder: str = "./fma_preprocessed"
    max_audio_length_seconds: int = 30
    random_crop: bool = True
    num_crops: int = 1
    clap_batch_size: int = 32


@dataclass
class MusicLMTrainingConfig:
    clap_rvq_trainer_cfg: ClapRVQTrainerConfig
    hubert_kmeans_trainer_cfg: HubertKmeansTrainerConfig
    semantic_trainer_cfg: SingleStageTrainerConfig
    coarse_trainer_cfg: SingleStageTrainerConfig
    fine_trainer_cfg: SingleStageTrainerConfig
    data_preprocessor_cfg: DataPreprocessorConfig


def load_model_config(path: str) -> MusicLMModelConfig:
    """reference config.py:169-181 — same JSON schema."""
    with open(path) as f:
        cfg = json.load(f)
    return MusicLMModelConfig(
        clap_rvq_cfg=ClapRVQConfig(**cfg["clap_rvq_cfg"]),
        hubert_kmeans_cfg=HubertKmeansConfig(**cfg["hubert_kmeans_cfg"]),
        encodec_cfg=EncodecConfig(**cfg["encodec_cfg"]),
        semantic_cfg=SemanticConfig(**cfg["semantic_cfg"]),
        coarse_cfg=CoarseConfig(**cfg["coarse_cfg"]),
        fine_cfg=FineConfig(**cfg["fine_cfg"]),
        global_cfg=GlobalConfig(**cfg["global_cfg"]),
    )


def load_training_config(path: str) -> MusicLMTrainingConfig:
    """reference config.py:184-195."""
    with open(path) as f:
        cfg = json.load(f)
    return MusicLMTrainingConfig(
        clap_rvq_trainer_cfg=ClapRVQTrainerConfig(**cfg["clap_rvq_trainer_cfg"]),
        hubert_kmeans_trainer_cfg=HubertKmeansTrainerConfig(**cfg["hubert_kmeans_trainer_cfg"]),
        semantic_trainer_cfg=SingleStageTrainerConfig(**cfg["semantic_trainer_cfg"]),
        coarse_trainer_cfg=SingleStageTrainerConfig(**cfg["coarse_trainer_cfg"]),
        fine_trainer_cfg=SingleStageTrainerConfig(**cfg["fine_trainer_cfg"]),
        data_preprocessor_cfg=DataPreprocessorConfig(**cfg["data_preprocessor_cfg"]),
    )


# ---------------------------------------------------------------------------
# model factories (reference config.py:218-454)
# ---------------------------------------------------------------------------


def _stage_kwargs(c: StageTransformerConfig) -> dict:
    return dict(
        dim=c.dim,
        depth=c.depth,
        heads=c.heads,
        attn_dropout=c.attn_dropout,
        ff_dropout=c.ff_dropout,
        use_conv_ff=c.use_conv_ff,
        grad_shrink_alpha=c.grad_shrink_alpha,
        non_causal_prefix_size=c.non_causal_prefix_size,
        relative_position_bias_type=c.relative_position_bias_type,
        use_absolute_position_embeddings=c.use_absolute_position_embeddings,
        max_absolute_position_embeddings=c.max_absolute_position_embeddings,
    )


def build_semantic_transformer(mc: MusicLMModelConfig, dtype=jnp.float32) -> TokenConditionedTransformer:
    return create_semantic_transformer(
        clap_codebook_size=mc.clap_rvq_cfg.codebook_size,
        semantic_codebook_size=mc.hubert_kmeans_cfg.codebook_size,
        num_clap_quantizers=mc.clap_rvq_cfg.rq_num_quantizers,
        dtype=dtype,
        **_stage_kwargs(mc.semantic_cfg),
    )


def build_coarse_transformer(mc: MusicLMModelConfig, dtype=jnp.float32) -> TokenConditionedTransformer:
    return create_coarse_transformer(
        clap_codebook_size=mc.clap_rvq_cfg.codebook_size,
        semantic_codebook_size=mc.hubert_kmeans_cfg.codebook_size,
        acoustic_codebook_size=mc.encodec_cfg.codebook_size,
        num_clap_quantizers=mc.clap_rvq_cfg.rq_num_quantizers,
        num_coarse_quantizers=mc.global_cfg.num_coarse_quantizers,
        dtype=dtype,
        **_stage_kwargs(mc.coarse_cfg),
    )


def build_fine_transformer(mc: MusicLMModelConfig, dtype=jnp.float32) -> TokenConditionedTransformer:
    return create_fine_transformer(
        clap_codebook_size=mc.clap_rvq_cfg.codebook_size,
        acoustic_codebook_size=mc.encodec_cfg.codebook_size,
        num_clap_quantizers=mc.clap_rvq_cfg.rq_num_quantizers,
        num_coarse_quantizers=mc.global_cfg.num_coarse_quantizers,
        num_fine_quantizers=mc.global_cfg.num_fine_quantizers,
        dtype=dtype,
        **_stage_kwargs(mc.fine_cfg),
    )


def build_encodec(mc: MusicLMModelConfig, dtype=jnp.float32) -> EncodecModel:
    return create_encodec_24khz(
        bandwidth=mc.encodec_cfg.bandwidth,
        codebook_size=mc.encodec_cfg.codebook_size,
        dtype=dtype,
    )


def build_clap(mc: MusicLMModelConfig, dtype=jnp.float32) -> CLAP:
    from .models.clap.model_configs import audio_config_from_name

    # amodel_type resolves through the per-arch preset registry
    # (reference laion_clap factory.py:16-46 + model_configs/*.json)
    audio_cfg = audio_config_from_name(
        mc.clap_rvq_cfg.amodel_type,
        enable_fusion=mc.clap_rvq_cfg.enable_fusion,
        fusion_type="aff_2d",
    )
    return CLAP(audio_cfg=audio_cfg, text_cfg=RobertaConfig(), dtype=dtype)


def build_hubert(mc: MusicLMModelConfig, dtype=jnp.float32) -> HubertModel:
    return HubertModel(cfg=HubertConfig(), dtype=dtype)


def stage_example_lengths(mc: MusicLMModelConfig, stage: str) -> Tuple[int, ...]:
    """Flattened per-sequence token counts for a training example
    (SURVEY.md 2.4 geometry; without the appended EOS)."""
    g = mc.global_cfg
    sem_hz = mc.hubert_kmeans_cfg.output_hz
    ac_hz = mc.encodec_cfg.output_hz
    n_clap = mc.clap_rvq_cfg.rq_num_quantizers
    if stage == "semantic":
        sem = int(g.semantic_audio_length_seconds * sem_hz) - 1
        return (n_clap, sem)
    if stage == "coarse":
        sem = int(g.coarse_audio_length_seconds * sem_hz) - 1
        coarse = int(g.coarse_audio_length_seconds * ac_hz) * g.num_coarse_quantizers
        return (n_clap, sem, coarse)
    if stage == "fine":
        coarse = int(g.fine_audio_length_seconds * ac_hz) * g.num_coarse_quantizers
        fine = int(g.fine_audio_length_seconds * ac_hz) * g.num_fine_quantizers
        return (n_clap, coarse, fine)
    raise ValueError(stage)


def init_stage(
    mc: MusicLMModelConfig,
    stage: str,
    key: jax.Array,
    *,
    cross_entropy_loss_weights: Optional[List[float]] = None,
    dtype=jnp.float32,
) -> Stage:
    """Build a stage with freshly initialized params."""
    builder = {
        "semantic": build_semantic_transformer,
        "coarse": build_coarse_transformer,
        "fine": build_fine_transformer,
    }[stage]
    model = builder(mc, dtype=dtype)
    lens = stage_example_lengths(mc, stage)
    ids = [jnp.zeros((1, n), jnp.int32) for n in lens]
    params = model.init(key, ids)
    if cross_entropy_loss_weights is None:
        cross_entropy_loss_weights = [1.0] * len(model.specs)
    return Stage(
        model,
        params,
        StageLossConfig(tuple(cross_entropy_loss_weights)),
        name=stage,
    )
