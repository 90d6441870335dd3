"""CLAP per-arch config registry.

Rebuild of the reference factory's model-config resolution
(laion_clap/clap_module/factory.py:16-46 + model_configs/*.json): every
audio-tower preset the reference ships resolves by name to a config object
this framework's towers consume. The CLIP-vision presets (RN*/ViT-*) are
dead code on the MusicLM path (SURVEY.md 2.1 #14) and are intentionally not
carried.

HTSAT size variants follow reference htsat.py:981-1027 (tiny/base/large
Swin geometry); mel-frontend geometry (fft window, hop, fmax, clip samples)
follows the individual model_configs JSONs.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

from .htsat import HTSATConfig


@dataclasses.dataclass(frozen=True)
class PANNConfig:
    """Geometry for the PANN CNN towers (model_configs/PANN-*.json)."""

    arch: str = "Cnn14"
    num_classes: int = 527
    sample_rate: int = 48000
    window_size_fft: int = 1024
    hop_size: int = 480
    mel_bins: int = 64
    fmin: float = 50.0
    fmax: float = 14000.0
    clip_samples: int = 480000
    enable_fusion: bool = False  # PANN fusion is not used by shipped configs
    fusion_type: str = "None"


# Swin geometry per HTSAT size (reference htsat.py:985-1026)
_HTSAT_SIZES = {
    "tiny": dict(embed_dim=96, depths=(2, 2, 6, 2)),
    "base": dict(embed_dim=128, depths=(2, 2, 12, 2)),
    "large": dict(embed_dim=256, depths=(2, 2, 12, 2)),
}

# name -> (kind, size/arch, mel-frontend overrides); mirrors the 11 audio
# model_configs JSONs field-for-field
_AUDIO_PRESETS = {
    "HTSAT-tiny": ("htsat", "tiny", {}),
    "HTSAT-base": ("htsat", "base", {}),
    "HTSAT-large": ("htsat", "large", {}),
    "HTSAT-tiny-win-1536": ("htsat", "tiny", {"window_size_fft": 1536}),
    "PANN-14": ("pann", "Cnn14", {}),
    "PANN-14-fmax-18k": ("pann", "Cnn14", {"fmax": 18000.0}),
    "PANN-14-fmax-8k-20s": (
        "pann",
        "Cnn14",
        {"fmax": 8000.0, "hop_size": 360, "clip_samples": 960000},
    ),
    "PANN-14-win-1536": ("pann", "Cnn14", {"window_size_fft": 1536}),
    "PANN-14-tiny-transformer": ("pann", "Cnn14", {}),
    "PANN-10": ("pann", "Cnn10", {}),
    "PANN-6": ("pann", "Cnn6", {}),
}

# name -> (embed_dim, text-cfg overrides): the joint-space width and the
# CLIP-style text tower each JSON declares (model_configs/*.json `embed_dim`
# + `text_cfg`). All presets use the 77-ctx/49408-vocab/512-wide/8-head CLIP
# text transformer; only PANN-14-tiny-transformer shrinks it to 4 layers
# (PANN-14-tiny-transformer.json:17-23). Note the shipped MusicLM configs
# swap this text tower for RoBERTa (tmodel 'roberta') and joint width 512
# at the CLAP level — these are the per-JSON declarations.
_CLAP_PRESETS = {
    "HTSAT-tiny": (768, {}),
    "HTSAT-base": (1024, {}),
    "HTSAT-large": (2048, {}),
    "HTSAT-tiny-win-1536": (768, {}),
    "PANN-14": (2048, {}),
    "PANN-14-fmax-18k": (2048, {}),
    "PANN-14-fmax-8k-20s": (2048, {}),
    "PANN-14-win-1536": (2048, {}),
    "PANN-14-tiny-transformer": (2048, {"layers": 4}),
    "PANN-10": (1024, {}),
    "PANN-6": (512, {}),
}


def list_audio_presets() -> Tuple[str, ...]:
    return tuple(_AUDIO_PRESETS)


def audio_config_from_name(
    name: str, *, enable_fusion: bool = False, fusion_type: str = "aff_2d"
):
    """Resolve a reference model-config name to an HTSATConfig / PANNConfig."""
    if name not in _AUDIO_PRESETS:
        raise KeyError(
            f"unknown CLAP audio preset {name!r}; known: {sorted(_AUDIO_PRESETS)}"
        )
    kind, size, overrides = _AUDIO_PRESETS[name]
    if kind == "htsat":
        sw = _HTSAT_SIZES[size]
        return HTSATConfig(
            embed_dim=sw["embed_dim"],
            depths=sw["depths"],
            num_heads=(4, 8, 16, 32),
            window_size=8,
            spec_size=256,
            patch_size=4,
            patch_stride=(4, 4),
            enable_fusion=enable_fusion,
            fusion_type=fusion_type,
            **overrides,
        )
    return PANNConfig(arch=size, **overrides)


@dataclasses.dataclass(frozen=True)
class ClapPresetConfig:
    """Full per-name CLAP preset: audio tower + the CLIP text tower and
    joint-space width the JSON declares (factory.py loads the whole JSON;
    model.py:422-543 consumes audio_cfg/text_cfg/embed_dim)."""

    name: str
    audio_cfg: object  # HTSATConfig | PANNConfig
    text_cfg: object  # ClipTextConfig
    embed_dim: int


def clap_config_from_name(
    name: str, *, enable_fusion: bool = False, fusion_type: str = "aff_2d"
) -> ClapPresetConfig:
    """Resolve a preset name to its FULL declaration (audio + text + embed).

    ``audio_config_from_name`` stays the narrow audio-geometry entry point;
    this returns everything the reference JSON carries so a CLAP assembled
    from a non-MusicLM preset (e.g. PANN-14-tiny-transformer's 4-layer CLIP
    text tower at embed_dim 2048) gets the declared towers, not defaults.
    """
    from .clip_text import ClipTextConfig

    audio = audio_config_from_name(
        name, enable_fusion=enable_fusion, fusion_type=fusion_type
    )
    embed_dim, text_overrides = _CLAP_PRESETS[name]
    text = ClipTextConfig(
        context_length=77, vocab_size=49408, width=512, heads=8, **text_overrides
    )
    return ClapPresetConfig(
        name=name, audio_cfg=audio, text_cfg=text, embed_dim=embed_dim
    )
