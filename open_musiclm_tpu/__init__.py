"""open_musiclm_tpu: TPU-native text-to-music (MusicLM) framework.

A from-scratch JAX/XLA/Pallas rebuild of the capability surface of
zhvng/open-musiclm: CLAP-conditioned semantic -> coarse -> fine acoustic
token transformers over MERT semantic tokens and Encodec acoustic codes,
with KV-cached autoregressive decode, mesh data parallelism, and a native
audio I/O pipeline. See SURVEY.md for the reference analysis and README.md
for usage.
"""

__version__ = "0.1.0"

from .config import (  # noqa: F401
    MusicLMModelConfig,
    MusicLMTrainingConfig,
    load_model_config,
    load_training_config,
)

__all__ = [
    "MusicLMModelConfig",
    "MusicLMTrainingConfig",
    "load_model_config",
    "load_training_config",
]
