"""Stage definitions: semantic / coarse / fine transformers + bound tokenizers.

Mirrors the reference factories and stage wrappers
(open_musiclm.py:414-472, 514-815). A ``Stage`` binds a
TokenConditionedTransformer's params to its loss config and provides
shape-cached jitted entry points for training loss and KV-cached generation,
so repeated sliding-window calls with the same geometry compile exactly once.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..core.sequence import TokenSequenceSpec
from .token_cond import (
    StageLossConfig,
    TokenConditionedTransformer,
    generate,
    stage_training_loss,
)


def create_semantic_transformer(
    dim: int = 1024,
    depth: int = 6,
    clap_codebook_size: int = 1024,
    semantic_codebook_size: int = 1024,
    num_clap_quantizers: int = 12,
    **kwargs,
) -> TokenConditionedTransformer:
    """Reference create_semantic_transformer (open_musiclm.py:414-428)."""
    specs = (
        TokenSequenceSpec(clap_codebook_size, num_clap_quantizers, False),
        TokenSequenceSpec(semantic_codebook_size, 1, False),
    )
    return TokenConditionedTransformer(specs=specs, dim=dim, depth=depth, **kwargs)


def create_coarse_transformer(
    dim: int = 1024,
    depth: int = 6,
    clap_codebook_size: int = 1024,
    semantic_codebook_size: int = 1024,
    acoustic_codebook_size: int = 1024,
    num_clap_quantizers: int = 12,
    num_coarse_quantizers: int = 3,
    **kwargs,
) -> TokenConditionedTransformer:
    """Reference create_coarse_transformer (open_musiclm.py:431-450)."""
    specs = (
        TokenSequenceSpec(clap_codebook_size, num_clap_quantizers, False),
        TokenSequenceSpec(semantic_codebook_size, 1, False),
        TokenSequenceSpec(acoustic_codebook_size, num_coarse_quantizers, False),
    )
    return TokenConditionedTransformer(specs=specs, dim=dim, depth=depth, **kwargs)


def create_fine_transformer(
    dim: int = 1024,
    depth: int = 6,
    clap_codebook_size: int = 1024,
    acoustic_codebook_size: int = 1024,
    num_clap_quantizers: int = 12,
    num_coarse_quantizers: int = 3,
    num_fine_quantizers: int = 5,
    **kwargs,
) -> TokenConditionedTransformer:
    """Reference create_fine_transformer (open_musiclm.py:453-472)."""
    specs = (
        TokenSequenceSpec(clap_codebook_size, num_clap_quantizers, False),
        TokenSequenceSpec(acoustic_codebook_size, num_coarse_quantizers, False),
        TokenSequenceSpec(acoustic_codebook_size, num_fine_quantizers, False),
    )
    return TokenConditionedTransformer(specs=specs, dim=dim, depth=depth, **kwargs)


def _shard_over_batch(fn, mesh, n_replicated: int):
    """Wrap a generate fn in shard_map: the first ``n_replicated`` args stay
    replicated (params/qparams), the rest (cond/init/keys) shard their batch
    dim over dp. Used for multi-chip serving of the Pallas int8 decode paths
    — GSPMD handles the plain-XLA path on its own, but pallas_call needs the
    per-shard program shard_map provides."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    in_specs = (P(),) * n_replicated + (P("dp"),) * 4
    return shard_map(
        fn, mesh=mesh, in_specs=in_specs, out_specs=P("dp"), check_vma=False
    )


@functools.lru_cache(maxsize=64)
def _jitted_generate(
    model: TokenConditionedTransformer,
    max_time_steps: int,
    has_init: bool,
    filter_thres: float,
    temperature: float,
    allow_eos_in_output: bool,
    include_eos_in_output: bool,
    per_row: bool = False,
    mesh=None,
    approx_topk: bool = False,
    has_teacher: bool = False,
    return_logits: bool = False,
):
    def fn(params, cond_ids, init_pred, key, teacher):
        return generate(
            model,
            params,
            list(cond_ids),
            None if per_row else key,
            max_time_steps=max_time_steps,
            init_pred_ids=init_pred if has_init else None,
            filter_thres=filter_thres,
            temperature=temperature,
            allow_eos_in_output=allow_eos_in_output,
            include_eos_in_output=include_eos_in_output,
            per_row_keys=key if per_row else None,
            approx_topk=approx_topk,
            teacher_ids=teacher if has_teacher else None,
            return_logits=return_logits,
        )

    if mesh is not None:
        fn = _shard_over_batch(fn, mesh, 1)
    return jax.jit(fn)


@functools.lru_cache(maxsize=64)
def _jitted_generate_quantized(
    model: TokenConditionedTransformer,
    max_time_steps: int,
    has_init: bool,
    filter_thres: float,
    temperature: float,
    allow_eos_in_output: bool,
    include_eos_in_output: bool,
    per_row: bool = False,
    flash_kv: Optional[str] = None,
    mesh=None,
    approx_topk: bool = False,
    has_teacher: bool = False,
    return_logits: bool = False,
):
    def fn(params, qparams, cond_ids, init_pred, key, teacher):
        from .quant_decode import generate_quantized

        return generate_quantized(
            model,
            params,
            qparams,
            list(cond_ids),
            None if per_row else key,
            max_time_steps=max_time_steps,
            init_pred_ids=init_pred if has_init else None,
            filter_thres=filter_thres,
            temperature=temperature,
            allow_eos_in_output=allow_eos_in_output,
            include_eos_in_output=include_eos_in_output,
            per_row_keys=key if per_row else None,
            flash_kv=flash_kv,
            approx_topk=approx_topk,
            teacher_ids=teacher if has_teacher else None,
            return_logits=return_logits,
        )

    if mesh is not None:
        fn = _shard_over_batch(fn, mesh, 2)
    return jax.jit(fn)


@dataclasses.dataclass
class Stage:
    """A trained stage: model + params + loss config.

    ``quantized=True`` switches generation to the int8 weight-only decode
    path (models/quant_decode.py) — ~2x smaller weight working set; see the
    measured-perf note there. ``flash_kv`` (None | "bf16" | "f32" | "int8"
    | "fused", default from $OPEN_MUSICLM_FLASH_KV) additionally routes
    attention-over-cache through the early-exit flash-decode kernel
    (ops/decode_attention.py); the mode picks the resident cache-row dtype
    ("f32" trades 2x row bytes for fp-exact softmax inputs — the lowest-
    deviation kernel mode, see PARITY.md)."""

    model: TokenConditionedTransformer
    params: Any
    loss_cfg: StageLossConfig
    name: str = "stage"
    quantized: bool = False
    flash_kv: Optional[str] = dataclasses.field(
        default_factory=lambda: os.environ.get("OPEN_MUSICLM_FLASH_KV") or None
    )

    def __post_init__(self):
        self._qparams = None

    def _get_qparams(self):
        if self._qparams is None:
            from .quant_decode import quantize_stage_params

            self._qparams = quantize_stage_params(
                self.model, self.params, fused=self.flash_kv == "fused"
            )
        return self._qparams

    def generate(
        self,
        conditioning_token_ids: Sequence[jnp.ndarray],
        key: jax.Array,
        *,
        max_time_steps: int,
        init_pred_ids: Optional[jnp.ndarray] = None,
        filter_thres: float = 0.9,
        temperature: float = 1.0,
        allow_eos_in_output: bool = False,
        include_eos_in_output: bool = False,
        per_row_keys: Optional[jnp.ndarray] = None,
        mesh=None,
        approx_topk: Optional[bool] = None,
        teacher_forced_ids: Optional[jnp.ndarray] = None,
        return_logits: bool = False,
    ) -> jnp.ndarray:
        """``per_row_keys``: optional [b] keys for batch-composition-
        independent sampling (serving); ``key`` is ignored when given.
        ``mesh``: optional jax.sharding.Mesh — shard the prompt batch over
        its ``dp`` axis via shard_map (multi-chip serving for the Pallas
        int8 decode paths; requires per_row_keys so row i's sampling stays
        a function of its own key regardless of the shard layout).
        ``approx_topk``: None reads $OPEN_MUSICLM_APPROX_TOPK at CALL time
        (resolved here, outside jit, so it participates in the jit-cache
        key — toggling the env between calls recompiles rather than
        silently reusing stale sampling behavior)."""
        from ..core.sampling import _approx_topk_default

        if approx_topk is None:
            approx_topk = _approx_topk_default()
        cond = tuple(jnp.reshape(t, (t.shape[0], -1)) for t in conditioning_token_ids)
        has_init = init_pred_ids is not None
        init = init_pred_ids if has_init else jnp.zeros((cond[0].shape[0], 0), jnp.int32)
        has_teacher = teacher_forced_ids is not None
        teacher = (
            jnp.reshape(teacher_forced_ids, (cond[0].shape[0], -1))
            if has_teacher
            else jnp.zeros((cond[0].shape[0], 0), jnp.int32)
        )
        per_row = per_row_keys is not None
        if mesh is not None:
            if not per_row:
                raise ValueError(
                    "mesh-sharded generate requires per_row_keys (row i's "
                    "sampling must not depend on the shard layout)"
                )
            assert cond[0].shape[0] % mesh.shape["dp"] == 0
        key_arg = per_row_keys if per_row else key
        if self.flash_kv and not self.quantized:
            # the flash-KV cache lives in the quantized decode scan
            # (models/quant_decode.py); silently ignoring it here made a
            # round-4 measurement lane score the PURE FP PATH as
            # "flash-kv-only deviation: 0%" (.lanes/deviation.out)
            raise ValueError(
                f"flash_kv={self.flash_kv!r} requires quantized=True: the "
                "flash decode kernel is part of the int8 serving scan and "
                "would be silently ignored on the fp path. Either construct "
                "the stage with quantized=True (serving stack) or unset "
                "$OPEN_MUSICLM_FLASH_KV / pass flash_kv=None for "
                "full-precision generation. (Before r4 this combination "
                "silently generated on the fp path.)"
            )
        if self.quantized:
            fn = _jitted_generate_quantized(
                self.model,
                int(max_time_steps),
                has_init,
                float(filter_thres),
                float(temperature),
                bool(allow_eos_in_output),
                bool(include_eos_in_output),
                per_row,
                self.flash_kv,
                mesh,
                bool(approx_topk),
                has_teacher,
                bool(return_logits),
            )
            return fn(self.params, self._get_qparams(), cond, init, key_arg, teacher)
        fn = _jitted_generate(
            self.model,
            int(max_time_steps),
            has_init,
            float(filter_thres),
            float(temperature),
            bool(allow_eos_in_output),
            bool(include_eos_in_output),
            per_row,
            mesh,
            bool(approx_topk),
            has_teacher,
            bool(return_logits),
        )
        return fn(self.params, cond, init, key_arg, teacher)

    def loss(
        self,
        all_token_ids: Sequence[jnp.ndarray],
        key: jax.Array,
        *,
        train: bool = True,
    ):
        return stage_training_loss(
            self.model, self.params, list(all_token_ids), key, self.loss_cfg, train=train
        )
