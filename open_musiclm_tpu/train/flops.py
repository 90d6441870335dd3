"""Analytic FLOPs model for stage training — the MFU denominator, in code.

MFU here is MODEL-flops utilization in the PaLM sense: the numerator counts
only the mathematically required matmul FLOPs of the model (forward once,
backward twice — remat re-forwards are deliberately NOT credited, so turning
remat on lowers measured MFU, as it should), and the denominator is the
chip's peak dense-matmul rate at the training dtype.

    mfu = train_flops_per_step / step_seconds / peak_flops

``train_flops_per_step = 3 * forward_flops * grad_accum`` (1x forward +
2x backward, the standard dense-transformer accounting).

Forward FLOPs for one microbatch [B, n] through the stage transformer
(models/transformer.py geometry; every matmul counted as 2*m*n*k):

  per layer:
    to_q        2 * n * D * (h*dh)        cosine-sim multi-head Q
    to_kv       2 * n * D * (2*dh)        SHARED single-head K/V (not h*dh!)
    scores      2 * h * dh * n^2          q @ k  — counted DENSE, since XLA
    attn @ v    2 * h * dh * n^2          computes the full matrix and masks
    to_out      2 * n * (h*dh) * D
    ff proj_in  2 * n * D * (2*ffi)       ffi = int(D * 2 * mult / 3) conv-FF
    ff dwconv   ~12 * n * ffi             3-tap depthwise (negligible)
    ff proj_out 2 * n * ffi * D
  stream-wide:
    logits      2 * n * D * (cb_i + 1)    per-position head over its
                                          sequence's codebook (+1 EOS)
    rel-pos MLP O(n * D^2) once per forward (shared across layers; counted)

Embedding lookups, LayerNorms, residuals, gumbel noise: O(n*D), ignored
(<0.5% at these shapes).

Peak rates (dense bf16/f32 MXU, per chip) from published TPU specs; override
with $BENCH_PEAK_TFLOPS when running elsewhere.
"""

from __future__ import annotations

import os
from typing import Sequence

# dense-matmul peak per chip, TFLOP/s, by jax device_kind prefix
_PEAK_TFLOPS = {
    "TPU v5 lite": {"bf16": 197.0, "f32": 197.0 / 4},  # v5e
    "TPU v5e": {"bf16": 197.0, "f32": 197.0 / 4},
    "TPU v5p": {"bf16": 459.0, "f32": 459.0 / 4},
    "TPU v4": {"bf16": 275.0, "f32": 275.0 / 4},
    "TPU v6": {"bf16": 918.0, "f32": 918.0 / 4},  # trillium
}


def peak_flops_per_chip(device_kind: str, dtype: str = "bf16") -> float:
    """Peak dense-matmul FLOP/s for one chip; $BENCH_PEAK_TFLOPS overrides."""
    env = os.environ.get("BENCH_PEAK_TFLOPS")
    if env:
        return float(env) * 1e12
    for prefix, rates in _PEAK_TFLOPS.items():
        if device_kind.startswith(prefix):
            return rates.get(dtype, rates["bf16"]) * 1e12
    # unknown chip: fall back to v5e so the number is at least comparable
    return _PEAK_TFLOPS["TPU v5 lite"][dtype] * 1e12


def stream_positions(token_lens: Sequence[int]) -> int:
    """Assembled training-stream length: per sequence a start token is
    prepended and an EOS appended (token_cond.stage_training_loss)."""
    return sum(int(n) + 2 for n in token_lens)


def stage_forward_flops(
    model, token_lens: Sequence[int], batch: int
) -> float:
    """Forward matmul FLOPs for ONE microbatch at the given per-sequence
    token lengths (pre-EOS lengths, as fed to the trainer)."""
    D = model.dim
    h = model.heads
    dh = model.dim_head
    inner = h * dh
    n = stream_positions(token_lens)

    mult = getattr(model, "ff_mult", 4)
    if model.use_conv_ff:
        ffi = int(D * 2 * mult / 3)
    else:
        ffi = int(D * mult)

    per_layer = (
        2 * n * D * inner  # to_q
        + 2 * n * D * (2 * dh)  # to_kv (shared single head)
        + 2 * h * dh * n * n  # scores
        + 2 * h * dh * n * n  # attn @ v
        + 2 * n * inner * D  # to_out
        + 2 * n * D * (2 * ffi)  # ff proj_in
        + 12 * n * ffi  # depthwise conv taps
        + 2 * n * ffi * D  # ff proj_out
    )

    # per-position logit head over that position's codebook (+1 for EOS);
    # positions split across sequences proportionally to their lengths
    logit = 0
    for spec, ln in zip(model.specs, token_lens):
        logit += 2 * (int(ln) + 2) * D * (spec.codebook_size + 1)

    # continuous rel-pos MLP: (2n-1) distances through a 4-linear MLP of
    # width D (ops/relpos.py), shared across layers
    relpos = (2 * n - 1) * (2 * D + 2 * D * D * 2 + 2 * D * h)

    return float(batch) * (model.depth * per_layer + logit) + relpos


def stage_train_flops(
    model, token_lens: Sequence[int], batch: int, grad_accum: int
) -> float:
    """Model FLOPs of one optimizer step (fwd + 2x bwd, times accumulation)."""
    return 3.0 * stage_forward_flops(model, token_lens, batch) * grad_accum
