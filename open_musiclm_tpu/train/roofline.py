"""Analytic HBM-traffic roofline for the stage training step.

Companion to the FLOPs model (train/flops.py): where that file gives the
MFU numerator, this one explains the MFU *ceiling*. The training step of a
musiclm stage at the reference geometries (d1024, 6-24 layers, 0.5-1.5k
tokens) is small enough that several non-matmul terms carry HBM traffic
comparable to the matmul FLOP time, so measured MFU saturates well below
the "big-transformer" 40-60% band. This model makes that quantitative:

    step_time >= max(flops / peak_flops, bytes / peak_bw)

with ``bytes`` decomposed per term so the dominant one is actionable:

  * ``weights``     — every weight matrix is read ~3x per step (fwd,
                      bwd-dx, bwd-dw) at the param dtype, plus the gradient
                      write/read pair.
  * ``optimizer``   — AdamW reads p/m/v/g and writes p/m/v at f32
                      (or the param dtype when bf16 master params are on).
  * ``attn_scores`` — the [b, h, n, n] similarity matrix. XLA materializes
                      it between the QK^T and AV matmuls (it does not
                      flash-tile automatically); counted as 2 passes fwd
                      (write + read around the softmax, whose elementwise
                      chain fuses) and 4 passes bwd (read twice to form
                      dV-weights and d(sim), write+read the d(sim) matrix).
                      The Pallas flash kernel (ops/pallas_attention.py)
                      removes this term entirely — it never materializes
                      scores in HBM — at the cost of recomputing them in
                      the backward (FLOPs it has spare when memory-bound).
  * ``ff_stream``   — the widest activation tensors: the [b, n, 2*ffi]
                      conv-FF inner stream and its GEGLU/norm/dwconv
                      passes, fwd + bwd.
  * ``residual``    — the [b, n, D] stream read/written around every
                      attn/FF block and its LayerNorms, fwd + bwd.
  * ``logits``      — the per-position codebook heads' outputs + the
                      one-hot CE backward pass.

All counts are DERIVED LOWER BOUNDS (perfect fusion of every elementwise
chain into its producer matmul, no re-reads beyond the structural ones
listed); real XLA schedules run 1.2-2x above them, so "measured step time
within ~2x of the roofline max" means the schedule is sane and the listed
dominant term is the real bottleneck.

No reference counterpart: the reference (open_musiclm/trainer.py) publishes
no performance model at all.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, Sequence

from .flops import peak_flops_per_chip, stage_train_flops, stream_positions

# HBM bandwidth per chip, GB/s, by jax device_kind prefix (published specs)
_PEAK_BW_GBS = {
    "TPU v5 lite": 819.0,  # v5e
    "TPU v5e": 819.0,
    "TPU v5p": 2765.0,
    "TPU v4": 1228.0,
    "TPU v6": 1640.0,  # trillium
}


def peak_hbm_bytes_per_s(device_kind: str) -> float:
    """Peak HBM bandwidth for one chip; $BENCH_PEAK_GBS overrides."""
    env = os.environ.get("BENCH_PEAK_GBS")
    if env:
        return float(env) * 1e9
    for prefix, bw in _PEAK_BW_GBS.items():
        if device_kind.startswith(prefix):
            return bw * 1e9
    return _PEAK_BW_GBS["TPU v5 lite"] * 1e9


@dataclass
class Roofline:
    """Per-step byte/FLOP budget and the implied step-time lower bound."""

    flops: float
    bytes_by_term: Dict[str, float]
    peak_flops: float
    peak_bw: float

    @property
    def total_bytes(self) -> float:
        return sum(self.bytes_by_term.values())

    @property
    def compute_s(self) -> float:
        return self.flops / self.peak_flops

    @property
    def memory_s(self) -> float:
        return self.total_bytes / self.peak_bw

    @property
    def bound_s(self) -> float:
        return max(self.compute_s, self.memory_s)

    @property
    def bound(self) -> str:
        return "memory" if self.memory_s > self.compute_s else "compute"

    @property
    def mfu_ceiling(self) -> float:
        """MFU if the step ran exactly at the roofline bound."""
        return self.flops / self.bound_s / self.peak_flops

    def summary(self, measured_step_s: float | None = None) -> Dict:
        out = {
            "compute_ms": round(self.compute_s * 1e3, 2),
            "memory_ms": round(self.memory_s * 1e3, 2),
            "bound": self.bound,
            "bound_ms": round(self.bound_s * 1e3, 2),
            "mfu_ceiling": round(self.mfu_ceiling, 3),
            "bytes_gb_by_term": {
                k: round(v / 1e9, 2) for k, v in self.bytes_by_term.items()
            },
            "model_tflops": round(self.flops / 1e12, 3),
        }
        if measured_step_s:
            out["measured_ms"] = round(measured_step_s * 1e3, 2)
            out["roofline_fraction"] = round(self.bound_s / measured_step_s, 3)
        return out


def stage_train_roofline(
    model,
    token_lens: Sequence[int],
    batch: int,
    grad_accum: int,
    *,
    device_kind: str,
    compute_dtype_bytes: int = 2,
    param_dtype_bytes: int = 4,
    pallas_attention: bool = False,
    remat: bool = False,
) -> Roofline:
    """Build the per-step roofline for one stage-training configuration.

    ``token_lens`` are the pre-EOS per-sequence lengths, as fed to the
    trainer (same convention as flops.stage_train_flops).
    """
    D = model.dim
    h = model.heads
    dh = model.dim_head
    L = model.depth
    n = stream_positions(token_lens)
    b = batch * grad_accum  # total sequences touched per optimizer step
    a = compute_dtype_bytes
    p = param_dtype_bytes

    mult = getattr(model, "ff_mult", 4)
    ffi = int(D * 2 * mult / 3) if model.use_conv_ff else int(D * mult)

    # ---- parameter-shaped traffic ----
    per_layer_params = (
        D * (h * dh)  # to_q
        + D * (2 * dh)  # to_kv
        + (h * dh) * D  # to_out
        + D * (2 * ffi)  # ff proj_in
        + ffi * D  # ff proj_out
        + 3 * (2 * ffi)  # dwconv taps
    )
    head_params = sum(D * (s.codebook_size + 1) for s in model.specs)
    embed_params = sum(D * (s.codebook_size + 2) for s in model.specs)
    relpos_params = 2 * D + 2 * D * D + D * h  # 4-linear continuous MLP
    P = L * per_layer_params + head_params + embed_params + relpos_params

    # fwd read + bwd-dx read + bwd-dw read of every weight (cast from the
    # param dtype each time unless a bf16 copy is kept — count param dtype),
    # one gradient write + one read into the optimizer (f32 accumulation
    # happens in regs; grads land at param dtype under our optax chain)
    weights_bytes = (3.0 * grad_accum + 2.0) * P * p
    # AdamW: read p, m, v, g; write p, m, v — master state at param dtype
    optimizer_bytes = 7.0 * P * p

    # ---- attention scores [b, h, n, n] ----
    # fwd: write sim (softmax chain fuses into the same pass), read for AV.
    # bwd: read probs for dV, read + write + read around d(sim)->dq/dk.
    passes = 0.0 if pallas_attention else (2.0 + 4.0)
    if remat and not pallas_attention:
        passes += 2.0  # re-forward materializes + reads scores again
    attn_scores_bytes = passes * b * h * n * n * a * L

    # ---- widest FF activations [b, n, 2*ffi] ----
    # fwd: proj_in write, dwconv read(+shifted reads fuse), geglu read/write
    # half, proj_out read  ~= 4 passes of the 2*ffi tensor equivalent.
    # bwd: symmetric reads of saved activations + grad passes ~= 6.
    ff_passes = 4.0 + (6.0 if not remat else 8.0)
    ff_stream_bytes = ff_passes * b * n * (2 * ffi) * a * L

    # ---- residual stream [b, n, D] ----
    # per block (attn, ff): LN read, matmul-in read, residual add read+write;
    # ~6 passes fwd + ~8 bwd across both blocks per layer
    res_passes = 6.0 + 8.0
    residual_bytes = res_passes * b * n * D * a * L

    # ---- logits + CE ----
    V = sum(s.codebook_size + 1 for s in model.specs)
    # write logits, read for softmax-CE, write dlogits, read into matmul
    logits_bytes = 4.0 * b * n * (V / len(model.specs)) * a

    flops = stage_train_flops(model, token_lens, batch, grad_accum)
    return Roofline(
        flops=flops,
        bytes_by_term={
            "weights": weights_bytes,
            "optimizer": optimizer_bytes,
            "attn_scores": attn_scores_bytes,
            "ff_stream": ff_stream_bytes,
            "residual": residual_bytes,
            "logits": logits_bytes,
        },
        peak_flops=peak_flops_per_chip(device_kind, "bf16" if a == 2 else "f32"),
        peak_bw=peak_hbm_bytes_per_s(device_kind),
    )
