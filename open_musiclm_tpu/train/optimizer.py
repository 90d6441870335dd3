"""Optimizer: AdamW with dimension-gated weight decay + linear warmup.

Mirrors reference optimizer.py: AdamW betas (0.9, 0.99), eps 1e-8, weight
decay applied only to params with ndim >= 2 (optimizer.py:3-8), LinearLR
warmup from a 1e-7 factor (optimizer.py:36-41), and the trainer's global
grad-norm clip (trainer.py:443-444) — all as one optax chain.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax


def _wd_mask(params):
    return jax.tree_util.tree_map(lambda p: p.ndim >= 2, params)


def make_schedule(lr: float, warmup_steps: int = 0, start_factor: float = 1e-7):
    if warmup_steps and warmup_steps > 0:
        return optax.linear_schedule(
            init_value=lr * start_factor, end_value=lr, transition_steps=warmup_steps
        )
    return lr


def make_optimizer(
    lr: float = 3e-4,
    wd: float = 1e-2,
    *,
    warmup_steps: int = 0,
    max_grad_norm: Optional[float] = 0.5,
    b1: float = 0.9,
    b2: float = 0.99,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    schedule = make_schedule(lr, warmup_steps)
    parts = []
    if max_grad_norm is not None:
        parts.append(optax.clip_by_global_norm(max_grad_norm))
    if wd == 0:
        parts.append(optax.adam(schedule, b1=b1, b2=b2, eps=eps))
    else:
        parts.append(
            optax.adamw(schedule, b1=b1, b2=b2, eps=eps, weight_decay=wd, mask=_wd_mask)
        )
    return optax.chain(*parts)
