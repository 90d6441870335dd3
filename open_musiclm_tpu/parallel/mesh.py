"""Device mesh + sharding rules.

The reference's only parallelism is HF-Accelerate DDP (trainer.py:154-155,
294-304; SURVEY.md 2.3). The TPU-native equivalent is a
``jax.sharding.Mesh`` with a data axis: the batch is sharded over ``dp``,
parameters are replicated, and XLA inserts the gradient ``psum`` over ICI
automatically when the jitted train step consumes sharded batches and emits
replicated gradients. A model axis (``tp``) is reserved for tensor-parallel
sharding of the 24-layer musiclm_large stages.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "dp"
MODEL_AXIS = "tp"


def make_mesh(
    dp: Optional[int] = None, tp: int = 1, devices: Optional[Sequence[jax.Device]] = None
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if dp is None:
        dp = len(devices) // tp
    assert dp * tp <= len(devices), f"need {dp * tp} devices, have {len(devices)}"
    grid = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, batch_axis: int = 0, ndim: int = 2) -> NamedSharding:
    spec = [None] * ndim
    spec[batch_axis] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))


def shard_batch_pytree(mesh: Mesh, batch, batch_axis: int = 0):
    """device_put every leaf with its batch axis sharded over dp."""

    def put(x):
        return jax.device_put(x, batch_sharding(mesh, batch_axis, x.ndim))

    return jax.tree_util.tree_map(put, batch)


def replicate_pytree(mesh: Mesh, tree):
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, replicated(mesh)), tree)
