"""Parameter sharding rules: data-parallel replication + optional tensor
parallelism over the ``tp`` mesh axis.

The reference scales only by DDP (SURVEY.md 2.3). For the 24-layer
musiclm_large stages a second axis pays off: attention/FF weight matrices
shard over ``tp`` and XLA inserts the activation collectives. Rules are
name-based over the flax param tree:

  * ``to_q``, ``proj_in`` kernels: shard the OUTPUT feature dim (column
    parallel — activations stay sharded through the nonlinearity);
  * ``to_out``, ``proj_out`` kernels: shard the INPUT dim (row parallel —
    XLA emits one psum per block);
  * embeddings / logit heads: shard the vocab dim;
  * everything else (norms, scales, biases, small tables): replicated.

Apply with ``shard_params``; pass the resulting tree of NamedShardings as
jit in_shardings / device_put targets.
"""

from __future__ import annotations

import re
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS

# (path regex, partition spec builder taking param ndim)
RULES = [
    (r"(to_q|to_kv|proj_in|qkv|mlp_fc1|ff_intermediate|intermediate)/kernel$",
     lambda nd: P(*([None] * (nd - 1) + [MODEL_AXIS]))),
    (r"(to_out|proj_out|mlp_fc2|ff_output|output)/kernel$",
     lambda nd: P(*([MODEL_AXIS] + [None] * (nd - 1)))),
    (r"embed_\d+/embedding$", lambda nd: P(MODEL_AXIS, None)),
    (r"logits_\d+$", lambda nd: P(None, MODEL_AXIS, None)),
]


def spec_for(path: str, ndim: int, tp: int, shape) -> P:
    if tp <= 1:
        return P()
    for pattern, builder in RULES:
        if re.search(pattern, path):
            spec = builder(ndim)
            # only shard if the dim divides evenly
            for axis_i, name in enumerate(spec):
                if name == MODEL_AXIS and shape[axis_i] % tp != 0:
                    return P()
            return spec
    return P()


def param_shardings(mesh: Mesh, params: Any) -> Any:
    """Tree of NamedShardings matching `params` under the given mesh."""
    tp = mesh.shape.get(MODEL_AXIS, 1)
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = []
    for path, leaf in flat:
        path_str = "/".join(
            getattr(k, "key", getattr(k, "name", str(k))) for k in path
        )
        out.append(NamedSharding(mesh, spec_for(path_str, leaf.ndim, tp, leaf.shape)))
    return jax.tree_util.tree_unflatten(treedef, out)


def shard_params(mesh: Mesh, params: Any) -> Any:
    """device_put every param with its rule-derived sharding.

    On a 1-device mesh every sharding is the trivial full placement, so the
    params are put WITHOUT a NamedSharding: committed-to-mesh arrays are
    semantically identical there, but remote-tunneled backends (axon)
    dispatch committed-array jit calls through a path measured ~60x slower
    per step (4.3 s vs 65 ms on the semantic train step)."""
    if mesh.size == 1:
        return jax.tree_util.tree_map(jnp.asarray, params)
    shardings = param_shardings(mesh, params)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
