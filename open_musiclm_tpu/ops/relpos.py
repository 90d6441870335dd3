"""Relative position biases.

Two variants matching the reference capability surface:
  * continuous MLP bias (reference transformer.py:36-67, from SwinV2)
  * T5 bucketed bias (reference transformer.py:69-117)

TPU-first design note: both biases are pure functions of the *distance*
``d = i - j``. For training we materialize the [h, n, n] matrix once per
forward (O(n) MLP evals gathered into the matrix, not O(n^2)). For KV-cached
decode we precompute a ``[max_len, heads]`` causal distance table once per
generation call; each decode step gathers its bias row from the table instead
of rerunning the MLP.
"""

from __future__ import annotations

import math
import os
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp


def toeplitz_from_table(table: jnp.ndarray, n: int) -> jnp.ndarray:
    """[2n-1, h] distance table -> [n, n, h] with out[i, j] = table[i-j+n-1].

    Built from tile + reshape + slice ONLY — no gather. The naive
    ``table[rel]`` with an [n, n] index matrix lowers to an n^2-row gather
    whose BACKWARD is an n^2-element scatter-add into 2n-1 rows; XLA:TPU
    scatters with colliding indices serialize badly, and this runs inside
    every training forward. The reshape construction is element-identical
    (tested vs the gather in test_transformer.py) and its backward is a
    dense reshape+reduce.

    Derivation: let rb = concat(reverse(table), zeros(1)) of length 2n.
    tile(rb, n)[: n*(2n-1)].reshape(n, 2n-1)[i, m] = rb[(m - i) mod 2n];
    choosing m = j + n - 1 gives rb[j + n - 1 - i] = table[i - j + n - 1]
    for all |i - j| <= n - 1 (the index never wraps or hits the pad row).
    """
    h = table.shape[-1]
    rb = jnp.concatenate(
        [table[::-1], jnp.zeros((1, h), table.dtype)], axis=0
    )  # [2n, h]
    e = jnp.tile(rb, (n, 1))[: n * (2 * n - 1)].reshape(n, 2 * n - 1, h)
    return e[:, n - 1 :, :]


class ContinuousPositionBias(nn.Module):
    """3-layer SiLU MLP: scalar distance -> per-head bias."""

    dim: int
    heads: int
    num_layers: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def mlp(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: [..., 1] float distances. Reference structure (transformer.py:46-53):
        # Seq(Linear(1,dim),SiLU) + (num_layers-1) x Seq(Linear(dim,dim),SiLU)
        # + Linear(dim,heads) — note num_layers counts SiLU blocks, so
        # num_layers=3 means FOUR linear layers total.
        h = nn.Dense(self.dim, use_bias=True, dtype=self.dtype, name="in_layer")(x)
        h = nn.silu(h)
        for i in range(self.num_layers - 1):
            h = nn.Dense(self.dim, use_bias=True, dtype=self.dtype, name=f"mid_layer_{i}")(h)
            h = nn.silu(h)
        return nn.Dense(self.heads, use_bias=True, dtype=self.dtype, name="out_layer")(h)

    def __call__(self, n: int) -> jnp.ndarray:
        """Full bias matrix [heads, n, n] for training/prefill."""
        dist = jnp.arange(-n + 1, n, dtype=self.dtype)[:, None]  # [2n-1, 1]
        table = self.mlp(dist)  # [2n-1, heads]
        if os.environ.get("OPEN_MUSICLM_RELPOS_GATHER") == "1":
            # legacy gather path, kept for A/B measurement
            i = jnp.arange(n)[:, None]
            j = jnp.arange(n)[None, :]
            rel = i - j + (n - 1)  # in [0, 2n-2]
            bias = table[rel]  # [n, n, heads]
        else:
            bias = toeplitz_from_table(table, n)
        return jnp.transpose(bias, (2, 0, 1))

    def distance_table(self, max_len: int) -> jnp.ndarray:
        """Causal distance table [max_len, heads]; row d = bias at distance d."""
        dist = jnp.arange(0, max_len, dtype=self.dtype)[:, None]
        return self.mlp(dist)


def t5_relative_bucket(
    rel_pos: jnp.ndarray, causal: bool = True, num_buckets: int = 32, max_distance: int = 128
) -> jnp.ndarray:
    """Bucket ids for T5-style bias (reference transformer.py:85-105)."""
    ret = jnp.zeros_like(rel_pos)
    n = -rel_pos
    if not causal:
        num_buckets //= 2
        ret = ret + (n < 0).astype(jnp.int32) * num_buckets
        n = jnp.abs(n)
    else:
        n = jnp.maximum(n, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(jnp.maximum(n, 1).astype(jnp.float32) / max_exact)
        / math.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


class T5RelativePositionBias(nn.Module):
    heads: int
    num_buckets: int = 32
    max_distance: int = 128
    causal: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def _embed(self, buckets: jnp.ndarray) -> jnp.ndarray:
        table = self.param(
            "embedding",
            nn.initializers.normal(stddev=1.0),
            (self.num_buckets, self.heads),
            self.dtype,
        )
        return table[buckets]

    def __call__(self, n: int) -> jnp.ndarray:
        # bucket ids depend only on the distance i - j, so embed the
        # [2n-1] distance axis once and build the Toeplitz matrix from
        # reshapes (see toeplitz_from_table — avoids the n^2 gather and
        # its scatter-add backward into the embedding)
        dist = jnp.arange(-n + 1, n)
        buckets = t5_relative_bucket(
            dist, causal=self.causal, num_buckets=self.num_buckets,
            max_distance=self.max_distance,
        )
        table = self._embed(buckets)  # [2n-1, heads]
        if os.environ.get("OPEN_MUSICLM_RELPOS_GATHER") == "1":
            i = jnp.arange(n)[:, None]
            j = jnp.arange(n)[None, :]
            bias = table[i - j + (n - 1)]
        else:
            bias = toeplitz_from_table(table, n)
        return jnp.transpose(bias, (2, 0, 1))

    def distance_table(self, max_len: int) -> jnp.ndarray:
        d = jnp.arange(max_len)[:, None]
        buckets = t5_relative_bucket(
            d, causal=self.causal, num_buckets=self.num_buckets, max_distance=self.max_distance
        )[:, 0]
        return self._embed(buckets)


def make_bias(
    kind: str, dim: int, heads: int, dtype=jnp.float32
) -> Optional[nn.Module]:
    if kind == "continuous":
        return ContinuousPositionBias(dim=dim // 2, heads=heads, dtype=dtype)
    if kind == "t5":
        return T5RelativePositionBias(heads=heads, dtype=dtype)
    if kind == "none":
        return None
    raise ValueError(f"invalid relative position bias type: {kind}")
