"""K-means: TPU-fused predict + minibatch Lloyd's fit.

Replaces the reference's sklearn ``MiniBatchKMeans`` semantic-token assignment
(hf_hubert_kmeans.py:87-88), which forced a device->CPU->device round trip on
every semantic tokenization. ``kmeans_predict`` is a single [n, D] x [D, K]
matmul + argmin that fuses into the surrounding XLA program; the fit is
count-weighted minibatch Lloyd's (Sculley 2010, same family as sklearn's) in
``lax.scan`` for the offline codebook-learning job
(hf_hubert_kmeans.py:97-151).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class KMeansState(NamedTuple):
    centroids: jnp.ndarray  # [K, D]
    counts: jnp.ndarray  # [K]


def kmeans_predict(x: jnp.ndarray, centroids: jnp.ndarray) -> jnp.ndarray:
    """x: [..., D], centroids: [K, D] -> indices [...]. Exact argmin of
    euclidean distance (ties -> lowest index, like sklearn)."""
    flat = x.reshape(-1, x.shape[-1])
    dots = jnp.einsum("nd,kd->nk", flat, centroids)
    c2 = jnp.sum(jnp.square(centroids), axis=-1)
    idx = jnp.argmin(c2[None, :] - 2.0 * dots, axis=-1)
    return idx.reshape(x.shape[:-1])


def _plus_plus_lite_init(x: jnp.ndarray, k: int, key: jax.Array) -> jnp.ndarray:
    """k-means++ init: D^2-weighted sequential sampling (lax.scan over k)."""
    n, d = x.shape
    k0, key = jax.random.split(key)
    first = x[jax.random.randint(k0, (), 0, n)]
    cents0 = jnp.zeros((k, d), x.dtype).at[0].set(first)
    d2_0 = jnp.sum(jnp.square(x - first), axis=-1)

    def step(carry, i):
        cents, d2, key = carry
        key, sub = jax.random.split(key)
        probs = d2 / jnp.maximum(jnp.sum(d2), 1e-12)
        idx = jax.random.categorical(sub, jnp.log(probs + 1e-20))
        c = x[idx]
        cents = cents.at[i].set(c)
        d2 = jnp.minimum(d2, jnp.sum(jnp.square(x - c), axis=-1))
        return (cents, d2, key), None

    (cents, _, _), _ = jax.lax.scan(step, (cents0, d2_0, key), jnp.arange(1, k))
    return cents


def kmeans_fit(
    x: jnp.ndarray, k: int, key: jax.Array, num_iters: int = 50
) -> jnp.ndarray:
    """Full-batch Lloyd's on one array [n, D] -> centroids [K, D]."""
    cents = _plus_plus_lite_init(x, k, key)

    def step(cents, _):
        idx = kmeans_predict(x, cents)
        onehot = jax.nn.one_hot(idx, k, dtype=x.dtype)
        counts = jnp.sum(onehot, axis=0)
        sums = jnp.einsum("nk,nd->kd", onehot, x)
        new = jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts, 1)[:, None], cents)
        return new, None

    cents, _ = jax.lax.scan(step, cents, None, length=num_iters)
    return cents


def minibatch_kmeans_init(x0: jnp.ndarray, k: int, key: jax.Array) -> KMeansState:
    return KMeansState(centroids=_plus_plus_lite_init(x0, k, key), counts=jnp.zeros(k))


def minibatch_kmeans_update(state: KMeansState, batch: jnp.ndarray) -> KMeansState:
    """One count-weighted minibatch update (Sculley web-scale k-means)."""
    k = state.centroids.shape[0]
    idx = kmeans_predict(batch, state.centroids)
    onehot = jax.nn.one_hot(idx, k, dtype=batch.dtype)
    n_assigned = jnp.sum(onehot, axis=0)
    sums = jnp.einsum("nk,nd->kd", onehot, batch)
    new_counts = state.counts + n_assigned
    # c <- c + (mean_assigned - c) * n_assigned / new_counts
    target = jnp.where(
        n_assigned[:, None] > 0, sums / jnp.maximum(n_assigned, 1)[:, None], state.centroids
    )
    lr = jnp.where(new_counts > 0, n_assigned / jnp.maximum(new_counts, 1), 0.0)
    cents = state.centroids + (target - state.centroids) * lr[:, None]
    return KMeansState(centroids=cents, counts=new_counts)


def kmeans_inertia(x: jnp.ndarray, centroids: jnp.ndarray) -> jnp.ndarray:
    idx = kmeans_predict(x, centroids)
    return jnp.mean(jnp.sum(jnp.square(x - centroids[idx]), axis=-1))
