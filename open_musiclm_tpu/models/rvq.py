"""Residual vector quantization — TPU-native, pure-functional.

Replaces the reference's external ``vector_quantize_pytorch.ResidualVQ``
(used at clap_quantized.py:10,38 for the CLAP conditioning tokens) and the
RVQ inside Encodec. Inference is a static unrolled loop of Q nearest-code
lookups (one [n, D] x [D, K] matmul each — MXU work, no host fallback);
training is EMA codebook learning expressed as a pure state transition so it
jits and shards with the rest of the pipeline.

State layout per quantizer: codebook [K, D], EMA cluster sizes [K], EMA
embed sums [K, D]. K-means init on the first training batch mirrors
``kmeans_init=True``; dead codes (EMA size < threshold) are re-seeded from
batch samples like ``threshold_ema_dead_code`` (clap_quantized.py:41-46).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .kmeans import kmeans_fit


class RVQState(NamedTuple):
    codebooks: jnp.ndarray  # [Q, K, D]
    cluster_size: jnp.ndarray  # [Q, K]
    embed_avg: jnp.ndarray  # [Q, K, D]
    initted: jnp.ndarray  # [] bool


def rvq_init(
    num_quantizers: int, codebook_size: int, dim: int, key: jax.Array
) -> RVQState:
    codebooks = jax.random.normal(key, (num_quantizers, codebook_size, dim))
    return RVQState(
        codebooks=codebooks,
        cluster_size=jnp.zeros((num_quantizers, codebook_size)),
        embed_avg=codebooks.copy(),
        initted=jnp.array(False),
    )


def _nearest(x: jnp.ndarray, codebook: jnp.ndarray) -> jnp.ndarray:
    """x: [n, D], codebook: [K, D] -> indices [n]."""
    # argmin ||x - c||^2 = argmax (2 x.c - ||c||^2); x^2 constant per row
    dots = jnp.einsum("nd,kd->nk", x, codebook)
    c2 = jnp.sum(jnp.square(codebook), axis=-1)
    return jnp.argmax(2.0 * dots - c2[None, :], axis=-1)


def rvq_encode(state: RVQState, x: jnp.ndarray) -> jnp.ndarray:
    """x: [n, D] -> indices [n, Q]."""
    resid = x
    idxs = []
    for q in range(state.codebooks.shape[0]):
        cb = state.codebooks[q]
        idx = _nearest(resid, cb)
        resid = resid - cb[idx]
        idxs.append(idx)
    return jnp.stack(idxs, axis=-1)


def rvq_decode(state: RVQState, indices: jnp.ndarray) -> jnp.ndarray:
    """indices: [n, Q] -> reconstruction [n, D]."""
    out = jnp.zeros(indices.shape[:-1] + (state.codebooks.shape[-1],))
    for q in range(state.codebooks.shape[0]):
        out = out + state.codebooks[q][indices[..., q]]
    return out


def rvq_quantize(state: RVQState, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (quantized [n, D], indices [n, Q])."""
    idx = rvq_encode(state, x)
    return rvq_decode(state, idx), idx


def _kmeans_seed(x: jnp.ndarray, k: int, key: jax.Array, iters: int = 10) -> jnp.ndarray:
    return kmeans_fit(x, k, key, num_iters=iters)


def rvq_update(
    state: RVQState,
    x: jnp.ndarray,
    key: jax.Array,
    *,
    decay: float = 0.95,
    epsilon: float = 1e-5,
    threshold_ema_dead_code: float = 0.0,
) -> Tuple[RVQState, jnp.ndarray, jnp.ndarray]:
    """One EMA training step. Returns (new_state, quantized, indices)."""
    Q, K, D = state.codebooks.shape
    n = x.shape[0]

    def init_from_batch(st: RVQState) -> RVQState:
        cbs = []
        resid = x
        for q in range(Q):
            cb = _kmeans_seed(resid, K, jax.random.fold_in(key, q))
            idx = _nearest(resid, cb)
            resid = resid - cb[idx]
            cbs.append(cb)
        cb_arr = jnp.stack(cbs)
        return RVQState(
            codebooks=cb_arr,
            cluster_size=jnp.ones((Q, K)),
            embed_avg=cb_arr.copy(),
            initted=jnp.array(True),
        )

    state = jax.lax.cond(state.initted, lambda s: s, init_from_batch, state)

    new_cb, new_sz, new_avg = [], [], []
    resid = x
    idxs = []
    quant = jnp.zeros_like(x)
    for q in range(Q):
        cb = state.codebooks[q]
        idx = _nearest(resid, cb)
        onehot = jax.nn.one_hot(idx, K, dtype=x.dtype)  # [n, K]
        counts = jnp.sum(onehot, axis=0)  # [K]
        embed_sum = jnp.einsum("nk,nd->kd", onehot, resid)

        sz = state.cluster_size[q] * decay + counts * (1.0 - decay)
        avg = state.embed_avg[q] * decay + embed_sum * (1.0 - decay)
        # Laplace-smoothed normalization
        total = jnp.sum(sz)
        smoothed = (sz + epsilon) / (total + K * epsilon) * total
        cb_new = avg / smoothed[:, None]

        if threshold_ema_dead_code > 0:
            dead = sz < threshold_ema_dead_code
            samples = resid[
                jax.random.randint(jax.random.fold_in(key, 1000 + q), (K,), 0, n)
            ]
            cb_new = jnp.where(dead[:, None], samples, cb_new)
            sz = jnp.where(dead, jnp.maximum(sz, threshold_ema_dead_code), sz)
            avg = jnp.where(dead[:, None], samples * sz[:, None], avg)

        quant = quant + cb_new[idx]
        resid = resid - cb[idx]  # residual uses pre-update codebook
        idxs.append(idx)
        new_cb.append(cb_new)
        new_sz.append(sz)
        new_avg.append(avg)

    new_state = RVQState(
        codebooks=jnp.stack(new_cb),
        cluster_size=jnp.stack(new_sz),
        embed_avg=jnp.stack(new_avg),
        initted=jnp.array(True),
    )
    return new_state, quant, jnp.stack(idxs, axis=-1)
