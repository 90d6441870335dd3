"""Dropout-grade fast random bits.

``jax.random.bernoulli`` generates its bits with threefry2x32 — a
counter-based crypto-ish PRNG that costs tens of VPU ops per 32-bit word.
A training step of a musiclm stage draws a dropout mask over the [b, n,
2*ffi] feed-forward stream in EVERY layer (~50M draws per layer per
microbatch at the reference geometries), so threefry puts a measurable
floor under the step time (see BENCHMARKS.md round-4 attribution).

``fast_bernoulli`` swaps the bit source for ``lax.rng_bit_generator`` —
XLA's stateless hardware RNG (Philox/default algorithm), which runs at
near-memory-bandwidth on TPU — and compares the raw uint32 stream against
``round(p * 2^32)`` (exact to 2^-32, no float conversion pass). Dropout
does not need crypto-grade stream separation: distinct flax 'dropout' RNG
keys (already threefry-derived per call site) seed distinct generator
states, which is all mask decorrelation requires.

On CPU backends (tests, goldens) it falls back to plain
``jax.random.bernoulli`` so every existing CPU-deterministic artifact is
unchanged; set OPEN_MUSICLM_THREEFRY_DROPOUT=1 to force the fallback on
TPU too (the bench A/B knob).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def _fast_bits_available() -> bool:
    if os.environ.get("OPEN_MUSICLM_THREEFRY_DROPOUT") == "1":
        return False
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


def _key_words(rng: jax.Array) -> jnp.ndarray:
    """uint32[4] generator state from a (typed or raw) threefry key."""
    if jnp.issubdtype(rng.dtype, jax.dtypes.prng_key):
        data = jax.random.key_data(rng)
    else:
        data = rng
    data = jnp.asarray(data, jnp.uint32).reshape(-1)
    return jnp.tile(data, 4)[:4]


def fast_bernoulli(rng: jax.Array, p: float, shape) -> jnp.ndarray:
    """Bernoulli(p) mask; TPU: rng_bit_generator, CPU: jax.random.bernoulli."""
    if not _fast_bits_available():
        return jax.random.bernoulli(rng, p, shape)
    _, bits = jax.lax.rng_bit_generator(_key_words(rng), shape, dtype=jnp.uint32)
    threshold = jnp.uint32(min(int(round(p * 2**32)), 2**32 - 1))
    return bits < threshold
