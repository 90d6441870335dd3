"""Microbench: XLA decode-step attention vs the flash-decode kernel.

Times ONE layer's attention-over-cache at serving geometry across decode
positions, for (a) XLA full-buffer read, (b) Pallas early-exit bf16,
(c) Pallas early-exit int8 cache. Run on the real TPU:

    python scripts/bench_decode_attention.py --batch 32 --n 1280
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/omt_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from open_musiclm_tpu.ops.attention import shared_kv_decode_step
from open_musiclm_tpu.ops.decode_attention import (
    flash_decode_step,
    quantize_kv_row,
    round_up_chunk,
)


STEPS = 200  # steps per jit (dispatch latency >> device time per step)


def timed(fn, reps=3):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps / STEPS


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--n", type=int, default=1280)  # coarse max_len rounded
    p.add_argument("--heads", type=int, default=8)
    p.add_argument("--dh", type=int, default=64)
    args = p.parse_args()

    b, h, d = args.batch, args.heads, args.dh
    N = round_up_chunk(args.n)
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    q = jax.random.normal(ks[0], (b, h, d), jnp.float32).astype(jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, N, d), jnp.float32)
    k = (k / jnp.linalg.norm(k, axis=-1, keepdims=True)).astype(jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, N, d), jnp.float32).astype(jnp.bfloat16)
    table = jax.random.normal(ks[3], (2 * N - 1, h), jnp.float32)
    mask = jnp.ones((b, N), bool)
    add_mask = jnp.zeros((b, N), jnp.float32)
    kv = jnp.concatenate([k, v], axis=-1)  # packed [b, N, 2d]
    kq, ksc = jax.vmap(quantize_kv_row, in_axes=1, out_axes=1)(k)
    vq, vsc = jax.vmap(quantize_kv_row, in_axes=1, out_axes=1)(v)
    kvq = jnp.concatenate([kq, vq], axis=-1)
    sc = jnp.stack([ksc, vsc])

    # scan STEPS decode positions inside ONE jit so device time dominates
    # the remote-dispatch latency; positions ramp pos0 -> pos0+STEPS like a
    # real decode
    @jax.jit
    def xla_scan(pos0):
        def body(acc, i):
            out = shared_kv_decode_step(
                q, k, v, pos0 + i, scale=8.0, bias_table=table, key_mask=mask
            )
            return acc + jnp.sum(out), None
        acc, _ = jax.lax.scan(body, 0.0, jnp.arange(STEPS))
        return acc

    @functools.partial(jax.jit, static_argnums=1)
    def flash_scan(pos0, quant):
        def body(acc, i):
            pos = pos0 + i
            row = jax.lax.dynamic_slice(table, (N - 1 - pos, 0), (N, h))
            if quant:
                out = flash_decode_step(q, kvq, pos, row, add_mask, sc)
            else:
                out = flash_decode_step(q, kv, pos, row, add_mask)
            return acc + jnp.sum(out.astype(jnp.float32)), None
        acc, _ = jax.lax.scan(body, 0.0, jnp.arange(STEPS))
        return acc

    for frac in (0.25, 0.5, 0.75):
        pos0 = jnp.int32(int(N * frac) - 1 - STEPS // 2)
        t_xla = timed(lambda: xla_scan(pos0)) * 1e6
        t_bf16 = timed(lambda: flash_scan(pos0, False)) * 1e6
        t_int8 = timed(lambda: flash_scan(pos0, True)) * 1e6
        print(
            f"pos~{int(pos0) + STEPS // 2:5d} ({frac:.2f}N)  xla {t_xla:7.1f} us   "
            f"flash-bf16 {t_bf16:7.1f} us ({t_xla / t_bf16:.2f}x)   "
            f"flash-int8 {t_int8:7.1f} us ({t_xla / t_int8:.2f}x)"
        )


if __name__ == "__main__":
    main()
