"""Single-process interleaved serving batch sweep (throughput peak finder).

The r2 sweep (off-the-shelf stack: no flash KV) peaked at batch 64; the
flash int8 KV cache halves the per-row cache traffic that caused the
batch-128 regression, so the optimal batch has plausibly moved. This
script builds the stages ONCE with the CURRENT default serving stack
(int8 weights + flash int8 KV + approx-topk), compiles every batch
geometry, then times the batches interleaved round-robin best-of-N —
tunnel interference hits all batches equally (same discipline as
bench_flash_ab.py).

    python scripts/bench_batch_sweep.py --batches 32,64,128,192 --reps 4

Decode-cost context: DESIGN.md §2; reference decode loop
open_musiclm.py:299-319 (no batching knobs there — this sweep is a
capability the reference lacks).
"""

import argparse
import dataclasses
import json
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", default="32,64,128,192")
    p.add_argument("--seconds", type=float, default=4)
    p.add_argument("--reps", type=int, default=4)
    p.add_argument("--flash_kv", default="int8", help="off|bf16|f32|int8")
    p.add_argument("--json", action="store_true")
    args = p.parse_args()
    os.environ.setdefault("OPEN_MUSICLM_APPROX_TOPK", "1")

    from open_musiclm_tpu.config import init_stage, load_model_config
    from open_musiclm_tpu.models.encodec import create_encodec_24khz
    from open_musiclm_tpu.models.musiclm import MusicLM

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    mc = load_model_config(os.path.join(root, "configs/model/musiclm_small.json"))
    k = jax.random.PRNGKey(0)

    def cast(prm):
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32
            else x,
            prm,
        )

    fk = None if args.flash_kv == "off" else args.flash_kv
    stages = {}
    for name, i in (("semantic", 1), ("coarse", 2), ("fine", 3)):
        s = init_stage(mc, name, jax.random.fold_in(k, i), dtype=jnp.bfloat16)
        stages[name] = dataclasses.replace(
            s, params=cast(s.params), quantized=True, flash_kv=fk
        )

    codec = create_encodec_24khz(
        bandwidth=mc.encodec_cfg.bandwidth,
        codebook_size=mc.encodec_cfg.codebook_size,
        dtype=jnp.bfloat16,
    )
    codec_params = cast(codec.init(jax.random.PRNGKey(4), jnp.zeros((1, 2400))))
    musiclm = MusicLM(
        clap=None,
        codec=codec,
        codec_params=codec_params,
        semantic_stage=stages["semantic"],
        coarse_stage=stages["coarse"],
        fine_stage=stages["fine"],
    )
    gen_kw = dict(
        output_seconds=args.seconds,
        semantic_window_seconds=int(mc.global_cfg.semantic_audio_length_seconds),
        coarse_window_seconds=int(mc.global_cfg.coarse_audio_length_seconds),
        fine_window_seconds=int(mc.global_cfg.fine_audio_length_seconds),
    )

    batches = [int(b) for b in args.batches.split(",")]
    claps = {
        b: jax.random.randint(
            jax.random.PRNGKey(5),
            (b, mc.clap_rvq_cfg.rq_num_quantizers, 1),
            0,
            mc.clap_rvq_cfg.codebook_size,
        )
        for b in batches
    }

    def run(b, key):
        return np.asarray(
            musiclm.generate(key=key, clap_token_ids=claps[b], **gen_kw)
        )

    audio = {}
    for b in batches:  # compile every geometry first
        wave = run(b, jax.random.PRNGKey(10))
        audio[b] = wave.shape[0] * wave.shape[1] / codec.sample_rate

    times = {b: [] for b in batches}
    for r in range(args.reps):  # interleaved round-robin
        for b in batches:
            t0 = time.perf_counter()
            run(b, jax.random.PRNGKey(20 + r))
            times[b].append(time.perf_counter() - t0)

    rows = []
    for b in batches:
        best = min(times[b])
        rows.append(
            {
                "batch": b,
                "best_s": round(best, 3),
                "rt_x": round(audio[b] / best, 1),
                "reps_s": [round(t, 3) for t in times[b]],
            }
        )
        if not args.json:
            allr = " ".join(f"{t:.3f}" for t in times[b])
            print(
                f"batch={b:4d}  best {best:.3f}s = {audio[b] / best:6.1f}x RT"
                f"   reps: {allr}"
            )
    if args.json:
        print(json.dumps({"flash_kv": args.flash_kv, "sweep": rows}))


if __name__ == "__main__":
    main()
