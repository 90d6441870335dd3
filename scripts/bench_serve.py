"""On-hardware serving-admission benchmark (VERDICT r3 next #8).

Measures what the GenerationServer docstring claims (serve.py): with bucket
geometries [1, N] and 2 workers, a lone request submitted WHILE a full batch
is in flight forms its own batch-1 bucket immediately (second worker) and
runs as soon as the device drains, instead of waiting out the full batch's
host sync plus its own batch formation.

Lanes (all on the real chip, serving config = bench.py defaults: int8
fused-FF + flash int8 KV + approx-topk, bf16):

  * full_batch_wall_s      — N requests submitted at once, time to all done
  * idle_lone_latency_s    — single request on an idle server (floor)
  * staggered_lone_latency — median latency of a lone request submitted
                             mid-full-batch, for 1 vs 2 workers

    python scripts/bench_serve.py [--batch 64] [--reps 3] [--json out.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--model", default="musiclm_small")
    ap.add_argument("--seconds", type=float, default=None,
                    help="clip length (default: one coarse window)")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--stagger_s", type=float, default=0.05,
                    help="delay after full-batch submit before the lone request")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/omt_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import dataclasses

    from open_musiclm_tpu.config import init_stage, load_model_config
    from open_musiclm_tpu.models.encodec import create_encodec_24khz
    from open_musiclm_tpu.models.musiclm import MusicLM
    from open_musiclm_tpu.serve import GenerationServer

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    mc = load_model_config(os.path.join(root, f"configs/model/{args.model}.json"))
    g = mc.global_cfg
    seconds = args.seconds or float(g.coarse_audio_length_seconds)

    os.environ.setdefault("OPEN_MUSICLM_APPROX_TOPK", "1")
    dtype = jnp.bfloat16
    k = jax.random.PRNGKey(0)

    def to_bf16(p):
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32
            else x,
            p,
        )

    stages = {}
    for i, name in enumerate(["semantic", "coarse", "fine"], 1):
        s = init_stage(mc, name, jax.random.fold_in(k, i), dtype=dtype)
        stages[name] = dataclasses.replace(
            s, params=to_bf16(s.params), quantized=True, flash_kv="int8"
        )
    codec = create_encodec_24khz(
        bandwidth=mc.encodec_cfg.bandwidth,
        codebook_size=mc.encodec_cfg.codebook_size,
        dtype=jnp.bfloat16,
    )
    codec_params = to_bf16(codec.init(jax.random.PRNGKey(4), jnp.zeros((1, 2400))))
    musiclm = MusicLM(
        clap=None,
        codec=codec,
        codec_params=codec_params,
        semantic_stage=stages["semantic"],
        coarse_stage=stages["coarse"],
        fine_stage=stages["fine"],
    )

    nq_clap = mc.clap_rvq_cfg.rq_num_quantizers
    rng = np.random.default_rng(0)

    def clap_ids():
        return rng.integers(0, mc.clap_rvq_cfg.codebook_size, (nq_clap, 1)).astype(np.int32)

    gen_kw = dict(
        output_seconds=seconds,
        semantic_window_seconds=int(g.semantic_audio_length_seconds),
        coarse_window_seconds=int(g.coarse_audio_length_seconds),
        fine_window_seconds=int(g.fine_audio_length_seconds),
    )
    B = args.batch

    def run_epoch(num_workers):
        """Returns (full_batch_wall, idle_lone, [staggered lone latencies])."""
        server = GenerationServer(
            musiclm,
            batch_size=B,
            batch_buckets=[1, B],
            batch_timeout_s=0.02,
            num_workers=num_workers,
            **gen_kw,
        ).start()
        try:
            # warm both bucket geometries (compile)
            server.submit(clap_token_ids=clap_ids(), seed=1).result()
            [f.result() for f in
             [server.submit(clap_token_ids=clap_ids(), seed=100 + i) for i in range(B)]]

            # idle lone-request latency (floor)
            idle = []
            for r in range(args.reps):
                t0 = time.perf_counter()
                server.submit(clap_token_ids=clap_ids(), seed=200 + r).result()
                idle.append(time.perf_counter() - t0)

            # full batch wall time
            walls = []
            for r in range(args.reps):
                t0 = time.perf_counter()
                futs = [
                    server.submit(clap_token_ids=clap_ids(), seed=300 + r * B + i)
                    for i in range(B)
                ]
                [f.result() for f in futs]
                walls.append(time.perf_counter() - t0)

            # staggered lone request mid-full-batch
            lone = []
            for r in range(args.reps):
                futs = [
                    server.submit(clap_token_ids=clap_ids(), seed=700 + r * B + i)
                    for i in range(B)
                ]
                time.sleep(args.stagger_s)
                t0 = time.perf_counter()
                server.submit(clap_token_ids=clap_ids(), seed=600 + r).result()
                lone.append(time.perf_counter() - t0)
                [f.result() for f in futs]
            return min(walls), min(idle), lone
        finally:
            server.stop()

    wall2, idle2, lone2 = run_epoch(num_workers=2)
    wall1, idle1, lone1 = run_epoch(num_workers=1)

    report = {
        "model": args.model,
        "batch": B,
        "output_seconds": seconds,
        "buckets": [1, B],
        "device": str(jax.devices()[0]),
        "full_batch_wall_s": round(min(wall1, wall2), 3),
        "idle_lone_latency_s": round(min(idle1, idle2), 3),
        "staggered_lone_latency_s": {
            "workers_1": {
                "median": round(float(np.median(lone1)), 3),
                "all": [round(t, 3) for t in lone1],
            },
            "workers_2": {
                "median": round(float(np.median(lone2)), 3),
                "all": [round(t, 3) for t in lone2],
            },
        },
        "stagger_after_s": args.stagger_s,
    }
    print(json.dumps(report))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
