"""Single-process interleaved A/B of the serving decode configurations.

The tunneled chip shows +-15% run-to-run interference, so cross-process
comparisons are unreliable. This script builds the stages ONCE, then times
each flash_kv mode (off / bf16 / int8) interleaved round-robin, best-of-N
per mode — external noise hits all modes equally.

    python scripts/bench_flash_ab.py --batch 32 --reps 4
"""

import argparse
import dataclasses
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
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--seconds", type=float, default=4)
    p.add_argument("--reps", type=int, default=4)
    p.add_argument("--modes", default="off,bf16,f32,int8")
    args = p.parse_args()

    from open_musiclm_tpu.config import init_stage, load_model_config
    from open_musiclm_tpu.models.encodec import create_encodec_24khz
    from open_musiclm_tpu.models.musiclm import MusicLM

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    mc = load_model_config(os.path.join(root, "configs/model/musiclm_small.json"))
    dtype = jnp.bfloat16
    k = jax.random.PRNGKey(0)

    def cast(prm):
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32
            else x,
            prm,
        )

    stages = {}
    for name, i in (("semantic", 1), ("coarse", 2), ("fine", 3)):
        s = init_stage(mc, name, jax.random.fold_in(k, i), dtype=dtype)
        stages[name] = dataclasses.replace(s, params=cast(s.params), quantized=True)

    codec = create_encodec_24khz(
        bandwidth=mc.encodec_cfg.bandwidth,
        codebook_size=mc.encodec_cfg.codebook_size,
        dtype=jnp.bfloat16,
    )
    codec_params = cast(codec.init(jax.random.PRNGKey(4), jnp.zeros((1, 2400))))

    def build(flash):
        fk = None if flash == "off" else flash
        return MusicLM(
            clap=None,
            codec=codec,
            codec_params=codec_params,
            semantic_stage=dataclasses.replace(stages["semantic"], flash_kv=fk),
            coarse_stage=dataclasses.replace(stages["coarse"], flash_kv=fk),
            fine_stage=dataclasses.replace(stages["fine"], flash_kv=fk),
        )

    modes = args.modes.split(",")
    models = {m: build(m) for m in modes}
    clap_tokens = jax.random.randint(
        jax.random.PRNGKey(5),
        (args.batch, mc.clap_rvq_cfg.rq_num_quantizers, 1),
        0,
        mc.clap_rvq_cfg.codebook_size,
    )
    gen_kw = dict(
        output_seconds=args.seconds,
        semantic_window_seconds=int(mc.global_cfg.semantic_audio_length_seconds),
        coarse_window_seconds=int(mc.global_cfg.coarse_audio_length_seconds),
        fine_window_seconds=int(mc.global_cfg.fine_audio_length_seconds),
    )

    def run(model, key):
        return np.asarray(
            model.generate(key=key, clap_token_ids=clap_tokens, **gen_kw)
        )

    for m in modes:  # compile
        wave = run(models[m], jax.random.PRNGKey(10))
    audio = wave.shape[0] * wave.shape[1] / codec.sample_rate

    times = {m: [] for m in modes}
    for r in range(args.reps):  # interleaved round-robin
        for m in modes:
            t0 = time.perf_counter()
            run(models[m], jax.random.PRNGKey(20 + r))
            times[m].append(time.perf_counter() - t0)

    for m in modes:
        best = min(times[m])
        allr = " ".join(f"{t:.3f}" for t in times[m])
        print(f"flash_kv={m:5s}  best {best:.3f}s = {audio / best:6.1f}x RT   reps: {allr}")


if __name__ == "__main__":
    main()
