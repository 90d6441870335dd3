"""Pipelined-vs-serial long-form A/B + device-saturation decomposition.

VERDICT r4 #6: ``MusicLM.to_pipelined`` (stage-per-device placement with
async dispatch overlap) was only ever measured for CORRECTNESS on CPU.
This script measures, on the current default device (one TPU chip under
the driver):

  1. serial long-form generate (the headline path),
  2. the same generate through ``to_pipelined`` over the available devices
     (one chip degenerates to the same placement — the A/B then bounds the
     placement machinery's overhead at zero expected win),
  3. a per-stage isolation decomposition at the SAME long-form geometry:
     sum(stage decode walls) vs the end-to-end wall. The gap is host/
     dispatch time the async structure already hides (or fails to hide);
     max(stage walls) is the 3-chip pipelined steady-state bound.

Interleaved round-robin reps (tunnel noise discipline, bench_flash_ab.py).

    python scripts/bench_pipelined_ab.py --batch 64 --seconds 16

Reference: serial loops open_musiclm.py:938-1023 (no pipelining exists
there at all).
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
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--seconds", type=float, default=16)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--json", action="store_true")
    args = p.parse_args()
    os.environ.setdefault("OPEN_MUSICLM_APPROX_TOPK", "1")

    from open_musiclm_tpu.config import init_stage, load_model_config
    from open_musiclm_tpu.models.encodec import EncodecModel, create_encodec_24khz
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

    stages = {}
    for name, i in (("semantic", 1), ("coarse", 2), ("fine", 3)):
        s = init_stage(mc, name, jax.random.fold_in(k, i), dtype=jnp.bfloat16)
        stages[name] = dataclasses.replace(
            s, params=cast(s.params), quantized=True, flash_kv="int8"
        )
    codec = create_encodec_24khz(
        bandwidth=mc.encodec_cfg.bandwidth,
        codebook_size=mc.encodec_cfg.codebook_size,
        dtype=jnp.bfloat16,
    )
    codec_params = cast(codec.init(jax.random.PRNGKey(4), jnp.zeros((1, 2400))))
    serial = MusicLM(
        clap=None,
        codec=codec,
        codec_params=codec_params,
        semantic_stage=stages["semantic"],
        coarse_stage=stages["coarse"],
        fine_stage=stages["fine"],
    )
    pipelined = serial.to_pipelined(jax.devices())

    b = args.batch
    nq_clap = mc.clap_rvq_cfg.rq_num_quantizers
    clap_ids = jax.random.randint(
        jax.random.PRNGKey(5), (b, nq_clap, 1), 0, mc.clap_rvq_cfg.codebook_size
    )
    gen_kw = dict(
        output_seconds=args.seconds,
        semantic_window_seconds=int(mc.global_cfg.semantic_audio_length_seconds),
        coarse_window_seconds=int(mc.global_cfg.coarse_audio_length_seconds),
        fine_window_seconds=int(mc.global_cfg.fine_audio_length_seconds),
    )

    def run(model, key):
        return np.asarray(model.generate(key=key, clap_token_ids=clap_ids, **gen_kw))

    variants = {"serial": serial, "pipelined": pipelined}
    for m in variants.values():  # compile
        wave = run(m, jax.random.PRNGKey(10))
    audio = wave.shape[0] * wave.shape[1] / codec.sample_rate

    times = {n: [] for n in variants}
    for r in range(args.reps):
        for n, m in variants.items():
            t0 = time.perf_counter()
            run(m, jax.random.PRNGKey(20 + r))
            times[n].append(time.perf_counter() - t0)

    # ---- per-stage isolation at the long-form geometry ----
    sem_hz = mc.hubert_kmeans_cfg.output_hz
    ac_hz = mc.encodec_cfg.output_hz
    g = mc.global_cfg
    sem_w = int(g.semantic_audio_length_seconds)
    coarse_w = int(g.coarse_audio_length_seconds)
    fine_w = int(g.fine_audio_length_seconds)

    def timed(fn, key, reps):
        np.asarray(fn(jax.random.PRNGKey(99)))  # warm
        t0 = time.perf_counter()
        for i in range(reps):
            out = fn(jax.random.fold_in(key, i))
        np.asarray(out)
        return (time.perf_counter() - t0) / reps

    clap2 = clap_ids.reshape(b, -1)
    # semantic: first window (full) + continuations to cover args.seconds
    n_sem_windows = 1 + max(
        0,
        -(-int((args.seconds - sem_w) * sem_hz) // int(sem_w * sem_hz // 2))
        if args.seconds > sem_w
        else 0,
    )
    t_sem_first = timed(
        lambda kk: stages["semantic"].generate(
            [clap2], kk, max_time_steps=int(sem_w * sem_hz)
        ),
        jax.random.PRNGKey(1),
        args.reps,
    )
    sem_cont_T = int(sem_w * sem_hz) - int(sem_w * sem_hz // 2)
    sem_init = jax.random.randint(
        jax.random.PRNGKey(6), (b, int(sem_w * sem_hz // 2)), 0, 1024
    )
    t_sem_cont = timed(
        lambda kk: stages["semantic"].generate(
            [clap2],
            kk,
            max_time_steps=int(sem_w * sem_hz),
            init_pred_ids=sem_init,
        ),
        jax.random.PRNGKey(2),
        args.reps,
    )
    sem_total = t_sem_first + (n_sem_windows - 1) * t_sem_cont

    n_coarse_windows = max(int(args.seconds) // coarse_w, 1)
    sem_win_ids = jax.random.randint(
        jax.random.PRNGKey(7), (b, int(coarse_w * sem_hz) - 1), 0, 1024
    )
    t_coarse = timed(
        lambda kk: stages["coarse"].generate(
            [clap2, sem_win_ids],
            kk,
            max_time_steps=int(coarse_w * ac_hz),
            temperature=0.95,
        ),
        jax.random.PRNGKey(3),
        args.reps,
    )
    coarse_total = n_coarse_windows * t_coarse

    n_fine_windows = max(int(args.seconds) // fine_w, 1)
    rows_cap = int(os.environ.get("OPEN_MUSICLM_MAX_FINE_ROWS", "256"))
    win_per_call = max(1, rows_cap // b)
    n_fine_calls = -(-n_fine_windows // win_per_call)
    rows = min(n_fine_windows, win_per_call) * b
    coarse_win_ids = jax.random.randint(
        jax.random.PRNGKey(8),
        (rows, int(fine_w * ac_hz) * g.num_coarse_quantizers),
        0,
        1024,
    )
    clap_rep = jnp.tile(clap2, (rows // b, 1))
    t_fine_call = timed(
        lambda kk: stages["fine"].generate(
            [clap_rep, coarse_win_ids],
            kk,
            max_time_steps=int(fine_w * ac_hz),
            temperature=0.4,
        ),
        jax.random.PRNGKey(4),
        args.reps,
    )
    fine_total = n_fine_calls * t_fine_call

    decode = jax.jit(lambda p_, c: codec.apply(p_, c, method=EncodecModel.decode))
    codes = jax.random.randint(
        jax.random.PRNGKey(9), (b, int(args.seconds * ac_hz), 8), 0, 1024
    )
    np.asarray(decode(codec_params, codes))
    t0 = time.perf_counter()
    np.asarray(decode(codec_params, codes))
    t_codec = time.perf_counter() - t0

    stage_sum = sem_total + coarse_total + fine_total + t_codec
    best = {n: min(ts) for n, ts in times.items()}
    out = {
        "batch": b,
        "seconds": args.seconds,
        "audio_seconds": round(float(audio), 1),
        "serial_s": round(best["serial"], 3),
        "serial_rt_x": round(audio / best["serial"], 1),
        "pipelined_s": round(best["pipelined"], 3),
        "pipelined_rt_x": round(audio / best["pipelined"], 1),
        "reps": {n: [round(t, 3) for t in ts] for n, ts in times.items()},
        "n_devices": len(jax.devices()),
        "decomposition_s": {
            "semantic": round(sem_total, 3),
            "coarse": round(coarse_total, 3),
            "fine": round(fine_total, 3),
            "encodec": round(t_codec, 3),
            "stage_sum": round(stage_sum, 3),
            "e2e_minus_sum_gap": round(best["serial"] - stage_sum, 3),
        },
        "three_chip_pipelined_bound_s": round(
            max(sem_total, coarse_total, fine_total + t_codec), 3
        ),
    }
    print(json.dumps(out, indent=None if args.json else 1))


if __name__ == "__main__":
    main()
