"""Per-component wall-time breakdown of the generation pipeline on the
current default device (one TPU chip under the driver).

Times each piece in isolation at a given batch: stage AR decodes (per
window geometry), stage prefills, Encodec decode, CLAP text tower.
Prints a JSON breakdown — use it to pick the next kernel target.

    python scripts/profile_pipeline.py --batch 16 --seconds 4
"""

import argparse
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


def timed(fn, *args, reps=3, **kw):
    np.asarray(fn(*args, **kw))  # warm/compile (np forces device sync)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
    np.asarray(out)
    return (time.perf_counter() - t0) / reps


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--seconds", type=float, default=4)
    p.add_argument("--int8", type=int, default=1)
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args()

    import dataclasses

    from open_musiclm_tpu.config import init_stage, load_model_config
    from open_musiclm_tpu.models.encodec import EncodecModel, create_encodec_24khz

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
    for i, name in enumerate(("semantic", "coarse", "fine")):
        s = init_stage(mc, name, jax.random.fold_in(k, i + 1), dtype=dtype)
        s = dataclasses.replace(s, params=cast(s.params), quantized=bool(args.int8))
        stages[name] = s

    b = args.batch
    sem_hz = mc.hubert_kmeans_cfg.output_hz
    ac_hz = mc.encodec_cfg.output_hz
    nq_clap = mc.clap_rvq_cfg.rq_num_quantizers
    report = {"batch": b, "seconds": args.seconds, "int8": bool(args.int8),
              "device": str(jax.devices()[0])}

    clap_ids = jax.random.randint(jax.random.PRNGKey(5), (b, nq_clap), 0, 1024)

    # stage decodes at pipeline window geometries
    sem_T = int(min(args.seconds, mc.global_cfg.semantic_audio_length_seconds) * sem_hz)
    report["semantic_window_s"] = timed(
        lambda kk: stages["semantic"].generate([clap_ids], kk, max_time_steps=sem_T),
        jax.random.PRNGKey(1), reps=args.reps,
    )
    sem_win = jax.random.randint(
        jax.random.PRNGKey(6), (b, int(4 * sem_hz) - 1), 0, 1024
    )
    coarse_T = int(4 * ac_hz)
    report["coarse_window_s"] = timed(
        lambda kk: stages["coarse"].generate(
            [clap_ids, sem_win], kk, max_time_steps=coarse_T, temperature=0.95
        ),
        jax.random.PRNGKey(2), reps=args.reps,
    )
    n_fine_windows = max(int(args.seconds) // 2, 1)
    coarse_win = jax.random.randint(
        jax.random.PRNGKey(7), (b * n_fine_windows, int(2 * ac_hz) * 3), 0, 1024
    )
    clap_rep = jnp.tile(clap_ids, (n_fine_windows, 1))
    report["fine_batched_s"] = timed(
        lambda kk: stages["fine"].generate(
            [clap_rep, coarse_win], kk, max_time_steps=int(2 * ac_hz), temperature=0.4
        ),
        jax.random.PRNGKey(3), reps=args.reps,
    )

    # Encodec decode of the full clip
    codec = create_encodec_24khz(
        bandwidth=mc.encodec_cfg.bandwidth,
        codebook_size=mc.encodec_cfg.codebook_size,
        dtype=jnp.bfloat16,
    )
    codec_params = cast(codec.init(jax.random.PRNGKey(4), jnp.zeros((1, 2400))))
    T_frames = int(args.seconds * ac_hz)
    codes = jax.random.randint(jax.random.PRNGKey(8), (b, T_frames, 8), 0, 1024)
    decode = jax.jit(lambda p, c: codec.apply(p, c, method=EncodecModel.decode))
    report["encodec_decode_s"] = timed(decode, codec_params, codes, reps=args.reps)

    # CLAP text tower (roberta-base geometry) + RVQ
    from open_musiclm_tpu.models.clap.clap import CLAP, ClapQuantized
    from open_musiclm_tpu.models.clap.htsat import HTSATConfig
    from open_musiclm_tpu.models.clap.roberta import RobertaConfig
    from open_musiclm_tpu.models.rvq import rvq_init

    clap_model = CLAP(audio_cfg=HTSATConfig(), text_cfg=RobertaConfig(), dtype=jnp.bfloat16)
    ids0 = jnp.zeros((b, 77), jnp.int32)
    cvars = clap_model.init(
        jax.random.PRNGKey(9), jnp.zeros((b, 480000)), ids0, jnp.ones_like(ids0)
    )
    clap = ClapQuantized(
        model=clap_model, params=cast(cvars),
        rvq=rvq_init(nq_clap, 1024, 512, jax.random.PRNGKey(10)),
        num_quantizers=nq_clap, codebook_size=1024,
    )
    input_ids = jax.random.randint(jax.random.PRNGKey(11), (b, 77), 0, 50000)
    report["clap_text_s"] = timed(
        clap.tokenize_text_jit, input_ids, jnp.ones_like(input_ids), reps=args.reps
    )

    total_audio = b * args.seconds
    report = {
        k2: (round(v, 4) if isinstance(v, float) else v) for k2, v in report.items()
    }
    report["audio_seconds_per_batch"] = total_audio
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
