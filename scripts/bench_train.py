"""Training-throughput benchmark: one-chip stage train step.

Times StageTrainer's jitted train step (in-scan grad accumulation, AdamW,
clip) at the musiclm_small geometry and prints tokens/sec and steps/sec.
Run on the real TPU:

    python scripts/bench_train.py --stage semantic --batch 8 --accum 2

Reference comparison point: the authors trained semantic at batch 4 x
accum 8 on unspecified GPUs (configs/training/train_musiclm_fma.json);
they publish no throughput numbers (BASELINE.md).
"""

import argparse
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
    p.add_argument("--stage", default="semantic", choices=["semantic", "coarse", "fine"])
    p.add_argument("--batch", type=int, default=8, help="microbatch per step")
    p.add_argument("--accum", type=int, default=2)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--bf16", type=int, default=1)
    args = p.parse_args()

    from open_musiclm_tpu.config import init_stage, load_model_config
    from open_musiclm_tpu.models.token_cond import StageLossConfig
    from open_musiclm_tpu.train.trainer import StageTrainer

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    mc = load_model_config(os.path.join(root, "configs/model/musiclm_small.json"))
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    stage = init_stage(mc, args.stage, jax.random.PRNGKey(0), dtype=dtype)

    trainer = StageTrainer(
        model=stage.model,
        loss_cfg=StageLossConfig((0.0,) * (len(stage.model.specs) - 1) + (1.0,)),
        lr=3e-4, wd=0.1, lr_warmup=10, max_grad_norm=0.5,
        grad_accum_every=args.accum,
        results_folder="/tmp/bench_train",
        save_model_every=0, save_results_every=0,
        stage_name=args.stage,
    )
    state = trainer.init_state(stage.params)

    # token batch at the training geometry (SURVEY 2.4)
    sem_hz = mc.hubert_kmeans_cfg.output_hz
    ac_hz = mc.encodec_cfg.output_hz
    nq_clap = mc.clap_rvq_cfg.rq_num_quantizers
    b = args.batch
    g = mc.global_cfg
    rng = np.random.default_rng(0)

    def ids(*shape, hi=1024):
        return jnp.asarray(rng.integers(0, hi, (args.accum, b) + shape), jnp.int32)

    if args.stage == "semantic":
        batch = (ids(nq_clap), ids(int(g.semantic_audio_length_seconds * sem_hz) - 1))
    elif args.stage == "coarse":
        batch = (
            ids(nq_clap),
            ids(int(g.coarse_audio_length_seconds * sem_hz) - 1),
            ids(int(g.coarse_audio_length_seconds * ac_hz * g.num_coarse_quantizers)),
        )
    else:
        batch = (
            ids(nq_clap),
            ids(int(g.fine_audio_length_seconds * ac_hz * g.num_coarse_quantizers)),
            ids(int(g.fine_audio_length_seconds * ac_hz * g.num_fine_quantizers)),
        )
    # per-step tokens: sequence positions x microbatch x accumulation
    tokens_per_step = sum(int(t.shape[-1]) for t in batch) * b * args.accum

    key = jax.random.PRNGKey(1)
    state, loss = trainer.train_step(state, batch, key)  # compile
    float(loss)  # forced sync (block_until_ready is unreliable under axon)
    t0 = time.perf_counter()
    for i in range(args.steps):
        state, loss = trainer.train_step(state, batch, jax.random.fold_in(key, i))
    loss = float(loss)  # sync once; steps pipeline like the real loop
    dt = (time.perf_counter() - t0) / args.steps

    print(
        f"{args.stage}: {dt * 1e3:.1f} ms/step  "
        f"{tokens_per_step / dt:,.0f} tok/s  "
        f"(microbatch {b} x accum {args.accum}, {tokens_per_step} tok/step, "
        f"loss {float(loss):.3f}, dtype {'bf16' if args.bf16 else 'f32'})"
    )


if __name__ == "__main__":
    main()
