"""Training-throughput benchmark: one-chip stage train step, with MFU.

Times StageTrainer's jitted train step (in-scan grad accumulation, AdamW,
clip) and prints tokens/sec, analytic model-FLOPs MFU (formula:
train/flops.py — 3x forward matmul FLOPs / step time / chip peak), and the
XLA cost-analysis FLOPs as a cross-check. Run on the real TPU:

    python scripts/bench_train.py --stage semantic --batch 8 --accum 2
    python scripts/bench_train.py --stage coarse --model musiclm_large_small_context \
        --remat 1 --batch 4

Knobs: --model {musiclm_small,musiclm_large_small_context,musiclm_large}
(large = d1024 x 24L x 16H), --remat (jax.checkpoint per block), --pallas
(OPEN_MUSICLM_PALLAS: fused Pallas training attention vs plain XLA),
--param_dtype {f32,bf16} (bf16 master params: halves param/grad HBM traffic;
optimizer runs in the param dtype).

Reference comparison point: the authors trained semantic at batch 4 x
accum 8 on unspecified GPUs (configs/training/train_musiclm_fma.json);
they publish no throughput numbers (BASELINE.md).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stage", default="semantic", choices=["semantic", "coarse", "fine"])
    p.add_argument("--model", default="musiclm_small")
    p.add_argument("--batch", type=int, default=8, help="microbatch per step")
    p.add_argument("--accum", type=int, default=2)
    p.add_argument("--steps", type=int, default=10, help="steps per timed chunk")
    p.add_argument("--chunks", type=int, default=3,
                   help="timed chunks; fastest wins (tunnel interference)")
    p.add_argument("--bf16", type=int, default=1, help="compute dtype bf16")
    p.add_argument("--param_dtype", default="f32", choices=["f32", "bf16"])
    p.add_argument("--remat", type=int, default=0)
    p.add_argument("--pallas", type=int, default=None,
                   help="1/0 force fused Pallas training attention on/off")
    p.add_argument("--ab_env", default=None,
                   help="same-process interleaved A/B: time the step again "
                   "with this env var set to 1 (traced into a second jit), "
                   "alternating chunks — the only reliable comparison under "
                   "the tunnel's interference episodes (BENCHMARKS.md)")
    p.add_argument("--json", action="store_true", help="emit one JSON line")
    args = p.parse_args()

    if args.pallas is not None:
        os.environ["OPEN_MUSICLM_PALLAS"] = str(args.pallas)

    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/omt_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from open_musiclm_tpu.config import init_stage, load_model_config
    from open_musiclm_tpu.models.token_cond import StageLossConfig
    from open_musiclm_tpu.train.flops import (
        peak_flops_per_chip,
        stage_train_flops,
    )
    from open_musiclm_tpu.train.trainer import StageTrainer

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    mc = load_model_config(os.path.join(root, f"configs/model/{args.model}.json"))
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    stage = init_stage(mc, args.stage, jax.random.PRNGKey(0), dtype=dtype)
    model = stage.model
    params = stage.params
    if args.remat:
        model = model.clone(remat=True)
    if args.param_dtype == "bf16":
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32
            else x,
            params,
        )

    # snapshot NOW: trainer A's first train_step donates its state, which
    # shares buffers with `params` — after it, `params` is deleted
    params_ab = (
        jax.tree_util.tree_map(jnp.array, params) if args.ab_env else None
    )

    trainer = StageTrainer(
        model=model,
        loss_cfg=StageLossConfig((0.0,) * (len(model.specs) - 1) + (1.0,)),
        lr=3e-4, wd=0.1, lr_warmup=10, max_grad_norm=0.5,
        grad_accum_every=args.accum,
        results_folder="/tmp/bench_train",
        save_model_every=0, save_results_every=0,
        stage_name=args.stage,
        use_tensorboard=False,
    )
    state = trainer.init_state(params)

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
        lens = (nq_clap, int(g.semantic_audio_length_seconds * sem_hz) - 1)
    elif args.stage == "coarse":
        lens = (
            nq_clap,
            int(g.coarse_audio_length_seconds * sem_hz) - 1,
            int(g.coarse_audio_length_seconds * ac_hz * g.num_coarse_quantizers),
        )
    else:
        lens = (
            nq_clap,
            int(g.fine_audio_length_seconds * ac_hz * g.num_coarse_quantizers),
            int(g.fine_audio_length_seconds * ac_hz * g.num_fine_quantizers),
        )
    batch = tuple(ids(n) for n in lens)
    # per-step tokens: sequence positions x microbatch x accumulation
    tokens_per_step = sum(lens) * b * args.accum

    key = jax.random.PRNGKey(1)
    state, loss = trainer.train_step(state, batch, key)  # compile
    float(loss)  # forced sync (block_until_ready is unreliable under axon)

    # XLA's own cost model, as a cross-check on the analytic formula.
    # NB: cost_analysis counts the grad-accumulation lax.scan BODY once, so
    # expect xla ~= model_flops / accum (measured within 1% on semantic:
    # 1.527 vs 3.077/2 TF)
    xla_flops = None
    try:
        lowered = trainer._build_train_step().lower(state, batch, key)
        cost = lowered.compile().cost_analysis()
        if cost:
            c = cost[0] if isinstance(cost, (list, tuple)) else cost
            xla_flops = float(c.get("flops", 0.0)) or None
    except Exception:
        pass

    # optional interleaved A/B: a second trainer traced with $ab_env=1 (env
    # knobs are read at TRACE time, so each trainer owns one variant's jit)
    variants = [("base", trainer, state)]
    if args.ab_env:
        # "NAME" means NAME=1; "NAME=v" sets an explicit value (e.g.
        # OPEN_MUSICLM_PALLAS=0 to A/B the default-on Pallas attention off)
        ab_name, _, ab_val = args.ab_env.partition("=")
        os.environ[ab_name] = ab_val or "1"
        args.ab_env = f"{ab_name}={ab_val or '1'}"
        trainer_b = StageTrainer(
            model=model,
            loss_cfg=StageLossConfig((0.0,) * (len(model.specs) - 1) + (1.0,)),
            lr=3e-4, wd=0.1, lr_warmup=10, max_grad_norm=0.5,
            grad_accum_every=args.accum,
            results_folder="/tmp/bench_train_b",
            save_model_every=0, save_results_every=0,
            stage_name=args.stage,
            use_tensorboard=False,
        )
        state_b = trainer_b.init_state(params_ab)
        state_b, loss_b = trainer_b.train_step(state_b, batch, key)  # compile
        float(loss_b)
        variants.append((args.ab_env, trainer_b, state_b))

    # time CHUNKS of steps and take the fastest chunk: the tunneled chip has
    # multi-minute >2x interference episodes (BENCHMARKS.md hazards), so a
    # single averaged window can be silently contaminated — a wide chunk
    # spread marks a contaminated lane. With --ab_env the variants alternate
    # within each chunk round so an episode hits both equally.
    chunk_times_by: dict = {name: [] for name, _, _ in variants}
    states = {name: st for name, _, st in variants}
    for c in range(max(1, args.chunks)):
        for name, tr, _ in variants:
            st = states[name]
            t0 = time.perf_counter()
            for i in range(args.steps):
                st, loss = tr.train_step(
                    st, batch, jax.random.fold_in(key, c * args.steps + i)
                )
            loss = float(loss)  # sync once; steps pipeline like the real loop
            chunk_times_by[name].append((time.perf_counter() - t0) / args.steps)
            states[name] = st
    chunk_times = chunk_times_by["base"]
    dt = min(chunk_times)

    ab = None
    if args.ab_env:
        dt_b = min(chunk_times_by[args.ab_env])
        ab = {
            "env": args.ab_env,
            "ms_per_step_env1": round(dt_b * 1e3, 1),
            "ms_per_step_env1_all_chunks": [
                round(t * 1e3, 1) for t in chunk_times_by[args.ab_env]
            ],
            "env1_over_base": round(dt_b / dt, 3),
        }

    model_flops = stage_train_flops(model, lens, b, args.accum)
    peak = peak_flops_per_chip(jax.devices()[0].device_kind, "bf16" if args.bf16 else "f32")
    mfu = model_flops / dt / peak
    cfg_s = (
        f"microbatch {b} x accum {args.accum}, depth {model.depth}, "
        f"remat {args.remat}, pallas {os.environ.get('OPEN_MUSICLM_PALLAS', 'default')}, "
        f"dtype {'bf16' if args.bf16 else 'f32'}/{args.param_dtype}"
    )
    if args.json:
        import json

        print(json.dumps({
            "stage": args.stage, "model": args.model,
            "ms_per_step": round(dt * 1e3, 1),
            "ms_per_step_all_chunks": [round(t * 1e3, 1) for t in chunk_times],
            "tok_per_s": round(tokens_per_step / dt),
            "mfu": round(mfu, 4),
            "model_tflops_per_step": round(model_flops / 1e12, 3),
            "xla_tflops_per_step": round(xla_flops / 1e12, 3) if xla_flops else None,
            "peak_tflops": peak / 1e12,
            "batch": b, "accum": args.accum, "remat": args.remat,
            "depth": model.depth, "loss": round(loss, 3),
            **({"ab": ab} if ab else {}),
        }))
    else:
        xla_s = f", xla {xla_flops / 1e12:.2f} TF/step" if xla_flops else ""
        chunks_s = "/".join(f"{t * 1e3:.1f}" for t in chunk_times)
        print(
            f"{args.stage}[{args.model}]: {dt * 1e3:.1f} ms/step  "
            f"{tokens_per_step / dt:,.0f} tok/s  MFU {mfu * 100:.1f}%  "
            f"(model {model_flops / 1e12:.2f} TF/step{xla_s}, peak {peak / 1e12:.0f} TF/s, "
            f"{cfg_s}, loss {loss:.3f}, chunks {chunks_s} ms)"
        )
        if ab:
            print(
                f"  A/B {ab['env']}: {ab['ms_per_step_env1']} ms/step "
                f"({ab['env1_over_base']}x base; chunks "
                + "/".join(f"{t}" for t in ab["ms_per_step_env1_all_chunks"])
                + " ms)"
            )
        if max(chunk_times) > 1.3 * min(chunk_times):
            # the contamination diagnostic must be visible outside --json too
            print(
                f"WARNING: chunk spread {max(chunk_times) / min(chunk_times):.2f}x "
                "(>1.3x) — tunnel interference episode likely contaminated this "
                "lane; re-run or trust only the min",
                file=sys.stderr,
            )


if __name__ == "__main__":
    main()
