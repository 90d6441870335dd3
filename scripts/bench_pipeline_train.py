"""On-the-fly tokenization training bench (VERDICT r2 weak #3).

Measures the raw-audio -> tokens -> train-step pipeline (data/pipeline.py):
per-tower tokenization throughput (audio-sec/s on device for CLAP-HTSAT,
MERT/HuBERT + k-means, Encodec encode), then the combined
tokenize-every-step training loop against the preprocessed-token loop —
proving the "never fall back to host" pipeline is fast, not merely
TPU-resident (reference computes these inside the torch train step:
open_musiclm.py:476-511, trainer.py:415-455; the MERT k-means step even
round-trips GPU->CPU sklearn, SURVEY.md 3.3).

Weights are random-init (throughput only). Run on the real TPU:

    python scripts/bench_pipeline_train.py --stage semantic --batch 4 --accum 2
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="semantic", choices=["semantic", "coarse", "fine"])
    ap.add_argument("--model", default="musiclm_small")
    ap.add_argument("--batch", type=int, default=4, help="microbatch (audio clips)")
    ap.add_argument("--accum", type=int, default=2)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--tower_reps", type=int, default=3)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/omt_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from open_musiclm_tpu.config import init_stage, load_model_config, build_clap, build_hubert
    from open_musiclm_tpu.data.pipeline import tokenizing_iterator
    from open_musiclm_tpu.models.clap.clap import ClapQuantized
    from open_musiclm_tpu.models.encodec import create_encodec_24khz, EncodecModel
    from open_musiclm_tpu.models.hubert import HubertWithKmeans
    from open_musiclm_tpu.models.rvq import rvq_init
    from open_musiclm_tpu.models.token_cond import StageLossConfig
    from open_musiclm_tpu.train.trainer import StageTrainer

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    mc = load_model_config(os.path.join(root, f"configs/model/{args.model}.json"))
    g = mc.global_cfg
    dtype = jnp.bfloat16
    b = args.batch

    def to_bf16(p):
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32
            else x,
            p,
        )

    # ---- frozen tokenizer towers at full size (random weights) ----
    print("building towers...", flush=True)
    clap_model = build_clap(mc, dtype=dtype)
    ids0 = jnp.zeros((1, 77), jnp.int32)
    clap_params = to_bf16(
        clap_model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 480000)), ids0, jnp.ones_like(ids0)
        )
    )
    clap = ClapQuantized(
        model=clap_model,
        params=clap_params,
        rvq=rvq_init(
            mc.clap_rvq_cfg.rq_num_quantizers,
            mc.clap_rvq_cfg.codebook_size,
            512,
            jax.random.PRNGKey(1),
        ),
        num_quantizers=mc.clap_rvq_cfg.rq_num_quantizers,
        codebook_size=mc.clap_rvq_cfg.codebook_size,
    )
    hubert_model = build_hubert(mc, dtype=dtype)
    hubert_params = to_bf16(
        hubert_model.init(jax.random.PRNGKey(2), jnp.zeros((1, 16000)))
    )
    wav2vec = HubertWithKmeans(
        model=hubert_model,
        params=hubert_params,
        centroids=jax.random.normal(
            jax.random.PRNGKey(3), (mc.hubert_kmeans_cfg.codebook_size, 768)
        ),
        normalize_embeds=mc.hubert_kmeans_cfg.normalize_embeds,
        output_hz=mc.hubert_kmeans_cfg.output_hz,
    )
    codec = create_encodec_24khz(
        bandwidth=mc.encodec_cfg.bandwidth,
        codebook_size=mc.encodec_cfg.codebook_size,
        dtype=dtype,
    )
    codec_params = to_bf16(codec.init(jax.random.PRNGKey(4), jnp.zeros((1, 2400))))

    # ---- per-tower throughput at the training window sizes ----
    sem_s = g.semantic_audio_length_seconds
    stage_s = {
        "semantic": g.semantic_audio_length_seconds,
        "coarse": g.coarse_audio_length_seconds,
        "fine": g.fine_audio_length_seconds,
    }[args.stage]
    rng = np.random.default_rng(0)

    def wav(seconds, hz):
        return jnp.asarray(
            rng.standard_normal((b, int(seconds * hz))).astype(np.float32) * 0.1
        )

    def tower_rate(name, fn, x, audio_seconds):
        np.asarray(fn(x))  # compile + warm
        ts = []
        for _ in range(args.tower_reps):
            t0 = time.perf_counter()
            np.asarray(fn(x))
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        rate = audio_seconds / dt
        print(f"  {name}: {rate:,.0f} audio-sec/s  ({dt * 1e3:.1f} ms for {audio_seconds:.0f} s)", flush=True)
        return rate

    print("per-tower tokenization throughput:", flush=True)
    tok_clap = jax.jit(clap.tokenize_audio)
    tok_sem = jax.jit(wav2vec.__call__)
    tok_codes = jax.jit(lambda w: codec.apply(codec_params, w, method=EncodecModel.encode))
    rates = {
        "clap_htsat": tower_rate("clap (HTSAT-tiny 48k)", tok_clap, wav(sem_s, 48000), b * sem_s),
        "hubert_kmeans": tower_rate(
            "hubert+kmeans (MERT 16k)", tok_sem, wav(stage_s, 16000), b * stage_s
        ),
        "encodec": tower_rate(
            "encodec encode (24k)", tok_codes, wav(stage_s, 24000), b * stage_s
        ),
    }

    # ---- tokenize-every-step training vs preprocessed-token training ----
    stage = init_stage(mc, args.stage, jax.random.PRNGKey(5), dtype=dtype)
    trainer = StageTrainer(
        model=stage.model,
        loss_cfg=StageLossConfig((0.0,) * (len(stage.model.specs) - 1) + (1.0,)),
        lr=3e-4, grad_accum_every=args.accum,
        results_folder="/tmp/bench_pipeline", stage_name=args.stage,
        use_tensorboard=False,
    )
    state = trainer.init_state(stage.params)

    def audio_batches():
        while True:
            if args.stage == "semantic":
                yield (wav(sem_s, 48000), wav(sem_s, 16000))
            elif args.stage == "coarse":
                yield (wav(sem_s, 48000), wav(stage_s, 16000), wav(stage_s, 24000))
            else:
                yield (wav(sem_s, 48000), wav(stage_s, 24000))

    tok_iter = tokenizing_iterator(
        args.stage, audio_batches(), clap, wav2vec, codec, codec_params,
        num_coarse_quantizers=g.num_coarse_quantizers, accum=args.accum,
    )

    # NB: the semantic stream the trainer expects is window_s*50 - 1 tokens;
    # the tokenizers produce exactly that geometry (hubert 499 for 10 s)
    key = jax.random.PRNGKey(6)
    batch0 = next(tok_iter)
    state, loss = trainer.train_step(state, batch0, key)  # compile train
    float(loss)

    # train-only reference (same token batch re-fed)
    t0 = time.perf_counter()
    for i in range(args.steps):
        state, loss = trainer.train_step(state, batch0, jax.random.fold_in(key, i))
    float(loss)
    dt_train = (time.perf_counter() - t0) / args.steps

    # tokenization-only (host synthesis + all towers, accum microbatches)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        bt = next(tok_iter)
        jax.block_until_ready(bt)
    dt_tok = (time.perf_counter() - t0) / args.steps

    # fused loop: tokenize then train each step (what on-the-fly training runs)
    t0 = time.perf_counter()
    for i in range(args.steps):
        bt = next(tok_iter)
        state, loss = trainer.train_step(state, bt, jax.random.fold_in(key, 100 + i))
    float(loss)
    dt_full = (time.perf_counter() - t0) / args.steps

    audio_s_per_step = b * args.accum * stage_s
    out = {
        "stage": args.stage,
        "microbatch": b,
        "accum": args.accum,
        "tower_audio_sec_per_s": {k: round(v, 1) for k, v in rates.items()},
        "train_only_ms_per_step": round(dt_train * 1e3, 1),
        "tokenize_only_ms_per_step": round(dt_tok * 1e3, 1),
        "tokenize_plus_train_ms_per_step": round(dt_full * 1e3, 1),
        "tokenizer_share_of_step_pct": round(100 * (dt_full - dt_train) / dt_full, 1),
        "on_the_fly_audio_sec_per_s": round(audio_s_per_step / dt_full, 1),
    }
    import json

    print(json.dumps(out))


if __name__ == "__main__":
    main()
