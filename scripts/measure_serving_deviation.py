"""Quantify serving-mode token deviation (VERDICT r2 weak #6).

The default serving stack (int8 weights + int8 flash-KV + approx-topk) is an
approximation of the fp decode path. This script replaces PARITY.md's
"typically agrees" with numbers, at the REAL musiclm_small stage geometry:

  1. per-stage PER-STEP agreement, teacher-forced: the serving path is
     scored along the fp path's trajectory (same per-row keys => identical
     gumbel noise; identical prefixes => no AR divergence compounding), so
     a mismatch at step t means the serving kernels' logit perturbation
     flipped THAT step's noisy argmax;
  2. per-stage free-running divergence: fraction of rows whose whole token
     sequence matches, and the mean first-divergence step (AR sampling
     compounds the first flip — this is the deployment-visible number);
  3. end-to-end waveform SNR between the fp pipeline and the serving
     pipeline for the same per-row seeds.

Round 4 additions (VERDICT r3 next #4):

  4. KNOB ATTRIBUTION: the stack is A/B'd one knob at a time (int8 weights
     only / flash-KV bf16 only / flash-KV int8 only / approx-topk only /
     full stack), each scored teacher-forced along the same fp trajectory,
     so the biggest offender is identified instead of one lumped number;
  5. MARGIN SWEEP: random-init weights have near-zero logit gaps, so the
     raw rates are a worst case.  ``--margin_scales`` re-scores the full
     stack with logits multiplied by s (implemented exactly as
     temperature/s on BOTH paths — gumbel sampling draws from
     softmax(s*logits/temp)), emulating the sharper margins of a trained
     model.  Mismatch at s=4/16 bounds the deployment-relevant rate.

Weights are random-init (no pretrained checkpoints in this environment), so
the logit-gap distribution differs from a trained model; the per-step
agreement still measures exactly the serving kernels' numeric perturbation.
Run on the real TPU (the Pallas int8/flash kernels are the thing measured):

    python scripts/measure_serving_deviation.py [--batch 16] [--json out.json]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16, help="rows = independent seeds")
    ap.add_argument("--model", default="musiclm_small")
    ap.add_argument("--json", default=None, help="also write the report here")
    ap.add_argument("--approx_topk", type=int, default=1)
    ap.add_argument(
        "--knobs", type=int, default=1,
        help="also A/B each serving knob separately (attribution table)",
    )
    ap.add_argument(
        "--margin_scales", default="4,16",
        help="comma list of logit-margin scales for the trained-confidence "
        "emulation sweep ('' disables)",
    )
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

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    mc = load_model_config(os.path.join(root, f"configs/model/{args.model}.json"))
    dtype = jnp.bfloat16
    k = jax.random.PRNGKey(0)
    fp_stages = {
        name: init_stage(mc, name, jax.random.fold_in(k, i), dtype=dtype)
        for i, name in enumerate(["semantic", "coarse", "fine"], 1)
    }

    def to_bf16(p):
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32
            else x,
            p,
        )

    fp_stages = {
        n: dataclasses.replace(s, params=to_bf16(s.params))
        for n, s in fp_stages.items()
    }
    srv_stages = {
        n: dataclasses.replace(s, quantized=True, flash_kv="int8")
        for n, s in fp_stages.items()
    }

    sem_hz = mc.hubert_kmeans_cfg.output_hz
    ac_hz = mc.encodec_cfg.output_hz
    nq_clap = mc.clap_rvq_cfg.rq_num_quantizers
    g = mc.global_cfg
    B = args.batch
    approx = bool(args.approx_topk)

    # (cond shapes, decode steps, temperature) per stage at the real
    # single-window geometry (SURVEY.md 2.4; pipeline temps musiclm.py:160)
    geo = {
        "semantic": (
            [(nq_clap,)],
            int(g.semantic_audio_length_seconds * sem_hz),
            1.0,
        ),
        "coarse": (
            [(nq_clap,), (int(g.coarse_audio_length_seconds * sem_hz) - 1,)],
            int(g.coarse_audio_length_seconds * ac_hz),
            0.95,
        ),
        "fine": (
            [
                (nq_clap,),
                (int(g.fine_audio_length_seconds * ac_hz) * g.num_coarse_quantizers,),
            ],
            int(g.fine_audio_length_seconds * ac_hz),
            0.4,
        ),
    }

    report = {
        "model": args.model,
        "batch_rows": B,
        "serving_stack": {
            "int8_weights": True,
            "flash_kv": "int8",
            "approx_topk": approx,
        },
        "device": str(jax.devices()[0]),
        "stages": {},
    }

    row_keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(B))
    conds = {}
    for name, (cond_shapes, T, temp) in geo.items():
        conds[name] = [
            jax.random.randint(jax.random.fold_in(k, 40 + i), (B,) + s, 0, 1024)
            for i, s in enumerate(cond_shapes)
        ]

    def teacher_forced_mismatch(name, stage, stage_approx, ref, temp):
        """Per-step mismatch of `stage` scored along the fp trajectory."""
        _, T, _ = geo[name]
        scored = np.asarray(
            stage.generate(
                conds[name], None, approx_topk=stage_approx,
                teacher_forced_ids=jnp.asarray(ref),
                max_time_steps=T, per_row_keys=row_keys, temperature=temp,
            )
        )
        return float(np.mean(scored != ref))

    fp_refs = {}
    for name, (cond_shapes, T, temp) in geo.items():
        kw = dict(max_time_steps=T, per_row_keys=row_keys, temperature=temp)
        ref = np.asarray(
            fp_stages[name].generate(conds[name], None, approx_topk=False, **kw)
        )
        fp_refs[name] = ref
        # per-step agreement under identical prefixes (teacher-forced)
        step_mismatch = teacher_forced_mismatch(
            name, srv_stages[name], approx, ref, temp
        )
        # free-running: deployment-visible divergence
        free = np.asarray(
            srv_stages[name].generate(conds[name], None, approx_topk=approx, **kw)
        )
        rows_equal = float(np.mean(np.all(free.reshape(B, -1) == ref.reshape(B, -1), axis=1)))
        flat_ref = ref.reshape(B, -1)
        flat_free = free.reshape(B, -1)
        first_div = []
        for r in range(B):
            neq = np.nonzero(flat_ref[r] != flat_free[r])[0]
            first_div.append(int(neq[0]) if len(neq) else flat_ref.shape[1])
        report["stages"][name] = {
            "decode_steps": T,
            "quantizers": int(ref.shape[-1]),
            "temperature": temp,
            "per_step_token_mismatch_pct": round(100 * step_mismatch, 3),
            "free_running_rows_identical_pct": round(100 * rows_equal, 1),
            "mean_first_divergence_step": round(float(np.mean(first_div)), 1),
            "total_flat_steps": int(flat_ref.shape[1]),
        }
        print(f"{name}: {json.dumps(report['stages'][name])}", flush=True)

    # ---- knob attribution: one serving knob at a time (VERDICT r3 #4a) ----
    if args.knobs:
        # LADDER attribution: flash_kv is implemented inside the quantized
        # decode scan (Stage.generate raises on flash_kv without
        # quantized=True), so each flash knob is measured stacked on the
        # int8-weights base — the per-knob contribution is the DELTA from
        # the previous rung. approx-topk alone runs on the fp path.
        variants = {
            "int8_weights_only": (dict(quantized=True, flash_kv=None), False),
            "int8_w_plus_flash_bf16": (dict(quantized=True, flash_kv="bf16"), False),
            # f32 cache rows: same kernel (early exit + packed layout), rows
            # kept full precision — isolates row-storage dtype from the
            # kernel itself (VERDICT r4 #3)
            "int8_w_plus_flash_f32": (dict(quantized=True, flash_kv="f32"), False),
            "int8_w_plus_flash_int8": (dict(quantized=True, flash_kv="int8"), False),
            "approx_topk_only_fp": (dict(), True),
            "full_stack": (dict(quantized=True, flash_kv="int8"), approx),
        }
        report["knob_attribution"] = {}
        for vname, (repl, v_approx) in variants.items():
            row = {}
            for name, (_, T, temp) in geo.items():
                st = dataclasses.replace(fp_stages[name], **repl)
                row[name] = round(
                    100 * teacher_forced_mismatch(
                        name, st, v_approx, fp_refs[name], temp
                    ),
                    3,
                )
            report["knob_attribution"][vname] = row
            print(f"knob {vname}: {json.dumps(row)}", flush=True)

    # ---- logit-perturbation exceedance: the deployment-relevant metric ----
    # Temperature/margin scaling CANNOT emulate trained confidence: the
    # serving kernels' logit delta scales with the logits themselves, so the
    # flip ratio P(|delta_top2| > gap) is scale-invariant (the x4/x16 sweep
    # below moves the rates by <1%, as predicted). What transfers to a
    # trained checkpoint is the perturbation delta itself: a step flips
    # when the top1-top2 perturbation differential exceeds the model's
    # top-2 logit gap. We measure delta along the fp trajectory and report
    # its exceedance curve — combine with any gap distribution to get the
    # expected flip rate at trained margins.
    report["logit_perturbation"] = {}
    gap_grid = [0.01, 0.03, 0.1, 0.3, 1.0, 3.0]
    for name, (_, T, temp) in geo.items():
        kw = dict(max_time_steps=T, per_row_keys=row_keys, temperature=temp)
        ref = jnp.asarray(fp_refs[name])
        _, L_fp = fp_stages[name].generate(
            conds[name], None, approx_topk=False, teacher_forced_ids=ref,
            return_logits=True, **kw,
        )
        _, L_srv = srv_stages[name].generate(
            conds[name], None, approx_topk=approx, teacher_forced_ids=ref,
            return_logits=True, **kw,
        )
        Lf = np.asarray(L_fp, np.float32)
        Ls = np.asarray(L_srv, np.float32)
        valid = (Lf > -1e8) & (Ls > -1e8)  # drop the masked-EOS lane
        d = np.where(valid, Ls - Lf, 0.0)
        order = np.argsort(Lf, axis=-1)
        t1, t2 = order[..., -1:], order[..., -2:-1]
        take = np.take_along_axis
        d_eff = take(d, t1, -1)[..., 0] - take(d, t2, -1)[..., 0]
        gap_fp = take(Lf, t1, -1)[..., 0] - take(Lf, t2, -1)[..., 0]
        report["logit_perturbation"][name] = {
            "delta_rms": round(float(np.sqrt(np.mean(d[valid] ** 2))), 4),
            "delta_top2_abs_p50": round(float(np.median(np.abs(d_eff))), 4),
            "delta_top2_abs_p90": round(float(np.quantile(np.abs(d_eff), 0.9)), 4),
            "fp_top2_gap_p50_random_init": round(float(np.median(gap_fp)), 4),
            "exceedance_pct": {
                f">{g:g}": round(100 * float(np.mean(np.abs(d_eff) > g)), 3)
                for g in gap_grid
            },
            "note": (
                "expected argmax flip rate at trained margins = "
                "P(|delta_top2| > gap) under the checkpoint's top-2 gap "
                "distribution; random-init gaps (p50 above) sit at the "
                "same scale as delta, which is why raw rates look large"
            ),
        }
        print(
            f"logit_perturbation {name}: "
            f"{json.dumps(report['logit_perturbation'][name]['exceedance_pct'])} "
            f"(delta_rms {report['logit_perturbation'][name]['delta_rms']})",
            flush=True,
        )

    # ---- margin sweep: emulate trained-model logit confidence (#4b) ----
    # scaling logits by s == dividing temperature by s on BOTH paths: the
    # sampled distribution becomes softmax(s*logits/temp), so mismatch at
    # s>1 shows how much of the raw rate is the random-init near-zero
    # logit-gap worst case
    scales = [float(s) for s in args.margin_scales.split(",") if s]
    if scales:
        report["margin_sweep_full_stack"] = {}
        for s in scales:
            row = {}
            for name, (_, T, temp) in geo.items():
                t_eff = temp / s
                kw = dict(
                    max_time_steps=T, per_row_keys=row_keys, temperature=t_eff
                )
                ref_s = np.asarray(
                    fp_stages[name].generate(
                        conds[name], None, approx_topk=False, **kw
                    )
                )
                row[name] = round(
                    100 * teacher_forced_mismatch(
                        name, srv_stages[name], approx, ref_s, t_eff
                    ),
                    3,
                )
            report["margin_sweep_full_stack"][f"x{s:g}"] = row
            print(f"margin x{s:g}: {json.dumps(row)}", flush=True)

    # ---- end-to-end waveform SNR (same seeds, fp vs serving pipeline) ----
    codec = create_encodec_24khz(
        bandwidth=mc.encodec_cfg.bandwidth,
        codebook_size=mc.encodec_cfg.codebook_size,
        dtype=jnp.bfloat16,
    )
    codec_params = to_bf16(codec.init(jax.random.PRNGKey(4), jnp.zeros((1, 2400))))

    def pipeline(stages):
        return MusicLM(
            clap=None,
            codec=codec,
            codec_params=codec_params,
            semantic_stage=stages["semantic"],
            coarse_stage=stages["coarse"],
            fine_stage=stages["fine"],
        )

    clap_tokens = jax.random.randint(jax.random.PRNGKey(5), (B, nq_clap, 1), 0, 1024)
    gen_kw = dict(
        clap_token_ids=clap_tokens,
        per_row_keys=row_keys,
        output_seconds=4.0,
        semantic_window_seconds=int(g.semantic_audio_length_seconds),
        coarse_window_seconds=int(g.coarse_audio_length_seconds),
        fine_window_seconds=int(g.fine_audio_length_seconds),
    )
    if approx:
        os.environ["OPEN_MUSICLM_APPROX_TOPK"] = "1"
    else:
        os.environ.pop("OPEN_MUSICLM_APPROX_TOPK", None)
    w_srv = np.asarray(pipeline(srv_stages).generate(**gen_kw), np.float32)
    os.environ.pop("OPEN_MUSICLM_APPROX_TOPK", None)
    w_fp = np.asarray(pipeline(fp_stages).generate(**gen_kw), np.float32)
    err = w_fp - w_srv
    snr_db = 10.0 * np.log10(
        (np.sum(w_fp**2) + 1e-12) / (np.sum(err**2) + 1e-12)
    )
    rows_identical = float(np.mean(np.all(w_fp == w_srv, axis=-1)))
    report["end_to_end"] = {
        "output_seconds": 4.0,
        "waveform_snr_db": round(float(snr_db), 2),
        "rows_waveform_identical_pct": round(100 * rows_identical, 1),
        "note": (
            "AR sampling compounds the first flipped token, so free-running "
            "waveforms diverge to decorrelated-but-valid audio once any step "
            "flips; the per-step teacher-forced mismatch above is the "
            "kernel-numerics metric"
        ),
    }
    print(json.dumps(report))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
