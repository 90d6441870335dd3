"""Capture a device trace of one stage train step and break it down.

VERDICT r4 #4: training MFU sits at 25-30% against a ~97-100% analytic
roofline and the A/B lanes only explained ~20% of the gap. This script
captures a real `jax.profiler` trace of N train steps (perfetto JSON, no
TensorBoard needed), then aggregates device-track op durations into an
attention / FF / logits+loss / optimizer / rel-pos / other table so the
schedule overhead is attributed instead of bounded.

    python scripts/trace_train.py --stage coarse --batch 32 --accum 1
    python scripts/trace_train.py --trace_dir /tmp/omt_trace --parse_only

The reference has no profiling at all (SURVEY.md §5.1).
"""

import argparse
import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# Component buckets, matched against the HLO instruction name PLUS its
# `long_name` arg (the full HLO line: operand names carry flax param paths
# like %state_params__params____transformer____attn_3____to_kv...). Order
# matters — first hit wins.
BUCKETS = [
    ("pallas_attn", re.compile(r"custom-call|tpu_custom_call|flash|mosaic", re.I)),
    ("attention", re.compile(r"attn_\d|to_kv|to_q\b|to_out|q_scale|k_scale", re.I)),
    ("ff", re.compile(r"ff_\d|proj_in|proj_out|norm_mid|gelu", re.I)),
    ("relpos", re.compile(r"rel_pos|relpos|bias_table|in_layer|out_layer", re.I)),
    ("logits_loss", re.compile(
        r"logit|cross_entropy|log_softmax|one_hot|start_embed|embed_\d", re.I)),
    ("optimizer", re.compile(
        r"state_opt|state_mu|state_nu|adam|global_norm|clip_by|weight_decay|"
        r"state_params(?!__params____transformer)", re.I)),
    ("dropout_rng", re.compile(r"rng|bernoulli|threefry|dropout|bit_generator", re.I)),
    ("scan_plumbing", re.compile(
        r"^while|^dynamic-update-slice|^dynamic-slice|^copy|copy-start|"
        r"copy-done|^bitcast|^tuple|^get-tuple", re.I)),
    ("collectives", re.compile(r"all-reduce|reduce-scatter|all-gather", re.I)),
]


def classify(name: str, long_name: str) -> str:
    s = name + " " + long_name
    for bucket, pat in BUCKETS:
        if pat.search(s):
            return bucket
    return "other"


def parse(trace_dir: str, top: int = 40, steps: int = 1):
    files = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime,
    )
    if not files:
        raise SystemExit(f"no perfetto trace under {trace_dir}")
    path = files[-1]
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"] if isinstance(data, dict) else data

    pid_name = {}
    tid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_name[(e["pid"], e["tid"])] = e["args"].get("name", "")

    # device-side per-op durations live on the "XLA Ops" thread of the
    # /device:* process; "XLA Modules" / "Steps" are enclosing spans that
    # would double-count. device_duration_ps is the real device time (the
    # display `dur` can be rescaled by Time Scale Multiplier).
    per_op = defaultdict(float)
    per_bucket = defaultdict(float)
    per_category = defaultdict(float)
    total = 0.0
    module_span = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        pid, tid = e.get("pid"), e.get("tid")
        if "/device:" not in pid_name.get(pid, ""):
            continue
        tname = tid_name.get((pid, tid), "")
        a = e.get("args") or {}
        if tname == "XLA Modules":
            module_span += float(a.get("device_duration_ps", 0)) / 1e6 or float(
                e["dur"]
            )
            continue
        if tname != "XLA Ops":
            continue
        name = e.get("name", "")
        long_name = a.get("long_name", "")
        dur_us = (
            float(a["device_duration_ps"]) / 1e6
            if "device_duration_ps" in a
            else float(e["dur"])
        )
        bucket = classify(name, long_name)
        per_op[(name, bucket)] += dur_us
        per_bucket[bucket] += dur_us
        per_category[a.get("hlo_category", "?")] += dur_us
        total += dur_us

    print(f"trace: {path}")
    n = max(steps, 1)
    print(
        f"device op time {total / 1e3:.2f} ms total, {total / 1e3 / n:.2f} ms/step "
        f"({n} steps); module span {module_span / 1e3 / n:.2f} ms/step "
        f"(gap {(module_span - total) / 1e3 / n:+.2f} ms/step)"
    )
    print("\n-- bucket totals (per step) --")
    for b, d in sorted(per_bucket.items(), key=lambda kv: -kv[1]):
        print(f"{b:20s} {d / 1e3 / n:9.2f} ms  {100 * d / total:5.1f}%")
    print("\n-- hlo_category totals (per step) --")
    for c, d in sorted(per_category.items(), key=lambda kv: -kv[1]):
        print(f"{c:28s} {d / 1e3 / n:9.2f} ms  {100 * d / total:5.1f}%")
    print(f"\n-- top {top} ops (per step) --")
    for (name, bucket), d in sorted(per_op.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{d / 1e3 / n:9.3f} ms  {100 * d / total:5.1f}%  [{bucket}] {name[:100]}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stage", default="coarse")
    p.add_argument("--model", default="musiclm_small")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--accum", type=int, default=1)
    p.add_argument("--steps", type=int, default=3, help="traced steps")
    p.add_argument("--trace_dir", default="/tmp/omt_trace")
    p.add_argument("--parse_only", action="store_true")
    p.add_argument("--top", type=int, default=40)
    args = p.parse_args()

    if args.parse_only:
        parse(args.trace_dir, args.top, args.steps)
        return

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
    from open_musiclm_tpu.train.trainer import StageTrainer

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    mc = load_model_config(os.path.join(root, f"configs/model/{args.model}.json"))
    stage = init_stage(mc, args.stage, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    trainer = StageTrainer(
        model=stage.model,
        loss_cfg=StageLossConfig((0.0,) * (len(stage.model.specs) - 1) + (1.0,)),
        lr=3e-4, wd=0.1, lr_warmup=10, max_grad_norm=0.5,
        grad_accum_every=args.accum,
        results_folder="/tmp/trace_train",
        save_model_every=0, save_results_every=0,
        stage_name=args.stage,
        use_tensorboard=False,
    )
    state = trainer.init_state(stage.params)

    sem_hz = mc.hubert_kmeans_cfg.output_hz
    ac_hz = mc.encodec_cfg.output_hz
    nq_clap = mc.clap_rvq_cfg.rq_num_quantizers
    g = mc.global_cfg
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
    rng = np.random.default_rng(0)
    batch = tuple(
        jnp.asarray(rng.integers(0, 1024, (args.accum, args.batch, n)), jnp.int32)
        for n in lens
    )

    key = jax.random.PRNGKey(1)
    for i in range(2):  # compile + settle
        state, loss = trainer.train_step(state, batch, jax.random.fold_in(key, i))
    float(loss)

    jax.profiler.start_trace(args.trace_dir, create_perfetto_trace=True)
    try:
        for i in range(args.steps):
            state, loss = trainer.train_step(
                state, batch, jax.random.fold_in(key, 10 + i)
            )
        float(loss)
    finally:
        jax.profiler.stop_trace()
    print(f"captured {args.steps} steps to {args.trace_dir}; parsing...\n")
    parse(args.trace_dir, args.top, args.steps)


if __name__ == "__main__":
    main()
