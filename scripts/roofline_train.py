"""Print the analytic training-step roofline per stage (train/roofline.py).

Answers VERDICT r3 next #2's "what bounds MFU at these sub-1.3k-context
geometries" with a derived number instead of prose. Pure host-side analytic
model — needs no chip time, so it can run during bench lanes. Pass
--measured_ms (e.g. from a `bench_train.py --json` lane) to get the
fraction-of-roofline the measured step achieves.

    python scripts/roofline_train.py --stage coarse --batch 16 --accum 1
    python scripts/roofline_train.py --stage coarse --pallas 1 --measured_ms 120
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stage", default="coarse", choices=["semantic", "coarse", "fine"])
    p.add_argument("--model", default="musiclm_small")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--accum", type=int, default=1)
    p.add_argument("--param_dtype", default="f32", choices=["f32", "bf16"])
    p.add_argument("--pallas", type=int, default=0)
    p.add_argument("--remat", type=int, default=0)
    p.add_argument("--device_kind", default=None,
                   help="default: query jax; pass e.g. 'TPU v5 lite' offline")
    p.add_argument("--measured_ms", type=float, default=None)
    p.add_argument("--json", action="store_true")
    args = p.parse_args()

    # the model geometry is all we need — the build_* factories construct
    # the flax module definition without touching a device
    from open_musiclm_tpu.config import (
        build_coarse_transformer,
        build_fine_transformer,
        build_semantic_transformer,
        load_model_config,
        stage_example_lengths,
    )
    from open_musiclm_tpu.train.roofline import stage_train_roofline

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    mc = load_model_config(os.path.join(root, f"configs/model/{args.model}.json"))
    model = {
        "semantic": build_semantic_transformer,
        "coarse": build_coarse_transformer,
        "fine": build_fine_transformer,
    }[args.stage](mc)
    lens = stage_example_lengths(mc, args.stage)

    kind = args.device_kind
    if kind is None:
        try:
            import jax

            kind = jax.devices()[0].device_kind
        except Exception:
            kind = "TPU v5 lite"

    r = stage_train_roofline(
        model, lens, args.batch, args.accum,
        device_kind=kind,
        param_dtype_bytes=2 if args.param_dtype == "bf16" else 4,
        pallas_attention=bool(args.pallas),
        remat=bool(args.remat),
    )
    out = {
        "stage": args.stage, "model": args.model, "batch": args.batch,
        "accum": args.accum, "device_kind": kind,
        "pallas": bool(args.pallas), "remat": bool(args.remat),
        "param_dtype": args.param_dtype,
        **r.summary(args.measured_ms / 1e3 if args.measured_ms else None),
    }
    if args.json:
        print(json.dumps(out))
    else:
        print(
            f"{args.stage}[{args.model}] b{args.batch}x{args.accum} on {kind}: "
            f"{out['bound']}-bound, floor {out['bound_ms']} ms "
            f"(compute {out['compute_ms']} / memory {out['memory_ms']} ms), "
            f"MFU ceiling {out['mfu_ceiling'] * 100:.0f}%"
        )
        for k, v in out["bytes_gb_by_term"].items():
            print(f"  {k:12s} {v:8.2f} GB")
        if args.measured_ms:
            print(
                f"  measured {args.measured_ms} ms = "
                f"{100 * out['roofline_fraction']:.0f}% of roofline"
            )


if __name__ == "__main__":
    main()
