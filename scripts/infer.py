"""Full text -> music generation (reference scripts/infer.py)."""

import argparse
from pathlib import Path

from common import REPO_ROOT, add_model_args, build_musiclm


def main():
    p = argparse.ArgumentParser(description="generate music from text prompts")
    p.add_argument("prompt", nargs="+", help="one or more text prompts")
    add_model_args(p)
    p.add_argument("--duration", type=float, default=4.0, help="seconds to generate")
    p.add_argument("--results_folder", default="./results/samples")
    p.add_argument(
        "--return_coarse_wave", action="store_true",
        help="decode from coarse tokens only (skip the fine stage)",
    )
    args = p.parse_args()

    import jax
    import numpy as np

    from open_musiclm_tpu.data.audio_io import write_wav

    musiclm, mc = build_musiclm(args)
    out_dir = Path(args.results_folder)
    out_dir.mkdir(parents=True, exist_ok=True)

    wave = musiclm.generate(
        key=jax.random.PRNGKey(args.seed),
        text=list(args.prompt),
        output_seconds=args.duration,
        semantic_window_seconds=int(mc.global_cfg.semantic_audio_length_seconds),
        coarse_window_seconds=int(mc.global_cfg.coarse_audio_length_seconds),
        fine_window_seconds=int(mc.global_cfg.fine_audio_length_seconds),
        return_coarse_generated_wave=args.return_coarse_wave,
    )
    for i, prompt in enumerate(args.prompt):
        name = prompt.replace(" ", "_")[:35]
        path = out_dir / f"{name}_generated.wav"
        write_wav(str(path), np.asarray(wave[i]), musiclm.codec.sample_rate)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
