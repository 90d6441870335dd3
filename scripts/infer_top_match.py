"""Batched generation + CLAP-similarity reranking
(reference scripts/infer_top_match.py)."""

import argparse
from pathlib import Path

from common import add_model_args, build_musiclm


def main():
    p = argparse.ArgumentParser(description="generate N samples, keep best CLAP matches")
    p.add_argument("prompt", nargs="+")
    add_model_args(p)
    p.add_argument("--num_samples", type=int, default=4)
    p.add_argument("--num_top_matches", type=int, default=1)
    p.add_argument("--duration", type=float, default=4.0)
    p.add_argument("--results_folder", default="./results/samples")
    args = p.parse_args()

    import jax
    import numpy as np

    from open_musiclm_tpu.data.audio_io import write_wav

    musiclm, mc = build_musiclm(args)
    out_dir = Path(args.results_folder)
    out_dir.mkdir(parents=True, exist_ok=True)

    samples, sims = musiclm.generate_top_match(
        key=jax.random.PRNGKey(args.seed),
        text=list(args.prompt),
        num_samples=args.num_samples,
        num_top_matches=args.num_top_matches,
        output_seconds=args.duration,
        semantic_window_seconds=int(mc.global_cfg.semantic_audio_length_seconds),
        coarse_window_seconds=int(mc.global_cfg.coarse_audio_length_seconds),
        fine_window_seconds=int(mc.global_cfg.fine_audio_length_seconds),
    )
    for prompt, waves, sim in zip(args.prompt, samples, sims):
        name = prompt.replace(" ", "_")[:35]
        for j in range(waves.shape[0]):
            path = out_dir / f"{name}_top_match_{j}.wav"
            write_wav(str(path), np.asarray(waves[j]), musiclm.codec.sample_rate)
            print(f"wrote {path} (clap similarity {float(sim[j]):.4f})")


if __name__ == "__main__":
    main()
