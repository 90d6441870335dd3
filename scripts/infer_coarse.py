"""Coarse-stage isolation check: ground-truth semantic tokens from real audio
-> generated coarse tokens -> waveform (reference scripts/infer_coarse.py).

Lets a human listen to the coarse stage in isolation."""

import argparse
from pathlib import Path

from common import add_model_args, build_musiclm


def main():
    p = argparse.ArgumentParser()
    p.add_argument("audio_files", nargs="+", help="input audio (wav)")
    add_model_args(p)
    p.add_argument("--duration", type=float, default=4.0)
    p.add_argument("--results_folder", default="./results/coarse_outputs")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from open_musiclm_tpu.data.audio_io import read_wav, write_wav

    musiclm, mc = build_musiclm(args)
    out_dir = Path(args.results_folder)
    out_dir.mkdir(parents=True, exist_ok=True)

    sem_hz = mc.hubert_kmeans_cfg.output_hz
    ac_hz = mc.encodec_cfg.output_hz
    key = jax.random.PRNGKey(args.seed)

    for f in args.audio_files:
        wav16, _ = read_wav(f, target_sr=musiclm.wav2vec.target_sample_hz)
        wav48, _ = read_wav(f, target_sr=musiclm.clap.sample_rate)
        n16 = int(args.duration * musiclm.wav2vec.target_sample_hz)
        wav16 = wav16[:n16][None]
        semantic_ids = musiclm.wav2vec(jnp.asarray(wav16))[..., None]
        clap_ids = musiclm.clap.tokenize_audio(jnp.asarray(wav48[None]))

        coarse = musiclm.coarse_stage.generate(
            [clap_ids, semantic_ids],
            key,
            max_time_steps=int(args.duration * ac_hz),
            temperature=0.95,
        )
        from open_musiclm_tpu.models.encodec import EncodecModel

        wave = musiclm.codec.apply(
            musiclm.codec_params, coarse, method=EncodecModel.decode
        )
        path = out_dir / (Path(f).stem + "_coarse_generated.wav")
        write_wav(str(path), np.asarray(wave[0]), musiclm.codec.sample_rate)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
