"""Fine-stage isolation check: ground-truth coarse tokens from real audio
-> generated fine tokens -> waveform (reference scripts/infer_fine.py)."""

import argparse
from pathlib import Path

from common import add_model_args, build_musiclm


def main():
    p = argparse.ArgumentParser()
    p.add_argument("audio_files", nargs="+")
    add_model_args(p)
    p.add_argument("--duration", type=float, default=2.0)
    p.add_argument("--results_folder", default="./results/fine_outputs")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from open_musiclm_tpu.data.audio_io import read_wav, write_wav
    from open_musiclm_tpu.models.encodec import EncodecModel

    musiclm, mc = build_musiclm(args)
    out_dir = Path(args.results_folder)
    out_dir.mkdir(parents=True, exist_ok=True)

    ac_hz = mc.encodec_cfg.output_hz
    n_coarse = mc.global_cfg.num_coarse_quantizers
    key = jax.random.PRNGKey(args.seed)

    for f in args.audio_files:
        wav24, _ = read_wav(f, target_sr=musiclm.codec.sample_rate)
        wav48, _ = read_wav(f, target_sr=musiclm.clap.sample_rate)
        n24 = int(args.duration * musiclm.codec.sample_rate)
        codes = musiclm.codec.apply(
            musiclm.codec_params, jnp.asarray(wav24[:n24][None]), method=EncodecModel.encode
        )
        coarse_ids = codes[..., :n_coarse]
        clap_ids = musiclm.clap.tokenize_audio(jnp.asarray(wav48[None]))

        fine = musiclm.fine_stage.generate(
            [clap_ids, coarse_ids],
            key,
            max_time_steps=int(args.duration * ac_hz),
            temperature=0.4,
        )
        acoustic = jnp.concatenate([coarse_ids[:, : fine.shape[1]], fine], axis=-1)
        wave = musiclm.codec.apply(
            musiclm.codec_params, acoustic, method=EncodecModel.decode
        )
        path = out_dir / (Path(f).stem + "_fine_generated.wav")
        write_wav(str(path), np.asarray(wave[0]), musiclm.codec.sample_rate)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
