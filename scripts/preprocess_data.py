"""Offline dataset tokenization (reference scripts/preprocess_data.py).

Supports multi-process sharding: run with --rank r --world N per process;
each rank writes its own token-store shard.
"""

import argparse

from common import add_model_args, add_training_args, build_musiclm


def main():
    p = argparse.ArgumentParser()
    add_model_args(p)
    add_training_args(p)
    p.add_argument("--rank", type=int, default=0)
    p.add_argument("--world", type=int, default=1)
    p.add_argument("--replace_existing", action="store_true")
    p.add_argument(
        "--filter_fma", action="store_true",
        help="drop low-engagement FMA experimental-genre tracks "
        "(reference scripts/preprocess_data.py:44-62)",
    )
    args = p.parse_args()

    from open_musiclm_tpu.config import load_model_config, load_training_config
    from open_musiclm_tpu.data.preprocess import DataPreprocessor

    mc = load_model_config(args.model_config)
    tc = load_training_config(args.training_config)
    cfg = tc.data_preprocessor_cfg
    musiclm, _ = build_musiclm(args)

    ignore_files = None
    if args.filter_fma:
        from open_musiclm_tpu.data.fma import fma_ignore_files

        ignore_files = fma_ignore_files(cfg.metadata_folder)
        print(f"filtering {len(ignore_files)} FMA experimental tracks")

    pre = DataPreprocessor(
        clap=musiclm.clap,
        wav2vec=musiclm.wav2vec,
        codec=musiclm.codec,
        codec_params=musiclm.codec_params,
        folder=cfg.folder,
        results_folder=cfg.results_folder,
        num_coarse_quantizers=mc.global_cfg.num_coarse_quantizers,
        max_audio_length_seconds=cfg.max_audio_length_seconds,
        clap_audio_length_seconds=int(mc.global_cfg.clap_audio_length_seconds),
        semantic_audio_length_seconds=int(mc.global_cfg.semantic_audio_length_seconds),
        clap_batch_size=cfg.clap_batch_size,
        random_crop=cfg.random_crop,
        num_crops=cfg.num_crops,
        replace_existing=args.replace_existing,
        rank=args.rank,
        world=args.world,
        ignore_files=ignore_files,
    )
    n = pre.process(progress=lambda i, total: print(f"{i}/{total}", end="\r"))
    print(f"\nwrote {n} rows")


if __name__ == "__main__":
    main()
