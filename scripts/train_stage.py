"""Train one MusicLM stage (semantic | coarse | fine).

Replaces reference scripts/train_{semantic,coarse,fine}_stage.py — one script
with a --stage flag (they differed only in factories; trainer.py:186-216).
Supports the preprocessed-token path and on-the-fly tokenization from raw
audio, continue/fine-tune flags, and dp-mesh data parallelism.
"""

import argparse

from common import add_model_args, add_training_args


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stage", required=True, choices=["semantic", "coarse", "fine"])
    add_model_args(p)
    add_training_args(p)
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument(
        "--wandb",
        action="store_true",
        help="log scalars + reconstruction audio to wandb (no-op if the "
        "package is not installed); tensorboard + JSONL stay on",
    )
    args = p.parse_args()

    import dataclasses
    import jax
    import jax.numpy as jnp

    from open_musiclm_tpu.checkpoint import find_latest_checkpoint
    from open_musiclm_tpu.config import (
        init_stage,
        load_model_config,
        load_training_config,
    )
    from open_musiclm_tpu.data.dataset import (
        PreprocessedDataset,
        SoundDataset,
        batch_iterator,
        train_valid_split,
    )
    from open_musiclm_tpu.data.pipeline import (
        accumulate_token_batches,
        stage_ds_config,
        tokenizing_iterator,
    )
    from open_musiclm_tpu.load import create_musiclm_from_config, load_stage_params
    from open_musiclm_tpu.models.token_cond import StageLossConfig
    from open_musiclm_tpu.train.trainer import StageTrainer, TrainState

    mc = load_model_config(args.model_config)
    tc = load_training_config(args.training_config)
    trainer_cfg = getattr(tc, f"{args.stage}_trainer_cfg")
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32

    stage = init_stage(
        mc,
        args.stage,
        jax.random.PRNGKey(args.seed),
        cross_entropy_loss_weights=trainer_cfg.cross_entropy_loss_weights,
        dtype=dtype,
    )

    trainer = StageTrainer(
        model=stage.model,
        loss_cfg=StageLossConfig(tuple(trainer_cfg.cross_entropy_loss_weights)),
        lr=trainer_cfg.lr,
        wd=trainer_cfg.wd,
        lr_warmup=trainer_cfg.lr_warmup,
        max_grad_norm=trainer_cfg.max_grad_norm,
        grad_accum_every=trainer_cfg.grad_accum_every,
        results_folder=args.results_folder,
        save_model_every=trainer_cfg.save_model_every,
        save_results_every=trainer_cfg.save_results_every,
        stage_name=args.stage,
        use_wandb=args.wandb,
        wandb_run_config=dataclasses.asdict(trainer_cfg),
    )

    # resume / fine-tune
    state = trainer.init_state(stage.params)
    if args.continue_from_dir:
        latest = find_latest_checkpoint(args.continue_from_dir, f"{args.stage}.transformer")
        if latest:
            print(f"resuming from {latest}")
            state = trainer.load(latest, stage.params)
    elif args.fine_tune_from:
        params = load_stage_params(args.fine_tune_from, stage.model)
        state = trainer.init_state(jax.tree_util.tree_map(jnp.asarray, params))

    # data
    accum = trainer_cfg.grad_accum_every
    musiclm = None  # set on the on-the-fly tokenization path (has the codec)
    if trainer_cfg.use_preprocessed_data:
        ds = PreprocessedDataset(
            folder=trainer_cfg.folder,
            stage=args.stage,
            semantic_window_seconds=int(mc.global_cfg.semantic_audio_length_seconds),
            coarse_window_seconds=int(mc.global_cfg.coarse_audio_length_seconds),
            fine_window_seconds=int(mc.global_cfg.fine_audio_length_seconds),
            semantic_steps_per_second=mc.hubert_kmeans_cfg.output_hz,
            acoustic_steps_per_second=mc.encodec_cfg.output_hz,
        )
        tr_idx, va_idx = train_valid_split(len(ds), trainer_cfg.valid_frac)
        train_iter = accumulate_token_batches(
            batch_iterator(ds, trainer_cfg.batch_size, indices=tr_idx,
                           num_workers=args.num_workers),
            accum,
        )
        valid_iter = batch_iterator(
            ds, trainer_cfg.batch_size, indices=va_idx or tr_idx[:1],
            num_workers=1,
        )
    else:
        musiclm, _ = __build_tokenizers(args, mc)
        ds_cfg = stage_ds_config(
            args.stage, musiclm.clap, musiclm.wav2vec, musiclm.codec, mc.global_cfg
        )
        sound_ds = SoundDataset(folder=trainer_cfg.folder, **ds_cfg)
        tr_idx, va_idx = train_valid_split(len(sound_ds), trainer_cfg.valid_frac)
        audio_iter = batch_iterator(
            sound_ds, trainer_cfg.batch_size, indices=tr_idx,
            num_workers=args.num_workers, flatten_token_batches=False,
        )
        train_iter = tokenizing_iterator(
            args.stage, audio_iter, musiclm.clap, musiclm.wav2vec,
            musiclm.codec, musiclm.codec_params,
            num_coarse_quantizers=mc.global_cfg.num_coarse_quantizers,
            accum=accum,
        )
        valid_audio = batch_iterator(
            sound_ds, trainer_cfg.batch_size, indices=va_idx or tr_idx[:1],
            num_workers=1, flatten_token_batches=False,
        )
        valid_iter = (
            tuple(x[0] for x in batch)
            for batch in tokenizing_iterator(
                args.stage, valid_audio, musiclm.clap, musiclm.wav2vec,
                musiclm.codec, musiclm.codec_params,
                num_coarse_quantizers=mc.global_cfg.num_coarse_quantizers, accum=1,
            )
        )

    # qualitative artifacts at the save_results cadence (reference
    # trainer.py:481-526): predicted-token dumps always; teacher-forced
    # Encodec wave reconstructions when the codec is in-process
    from open_musiclm_tpu.train.artifacts import (
        save_predicted_tokens,
        save_reconstructed_wave,
    )

    art_rng = jax.random.PRNGKey(args.seed + 2)

    def artifact_fn(state, vb, step):
        logits, labels = trainer.artifact_logits(state, vb, art_rng)
        if trainer_cfg.save_predicted_tokens:
            save_predicted_tokens(logits, labels, args.results_folder, args.stage, step)
        if (
            trainer_cfg.save_reconstructed_wave
            and args.stage != "semantic"
            and musiclm is not None
        ):
            pred = jnp.argmax(logits, axis=-1)[:, :-1]  # drop the EOS position
            cond = vb[1] if args.stage == "fine" else None  # ground-truth coarse
            out = save_reconstructed_wave(
                args.stage, pred, cond, musiclm.codec, musiclm.codec_params,
                mc.global_cfg.num_coarse_quantizers,
                mc.global_cfg.num_fine_quantizers,
                args.results_folder, step,
            )
            if out is not None:
                _, waves = out
                trainer.log_audio(
                    step, f"{args.stage}_recon", waves, musiclm.codec.sample_rate
                )

    remaining = trainer_cfg.num_train_steps - int(state.step)
    print(f"training {args.stage} stage for {remaining} steps")
    trainer.train(
        state,
        train_iter,
        num_steps=remaining,
        rng=jax.random.PRNGKey(args.seed + 1),
        valid_iter=valid_iter,
        artifact_fn=artifact_fn,
    )


def __build_tokenizers(args, mc):
    from common import build_musiclm

    return build_musiclm(args)


if __name__ == "__main__":
    main()
