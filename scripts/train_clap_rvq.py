"""Fit the CLAP residual-VQ conditioning codebooks
(reference scripts/train_clap_rvq.py)."""

import argparse

from common import add_model_args, add_training_args, build_musiclm


def main():
    p = argparse.ArgumentParser()
    add_model_args(p)
    add_training_args(p)
    args = p.parse_args()

    import jax
    import numpy as np

    from open_musiclm_tpu.config import load_model_config, load_training_config
    from open_musiclm_tpu.data.dataset import SoundDataset, batch_iterator
    from open_musiclm_tpu.train.tokenizer_trainers import ClapRVQTrainer

    mc = load_model_config(args.model_config)
    tc = load_training_config(args.training_config)
    cfg = tc.clap_rvq_trainer_cfg
    musiclm, _ = build_musiclm(args)

    ds = SoundDataset(
        folder=cfg.folder,
        max_length_seconds=(mc.global_cfg.semantic_audio_length_seconds,),
        normalize=(False,),
        target_sample_hz=(musiclm.clap.sample_rate,),
        seq_len_multiple_of=(None,),
    )
    audio_iter = (
        b[0] for b in batch_iterator(ds, cfg.batch_size, flatten_token_batches=False)
    )

    trainer = ClapRVQTrainer(
        clap=musiclm.clap,
        results_folder=args.results_folder,
        num_train_steps=cfg.num_train_steps,
        accumulate_batches=cfg.accumulate_batches,
        rq_ema_decay=mc.clap_rvq_cfg.rq_ema_decay,
        threshold_ema_dead_code=mc.clap_rvq_cfg.threshold_ema_dead_code,
        save_model_every=cfg.save_model_every,
        save_results_every=cfg.save_results_every,
    )
    trainer.train(
        audio_iter,
        jax.random.PRNGKey(args.seed),
        log=lambda **kw: print(kw),
    )


if __name__ == "__main__":
    main()
