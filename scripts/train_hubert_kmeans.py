"""Fit the semantic k-means codebook over MERT features
(reference scripts/train_hubert_kmeans.py)."""

import argparse

from common import add_model_args, add_training_args, build_musiclm


def main():
    p = argparse.ArgumentParser()
    add_model_args(p)
    add_training_args(p)
    args = p.parse_args()

    import jax

    from open_musiclm_tpu.config import load_model_config, load_training_config
    from open_musiclm_tpu.data.dataset import SoundDataset, batch_iterator
    from open_musiclm_tpu.train.tokenizer_trainers import HubertKmeansTrainer

    mc = load_model_config(args.model_config)
    tc = load_training_config(args.training_config)
    cfg = tc.hubert_kmeans_trainer_cfg
    musiclm, _ = build_musiclm(args)

    ds = SoundDataset(
        folder=cfg.folder,
        max_length_seconds=(mc.global_cfg.semantic_audio_length_seconds,),
        normalize=(True,),
        target_sample_hz=(musiclm.wav2vec.target_sample_hz,),
        seq_len_multiple_of=(musiclm.wav2vec.seq_len_multiple_of,),
    )
    audio_iter = (
        b[0]
        for b in batch_iterator(
            ds, cfg.feature_extraction_batch_size, flatten_token_batches=False
        )
    )

    trainer = HubertKmeansTrainer(
        hubert_kmeans=musiclm.wav2vec,
        results_folder=args.results_folder,
        feature_extraction_num_steps=cfg.feature_extraction_num_steps,
        n_clusters=mc.hubert_kmeans_cfg.codebook_size,
    )
    trainer.train(audio_iter, jax.random.PRNGKey(args.seed))
    print(f"k-means saved to {args.results_folder}/kmeans.ckpt")


if __name__ == "__main__":
    main()
