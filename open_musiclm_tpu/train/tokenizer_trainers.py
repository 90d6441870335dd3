"""Tokenizer fitting jobs: CLAP-RVQ EMA learning and semantic k-means.

TPU-native rebuilds of reference ``ClapRVQTrainer`` (trainer.py:564-744) and
``HfHubertKmeansTrainer`` (trainer.py:748-876):
  * RVQ: accumulate frozen-CLAP embeddings over ``accumulate_batches``
    minibatches, then one jitted EMA codebook update + MSE report; the
    reference's cross-rank gather becomes a dp-sharded embedding compute
    (the EMA update itself is cheap and replicated).
  * k-means: phase 1 extracts MERT layer-7 features for N random crops
    (NaN-filtered); phase 2 runs count-weighted minibatch Lloyd's
    (models/kmeans.py) instead of sklearn MiniBatchKMeans.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Callable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..checkpoint import save_checkpoint
from ..models.clap.clap import ClapQuantized
from ..models.hubert import HubertWithKmeans
from ..models.kmeans import (
    KMeansState,
    kmeans_inertia,
    minibatch_kmeans_init,
    minibatch_kmeans_update,
)
from ..models.rvq import RVQState, rvq_quantize, rvq_update


@dataclasses.dataclass
class ClapRVQTrainer:
    """audio batches -> CLAP embeddings -> EMA residual-VQ codebooks."""

    clap: ClapQuantized
    results_folder: str
    num_train_steps: int
    accumulate_batches: int = 32
    rq_ema_decay: float = 0.95
    threshold_ema_dead_code: float = 0.0
    save_model_every: int = 10
    save_results_every: int = 5

    def __post_init__(self):
        Path(self.results_folder).mkdir(parents=True, exist_ok=True)
        self._embed = jax.jit(self.clap.audio_embedding)
        self._update = jax.jit(
            lambda st, x, k: rvq_update(
                st,
                x,
                k,
                decay=self.rq_ema_decay,
                threshold_ema_dead_code=self.threshold_ema_dead_code,
            )
        )

    def train(
        self,
        audio_iter: Iterator[np.ndarray],
        rng: jax.Array,
        log: Optional[Callable] = None,
    ) -> RVQState:
        state = self.clap.rvq
        for step in range(self.num_train_steps):
            embeds = []
            for _ in range(self.accumulate_batches):
                wav = next(audio_iter)
                embeds.append(self._embed(jnp.asarray(wav)))
            x = jnp.concatenate(embeds, axis=0)
            rng, sub = jax.random.split(rng)
            state, quant, _ = self._update(state, x, sub)
            if log is not None and step % self.save_results_every == 0:
                mse = float(jnp.mean(jnp.square(quant - x)))
                log(step=step, rvq_mse=mse)
            if step % self.save_model_every == 0 or step == self.num_train_steps - 1:
                save_checkpoint(
                    str(Path(self.results_folder) / f"clap.rvq.{step}.ckpt"),
                    state._asdict(),
                )
        self.clap.rvq = state
        return state


@dataclasses.dataclass
class HubertKmeansTrainer:
    """MERT features -> 1024-way k-means codebook."""

    hubert_kmeans: HubertWithKmeans
    results_folder: str
    feature_extraction_num_steps: int = 320
    n_clusters: int = 1024
    fit_batch_size: int = 10000

    def __post_init__(self):
        Path(self.results_folder).mkdir(parents=True, exist_ok=True)
        self._features = jax.jit(self.hubert_kmeans.features)

    def extract_features(self, audio_iter: Iterator[np.ndarray]) -> np.ndarray:
        """Phase 1 (trainer.py:841-866): feature extraction + NaN filter."""
        feats = []
        for _ in range(self.feature_extraction_num_steps):
            wav = next(audio_iter)
            emb = np.asarray(self._features(jnp.asarray(wav)))
            emb = emb.reshape(-1, emb.shape[-1])
            emb = emb[~np.isnan(emb).any(axis=-1)]
            feats.append(emb)
        return np.concatenate(feats, axis=0)

    def fit(self, features: np.ndarray, rng: jax.Array, epochs: int = 3) -> KMeansState:
        """Phase 2: minibatch Lloyd's over shuffled feature batches."""
        state = minibatch_kmeans_init(
            jnp.asarray(features[: max(self.n_clusters, self.fit_batch_size)]),
            self.n_clusters,
            rng,
        )
        update = jax.jit(minibatch_kmeans_update)
        n = len(features)
        rs = np.random.RandomState(0)
        for _ in range(epochs):
            order = rs.permutation(n)
            for i in range(0, n - self.fit_batch_size + 1, self.fit_batch_size):
                batch = jnp.asarray(features[order[i : i + self.fit_batch_size]])
                state = update(state, batch)
        return state

    def train(self, audio_iter: Iterator[np.ndarray], rng: jax.Array) -> np.ndarray:
        features = self.extract_features(audio_iter)
        state = self.fit(features, rng)
        centroids = np.asarray(state.centroids)
        inertia = float(kmeans_inertia(jnp.asarray(features[:10000]), state.centroids))
        save_checkpoint(
            str(Path(self.results_folder) / "kmeans.ckpt"),
            {"centroids": centroids, "inertia": np.float32(inertia)},
        )
        self.hubert_kmeans.centroids = jnp.asarray(centroids)
        return centroids
