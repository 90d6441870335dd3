"""Offline dataset tokenization (reference preprocess.py:82-300).

Per track (repeat-padded to >= the semantic window, then padded to a whole
second):
  1) CLAP conditioning tokens on a 10 s sliding window with 1 s hop,
     minibatched through the frozen CLAP tower (preprocess.py:232-246);
  2) semantic tokens over the full track (MERT + k-means);
  3) Encodec codes over the full track, split coarse/fine.
Tokens are stored uint16 in the sqlite token store. Multi-process sharding is
by ``idx * world + rank`` like the reference (preprocess.py:259), but each
rank writes its OWN shard (tokenstore.py) instead of sharing one sqlite file.
Restart-idempotent via row-existence check (preprocess.py:260-263).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.clap.clap import ClapQuantized
from ..models.encodec import EncodecModel
from ..models.hubert import HubertWithKmeans
from .dataset import SoundDatasetForPreprocessing
from .tokenstore import writer_for_rank


@dataclasses.dataclass
class DataPreprocessor:
    clap: ClapQuantized
    wav2vec: HubertWithKmeans
    codec: EncodecModel
    codec_params: object
    folder: str
    results_folder: str
    num_coarse_quantizers: int = 3
    max_audio_length_seconds: int = 30
    clap_audio_length_seconds: int = 10
    semantic_audio_length_seconds: int = 10
    clap_batch_size: int = 32
    random_crop: bool = True
    num_crops: int = 1
    replace_existing: bool = False
    rank: int = 0
    world: int = 1
    ignore_files: Optional[list] = None

    def __post_init__(self):
        assert self.clap_audio_length_seconds == self.semantic_audio_length_seconds
        self.ds = SoundDatasetForPreprocessing(
            folder=self.folder,
            pad_to_seconds=self.semantic_audio_length_seconds,
            max_length_seconds=(self.max_audio_length_seconds,) * 3,
            random_crop=self.random_crop,
            normalize=(False, True, False),
            target_sample_hz=(
                self.clap.sample_rate,
                self.wav2vec.target_sample_hz,
                self.codec.sample_rate,
            ),
            seq_len_multiple_of=(None, self.wav2vec.seq_len_multiple_of, None),
            ignore_files=self.ignore_files,
        )
        self.store = writer_for_rank(self.results_folder, self.rank, self.world)
        self._tok_audio = jax.jit(self.clap.tokenize_audio)
        self._semantic = jax.jit(self.wav2vec.__call__)
        self._encode = jax.jit(
            lambda w: self.codec.apply(self.codec_params, w, method=EncodecModel.encode)
        )

    def tokenize_track(self, wave_clap, wave_semantic, wave_acoustic):
        """Returns (clap [W, Q], semantic [1, T], coarse [1, T', 3],
        fine [1, T', 5]) numpy arrays."""
        sr = self.clap.sample_rate
        win = self.clap_audio_length_seconds * sr
        n_windows = (len(wave_clap) - win) // sr + 1
        clap_tokens = []
        for i in range(0, n_windows, self.clap_batch_size):
            rows = [
                wave_clap[j * sr : j * sr + win]
                for j in range(i, min(i + self.clap_batch_size, n_windows))
            ]
            toks = self._tok_audio(jnp.asarray(np.stack(rows)))  # [b, Q, 1]
            clap_tokens.append(np.asarray(toks[..., 0]))
        clap_ids = np.concatenate(clap_tokens, axis=0)

        sem = np.asarray(self._semantic(jnp.asarray(wave_semantic)[None]))
        codes = np.asarray(self._encode(jnp.asarray(wave_acoustic)[None]))
        # stored 3D [1, T', n_q] like the reference (crops index time axis 1,
        # flattening to [B, (t q)] happens at train time)
        coarse = codes[..., : self.num_coarse_quantizers]
        fine = codes[..., self.num_coarse_quantizers :]
        return clap_ids, sem, coarse, fine

    def process(self, progress=None) -> int:
        """Tokenize this rank's shard of the dataset. Returns #rows written."""
        written = 0
        n_iters = self.num_crops * len(self.ds)
        for i in range(n_iters):
            if i % self.world != self.rank % self.world and self.world > 1:
                continue
            item = self.ds[i % len(self.ds)]
            if item is None:
                continue
            idx = i
            if not self.replace_existing and self.store.has(idx):
                continue
            wave_clap, wave_semantic, wave_acoustic = item["data"]
            clap_ids, sem, coarse, fine = self.tokenize_track(
                wave_clap, wave_semantic, wave_acoustic
            )
            self.store.put(idx, item["file_path"], clap_ids, sem, coarse, fine)
            written += 1
            if progress is not None:
                progress(i, n_iters)
        return written
