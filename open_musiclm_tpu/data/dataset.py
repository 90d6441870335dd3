"""Host-side datasets: multi-rate audio crops and preprocessed-token crops.

TPU-native rebuild of reference open_musiclm/data.py:
  * ``SoundDataset`` (data.py:65-240): glob audio files, random nested
    multi-rate crops — views sorted longest->shortest so shorter views are
    sub-crops of longer ones — per-view resample/normalize/int16-quantize,
    seq-multiple curtail, load-error retry with a random other index;
  * ``SoundDatasetForPreprocessing`` (data.py:244-301): whole-track views
    (repeat-pad to >= window, pad to whole second), None on load error;
  * ``PreprocessedDataset`` (data.py:304-431): aligned whole-second outer
    (clap+semantic) / inner (acoustic) window crops from the token store;
  * a threaded prefetching batch iterator replacing torch DataLoader
    workers (decode happens in native C++, audio_io.py, which releases the
    GIL — Python threads give true parallel decode).
"""

from __future__ import annotations

import concurrent.futures
import dataclasses
import random
from pathlib import Path
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from .audio_io import read_audio, resample_np
from .tokenstore import ShardedTokenStore

AUDIO_EXTS = ("wav", "flac", "mp3")


def zero_mean_unit_var_np(x: np.ndarray, eps: float = 1e-7) -> np.ndarray:
    n = x.shape[-1]
    var = x.var(axis=-1, keepdims=True) * n / max(n - 1, 1)
    return (x - x.mean(axis=-1, keepdims=True)) / np.sqrt(var + eps)


def int16_round_trip_np(x: np.ndarray) -> np.ndarray:
    return ((np.clip(x, -1.0, 1.0) * 32767.0).astype(np.int16)).astype(np.float32) / 32767.0


def _cast_tuple(v, n):
    return v if isinstance(v, tuple) else (v,) * n


@dataclasses.dataclass
class SoundDataset:
    folder: str
    max_length_seconds: Tuple[Optional[float], ...] = (1.0,)
    normalize: Tuple[bool, ...] = (False,)
    target_sample_hz: Tuple[Optional[int], ...] = (None,)
    seq_len_multiple_of: Tuple[Optional[int], ...] = (None,)
    ignore_files: Optional[List[str]] = None
    ignore_load_errors: bool = True
    random_crop: bool = True
    exts: Tuple[str, ...] = AUDIO_EXTS
    seed: int = 0

    def __post_init__(self):
        n = len(self.target_sample_hz)
        self.max_length_seconds = _cast_tuple(self.max_length_seconds, n)
        self.normalize = _cast_tuple(self.normalize, n)
        self.seq_len_multiple_of = _cast_tuple(self.seq_len_multiple_of, n)
        ignore = set((f.split("/")[-1] for f in (self.ignore_files or [])))
        files: List[Path] = []
        for ext in self.exts:
            files.extend(
                f for f in Path(self.folder).glob(f"**/*.{ext}") if f.name not in ignore
            )
        assert files, f"no sound files found in {self.folder}"
        self.files = sorted(files)
        self._rng = random.Random(self.seed)

    def __len__(self) -> int:
        return len(self.files)

    def _load(self, idx: int) -> Tuple[np.ndarray, int]:
        data, sr = read_audio(str(self.files[idx]))
        return data[None, :], sr  # [1, T] mono

    def __getitem__(self, idx: int):
        try:
            data, sr = self._load(idx)
        except Exception:
            if self.ignore_load_errors:
                return self[self._rng.randrange(len(self))]
            raise
        return self.process_audio(data, sr, pad_to_target_length=True)

    def process_audio(
        self, data: np.ndarray, sample_hz: int, pad_to_target_length: bool = True
    ):
        """Nested multi-rate cropping — reference data.py:129-200."""
        temp = data
        temp_norm = zero_mean_unit_var_np(data)
        n = len(self.target_sample_hz)
        views: List[Optional[np.ndarray]] = [None] * n

        order = sorted(
            enumerate(self.max_length_seconds),
            key=lambda t: (t[1] is not None, t[1]),
        )
        for unsorted_i, max_len_s in order:
            if max_len_s is not None:
                audio_len = temp.shape[1]
                target = int(max_len_s * sample_hz)
                if audio_len > target:
                    start = self._rng.randrange(audio_len - target) if self.random_crop else 0
                    temp = temp[:, start : start + target]
                    temp_norm = temp_norm[:, start : start + target]
                elif pad_to_target_length:
                    pad = target - audio_len
                    temp = np.pad(temp, ((0, 0), (0, pad)))
                    temp_norm = np.pad(temp_norm, ((0, 0), (0, pad)))
            views[unsorted_i] = temp_norm if self.normalize[unsorted_i] else temp

        out = []
        for i, (view, tsr, mult) in enumerate(
            zip(views, self.target_sample_hz, self.seq_len_multiple_of)
        ):
            v = view
            if tsr is not None and tsr != sample_hz:
                v = resample_np(v[0], sample_hz, tsr)[None]
            if not self.normalize[i]:
                v = int16_round_trip_np(v)
            v = v[0]
            if mult is not None:
                v = v[: (len(v) // mult) * mult]
            out.append(v.astype(np.float32))
        return out[0] if n == 1 else tuple(out)


@dataclasses.dataclass
class SoundDatasetForPreprocessing(SoundDataset):
    pad_to_seconds: int = 10

    def __getitem__(self, idx: int):
        try:
            data, sr = self._load(idx)
        except Exception:
            if self.ignore_load_errors:
                return None
            raise
        max_len = self.pad_to_seconds * sr
        T = data.shape[1]
        if T < max_len:
            n_rep = max_len // T
            data = np.tile(data, (1, n_rep))
            data = np.pad(data, ((0, 0), (0, max_len - data.shape[1])))
        else:
            data = np.pad(data, ((0, 0), (0, sr - T % sr)))
        return {
            "idx": idx,
            "data": self.process_audio(data, sr, pad_to_target_length=False),
            "file_path": str(self.files[idx]),
        }


@dataclasses.dataclass
class PreprocessedDataset:
    """Aligned random window crops from the token store (data.py:304-431)."""

    folder: str
    stage: str  # semantic | coarse | fine
    semantic_window_seconds: int = 10
    coarse_window_seconds: int = 4
    fine_window_seconds: int = 2
    semantic_steps_per_second: int = 50
    acoustic_steps_per_second: int = 75
    seed: int = 0

    def __post_init__(self):
        self.store = ShardedTokenStore(self.folder)
        self._rng = random.Random(self.seed)

    def __len__(self):
        return len(self.store)

    def _audio_length(self, clap=None, semantic=None, coarse=None, fine=None) -> int:
        lengths = []
        if clap is not None:
            lengths.append(clap.shape[0] + self.semantic_window_seconds - 1)
        if semantic is not None:
            lengths.append((semantic.shape[1] + 1) // self.semantic_steps_per_second)
        if coarse is not None:
            lengths.append(coarse.shape[1] // self.acoustic_steps_per_second)
        if fine is not None:
            lengths.append(fine.shape[1] // self.acoustic_steps_per_second)
        lengths = [int(l) for l in lengths]
        assert len(set(lengths)) == 1, f"audio lengths are not equal: {lengths}"
        return lengths[0]

    def _crop_semantic(self, ids, s, e):
        return ids[:, s * self.semantic_steps_per_second : e * self.semantic_steps_per_second - 1]

    def _crop_acoustic(self, ids, s, e):
        return ids[:, s * self.acoustic_steps_per_second : e * self.acoustic_steps_per_second]

    def __getitem__(self, i: int):
        if self.stage == "semantic":
            clap, semantic = self.store.get(i, ("clap", "semantic"))
            clap, semantic = clap.astype(np.int32), semantic.astype(np.int32)
            L = self._audio_length(clap=clap, semantic=semantic)
            s = self._rng.randint(0, L - self.semantic_window_seconds)
            e = s + self.semantic_window_seconds
            return (clap[s][None], self._crop_semantic(semantic, s, e))
        if self.stage == "coarse":
            clap, semantic, coarse = self.store.get(i, ("clap", "semantic", "coarse"))
            clap, semantic, coarse = (
                clap.astype(np.int32), semantic.astype(np.int32), coarse.astype(np.int32)
            )
            L = self._audio_length(clap=clap, semantic=semantic, coarse=coarse)
            os_ = self._rng.randint(0, L - self.semantic_window_seconds)
            oe = os_ + self.semantic_window_seconds
            is_ = self._rng.randint(os_, oe - self.coarse_window_seconds)
            ie = is_ + self.coarse_window_seconds
            return (
                clap[os_][None],
                self._crop_semantic(semantic, is_, ie),
                self._crop_acoustic(coarse, is_, ie),
            )
        if self.stage == "fine":
            clap, coarse, fine = self.store.get(i, ("clap", "coarse", "fine"))
            clap, coarse, fine = (
                clap.astype(np.int32), coarse.astype(np.int32), fine.astype(np.int32)
            )
            L = self._audio_length(clap=clap, coarse=coarse, fine=fine)
            os_ = self._rng.randint(0, L - self.semantic_window_seconds)
            oe = os_ + self.semantic_window_seconds
            is_ = self._rng.randint(os_, oe - self.fine_window_seconds)
            ie = is_ + self.fine_window_seconds
            return (
                clap[os_][None],
                self._crop_acoustic(coarse, is_, ie),
                self._crop_acoustic(fine, is_, ie),
            )
        raise ValueError(self.stage)


def pad_to_longest(batch: List[Tuple[np.ndarray, ...]]) -> Tuple[np.ndarray, ...]:
    """Stack a list of per-example tuples, right-padding dim 0 to the longest
    (reference pad_to_longest_fn, data.py:234-236)."""
    out = []
    for col in zip(*batch):
        maxlen = max(x.shape[0] for x in col)
        padded = np.stack(
            [np.pad(x, [(0, maxlen - x.shape[0])] + [(0, 0)] * (x.ndim - 1)) for x in col]
        )
        out.append(padded)
    return tuple(out)


def batch_iterator(
    dataset,
    batch_size: int,
    *,
    shuffle: bool = True,
    seed: int = 0,
    num_workers: int = 4,
    collate=pad_to_longest,
    indices: Optional[Sequence[int]] = None,
    flatten_token_batches: bool = True,
) -> Iterator[Tuple[np.ndarray, ...]]:
    """Infinite threaded prefetching batch iterator. Token tuples from
    PreprocessedDataset are flattened to [B, n] per sequence."""
    idxs = list(indices if indices is not None else range(len(dataset)))
    rng = random.Random(seed)

    def sample_indices():
        while True:
            order = idxs[:]
            if shuffle:
                rng.shuffle(order)
            yield from order

    index_stream = sample_indices()

    def fetch(i):
        item = dataset[i]
        return item

    with concurrent.futures.ThreadPoolExecutor(num_workers) as pool:
        pending = []
        while True:
            while len(pending) < batch_size * 2:
                pending.append(pool.submit(fetch, next(index_stream)))
            items, rest = [], []
            for f in pending:
                (items if len(items) < batch_size else rest).append(f)
            pending = rest
            results = [f.result() for f in items]
            results = [r for r in results if r is not None]
            while len(results) < batch_size:
                results.append(dataset[next(index_stream)])
            batch = collate(results)
            if flatten_token_batches:
                batch = tuple(
                    b.reshape(b.shape[0], -1) if b.ndim > 2 else b for b in batch
                )
            yield batch


def train_valid_split(n: int, valid_frac: float, seed: int = 42):
    """Random split (reference trainer.py:272-281)."""
    idxs = list(range(n))
    random.Random(seed).shuffle(idxs)
    n_valid = int(n * valid_frac)
    return idxs[n_valid:], idxs[:n_valid]
