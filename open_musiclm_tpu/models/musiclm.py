"""MusicLM hierarchy: text -> semantic -> coarse -> fine -> waveform.

TPU-native rebuild of reference ``MusicLM`` (open_musiclm.py:818-1071):
  * CLAP text tokens condition every stage;
  * semantic stage generates 50 Hz tokens in sliding windows with 50 %
    overlap continuation (:938-949);
  * coarse stage consumes 4 s semantic windows (199 tokens) and continues
    from the previous window's last 150 coarse tokens, temp 0.95 (:956-984);
  * fine stage consumes 2 s coarse windows, temp 0.4 (:996-1023);
  * coarse+fine codes -> Encodec decode (:1032-1034);
  * audio-prompt continuation (:896-926) and CLAP-similarity reranking
    ``generate_top_match`` (:1039-1071).

Every per-window generate call is a fixed-shape jitted KV-cached decode
(models/stages.py); distinct window geometries compile once and are reused
across windows, prompts and batch items.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.sampling import fold_in_rows
from ..ops.audio import prepare_audio, resample, int16_round_trip
from .clap.clap import ClapQuantized
from .encodec import EncodecModel
from .hubert import HubertWithKmeans
from .stages import Stage


def unfold_windows(x: jnp.ndarray, window: int, step: int) -> jnp.ndarray:
    """[b, L, q] -> [n, b, window, q] sliding windows (torch .unfold)."""
    L = x.shape[1]
    n = (L - window) // step + 1
    idx = np.arange(n)[:, None] * step + np.arange(window)[None, :]
    return jnp.transpose(x[:, idx], (1, 0, 2, 3))


def _gather_span(segments: Sequence[jnp.ndarray], start: int, length: int) -> jnp.ndarray:
    """Slice [start, start+length) out of a virtual concatenation of per-window
    ``segments`` ([b, L_i, q]) WITHOUT materializing the full concat.

    Value-identical to ``jnp.concatenate(segments, 1)[:, start:start+length]``,
    but the result's dataflow depends only on the segments it overlaps — so a
    coarse window dispatched from the first semantic window does not wait for
    the whole semantic sliding-window loop (3-stage decode pipelining; the
    reference's loops fully serialize, open_musiclm.py:938-1023)."""
    parts = []
    off = 0
    for seg in segments:
        L = seg.shape[1]
        lo, hi = max(start, off), min(start + length, off + L)
        if lo < hi:
            parts.append(seg[:, lo - off : hi - off])
        off += L
    assert parts and sum(p.shape[1] for p in parts) == length, (
        f"span [{start}, {start + length}) outside segments (total {off})"
    )
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)


def _put(x: Optional[jnp.ndarray], device) -> Optional[jnp.ndarray]:
    """device_put when a stage device is set; identity otherwise/on None."""
    if x is None or device is None:
        return x
    return jax.device_put(x, device)


@dataclasses.dataclass
class MusicLM:
    """Full inference model. ``codec_params`` are the Encodec weights.

    ``stage_devices``: optional ``(semantic, coarse, fine, codec)`` devices.
    When set (see :meth:`to_pipelined`), each stage's params and inputs live
    on its own device and the host dispatches all three sliding-window loops
    without blocking — JAX async dispatch then overlaps window w's coarse
    decode with window w+1's semantic decode across the devices (the
    reference's loops serialize on one GPU, open_musiclm.py:938-1023)."""

    clap: ClapQuantized
    codec: EncodecModel
    codec_params: Any
    semantic_stage: Stage
    coarse_stage: Stage
    fine_stage: Stage
    wav2vec: Optional[HubertWithKmeans] = None
    tokenizer: Any = None  # host-side text tokenizer (clap.tokenizer)
    stage_devices: Optional[Tuple[Any, Any, Any, Any]] = None
    # optional jax.sharding.Mesh: shard every stage's prompt batch over its
    # ``dp`` axis via shard_map (multi-chip serving of the int8/Pallas decode
    # paths; requires per_row_keys — see Stage.generate)
    serving_mesh: Any = None

    def __post_init__(self):
        self._decode_jit = jax.jit(
            lambda p, c: self.codec.apply(p, c, method=EncodecModel.decode)
        )
        self._decode_stem_jit = jax.jit(
            lambda p, c: self.codec.apply(p, c, method=EncodecModel.decode_stem)
        )
        self._decode_head_jit = jax.jit(
            lambda p, h: self.codec.apply(p, h, method=EncodecModel.decode_head)
        )
        self._encode = jax.jit(
            lambda p, w: self.codec.apply(p, w, method=EncodecModel.encode)
        )

    def _decode(self, params, codes: jnp.ndarray) -> jnp.ndarray:
        """Encodec decode with the batch chunked to cap HBM: XLA lays the
        decoder's late [rows, samples, 32ch] bf16 activations out with
        channels on the 128-lane axis and rows on the 8-sublane axis, so
        each buffer pads to [ceil(rows/8)*8, samples, 128] — a 6.4x
        expansion at 10 rows (three live 5.49 G temps for a 60 s clip,
        .lanes/large_longform_r5c.err; 32 unchunked rows needed 27.5 G,
        .lanes/large_longform_r5.err). Rows are independent through the
        whole decoder, so chunking is value-identical.
        ``$OPEN_MUSICLM_MAX_DECODE_FRAMES`` caps rows*frames per call.
        The default 36000 puts a 60 s (4500-frame) clip at exactly the
        8-row sublane quantum — three 2.95 G padded temps ≈ 9 G peak —
        while short clips (750 frames = 10 s) keep batch 32+ in one call
        (proven green, .lanes/large_longform_r5.out). At most two distinct
        chunk shapes compile."""
        cap = int(os.environ.get("OPEN_MUSICLM_MAX_DECODE_FRAMES", "36000"))
        b, T = codes.shape[0], codes.shape[1]
        rows = max(1, cap // max(T, 1))
        if b <= rows:
            return self._decode_jit(params, codes)
        # Chunked path: run the decoder STEM (dequantize + conv_in + 2-layer
        # LSTM at 75 Hz) once for the whole batch — its [b, T, 512] state is
        # tiny, but its lax.scan is sequential in T, and the old
        # decode-per-chunk path re-paid those 2*T scan steps per chunk
        # (measured: long-form Encodec decode ran 4x slower per audio-second
        # than short-clip, .lanes/pipelined_ab_r5.out). Only the
        # row-independent upsampling HEAD is chunked for HBM.
        if rows > 8:
            rows -= rows % 8  # keep chunks on the 8-sublane quantum
        h = self._decode_stem_jit(params, codes)
        outs = [
            self._decode_head_jit(params, h[i : i + rows])
            for i in range(0, b, rows)
        ]
        return jnp.concatenate(outs, axis=0)

    def to_pipelined(self, devices: Sequence[Any]) -> "MusicLM":
        """Return a copy with semantic/coarse/fine/codec placed on their own
        devices (``devices[i % len(devices)]``) for cross-stage pipelining.
        One device degenerates to the unpipelined layout."""
        devs = tuple(devices[i % len(devices)] for i in range(4))
        return dataclasses.replace(
            self,
            semantic_stage=dataclasses.replace(
                self.semantic_stage, params=jax.device_put(self.semantic_stage.params, devs[0])
            ),
            coarse_stage=dataclasses.replace(
                self.coarse_stage, params=jax.device_put(self.coarse_stage.params, devs[1])
            ),
            fine_stage=dataclasses.replace(
                self.fine_stage, params=jax.device_put(self.fine_stage.params, devs[2])
            ),
            codec_params=jax.device_put(self.codec_params, devs[3]),
            stage_devices=devs,
        )

    # ---- tokenizers ----

    def clap_tokens_from_text(self, text: List[str]) -> jnp.ndarray:
        assert self.tokenizer is not None, (
            "text prompts need a tokenizer: pass --tokenizer_path (a dir "
            "with roberta-base vocab.json + merges.txt) or supply "
            "precomputed clap_token_ids"
        )
        enc = self.tokenizer(text)
        return self.clap.tokenize_text(
            jnp.asarray(enc["input_ids"]), jnp.asarray(enc["attention_mask"])
        )

    # ---- main generation (reference MusicLM.forward, :864-1035) ----

    def generate(
        self,
        *,
        key: Optional[jax.Array] = None,
        text: Optional[List[str]] = None,
        clap_token_ids: Optional[jnp.ndarray] = None,
        prime_wave: Optional[jnp.ndarray] = None,
        prime_wave_sample_hz: Optional[int] = None,
        output_seconds: float = 8,
        semantic_window_seconds: int = 10,
        coarse_window_seconds: int = 4,
        fine_window_seconds: int = 2,
        semantic_steps_per_second: int = 50,
        acoustic_steps_per_second: int = 75,
        return_coarse_generated_wave: bool = False,
        semantic_sliding_window_step_percent: float = 0.5,
        coarse_sliding_window_step_percent: float = 0.5,
        fine_sliding_window_step_percent: float = 1.0,
        semantic_temperature: float = 1.0,
        coarse_temperature: float = 0.95,
        fine_temperature: float = 0.4,
        semantic_filter_thres: float = 0.9,
        coarse_filter_thres: float = 0.9,
        fine_filter_thres: float = 0.9,
        per_row_keys: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """``per_row_keys``: optional [b] keys making row i's sampling a
        function of its own key only — a request's audio then does not depend
        on which serving batch it landed in (``key`` is ignored)."""
        if output_seconds < coarse_window_seconds:
            raise ValueError(
                f"output_seconds={output_seconds} is shorter than the coarse "
                f"window ({coarse_window_seconds} s): the semantic->coarse "
                "unfold would produce zero windows (same constraint as the "
                "reference's torch.unfold, open_musiclm.py:954-960). "
                "Generate at least one coarse window."
            )
        if clap_token_ids is None:
            assert text is not None
            clap_token_ids = self.clap_tokens_from_text(text)

        if per_row_keys is None:
            assert key is not None, "need `key` or `per_row_keys`"
            keys = jax.random.split(key, 4)
        else:
            keys = None

        def stage_rng(stage_idx: int, win_idx: int):
            """(single key, per-row keys) pair for one stage/window call."""
            if per_row_keys is not None:
                return None, fold_in_rows(per_row_keys, stage_idx, win_idx)
            return jax.random.fold_in(keys[stage_idx], win_idx), None

        # ---- audio-prompt continuation state (:888-926) ----
        all_cond_coarse = all_cond_fine = None
        cond_semantic = cond_coarse = cond_fine = None
        semantic_adj = coarse_adj = fine_adj = 0
        if prime_wave is not None:
            assert prime_wave_sample_hz is not None and self.wav2vec is not None
            wav_sem = prepare_audio(
                prime_wave, prime_wave_sample_hz, self.wav2vec.target_sample_hz,
                normalize=True, target_length_seconds=semantic_window_seconds,
            )
            wav_enc = prepare_audio(
                prime_wave, prime_wave_sample_hz, self.codec.sample_rate,
                normalize=False, target_length_seconds=semantic_window_seconds,
            )
            sem_ids = self.wav2vec(wav_sem)[..., None]  # [b, t, 1]
            codes = self._encode(self.codec_params, wav_enc)
            n_coarse = self.coarse_stage.model.specs[-1].num_quantizers
            coarse_ids, fine_ids = codes[..., :n_coarse], codes[..., n_coarse:]

            sem_len = int(
                semantic_steps_per_second * semantic_window_seconds
                * (1 - semantic_sliding_window_step_percent)
            )
            coarse_len = int(
                acoustic_steps_per_second * coarse_window_seconds
                * (1 - coarse_sliding_window_step_percent)
            )
            fine_len = int(
                acoustic_steps_per_second * fine_window_seconds
                * (1 - fine_sliding_window_step_percent)
            )
            all_cond_coarse, all_cond_fine = coarse_ids, fine_ids
            cond_semantic = sem_ids[:, -sem_len:] if sem_ids.shape[1] >= sem_len else sem_ids
            cond_coarse = coarse_ids[:, -coarse_len:]
            cond_fine = fine_ids[:, -fine_len:] if fine_len > 0 else None
            semantic_adj = sem_len - int(
                semantic_steps_per_second * coarse_window_seconds
                * (1 - coarse_sliding_window_step_percent)
            )
            coarse_adj = coarse_len - int(
                acoustic_steps_per_second * fine_window_seconds
                * (1 - fine_sliding_window_step_percent)
            )
            fine_adj = fine_len

        dev_sem, dev_coarse, dev_fine, dev_codec = self.stage_devices or (None,) * 4
        clap_sem = _put(clap_token_ids, dev_sem)
        clap_coarse = _put(clap_token_ids, dev_coarse)
        clap_fine = _put(clap_token_ids, dev_fine)
        cond_semantic = _put(cond_semantic, dev_sem)
        cond_coarse = _put(cond_coarse, dev_coarse)
        cond_fine = _put(cond_fine, dev_fine)

        # Each stage's windows are kept as a LIST of per-window segments (one
        # jnp.concatenate would make every downstream window depend on the
        # whole upstream loop); downstream windows gather only the spans they
        # overlap (_gather_span), so with stage_devices the three loops
        # overlap across devices via async dispatch.

        # ---- semantic stage: sliding-window AR (:928-949) ----
        first_T = int(
            min(output_seconds, semantic_window_seconds) * semantic_steps_per_second
        )
        k0, rk0 = stage_rng(0, 0)
        sem_segments = [
            self.semantic_stage.generate(
                [clap_sem],
                k0,
                max_time_steps=first_T,
                init_pred_ids=cond_semantic,
                temperature=semantic_temperature,
                filter_thres=semantic_filter_thres,
                per_row_keys=rk0,
                mesh=self.serving_mesh,
            )  # [b, T, 1]
        ]
        sem_total = first_T
        target_sem = int(output_seconds * semantic_steps_per_second)
        win_i = 1
        while sem_total < target_sem:
            cond_len = int(
                semantic_window_seconds * semantic_steps_per_second
                * (1 - semantic_sliding_window_step_percent)
            )
            kw, rkw = stage_rng(0, win_i)
            cont = self.semantic_stage.generate(
                [clap_sem],
                kw,
                max_time_steps=int(semantic_window_seconds * semantic_steps_per_second),
                init_pred_ids=_gather_span(sem_segments, sem_total - cond_len, cond_len),
                temperature=semantic_temperature,
                filter_thres=semantic_filter_thres,
                per_row_keys=rkw,
                mesh=self.serving_mesh,
            )
            sem_segments.append(cont[:, cond_len:])
            sem_total += cont.shape[1] - cond_len
            win_i += 1
        # front trim for audio-prompt continuation (negative adj matches the
        # old `sem[:, adj:]` python-slice semantics)
        sem_start = semantic_adj if semantic_adj >= 0 else max(sem_total + semantic_adj, 0)
        sem_len = sem_total - sem_start

        # ---- coarse stage over 4 s semantic windows (:954-984) ----
        window = int(coarse_window_seconds * semantic_steps_per_second - 1)
        step = int(window * coarse_sliding_window_step_percent)
        n_coarse_windows = (sem_len - window) // step + 1

        coarse_T = int(coarse_window_seconds * acoustic_steps_per_second)
        coarse_cond_len = int(
            coarse_window_seconds * acoustic_steps_per_second
            * (1 - coarse_sliding_window_step_percent)
        )
        coarse_segments = []
        prev_pred = None
        for wi in range(n_coarse_windows):
            sem_win = _put(
                _gather_span(sem_segments, sem_start + wi * step, window), dev_coarse
            )
            if prev_pred is not None:
                # NB -0 slices the whole array: step percent 1.0 => no carry
                init = prev_pred[:, -coarse_cond_len:] if coarse_cond_len > 0 else None
            else:
                init = cond_coarse
            kc, rkc = stage_rng(1, wi)
            prev_pred = self.coarse_stage.generate(
                [clap_coarse, sem_win],
                kc,
                max_time_steps=coarse_T,
                init_pred_ids=init,
                temperature=coarse_temperature,
                filter_thres=coarse_filter_thres,
                per_row_keys=rkc,
                mesh=self.serving_mesh,
            )  # [b, coarse_T, n_coarse]
            coarse_segments.append(
                prev_pred if wi == 0 else prev_pred[:, coarse_cond_len:]
            )
        coarse_total = sum(s.shape[1] for s in coarse_segments)

        if return_coarse_generated_wave:
            coarse = _put(jnp.concatenate(coarse_segments, axis=1), dev_codec)
            return self._decode(self.codec_params, coarse)

        coarse_start = (
            coarse_adj if coarse_adj >= 0 else max(coarse_total + coarse_adj, 0)
        )
        coarse_len = coarse_total - coarse_start

        # ---- fine stage over 2 s coarse windows (:994-1023) ----
        fine_window = int(fine_window_seconds * acoustic_steps_per_second)
        fine_step = int(fine_window * fine_sliding_window_step_percent)
        n_windows = (coarse_len - fine_window) // fine_step + 1
        fine_cond_len = int(fine_window * (1 - fine_sliding_window_step_percent))

        def coarse_win(wj: int) -> jnp.ndarray:
            return _gather_span(
                coarse_segments, coarse_start + wj * fine_step, fine_window
            )

        if fine_cond_len == 0 and cond_fine is None and n_windows > 1:
            # non-overlapping fine windows are independent given coarse+clap:
            # run them as ONE batched decode ([n_windows*b]) instead of the
            # reference's sequential loop (open_musiclm.py:1002-1023) —
            # sequential decode steps drop from n_windows*T*Q to T*Q.
            b = clap_token_ids.shape[0]
            # cap rows per batched decode: the fine PREFILL materializes
            # [rows, seq, 2*ffi] FF temps, and an uncapped 32-prompt x
            # 20-window long-form call (640 rows x 692 x 5460 bf16 = two
            # 4.5 GB temps + a 2.6 GB KV cache at 24 layers) exceeds v5e
            # HBM. Windows are independent given coarse+clap, so chunking
            # is value-identical for per-row keys; chunk 0 keeps the
            # legacy shared-key stream (goldens), later chunks fold the
            # chunk index in.
            rows_cap = int(os.environ.get("OPEN_MUSICLM_MAX_FINE_ROWS", "256"))
            win_per_call = max(1, rows_cap // max(b, 1))
            chunks = []
            q = None
            for g0 in range(0, n_windows, win_per_call):
                g1 = min(g0 + win_per_call, n_windows)
                nw = g1 - g0
                clap_rep = jnp.tile(clap_fine.reshape(b, -1), (nw, 1))
                coarse_flat = _put(
                    jnp.concatenate(
                        [coarse_win(w) for w in range(g0, g1)], axis=0
                    ),
                    dev_fine,
                )  # [nw*b, fine_window, q]
                if per_row_keys is not None:
                    kf, rkf = None, jnp.concatenate(
                        [fold_in_rows(per_row_keys, 2, w) for w in range(g0, g1)]
                    )
                else:
                    kf = keys[2] if g0 == 0 else jax.random.fold_in(keys[2], g0)
                    rkf = None
                pred = self.fine_stage.generate(
                    [clap_rep, coarse_flat],
                    kf,
                    max_time_steps=fine_window,
                    temperature=fine_temperature,
                    filter_thres=fine_filter_thres,
                    per_row_keys=rkf,
                    mesh=self.serving_mesh,
                )  # [nw*b, T, q]
                q = pred.shape[-1]
                chunks.append(pred.reshape(nw, b, fine_window, q))
            pred = jnp.concatenate(chunks, axis=0)  # [n_windows, b, T, q]
            fine = jnp.concatenate([pred[w] for w in range(n_windows)], axis=1)
        else:
            fine = None
            prev_fine = None
            for wi in range(n_windows):
                if prev_fine is not None:
                    init = prev_fine[:, -fine_cond_len:] if fine_cond_len > 0 else None
                else:
                    init = cond_fine
                kf, rkf = stage_rng(2, wi)
                prev_fine = self.fine_stage.generate(
                    [clap_fine, _put(coarse_win(wi), dev_fine)],
                    kf,
                    max_time_steps=fine_window,
                    init_pred_ids=init,
                    temperature=fine_temperature,
                    filter_thres=fine_filter_thres,
                    per_row_keys=rkf,
                    mesh=self.serving_mesh,
                )
                if fine is None:
                    fine = prev_fine
                else:
                    fine = jnp.concatenate([fine, prev_fine[:, fine_cond_len:]], axis=1)

        fine = fine[:, fine_adj:]
        coarse = _gather_span(coarse_segments, coarse_start, coarse_len)

        fine = _put(fine, dev_codec)
        coarse = _put(coarse, dev_codec)
        if all_cond_coarse is not None and all_cond_fine is not None:
            fine = jnp.concatenate([_put(all_cond_fine, dev_codec), fine], axis=1)
            coarse = jnp.concatenate([_put(all_cond_coarse, dev_codec), coarse], axis=1)

        # align lengths (unfold may drop a partial trailing window)
        T = min(coarse.shape[1], fine.shape[1])
        acoustic = jnp.concatenate([coarse[:, :T], fine[:, :T]], axis=-1)
        return self._decode(self.codec_params, acoustic)

    # ---- reranked generation (reference generate_top_match, :1039-1071) ----

    def generate_top_match(
        self,
        *,
        key: jax.Array,
        text: List[str],
        num_samples: int = 4,
        num_top_matches: int = 1,
        **kwargs,
    ) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
        all_samples, all_sims = [], []
        for pi, prompt in enumerate(text):
            enc = self.tokenizer([prompt])
            ids = jnp.asarray(enc["input_ids"])
            mask = jnp.asarray(enc["attention_mask"])
            text_latent = self.clap.text_embedding(ids, mask)  # [1, 512]
            clap_tokens = self.clap.quantize(text_latent)
            clap_tokens = jnp.repeat(clap_tokens, num_samples, axis=0)

            waves = self.generate(
                key=jax.random.fold_in(key, pi), clap_token_ids=clap_tokens, **kwargs
            )  # [num_samples, T]

            clap_in = resample(waves, self.codec.sample_rate, self.clap.sample_rate)
            clap_in = int16_round_trip(clap_in)
            audio_latents = self.clap.audio_embedding(clap_in)  # [n, 512]
            sim = jnp.sum(audio_latents * text_latent, axis=-1) / (
                jnp.linalg.norm(audio_latents, axis=-1)
                * jnp.linalg.norm(text_latent, axis=-1)
                + 1e-12
            )
            top = jnp.argsort(-sim)[:num_top_matches]
            all_sims.append(sim[top])
            all_samples.append(waves[top])
        return all_samples, all_sims
