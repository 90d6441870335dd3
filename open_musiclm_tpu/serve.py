"""Batched text-to-music serving (BASELINE.json config 5).

A continuous-batching front for ``MusicLM.generate``: concurrent requests
accumulate into fixed-size batches (padded with repeats so every batch hits
the SAME compiled geometry — one compile serves all load levels), run through
the 3-stage KV-cached pipeline, and resolve per-request futures.

Throughput comes from batch amortization of the weight-bandwidth-bound
decode (DESIGN.md): measured on one v5e chip, batch 64 with the int8
fused-FF + flash int8 KV + approx-topk serving modes runs ~180 audio-sec
per wall-second (bench.py; Stage.quantized / Stage.flash_kv /
$OPEN_MUSICLM_APPROX_TOPK). On a multi-chip mesh, either run one server
per chip or construct the MusicLM with ``serving_mesh`` — every stage then
shard_maps its prompt batch over the mesh's dp axis (works for the Pallas
int8 decode paths; row-exact vs unsharded, tested). For
long-form generation, construct the server with
``musiclm.to_pipelined(devices)`` so the three stage loops overlap across
devices (models/musiclm.py).
"""

from __future__ import annotations

import dataclasses
import queue
import threading
from concurrent.futures import Future
from typing import Any, List, Optional

import jax
import numpy as np

from .models.musiclm import MusicLM


@dataclasses.dataclass
class GenerationRequest:
    text: Optional[str]
    clap_token_ids: Optional[Any]
    future: "Future[np.ndarray]"
    seed: int


class GenerationServer:
    """Fixed-geometry continuous batching over MusicLM.generate."""

    def __init__(
        self,
        musiclm: MusicLM,
        *,
        batch_size: int = 8,
        batch_timeout_s: float = 0.05,
        batch_buckets: Optional[List[int]] = None,
        num_workers: int = 2,
        **generate_kwargs,
    ):
        """``batch_buckets``: optional ascending bucket sizes (e.g.
        [1, 8, 64]); a batch pads to the smallest bucket that fits instead
        of always to ``batch_size`` — low-load requests then run at
        batch-1-like latency (0.24 s vs 1.5 s for a full batch-64 pass on
        one v5e chip) at the cost of one compile per bucket geometry.
        Defaults to [batch_size].

        ``num_workers``: concurrent batch pipelines (default 2). With one
        worker, a request arriving just after a batch dispatches waits that
        ENTIRE batch out before its own batch even forms; with two, the
        second worker forms and dispatches the late batch immediately, so it
        runs as soon as the device drains the in-flight work (JAX async
        dispatch queues it) instead of after the first batch's host sync.
        Per-request seeds keep results identical regardless of which worker
        or batch a request lands in (tests/test_serve.py)."""
        self.musiclm = musiclm
        self.batch_size = batch_size
        self.batch_timeout_s = batch_timeout_s
        self.batch_buckets = sorted(batch_buckets or [batch_size])
        assert self.batch_buckets[-1] == batch_size, (
            "largest bucket must equal batch_size"
        )
        self.num_workers = max(1, int(num_workers))
        self.generate_kwargs = generate_kwargs
        self._queue: "queue.Queue[Optional[GenerationRequest]]" = queue.Queue()
        self._threads: List[threading.Thread] = []
        self._running = False

    # ---- public API ----

    def start(self):
        self._running = True
        self._threads = [
            threading.Thread(target=self._worker, daemon=True, name=f"gen-worker-{i}")
            for i in range(self.num_workers)
        ]
        for t in self._threads:
            t.start()
        return self

    def stop(self):
        """Stop the workers. In-flight batches finish and resolve; requests
        still queued (never dispatched) get their futures CANCELLED rather
        than left dangling forever."""
        self._running = False
        for _ in self._threads or [None]:
            self._queue.put(None)
        for t in self._threads:
            t.join(timeout=60)
        self._threads = []
        # drain: everything still in the queue was never picked up
        while True:
            try:
                r = self._queue.get_nowait()
            except queue.Empty:
                break
            if r is not None and not r.future.done():
                if not r.future.cancel():  # pragma: no cover - already running
                    r.future.set_exception(RuntimeError("server stopped"))

    def submit(
        self, text: Optional[str] = None, clap_token_ids=None, seed: int = 0
    ) -> "Future[np.ndarray]":
        """Returns a future resolving to the generated waveform [T]."""
        fut: "Future[np.ndarray]" = Future()
        self._queue.put(GenerationRequest(text, clap_token_ids, fut, seed))
        return fut

    def generate_blocking(self, texts: List[str], seed: int = 0) -> List[np.ndarray]:
        futs = [self.submit(t, seed=seed + i) for i, t in enumerate(texts)]
        return [f.result() for f in futs]

    # ---- worker ----

    def _collect_batch(self) -> List[GenerationRequest]:
        reqs: List[GenerationRequest] = []
        try:
            first = self._queue.get(timeout=0.25)
        except queue.Empty:
            return reqs
        if first is None:
            return reqs
        reqs.append(first)
        deadline = self.batch_timeout_s
        while len(reqs) < self.batch_size:
            try:
                r = self._queue.get(timeout=deadline)
            except queue.Empty:
                break
            if r is None:
                break
            reqs.append(r)
        return reqs

    def _worker(self):
        import jax.numpy as jnp

        while self._running:
            reqs = self._collect_batch()
            if not reqs:
                continue
            try:
                n = len(reqs)
                # smallest compiled bucket that fits this batch (low-load
                # latency: a lone request runs the batch-1 geometry)
                bucket = next(b for b in self.batch_buckets if b >= n)
                # resolve clap tokens: text requests share ONE batched text-
                # tower call at the bucket geometry (padded by repeats,
                # like the stage batch) instead of one RoBERTa forward each
                text_idx = [i for i, r in enumerate(reqs) if r.clap_token_ids is None]
                text_toks = None
                if text_idx:
                    texts = [reqs[i].text for i in text_idx]
                    while len(texts) < bucket:
                        texts.append(texts[-1])
                    text_toks = self.musiclm.clap_tokens_from_text(texts)
                toks = []
                for i, r in enumerate(reqs):
                    if r.clap_token_ids is not None:
                        toks.append(jnp.asarray(r.clap_token_ids))
                    else:
                        toks.append(text_toks[text_idx.index(i)])
                # pad to the bucket geometry by repeating the last request
                while len(toks) < bucket:
                    toks.append(toks[-1])
                clap_batch = jnp.stack(toks)

                # per-request seeds -> per-row keys: row i's audio is a
                # function of reqs[i].seed only, independent of which batch
                # (and batch slot) the request landed in; padding rows get
                # distinct throwaway keys
                row_keys = jnp.stack(
                    [jax.random.PRNGKey(r.seed) for r in reqs]
                    + [
                        jax.random.PRNGKey(-(i + 1))
                        for i in range(bucket - n)
                    ]
                )
                waves = self.musiclm.generate(
                    per_row_keys=row_keys,
                    clap_token_ids=clap_batch,
                    **self.generate_kwargs,
                )
                waves = np.asarray(waves)
                for i, r in enumerate(reqs):
                    r.future.set_result(waves[i])
            except Exception as exc:  # pragma: no cover
                for r in reqs:
                    if not r.future.done():
                        r.future.set_exception(exc)
