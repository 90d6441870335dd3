"""Single-stage trainer: pjit data-parallel train step over a device Mesh.

TPU-native rebuild of reference ``SingleStageTrainer`` (trainer.py:111-560):
  * DDP -> mesh data parallelism: batch sharded over the ``dp`` axis,
    params/optimizer state replicated; XLA emits the gradient psum over ICI
    (no NCCL/Accelerate); SURVEY.md 5.8.
  * grad accumulation (trainer.py:428-441) -> a ``lax.scan`` over
    microbatches INSIDE the jitted step, so accumulation costs no host
    round trips;
  * AdamW + warmup + global-norm clip 0.5 -> one optax chain;
  * valid loss + token accuracy metrics (trainer.py:457-479);
  * step-stamped checkpoint save/resume (trainer.py:359-413, 536-549) via
    checkpoint.py.

The trainer consumes *token* batches (the preprocessed-data path,
trainer.py:244-268). On-the-fly tokenization from raw audio composes the
frozen tokenizers (CLAP / HuBERT+kmeans / Encodec) in data/pipeline.py.
"""

from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path
from typing import Any, Callable, Dict, Iterator, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models.token_cond import (
    StageLossConfig,
    TokenConditionedTransformer,
    stage_training_loss,
)
from ..parallel.mesh import DATA_AXIS, make_mesh, replicated, shard_batch_pytree
from .optimizer import make_optimizer


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


class _PreemptionGuard:
    """Latches SIGTERM/SIGINT so the train loop can checkpoint and exit."""

    def __init__(self):
        import signal

        self.triggered = False
        self._prev = {}
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                self._prev[sig] = signal.signal(sig, self._handler)
            except (ValueError, OSError):
                pass  # not the main thread / unsupported

    def _handler(self, signum, frame):
        self.triggered = True


def token_accuracy(logits, labels) -> jnp.ndarray:
    """Fraction of argmax-correct predictions (valid metric,
    trainer.py:457-479)."""
    pred = jnp.argmax(logits, axis=-1)
    return jnp.mean((pred == labels).astype(jnp.float32))


@dataclasses.dataclass
class StageTrainer:
    """Train one stage on token batches.

    ``batch`` layout per step: tuple of arrays [grad_accum, B, n_i] — the
    leading axis is scanned (accumulation), B is sharded over dp.
    """

    model: TokenConditionedTransformer
    loss_cfg: StageLossConfig
    lr: float = 3e-4
    wd: float = 1e-2
    lr_warmup: int = 0
    max_grad_norm: float = 0.5
    grad_accum_every: int = 1
    mesh: Any = None
    results_folder: str = "./results"
    save_model_every: int = 1000
    save_results_every: int = 250
    stage_name: str = "stage"
    use_tensorboard: bool = True
    # optional wandb tracker (reference trainer.py:38-41,348-351): no-op when
    # the package is absent; ``wandb_run_config`` is attached as the run's
    # hyperparameters like the reference's sanitized accelerate kwargs
    use_wandb: bool = False
    wandb_project: str = "open-musiclm-tpu"
    wandb_run_config: Optional[Dict[str, Any]] = None

    def __post_init__(self):
        if self.mesh is None:
            self.mesh = make_mesh()
        self.optimizer = make_optimizer(
            self.lr,
            self.wd,
            warmup_steps=self.lr_warmup,
            max_grad_norm=self.max_grad_norm,
        )
        self._train_step = None
        self._eval_step = None
        self._artifact_step = None
        Path(self.results_folder).mkdir(parents=True, exist_ok=True)
        self._log_path = Path(self.results_folder) / f"{self.stage_name}.log.jsonl"
        self._tb = None
        if self.use_tensorboard:
            # tensorboard tracker (reference trainer.py:348-351); JSONL stays
            # the primary sink
            try:
                from flax.metrics import tensorboard as _tb

                self._tb = _tb.SummaryWriter(
                    str(Path(self.results_folder) / "tb" / self.stage_name)
                )
            except Exception:
                self._tb = None
        self._wandb = None
        if self.use_wandb:
            try:
                import wandb

                self._wandb = wandb.init(
                    project=self.wandb_project,
                    name=f"{self.stage_name}_{int(time.time())}",
                    dir=self.results_folder,
                    config=self.wandb_run_config or {},
                )
            except Exception:
                self._wandb = None  # wandb not installed / offline init failed

    # ---- state ----

    def init_state(self, params) -> TrainState:
        from ..parallel.sharding import shard_params

        # dp: replicate; tp>1: rule-based tensor-parallel sharding. The optax
        # state is built FROM the sharded params, so mu/nu inherit shardings.
        params = shard_params(self.mesh, params)
        opt_state = self.optimizer.init(params)
        step = jnp.zeros((), jnp.int32)
        if self.mesh.size > 1:
            step = jax.device_put(step, replicated(self.mesh))
        return TrainState(params=params, opt_state=opt_state, step=step)

    # ---- compiled steps ----

    def _build_train_step(self):
        model, loss_cfg, optimizer = self.model, self.loss_cfg, self.optimizer

        def loss_fn(params, ids, rng):
            loss, _ = stage_training_loss(model, params, list(ids), rng, loss_cfg, train=True)
            return loss

        def step_fn(state: TrainState, batch: Tuple[jnp.ndarray, ...], rng):
            accum = batch[0].shape[0]
            keys = jax.random.split(rng, accum)

            if accum == 1:
                # no-scan fast path: a scan of one would still materialize a
                # full gradient-pytree carry per step (while + dynamic-update-
                # slice plumbing on the device trace) for zero accumulation.
                # Same math bitwise: 0 + g == g, g / 1 == g.
                loss, grads = jax.value_and_grad(loss_fn)(
                    state.params, tuple(b[0] for b in batch), keys[0]
                )
            else:
                def micro(carry, inp):
                    grads_acc, loss_acc = carry
                    ids, key = inp
                    mloss, mgrads = jax.value_and_grad(loss_fn)(state.params, ids, key)
                    grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, mgrads)
                    return (grads_acc, loss_acc + mloss), None

                zero = jax.tree_util.tree_map(jnp.zeros_like, state.params)
                (grads, loss_sum), _ = jax.lax.scan(micro, (zero, 0.0), (batch, keys))
                grads = jax.tree_util.tree_map(lambda g: g / accum, grads)
                loss = loss_sum / accum
            updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_state = TrainState(new_params, new_opt, state.step + 1)
            return new_state, loss

        # shardings are inferred from the committed input arrays (params via
        # shard_params, batch via device_put in train_step) so the same step
        # serves dp-only and dp x tp meshes
        return jax.jit(step_fn, donate_argnums=(0,))

    def _build_eval_step(self):
        model, loss_cfg = self.model, self.loss_cfg

        def eval_fn(params, ids, rng):
            loss, aux = stage_training_loss(
                model, params, list(ids), rng, loss_cfg, train=False
            )
            # accuracy over the final (predicted) sequence
            acc = token_accuracy(aux["logits"][-1], aux["labels"][-1])
            return loss, acc

        return jax.jit(eval_fn)

    def _build_artifact_step(self):
        model, loss_cfg = self.model, self.loss_cfg

        def fn(params, ids, rng):
            _, aux = stage_training_loss(
                model, params, list(ids), rng, loss_cfg, train=False
            )
            # final (predicted) sequence only — what the artifact dumps show
            return aux["logits"][-1], aux["labels"][-1]

        return jax.jit(fn)

    # ---- public API ----

    def _commit_batch(self, batch, spec: P):
        """device_put onto the mesh UNLESS already equivalently placed — a
        redundant put of an on-device array is a d2h+h2d round trip under
        remote-tunneled backends (measured seconds per step). On a 1-device
        mesh, skip the NamedSharding commitment entirely: committed-array
        jit dispatch is ~60x slower per step under the axon tunnel (see
        parallel/sharding.shard_params)."""
        if self.mesh.size == 1:
            return tuple(jnp.asarray(b) for b in batch)
        sh = NamedSharding(self.mesh, spec)
        out = []
        for b in batch:
            if isinstance(b, jax.Array) and b.sharding.is_equivalent_to(sh, b.ndim):
                out.append(b)
            else:
                out.append(jax.device_put(b, sh))
        return tuple(out)

    def train_step(self, state: TrainState, batch: Sequence[jnp.ndarray], rng):
        """batch: tuple of [accum, B, n_i] int arrays."""
        if self._train_step is None:
            self._train_step = self._build_train_step()
        batch = self._commit_batch(batch, P(None, DATA_AXIS))
        return self._train_step(state, batch, rng)

    def eval_step(self, state: TrainState, batch: Sequence[jnp.ndarray], rng):
        if self._eval_step is None:
            self._eval_step = self._build_eval_step()
        batch = self._commit_batch(batch, P(DATA_AXIS))
        return self._eval_step(state.params, batch, rng)

    def artifact_logits(self, state: TrainState, batch: Sequence[jnp.ndarray], rng):
        """Final-sequence (logits, labels) on a valid batch, for the
        qualitative artifact dumps (train/artifacts.py)."""
        if self._artifact_step is None:
            self._artifact_step = self._build_artifact_step()
        batch = self._commit_batch(batch, P(DATA_AXIS))
        return self._artifact_step(state.params, batch, rng)

    def log(self, step: int, **metrics):
        rec = {"step": int(step), "time": time.time(), "stage": self.stage_name}
        rec.update({k: float(v) for k, v in metrics.items()})
        with open(self._log_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            for k, v in metrics.items():
                try:
                    self._tb.scalar(k, float(v), int(step))
                except Exception:
                    pass
        if self._wandb is not None:
            try:
                self._wandb.log({k: float(v) for k, v in metrics.items()}, step=int(step))
            except Exception:
                pass

    def log_audio(self, step: int, tag: str, waves, sample_rate: int):
        """Log reconstruction audio to the trackers (reference wandb audio
        artifacts, trainer.py:524-526). ``waves``: [n, T] float in [-1, 1]."""
        import numpy as np

        waves = np.asarray(waves, dtype=np.float32)
        if waves.ndim == 1:
            waves = waves[None]
        if self._tb is not None:
            try:
                self._tb.audio(tag, waves[..., None], int(step), sample_rate=sample_rate)
            except Exception:
                pass
        if self._wandb is not None:
            try:
                import wandb

                self._wandb.log(
                    {
                        tag: [
                            wandb.Audio(w, sample_rate=sample_rate, caption=f"{tag}.{i}")
                            for i, w in enumerate(waves)
                        ]
                    },
                    step=int(step),
                )
            except Exception:
                pass

    def checkpoint_path(self, step: int) -> str:
        return str(
            Path(self.results_folder) / f"{self.stage_name}.transformer.{step}.ckpt"
        )

    def save(self, state: TrainState, step: int):
        from ..checkpoint import save_checkpoint

        save_checkpoint(self.checkpoint_path(step), state._asdict())

    def load(self, path: str, params_like) -> TrainState:
        from ..checkpoint import load_checkpoint

        like = TrainState(
            params=params_like,
            opt_state=self.optimizer.init(params_like),
            step=jnp.zeros((), jnp.int32),
        )._asdict()
        tree = load_checkpoint(path, like)
        state = TrainState(**tree)
        if self.mesh.size == 1:
            return jax.tree_util.tree_map(jnp.asarray, state)
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, replicated(self.mesh)), state
        )

    def train(
        self,
        state: TrainState,
        data_iter: Iterator[Tuple[jnp.ndarray, ...]],
        *,
        num_steps: int,
        rng: jax.Array,
        valid_iter: Optional[Iterator] = None,
        artifact_fn: Optional[Callable] = None,
    ) -> TrainState:
        """Reference train loop shape (trainer.py:415-560). ``artifact_fn``
        (state, valid_batch, step) dumps qualitative artifacts at the
        save_results cadence (train/artifacts.py)."""
        from ..profiling import StepTimer

        timer = StepTimer()
        stop = _PreemptionGuard()
        for _ in range(num_steps):
            if stop.triggered:
                # TPU-pod preemption safety: checkpoint and exit cleanly so a
                # restart resumes from here (the reference has no elastic
                # story at all; SURVEY.md 5.3)
                self.save(state, int(state.step))
                self.log(int(state.step), preempted=1.0)
                break
            step = int(state.step)
            batch = next(data_iter)
            rng, krng = jax.random.split(rng)
            with timer:
                state, loss = self.train_step(state, batch, krng)
                loss.block_until_ready()
            self.log(step, train_loss=loss, step_time_s=timer.last_s)
            if valid_iter is not None and self.save_results_every and (
                step % self.save_results_every == 0
            ):
                vb = next(valid_iter)
                rng, vrng = jax.random.split(rng)
                vloss, vacc = self.eval_step(state, vb, vrng)
                self.log(step, valid_loss=vloss, valid_accuracy=vacc)
                if artifact_fn is not None:
                    artifact_fn(state, vb, step)
            if self.save_model_every and step > 0 and step % self.save_model_every == 0:
                self.save(state, step)
        return state
