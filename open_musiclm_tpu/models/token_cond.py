"""Token-conditioned transformer over a concatenation of token sequences.

TPU-native rebuild of the reference ``TokenConditionedTransformer`` +
``TokenConditionedTransformerWrapper`` (open_musiclm/open_musiclm.py:33-410):
one decoder over ``[start_0, tokens_0, start_1, tokens_1, ...]`` where each
sequence has its own embedding table (with per-quantizer id offsets), start
token and per-quantizer logit heads.

Differences from the reference, by design:
  * the sequence layout (split points, quantizer indices) is computed
    statically from array shapes at trace time (core/sequence.py), so the
    whole stage forward is one fixed-shape XLA program;
  * generation uses the KV-cached ``Transformer.prefill``/``decode_step`` path
    inside a single ``lax.scan`` — O(ctx) per sampled token instead of the
    reference's full re-forward per token per quantizer
    (open_musiclm.py:299-319);
  * randomness is explicit ``jax.random`` keys. Bit-exact parity with the
    torch RNG is defined at the argmax/teacher-forced level (temperature=0).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.sampling import (
    NEG_INF,
    append_eos_id,
    mask_out_after_eos_id,
    sample_top_k_gumbel,
    sample_top_k_gumbel_per_row,
    split_row_keys,
)
from ..core.masks import forgetful_causal_mask
from ..core.sequence import SequenceLayout, TokenSequenceSpec
from .transformer import Transformer

PAD_ID = -1


class TokenConditionedTransformer(nn.Module):
    """See module docstring. ``specs`` mirrors reference ``token_sequences``."""

    specs: Tuple[TokenSequenceSpec, ...]
    dim: int
    depth: int
    heads: int = 8
    dim_head: int = 64
    attn_dropout: float = 0.0
    ff_dropout: float = 0.0
    use_conv_ff: bool = True
    grad_shrink_alpha: float = 0.1
    non_causal_prefix_size: int = 0
    relative_position_bias_type: str = "continuous"
    use_absolute_position_embeddings: bool = False
    max_absolute_position_embeddings: int = 262
    remat: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        embeds, heads_w, pos_embeds = [], [], []
        for i, spec in enumerate(self.specs):
            embeds.append(
                nn.Embed(
                    spec.embed_vocab,
                    self.dim,
                    dtype=self.dtype,
                    embedding_init=nn.initializers.normal(stddev=1.0),
                    name=f"embed_{i}",
                )
            )
            heads_w.append(
                self.param(
                    f"logits_{i}",
                    nn.initializers.normal(stddev=1.0),
                    (spec.num_quantizers, spec.vocab_with_eos, self.dim),
                    jnp.float32,
                )
            )
            if self.use_absolute_position_embeddings:
                pos_embeds.append(
                    nn.Embed(
                        self.max_absolute_position_embeddings,
                        self.dim,
                        dtype=self.dtype,
                        embedding_init=nn.initializers.normal(stddev=1.0),
                        name=f"abs_pos_embed_{i}",
                    )
                )
        self.embeds = embeds
        self.heads_w = heads_w
        self.pos_embeds = pos_embeds if self.use_absolute_position_embeddings else None
        self.start_tokens = self.param(
            "start_tokens",
            nn.initializers.normal(stddev=1.0),
            (len(self.specs), self.dim),
            jnp.float32,
        )
        self.transformer = Transformer(
            dim=self.dim,
            depth=self.depth,
            heads=self.heads,
            dim_head=self.dim_head,
            attn_dropout=self.attn_dropout,
            ff_dropout=self.ff_dropout,
            use_conv_ff=self.use_conv_ff,
            grad_shrink_alpha=self.grad_shrink_alpha,
            non_causal_prefix_size=self.non_causal_prefix_size,
            relative_position_bias_type=self.relative_position_bias_type,
            remat=self.remat,
            dtype=self.dtype,
            name="transformer",
        )

    # ---- embedding assembly ----

    def embed_one_sequence(self, i: int, token_ids: jnp.ndarray) -> jnp.ndarray:
        """[b, n] flat ids (pad = -1) -> [b, n, dim] with quantizer offsets,
        zeroed pad embeddings, and optional absolute position embeddings."""
        spec = self.specs[i]
        n = token_ids.shape[-1]
        pad_mask = token_ids == PAD_ID
        ids = jnp.where(pad_mask, 0, token_ids)
        if spec.num_quantizers > 1:
            # offset = (t % Q) * codebook_size — reference open_musiclm.py:126-130
            offsets = (jnp.arange(n) % spec.num_quantizers) * spec.codebook_size
            ids = ids + offsets[None, :]
        emb = self.embeds[i](ids)
        emb = jnp.where(pad_mask[..., None], 0.0, emb)
        if self.pos_embeds is not None:
            emb = emb + self.pos_embeds[i](jnp.arange(n))[None]
        return emb

    def assemble_stream(self, all_token_ids: Sequence[jnp.ndarray]) -> jnp.ndarray:
        """Interleave [start_i, embed(tokens_i)] into one [b, total, dim]."""
        b = all_token_ids[0].shape[0]
        parts = []
        for i, ids in enumerate(all_token_ids):
            start = jnp.broadcast_to(
                self.start_tokens[i].astype(self.dtype), (b, 1, self.dim)
            )
            parts.append(start)
            parts.append(self.embed_one_sequence(i, ids))
        return jnp.concatenate(parts, axis=1)

    # ---- logit heads ----

    def sequence_logits(self, i: int, h: jnp.ndarray) -> jnp.ndarray:
        """Per-quantizer logits for sequence i's prediction window.

        h: [b, n, dim] transformer outputs. Position t uses head ``t % Q``.
        Grouped positions become one batched [n/Q, Q]-blocked matmul (maps to
        the MXU); the tail (n % Q positions) is handled separately —
        mirrors reference grouping (open_musiclm.py:163-186).
        """
        w = self.heads_w[i].astype(self.dtype)  # [Q, C, d]
        q = self.specs[i].num_quantizers
        b, n, d = h.shape
        if q == 1:
            return jnp.einsum("bnd,cd->bnc", h, w[0])
        nq = (n // q) * q
        vocab = self.specs[i].vocab_with_eos
        main = h[:, :nq].reshape(b, nq // q, q, d)
        logits_main = jnp.einsum("bnqd,qcd->bnqc", main, w)
        logits_main = logits_main.reshape(b, nq, vocab)
        rem = n - nq
        if rem > 0:
            logits_rem = jnp.einsum("brd,rcd->brc", h[:, nq:], w[:rem])
            return jnp.concatenate([logits_main, logits_rem], axis=1)
        return logits_main

    def step_logits(self, h_t: jnp.ndarray, q_idx: jnp.ndarray) -> jnp.ndarray:
        """Decode-step logits for the FINAL sequence: [b, dim] x head q_idx."""
        w = self.heads_w[-1].astype(self.dtype)  # [Q, C, d]
        w_q = jax.lax.dynamic_index_in_dim(w, q_idx, axis=0, keepdims=False)
        return jnp.einsum("bd,cd->bc", h_t, w_q)

    # ---- full forward ----

    def __call__(
        self,
        all_token_ids: Sequence[jnp.ndarray],
        *,
        self_attn_mask: Optional[jnp.ndarray] = None,
        return_only_final_seq_logits: bool = False,
        deterministic: bool = True,
    ) -> List[Optional[jnp.ndarray]]:
        """all_token_ids: flattened [b, n_i] per sequence. Returns per-sequence
        logits [b, pred_len_i, vocab_i] (None for skipped sequences).

        pred_len_i = n_i for all but the last sequence, n_last + 1 for the
        last (its final position predicts the following token — EOS during
        training). Matches the reference split (open_musiclm.py:141-156).
        """
        layout = SequenceLayout(
            tuple(self.specs), tuple(int(t.shape[-1]) for t in all_token_ids)
        )
        x = self.assemble_stream(all_token_ids)
        h = self.transformer(
            x, self_attn_mask=self_attn_mask, deterministic=deterministic
        )
        out: List[Optional[jnp.ndarray]] = []
        last = len(self.specs) - 1
        for i in range(len(self.specs)):
            if return_only_final_seq_logits and i != last:
                out.append(None)
                continue
            begin, n = layout.pred_slice(i)
            n = n + 1 if i == last else n
            out.append(self.sequence_logits(i, h[:, begin : begin + n]))
        return out


# ---------------------------------------------------------------------------
# Training loss (reference wrapper.forward, open_musiclm.py:328-410)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class StageLossConfig:
    cross_entropy_loss_weights: Tuple[float, ...]
    mask_prob: float = 0.15
    pad_id: int = PAD_ID
    # fixed-shape stand-in for reference batch_unique_consecutive
    # (open_musiclm.py:349-352): duplicate runs become pad (masked from
    # attention and CE) instead of being compacted. Off in all shipped
    # MusicLM configs, like the reference.
    unique_consecutive: bool = False


def stage_training_loss(
    model: TokenConditionedTransformer,
    params,
    all_token_ids: Sequence[jnp.ndarray],
    rng: jax.Array,
    cfg: StageLossConfig,
    *,
    input_has_eos: bool = False,
    train: bool = True,
):
    """Weighted cross-entropy over all sequences.

    Returns (loss, dict of per-sequence logits/labels for metrics).
    """
    specs = model.specs
    eos_ids = [s.eos_id for s in specs]
    ids = [jnp.reshape(t, (t.shape[0], -1)) for t in all_token_ids]
    if not input_has_eos:
        ids = [append_eos_id(t, e) for t, e in zip(ids, eos_ids)]

    if cfg.unique_consecutive:
        from ..core.sampling import mask_unique_consecutive

        ids = [
            mask_unique_consecutive(t, cfg.pad_id) if s.unique_consecutive else t
            for t, s in zip(ids, specs)
        ]

    labels = [t for t in ids]
    ids = list(ids)
    ids[-1] = ids[-1][:, :-1]  # final token (EOS) is label-only

    # conditioning key mask: hide pad/EOS of conditioning sequences; zero the
    # hidden ids like the reference does in-place (open_musiclm.py:358-367)
    batch = ids[0].shape[0]
    mask_parts = []
    for i in range(len(ids) - 1):
        keep = (ids[i] != cfg.pad_id) & (ids[i] != eos_ids[i])
        ids[i] = jnp.where(keep, ids[i], 0)
        mask_parts.append(
            jnp.concatenate([jnp.ones((batch, 1), bool), keep], axis=-1)
        )
    pred_width = ids[-1].shape[-1] + 1  # + start token
    mask_parts.append(jnp.ones((batch, pred_width), bool))
    attn_mask = jnp.concatenate(mask_parts, axis=-1)

    rng, drop_rng, fcm_rng = jax.random.split(rng, 3)
    if cfg.mask_prob > 0 and train:
        attn_mask = attn_mask & forgetful_causal_mask(
            fcm_rng, batch, attn_mask.shape[-1], cfg.mask_prob
        )

    logits = model.apply(
        params,
        ids,
        self_attn_mask=attn_mask,
        deterministic=not train,
        rngs={"dropout": drop_rng} if train else None,
    )

    total_logits = 0.0
    running_loss = 0.0
    for lg, lb, w, spec in zip(logits, labels, cfg.cross_entropy_loss_weights, specs):
        if w <= 0 or lg is None:
            continue
        uc = cfg.unique_consecutive and spec.unique_consecutive
        logp = jax.nn.log_softmax(lg.astype(jnp.float32), axis=-1)
        safe_lb = jnp.where(lb == cfg.pad_id, 0, lb)
        nll = -jnp.take_along_axis(logp, safe_lb[..., None], axis=-1)[..., 0]
        if uc:
            valid = lb != cfg.pad_id  # reference ignore_index=pad_id
            num = jnp.sum(valid)
            mean_nll = jnp.sum(jnp.where(valid, nll, 0.0)) / jnp.maximum(num, 1)
        else:
            num = lb.size
            mean_nll = jnp.mean(nll)
        running_loss = running_loss + mean_nll * num * w
        total_logits = total_logits + num
    loss = running_loss / jnp.maximum(total_logits, 1)
    return loss, {"logits": logits, "labels": labels}


# ---------------------------------------------------------------------------
# KV-cached generation (reference wrapper.generate, open_musiclm.py:253-326)
# ---------------------------------------------------------------------------


def generate(
    model: TokenConditionedTransformer,
    params,
    conditioning_token_ids: Sequence[jnp.ndarray],
    rng: Optional[jax.Array],
    *,
    max_time_steps: int,
    init_pred_ids: Optional[jnp.ndarray] = None,
    filter_thres: float = 0.9,
    temperature: float = 1.0,
    allow_eos_in_output: bool = False,
    include_eos_in_output: bool = False,
    append_eos_to_conditioning_tokens: bool = True,
    per_row_keys: Optional[jnp.ndarray] = None,
    approx_topk: Optional[bool] = None,
    teacher_ids: Optional[jnp.ndarray] = None,
    return_logits: bool = False,
) -> jnp.ndarray:
    """Sample the final sequence given conditioning sequences.

    conditioning_token_ids: flattened [b, n_i] for all but the final spec.
    init_pred_ids: [b, t0, Q] or [b, t0*Q] already-generated prefix (sliding
    window continuation). Returns [b, max_time_steps, Q].

    per_row_keys: optional [b] keys; when given, row i's sampling depends on
    per_row_keys[i] only (batch-composition-independent serving randomness)
    and ``rng`` is ignored.

    teacher_ids: optional [b, max_time_steps, Q] (or flattened) reference
    trajectory. When given, each step still SAMPLES its token (that sample
    is what's returned) but feeds the teacher token forward into the cache,
    so every step is scored under the teacher's prefix. Used to measure
    per-step agreement between decode paths without AR divergence
    compounding (scripts/measure_serving_deviation.py).

    return_logits: additionally return the per-step f32 logits
    [b, n_new, C] — the raw numeric surface the serving kernels perturb
    (logit-delta exceedance report in the deviation script).
    """
    specs = model.specs
    assert len(conditioning_token_ids) == len(specs) - 1
    pred_spec = specs[-1]
    q_num = pred_spec.num_quantizers
    eos_id = pred_spec.eos_id
    batch = conditioning_token_ids[0].shape[0]

    cond = [jnp.reshape(t, (t.shape[0], -1)) for t in conditioning_token_ids]
    if append_eos_to_conditioning_tokens:
        cond = [append_eos_id(t, s.eos_id) for t, s in zip(cond, specs[:-1])]

    if init_pred_ids is not None:
        init_flat = jnp.reshape(init_pred_ids, (batch, -1))
        n_init = int(init_flat.shape[-1])
    else:
        init_flat = jnp.zeros((batch, 0), jnp.int32)
        n_init = 0

    total_steps = max_time_steps * q_num
    n_new = total_steps - n_init
    assert n_new > 0, "nothing to generate"

    # stream: [start_0, cond_0, ..., start_pred, init_pred] then n_new decodes
    prefill_ids = list(cond) + [init_flat]
    prefill_len = sum(t.shape[-1] for t in prefill_ids) + len(specs)
    max_len = prefill_len + n_new

    x = model.apply(params, prefill_ids, method=TokenConditionedTransformer.assemble_stream)

    cache = model.apply(params, batch, max_len, method=_tfm_init_cache)
    table = model.apply(params, max_len, method=_tfm_bias_table)
    h_all, cache = model.apply(params, x, cache, method=_tfm_prefill)
    h_last = h_all[:, -1]

    sampled = jnp.full((batch, total_steps), eos_id, jnp.int32)
    if n_init > 0:
        sampled = sampled.at[:, :n_init].set(init_flat)

    def embed_pred_token(tok: jnp.ndarray, flat_idx: jnp.ndarray) -> jnp.ndarray:
        """Embed one sampled token of the final sequence ([b] -> [b, dim])."""
        q_idx = flat_idx % q_num
        offset = q_idx * pred_spec.codebook_size if q_num > 1 else 0
        # jnp.asarray: imported checkpoints may carry numpy leaves, which
        # cannot be indexed by tracers inside the scan
        emb_table = jnp.asarray(params["params"][f"embed_{len(specs) - 1}"]["embedding"])
        emb = emb_table[tok + offset].astype(model.dtype)
        if model.use_absolute_position_embeddings:
            pos_table = jnp.asarray(
                params["params"][f"abs_pos_embed_{len(specs) - 1}"]["embedding"]
            )
            emb = emb + pos_table[flat_idx].astype(model.dtype)
        return emb

    per_row = per_row_keys is not None
    rng_carry = per_row_keys if per_row else rng
    teacher_flat = (
        jnp.reshape(teacher_ids, (batch, -1)).astype(jnp.int32)
        if teacher_ids is not None
        else None
    )

    def step(carry, s):
        cache, h_last, sampled, rng = carry
        flat_idx = n_init + s  # index of the token being sampled
        q_idx = flat_idx % q_num
        logits = model.apply(params, h_last, q_idx, method=TokenConditionedTransformer.step_logits)
        is_last_q = q_idx == (q_num - 1)
        eos_ok = jnp.logical_and(allow_eos_in_output, is_last_q)
        logits = logits.at[:, -1].set(
            jnp.where(eos_ok, logits[:, -1], NEG_INF)
        )
        if per_row:
            sub, rng = split_row_keys(rng)
            tok = sample_top_k_gumbel_per_row(
                sub, logits, temperature, filter_thres, approx_topk
            ).astype(jnp.int32)
        else:
            rng, sub = jax.random.split(rng)
            tok = sample_top_k_gumbel(
                sub, logits, temperature, filter_thres, approx_topk
            ).astype(jnp.int32)
        sampled = jax.lax.dynamic_update_slice(sampled, tok[:, None], (0, flat_idx))
        fed = (
            jax.lax.dynamic_slice(teacher_flat, (0, flat_idx), (batch, 1))[:, 0]
            if teacher_flat is not None
            else tok
        )
        emb = embed_pred_token(fed, flat_idx)
        pos = prefill_len + s
        h_last, cache = model.apply(
            params, emb, cache, pos, table, method=_tfm_decode_step
        )
        out = logits.astype(jnp.float32) if return_logits else None
        return (cache, h_last, sampled, rng), out

    (cache, h_last, sampled, rng), step_logits = jax.lax.scan(
        step, (cache, h_last, sampled, rng_carry), jnp.arange(n_new)
    )

    sampled = mask_out_after_eos_id(
        sampled, eos_id, mask_value=PAD_ID, keep_eos=include_eos_in_output
    )
    sampled = sampled.reshape(batch, max_time_steps, q_num)
    if return_logits:
        return sampled, jnp.swapaxes(step_logits, 0, 1)  # [b, n_new, C]
    return sampled


# method trampolines: call the inner Transformer submodule through
# model.apply so flax resolves parameter scopes correctly
def _tfm_init_cache(self, batch, max_len):
    return self.transformer.init_cache(batch, max_len)


def _tfm_bias_table(self, max_len):
    return self.transformer.bias_table(max_len)


def _tfm_prefill(self, x, cache, key_mask=None):
    return self.transformer.prefill(x, cache, key_mask=key_mask)


def _tfm_decode_step(self, x_t, cache, pos, bias_table):
    return self.transformer.decode_step(x_t, cache, pos, bias_table)
