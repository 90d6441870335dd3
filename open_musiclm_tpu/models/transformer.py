"""Decoder-only transformer core (flax.linen).

TPU-native rebuild of the reference transformer
(open_musiclm/transformer.py:24-424):
  * bias-free LayerNorm (:24-31)
  * cosine-sim attention with a single shared K/V head (:166-333)
  * continuous-MLP or T5 relative position bias (:36-117)
  * GEGLU conv feed-forward with causal depthwise conv (:122-150)
  * grad_shrink on the input stream (:400) and a final LayerNorm

Two execution paths:
  * ``__call__``: full-sequence causal forward (training / prefill shapes).
  * ``prefill`` + ``decode_step``: KV-cached autoregressive decode. The cache
    holds, per layer, the processed K (l2norm * k_scale) and V rows — a single
    shared head of ``dim_head`` floats each, so the whole cache for a 6-layer
    stage is < 1 MB — plus the 2-tap state of the causal depthwise conv in the
    feed-forward. ``decode_step`` is O(seq) per token instead of the
    reference's O(seq^2) full re-forward (open_musiclm.py:299-319).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

import os

from ..ops.attention import l2norm, shared_kv_attention, shared_kv_decode_step
from ..ops.relpos import make_bias


_dropout_warned = False


def _warn_dropout_disabled_once() -> None:
    """OPEN_MUSICLM_DISABLE_DROPOUT is a bench/A-B knob read at trace time;
    if it leaks into a real training launch the run silently trains
    unregularized — make that loudly visible once (ADVICE r4)."""
    global _dropout_warned
    if not _dropout_warned:
        _dropout_warned = True
        import warnings

        warnings.warn(
            "OPEN_MUSICLM_DISABLE_DROPOUT=1: ALL dropout layers are identity "
            "for this process. This is a benchmarking knob — unset it for "
            "real training runs.",
            stacklevel=3,
        )


def _dropout(u: jnp.ndarray, rate: float, rng: jax.Array) -> jnp.ndarray:
    """Inverted dropout. nn.Dropout is a submodule and cannot be constructed
    inside a setup()-style __call__ (flax AssignSubModuleError); it holds no
    params, so the functional form is equivalent.

    A/B knob (trace-time): OPEN_MUSICLM_DISABLE_DROPOUT=1 turns every
    dropout into identity, isolating the threefry mask-generation cost in
    bench_train --ab_env runs (the FF mask alone is ~50M draws per layer
    per microbatch at the training geometries)."""
    if os.environ.get("OPEN_MUSICLM_DISABLE_DROPOUT") == "1":
        _warn_dropout_disabled_once()
        return u
    from ..ops.fastrand import fast_bernoulli

    keep = 1.0 - rate
    mask = fast_bernoulli(rng, keep, u.shape)
    return jnp.where(mask, u / keep, 0.0).astype(u.dtype)


def _pallas_attention_enabled() -> bool:
    """Fused Pallas attention: on for TPU backends unless disabled via env."""
    if os.environ.get("OPEN_MUSICLM_PALLAS", "1") != "1":
        return False
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


class LayerNorm(nn.Module):
    """Bias-free LayerNorm: learned gamma, zero beta (transformer.py:24-31)."""

    dim: int
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        gamma = self.param("gamma", nn.initializers.ones, (self.dim,), jnp.float32)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps) * gamma
        return y.astype(self.dtype)


def grad_shrink(x: jnp.ndarray, alpha: float = 0.1) -> jnp.ndarray:
    """Scale gradients by alpha without changing values (utils.py:60-61)."""
    return x * alpha + jax.lax.stop_gradient(x) * (1.0 - alpha)


class Attention(nn.Module):
    """Causal self-attention with cosine-sim QK and shared single-head KV."""

    dim: int
    heads: int = 8
    dim_head: int = 64
    scale: float = 8.0
    dropout: float = 0.0
    non_causal_prefix: int = 0
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        inner = self.dim_head * self.heads
        self.norm = LayerNorm(self.dim, dtype=self.dtype, name="norm")
        self.to_q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")
        self.to_kv = nn.Dense(2 * self.dim_head, use_bias=False, dtype=self.dtype, name="to_kv")
        self.q_scale = self.param("q_scale", nn.initializers.ones, (self.dim_head,), jnp.float32)
        self.k_scale = self.param("k_scale", nn.initializers.ones, (self.dim_head,), jnp.float32)
        self.to_out = nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="to_out")

    def _qkv(
        self, h: jnp.ndarray, x_raw: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """h: pre-normed [b, n, dim]; x_raw: the UN-normed input.

        Reference quirk (transformer.py:228,250,254): ``kv_input`` is captured
        *before* the prenorm, so K/V project from the raw residual stream
        while Q projects from the normed one. Reproduced for checkpoint
        parity (verified against the reference code in
        tests/test_reference_parity.py).
        """
        b, n, _ = h.shape
        q = self.to_q(h).reshape(b, n, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        kv = self.to_kv(x_raw)
        k, v = jnp.split(kv, 2, axis=-1)
        q = l2norm(q) * self.q_scale.astype(self.dtype)
        k = l2norm(k) * self.k_scale.astype(self.dtype)
        return q, k, v

    def __call__(
        self,
        x: jnp.ndarray,
        *,
        attn_bias: Optional[jnp.ndarray] = None,
        key_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        return_kv: bool = False,
    ):
        h = self.norm(x)
        q, k, v = self._qkv(h, x)
        rng = None
        dropout_active = not deterministic and self.dropout > 0.0
        if dropout_active:
            rng = self.make_rng("dropout")
        if not dropout_active and _pallas_attention_enabled():
            from ..ops.pallas_attention import shared_kv_attention_fused

            out = shared_kv_attention_fused(
                q, k, v, attn_bias, key_mask,
                float(self.scale), True, int(self.non_causal_prefix), 256, False,
            )
        else:
            out = shared_kv_attention(
                q,
                k,
                v,
                scale=self.scale,
                attn_bias=attn_bias,
                key_mask=key_mask,
                causal=True,
                non_causal_prefix=self.non_causal_prefix,
                dropout_rate=self.dropout if not deterministic else 0.0,
                dropout_rng=rng,
            )
        out = self.to_out(out)
        if not deterministic and self.dropout > 0.0:
            out = _dropout(out, self.dropout, self.make_rng("dropout"))
        if return_kv:
            return out, (k, v)
        return out

    def decode_qkv(
        self, x_t: jnp.ndarray  # [b, dim]
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """One-token projections: (q [b, heads, d], k_t [b, 1, d], v_t).

        The caller writes k_t/v_t into the stacked all-layer cache with ONE
        dynamic_update_slice per layer (an in-place row write on the scan
        carry) — slicing a layer out, updating and re-stacking would copy the
        whole cache every decode step."""
        h = self.norm(x_t[:, None, :])  # [b, 1, dim]
        q, k, v = self._qkv(h, x_t[:, None, :])
        return q[:, :, 0, :], k, v


class ConvFeedForward(nn.Module):
    """LN -> Dense(2*inner) -> causal depthwise conv(k=3) -> GEGLU -> LN ->
    Dense(dim). inner = int(dim * 2 * mult / 3) (transformer.py:140-150)."""

    dim: int
    mult: int = 4
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @property
    def inner_dim(self) -> int:
        return int(self.dim * 2 * self.mult / 3)

    def setup(self):
        inner = self.inner_dim
        self.norm_in = LayerNorm(self.dim, dtype=self.dtype, name="norm_in")
        self.proj_in = nn.Dense(inner * 2, use_bias=False, dtype=self.dtype, name="proj_in")
        # depthwise conv weight, tap-major: [3, 2*inner]
        self.conv_w = self.param(
            "conv_w",
            nn.initializers.lecun_normal(),
            (3, inner * 2),
            jnp.float32,
        )
        self.norm_mid = LayerNorm(inner, dtype=self.dtype, name="norm_mid")
        self.proj_out = nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="proj_out")

    def _dsconv_full(self, u: jnp.ndarray) -> jnp.ndarray:
        """Causal depthwise conv over [b, n, c] with left pad 2."""
        w = self.conv_w.astype(self.dtype)
        up = jnp.pad(u, ((0, 0), (2, 0), (0, 0)))
        return up[:, :-2, :] * w[0] + up[:, 1:-1, :] * w[1] + up[:, 2:, :] * w[2]

    def _geglu(self, u: jnp.ndarray) -> jnp.ndarray:
        # reference GEGLU (transformer.py:134-137): first half value, second half gate
        val, gate = jnp.split(u, 2, axis=-1)
        return jax.nn.gelu(gate, approximate=False) * val

    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        u = self.proj_in(self.norm_in(x))
        u = self._dsconv_full(u)
        u = self._geglu(u)
        u = self.norm_mid(u)
        if not deterministic and self.dropout > 0.0:
            u = _dropout(u, self.dropout, self.make_rng("dropout"))
        return self.proj_out(u)

    def decode(
        self, x_t: jnp.ndarray, conv_state: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x_t: [b, dim]; conv_state: [b, 2, 2*inner] = (u_{t-2}, u_{t-1}).
        Returns (out [b, dim], new conv_state)."""
        u_t = self.proj_in(self.norm_in(x_t))  # [b, 2*inner]
        w = self.conv_w.astype(self.dtype)
        conv = conv_state[:, 0] * w[0] + conv_state[:, 1] * w[1] + u_t * w[2]
        out = self.proj_out(self.norm_mid(self._geglu(conv)))
        new_state = jnp.stack([conv_state[:, 1], u_t], axis=1)
        return out, new_state


class FeedForward(nn.Module):
    """Non-conv variant (transformer.py:152-161): inner = dim * mult."""

    dim: int
    mult: int = 4
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @property
    def inner_dim(self) -> int:
        return int(self.dim * self.mult)

    def setup(self):
        inner = self.inner_dim
        self.norm_in = LayerNorm(self.dim, dtype=self.dtype, name="norm_in")
        self.proj_in = nn.Dense(inner * 2, use_bias=False, dtype=self.dtype, name="proj_in")
        self.norm_mid = LayerNorm(inner, dtype=self.dtype, name="norm_mid")
        self.proj_out = nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="proj_out")

    def _geglu(self, u: jnp.ndarray) -> jnp.ndarray:
        val, gate = jnp.split(u, 2, axis=-1)
        return jax.nn.gelu(gate, approximate=False) * val

    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        u = self._geglu(self.proj_in(self.norm_in(x)))
        u = self.norm_mid(u)
        if not deterministic and self.dropout > 0.0:
            u = _dropout(u, self.dropout, self.make_rng("dropout"))
        return self.proj_out(u)

    def decode(self, x_t: jnp.ndarray, conv_state: jnp.ndarray):
        return self.__call__(x_t, deterministic=True), conv_state


class Transformer(nn.Module):
    """Decoder stack. See module docstring for the two execution paths."""

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
    attn_scale: float = 8.0
    ff_mult: int = 4
    remat: bool = False  # jax.checkpoint per block: trade FLOPs for memory
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.rel_pos_bias = make_bias(
            self.relative_position_bias_type, self.dim, self.heads, dtype=self.dtype
        )
        attn_cls = Attention
        ff_wrapped = ConvFeedForward if self.use_conv_ff else FeedForward
        attns, ffs = [], []
        for i in range(self.depth):
            attns.append(
                attn_cls(
                    dim=self.dim,
                    heads=self.heads,
                    dim_head=self.dim_head,
                    scale=self.attn_scale,
                    dropout=self.attn_dropout,
                    non_causal_prefix=self.non_causal_prefix_size,
                    dtype=self.dtype,
                    name=f"attn_{i}",
                )
            )
            ffs.append(
                ff_wrapped(
                    dim=self.dim,
                    mult=self.ff_mult,
                    dropout=self.ff_dropout,
                    dtype=self.dtype,
                    name=f"ff_{i}",
                )
            )
        self.attns = attns
        self.ffs = ffs
        self.final_norm = LayerNorm(self.dim, dtype=self.dtype, name="final_norm")

    @property
    def ff_state_dim(self) -> int:
        inner = int(self.dim * 2 * self.ff_mult / 3) if self.use_conv_ff else 1
        return inner * 2 if self.use_conv_ff else 1

    def __call__(
        self,
        x: jnp.ndarray,  # [b, n, dim]
        *,
        self_attn_mask: Optional[jnp.ndarray] = None,  # [b, n] True = attend
        deterministic: bool = True,
    ) -> jnp.ndarray:
        n = x.shape[1]
        x = grad_shrink(x, self.grad_shrink_alpha)
        bias = self.rel_pos_bias(n) if self.rel_pos_bias is not None else None

        if self.remat:
            # jax.checkpoint per block; `deterministic` stays static via the
            # closures (flax traces positional remat args)
            def attn_apply(mdl, h, b, km):
                return mdl(h, attn_bias=b, key_mask=km, deterministic=deterministic)

            def ff_apply(mdl, h):
                return mdl(h, deterministic=deterministic)

            attn_apply = nn.remat(attn_apply)
            ff_apply = nn.remat(ff_apply)
            for attn, ff in zip(self.attns, self.ffs):
                x = attn_apply(attn, x, bias, self_attn_mask) + x
                x = ff_apply(ff, x) + x
        else:
            for attn, ff in zip(self.attns, self.ffs):
                x = attn(
                    x, attn_bias=bias, key_mask=self_attn_mask,
                    deterministic=deterministic,
                ) + x
                x = ff(x, deterministic=deterministic) + x
        return self.final_norm(x)

    # ---- KV-cached decode path ----

    def init_cache(self, batch: int, max_len: int) -> Dict[str, jnp.ndarray]:
        """Zeroed cache pytree: stacked per-layer K/V + conv-FF tap state."""
        d = self.dim_head
        ff_c = self.ff_state_dim
        return {
            "k": jnp.zeros((self.depth, batch, max_len, d), self.dtype),
            "v": jnp.zeros((self.depth, batch, max_len, d), self.dtype),
            "ff": jnp.zeros((self.depth, batch, 2, ff_c), self.dtype),
            # key validity (conditioning pad/EOS masking); causal masking is
            # applied separately from `pos` in decode_step
            "mask": jnp.ones((batch, max_len), jnp.bool_),
        }

    def bias_table(self, max_len: int) -> Optional[jnp.ndarray]:
        """Decode-layout rel-pos bias: [2N-1, h] reversed + padded so that
        row (N-1-pos)+j holds the bias at causal distance pos-j. The decode
        step then reads its whole bias row with ONE dynamic_slice instead of
        an N-element gather per step (shared_kv_decode_step)."""
        if self.rel_pos_bias is None:
            return None
        table = self.rel_pos_bias.distance_table(max_len)  # [N, h]
        pad = jnp.broadcast_to(table[:1], (max_len - 1, table.shape[1]))
        return jnp.concatenate([table[::-1], pad], axis=0)

    def prefill(
        self,
        x: jnp.ndarray,  # [b, n, dim]
        cache: Dict[str, jnp.ndarray],
        *,
        key_mask: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """Full causal forward over the prompt; fills cache[:, :, :n].

        Returns (normed outputs [b, n, dim], cache). ``key_mask`` masks
        conditioning pad/EOS keys exactly like training; masked rows are also
        zeroed in the cache so decode steps see the same keys.
        """
        b, n, _ = x.shape
        x = grad_shrink(x, self.grad_shrink_alpha)
        bias = self.rel_pos_bias(n) if self.rel_pos_bias is not None else None
        if key_mask is not None:
            cache["mask"] = cache["mask"].at[:, :n].set(key_mask)
        for i, (attn, ff) in enumerate(zip(self.attns, self.ffs)):
            out, (k, v) = attn(
                x, attn_bias=bias, key_mask=key_mask, deterministic=True, return_kv=True
            )
            x = out + x
            u, new_ff = self._ff_forward_with_state(ff, x)
            x = u + x
            cache["k"] = cache["k"].at[i, :, :n].set(k)
            cache["v"] = cache["v"].at[i, :, :n].set(v)
            cache["ff"] = cache["ff"].at[i].set(new_ff)
        return self.final_norm(x), cache

    def _ff_forward_with_state(self, ff, x):
        """Run full FF and extract the last-2 pre-conv taps for decode."""
        if isinstance(ff, ConvFeedForward):
            u = ff.proj_in(ff.norm_in(x))  # [b, n, 2*inner]
            n = u.shape[1]
            if n >= 2:
                tail = u[:, -2:, :]
            else:
                tail = jnp.pad(u, ((0, 0), (2 - n, 0), (0, 0)))
            conv = ff._dsconv_full(u)
            out = ff.proj_out(ff.norm_mid(ff._geglu(conv)))
            return out, tail
        out = ff(x, deterministic=True)
        b = x.shape[0]
        return out, jnp.zeros((b, 2, 1), self.dtype)

    def decode_step(
        self,
        x_t: jnp.ndarray,  # [b, dim] embedding of the token at `pos`
        cache: Dict[str, jnp.ndarray],
        pos: jnp.ndarray,  # scalar int32
        bias_table: Optional[jnp.ndarray],
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """One decode step; returns (normed output [b, dim], cache).

        Cache updates are single-row dynamic_update_slice writes into the
        stacked [depth, ...] buffers so XLA keeps them in place across the
        decode scan (no per-step cache copies)."""
        x = grad_shrink(x_t, self.grad_shrink_alpha)
        k_all, v_all, ff_all = cache["k"], cache["v"], cache["ff"]
        for i, (attn, ff) in enumerate(zip(self.attns, self.ffs)):
            q, k_t, v_t = attn.decode_qkv(x)
            k_all = jax.lax.dynamic_update_slice(k_all, k_t[None], (i, 0, pos, 0))
            v_all = jax.lax.dynamic_update_slice(v_all, v_t[None], (i, 0, pos, 0))
            out = shared_kv_decode_step(
                q,
                k_all[i],
                v_all[i],
                pos,
                scale=attn.scale,
                bias_table=bias_table,
                key_mask=cache["mask"],
            )
            x = attn.to_out(out) + x
            u, ff_state = ff.decode(x, ff_all[i])
            ff_all = jax.lax.dynamic_update_slice(ff_all, ff_state[None], (i, 0, 0, 0))
            x = u + x
        cache = {"k": k_all, "v": v_all, "ff": ff_all, "mask": cache["mask"]}
        return self.final_norm(x), cache
