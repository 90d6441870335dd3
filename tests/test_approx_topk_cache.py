"""$OPEN_MUSICLM_APPROX_TOPK is resolved at CALL time and participates in
the jit-cache key: toggling the env between calls must hit a different
compiled program, not silently reuse the stale sampling behavior
(ADVICE r2: core/sampling.py trace-time env read)."""

import os

import jax
import jax.numpy as jnp

from open_musiclm_tpu.core.sequence import TokenSequenceSpec
from open_musiclm_tpu.models.stages import Stage, _jitted_generate
from open_musiclm_tpu.models.token_cond import (
    StageLossConfig,
    TokenConditionedTransformer,
)


def test_env_toggle_creates_distinct_cache_entries(monkeypatch):
    model = TokenConditionedTransformer(
        specs=(TokenSequenceSpec(16, 1), TokenSequenceSpec(16, 1)),
        dim=16, depth=1, heads=2, dim_head=8,
    )
    ids = [jnp.zeros((1, 3), jnp.int32), jnp.zeros((1, 3), jnp.int32)]
    params = model.init(jax.random.PRNGKey(0), ids)
    stage = Stage(model, params, StageLossConfig(cross_entropy_loss_weights=(0.0, 1.0)))
    cond = [jnp.zeros((2, 3), jnp.int32)]

    before = _jitted_generate.cache_info()
    monkeypatch.setenv("OPEN_MUSICLM_APPROX_TOPK", "0")
    stage.generate(cond, jax.random.PRNGKey(1), max_time_steps=2)
    mid = _jitted_generate.cache_info()
    assert mid.currsize == before.currsize + 1

    monkeypatch.setenv("OPEN_MUSICLM_APPROX_TOPK", "1")
    stage.generate(cond, jax.random.PRNGKey(1), max_time_steps=2)
    after = _jitted_generate.cache_info()
    assert after.currsize == mid.currsize + 1, (
        "env toggle must resolve to a NEW cached jit (approx_topk in the key)"
    )

    # and an explicit approx_topk argument overrides the env entirely
    monkeypatch.setenv("OPEN_MUSICLM_APPROX_TOPK", "0")
    stage.generate(cond, jax.random.PRNGKey(1), max_time_steps=2, approx_topk=True)
    assert _jitted_generate.cache_info().hits > after.hits
