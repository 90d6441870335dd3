"""Teacher-forced decode scoring: the mechanism behind the serving-mode
deviation measurement (scripts/measure_serving_deviation.py). Each step
samples its own token but feeds the teacher token forward, so two decode
paths can be compared per-step under identical prefixes (no AR divergence
compounding)."""

import jax
import jax.numpy as jnp
import numpy as np

from open_musiclm_tpu.core.sequence import TokenSequenceSpec
from open_musiclm_tpu.models.stages import Stage
from open_musiclm_tpu.models.token_cond import (
    StageLossConfig,
    TokenConditionedTransformer,
)

CB = 16


def _make_stage(**kw):
    model = TokenConditionedTransformer(
        specs=(TokenSequenceSpec(CB, 2), TokenSequenceSpec(CB, 1)),
        dim=32, depth=2, heads=2, dim_head=8,
    )
    ids = [jnp.zeros((1, 6), jnp.int32), jnp.zeros((1, 5), jnp.int32)]
    params = model.init(jax.random.PRNGKey(0), ids)
    return Stage(
        model, params, StageLossConfig(cross_entropy_loss_weights=(0.0, 1.0)), **kw
    )


def test_teacher_forcing_own_trajectory_is_identity():
    """Teacher == the path's own free-running trajectory => the sampled
    tokens must reproduce that trajectory exactly (every fed prefix equals
    the free-running prefix)."""
    stage = _make_stage()
    cond = [jax.random.randint(jax.random.PRNGKey(1), (4, 6), 0, CB)]
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(4))
    free = stage.generate(
        cond, None, max_time_steps=5, per_row_keys=keys, temperature=1.0,
        filter_thres=0.5,
    )
    forced = stage.generate(
        cond, None, max_time_steps=5, per_row_keys=keys, temperature=1.0,
        filter_thres=0.5, teacher_forced_ids=free,
    )
    np.testing.assert_array_equal(np.asarray(free), np.asarray(forced))


def test_teacher_forcing_quantized_path_scores_fp_trajectory():
    """The int8 serving path scored along the fp trajectory: runs, returns
    the right shape, and (at this tiny scale) mostly agrees with the fp
    tokens step-for-step — the per-step mismatch rate the deviation report
    is built on."""
    fp = _make_stage()
    q = _make_stage(quantized=True, flash_kv="int8")
    q = type(q)(
        fp.model, fp.params, fp.loss_cfg, quantized=True, flash_kv="int8"
    )
    cond = [jax.random.randint(jax.random.PRNGKey(2), (4, 6), 0, CB)]
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(4))
    ref = fp.generate(
        cond, None, max_time_steps=5, per_row_keys=keys, temperature=1.0,
        filter_thres=0.5,
    )
    scored = q.generate(
        cond, None, max_time_steps=5, per_row_keys=keys, temperature=1.0,
        filter_thres=0.5, teacher_forced_ids=ref,
    )
    assert scored.shape == ref.shape
    agree = float(np.mean(np.asarray(scored) == np.asarray(ref)))
    # identical weights, int8-rounded matmuls: the two paths should agree on
    # the overwhelming majority of steps when scored under the same prefix
    assert agree > 0.6, agree


def test_teacher_forcing_diverging_teacher_changes_prefix():
    """A deliberately different teacher changes the fed prefix, so later
    samples must differ from the free-running run (proves the teacher is
    actually being fed, not ignored)."""
    stage = _make_stage()
    cond = [jax.random.randint(jax.random.PRNGKey(3), (2, 6), 0, CB)]
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(2))
    free = stage.generate(
        cond, None, max_time_steps=6, per_row_keys=keys, temperature=1.0,
        filter_thres=0.5,
    )
    other = (jnp.asarray(free) + 7) % CB
    forced = stage.generate(
        cond, None, max_time_steps=6, per_row_keys=keys, temperature=1.0,
        filter_thres=0.5, teacher_forced_ids=other,
    )
    assert not np.array_equal(np.asarray(free), np.asarray(forced))
