"""Cross-stage pipelined generation: stage-per-device placement.

``MusicLM.to_pipelined`` places semantic/coarse/fine/codec on their own
devices; per-window segment dataflow (models/musiclm.py ``_gather_span``)
lets window w's coarse decode overlap window w+1's semantic decode via JAX
async dispatch — the reference's loops fully serialize
(open_musiclm.py:938-1023). Values must be identical to the unpipelined
path: only placement changes.
"""

import jax
import jax.numpy as jnp
import numpy as np

from open_musiclm_tpu.models.musiclm import _gather_span
from tests.test_musiclm import GEN_KW, tiny_musiclm  # noqa: F401 (fixture)


def test_gather_span_matches_full_concat():
    k = jax.random.PRNGKey(0)
    segs = [
        jax.random.randint(jax.random.fold_in(k, i), (2, n, 3), 0, 99)
        for i, n in enumerate((5, 1, 4, 7))
    ]
    full = jnp.concatenate(segs, axis=1)
    for start, length in [(0, 5), (3, 4), (5, 1), (4, 13), (16, 1), (0, 17)]:
        np.testing.assert_array_equal(
            np.asarray(_gather_span(segs, start, length)),
            np.asarray(full[:, start : start + length]),
        )


def test_pipelined_matches_unpipelined(tiny_musiclm):  # noqa: F811
    devs = jax.devices()[:4]
    pl = tiny_musiclm.to_pipelined(devs)
    # each stage's params really live on distinct devices
    stage_param_dev = [
        list(jax.tree_util.tree_leaves(s.params))[0].devices()
        for s in (pl.semantic_stage, pl.coarse_stage, pl.fine_stage)
    ]
    assert stage_param_dev == [{devs[0]}, {devs[1]}, {devs[2]}]

    kw = dict(GEN_KW, output_seconds=4)  # multi-window semantic + coarse
    w0 = tiny_musiclm.generate(
        key=jax.random.PRNGKey(7), text=["pipelined parity"], **kw
    )
    w1 = pl.generate(key=jax.random.PRNGKey(7), text=["pipelined parity"], **kw)
    np.testing.assert_array_equal(np.asarray(w0), np.asarray(w1))


def test_pipelined_per_row_keys_and_overlapping_fine(tiny_musiclm):  # noqa: F811
    pl = tiny_musiclm.to_pipelined(jax.devices()[4:8])
    kw = dict(GEN_KW, output_seconds=3, fine_sliding_window_step_percent=0.5)
    rows = jax.random.split(jax.random.PRNGKey(9), 2)
    clap_ids = jax.random.randint(jax.random.PRNGKey(8), (2, 4, 1), 0, 16)
    w0 = tiny_musiclm.generate(clap_token_ids=clap_ids, per_row_keys=rows, **kw)
    w1 = pl.generate(clap_token_ids=clap_ids, per_row_keys=rows, **kw)
    np.testing.assert_array_equal(np.asarray(w0), np.asarray(w1))


def test_pipelined_single_device_degenerates(tiny_musiclm):  # noqa: F811
    pl = tiny_musiclm.to_pipelined(jax.devices()[:1])
    assert pl.stage_devices == (jax.devices()[0],) * 4
    w = pl.generate(key=jax.random.PRNGKey(1), text=["one device"], **GEN_KW)
    w0 = tiny_musiclm.generate(key=jax.random.PRNGKey(1), text=["one device"], **GEN_KW)
    np.testing.assert_array_equal(np.asarray(w), np.asarray(w0))
