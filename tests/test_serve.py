"""Serving layer: continuous batching resolves concurrent requests with one
compiled geometry."""

import numpy as np

from open_musiclm_tpu.serve import GenerationServer
from tests.test_musiclm import GEN_KW, tiny_musiclm  # noqa: F401


def test_server_batches_concurrent_requests(tiny_musiclm):  # noqa: F811
    server = GenerationServer(
        tiny_musiclm, batch_size=4, batch_timeout_s=0.2, **GEN_KW
    ).start()
    try:
        futs = [server.submit(f"prompt {i}", seed=i) for i in range(6)]
        waves = [f.result(timeout=600) for f in futs]
    finally:
        server.stop()
    assert len(waves) == 6
    for w in waves:
        assert w.ndim == 1 and np.isfinite(w).all()


def test_server_blocking_api(tiny_musiclm):  # noqa: F811
    server = GenerationServer(tiny_musiclm, batch_size=2, **GEN_KW).start()
    try:
        waves = server.generate_blocking(["a", "b"])
    finally:
        server.stop()
    assert len(waves) == 2


# the tiny test vocab (17) needs a loose top-k threshold to leave >1
# candidate — at the default 0.9, k = max(int(0.1*17), 1) = 1 and sampling
# degenerates to argmax regardless of seed
SAMPLING_KW = dict(
    semantic_filter_thres=0.5, coarse_filter_thres=0.5, fine_filter_thres=0.5
)


def test_identical_prompts_in_one_batch_differ_by_seed(tiny_musiclm):  # noqa: F811
    """Two identical prompts with different seeds, co-batched, must produce
    DIFFERENT audio (per-request keys, not one batch-wide key)."""
    server = GenerationServer(
        tiny_musiclm, batch_size=2, batch_timeout_s=1.0, **GEN_KW, **SAMPLING_KW
    ).start()
    try:
        f1 = server.submit("same prompt", seed=1)
        f2 = server.submit("same prompt", seed=2)
        w1, w2 = f1.result(timeout=600), f2.result(timeout=600)
    finally:
        server.stop()
    assert w1.shape == w2.shape
    assert not np.array_equal(w1, w2)


def test_request_output_independent_of_batch_composition(tiny_musiclm):  # noqa: F811
    """A request's audio is a function of its own seed: the same (prompt,
    seed) must yield identical audio whether it shares a batch with request
    B or request C, in any slot."""

    def run(pairs):
        server = GenerationServer(
            tiny_musiclm, batch_size=2, batch_timeout_s=1.0, **GEN_KW, **SAMPLING_KW
        ).start()
        try:
            futs = [server.submit(t, seed=s) for t, s in pairs]
            return [f.result(timeout=600) for f in futs]
        finally:
            server.stop()

    a1, _ = run([("target", 5), ("other", 6)])
    _, a2 = run([("another", 9), ("target", 5)])
    np.testing.assert_array_equal(a1, a2)


def test_batch_buckets_low_load_and_result_consistency(tiny_musiclm):  # noqa: F811
    """With buckets [1, 2]: a lone request runs the batch-1 geometry and
    its audio still equals what it gets inside a full batch (per-row
    keys make the result bucket-independent)."""
    server = GenerationServer(
        tiny_musiclm, batch_size=2, batch_buckets=[1, 2],
        batch_timeout_s=0.2, **GEN_KW, **SAMPLING_KW
    ).start()
    try:
        solo = server.submit("bucket prompt", seed=3).result(timeout=600)
        f1 = server.submit("bucket prompt", seed=3)
        f2 = server.submit("other", seed=4)
        paired = f1.result(timeout=600)
        f2.result(timeout=600)
    finally:
        server.stop()
    # tokens identical; the waveform drifts ~1 ulp because the Encodec convs
    # reduce in a batch-size-dependent order
    np.testing.assert_allclose(solo, paired, atol=1e-6)
