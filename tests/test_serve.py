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
