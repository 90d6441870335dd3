"""Test harness: force CPU backend with 8 virtual devices so multi-chip
sharding (pjit over a Mesh) is exercised without TPU hardware.

Must run before the first `import jax` anywhere in the test process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override: driver env sets axon (TPU)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize pre-imports jax internals at interpreter startup, so
# the env var alone may be latched too late; force the platform via config.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", False)
# the CPU backend's default matmul precision is a bf16-ish oneDNN fastpath
# (~1e-3 relative error); force true fp32 so parity tests measure the math,
# not the backend's speed default
jax.config.update("jax_default_matmul_precision", "highest")
assert jax.devices()[0].platform == "cpu", "tests must run on CPU"
assert len(jax.devices()) == 8, "tests expect 8 virtual CPU devices"

import gc  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _release_compiled_executables_per_module():
    """Keep the long serial run alive: after ~200 tests of accumulated jit
    executables (plus torch in-process for the parity tests), the NEXT
    XLA:CPU compile segfaults inside backend_compile_and_load — reproduced
    deterministically at tests/test_vq.py's final test, while every module
    passes in isolation. Dropping the compilation caches at module teardown
    releases the loaded executables (and their JIT code memory) so the
    process-wide compiler state stays bounded. Costs only cross-module
    cache reuse, which is near zero here (each module compiles its own
    geometries)."""
    yield
    jax.clear_caches()
    gc.collect()

# Opt-in per-test RSS logging for leak hunts: RSS_LOG=/path pytest tests/
_RSS_LOG = os.environ.get("RSS_LOG")
if _RSS_LOG:

    def _vm_rss_kb() -> int:
        try:
            with open("/proc/self/status") as f:
                for line in f:
                    if line.startswith("VmRSS:"):
                        return int(line.split()[1])
        except OSError:
            pass
        return -1

    def pytest_runtest_logreport(report):
        if report.when == "call":
            with open(_RSS_LOG, "a") as f:
                f.write(f"{_vm_rss_kb()}\t{report.outcome}\t{report.nodeid}\n")
