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
