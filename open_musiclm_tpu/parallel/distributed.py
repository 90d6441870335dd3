"""Multi-host initialization (SPMD over ICI + DCN).

The reference's multi-node story is HF Accelerate env plumbing
(trainer.py:154-155). The JAX-native equivalent: every host calls
``initialize_distributed()`` once before device use; afterwards
``jax.devices()`` spans all hosts and the same Mesh/pjit code scales from
1 chip to a pod slice — DP gradient psums ride ICI within a slice and DCN
across slices automatically.

Reads the standard env contract (COORDINATOR_ADDRESS / NUM_PROCESSES /
PROCESS_ID) and falls back to TPU auto-detection; single-process callers are
a no-op.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Returns True if multi-process JAX was initialized."""
    coordinator_address = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    num_processes = num_processes or _int_env("NUM_PROCESSES")
    process_id = process_id if process_id is not None else _int_env("PROCESS_ID")

    if coordinator_address is None and num_processes is None:
        # TPU pod slices auto-detect via the TPU metadata service
        try:
            jax.distributed.initialize()
            return jax.process_count() > 1
        except Exception:
            return False

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def _int_env(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v is not None else None


def process_info() -> dict:
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def is_main_process() -> bool:
    return jax.process_index() == 0
