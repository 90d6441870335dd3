"""Checkpoint I/O: orbax-backed pytree store.

Replaces the reference's ``torch.save`` state dicts + joblib k-means dumps
(trainer.py:359-369,536-549,729-734; hf_hubert_kmeans.py:147). One format for
everything: a flax/orbax pytree checkpoint per artifact, step-stamped, with
latest-checkpoint discovery mirroring scripts/train_utils.py:19-57.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_checkpoint(path: str, tree: Any) -> None:
    p = Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    tree = jax.tree_util.tree_map(np.asarray, tree)
    ckptr.save(p, tree, force=True)
    ckptr.wait_until_finished()


def load_checkpoint(path: str, like: Optional[Any] = None) -> Any:
    p = Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        like = jax.tree_util.tree_map(np.asarray, like)
        return ckptr.restore(p, like)
    return ckptr.restore(p)


def find_latest_checkpoint(folder: str, prefix: str) -> Optional[str]:
    """Find the highest-step `{prefix}.<step>.ckpt` in folder
    (reference scripts/train_utils.py:19-57)."""
    pat = re.compile(re.escape(prefix) + r"\.(\d+)\.ckpt$")
    best, best_step = None, -1
    for p in Path(folder).glob(f"{prefix}.*.ckpt"):
        m = pat.search(p.name)
        if m and int(m.group(1)) > best_step:
            best, best_step = str(p), int(m.group(1))
    return best
