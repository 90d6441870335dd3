"""Golden regression fixtures: fixed-seed sampled tokens checked against
stored values, guarding the decode math across refactors/rounds.

A missing/corrupted fixture FAILS the test (it never silently rewrites
itself). Regenerate after an INTENTIONAL numerics change:

    python tests/test_golden.py regenerate
"""

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_musiclm_tpu.core.sequence import TokenSequenceSpec
from open_musiclm_tpu.models.token_cond import TokenConditionedTransformer, generate

GOLDEN_DIR = Path(__file__).parent / "golden"
CB = 16

# two geometries: the original 3q->2q toy, and a coarse-stage shape
# ([clap 12q, semantic 1q, coarse 3q]) where the per-timestep quantizer
# loop / EOS suppression interplay is richest
CASES = {
    "generate_tokens.json": dict(
        specs=((CB, 3), (CB, 2)),
        lens=(6,),
        dim=32, depth=2, heads=2, dim_head=8,
        max_time_steps=5, temperature=0.7, filter_thres=0.5,
    ),
    "generate_tokens_coarse.json": dict(
        specs=((CB, 12), (CB, 1), (CB, 3)),
        lens=(12, 7),
        dim=32, depth=2, heads=2, dim_head=8,
        max_time_steps=4, temperature=0.7, filter_thres=0.5,
    ),
}


def _run_case(cfg):
    model = TokenConditionedTransformer(
        specs=tuple(TokenSequenceSpec(cb, q) for cb, q in cfg["specs"]),
        dim=cfg["dim"], depth=cfg["depth"], heads=cfg["heads"],
        dim_head=cfg["dim_head"],
    )
    ids = [jnp.zeros((2, n), jnp.int32) for n in cfg["lens"]]
    ids.append(jnp.zeros((2, 2 * cfg["specs"][-1][1]), jnp.int32))
    params = model.init(jax.random.PRNGKey(42), ids)
    cond = [
        jax.random.randint(jax.random.fold_in(jax.random.PRNGKey(43), i), (2, n), 0, CB)
        for i, n in enumerate(cfg["lens"])
    ]
    out = generate(
        model, params, cond, jax.random.PRNGKey(44),
        max_time_steps=cfg["max_time_steps"],
        temperature=cfg["temperature"],
        filter_thres=cfg["filter_thres"],
    )
    return np.asarray(out).tolist()


@pytest.mark.parametrize("name", list(CASES))
def test_golden_generation_tokens(name):
    path = GOLDEN_DIR / name
    assert path.exists(), (
        f"golden fixture {path} is missing — a deleted fixture must not "
        "silently pass; restore it from git or regenerate intentionally via "
        "`python tests/test_golden.py regenerate`"
    )
    expected = json.loads(path.read_text())
    got = _run_case(CASES[name])
    assert got == expected, (
        "fixed-seed generation drifted from the golden fixture — if the "
        "numerics change was intentional, regenerate via "
        "`python tests/test_golden.py regenerate`"
    )


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "regenerate":
        # mirror tests/conftest.py so fixtures match what pytest computes
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_threefry_partitionable", False)
        jax.config.update("jax_default_matmul_precision", "highest")
        GOLDEN_DIR.mkdir(exist_ok=True)
        for name, cfg in CASES.items():
            (GOLDEN_DIR / name).write_text(json.dumps(_run_case(cfg)))
            print(f"wrote {GOLDEN_DIR / name}")
    else:
        sys.exit("usage: python tests/test_golden.py regenerate")
