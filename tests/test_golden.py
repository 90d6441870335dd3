"""Golden regression fixtures: fixed-seed sampled tokens checked against
stored values, guarding the decode math across refactors/rounds.

Regenerate after an INTENTIONAL numerics change:
    python tests/test_golden.py regenerate
"""

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from open_musiclm_tpu.core.sequence import TokenSequenceSpec
from open_musiclm_tpu.models.token_cond import TokenConditionedTransformer, generate

GOLDEN_PATH = Path(__file__).parent / "golden" / "generate_tokens.json"
CB = 16


def _build():
    model = TokenConditionedTransformer(
        specs=(TokenSequenceSpec(CB, 3), TokenSequenceSpec(CB, 2)),
        dim=32, depth=2, heads=2, dim_head=8,
    )
    ids = [jnp.zeros((2, 6), jnp.int32), jnp.zeros((2, 8), jnp.int32)]
    params = model.init(jax.random.PRNGKey(42), ids)
    cond = [jax.random.randint(jax.random.PRNGKey(43), (2, 6), 0, CB)]
    return model, params, cond


def _run(model, params, cond):
    out = generate(
        model, params, cond, jax.random.PRNGKey(44),
        max_time_steps=5, temperature=0.7, filter_thres=0.5,
    )
    return np.asarray(out).tolist()


def test_golden_generation_tokens():
    model, params, cond = _build()
    got = _run(model, params, cond)
    if not GOLDEN_PATH.exists():
        GOLDEN_PATH.parent.mkdir(exist_ok=True)
        GOLDEN_PATH.write_text(json.dumps(got))
        return  # first run writes the fixture
    expected = json.loads(GOLDEN_PATH.read_text())
    assert got == expected, (
        "fixed-seed generation drifted from the golden fixture — if the "
        "numerics change was intentional, regenerate via "
        "`python tests/test_golden.py regenerate`"
    )


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "regenerate":
        model, params, cond = _build()
        GOLDEN_PATH.parent.mkdir(exist_ok=True)
        GOLDEN_PATH.write_text(json.dumps(_run(model, params, cond)))
        print(f"wrote {GOLDEN_PATH}")
