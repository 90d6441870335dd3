"""Numeric parity against the ACTUAL reference code in /root/reference.

Imports the reference's torch ``TokenConditionedTransformer`` and wrapper
(reference transformer.py:338, open_musiclm.py:33-410) with lightweight stubs
for its uninstalled deps (beartype, torchaudio; heavy sibling modules
clap_quantized/model_types are annotation-only stand-ins), random-inits it,
converts the state dict through ``import_torch.import_stage_transformer``,
and asserts against this framework:

  * full-sequence stage logits allclose (fp32) for semantic/coarse/fine
    geometries — incl. the d1024 x 6L musiclm_small stage shape;
  * ``forward_with_cond_scale`` semantics (open_musiclm.py:192-215);
  * teacher-forced training loss allclose (open_musiclm.py:328-410);
  * temperature->0 generated tokens identical, with and without an
    already-generated prefix (sliding-window continuation,
    open_musiclm.py:253-326).

This is parity by measurement, not construction: the torch side runs the
reference's own forward/generate loops (full re-forward per token), ours runs
the KV-cached lax.scan decode.
"""

from __future__ import annotations

import importlib
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from open_musiclm_tpu.core.sequence import TokenSequenceSpec  # noqa: E402
from open_musiclm_tpu.import_torch import import_stage_transformer  # noqa: E402
from open_musiclm_tpu.models.token_cond import (  # noqa: E402
    StageLossConfig,
    TokenConditionedTransformer as JaxTCT,
    generate,
    stage_training_loss,
)

REF_PKG = "refom"
REF_PATH = "/root/reference/open_musiclm"


def _install_stubs():
    """Minimal import-time stand-ins for deps absent from this image."""
    if "beartype" not in sys.modules:
        import typing

        bt = types.ModuleType("beartype")
        bt.beartype = lambda f=None, **kw: (f if f is not None else (lambda g: g))
        btt = types.ModuleType("beartype.typing")
        btt.__dict__.update(typing.__dict__)
        bt.typing = btt
        sys.modules["beartype"] = bt
        sys.modules["beartype.typing"] = btt
    if "torchaudio" not in sys.modules:
        ta = types.ModuleType("torchaudio")
        taf = types.ModuleType("torchaudio.functional")

        def _resample(*a, **kw):  # imported but unused on the tested paths
            raise NotImplementedError("torchaudio stub")

        taf.resample = _resample
        ta.functional = taf
        sys.modules["torchaudio"] = ta
        sys.modules["torchaudio.functional"] = taf


def load_reference():
    """Import /root/reference/open_musiclm as package ``refom`` (read-only)."""
    mod_name = REF_PKG + ".open_musiclm"
    if mod_name in sys.modules:
        return sys.modules[mod_name]
    _install_stubs()
    pkg = types.ModuleType(REF_PKG)
    pkg.__path__ = [REF_PATH]
    sys.modules[REF_PKG] = pkg
    # siblings pulled in only for type annotations — stub so the import does
    # not drag in vector_quantize_pytorch / laion_clap / encodec / sklearn
    cq = types.ModuleType(REF_PKG + ".clap_quantized")
    cq.ClapQuantized = type("ClapQuantized", (), {})
    mt = types.ModuleType(REF_PKG + ".model_types")
    mt.NeuralCodec = object
    mt.Wav2Vec = object
    sys.modules[REF_PKG + ".clap_quantized"] = cq
    sys.modules[REF_PKG + ".model_types"] = mt
    return importlib.import_module(mod_name)


# (codebook_size, num_quantizers) per sequence; flattened lengths (multiples
# of Q so generation timesteps line up). Mirrors the three stage shapes
# (reference open_musiclm.py:414-473) at toy scale.
GEOMS = {
    "semantic": ([(24, 12), (24, 1)], [12, 9]),
    "coarse": ([(24, 12), (24, 1), (24, 3)], [12, 9, 12]),
    "fine": ([(24, 12), (24, 3), (24, 5)], [12, 9, 15]),
}
DIMS = dict(dim=64, depth=2, heads=4, dim_head=16)


def build_pair(geom, *, dims=DIMS, seed=0):
    ref = load_reference()
    torch.manual_seed(seed)
    t_model = ref.TokenConditionedTransformer(
        token_sequences=[ref.TokenSequenceInfo(cb, q, False) for cb, q in geom],
        attn_dropout=0.0,
        ff_dropout=0.0,
        **dims,
    ).eval()
    sd = {k: v.detach().cpu().numpy() for k, v in t_model.state_dict().items()}
    j_model = JaxTCT(
        specs=tuple(TokenSequenceSpec(cb, q) for cb, q in geom), **dims
    )
    params = import_stage_transformer(sd, j_model)
    return t_model, j_model, params


def rand_ids(geom, lens, batch=2, seed=1):
    rng = np.random.default_rng(seed)
    return [
        rng.integers(0, cb, size=(batch, n)).astype(np.int64)
        for (cb, _q), n in zip(geom, lens)
    ]


@pytest.mark.parametrize("stage", list(GEOMS))
def test_forward_logits_parity(stage):
    geom, lens = GEOMS[stage]
    t_model, j_model, params = build_pair(geom)
    ids_np = rand_ids(geom, lens)
    with torch.no_grad():
        t_logits = t_model(all_token_ids=[torch.tensor(x) for x in ids_np])
    j_logits = j_model.apply(params, [jnp.asarray(x, jnp.int32) for x in ids_np])
    assert len(t_logits) == len(j_logits)
    for tl, jl in zip(t_logits, j_logits):
        np.testing.assert_allclose(
            np.asarray(jl), tl.numpy(), atol=2e-5, rtol=2e-4
        )


def test_forward_logits_parity_small_stage_geometry():
    """The real musiclm_small stage shape: d1024 x 6L x 8H, dim_head 64
    (reference create_semantic_transformer open_musiclm.py:414-431,
    configs/model/musiclm_small.json). Short sequences keep it fast."""
    geom = [(1024, 12), (1024, 1)]
    dims = dict(dim=1024, depth=6, heads=8, dim_head=64)
    t_model, j_model, params = build_pair(geom, dims=dims)
    ids_np = rand_ids(geom, [12, 25])
    with torch.no_grad():
        t_logits = t_model(all_token_ids=[torch.tensor(x) for x in ids_np])
    j_logits = j_model.apply(params, [jnp.asarray(x, jnp.int32) for x in ids_np])
    for tl, jl in zip(t_logits, j_logits):
        t = tl.numpy()
        np.testing.assert_allclose(np.asarray(jl), t, atol=3e-4, rtol=3e-4)


def test_forward_with_cond_scale_semantics():
    """has_condition=False => forward_with_cond_scale == forward
    (reference open_musiclm.py:192-215), which our plain forward matches."""
    geom, lens = GEOMS["semantic"]
    t_model, j_model, params = build_pair(geom)
    ids_np = rand_ids(geom, lens)
    with torch.no_grad():
        t_scaled = t_model.forward_with_cond_scale(
            all_token_ids=[torch.tensor(x) for x in ids_np], cond_scale=3
        )
        t_plain = t_model(all_token_ids=[torch.tensor(x) for x in ids_np])
    for a, b in zip(t_scaled, t_plain):
        np.testing.assert_array_equal(a.numpy(), b.numpy())
    j_logits = j_model.apply(params, [jnp.asarray(x, jnp.int32) for x in ids_np])
    for tl, jl in zip(t_scaled, j_logits):
        np.testing.assert_allclose(
            np.asarray(jl), tl.numpy(), atol=2e-5, rtol=2e-4
        )


@pytest.mark.parametrize(
    "weights",
    [(0.0, 0.0, 1.0), (0.5, 0.3, 1.0)],
    ids=["pred-only", "weighted-cond"],
)
def test_training_loss_parity(weights):
    ref = load_reference()
    geom, lens = GEOMS["coarse"]
    t_model, j_model, params = build_pair(geom)
    wrapper = ref.TokenConditionedTransformerWrapper(
        transformer=t_model,
        unique_consecutive=False,
        mask_prob=0.0,
        cross_entropy_loss_weights=list(weights),
    ).eval()
    ids_np = rand_ids(geom, lens)
    with torch.no_grad():
        t_loss, _, _ = wrapper(
            all_token_ids=[torch.tensor(x) for x in ids_np], return_loss=True
        )
    cfg = StageLossConfig(cross_entropy_loss_weights=weights, mask_prob=0.0)
    j_loss, _ = stage_training_loss(
        j_model,
        params,
        [jnp.asarray(x, jnp.int32) for x in ids_np],
        jax.random.PRNGKey(0),
        cfg,
        train=False,
    )
    np.testing.assert_allclose(float(j_loss), float(t_loss), rtol=1e-5)


@pytest.mark.parametrize("stage", list(GEOMS))
def test_generate_parity_greedy(stage):
    """Temperature->0 token-for-token parity: the reference's full-reforward
    per-token loop (open_musiclm.py:299-319) vs our KV-cached lax.scan."""
    ref = load_reference()
    geom, lens = GEOMS[stage]
    t_model, j_model, params = build_pair(geom)
    wrapper = ref.TokenConditionedTransformerWrapper(
        transformer=t_model, unique_consecutive=False
    ).eval()
    cond_np = rand_ids(geom[:-1], lens[:-1])
    steps = 4
    with torch.no_grad():
        t_out = wrapper.generate(
            conditioning_token_ids=[torch.tensor(c) for c in cond_np],
            max_time_steps=steps,
            temperature=1e-8,  # torch gumbel_sample has no exact-greedy mode
            filter_thres=0.9,
        )
    j_out = generate(
        j_model,
        params,
        [jnp.asarray(c, jnp.int32) for c in cond_np],
        jax.random.PRNGKey(0),
        max_time_steps=steps,
        temperature=0.0,
        filter_thres=0.9,
    )
    np.testing.assert_array_equal(np.asarray(j_out), t_out.numpy())


def test_generate_parity_with_prefix_continuation():
    """Sliding-window continuation: both sides resume from the same
    already-generated prefix (reference pred_token_ids, open_musiclm.py:272-278;
    MusicLM window loop :938-949)."""
    ref = load_reference()
    geom, lens = GEOMS["coarse"]
    t_model, j_model, params = build_pair(geom)
    wrapper = ref.TokenConditionedTransformerWrapper(
        transformer=t_model, unique_consecutive=False
    ).eval()
    cond_np = rand_ids(geom[:-1], lens[:-1])
    q = geom[-1][1]
    prefix = np.asarray(
        np.random.default_rng(7).integers(0, geom[-1][0], size=(2, 2, q))
    )
    steps = 4
    with torch.no_grad():
        t_out = wrapper.generate(
            conditioning_token_ids=[torch.tensor(c) for c in cond_np],
            pred_token_ids=torch.tensor(prefix),
            max_time_steps=steps,
            temperature=1e-8,
            filter_thres=0.9,
        )
    j_out = generate(
        j_model,
        params,
        [jnp.asarray(c, jnp.int32) for c in cond_np],
        jax.random.PRNGKey(0),
        max_time_steps=steps,
        init_pred_ids=jnp.asarray(prefix, jnp.int32),
        temperature=0.0,
        filter_thres=0.9,
    )
    np.testing.assert_array_equal(np.asarray(j_out), t_out.numpy())
