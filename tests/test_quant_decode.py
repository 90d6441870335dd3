"""int8 weight-only decode: kernel parity, step equivalence to the flax
decode (with near-lossless weights), end-to-end argmax agreement."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_musiclm_tpu.core.sequence import TokenSequenceSpec
from open_musiclm_tpu.models.quant_decode import (
    generate_quantized,
    quant_decode_step,
    quantize_stage_params,
)
from open_musiclm_tpu.models.token_cond import TokenConditionedTransformer, generate
from open_musiclm_tpu.models.transformer import Transformer
from open_musiclm_tpu.ops.quant import (
    dequantize_weight,
    int8_matmul,
    int8_matmul_xla,
    quantize_weight,
)

CB = 16


def test_quantize_roundtrip_error():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 96))
    q, s = quantize_weight(w)
    back = dequantize_weight(q, s)
    # per-channel int8: max error <= scale/2 per channel
    err = jnp.abs(back - w)
    assert float(jnp.max(err / s[None, :])) <= 0.5 + 1e-3


def test_int8_matmul_kernel_matches_xla():
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 64))
    w = jax.random.normal(jax.random.PRNGKey(2), (64, 200))
    q, s = quantize_weight(w)
    expected = np.asarray(int8_matmul_xla(x, q, s))
    got = np.asarray(int8_matmul(x, q, s, block_out=128, interpret=True))
    np.testing.assert_allclose(got, expected, atol=2e-4)


def make_model():
    return TokenConditionedTransformer(
        specs=(TokenSequenceSpec(CB, 2), TokenSequenceSpec(CB, 2)),
        dim=32, depth=2, heads=2, dim_head=8,
    )


def test_quant_step_matches_flax_decode():
    """With weights snapped onto the int8 grid, the quantized step must match
    the flax decode step exactly (same math, different execution)."""
    model = make_model()
    ids = [jnp.zeros((2, 4), jnp.int32), jnp.zeros((2, 4), jnp.int32)]
    params = model.init(jax.random.PRNGKey(0), ids)

    # snap every quantized matrix onto its int8 grid -> quantization lossless
    p = jax.tree_util.tree_map(lambda x: x, params)
    t = p["params"]["transformer"]
    for l in range(model.depth):
        for blk, key in [("attn", "to_q"), ("attn", "to_kv"), ("attn", "to_out"),
                         ("ff", "proj_in"), ("ff", "proj_out")]:
            node = t[f"{blk}_{l}"][key]
            q, s = quantize_weight(node["kernel"])
            node["kernel"] = dequantize_weight(q, s)
    w = p["params"]["logits_1"]
    snapped = []
    for i in range(w.shape[0]):
        q, s = quantize_weight(jnp.transpose(w[i]))
        snapped.append(jnp.transpose(dequantize_weight(q, s)))
    p["params"]["logits_1"] = jnp.stack(snapped)

    qparams = quantize_stage_params(model, p)
    tfm = model.transformer if hasattr(model, "transformer") else None

    # build a cache via prefill, then compare one decode step
    from open_musiclm_tpu.models.token_cond import (
        _tfm_bias_table, _tfm_init_cache, _tfm_prefill, _tfm_decode_step,
    )

    x = model.apply(p, ids, method=TokenConditionedTransformer.assemble_stream)
    cache = model.apply(p, 2, 16, method=_tfm_init_cache)
    table = model.apply(p, 16, method=_tfm_bias_table)
    _, cache = model.apply(p, x, cache, method=_tfm_prefill)

    x_t = jax.random.normal(jax.random.PRNGKey(3), (2, 32))
    pos = jnp.int32(x.shape[1])
    h_ref, cache_ref = model.apply(p, x_t, cache, pos, table, method=_tfm_decode_step)
    h_q, cache_q = quant_decode_step(
        model, p, qparams, x_t, cache, pos, table, matmul=int8_matmul_xla
    )
    np.testing.assert_allclose(np.asarray(h_q), np.asarray(h_ref), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(cache_q["k"]), np.asarray(cache_ref["k"]), atol=2e-4
    )


def test_generate_quantized_end_to_end():
    """Argmax generation with real (lossy) int8 weights matches the fp path
    on most tokens and produces valid output shapes."""
    model = make_model()
    ids = [jnp.zeros((2, 6), jnp.int32), jnp.zeros((2, 8), jnp.int32)]
    params = model.init(jax.random.PRNGKey(0), ids)
    qparams = quantize_stage_params(model, params)
    cond = [jax.random.randint(jax.random.PRNGKey(1), (2, 6), 0, CB)]

    fp = np.asarray(
        generate(model, params, cond, jax.random.PRNGKey(2),
                 max_time_steps=4, temperature=0.0)
    )
    q = np.asarray(
        generate_quantized(
            model, params, qparams, cond, jax.random.PRNGKey(2),
            max_time_steps=4, temperature=0.0, use_pallas=False,
        )
    )
    assert q.shape == fp.shape
    assert q.min() >= 0 and q.max() < CB
    agreement = (q == fp).mean()
    assert agreement > 0.5, f"int8 argmax agreement too low: {agreement}"


def test_stage_quantized_flag():
    import dataclasses as dc

    from open_musiclm_tpu.models.stages import Stage
    from open_musiclm_tpu.models.token_cond import StageLossConfig

    model = make_model()
    ids = [jnp.zeros((2, 6), jnp.int32), jnp.zeros((2, 8), jnp.int32)]
    params = model.init(jax.random.PRNGKey(0), ids)
    stage = Stage(model, params, StageLossConfig(cross_entropy_loss_weights=(0.0, 1.0)))
    qstage = dc.replace(stage, quantized=True)
    cond = [jax.random.randint(jax.random.PRNGKey(1), (2, 6), 0, CB)]

    fp = stage.generate(cond, jax.random.PRNGKey(2), max_time_steps=3, temperature=0.0)
    q = qstage.generate(cond, jax.random.PRNGKey(2), max_time_steps=3, temperature=0.0)
    assert fp.shape == q.shape
    assert (np.asarray(fp) == np.asarray(q)).mean() > 0.5


def test_musiclm_with_quantized_stages():
    """Full tiny pipeline with all three stages in int8 serving mode."""
    import dataclasses as dc

    import pytest

    from tests.test_musiclm import GEN_KW

    tm = pytest.importorskip("tests.test_musiclm")
    # build the tiny musiclm fixture manually (fixtures aren't callable here)
    import tests.test_musiclm as m

    request = None
    # reuse the fixture function body via the module-level builder
    fixture_fn = m.tiny_musiclm.__wrapped__ if hasattr(m.tiny_musiclm, "__wrapped__") else None
    if fixture_fn is None:
        pytest.skip("fixture not introspectable")
    musiclm = fixture_fn()
    musiclm = dc.replace(
        musiclm,
        semantic_stage=dc.replace(musiclm.semantic_stage, quantized=True),
        coarse_stage=dc.replace(musiclm.coarse_stage, quantized=True),
        fine_stage=dc.replace(musiclm.fine_stage, quantized=True),
    )
    wave = musiclm.generate(key=jax.random.PRNGKey(0), text=["int8 pipeline"], **GEN_KW)
    assert wave.ndim == 2 and np.isfinite(np.asarray(wave)).all()


@pytest.mark.parametrize("mode", ["bf16", "f32", "int8"])
def test_generate_flash_kv_matches_quantized(mode):
    """flash_kv decode (packed early-exit cache, XLA fallback on CPU) must
    agree with the plain quantized path at temperature 0 — exactly for
    bf16/f32 packing (same math over the same f32 cache values), on most
    tokens for int8 cache rows (lossy)."""
    model = make_model()
    ids = [jnp.zeros((2, 6), jnp.int32), jnp.zeros((2, 8), jnp.int32)]
    params = model.init(jax.random.PRNGKey(0), ids)
    qparams = quantize_stage_params(model, params)
    cond = [jax.random.randint(jax.random.PRNGKey(1), (2, 6), 0, CB)]

    base = np.asarray(
        generate_quantized(
            model, params, qparams, cond, jax.random.PRNGKey(2),
            max_time_steps=4, temperature=0.0, use_pallas=False,
        )
    )
    flash = np.asarray(
        generate_quantized(
            model, params, qparams, cond, jax.random.PRNGKey(2),
            max_time_steps=4, temperature=0.0, use_pallas=False,
            flash_kv=mode,
        )
    )
    assert flash.shape == base.shape
    agreement = (flash == base).mean()
    if mode in ("bf16", "f32"):
        assert agreement == 1.0, agreement
    else:
        assert agreement > 0.5, agreement


def test_stage_flash_kv_flag(monkeypatch):
    import dataclasses as dc

    from open_musiclm_tpu.models.stages import Stage
    from open_musiclm_tpu.models.token_cond import StageLossConfig

    monkeypatch.setenv("OPEN_MUSICLM_FLASH_KV", "bf16")
    model = make_model()
    ids = [jnp.zeros((2, 6), jnp.int32), jnp.zeros((2, 8), jnp.int32)]
    params = model.init(jax.random.PRNGKey(0), ids)
    stage = Stage(
        model, params, StageLossConfig(cross_entropy_loss_weights=(0.0, 1.0)),
        quantized=True,
    )
    assert stage.flash_kv == "bf16"  # picked up from the env
    cond = [jax.random.randint(jax.random.PRNGKey(1), (2, 6), 0, CB)]
    out = stage.generate(cond, jax.random.PRNGKey(2), max_time_steps=3, temperature=0.0)
    assert out.shape == (2, 3, 2)
    assert np.asarray(out).min() >= 0


def test_musiclm_with_flash_kv_stages():
    """Full tiny pipeline with int8 serving mode + flash int8 KV caches
    (XLA fallback path on CPU)."""
    import dataclasses as dc

    import tests.test_musiclm as m
    from tests.test_musiclm import GEN_KW

    fixture_fn = m.tiny_musiclm.__wrapped__ if hasattr(m.tiny_musiclm, "__wrapped__") else None
    if fixture_fn is None:
        pytest.skip("fixture not introspectable")
    musiclm = fixture_fn()
    musiclm = dc.replace(
        musiclm,
        semantic_stage=dc.replace(
            musiclm.semantic_stage, quantized=True, flash_kv="int8"
        ),
        coarse_stage=dc.replace(musiclm.coarse_stage, quantized=True, flash_kv="int8"),
        fine_stage=dc.replace(musiclm.fine_stage, quantized=True, flash_kv="bf16"),
    )
    wave = musiclm.generate(
        key=jax.random.PRNGKey(0), text=["flash kv pipeline"], **GEN_KW
    )
    assert wave.ndim == 2 and np.isfinite(np.asarray(wave)).all()


def test_generate_fused_layer_matches_flash_int8():
    """flash_kv='fused' (mega-kernel path, XLA fallback on CPU) agrees with
    flash_kv='int8' on most argmax tokens — the only numeric difference is
    the fresh K/V row consumed unquantized from registers."""
    model = make_model()
    ids = [jnp.zeros((2, 6), jnp.int32), jnp.zeros((2, 8), jnp.int32)]
    params = model.init(jax.random.PRNGKey(0), ids)
    qparams = quantize_stage_params(model, params, fused=True)
    cond = [jax.random.randint(jax.random.PRNGKey(1), (2, 6), 0, CB)]

    base = np.asarray(
        generate_quantized(
            model, params, qparams, cond, jax.random.PRNGKey(2),
            max_time_steps=4, temperature=0.0, use_pallas=False,
            flash_kv="int8",
        )
    )
    fused = np.asarray(
        generate_quantized(
            model, params, qparams, cond, jax.random.PRNGKey(2),
            max_time_steps=4, temperature=0.0, use_pallas=False,
            flash_kv="fused",
        )
    )
    assert fused.shape == base.shape
    assert fused.min() >= 0 and fused.max() < CB
    assert (fused == base).mean() > 0.5


def test_int8_matmul_row_blocked_matches_xla():
    """B > 256 triggers the row-blocked grid (rows innermost so each weight
    column block is fetched once); 600 is not a block multiple, covering the
    pad+slice path."""
    x = jax.random.normal(jax.random.PRNGKey(7), (600, 64))
    w = jax.random.normal(jax.random.PRNGKey(8), (64, 200))
    q, s = quantize_weight(w)
    expected = np.asarray(int8_matmul_xla(x, q, s))
    got = np.asarray(int8_matmul(x, q, s, block_out=128, interpret=True))
    np.testing.assert_allclose(got, expected, atol=2e-4)


def test_fused_ff_kernel_row_blocked_matches_xla():
    """The fused conv-FF kernel row-blocks past 64 rows (musiclm_large
    batches 64 prompts x 20 fine windows = 1280 rows, which blew the 16 MB
    scoped-VMEM limit as one block). 130 rows covers grid + pad + slice."""
    from open_musiclm_tpu.ops.fused_ff import (
        fused_ff_apply,
        fused_ff_apply_xla,
        pack_ff_weights,
    )

    dim, inner, b = 64, 100, 130
    k = jax.random.PRNGKey(9)
    f_params = {
        "norm_in": {"gamma": jax.random.normal(jax.random.fold_in(k, 0), (dim,))},
        "proj_in": {
            "kernel": jax.random.normal(jax.random.fold_in(k, 1), (dim, 2 * inner))
            / 8.0
        },
        "conv_w": jax.random.normal(jax.random.fold_in(k, 2), (3, 2 * inner)) / 8.0,
        "norm_mid": {"gamma": jax.random.normal(jax.random.fold_in(k, 3), (inner,))},
        "proj_out": {
            "kernel": jax.random.normal(jax.random.fold_in(k, 4), (inner, dim)) / 8.0
        },
    }
    packed = pack_ff_weights(f_params)
    x = jax.random.normal(jax.random.fold_in(k, 5), (b, dim))
    state = jax.random.normal(jax.random.fold_in(k, 6), (b, 2, 2 * inner)) / 4.0
    y_ref, st_ref = fused_ff_apply_xla(x, packed, state)
    y, st = fused_ff_apply(x, packed, state, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(st), np.asarray(st_ref), atol=2e-4, rtol=1e-3)


def test_stage_flash_kv_without_quantized_raises():
    """flash_kv without quantized=True used to be silently ignored (the fp
    path ran instead) — a round-4 deviation lane scored it as 0% deviation.
    Now it raises loudly."""
    from open_musiclm_tpu.models.stages import Stage
    from open_musiclm_tpu.models.token_cond import StageLossConfig

    model = make_model()
    ids = [jnp.zeros((2, 6), jnp.int32), jnp.zeros((2, 8), jnp.int32)]
    params = model.init(jax.random.PRNGKey(0), ids)
    stage = Stage(
        model, params, StageLossConfig(cross_entropy_loss_weights=(0.0, 1.0)),
        quantized=False, flash_kv="int8",
    )
    cond = [jax.random.randint(jax.random.PRNGKey(1), (2, 6), 0, CB)]
    with pytest.raises(ValueError, match="flash_kv"):
        stage.generate(cond, jax.random.PRNGKey(2), max_time_steps=3)


def test_generate_return_logits_consistency():
    """return_logits returns the per-step f32 logits; same-path teacher-
    forced runs (fp vs fp, quant vs quant) must reproduce their own logits
    exactly, and tokens must equal the no-logits call."""
    from open_musiclm_tpu.models.stages import Stage
    from open_musiclm_tpu.models.token_cond import StageLossConfig

    model = make_model()
    ids = [jnp.zeros((2, 6), jnp.int32), jnp.zeros((2, 8), jnp.int32)]
    params = model.init(jax.random.PRNGKey(0), ids)
    cond = [jax.random.randint(jax.random.PRNGKey(1), (2, 6), 0, CB)]
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(2))
    for repl in (dict(flash_kv=None), dict(quantized=True, flash_kv="int8")):
        stage = Stage(
            model, params, StageLossConfig(cross_entropy_loss_weights=(0.0, 1.0)),
            **repl,
        )
        kw = dict(max_time_steps=4, per_row_keys=keys, temperature=0.7)
        toks = stage.generate(cond, None, **kw)
        toks2, logits = stage.generate(cond, None, return_logits=True, **kw)
        assert logits.shape == (2, 8, CB + 1) and logits.dtype == jnp.float32
        np.testing.assert_array_equal(np.asarray(toks), np.asarray(toks2))
        # teacher-forced along its own trajectory: identical logits
        _, logits_tf = stage.generate(
            cond, None, return_logits=True, teacher_forced_ids=toks, **kw
        )
        np.testing.assert_array_equal(np.asarray(logits), np.asarray(logits_tf))
