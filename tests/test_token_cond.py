"""Token-conditioned transformer: forward layout, training loss, and exact
equivalence between the KV-cached scan generator and a naive reference-style
decode loop (full re-forward per token, argmax sampling)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_musiclm_tpu.core.sampling import append_eos_id, top_k_filter
from open_musiclm_tpu.core.sequence import TokenSequenceSpec
from open_musiclm_tpu.models.token_cond import (
    PAD_ID,
    StageLossConfig,
    TokenConditionedTransformer,
    generate,
    stage_training_loss,
)

CB = 16


def make_model(num_q_pred=2, num_seqs=2):
    specs = [TokenSequenceSpec(codebook_size=CB, num_quantizers=3)]
    if num_seqs == 3:
        specs.append(TokenSequenceSpec(codebook_size=CB, num_quantizers=1))
    specs.append(TokenSequenceSpec(codebook_size=CB, num_quantizers=num_q_pred))
    return TokenConditionedTransformer(
        specs=tuple(specs), dim=32, depth=2, heads=2, dim_head=8
    )


def init_model(model, lens):
    ids = [
        jnp.zeros((2, n), jnp.int32) for n in lens
    ]
    return model.init(jax.random.PRNGKey(0), ids)


def test_forward_logit_shapes():
    model = make_model()
    ids = [
        jax.random.randint(jax.random.PRNGKey(1), (2, 6), 0, CB),
        jax.random.randint(jax.random.PRNGKey(2), (2, 8), 0, CB),
    ]
    params = init_model(model, [6, 8])
    logits = model.apply(params, ids)
    assert logits[0].shape == (2, 6, CB + 1)
    assert logits[1].shape == (2, 9, CB + 1)  # final seq: n + 1
    only_last = model.apply(params, ids, return_only_final_seq_logits=True)
    assert only_last[0] is None and only_last[1].shape == (2, 9, CB + 1)


def test_training_loss_and_grads():
    model = make_model(num_seqs=3)
    ids = [
        jax.random.randint(jax.random.PRNGKey(1), (2, 6), 0, CB),
        jax.random.randint(jax.random.PRNGKey(2), (2, 5), 0, CB),
        jax.random.randint(jax.random.PRNGKey(3), (2, 8), 0, CB),
    ]
    params = init_model(model, [6, 5, 8])
    cfg = StageLossConfig(cross_entropy_loss_weights=(0.0, 0.0, 1.0))

    def loss_fn(p):
        loss, _ = stage_training_loss(model, p, ids, jax.random.PRNGKey(4), cfg)
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    # final-seq logit head gets gradient; zero-weight heads get none
    g_final = grads["params"]["logits_2"]
    g_cond = grads["params"]["logits_0"]
    assert float(jnp.abs(g_final).max()) > 0
    assert float(jnp.abs(g_cond).max()) == 0
    # transformer weights get gradient
    g_attn = jax.tree_util.tree_leaves(grads["params"]["transformer"])
    assert any(float(jnp.abs(g).max()) > 0 for g in g_attn)


def naive_generate_argmax(model, params, cond_ids, max_time_steps, n_init_tok=None):
    """Reference-style decode: full forward per token, EOS suppressed, argmax
    over top-k-filtered logits (temperature->0 limit of the reference
    sampler, open_musiclm.py:299-319)."""
    specs = model.specs
    q_num = specs[-1].num_quantizers
    cond = [append_eos_id(t, s.eos_id) for t, s in zip(cond_ids, specs[:-1])]
    sampled = n_init_tok if n_init_tok is not None else jnp.zeros((cond[0].shape[0], 0), jnp.int32)
    t0 = sampled.shape[-1]
    for step in range(t0, max_time_steps * q_num):
        logits = model.apply(
            params, list(cond) + [sampled], return_only_final_seq_logits=True
        )[-1]
        last = logits[:, -1]
        last = last.at[:, -1].set(-1e9)  # suppress EOS
        last = top_k_filter(last, 0.9)
        tok = jnp.argmax(last, axis=-1).astype(jnp.int32)
        sampled = jnp.concatenate([sampled, tok[:, None]], axis=-1)
    return sampled.reshape(sampled.shape[0], max_time_steps, q_num)


@pytest.mark.parametrize("num_seqs", [2, 3])
def test_generate_matches_naive_decode(num_seqs):
    model = make_model(num_seqs=num_seqs)
    lens = [6, 8] if num_seqs == 2 else [6, 5, 8]
    cond_lens = lens[:-1]
    cond_ids = [
        jax.random.randint(jax.random.PRNGKey(10 + i), (2, n), 0, CB)
        for i, n in enumerate(cond_lens)
    ]
    params = init_model(model, lens)

    T = 4
    expected = naive_generate_argmax(model, params, cond_ids, T)
    got = generate(
        model,
        params,
        cond_ids,
        jax.random.PRNGKey(0),
        max_time_steps=T,
        temperature=0.0,
    )
    np.testing.assert_array_equal(np.asarray(expected), np.asarray(got))


def test_generate_with_init_pred_continuation():
    model = make_model()
    cond_ids = [jax.random.randint(jax.random.PRNGKey(20), (2, 6), 0, CB)]
    params = init_model(model, [6, 8])
    T = 4
    q = model.specs[-1].num_quantizers
    init = jax.random.randint(jax.random.PRNGKey(21), (2, 2, q), 0, CB)

    expected = naive_generate_argmax(
        model, params, cond_ids, T, n_init_tok=init.reshape(2, -1)
    )
    got = generate(
        model,
        params,
        cond_ids,
        jax.random.PRNGKey(0),
        max_time_steps=T,
        init_pred_ids=init,
        temperature=0.0,
    )
    np.testing.assert_array_equal(np.asarray(expected), np.asarray(got))
    # prefix is preserved
    np.testing.assert_array_equal(np.asarray(got[:, :2]), np.asarray(init))


def test_generate_is_jittable():
    model = make_model()
    cond_ids = [jax.random.randint(jax.random.PRNGKey(30), (2, 6), 0, CB)]
    params = init_model(model, [6, 8])

    fn = jax.jit(
        lambda p, c, k: generate(model, p, [c], k, max_time_steps=3, temperature=0.9)
    )
    out = fn(params, cond_ids[0], jax.random.PRNGKey(1))
    assert out.shape == (2, 3, 2)
    assert int(out.min()) >= 0 and int(out.max()) < CB


def test_pad_ids_embed_to_zero():
    model = make_model()
    params = init_model(model, [6, 8])
    ids = jnp.full((1, 4), PAD_ID, jnp.int32)
    emb = model.apply(
        params, 0, ids, method=TokenConditionedTransformer.embed_one_sequence
    )
    np.testing.assert_array_equal(np.asarray(emb), 0.0)


def test_unique_consecutive_masked_loss():
    from open_musiclm_tpu.core.sampling import (
        batch_unique_consecutive_np,
        mask_unique_consecutive,
        unique_consecutive_mask,
    )

    ids = jnp.array([[3, 3, 5, 5, 5, 2], [1, 2, 2, 1, 1, 1]])
    mask = unique_consecutive_mask(ids)
    np.testing.assert_array_equal(
        np.asarray(mask),
        [[True, False, True, False, False, True], [True, True, False, True, False, False]],
    )
    masked = mask_unique_consecutive(ids)
    np.testing.assert_array_equal(np.asarray(masked[0]), [3, -1, 5, -1, -1, 2])
    # host-side exact compaction (reference semantics)
    comp = batch_unique_consecutive_np(np.asarray(ids))
    np.testing.assert_array_equal(comp[0], [3, 5, 2])
    np.testing.assert_array_equal(comp[1], [1, 2, 1])
    # uneven runs pad to the longest compacted row
    comp2 = batch_unique_consecutive_np(np.array([[1, 1, 1, 1], [1, 2, 3, 4]]))
    np.testing.assert_array_equal(comp2[0], [1, -1, -1, -1])

    # loss path runs with unique_consecutive sequences
    specs = (
        TokenSequenceSpec(CB, 1, unique_consecutive=True),
        TokenSequenceSpec(CB, 1, unique_consecutive=True),
    )
    model = TokenConditionedTransformer(specs=specs, dim=32, depth=1, heads=2, dim_head=8)
    tok = [
        jax.random.randint(jax.random.PRNGKey(0), (2, 6), 0, 3),
        jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, 3),
    ]
    params = model.init(jax.random.PRNGKey(2), tok)
    cfg = StageLossConfig(
        cross_entropy_loss_weights=(0.0, 1.0), unique_consecutive=True, mask_prob=0.0
    )
    loss, aux = stage_training_loss(model, params, tok, jax.random.PRNGKey(3), cfg)
    assert np.isfinite(float(loss))
