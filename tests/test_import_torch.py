"""Weight-importer parity tests: numeric agreement with torch reference
implementations (HF transformers HuBERT/RoBERTa, torch LSTM/ConvTranspose)
on randomly initialized weights."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from open_musiclm_tpu import import_torch as it
from open_musiclm_tpu.core.sequence import TokenSequenceSpec
from open_musiclm_tpu.models.encodec import CausalConvTranspose1d, StreamLSTM
from open_musiclm_tpu.models.hubert import HubertConfig, HubertModel
from open_musiclm_tpu.models.clap.roberta import RobertaConfig, RobertaModel
from open_musiclm_tpu.models.token_cond import TokenConditionedTransformer

torch.manual_seed(0)


def to_np_sd(module):
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


def test_hubert_full_model_parity():
    from transformers import HubertConfig as HFConfig, HubertModel as HFModel

    hf_cfg = HFConfig(
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=64,
        conv_dim=(16,) * 7,
        conv_kernel=(10, 3, 3, 3, 3, 2, 2),
        conv_stride=(5, 2, 2, 2, 2, 2, 2),
        conv_bias=False,
        feat_extract_norm="group",
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        do_stable_layer_norm=False,
        hidden_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        activation_dropout=0.0,
        layerdrop=0.0,
    )
    hf = HFModel(hf_cfg).eval()

    cfg = HubertConfig(
        conv_dim=(16,) * 7,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=64,
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
    )
    model = HubertModel(cfg=cfg)
    params = it.import_hubert(to_np_sd(hf), cfg)

    wav = np.random.RandomState(0).randn(2, 3200).astype(np.float32) * 0.1
    with torch.no_grad():
        hf_out = hf(torch.from_numpy(wav), output_hidden_states=True)
    ours_last, ours_hs = model.apply(params, jnp.asarray(wav))

    for i in [0, 1, 2]:
        np.testing.assert_allclose(
            np.asarray(ours_hs[i]),
            hf_out.hidden_states[i].numpy(),
            atol=2e-4,
            err_msg=f"hidden_states[{i}] mismatch",
        )


def test_roberta_full_model_parity():
    from transformers import RobertaConfig as HFConfig, RobertaModel as HFModel

    hf_cfg = HFConfig(
        vocab_size=100,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=64,
        max_position_embeddings=40,
        type_vocab_size=1,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        pad_token_id=1,
    )
    hf = HFModel(hf_cfg, add_pooling_layer=True).eval()

    cfg = RobertaConfig(
        vocab_size=100,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=64,
        max_position_embeddings=40,
    )
    model = RobertaModel(cfg=cfg)
    params = it.import_roberta(to_np_sd(hf), cfg)

    ids = np.array([[0, 7, 8, 9, 2, 1, 1], [0, 5, 6, 7, 8, 9, 2]], np.int64)
    mask = np.array([[1, 1, 1, 1, 1, 0, 0], [1, 1, 1, 1, 1, 1, 1]], np.int64)
    with torch.no_grad():
        hf_out = hf(input_ids=torch.from_numpy(ids), attention_mask=torch.from_numpy(mask))
    ours = model.apply(params, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32))
    np.testing.assert_allclose(
        np.asarray(ours["pooler_output"]), hf_out.pooler_output.numpy(), atol=2e-4
    )
    # masked positions excluded: compare unmasked last_hidden rows
    np.testing.assert_allclose(
        np.asarray(ours["last_hidden_state"])[1],
        hf_out.last_hidden_state.numpy()[1],
        atol=2e-4,
    )


def test_lstm_import_parity():
    tl = torch.nn.LSTM(input_size=12, hidden_size=12, num_layers=2).eval()
    sd = {f"lstm.{k}": v.detach().numpy() for k, v in tl.state_dict().items()}
    model = StreamLSTM(hidden=12, num_layers=2, skip=False)
    params = {"params": it._slstm(sd, "", 2)}
    x = np.random.RandomState(1).randn(2, 9, 12).astype(np.float32)
    with torch.no_grad():
        expected, _ = tl(torch.from_numpy(x).permute(1, 0, 2))
    expected = expected.permute(1, 0, 2).numpy()
    got = model.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-5)


def test_conv_transpose_import_parity():
    ct = torch.nn.ConvTranspose1d(6, 4, kernel_size=8, stride=4).eval()
    w = ct.weight.detach().numpy()
    b = ct.bias.detach().numpy()
    model = CausalConvTranspose1d(out_ch=4, kernel=8, stride=4)
    params = {"params": {"convtr": it.conv_transpose1d(w, b)}}
    x = np.random.RandomState(2).randn(1, 10, 6).astype(np.float32)
    with torch.no_grad():
        full = ct(torch.from_numpy(x).permute(0, 2, 1)).permute(0, 2, 1).numpy()
    expected = full[:, : full.shape[1] - (8 - 4)]  # causal right trim
    got = model.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-5)


def test_weight_norm_fold():
    lin = torch.nn.Conv1d(4, 8, 3, bias=False)
    wn = torch.nn.utils.weight_norm(lin)
    sd = {k: v.detach().numpy() for k, v in wn.state_dict().items()}
    folded = it.fold_weight_norm(sd["weight_g"], sd["weight_v"])
    np.testing.assert_allclose(folded, wn.weight.detach().numpy(), atol=1e-6)


def make_reference_shaped_stage_sd(specs, dim=32, depth=1, heads=2, dim_head=8):
    """Random state dict with the reference TokenConditionedTransformer
    layout (keys/shapes only — values random)."""
    rs = np.random.RandomState(0)
    sd = {}
    for i, spec in enumerate(specs):
        sd[f"start_tokens.{i}"] = rs.randn(dim).astype(np.float32)
        sd[f"embeddings.{i}.weight"] = rs.randn(
            (spec.codebook_size + 1) * spec.num_quantizers, dim
        ).astype(np.float32)
        sd[f"logit_weights.{i}"] = rs.randn(
            spec.num_quantizers, spec.codebook_size + 1, dim
        ).astype(np.float32)
    rp_dim = dim // 2
    sd["transformer.rel_pos_bias.net.0.0.weight"] = rs.randn(rp_dim, 1).astype(np.float32)
    sd["transformer.rel_pos_bias.net.0.0.bias"] = rs.randn(rp_dim).astype(np.float32)
    for j in [1, 2]:
        sd[f"transformer.rel_pos_bias.net.{j}.0.weight"] = rs.randn(rp_dim, rp_dim).astype(np.float32)
        sd[f"transformer.rel_pos_bias.net.{j}.0.bias"] = rs.randn(rp_dim).astype(np.float32)
    sd["transformer.rel_pos_bias.net.3.weight"] = rs.randn(heads, rp_dim).astype(np.float32)
    sd["transformer.rel_pos_bias.net.3.bias"] = rs.randn(heads).astype(np.float32)
    inner = int(dim * 2 * 4 / 3)
    for l in range(depth):
        ap = f"transformer.layers.{l}.0."
        sd[ap + "norm.gamma"] = np.ones(dim, np.float32)
        sd[ap + "to_q.weight"] = rs.randn(heads * dim_head, dim).astype(np.float32)
        sd[ap + "to_kv.weight"] = rs.randn(2 * dim_head, dim).astype(np.float32)
        sd[ap + "q_scale"] = np.ones(dim_head, np.float32)
        sd[ap + "k_scale"] = np.ones(dim_head, np.float32)
        sd[ap + "to_out.0.weight"] = rs.randn(dim, heads * dim_head).astype(np.float32)
        fp = f"transformer.layers.{l}.2."
        sd[fp + "0.gamma"] = np.ones(dim, np.float32)
        sd[fp + "1.weight"] = rs.randn(inner * 2, dim).astype(np.float32)
        sd[fp + "2.ds_conv.weight"] = rs.randn(inner * 2, 1, 3).astype(np.float32)
        sd[fp + "4.gamma"] = np.ones(inner, np.float32)
        sd[fp + "6.weight"] = rs.randn(dim, inner).astype(np.float32)
    sd["transformer.norm.gamma"] = np.ones(dim, np.float32)
    return sd


def test_stage_transformer_import_structure():
    specs = (TokenSequenceSpec(16, 2), TokenSequenceSpec(16, 1))
    model = TokenConditionedTransformer(specs=specs, dim=32, depth=1, heads=2, dim_head=8)
    sd = make_reference_shaped_stage_sd(specs)
    params = it.import_stage_transformer(sd, model)

    # must match the shapes flax init produces
    ids = [jnp.zeros((1, 4), jnp.int32), jnp.zeros((1, 4), jnp.int32)]
    ref_params = model.init(jax.random.PRNGKey(0), ids)
    ref_shapes = jax.tree_util.tree_map(lambda x: x.shape, ref_params)
    got_shapes = jax.tree_util.tree_map(lambda x: np.asarray(x).shape, params)
    assert ref_shapes == got_shapes

    # imported weights land where expected and the model runs
    np.testing.assert_array_equal(
        params["params"]["embed_0"]["embedding"], sd["embeddings.0.weight"]
    )
    np.testing.assert_array_equal(
        params["params"]["transformer"]["attn_0"]["to_q"]["kernel"],
        sd["transformer.layers.0.0.to_q.weight"].T,
    )
    logits = model.apply(params, ids)
    assert logits[-1].shape == (1, 5, 17)
    assert np.all(np.isfinite(np.asarray(logits[-1])))


def test_rvq_import_from_vq_pytorch_layout():
    """vector_quantize_pytorch ResidualVQ state dict (both 2D and 3D codebook
    layouts) -> RVQState; nearest-code lookup agrees with direct argmin."""
    rs = np.random.RandomState(0)
    Q, K, D = 3, 8, 4
    embeds = rs.randn(Q, K, D).astype(np.float32)
    for three_d in [False, True]:
        sd = {}
        for q in range(Q):
            e = embeds[q][None] if three_d else embeds[q]
            sd[f"layers.{q}._codebook.embed"] = e
            sd[f"layers.{q}._codebook.cluster_size"] = np.ones((1, K)) if three_d else np.ones(K)
            sd[f"layers.{q}._codebook.embed_avg"] = e.copy()
        state = it.import_rvq(sd)
        assert state.codebooks.shape == (Q, K, D)
        np.testing.assert_allclose(np.asarray(state.codebooks), embeds, atol=1e-6)

        from open_musiclm_tpu.models.rvq import rvq_encode

        x = jnp.asarray(rs.randn(5, D).astype(np.float32))
        idx = rvq_encode(state, x)
        # first-stage index == plain nearest centroid
        d2 = ((np.asarray(x)[:, None, :] - embeds[0][None]) ** 2).sum(-1)
        np.testing.assert_array_equal(np.asarray(idx[:, 0]), d2.argmin(1))


def test_load_stage_orbax_roundtrip(tmp_path):
    """Trainer checkpoint -> load_stage restores identical params."""
    from open_musiclm_tpu.checkpoint import save_checkpoint
    from open_musiclm_tpu.load import load_stage_params

    specs = (TokenSequenceSpec(8, 1), TokenSequenceSpec(8, 1))
    model = TokenConditionedTransformer(specs=specs, dim=16, depth=1, heads=2, dim_head=8)
    ids = [jnp.zeros((1, 3), jnp.int32), jnp.zeros((1, 3), jnp.int32)]
    params = model.init(jax.random.PRNGKey(0), ids)

    # params-only checkpoint
    p1 = tmp_path / "stage.params.ckpt"
    save_checkpoint(str(p1), params)
    got = load_stage_params(str(p1), model)
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    # TrainState-style checkpoint ({"params": ..., "opt_state": ..., "step"})
    p2 = tmp_path / "stage.train.ckpt"
    save_checkpoint(str(p2), {"params": params, "step": np.int32(7)})
    got2 = load_stage_params(str(p2), model)
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(got2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
