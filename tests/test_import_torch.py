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


def test_encodec_import_from_package_layout():
    """Full-model key-name contract for the `encodec` pip package layout
    (VERDICT r1 weak #6): build a synthetic torch state dict — Sequential
    indices, weight-normed conv pairs (weight_g/weight_v), ConvTranspose
    layout, LSTM keys, RVQ codebooks — by INVERTING the converter from a
    tiny flax EncodecModel's params, then assert import_encodec round-trips
    to the original tree exactly."""
    import jax
    import jax.numpy as jnp

    from open_musiclm_tpu.import_torch import import_encodec
    from open_musiclm_tpu.models.encodec import EncodecModel

    model = EncodecModel(
        sample_rate=240, ratios=(4, 2), num_quantizers=3, codebook_size=16,
        dimension=8, n_filters=2,
    )
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 240)))
    p = jax.tree_util.tree_map(np.asarray, params)["params"]

    sd = {}

    def put_conv(node, prefix, weight_norm):
        # flax [k, in, out] -> torch [out, in, k]; optionally as g/v pair
        w = np.transpose(node["kernel"], (2, 1, 0))
        if weight_norm:
            g = np.sqrt((w ** 2).sum(axis=(1, 2), keepdims=True))
            sd[prefix + ".weight_g"] = g
            sd[prefix + ".weight_v"] = w * 3.0  # same direction, scaled
        else:
            sd[prefix + ".weight"] = w
        if "bias" in node:
            sd[prefix + ".bias"] = node["bias"]

    def put_convtr(node, prefix):
        # invert conv_transpose1d: flax [k, in, out] (flipped) -> torch [in, out, k]
        w = np.transpose(node["kernel"][::-1], (1, 2, 0))
        sd[prefix + ".weight"] = w
        if "bias" in node:
            sd[prefix + ".bias"] = node["bias"]

    def put_res(node, prefix):
        put_conv(node["block_conv1"]["conv"], prefix + "block.1.conv.conv", True)
        put_conv(node["block_conv2"]["conv"], prefix + "block.3.conv.conv", False)
        put_conv(node["shortcut"]["conv"], prefix + "shortcut.conv.conv", True)

    def put_lstm(node, prefix):
        for l in range(2):
            sd[prefix + f"lstm.weight_ih_l{l}"] = node[f"w_ih_{l}"]
            sd[prefix + f"lstm.weight_hh_l{l}"] = node[f"w_hh_{l}"]
            sd[prefix + f"lstm.bias_ih_l{l}"] = node[f"b_ih_{l}"]
            sd[prefix + f"lstm.bias_hh_l{l}"] = node[f"b_hh_{l}"]

    n_stages = 2
    enc = p["encoder"]
    put_conv(enc["conv_in"]["conv"], "encoder.model.0.conv.conv", True)
    for s in range(n_stages):
        put_res(enc[f"res_{s}_0"], f"encoder.model.{3 * s + 1}.")
        put_conv(enc[f"down_{s}"]["conv"], f"encoder.model.{3 * s + 3}.conv.conv", True)
    lstm_idx = 3 * n_stages + 1
    put_lstm(enc["lstm"], f"encoder.model.{lstm_idx}.")
    put_conv(enc["conv_out"]["conv"], f"encoder.model.{lstm_idx + 2}.conv.conv", False)

    dec = p["decoder"]
    put_conv(dec["conv_in"]["conv"], "decoder.model.0.conv.conv", True)
    put_lstm(dec["lstm"], "decoder.model.1.")
    for s in range(n_stages):
        put_convtr(dec[f"up_{s}"]["convtr"], f"decoder.model.{3 * s + 3}.convtr.convtr")
        put_res(dec[f"res_{s}_0"], f"decoder.model.{3 * s + 4}.")
    put_conv(dec["conv_out"]["conv"], f"decoder.model.{3 * n_stages + 2}.conv.conv", True)

    for q in range(model.num_quantizers):
        sd[f"quantizer.vq.layers.{q}._codebook.embed"] = p["codebooks"][q]

    got = import_encodec(sd, model)
    flat_got = jax.tree_util.tree_leaves_with_path(got["params"])
    flat_ref = {jax.tree_util.keystr(k): v
                for k, v in jax.tree_util.tree_leaves_with_path(p)}
    assert len(flat_got) == len(flat_ref)
    for k, v in flat_got:
        np.testing.assert_allclose(
            v, flat_ref[jax.tree_util.keystr(k)], atol=1e-6,
            err_msg=jax.tree_util.keystr(k),
        )

    # imported params drive the jittable decode path
    codes = np.random.default_rng(0).integers(0, 16, (2, 5, 3))
    wave = model.apply(
        {"params": got["params"]}, jnp.asarray(codes),
        method=EncodecModel.decode,
    )
    assert np.isfinite(np.asarray(wave)).all()


def test_clap_import_from_laion_bundle_layout():
    """Full-bundle key-name contract for laion_clap checkpoints (VERDICT r1
    weak #6): synthesize a 'module.'-prefixed state dict — audio_branch
    HTSAT (patch embed, swin blocks, qkv packing, rel-pos tables, bn0
    running stats), text_branch RoBERTa (split-head q/k/v/out), projection
    + transform MLPs, logit scales — by inverting the converter from a tiny
    flax CLAP's params, then assert import_clap round-trips exactly."""
    from tests.test_clap import TINY_AUDIO, TINY_TEXT

    from open_musiclm_tpu.models.clap.clap import CLAP

    model = CLAP(audio_cfg=TINY_AUDIO, text_cfg=TINY_TEXT)
    ids0 = jnp.zeros((1, 8), jnp.int32)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, TINY_AUDIO.clip_samples)),
        ids0,
        jnp.ones_like(ids0),
    )
    p = jax.tree_util.tree_map(np.asarray, variables["params"])
    bs = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])

    sd = {}

    def put_linear(node, key):
        sd[key + ".weight"] = node["kernel"].T
        if "bias" in node:
            sd[key + ".bias"] = node["bias"]

    def put_ln(node, key):
        sd[key + ".weight"] = node["scale"]
        sd[key + ".bias"] = node["bias"]

    def put_conv2d(node, key):
        sd[key + ".weight"] = np.transpose(node["kernel"], (3, 2, 0, 1))
        sd[key + ".bias"] = node["bias"]

    # ---- audio branch (HTSAT) ----
    a = p["audio_branch"]
    ab = "module.audio_branch."
    put_conv2d(a["patch_embed"], ab + "patch_embed.proj")
    put_ln(a["patch_norm"], ab + "patch_embed.norm")
    put_ln(a["norm"], ab + "norm")
    put_conv2d(a["tscam_conv"], ab + "tscam_conv")
    sd[ab + "bn0.weight"] = a["bn0"]["scale"]
    sd[ab + "bn0.bias"] = a["bn0"]["bias"]
    sd[ab + "bn0.running_mean"] = bs["audio_branch"]["bn0"]["mean"]
    sd[ab + "bn0.running_var"] = bs["audio_branch"]["bn0"]["var"]
    for si, depth in enumerate(TINY_AUDIO.depths):
        for bi in range(depth):
            blk = a[f"stage_{si}_block_{bi}"]
            bp = ab + f"layers.{si}.blocks.{bi}."
            put_ln(blk["norm1"], bp + "norm1")
            put_ln(blk["norm2"], bp + "norm2")
            sd[bp + "attn.qkv.weight"] = blk["attn"]["qkv"]["kernel"].T
            sd[bp + "attn.qkv.bias"] = blk["attn"]["qkv"]["bias"]
            put_linear(blk["attn"]["proj"], bp + "attn.proj")
            sd[bp + "attn.relative_position_bias_table"] = blk["attn"][
                "rel_pos_bias_table"
            ]
            put_linear(blk["mlp_fc1"], bp + "mlp.fc1")
            put_linear(blk["mlp_fc2"], bp + "mlp.fc2")
        if si < len(TINY_AUDIO.depths) - 1:
            mp = ab + f"layers.{si}.downsample."
            put_ln(a[f"merge_{si}"]["norm"], mp + "norm")
            sd[mp + "reduction.weight"] = a[f"merge_{si}"]["reduction"]["kernel"].T

    # ---- text branch (RoBERTa) ----
    t = p["text_branch"]
    tb = "module.text_branch."
    for name in ("word_embeddings", "position_embeddings", "token_type_embeddings"):
        sd[tb + f"embeddings.{name}.weight"] = t[name]["embedding"]
    put_ln(t["emb_norm"], tb + "embeddings.LayerNorm")
    put_linear(t["pooler"], tb + "pooler.dense")
    H = TINY_TEXT.num_attention_heads
    for i in range(TINY_TEXT.num_hidden_layers):
        lay = t[f"layer_{i}"]
        lp = tb + f"encoder.layer.{i}."
        att = lay["attention"]
        for fl, tk in (("query", "self.query"), ("key", "self.key"),
                       ("value", "self.value")):
            kern = att[fl]["kernel"]  # [in, h, d]
            sd[lp + f"attention.{tk}.weight"] = kern.reshape(
                kern.shape[0], -1
            ).T
            sd[lp + f"attention.{tk}.bias"] = att[fl]["bias"].reshape(-1)
        ok = att["out"]["kernel"]  # [h, d, out]
        sd[lp + "attention.output.dense.weight"] = ok.reshape(-1, ok.shape[-1]).T
        sd[lp + "attention.output.dense.bias"] = att["out"]["bias"]
        put_ln(lay["attn_norm"], lp + "attention.output.LayerNorm")
        put_linear(lay["intermediate"], lp + "intermediate.dense")
        put_linear(lay["output"], lp + "output.dense")
        put_ln(lay["ffn_norm"], lp + "output.LayerNorm")

    # ---- projections / transforms / scales ----
    for side in ("audio", "text"):
        proj = p[f"{side}_projection"]
        put_linear(proj["fc1"], f"module.{side}_projection.0")
        put_linear(proj["fc2"], f"module.{side}_projection.2")
        tr = p[f"{side}_transform"]
        put_linear(tr["fc0"], f"module.{side}_transform.sequential.0")
        put_linear(tr["fc1"], f"module.{side}_transform.sequential.3")
    sd["module.logit_scale_a"] = p["logit_scale_a"]
    sd["module.logit_scale_t"] = p["logit_scale_t"]

    got = it.import_clap(sd, TINY_AUDIO, TINY_TEXT)

    ref_flat = {jax.tree_util.keystr(k): v
                for k, v in jax.tree_util.tree_leaves_with_path(p)}
    got_flat = jax.tree_util.tree_leaves_with_path(got["params"])
    assert len(got_flat) == len(ref_flat)
    for k, v in got_flat:
        np.testing.assert_allclose(
            v, ref_flat[jax.tree_util.keystr(k)], atol=1e-6,
            err_msg=jax.tree_util.keystr(k),
        )
    np.testing.assert_allclose(
        got["batch_stats"]["audio_branch"]["bn0"]["mean"],
        bs["audio_branch"]["bn0"]["mean"],
    )
