"""PyTorch -> JAX weight importers.

One-time converters from the reference ecosystem's checkpoints into this
framework's parameter pytrees, covering the 5 pretrained artifacts the
inference assembly needs (reference config.py:427-454):
  * stage transformer ``.pt`` state dicts (semantic/coarse/fine)
  * Encodec 24 kHz (``encodec`` pip package layout, weight_norm folded)
  * HuBERT/MERT (HF ``transformers.HubertModel``)
  * CLAP (HTSAT + RoBERTa + projections; laion_clap checkpoint layout)
  * ResidualVQ (``vector_quantize_pytorch``) and sklearn k-means (joblib)

All functions take a flat ``{name: np.ndarray}`` state dict (use
``load_torch_state_dict`` for ``.pt`` files) and return flax param pytrees.
Torch conventions handled here: Linear weights are [out, in] (transposed to
flax [in, out]); Conv1d [out, in/groups, k] -> flax [k, in/groups, out];
ConvTranspose1d [in, out, k] -> flax [k, out, in] with flipped taps
(lax.conv_transpose flips vs torch's gradient-of-conv); weight_norm
(weight_g, weight_v) is folded to a plain weight.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

Array = np.ndarray
StateDict = Dict[str, Array]


def load_torch_state_dict(path: str) -> StateDict:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    out = {}
    for k, v in obj.items():
        if hasattr(v, "numpy"):
            out[k] = v.detach().cpu().numpy()
    return out


def strip_prefix(sd: StateDict, prefix: str) -> StateDict:
    return {
        k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)
    }


def fold_weight_norm(g: Array, v: Array) -> Array:
    """weight = g * v / ||v||, norm over all dims except 0 (torch default)."""
    axes = tuple(range(1, v.ndim))
    norm = np.sqrt(np.sum(v ** 2, axis=axes, keepdims=True))
    return g * v / np.maximum(norm, 1e-12)


def _maybe_fold(sd: StateDict, key: str) -> Array:
    """Return the (possibly weight-normed) conv weight at `key`."""
    if key + ".weight" in sd:
        return sd[key + ".weight"]
    return fold_weight_norm(sd[key + ".weight_g"], sd[key + ".weight_v"])


def linear(sd: StateDict, key: str, bias: bool = True) -> Dict[str, Array]:
    out = {"kernel": sd[key + ".weight"].T}
    if bias and key + ".bias" in sd:
        out["bias"] = sd[key + ".bias"]
    return out


def layer_norm(sd: StateDict, key: str) -> Dict[str, Array]:
    return {"scale": sd[key + ".weight"], "bias": sd[key + ".bias"]}


def conv1d(w: Array, bias: Optional[Array] = None) -> Dict[str, Array]:
    """torch [out, in/groups, k] -> flax [k, in/groups, out]."""
    out = {"kernel": np.transpose(w, (2, 1, 0))}
    if bias is not None:
        out["bias"] = bias
    return out


def conv2d(w: Array, bias: Optional[Array] = None) -> Dict[str, Array]:
    """torch [out, in, kh, kw] -> flax [kh, kw, in, out]."""
    out = {"kernel": np.transpose(w, (2, 3, 1, 0))}
    if bias is not None:
        out["bias"] = bias
    return out


def conv_transpose1d(w: Array, bias: Optional[Array] = None) -> Dict[str, Array]:
    """torch ConvTranspose1d [in, out, k] -> flax ConvTranspose [k, in, out]
    with flipped taps (lax.conv_transpose does not flip; torch's
    transposed conv corresponds to a flipped kernel)."""
    out = {"kernel": np.transpose(w, (2, 0, 1))[::-1].copy()}
    if bias is not None:
        out["bias"] = bias
    return out


def mha(sd: StateDict, prefix: str, num_heads: int, *, q="q_proj", k="k_proj",
        v="v_proj", o="out_proj") -> Dict[str, Dict[str, Array]]:
    """Separate q/k/v/out projections -> flax MultiHeadDotProductAttention."""
    def split_heads_w(w):  # [out, in] -> [in, h, d]
        out_dim, in_dim = w.shape
        d = out_dim // num_heads
        return w.T.reshape(in_dim, num_heads, d)

    def split_heads_b(b):
        return b.reshape(num_heads, -1)

    ow = sd[prefix + o + ".weight"]  # [out, in] where in = h*d
    return {
        "query": {"kernel": split_heads_w(sd[prefix + q + ".weight"]),
                  "bias": split_heads_b(sd[prefix + q + ".bias"])},
        "key": {"kernel": split_heads_w(sd[prefix + k + ".weight"]),
                "bias": split_heads_b(sd[prefix + k + ".bias"])},
        "value": {"kernel": split_heads_w(sd[prefix + v + ".weight"]),
                  "bias": split_heads_b(sd[prefix + v + ".bias"])},
        "out": {"kernel": ow.T.reshape(num_heads, -1, ow.shape[0]),
                "bias": sd[prefix + o + ".bias"]},
    }


# ---------------------------------------------------------------------------
# stage transformers (reference TokenConditionedTransformer state dicts)
# ---------------------------------------------------------------------------


def import_stage_transformer(sd: StateDict, model) -> dict:
    """Map a reference stage-transformer ``.pt`` state dict onto
    models/token_cond.TokenConditionedTransformer params.

    Reference layout (open_musiclm.py:66-94, transformer.py):
      start_tokens.{i}, embeddings.{i}.weight, logit_weights.{i},
      transformer.rel_pos_bias.net.{0..L-1}.0.* / net.{L}.{weight,bias},
      transformer.layers.{l}.0.* (attention), .2.* (conv-FF),
      transformer.norm.gamma
    """
    n_seq = len(model.specs)
    params: dict = {}
    params["start_tokens"] = np.stack(
        [sd[f"start_tokens.{i}"] for i in range(n_seq)]
    )
    for i in range(n_seq):
        params[f"embed_{i}"] = {"embedding": sd[f"embeddings.{i}.weight"]}
        params[f"logits_{i}"] = sd[f"logit_weights.{i}"]
        if model.use_absolute_position_embeddings:
            params[f"abs_pos_embed_{i}"] = {
                "embedding": sd[f"absolute_position_embeddings.{i}.weight"]
            }

    t: dict = {}
    # relative position bias MLP: net.0 = Seq(Linear(1,d),SiLU),
    # net.1..net.L-1 = Seq(Linear(d,d),SiLU), net.L = Linear(d,heads)
    if model.relative_position_bias_type == "continuous":
        mids = sorted(
            {int(k.split(".")[3]) for k in sd if k.startswith("transformer.rel_pos_bias.net.")}
        )
        last = max(mids)
        rp = {"in_layer": linear(sd, "transformer.rel_pos_bias.net.0.0")}
        for j in range(1, last):
            rp[f"mid_layer_{j-1}"] = linear(sd, f"transformer.rel_pos_bias.net.{j}.0")
        rp["out_layer"] = linear(sd, f"transformer.rel_pos_bias.net.{last}")
        t["rel_pos_bias"] = rp
    elif model.relative_position_bias_type == "t5":
        t["rel_pos_bias"] = {
            "embedding": sd["transformer.rel_pos_bias.relative_attention_bias.weight"]
        }

    for l in range(model.depth):
        ap = f"transformer.layers.{l}.0."
        t[f"attn_{l}"] = {
            "norm": {"gamma": sd[ap + "norm.gamma"]},
            "to_q": {"kernel": sd[ap + "to_q.weight"].T},
            "to_kv": {"kernel": sd[ap + "to_kv.weight"].T},
            "q_scale": sd[ap + "q_scale"],
            "k_scale": sd[ap + "k_scale"],
            "to_out": {"kernel": sd[ap + "to_out.0.weight"].T},
        }
        fp = f"transformer.layers.{l}.2."
        if model.use_conv_ff:
            t[f"ff_{l}"] = {
                "norm_in": {"gamma": sd[fp + "0.gamma"]},
                "proj_in": {"kernel": sd[fp + "1.weight"].T},
                # CausalDSConv: torch [C, 1, 3] -> tap-major [3, C]
                "conv_w": sd[fp + "2.ds_conv.weight"][:, 0, :].T,
                "norm_mid": {"gamma": sd[fp + "4.gamma"]},
                "proj_out": {"kernel": sd[fp + "6.weight"].T},
            }
        else:
            t[f"ff_{l}"] = {
                "norm_in": {"gamma": sd[fp + "0.gamma"]},
                "proj_in": {"kernel": sd[fp + "1.weight"].T},
                "norm_mid": {"gamma": sd[fp + "3.gamma"]},
                "proj_out": {"kernel": sd[fp + "5.weight"].T},
            }
    t["final_norm"] = {"gamma": sd["transformer.norm.gamma"]}
    params["transformer"] = t
    return {"params": params}


# ---------------------------------------------------------------------------
# LayerNorm gamma-only modules use {"gamma": ...}; handled above.
# Encodec (encodec pip package layout)
# ---------------------------------------------------------------------------


def _seanet_resblock(sd: StateDict, prefix: str) -> dict:
    return {
        "block_conv1": {"conv": conv1d(_maybe_fold(sd, prefix + "block.1.conv.conv"),
                                        sd.get(prefix + "block.1.conv.conv.bias"))},
        "block_conv2": {"conv": conv1d(_maybe_fold(sd, prefix + "block.3.conv.conv"),
                                        sd.get(prefix + "block.3.conv.conv.bias"))},
        "shortcut": {"conv": conv1d(_maybe_fold(sd, prefix + "shortcut.conv.conv"),
                                     sd.get(prefix + "shortcut.conv.conv.bias"))},
    }


def _slstm(sd: StateDict, prefix: str, num_layers: int = 2) -> dict:
    out = {}
    for l in range(num_layers):
        out[f"w_ih_{l}"] = sd[prefix + f"lstm.weight_ih_l{l}"]
        out[f"w_hh_{l}"] = sd[prefix + f"lstm.weight_hh_l{l}"]
        out[f"b_ih_{l}"] = sd[prefix + f"lstm.bias_ih_l{l}"]
        out[f"b_hh_{l}"] = sd[prefix + f"lstm.bias_hh_l{l}"]
    return out


def import_encodec(sd: StateDict, model) -> dict:
    """encodec_model_24khz state dict -> models/encodec.EncodecModel params.

    Encoder Sequential indices: 0 conv_in, then per stage s: (3s+1) res,
    (3s+3) downsample conv, 13 lstm, 15 conv_out. Decoder: 0 conv_in,
    1 lstm, per stage: (3s+3) convtr, (3s+4) res, 15 conv_out.
    """
    n_stages = len(model.ratios)
    enc: dict = {
        "conv_in": {"conv": conv1d(_maybe_fold(sd, "encoder.model.0.conv.conv"),
                                    sd.get("encoder.model.0.conv.conv.bias"))}
    }
    for s in range(n_stages):
        enc[f"res_{s}_0"] = _seanet_resblock(sd, f"encoder.model.{3 * s + 1}.")
        enc[f"down_{s}"] = {
            "conv": conv1d(_maybe_fold(sd, f"encoder.model.{3 * s + 3}.conv.conv"),
                           sd.get(f"encoder.model.{3 * s + 3}.conv.conv.bias"))
        }
    lstm_idx = 3 * n_stages + 1
    enc["lstm"] = _slstm(sd, f"encoder.model.{lstm_idx}.")
    enc["conv_out"] = {
        "conv": conv1d(_maybe_fold(sd, f"encoder.model.{lstm_idx + 2}.conv.conv"),
                       sd.get(f"encoder.model.{lstm_idx + 2}.conv.conv.bias"))
    }

    dec: dict = {
        "conv_in": {"conv": conv1d(_maybe_fold(sd, "decoder.model.0.conv.conv"),
                                    sd.get("decoder.model.0.conv.conv.bias"))},
        "lstm": _slstm(sd, "decoder.model.1."),
    }
    for s in range(n_stages):
        dec[f"up_{s}"] = {
            "convtr": conv_transpose1d(
                _maybe_fold(sd, f"decoder.model.{3 * s + 3}.convtr.convtr"),
                sd.get(f"decoder.model.{3 * s + 3}.convtr.convtr.bias"),
            )
        }
        dec[f"res_{s}_0"] = _seanet_resblock(sd, f"decoder.model.{3 * s + 4}.")
    out_idx = 3 * n_stages + 2
    dec["conv_out"] = {
        "conv": conv1d(_maybe_fold(sd, f"decoder.model.{out_idx}.conv.conv"),
                       sd.get(f"decoder.model.{out_idx}.conv.conv.bias"))
    }

    codebooks = np.stack(
        [sd[f"quantizer.vq.layers.{q}._codebook.embed"] for q in range(model.num_quantizers)]
    )
    return {"params": {"encoder": enc, "decoder": dec, "codebooks": codebooks}}


# ---------------------------------------------------------------------------
# HuBERT (transformers.HubertModel)
# ---------------------------------------------------------------------------


def import_hubert(sd: StateDict, cfg) -> dict:
    fe: dict = {}
    for i in range(len(cfg.conv_dim)):
        fe[f"conv_{i}"] = conv1d(sd[f"feature_extractor.conv_layers.{i}.conv.weight"],
                                 sd.get(f"feature_extractor.conv_layers.{i}.conv.bias"))
        if cfg.feat_extract_norm == "group" and i == 0:
            fe["group_norm"] = {
                "scale": sd["feature_extractor.conv_layers.0.layer_norm.weight"],
                "bias": sd["feature_extractor.conv_layers.0.layer_norm.bias"],
            }
        elif cfg.feat_extract_norm == "layer":
            fe[f"layer_norm_{i}"] = layer_norm(
                sd, f"feature_extractor.conv_layers.{i}.layer_norm"
            )

    # pos_conv uses weight_norm with dim=2 (norm over out/in dims, per-tap g)
    if "encoder.pos_conv_embed.conv.weight_g" in sd:
        g = sd["encoder.pos_conv_embed.conv.weight_g"]
        v = sd["encoder.pos_conv_embed.conv.weight_v"]
    else:  # transformers >= 4.30 parametrized weight_norm
        g = sd["encoder.pos_conv_embed.conv.parametrizations.weight.original0"]
        v = sd["encoder.pos_conv_embed.conv.parametrizations.weight.original1"]
    norm = np.sqrt(np.sum(v ** 2, axis=(0, 1), keepdims=True))
    pos_w = g * v / np.maximum(norm, 1e-12)

    params: dict = {
        "feature_encoder": fe,
        "fp_norm": layer_norm(sd, "feature_projection.layer_norm"),
        "fp_proj": linear(sd, "feature_projection.projection"),
        "pos_conv": {"conv": conv1d(pos_w, sd["encoder.pos_conv_embed.conv.bias"])},
        "enc_norm": layer_norm(sd, "encoder.layer_norm"),
    }
    for i in range(cfg.num_hidden_layers):
        p = f"encoder.layers.{i}."
        params[f"layer_{i}"] = {
            "attention": mha(sd, p + "attention.", cfg.num_attention_heads),
            "layer_norm": layer_norm(sd, p + "layer_norm"),
            "ff_intermediate": linear(sd, p + "feed_forward.intermediate_dense"),
            "ff_output": linear(sd, p + "feed_forward.output_dense"),
            "final_layer_norm": layer_norm(sd, p + "final_layer_norm"),
        }
    return {"params": params}


# ---------------------------------------------------------------------------
# RoBERTa (transformers.RobertaModel)
# ---------------------------------------------------------------------------


def import_roberta(sd: StateDict, cfg) -> dict:
    params: dict = {
        "word_embeddings": {"embedding": sd["embeddings.word_embeddings.weight"]},
        "position_embeddings": {"embedding": sd["embeddings.position_embeddings.weight"]},
        "token_type_embeddings": {"embedding": sd["embeddings.token_type_embeddings.weight"]},
        "emb_norm": layer_norm(sd, "embeddings.LayerNorm"),
        "pooler": linear(sd, "pooler.dense"),
    }
    for i in range(cfg.num_hidden_layers):
        p = f"encoder.layer.{i}."
        params[f"layer_{i}"] = {
            "attention": mha(
                sd, p + "attention.", cfg.num_attention_heads,
                q="self.query", k="self.key", v="self.value", o="output.dense",
            ),
            "attn_norm": layer_norm(sd, p + "attention.output.LayerNorm"),
            "intermediate": linear(sd, p + "intermediate.dense"),
            "output": linear(sd, p + "output.dense"),
            "ffn_norm": layer_norm(sd, p + "output.LayerNorm"),
        }
    return {"params": params}


# ---------------------------------------------------------------------------
# HTSAT + CLAP bundle (laion_clap checkpoint)
# ---------------------------------------------------------------------------


def import_htsat(sd: StateDict, cfg) -> dict:
    """HTSAT tower state dict (audio_branch.* already stripped)."""
    params: dict = {
        "patch_embed": conv2d(sd["patch_embed.proj.weight"], sd["patch_embed.proj.bias"]),
        "patch_norm": layer_norm(sd, "patch_embed.norm"),
        "norm": layer_norm(sd, "norm"),
        "tscam_conv": conv2d(sd["tscam_conv.weight"], sd["tscam_conv.bias"]),
        "bn0": {
            "scale": sd["bn0.weight"],
            "bias": sd["bn0.bias"],
        },
    }
    bn_stats = {
        "bn0": {
            "mean": sd["bn0.running_mean"],
            "var": sd["bn0.running_var"],
        }
    }
    for si, depth in enumerate(cfg.depths):
        for bi in range(depth):
            p = f"layers.{si}.blocks.{bi}."
            qkv_w = sd[p + "attn.qkv.weight"]  # [3C, C]
            params[f"stage_{si}_block_{bi}"] = {
                "norm1": layer_norm(sd, p + "norm1"),
                "attn": {
                    "qkv": {"kernel": qkv_w.T, "bias": sd[p + "attn.qkv.bias"]},
                    "proj": linear(sd, p + "attn.proj"),
                    "rel_pos_bias_table": sd[p + "attn.relative_position_bias_table"],
                },
                "norm2": layer_norm(sd, p + "norm2"),
                "mlp_fc1": linear(sd, p + "mlp.fc1"),
                "mlp_fc2": linear(sd, p + "mlp.fc2"),
            }
        if si < len(cfg.depths) - 1:
            p = f"layers.{si}.downsample."
            params[f"merge_{si}"] = {
                "norm": layer_norm(sd, p + "norm"),
                "reduction": {"kernel": sd[p + "reduction.weight"].T},
            }
    return {"params": params, "batch_stats": bn_stats}


def import_pann(sd: StateDict, model) -> dict:
    """PANN tower state dict (reference pann_model.py Cnn14/Cnn10/Cnn6;
    audio_branch.* already stripped) -> models/clap/pann.PANN variables."""

    def bn(prefix):
        return (
            {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]},
            {"mean": sd[prefix + ".running_mean"], "var": sd[prefix + ".running_var"]},
        )

    bn0_p, bn0_s = bn("bn0")
    params: dict = {
        "bn0": bn0_p,
        "fc1": linear(sd, "fc1"),
        "fc_audioset": linear(sd, "fc_audioset"),
    }
    stats: dict = {"bn0": bn0_s}
    n_convs = 1 if model.arch == "Cnn6" else 2
    for i in range(len(model.channels)):
        blk_p, blk_s = {}, {}
        for j in range(1, n_convs + 1):
            p = f"conv_block{i + 1}.conv{j}.weight"
            blk_p[f"conv{j}"] = conv2d(sd[p])
            bnp, bns = bn(f"conv_block{i + 1}.bn{j}")
            blk_p[f"bn{j}"] = bnp
            blk_s[f"bn{j}"] = bns
        params[f"conv_block{i + 1}"] = blk_p
        stats[f"conv_block{i + 1}"] = blk_s
    return {"params": params, "batch_stats": stats}


def _projection(sd: StateDict, prefix: str) -> dict:
    return {
        "fc1": linear(sd, prefix + "0"),
        "fc2": linear(sd, prefix + "2"),
    }


def import_clap(sd: StateDict, audio_cfg, text_cfg) -> dict:
    """Full CLAP checkpoint -> models/clap/clap.CLAP params.

    Accepts laion_clap checkpoints (keys optionally prefixed 'module.').
    """
    if any(k.startswith("module.") for k in sd):
        sd = strip_prefix(sd, "module.")

    audio = import_htsat(strip_prefix(sd, "audio_branch."), audio_cfg)
    text = import_roberta(strip_prefix(sd, "text_branch."), text_cfg)

    def mlp_layers(prefix):
        return {
            "fc0": linear(sd, prefix + "sequential.0"),
            "fc1": linear(sd, prefix + "sequential.3"),
        }

    params = {
        "audio_branch": audio["params"],
        "text_branch": text["params"],
        "audio_projection": _projection(sd, "audio_projection."),
        "text_projection": _projection(sd, "text_projection."),
        "audio_transform": mlp_layers("audio_transform."),
        "text_transform": mlp_layers("text_transform."),
        "logit_scale_a": sd["logit_scale_a"],
        "logit_scale_t": sd["logit_scale_t"],
    }
    return {"params": params, "batch_stats": {"audio_branch": audio["batch_stats"]}}


# ---------------------------------------------------------------------------
# RVQ + k-means
# ---------------------------------------------------------------------------


def import_rvq(sd: StateDict):
    """vector_quantize_pytorch ResidualVQ state dict -> RVQState
    (clap_quantized.py:38-46; saved raw at trainer.py:729-732)."""
    import jax.numpy as jnp

    from .models.rvq import RVQState

    qs = sorted(
        {int(k.split(".")[1]) for k in sd if k.startswith("layers.") and "._codebook.embed" in k}
    )
    embeds, sizes, avgs = [], [], []
    for q in qs:
        e = sd[f"layers.{q}._codebook.embed"]
        if e.ndim == 3:  # newer versions: [heads(1), K, D]
            e = e[0]
        embeds.append(e)
        cs = sd.get(f"layers.{q}._codebook.cluster_size", np.ones(e.shape[0]))
        if cs.ndim == 2:
            cs = cs[0]
        sizes.append(cs)
        ea = sd.get(f"layers.{q}._codebook.embed_avg", e)
        if ea.ndim == 3:
            ea = ea[0]
        avgs.append(ea)
    return RVQState(
        codebooks=jnp.asarray(np.stack(embeds)),
        cluster_size=jnp.asarray(np.stack(sizes)),
        embed_avg=jnp.asarray(np.stack(avgs)),
        initted=jnp.array(True),
    )


def import_kmeans_joblib(path: str) -> np.ndarray:
    """sklearn MiniBatchKMeans joblib dump -> [K, D] centroids
    (hf_hubert_kmeans.py:147,156)."""
    import joblib

    km = joblib.load(path)
    return np.asarray(km.cluster_centers_, dtype=np.float32)
