"""Shared CLI plumbing for the scripts (reference scripts/train_utils.py)."""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))


def enable_compilation_cache():
    """Persistent XLA compile cache: repeat CLI runs skip cold compiles."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/omt_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def add_model_args(p: argparse.ArgumentParser):
    p.add_argument("--model_config", default=str(REPO_ROOT / "configs/model/musiclm_small.json"))
    p.add_argument("--semantic_path", default=None)
    p.add_argument("--coarse_path", default=None)
    p.add_argument("--fine_path", default=None)
    p.add_argument("--rvq_path", default=None)
    p.add_argument("--kmeans_path", default=None)
    p.add_argument("--clap_path", default=None, help="CLAP torch checkpoint bundle")
    p.add_argument("--hubert_path", default=None, help="MERT/HuBERT torch state dict")
    p.add_argument("--encodec_path", default=None, help="Encodec torch state dict")
    p.add_argument("--tokenizer_path", default=None, help="dir with vocab.json+merges.txt")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--bf16", action="store_true", help="bfloat16 compute")
    p.add_argument(
        "--int8", action="store_true",
        help="int8 fused-FF serving mode for the stage decoders (faster, "
        "approximate token parity)",
    )
    p.add_argument(
        "--flash_kv", default=None, choices=["bf16", "int8"],
        help="flash-decode KV cache mode (with --int8): early exit at the "
        "live cache length; 'int8' also keeps the cache int8 (fastest)",
    )
    p.add_argument(
        "--approx_topk", action="store_true",
        help="approx_max_k top-k cutoff in sampling (serving mode; can only "
        "widen the sampling pool)",
    )


def add_training_args(p: argparse.ArgumentParser):
    p.add_argument(
        "--training_config",
        default=str(REPO_ROOT / "configs/training/train_musiclm_fma.json"),
    )
    p.add_argument("--results_folder", default="./results")
    p.add_argument("--continue_from_dir", default=None)
    p.add_argument("--fine_tune_from", default=None)


def build_musiclm(args):
    enable_compilation_cache()
    import jax.numpy as jnp

    from open_musiclm_tpu.config import load_model_config
    from open_musiclm_tpu.load import create_musiclm_from_config

    mc = load_model_config(args.model_config)
    musiclm = create_musiclm_from_config(
        mc,
        semantic_path=args.semantic_path,
        coarse_path=args.coarse_path,
        fine_path=args.fine_path,
        rvq_path=args.rvq_path,
        kmeans_path=args.kmeans_path,
        clap_path=args.clap_path,
        hubert_path=args.hubert_path,
        encodec_path=args.encodec_path,
        tokenizer_path=args.tokenizer_path,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        seed=args.seed,
    )
    if getattr(args, "approx_topk", False):
        # read at jit-trace time by core/sampling.top_k_filter
        os.environ["OPEN_MUSICLM_APPROX_TOPK"] = "1"
    if getattr(args, "int8", False):
        import dataclasses

        fk = getattr(args, "flash_kv", None)
        musiclm = dataclasses.replace(
            musiclm,
            semantic_stage=dataclasses.replace(
                musiclm.semantic_stage, quantized=True, flash_kv=fk
            ),
            coarse_stage=dataclasses.replace(
                musiclm.coarse_stage, quantized=True, flash_kv=fk
            ),
            fine_stage=dataclasses.replace(
                musiclm.fine_stage, quantized=True, flash_kv=fk
            ),
        )
    return musiclm, mc
