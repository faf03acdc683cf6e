"""Load the PyTorch reference (/root/reference) for golden-tensor tests.

Test-only infrastructure: the reference is imported as an oracle, never
vendored. Handles two offline obstacles:
  * ``apply_chunking_to_forward`` moved to transformers.pytorch_utils in
    modern transformers — shimmed back into modeling_utils;
  * every reference cell calls ``BertConfig.from_pretrained(name)`` /
    ``CLIPConfig.from_pretrained(name)`` (ref: models/Cells.py:136-139) —
    we write tiny local config dirs and pass their paths as bert_name /
    vit_name so no hub access happens.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Tuple

REFERENCE_PATH = "/root/reference"

# NOTE: hidden size must be 768 — the reference hardcodes nn.Linear(768,768)
# inside GLAC/CRCMC/GESC (ref: models/Cells.py:140-143,193-195,229-234), so
# the torch oracle cannot run at any other width. Depth/vocab/images stay tiny.
TINY_BERT_CONFIG = {
    "model_type": "bert",
    "vocab_size": 128,
    "hidden_size": 768,
    "num_hidden_layers": 2,
    "num_attention_heads": 12,
    "intermediate_size": 256,
    "hidden_act": "gelu",
    "hidden_dropout_prob": 0.1,
    "attention_probs_dropout_prob": 0.1,
    "max_position_embeddings": 64,
    "type_vocab_size": 2,
    "layer_norm_eps": 1e-12,
    "pad_token_id": 0,
}

TINY_CLIP_CONFIG = {
    "model_type": "clip",
    "projection_dim": 768,
    "vision_config": {
        "hidden_size": 768,
        "num_hidden_layers": 2,
        "num_attention_heads": 12,
        "intermediate_size": 256,
        "image_size": 32,
        "patch_size": 16,
        "num_channels": 3,
        "hidden_act": "quick_gelu",
        "layer_norm_eps": 1e-5,
        "attention_dropout": 0.0,
    },
    "text_config": {"vocab_size": 128, "hidden_size": 768},
}


def _shim_transformers() -> None:
    import transformers.modeling_utils as mu
    if not hasattr(mu, "apply_chunking_to_forward"):
        from transformers.pytorch_utils import apply_chunking_to_forward
        mu.apply_chunking_to_forward = apply_chunking_to_forward


def write_tiny_config_dirs(root: str) -> Tuple[str, str]:
    bert_dir = os.path.join(root, "tiny-bert")
    clip_dir = os.path.join(root, "tiny-clip")
    os.makedirs(bert_dir, exist_ok=True)
    os.makedirs(clip_dir, exist_ok=True)
    with open(os.path.join(bert_dir, "config.json"), "w") as f:
        json.dump(TINY_BERT_CONFIG, f)
    with open(os.path.join(clip_dir, "config.json"), "w") as f:
        json.dump(TINY_CLIP_CONFIG, f)
    return bert_dir, clip_dir


def make_ref_args(bert_dir: str, clip_dir: str, **overrides) -> argparse.Namespace:
    """The argparse namespace the reference threads everywhere
    (ref: run.py:39-84), tiny-sized."""
    ns = argparse.Namespace(
        bert_name=bert_dir,
        vit_name=clip_dir,
        embed_size=768,
        num_head_IMRC=16,
        hid_IMRC=128,
        hid_router=32,
        raw_feature_norm_CMRC="clipped_l2norm",
        lambda_softmax_CMRC=4.0,
        alpha=0.0,
        margin=0.1,
        beta=0.1,
        mild_margin=0.7,
        hetero=0.9,
        homo=0.9,
        DR_step=3,
        weight_js_1=0.1,
        weight_js_2=0.1,
        weight_diff=0.1,
        max_seq=16,
        device="cpu",
    )
    for k, v in overrides.items():
        setattr(ns, k, v)
    return ns


def make_flax_config(dropout: float = 0.1, **overrides):
    """The d2r_tpu config matching make_ref_args/TINY_*_CONFIG exactly.

    ``dropout`` sets the text tower's hidden/attention dropout probs (the
    training-parity test uses 0.0 on both stacks so trajectories are
    deterministic). Distinct preset names per dropout value keep the
    registry entries from aliasing across test modules. ``overrides`` go
    straight into D2RConfig (lr, warmup_ratio, optimizer_impl, ...).
    """
    from d2r_tpu.config import (
        D2RConfig,
        TextEncoderConfig,
        VisionEncoderConfig,
        register_text_preset,
        register_vision_preset,
    )

    suffix = "" if dropout == 0.1 else f"-d{dropout:g}"
    register_text_preset(f"parity-bert{suffix}", lambda: TextEncoderConfig(
        vocab_size=128, hidden_size=768, num_hidden_layers=2,
        num_attention_heads=12, intermediate_size=256,
        max_position_embeddings=64,
        hidden_dropout_prob=dropout, attention_probs_dropout_prob=dropout))
    register_vision_preset(f"parity-vit{suffix}", lambda: VisionEncoderConfig(
        hidden_size=768, num_hidden_layers=2, num_attention_heads=12,
        intermediate_size=256, image_size=32, patch_size=16))
    kwargs = dict(
        bert_name=f"parity-bert{suffix}", vit_name=f"parity-vit{suffix}",
        embed_size=768, num_head_IMRC=16, hid_IMRC=128, hid_router=32,
        DR_step=3, max_seq=16, batch_size=4, compute_dtype="float32",
        use_pallas=False)
    kwargs.update(overrides)
    return D2RConfig(**kwargs)


def import_reference():
    """sys.path-insert the reference and import its model modules."""
    _shim_transformers()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import models.Cells as ref_cells
    import models.DynamicInteraction as ref_di
    import models.InteractionModule as ref_im
    import models.Refinement as ref_refine
    import models.Router as ref_router
    import models.SelfAttention as ref_sa
    import models.XModules as ref_xm
    import models.modeling_unimo as ref_unimo
    import models.unimo_model as ref_model
    return {
        "cells": ref_cells, "di": ref_di, "im": ref_im,
        "refine": ref_refine, "router": ref_router, "sa": ref_sa,
        "xm": ref_xm, "unimo": ref_unimo, "model": ref_model,
    }
