"""Pretrained-weight conversion: HF torch state dicts -> flax param trees.

Replaces the reference's substring key surgery (renaming 'vision_'/'text_'
prefixes and asserting 100% key coverage, ref: modules/train.py:92-111).
Here the mapping is explicit and the coverage assertion is kept: every
source key must be either converted or on the known-unused list. The
reference even instantiates dummy modules (vision_post_layernorm at
ref: modeling_unimo.py:743, text_pooler at :784) purely so its coverage
assert passes — we instead whitelist those keys.

Inputs are torch ``state_dict``s loaded from local files (``bert.pt`` /
``clip_vit.pt`` saved via ``torch.save(model.state_dict(), ...)``) or local
HF checkpoint dirs; no hub access is ever attempted.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Set, Tuple

import numpy as np

# Keys in the source dicts that the live model never consumes.
# position_ids / token_type_ids are deterministic registered buffers that
# older transformers versions persist in state_dict; they carry no weights.
_CLIP_UNUSED_PREFIXES = ("post_layernorm.",)
_BERT_UNUSED_PREFIXES = ("pooler.", "embeddings.position_ids",
                         "embeddings.token_type_ids")


def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def _set_in(tree: Dict[str, Any], path: Tuple[str, ...], value: np.ndarray,
            template: Dict[str, Any]) -> None:
    node, tnode = tree, template
    for p in path[:-1]:
        node = node.setdefault(p, {})
        tnode = tnode[p]
    expect = np.asarray(tnode[path[-1]])
    if expect.shape != value.shape:
        raise ValueError(f"shape mismatch at {'/'.join(path)}: "
                         f"{value.shape} vs template {expect.shape}")
    node[path[-1]] = value.astype(expect.dtype)


def _linear(dst: Tuple[str, ...], src: str):
    """torch Linear (out,in) -> flax kernel (in,out)."""
    return [
        (dst + ("kernel",), src + ".weight", lambda w: _np(w).T),
        (dst + ("bias",), src + ".bias", _np),
    ]


def _fused_qkv(dst: Tuple[str, ...], q: str, k: str, v: str):
    """Three torch Linears -> the fused head-aligned (in, 3, h) qkv kernel
    (models/layers.py QKVDense)."""
    return [
        (dst + ("kernel",), (q + ".weight", k + ".weight", v + ".weight"),
         lambda qw, kw, vw: np.stack(
             [_np(qw).T, _np(kw).T, _np(vw).T], axis=1)),
        (dst + ("bias",), (q + ".bias", k + ".bias", v + ".bias"),
         lambda qb, kb, vb: np.stack([_np(qb), _np(kb), _np(vb)])),
    ]


def _layernorm(dst: Tuple[str, ...], src: str):
    return [
        (dst + ("scale",), src + ".weight", _np),
        (dst + ("bias",), src + ".bias", _np),
    ]


def bert_mapping(num_layers: int):
    """HF BertModel.state_dict() -> our text-tower subtree."""
    m = []
    emb = ("text_embeddings",)
    m += [
        (emb + ("word_embeddings", "embedding"), "embeddings.word_embeddings.weight", _np),
        (emb + ("position_embeddings", "embedding"), "embeddings.position_embeddings.weight", _np),
        (emb + ("token_type_embeddings", "embedding"), "embeddings.token_type_embeddings.weight", _np),
    ]
    m += _layernorm(emb + ("LayerNorm",), "embeddings.LayerNorm")
    for i in range(num_layers):
        dst = ("encoder_text_layers", f"layer_{i}")
        src = f"encoder.layer.{i}"
        m += _fused_qkv(dst + ("attention_self", "qkv"),
                        src + ".attention.self.query",
                        src + ".attention.self.key",
                        src + ".attention.self.value")
        m += _linear(dst + ("attention_output", "dense"), src + ".attention.output.dense")
        m += _layernorm(dst + ("attention_output", "LayerNorm"),
                        src + ".attention.output.LayerNorm")
        m += _linear(dst + ("intermediate_dense",), src + ".intermediate.dense")
        m += _linear(dst + ("output_dense",), src + ".output.dense")
        m += _layernorm(dst + ("output_LayerNorm",), src + ".output.LayerNorm")
    return m


def clip_vision_mapping(num_layers: int):
    """HF CLIPModel.vision_model.state_dict() -> our vision-tower subtree."""
    m = [
        (("vision_embeddings", "class_embedding"), "embeddings.class_embedding", _np),
        (("vision_embeddings", "patch_embedding", "kernel"),
         "embeddings.patch_embedding.weight",
         # torch conv (out, in, kh, kw) -> flax (kh, kw, in, out)
         lambda w: _np(w).transpose(2, 3, 1, 0)),
        (("vision_embeddings", "position_embedding", "embedding"),
         "embeddings.position_embedding.weight", _np),
    ]
    # HF spells it 'pre_layrnorm'
    m += _layernorm(("vision_pre_layernorm",), "pre_layrnorm")
    for i in range(num_layers):
        dst = ("encoder_vision_layers", f"layer_{i}")
        src = f"encoder.layers.{i}"
        m += _fused_qkv(dst + ("self_attn", "qkv"),
                        f"{src}.self_attn.q_proj",
                        f"{src}.self_attn.k_proj",
                        f"{src}.self_attn.v_proj")
        m += _linear(dst + ("self_attn", "out_proj"), f"{src}.self_attn.out_proj")
        m += _layernorm(dst + ("layer_norm1",), src + ".layer_norm1")
        m += _layernorm(dst + ("layer_norm2",), src + ".layer_norm2")
        m += _linear(dst + ("mlp_fc1",), src + ".mlp.fc1")
        m += _linear(dst + ("mlp_fc2",), src + ".mlp.fc2")
    return m


def _apply_mapping(model_tree: Dict[str, Any], template: Dict[str, Any],
                   mapping, sd: Dict[str, Any], unused_prefixes) -> Set[str]:
    consumed: Set[str] = set()
    for dst, src, fn in mapping:
        srcs = src if isinstance(src, tuple) else (src,)
        for s in srcs:
            if s not in sd:
                raise KeyError(f"missing source key: {s}")
        _set_in(model_tree, dst, fn(*[sd[s] for s in srcs]), template)
        consumed.update(srcs)
    for k in sd:
        if k not in consumed and not any(k.startswith(p) for p in unused_prefixes):
            raise AssertionError(
                f"unconsumed pretrained key (coverage check, "
                f"ref modules/train.py:109-110): {k}")
    return consumed


def convert_pretrained(
    params: Dict[str, Any],
    bert_state_dict: Dict[str, Any],
    clip_vision_state_dict: Dict[str, Any],
    num_text_layers: int = 12,
    num_vision_layers: int = 12,
) -> Dict[str, Any]:
    """Return a copy of ``params`` with both towers replaced by converted
    pretrained weights. Coverage-asserts like the reference."""
    import copy
    import jax

    params = jax.tree_util.tree_map(np.asarray, params)
    new = copy.deepcopy(params)
    model = new["model"]
    _apply_mapping(model, params["model"], bert_mapping(num_text_layers),
                   bert_state_dict, _BERT_UNUSED_PREFIXES)
    _apply_mapping(model, params["model"], clip_vision_mapping(num_vision_layers),
                   clip_vision_state_dict, _CLIP_UNUSED_PREFIXES)
    return new


def _load_torch_file(path: str) -> Dict[str, Any]:
    import torch
    return torch.load(path, map_location="cpu", weights_only=True)


def load_pretrained_params(pretrained_dir: str, cfg, params_template):
    """Load bert.pt + clip_vit.pt (torch state_dicts) from a local dir and
    convert. Files are produced once, offline, with:

        torch.save(BertModel.from_pretrained(name).state_dict(), 'bert.pt')
        torch.save(CLIPModel.from_pretrained(name).vision_model.state_dict(),
                   'clip_vit.pt')

    RoBERTa checkpoints (BASELINE config 4) go through the same path:
    ``RobertaModel.state_dict()`` is key-compatible with ``bert_mapping``
    (parity vs live HF: tests/parity/test_roberta_parity.py); set
    ``position_style='roberta'`` in the text config so the reserved
    position rows are honored.
    """
    bert_sd = _load_torch_file(os.path.join(pretrained_dir, "bert.pt"))
    clip_sd = _load_torch_file(os.path.join(pretrained_dir, "clip_vit.pt"))
    tc, vc = cfg.text_config(), cfg.vision_config()
    stages = getattr(cfg, "pipeline_stages", 1)
    if stages > 1:
        # pipelined templates hold (S, N/S, ...) tower params: convert
        # against the per-layer view, then relayout for the pipeline
        expanded = unstack_tower_layers(
            unpipeline_tower_layers(params_template))
        converted = convert_pretrained(expanded, bert_sd, clip_sd,
                                       tc.num_hidden_layers,
                                       vc.num_hidden_layers)
        return pipeline_tower_layers(converted, stages)
    if getattr(cfg, "scan_layers", False):
        # scanned templates hold stacked (N, ...) tower params: convert
        # against the unstacked view, then restack
        expanded = unstack_tower_layers(params_template)
        converted = convert_pretrained(expanded, bert_sd, clip_sd,
                                       tc.num_hidden_layers,
                                       vc.num_hidden_layers)
        return stack_tower_layers(converted)
    return convert_pretrained(params_template, bert_sd, clip_sd,
                              tc.num_hidden_layers, vc.num_hidden_layers)


def _map_towers(params: Dict[str, Any], fn) -> Dict[str, Any]:
    """Apply ``fn`` to every encoder-tower subtree ('encoder_text_layers',
    'encoder_vision_layers'), recursing through everything else — the one
    shared walker behind the four tower-layout converters below."""
    out = {}
    for key, sub in params.items():
        if key in ("encoder_text_layers", "encoder_vision_layers"):
            out[key] = fn(sub)
        elif isinstance(sub, dict):
            out[key] = _map_towers(sub, fn)
        else:
            out[key] = sub
    return out


def stack_tower_layers(params: Dict[str, Any]) -> Dict[str, Any]:
    """Unscanned param tree -> cfg.scan_layers tree.

    For each tower ('encoder_text_layers', 'encoder_vision_layers') the
    per-layer subtrees {'layer_0': t0, ..., 'layer_{N-1}'} are stacked
    leaf-wise along a new leading (N,) axis under
    {'layers_scanned': {'layer': stacked}} — the layout nn.scan with
    variable_axes={'params': 0} expects (models/bert.py _ScanBertBody).
    Non-tower entries pass through untouched. Use after convert_pretrained
    (or on a checkpoint) when running with scan_layers=True.
    """
    import jax

    def stack_tower(tower: Dict[str, Any]) -> Dict[str, Any]:
        names = sorted((k for k in tower if k.startswith("layer_")),
                       key=lambda s: int(s.split("_")[1]))
        if not names:
            return tower
        stacked = jax.tree_util.tree_map(
            lambda *leaves: np.stack([np.asarray(x) for x in leaves]),
            *[tower[n] for n in names])
        rest = {k: v for k, v in tower.items() if not k.startswith("layer_")}
        return {"layers_scanned": {"layer": stacked}, **rest}

    return _map_towers(params, stack_tower)


def unstack_tower_layers(params: Dict[str, Any]) -> Dict[str, Any]:
    """Inverse of :func:`stack_tower_layers`: scanned (N, ...) tower params
    back to per-layer {'layer_i': ...} subtrees."""
    import jax

    def unstack_tower(tower: Dict[str, Any]) -> Dict[str, Any]:
        if "layers_scanned" not in tower:
            return tower
        stacked = tower["layers_scanned"]["layer"]
        n = jax.tree_util.tree_leaves(stacked)[0].shape[0]
        out = {f"layer_{i}": jax.tree_util.tree_map(
            lambda x, i=i: np.asarray(x)[i], stacked) for i in range(n)}
        out.update({k: v for k, v in tower.items() if k != "layers_scanned"})
        return out

    return _map_towers(params, unstack_tower)


def pipeline_tower_layers(params: Dict[str, Any],
                          stages: int) -> Dict[str, Any]:
    """Unscanned OR scanned param tree -> cfg.pipeline_stages tree.

    The pipelined towers (models/pipeline.py) keep their weights under
    ``layers_pipelined/pipeline/stages_pipelined/layers/layer`` with TWO
    leading axes (stages, layers_per_stage, ...) — the scanned (N, ...)
    stack reshaped, since stage s owns layers [s*N/S, (s+1)*N/S). Layer
    order and values are untouched (tests/test_pipeline.py pins bit-equal
    forwards), so any converted/trained checkpoint can be re-deployed
    pipelined."""
    import jax

    def pipe_tower(tower: Dict[str, Any]) -> Dict[str, Any]:
        if "layers_scanned" not in tower:
            return tower
        stacked = tower["layers_scanned"]["layer"]
        n = jax.tree_util.tree_leaves(stacked)[0].shape[0]
        if n % stages != 0:
            raise ValueError(f"pipeline stages {stages} must divide the "
                             f"tower depth {n}")
        reshaped = jax.tree_util.tree_map(
            lambda x: np.asarray(x).reshape(
                (stages, n // stages) + np.shape(x)[1:]), stacked)
        out = {"layers_pipelined": {"pipeline": {"stages_pipelined": {
            "layers": {"layer": reshaped}}}}}
        out.update({k: v for k, v in tower.items() if k != "layers_scanned"})
        return out

    # stack first (idempotent on scanned trees), then relayout each tower
    return _map_towers(stack_tower_layers(params), pipe_tower)


def unpipeline_tower_layers(params: Dict[str, Any]) -> Dict[str, Any]:
    """Inverse of :func:`pipeline_tower_layers`: (S, N/S, ...) pipelined
    tower params back to the scanned (N, ...) layout (pure reshape)."""
    import jax

    def unpipe_tower(tower: Dict[str, Any]) -> Dict[str, Any]:
        if "layers_pipelined" not in tower:
            return tower
        stacked = tower["layers_pipelined"]["pipeline"]["stages_pipelined"][
            "layers"]["layer"]
        merged = jax.tree_util.tree_map(
            lambda x: np.asarray(x).reshape(
                (np.shape(x)[0] * np.shape(x)[1],) + np.shape(x)[2:]),
            stacked)
        out = {"layers_scanned": {"layer": merged}}
        out.update({k: v for k, v in tower.items()
                    if k != "layers_pipelined"})
        return out

    return _map_towers(params, unpipe_tower)
