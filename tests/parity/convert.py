"""Copy weights from reference torch modules into d2r_tpu flax trees.

Each converter takes the *torch module object* (not state_dict names) and
returns ``{"params": ..., "batch_stats": ...}`` shaped exactly like the
corresponding flax module's variables, so golden-tensor tests can assert
output parity at any granularity from a single Router up to the full
UnimoModelF.
"""

from __future__ import annotations

import numpy as np


def t2n(t) -> np.ndarray:
    # .copy() matters: torch .numpy() shares memory, and torch modules update
    # buffers (BatchNorm running stats) in place during reference forwards.
    return t.detach().cpu().numpy().copy()


def _merge(**children):
    out = {"params": {}, "batch_stats": {}}
    for name, ch in children.items():
        if isinstance(ch, dict) and set(ch) == {"params", "batch_stats"}:
            out["params"][name] = ch["params"]
            if ch["batch_stats"]:
                out["batch_stats"][name] = ch["batch_stats"]
        else:
            out["params"][name] = ch
    return out


def linear(mod):
    return {"kernel": t2n(mod.weight).T, "bias": t2n(mod.bias)}


def layernorm(mod):
    return {"scale": t2n(mod.weight), "bias": t2n(mod.bias)}


def embed(mod):
    return {"embedding": t2n(mod.weight)}


def fused_qkv(q_lin, k_lin, v_lin):
    """Three torch Linears -> one fused head-aligned (in, 3, h) kernel
    (see models/layers.py QKVDense)."""
    return {
        "kernel": np.stack(
            [t2n(q_lin.weight).T, t2n(k_lin.weight).T, t2n(v_lin.weight).T],
            axis=1),
        "bias": np.stack(
            [t2n(q_lin.bias), t2n(k_lin.bias), t2n(v_lin.bias)]),
    }


def router(mod):
    return _merge(mlp_0=linear(mod.mlp[0]), mlp_2=linear(mod.mlp[2]))


def pooler(mod):
    return _merge(dense=linear(mod.dense))


def cma(mod, with_projections: bool = False):
    """XModules/Refinement CrossModalAlignment -> flax cma. With alpha=0 our
    module never creates fc_1/fc_2, so they are skipped unless asked for."""
    children = dict(query=linear(mod.query), key=linear(mod.key),
                    value=linear(mod.value))
    if with_projections:
        children.update(fc_1=linear(mod.fc_1), fc_2=linear(mod.fc_2))
    return _merge(**children)


def saf(mod):
    """AttentionFiltration incl. BatchNorm running stats."""
    return {
        "params": {
            "attn_sim_w_kernel": t2n(mod.attn_sim_w.weight).T,
            "attn_sim_w_bias": t2n(mod.attn_sim_w.bias),
            "bn": {"scale": t2n(mod.bn.weight), "bias": t2n(mod.bn.bias)},
        },
        "batch_stats": {
            "bn": {"mean": t2n(mod.bn.running_mean),
                   "var": t2n(mod.bn.running_var)},
        },
    }


def ric(mod):
    return _merge(router=router(mod.router))


def imrc(mod):
    lin = mod.sa.att_layer.linears
    return _merge(
        router=router(mod.router),
        sa_qkv=fused_qkv(lin[0], lin[1], lin[2]),
        ffn_fc1=linear(mod.sa.feed_forward_layer.fc1),
        ffn_fc2=linear(mod.sa.feed_forward_layer.fc2),
    )


def glac(mod):
    return _merge(
        router=router(mod.router),
        cma=cma(mod.CrossModalAlignment),
        fc_sim_tranloc=linear(mod.fc_sim_tranloc),
        fc_sim_tranglo=linear(mod.fc_sim_tranglo),
        fc_1=linear(mod.fc_1), fc_2=linear(mod.fc_2),
        text_cls_pool=pooler(mod.text_cls_pool),
        image_cls_pool=pooler(mod.image_cls_pool),
        saf=saf(mod.SAF_module),
    )


def refinement(mod):
    return _merge(
        cma=cma(mod.CrossModalAlignment),
        fc_scale=linear(mod.fc_scale), fc_shift=linear(mod.fc_shift),
        fc_1=linear(mod.fc_1), fc_2=linear(mod.fc_2),
    )


def cmrc(mod):
    return _merge(router=router(mod.router), refine=refinement(mod.refine))


def crcmc(mod):
    return _merge(
        router=router(mod.router),
        cma=cma(mod.CrossModalAlignment),
        fc_mlp_1=linear(mod.fc_mlp_1[0]), fc_mlp_2=linear(mod.fc_mlp_2[0]),
        fc_1=linear(mod.fc_1), fc_2=linear(mod.fc_2),
    )


def gesc(mod):
    return _merge(
        router=router(mod.router),
        text_cls_pool=pooler(mod.text_cls_pool),
        image_cls_pool=pooler(mod.image_cls_pool),
        fc_mlp_0=linear(mod.fc_mlp[0]), fc_mlp_2=linear(mod.fc_mlp[2]),
    )


def routing_layer(mod):
    return _merge(ric=ric(mod.ric), glac=glac(mod.glac), imrc=imrc(mod.imrc),
                  cmrc=cmrc(mod.cmrc), crcmc=crcmc(mod.crcmc),
                  gesc=gesc(mod.gesc))


def interaction_module(mod):
    children = {"dynamic_itr_l0": routing_layer(mod.dynamic_itr_l0)}
    for i, layer in enumerate(mod.dynamic_itr_l1):
        children[f"dynamic_itr_l1_{i}"] = routing_layer(layer)
    children["dynamic_itr_l2"] = routing_layer(mod.dynamic_itr_l2)
    return _merge(**children)


def bert_embeddings(mod):
    return _merge(
        word_embeddings=embed(mod.word_embeddings),
        position_embeddings=embed(mod.position_embeddings),
        token_type_embeddings=embed(mod.token_type_embeddings),
        LayerNorm=layernorm(mod.LayerNorm),
    )


def bert_layer(mod):
    return _merge(
        attention_self=_merge(
            qkv=fused_qkv(mod.attention.self.query,
                          mod.attention.self.key,
                          mod.attention.self.value)),
        attention_output=_merge(
            dense=linear(mod.attention.output.dense),
            LayerNorm=layernorm(mod.attention.output.LayerNorm)),
        intermediate_dense=linear(mod.intermediate.dense),
        output_dense=linear(mod.output.dense),
        output_LayerNorm=layernorm(mod.output.LayerNorm),
    )


def clip_embeddings(mod):
    return {
        "params": {
            "class_embedding": t2n(mod.class_embedding),
            # torch conv (out,in,kh,kw) -> flax (kh,kw,in,out)
            "patch_embedding": {
                "kernel": t2n(mod.patch_embedding.weight).transpose(2, 3, 1, 0)},
            "position_embedding": embed(mod.position_embedding),
        },
        "batch_stats": {},
    }


def clip_layer(mod):
    return _merge(
        layer_norm1=layernorm(mod.layer_norm1),
        self_attn=_merge(
            qkv=fused_qkv(mod.self_attn.q_proj,
                          mod.self_attn.k_proj,
                          mod.self_attn.v_proj),
            out_proj=linear(mod.self_attn.out_proj)),
        layer_norm2=layernorm(mod.layer_norm2),
        mlp_fc1=linear(mod.mlp.fc1),
        mlp_fc2=linear(mod.mlp.fc2),
    )


def block_fusion(mod):
    return {
        "params": {
            "linear0": linear(mod.linear0),
            "linear1": linear(mod.linear1),
            "merge_kernel0": np.stack([t2n(m.weight).T for m in mod.merge_linears0]),
            "merge_bias0": np.stack([t2n(m.bias) for m in mod.merge_linears0]),
            "merge_kernel1": np.stack([t2n(m.weight).T for m in mod.merge_linears1]),
            "merge_bias1": np.stack([t2n(m.bias) for m in mod.merge_linears1]),
            "linear_out": linear(mod.linear_out),
        },
        "batch_stats": {},
    }


def unimo_model(mod):
    """Reference UnimoModel -> our D2RModel subtree."""
    vision_layers = {f"layer_{i}": clip_layer(l)
                     for i, l in enumerate(mod.encoder.vision_layers)}
    text_layers = {f"layer_{i}": bert_layer(l)
                   for i, l in enumerate(mod.encoder.text_layer)}
    return _merge(
        vision_embeddings=clip_embeddings(mod.vision_embeddings),
        vision_pre_layernorm=layernorm(mod.vision_pre_layrnorm),
        text_embeddings=bert_embeddings(mod.text_embeddings),
        encoder_vision_layers=_merge(**vision_layers),
        encoder_text_layers=_merge(**text_layers),
        self_text=bert_layer(mod.self_text[0]),
        text_cls_pool=pooler(mod.text_cls_pool),
        self_vision=clip_layer(mod.self_vision[0]),
        vision_cls_pool=pooler(mod.vision_cls_pool),
        itr_module=interaction_module(mod.itr_module),
        Reversed_itr_module=interaction_module(mod.Reversed_itr_module),
        text_pool=pooler(mod.text_pool),
        vision_pool=pooler(mod.vision_pool),
        block_fusion=block_fusion(mod.block_fusion),
    )


def unimo_model_f(mod):
    """Reference UnimoModelF -> full D2RClassifier variables."""
    tree = _merge(model=unimo_model(mod.model), fc=linear(mod.fc))
    return {"params": tree["params"], "batch_stats": tree["batch_stats"]}


def as_variables(tree) -> dict:
    """{'params','batch_stats'} -> flax variables dict (drop empty colls)."""
    out = {"params": tree["params"]}
    if tree["batch_stats"]:
        out["batch_stats"] = tree["batch_stats"]
    return out
