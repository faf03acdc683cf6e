"""Configuration system for d2r_tpu.

A typed, immutable replacement for the reference's single argparse namespace
threaded through every module (ref: run.py:39-84). Flag names and defaults
mirror the reference CLI exactly so `python run.py --lr ... --DR_step ...`
stays drop-in compatible (ref: run.py:40-82), while encoder hyper-parameters
are pinned locally instead of being fetched from the HuggingFace hub at
construction time (the reference calls `BertConfig.from_pretrained` /
`CLIPConfig.from_pretrained` inside every cell, ref: models/Cells.py:136-139).

TPU-specific knobs (mesh axes, compute dtype, remat, pallas toggles) have no
reference equivalent; they are grouped at the bottom of :class:`D2RConfig`.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class TextEncoderConfig:
    """BERT-family text tower config.

    Defaults pin ``bert-base-uncased`` (the reference default,
    ref: run.py:40) so no hub access is needed.
    """

    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    hidden_act: str = "gelu"
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    pad_token_id: int = 0
    # "absolute": position ids are arange(L) (BERT; ref HF BertEmbeddings).
    # "roberta": HF RoBERTa semantics — rows 0..pad_token_id are reserved,
    # non-pad token i gets row pad_token_id + 1 + i and pad slots get the
    # pad_token_id row (HF create_position_ids_from_input_ids). Loading a
    # real roberta checkpoint with "absolute" would silently read the two
    # reserved rows as content positions.
    position_style: str = "absolute"

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads


@dataclasses.dataclass(frozen=True)
class VisionEncoderConfig:
    """CLIP-ViT vision tower config.

    Defaults pin ``openai/clip-vit-base-patch32`` (ref: run.py:42).
    224/32 -> 49 patches + CLS = 50 vision tokens
    (ref: models/modeling_unimo.py:105-107).
    """

    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    hidden_act: str = "quick_gelu"
    image_size: int = 224
    patch_size: int = 32
    num_channels: int = 3
    layer_norm_eps: float = 1e-5
    attention_dropout: float = 0.0
    dropout: float = 0.0

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def num_tokens(self) -> int:
        return self.num_patches + 1


def bert_base_config() -> TextEncoderConfig:
    return TextEncoderConfig()


def roberta_large_config() -> TextEncoderConfig:
    """Scaled text tower (BASELINE config 4)."""
    return TextEncoderConfig(
        vocab_size=50265,
        hidden_size=1024,
        num_hidden_layers=24,
        num_attention_heads=16,
        intermediate_size=4096,
        max_position_embeddings=514,
        type_vocab_size=1,
        layer_norm_eps=1e-5,
        pad_token_id=1,
        position_style="roberta",
    )


def clip_vit_b32_config() -> VisionEncoderConfig:
    return VisionEncoderConfig()


def clip_vit_l14_config() -> VisionEncoderConfig:
    """Scaled vision tower (BASELINE config 4)."""
    return VisionEncoderConfig(
        hidden_size=1024,
        num_hidden_layers=24,
        num_attention_heads=16,
        intermediate_size=4096,
        patch_size=14,
    )


_TEXT_PRESETS = {
    "bert-base-uncased": bert_base_config,
    "roberta-large": roberta_large_config,
}
_VISION_PRESETS = {
    "clip-vit-base-patch32": clip_vit_b32_config,
    "openai/clip-vit-base-patch32": clip_vit_b32_config,
    "clip-vit-large-patch14": clip_vit_l14_config,
    "openai/clip-vit-large-patch14": clip_vit_l14_config,
}


@dataclasses.dataclass(frozen=True)
class D2RConfig:
    """Full experiment config.

    Field names mirror the reference argparse flags one-to-one
    (ref: run.py:40-82); extra TPU-native knobs are grouped at the end.
    """

    # --- pretrained names (ref: run.py:40-42) ---
    bert_name: str = "bert-base-uncased"
    vit_name: str = "clip-vit-base-patch32"

    # --- training (ref: run.py:43-60) ---
    num_epochs: int = 30
    device: str = "tpu"
    batch_size: int = 32
    lr: float = 3e-5
    warmup_ratio: float = 0.01
    eval_begin_epoch: int = 1
    seed: int = 2023
    load_path: Optional[str] = None
    save_path: Optional[str] = "./output/"
    write_path: Optional[str] = None
    notes: str = ""
    do_train: bool = True
    only_test: bool = False
    max_seq: int = 128
    ignore_idx: int = 0
    sample_ratio: float = 1.0

    # --- CCR contrastive (latent; alpha=0 disables, ref: run.py:62-63) ---
    alpha: float = 0.0
    margin: float = 0.1

    # --- SoftContrastiveLoss (dead in reference live path, ref: run.py:65-68) ---
    beta: float = 0.1
    mild_margin: float = 0.7
    hetero: float = 0.9
    homo: float = 0.9

    # --- dynamic routing (ref: run.py:70-73) ---
    DR_step: int = 3
    weight_js_1: float = 0.1
    weight_js_2: float = 0.1
    weight_diff: float = 0.1

    # --- model dims (ref: run.py:75-82) ---
    embed_size: int = 768
    num_head_IMRC: int = 16
    hid_IMRC: int = 768
    raw_feature_norm_CMRC: str = "clipped_l2norm"
    lambda_softmax_CMRC: float = 4.0
    hid_router: int = 768

    # --- hidden constants of the reference (SURVEY.md section 5.6) ---
    num_cells: int = 6          # ref: modeling_unimo.py:781-782
    path_hid: int = 128         # ref: modeling_unimo.py:781-782
    num_classes: int = 3        # ref: models/unimo_model.py:145
    fc_lr: float = 5e-2         # ref: modules/train.py:315
    weight_decay: float = 1e-2  # ref: modules/train.py:291
    router_bias_init: float = 1.5      # ref: models/Router.py:20
    routing_threshold: float = 1e-4    # ref: models/DynamicInteraction.py:24
    cma_temperature: float = 100.0     # ref: models/XModules.py:309

    # --- optional SenticNet affective-graph refinement (BASELINE config 2;
    # disconnected dead code in the reference, see docs/PARITY.md item 6) ---
    use_sentic_graph: bool = False
    sentic_lexicon_path: Optional[str] = None

    # --- TPU-native additions (no reference equivalent) ---
    save_opt_state: bool = False        # true resume (ref restarts schedule)
    # Preemption-safe resume: checkpoint FULL train state (params +
    # batch_stats + opt_state + step + best-F1 bookkeeping) at every epoch
    # boundary under save_path/resume/, and on startup continue an
    # interrupted run from there bit-exactly (same shuffle order, dropout
    # stream, LR position — tests/test_auto_resume.py). Rerun the SAME
    # command; the epoch loop picks up where it left off.
    auto_resume: bool = False
    # Early stopping: stop when the dev weighted-F1 has not improved for N
    # consecutive evaluated epochs (0 = off, the reference behaviour). The
    # best-model checkpoint/test policy is unchanged — this only ends the
    # epoch loop sooner.
    patience: int = 0
    # Structured observability: append one JSON line per train-loss window,
    # dev eval, test eval, and end-of-run summary to this file (rank 0 only).
    metrics_jsonl: Optional[str] = None
    # Linear-probe mode: freeze the five pretrained tower modules
    # (optimizer.py::TOWER_MODULES — exactly what the converter populates)
    # via optax.masked zero updates; the routing fabric, fusion head, and fc
    # keep training. No reference equivalent (it always fine-tunes
    # everything, ref: modules/train.py:287-322).
    freeze_towers: bool = False
    # TensorBoard event files (torch.utils.tensorboard). The reference
    # declares a `writer` and hardwires it to None (ref: run.py:122,
    # modules/train.py:135-137,201-205); this makes it functional.
    tensorboard_dir: Optional[str] = None
    # Overlap best-model checkpoint writes with the next epoch's compute
    # (orbax AsyncCheckpointer); the trainer awaits durability before its
    # best-model test reload. Resume checkpoints stay synchronous — their
    # crash-safety protocol publishes the meta only after arrays are durable.
    async_checkpoint: bool = False
    # Memoise finished dataset items in RAM: every per-item transform is
    # deterministic, so epochs >= 2 skip all host-side tokenise/decode work.
    # Opt-in — pixels dominate the footprint (~image_size^2*3 B/item uint8).
    cache_items: bool = False
    compute_dtype: str = "float32"      # "bfloat16" for MXU throughput
    use_pallas: bool = True             # pallas fused attention on TPU
    remat: bool = False                 # jax.checkpoint over encoder layers
    mesh_shape: Tuple[int, ...] = (-1,)  # -1 = all devices on the data axis
    mesh_axis_names: Tuple[str, ...] = ("data",)
    # order mesh axes along the physical ICI torus (mesh_utils); falls back
    # to the deterministic process-ordered reshape off-TPU
    mesh_topology: bool = False
    # Sequence parallelism (Megatron-SP): under a >1 'model' axis, constrain
    # tower activations to P('data','model') on (batch, seq) at block
    # boundaries so the LN/dropout/residual segments run seq-sharded and
    # GSPMD turns each block's TP all-reduce into reduce-scatter+all-gather.
    # Identical math (tests/test_tp_semantics.py); no-op without tp.
    seq_shard: bool = False
    log_steps: int = 2                  # ref: refresh_step, modules/train.py:64
    debug_nans: bool = False
    profile_dir: Optional[str] = None
    # K train steps per device dispatch (lax.scan over stacked batches,
    # train/state.py make_multi_step). Amortises host dispatch + the
    # device->host loss fetch; 1 = one jitted step per batch. Identical math
    # either way (tests/test_train.py pins K-step == K x single-step).
    steps_per_dispatch: int = 16
    # Gradient accumulation: each optimizer step averages grads over K
    # sequential microbatches inside ONE jitted program (lax.scan with an
    # on-the-fly grad sum, train/state.py make_accum_step) — effective batch
    # K*batch_size at the activation memory of one microbatch. BatchNorm
    # stats update per microbatch; dropout folds in the microbatch index.
    # 1 = off. When >1 each dispatch is one optimizer step (steps_per_dispatch
    # does not apply) and the LR schedule counts optimizer steps.
    grad_accum_steps: int = 1
    # AdamW implementation (train/optimizer.py) — identical math, different
    # kernel shapes: 'grouped' = one scale_by_adam chain + per-leaf group lr
    # (default, fastest measured); 'fused' = one flat moment buffer per
    # lr-group; 'multi_transform' = the reference-shaped 4-group oracle.
    optimizer_impl: str = "grouped"
    # dtype of Adam's first moment (optax mu_dtype); bf16 halves the moment
    # HBM traffic at a negligible update-quality cost. fp32 = exact oracle
    # match (tests/test_fused_optimizer.py).
    adam_mu_dtype: str = "float32"
    # PRNG implementation for the DROPOUT stream. 'rbg' uses the TPU-native
    # XLA RngBitGenerator: measured 818 vs 705 samples/s/chip on v5e —
    # threefry bit generation at every dropout site was ~12.5 ms/step of pure
    # VPU work. Dropout bits were never reference-parity anyway (torch PRNG,
    # docs/PARITY.md deviation 5); param init stays threefry (seed-stable).
    # Use 'threefry2x32' for bits that are stable across shardings/versions.
    prng_impl: str = "rbg"
    # Run each tower's identical transformer layers as ONE nn.scan over
    # stacked (num_layers, ...) params instead of N inlined copies. Identical
    # math (tests/test_scan_layers.py). Measured on v5e (flagship program):
    # compile 217 s vs 414-730 s unrolled (~2-3x faster — the dev-iteration
    # win) but step time 101.7 vs 77.7 ms (-23%: the scan carry blocks
    # XLA's inter-layer fusion/pipelining) — so OFF by default; turn on for
    # compile-bound iteration loops. Weight trees restack via
    # utils/weights.py stack_tower_layers.
    scan_layers: bool = False
    # Fabric work-sharing under tensor parallelism: respread the routing
    # fabric's BATCH over the combined (data, model) axes so tp devices
    # share the (otherwise model-axis-replicated) 6-cell compute — the
    # work-sharing an expert axis would buy a MoE, without faking expert
    # dispatch on a dense-soft router (docs/DESIGN.md "Parallelism").
    # Identical math (tests/test_tp_semantics.py); no-op without tp.
    fabric_shard: bool = False
    # Pipeline parallelism (models/pipeline.py): run each tower's layer
    # stack as a GPipe pipeline over a 'stage' mesh axis — stage weights and
    # the (stages, microbatch, ...) state buffer shard on 'stage', the
    # inter-stage hop is a jnp.roll GSPMD lowers to a collective-permute.
    # Requires num_hidden_layers % stages == 0. 1 = off. Deterministic math
    # identical to the sequential stack (tests/test_pipeline.py); training
    # dropout draws per (tick, stage) instead of per layer.
    pipeline_stages: int = 1
    # microbatches per batch for the pipeline (bubble fraction is
    # (S-1)/(M+S-1): pick >= 2*stages when memory allows). 0 = stages.
    pipeline_microbatches: int = 0
    # Recompute (instead of save) the 4x-wide post-GELU FFN activations in
    # backward — surgical remat via checkpoint_name('ffn_act') tags; the
    # whole-model remat knob above trades too much recompute (581/s measured)
    # while this drops ~25 MB/FFN-site of HBM residual traffic for an
    # elementwise recompute.
    remat_ffn_act: bool = False
    # Pixel transfer format for the image pipeline. 'uint8' ships RAW
    # resized/cropped pixels (4x fewer host->device bytes — the dominant
    # input cost: 38 MB/batch fp32 at bsz 64) and CLIPVisionEmbeddings
    # normalises on device with the identical fp32 op order, so the PIL
    # decode path is bit-identical to host-side normalisation; the native C
    # path re-quantises its float resample to uint8 (<=1 LSB, PARITY.md).
    pixel_transfer: str = "uint8"
    # Opt-in int8 quantized training (ops/qdot.py): run the projection
    # matmuls (TorchLinear/QKVDense) as int8 x int8 -> int32 MXU dots —
    # ~2x the bf16 peak on v5e — with AQT-style dynamic symmetric scales
    # (per activation row / per kernel column) and a straight-through-
    # estimator backward. 'int8' quantizes the forward dot only (backward
    # exact); 'int8_all' also quantizes the dx/dW dots. NOT recipe-parity
    # numerics (the reference trains fp32); error bounds in
    # tests/test_qdot.py, TPU A/B in docs/BENCHMARKS.md.
    quant_train: str = "none"

    def text_config(self) -> TextEncoderConfig:
        key = self.bert_name.split("/")[-1]
        factory = _TEXT_PRESETS.get(key) or _TEXT_PRESETS.get(self.bert_name)
        if factory is None:
            # No silent geometry fallback: a typo'd --bert_name must not
            # quietly train bert-base-uncased shapes.
            raise ValueError(
                f"unknown text encoder preset {self.bert_name!r}; known: "
                f"{sorted(_TEXT_PRESETS)} (register_text_preset adds more)")
        return factory()

    def vision_config(self) -> VisionEncoderConfig:
        key = self.vit_name.split("/")[-1]
        factory = _VISION_PRESETS.get(key) or _VISION_PRESETS.get(self.vit_name)
        if factory is None:
            raise ValueError(
                f"unknown vision encoder preset {self.vit_name!r}; known: "
                f"{sorted(_VISION_PRESETS)} (register_vision_preset adds more)")
        return factory()

    @property
    def dtype(self):
        return jnp.dtype(self.compute_dtype)

    def replace(self, **kw) -> "D2RConfig":
        return dataclasses.replace(self, **kw)


def save_config_json(cfg: D2RConfig, path: str) -> None:
    """Write ``cfg`` as JSON so checkpoints are self-describing: serving and
    resume can rebuild the exact model geometry (embed_size, DR_step, tower
    presets, ...) without the user re-typing training flags. The reference
    has no equivalent — its checkpoints are bare state_dicts that silently
    mis-load under a wrong argparse geometry."""
    import json

    with open(path, "w") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=1, sort_keys=True)


def load_config_json(path: str) -> D2RConfig:
    """Inverse of :func:`save_config_json`. Unknown keys (written by a newer
    version) are dropped; tuple-typed fields are coerced back from lists."""
    import json

    with open(path) as f:
        d = json.load(f)
    known = {f.name for f in dataclasses.fields(D2RConfig)}
    d = {k: v for k, v in d.items() if k in known}
    for t in ("mesh_shape", "mesh_axis_names"):
        if isinstance(d.get(t), list):
            d[t] = tuple(d[t])
    return D2RConfig(**d)


def tiny_test_config(**overrides) -> D2RConfig:
    """A miniature config for CPU unit tests: 2-layer towers, dim 64."""
    defaults = dict(
        bert_name="tiny-bert",
        vit_name="tiny-vit",
        batch_size=4,
        max_seq=16,
        embed_size=64,
        num_head_IMRC=4,
        hid_IMRC=64,
        hid_router=32,
        DR_step=3,
        compute_dtype="float32",
        use_pallas=False,
    )
    defaults.update(overrides)
    return D2RConfig(**defaults)


def register_text_preset(name: str, factory) -> None:
    """Register a custom text-tower preset resolvable via ``bert_name``."""
    _TEXT_PRESETS[name] = factory


def register_vision_preset(name: str, factory) -> None:
    """Register a custom vision-tower preset resolvable via ``vit_name``."""
    _VISION_PRESETS[name] = factory


_TEXT_PRESETS["tiny-bert"] = lambda: TextEncoderConfig(
    vocab_size=128,
    hidden_size=64,
    num_hidden_layers=2,
    num_attention_heads=4,
    intermediate_size=128,
    max_position_embeddings=64,
)
_VISION_PRESETS["tiny-vit"] = lambda: VisionEncoderConfig(
    hidden_size=64,
    num_hidden_layers=2,
    num_attention_heads=4,
    intermediate_size=128,
    image_size=32,
    patch_size=16,
)
# tiny RoBERTa-family twin (position_style + BPE path tests/smokes):
# vocab 384 covers the 5 specials + all 256 byte-level BPE symbols
_TEXT_PRESETS["tiny-roberta"] = lambda: TextEncoderConfig(
    vocab_size=384,
    hidden_size=64,
    num_hidden_layers=2,
    num_attention_heads=4,
    intermediate_size=128,
    # roberta-style positions reserve rows 0..pad_token_id and start
    # content at pad+1, so a full max_seq=64 sequence reaches row 65 —
    # mirror HF's 514-for-512 convention (max_seq + pad + 1)
    max_position_embeddings=66,
    type_vocab_size=1,
    layer_norm_eps=1e-5,
    pad_token_id=1,
    position_style="roberta",
)
