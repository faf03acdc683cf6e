"""Device mesh + sharding setup.

The reference is single-process single-GPU (SURVEY.md section 2.9); the
TPU-native equivalent is SPMD over a ``jax.sharding.Mesh``:

  * ``data`` axis — batch sharding (DP). Gradients are reduced by the
    compiler's psum under jit; the batch-global Gram matrices of the JS loss
    and the BatchNorm statistics stay exact because the whole step is jitted
    over globally-sharded arrays (XLA inserts all-gathers over ICI for the
    (B, ~100) path signatures — cheap, SURVEY.md section 5.8).
  * ``model`` axis — optional tensor parallelism for the scaled encoder
    configs (RoBERTa-large/ViT-L, BASELINE config 4): attention heads and MLP
    hidden dims are sharded via parameter PartitionSpecs; XLA GSPMD inserts
    the reduce-scatters.

Single-chip (the bench target) is the degenerate (1,)-mesh; all code paths
are identical.
"""

from __future__ import annotations

import re
from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
STAGE_AXIS = "stage"  # pipeline parallelism (models/pipeline.py)


def make_mesh(
    mesh_shape: Sequence[int] = (-1,),
    axis_names: Sequence[str] = (DATA_AXIS,),
    devices: Optional[Sequence[Any]] = None,
    topology_aware: bool = False,
) -> Mesh:
    """Build a mesh; a single -1 dim absorbs all remaining devices.

    ``devices`` defaults to ``jax.devices()`` — GLOBAL across processes, so
    on a multi-host pod every process builds the same mesh and the jitted
    step is one SPMD program over the slice.

    ``topology_aware=True`` routes through
    ``jax.experimental.mesh_utils.create_device_mesh`` so the axis order
    follows the physical ICI torus (keeps the fast-changing mesh axis on
    the fast links of a pod slice); it falls back to the deterministic
    process-ordered reshape off-TPU or when mesh_utils rejects the shape.
    """
    devices = list(devices if devices is not None else jax.devices())
    shape = list(mesh_shape)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1])) or 1
        shape[shape.index(-1)] = len(devices) // known
    n = int(np.prod(shape))
    if topology_aware and n == len(devices):
        try:
            from jax.experimental import mesh_utils
            grid = mesh_utils.create_device_mesh(tuple(shape),
                                                 devices=devices)
            return Mesh(grid, tuple(axis_names))
        except Exception:  # non-TPU backends / unsupported topologies
            pass
    grid = np.asarray(devices[:n]).reshape(shape)
    return Mesh(grid, tuple(axis_names))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# --- parameter partitioning rules for the optional model axis -------------
# Matched in order against '/'-joined flax param paths. Only the large
# encoder matmuls are sharded; routers/cells/poolers stay replicated (they
# are small and batch-bound).
_PARAM_RULES: Tuple[Tuple[str, P], ...] = (
    # fused head-aligned qkv (in, 3, h): shard the per-projection hidden axis
    # so every shard owns whole attention heads (layers.py QKVDense)
    (r"(qkv|sa_qkv)/kernel$", P(None, None, MODEL_AXIS)),
    (r"(qkv|sa_qkv)/bias$", P(None, MODEL_AXIS)),
    # separate attention projections: shard output features (heads)
    (r"(query|key|value|q_proj|k_proj|v_proj)/kernel$", P(None, MODEL_AXIS)),
    (r"(query|key|value|q_proj|k_proj|v_proj)/bias$", P(MODEL_AXIS)),
    # attention output projection: shard input features
    (r"(attention_output/dense|out_proj)/kernel$", P(MODEL_AXIS, None)),
    # MLP up-projection: shard hidden
    (r"(intermediate_dense|mlp_fc1)/kernel$", P(None, MODEL_AXIS)),
    (r"(intermediate_dense|mlp_fc1)/bias$", P(MODEL_AXIS)),
    # MLP down-projection: shard input
    (r"(output_dense|mlp_fc2)/kernel$", P(MODEL_AXIS, None)),
    # embeddings: shard vocab rows (gathered on use)
    (r"word_embeddings/embedding$", P(MODEL_AXIS, None)),
)


def current_mesh():
    """The physical mesh of the surrounding ``with mesh:`` context, or None.

    One shared home for the jax-version-sensitive thread_resources lookup
    used by every activation sharding-constraint helper (seq/fabric/stage).
    """
    try:
        from jax._src.mesh import thread_resources
    except ImportError:  # older jax: public (now-deprecated) alias
        from jax.interpreters.pxla import thread_resources

    mesh = thread_resources.env.physical_mesh
    return None if mesh.empty else mesh


def param_partition_spec(path: str, has_model_axis: bool,
                         has_stage_axis: bool = False) -> P:
    if "stages_pipelined" in path:
        # pipelined towers (cfg.pipeline_stages, models/pipeline.py) carry
        # TWO leading axes (stages, layers_per_stage, ...) REGARDLESS of the
        # surrounding mesh: shard stages over 'stage' when that axis exists
        # — EVERY stage param, not just the tp-ruled matmuls — and compose
        # with the tp rule shifted past the two leading axes when present
        # (a stage-less mesh, e.g. serving a pipelined checkpoint on
        # ('data','model'), must still not let a tp rule land on a leading
        # stack axis).
        inner = P()
        if has_model_axis:
            for pattern, spec in _PARAM_RULES:
                if re.search(pattern, path):
                    inner = spec
                    break
        return P(STAGE_AXIS if has_stage_axis else None, None, *inner)
    if has_model_axis:
        for pattern, spec in _PARAM_RULES:
            if re.search(pattern, path):
                if "layers_scanned" in path:
                    # scanned towers (cfg.scan_layers) carry a leading
                    # (num_layers,) axis — keep it unsharded and shift the
                    # rule one axis right
                    return P(None, *spec)
                return spec
    return P()


def _path_str(key_path) -> str:
    parts = []
    for k in key_path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "name"):
            parts.append(str(k.name))
        else:
            parts.append(str(k))
    return "/".join(parts)


def make_param_shardings(params, mesh: Mesh):
    """NamedSharding pytree matching ``params``."""
    has_model = MODEL_AXIS in mesh.axis_names and mesh.shape.get(MODEL_AXIS, 1) > 1
    has_stage = STAGE_AXIS in mesh.axis_names and mesh.shape.get(STAGE_AXIS, 1) > 1

    def to_sharding(key_path, leaf):
        path = _path_str(key_path)
        # quantized serving trees (quant.QuantLeaf children): the int8
        # codes 'q' inherit the dense kernel's rule (same shape); the
        # per-channel 'scale' follows the same rule where divisible and
        # falls back to replication below (it is tiny either way). Stripping
        # also hits LayerNorm/BatchNorm 'scale' leaves, whose parent path
        # matches no rule — same replicated result as before.
        if path.endswith("/q") or path.endswith("/scale"):
            path = path.rsplit("/", 1)[0]
        spec = param_partition_spec(path, has_model, has_stage)
        if len(spec) > leaf.ndim:
            spec = P()
        # avoid uneven shards: fall back to replication when indivisible
        for axis_name, dim in zip(spec, leaf.shape):
            if axis_name is not None and dim % mesh.shape[axis_name] != 0:
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(to_sharding, params)


def seq_sharding_constraint(x):
    """Megatron-style sequence parallelism (cfg.seq_shard): constrain a
    (batch, seq, hidden) activation to ``P('data', 'model')`` at tower block
    boundaries. Under tensor parallelism the LayerNorm/dropout/residual
    segments between the sharded matmuls are then seq-sharded instead of
    replicated, and XLA GSPMD lowers each block's TP all-reduce into a
    reduce-scatter + all-gather pair — identical math, 1/tp the activation
    memory and VPU work on those segments.

    No-op (returns ``x`` unchanged) outside a mesh context, without a >1
    'model' axis, or when the seq dim does not divide the tp degree (e.g. the
    50 ragged vision tokens on tp=4) — so the flag is safe to leave on.
    """
    mesh = current_mesh()
    if mesh is None or MODEL_AXIS not in mesh.axis_names:
        return x
    tp = mesh.shape[MODEL_AXIS]
    if tp <= 1 or x.ndim < 3 or x.shape[1] % tp != 0:
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS)))


def fabric_batch_constraint(x, undo: bool = False):
    """Work-share the routing fabric over the WHOLE mesh (cfg.fabric_shard).

    Under tensor parallelism the 6-cell fabric replicates across the model
    axis (its params match no tp rule — they are small), which means tp
    devices redo identical fabric work. D2R's routing is dense-soft (every
    cell on every sample, ref: models/DynamicInteraction.py:56-67), so the
    MoE-style answer — an expert axis — has no sparsity to exploit; the
    right TPU answer is to respread the BATCH over the combined
    (data, model) axes for the fabric segment: ``P(('data','model'))`` on
    the leading batch dim. Identical math (sharding is layout), 1/tp the
    fabric compute per device. ``undo=True`` pins back to plain data
    sharding at fabric exit so downstream batch-global Grams/poolers keep
    their measured layouts.

    No-op outside a mesh, without a >1 model axis, or when batch doesn't
    divide dp*tp — always safe, like :func:`seq_sharding_constraint`.
    """
    mesh = current_mesh()
    if (mesh is None or MODEL_AXIS not in mesh.axis_names
            or DATA_AXIS not in mesh.axis_names):
        return x
    if mesh.shape[MODEL_AXIS] <= 1 or x.ndim < 1:
        return x
    total = mesh.shape[DATA_AXIS] * mesh.shape[MODEL_AXIS]
    if x.shape[0] % total != 0:
        return x
    spec = P(DATA_AXIS) if undo else P((DATA_AXIS, MODEL_AXIS))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def _data_axis_size(mesh: Mesh) -> int:
    return mesh.shape.get(DATA_AXIS, 1)


def shard_batch(batch, mesh: Mesh):
    """Place a host batch dict onto the mesh, sharded over the data axis.

    Single-process: a plain ``device_put``. Batches whose leading dim does
    not divide the data-axis size (tiny test batches on the 8-device CPU
    mesh) fall back to replication — the jitted step computes identical
    global math either way, only the layout differs.

    Multi-process (pod-scale, ``parallel/distributed.py``): every process
    passes its LOCAL 1/num_processes slice of the global batch
    (``DataLoader(process_shard=...)`` yields exactly that) and the global
    array is assembled with ``jax.make_array_from_process_local_data`` —
    each host's rows land on its own chips, no cross-host transfer.
    """
    n = _data_axis_size(mesh)
    sharded = batch_sharding(mesh)
    rep = replicated(mesh)
    nproc = jax.process_count()

    if nproc > 1:
        def place(x):
            x = np.asarray(x)
            global_rows = x.shape[0] * nproc if np.ndim(x) >= 1 else 0
            if np.ndim(x) < 1 or global_rows % n != 0:
                raise ValueError(
                    f"multi-host batches must shard evenly: local leading "
                    f"dim {np.shape(x)} x {nproc} processes vs data axis "
                    f"{n}")
            return jax.make_array_from_process_local_data(
                sharded, x, (global_rows,) + x.shape[1:])
    else:
        def place(x):
            ok = np.ndim(x) >= 1 and np.shape(x)[0] % n == 0
            return jax.device_put(x, sharded if ok else rep)

    return jax.tree_util.tree_map(place, batch)


def shard_stacked_batch(stacked, mesh: Mesh):
    """Place a (K, B, ...) stacked batch dict onto the mesh: the scan axis K
    stays unsharded, the batch axis shards over 'data' (multi-step dispatch,
    train/state.py make_multi_step). Indivisible batch dims replicate, as in
    :func:`shard_batch`; multi-process assembles from per-host (K, B/nproc,
    ...) slices."""
    n = _data_axis_size(mesh)
    sharded = NamedSharding(mesh, P(None, DATA_AXIS))
    rep = replicated(mesh)
    nproc = jax.process_count()

    if nproc > 1:
        def place(x):
            x = np.asarray(x)
            global_rows = x.shape[1] * nproc if np.ndim(x) >= 2 else 0
            if np.ndim(x) < 2 or global_rows % n != 0:
                raise ValueError(
                    f"multi-host stacked batches must shard evenly: local "
                    f"shape {np.shape(x)} x {nproc} processes vs data axis "
                    f"{n}")
            return jax.make_array_from_process_local_data(
                sharded, x, (x.shape[0], global_rows) + x.shape[2:])
    else:
        def place(x):
            ok = np.ndim(x) >= 2 and np.shape(x)[1] % n == 0
            return jax.device_put(x, sharded if ok else rep)

    return jax.tree_util.tree_map(place, stacked)
