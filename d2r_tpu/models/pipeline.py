"""Pipeline parallelism for the encoder towers, the GSPMD way.

The reference is a single-GPU model with no pipeline story (SURVEY.md
section 2.9). This module adds real pipeline parallelism (pp) over the
uniform transformer stacks — BERT's 12 post-LN blocks and CLIP-ViT's 12
pre-LN blocks — completing the parallelism matrix (dp x tp x sp x pp, see
docs/DESIGN.md) for towers too deep/wide to replicate per chip.

Design — no hand-written send/recv schedule. The classic GPipe timetable
("at tick t, stage s processes microbatch t-s") is expressed as pure array
programs XLA's SPMD partitioner already knows how to place:

  * the stage dimension is a REAL array axis: the pipeline state is a
    (stages, microbatch, ...) buffer and the per-stage weights are stacked
    (stages, layers_per_stage, ...);
  * one ``nn.scan`` runs the T = microbatches + stages - 1 ticks;
  * inside a tick, ``jnp.roll(state, 1, axis=0)`` shifts every stage's
    output to its successor — on a mesh whose 'stage' axis shards that
    dimension, GSPMD lowers the roll to a single collective-permute over
    ICI (the idiomatic TPU pipeline transfer);
  * ``nn.vmap`` over the stage axis applies each stage's own
    layers-per-stage slice (an inner ``nn.scan``, same body modules as
    cfg.scan_layers) — with both operand and weights sharded on 'stage',
    the partitioner assigns each stage's compute to its own devices.

Autodiff gives the reverse schedule for free (the roll's transpose is the
opposite-direction permute), so the jitted train step is a full 1F1B-shaped
forward+backward pipeline without any manual scheduling code.

Costs, stated honestly: the bubble wastes (S-1)/(M+S-1) of tick compute
(choose microbatches >= 2*stages), and everything OUTSIDE the towers
(embeddings, routing fabric, heads) is replicated across the stage axis.
Dropout draws a fresh stream per (tick, stage) — valid masks, but not
bit-equal to the unrolled stream, so exactness tests run deterministic
(tests/test_pipeline.py pins pipelined == sequential forward and the
deterministic-loss train step).

Weight layout: params live under ``<encoder>/stages_pipelined/layers/...``
with TWO leading axes (stages, layers_per_stage). ``layers_scanned``'s
(num_layers, ...) stack reshapes into it (utils/weights.py
pipeline_tower_layers) and ``parallel/mesh.py`` shards the leading axis
over 'stage'.
"""

from __future__ import annotations

from typing import Any, Tuple, Type

import flax.linen as nn
import jax.numpy as jnp

from d2r_tpu.parallel.mesh import STAGE_AXIS, current_mesh


def stage_sharding_constraint(x):
    """Constrain a (stages, microbatch, ...) pipeline buffer to
    ``P('stage', 'data', ...)`` when the surrounding mesh has those axes and
    the dims divide; no-op otherwise (mirrors
    parallel/mesh.py::seq_sharding_constraint's always-safe contract)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = current_mesh()
    if mesh is None or STAGE_AXIS not in mesh.axis_names:
        return x
    if x.shape[0] % mesh.shape[STAGE_AXIS] != 0:
        return x
    data_ok = ("data" in mesh.axis_names and x.ndim >= 2
               and x.shape[1] % mesh.shape["data"] == 0)
    spec = P(STAGE_AXIS, "data") if data_ok else P(STAGE_AXIS)
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


class _StageLayers(nn.Module):
    """layers_per_stage sequential blocks on ONE stage's slot; nn.vmap'd
    over the stage axis by :class:`PipelinedStack`. ``body_cls`` is the same
    (carry, out)-shaped scan body the cfg.scan_layers path uses
    (models/bert.py _ScanBertBody / models/vit.py _ScanCLIPBody)."""

    body_cls: Type[nn.Module]
    body_args: Tuple[Any, ...]
    length: int
    has_bias: bool
    deterministic: bool = True  # static: lifted vmap can't broadcast a bool

    @nn.compact
    def __call__(self, x, bias):
        in_axes = ((nn.broadcast, nn.broadcast) if self.has_bias
                   else (nn.broadcast,))
        scan = nn.scan(
            self.body_cls,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=in_axes,
            length=self.length,
        )
        if self.has_bias:
            x, _ = scan(*self.body_args, name="layers")(
                x, bias, self.deterministic)
        else:
            x, _ = scan(*self.body_args, name="layers")(
                x, self.deterministic)
        return x


class _PipelineTick(nn.Module):
    """One pipeline tick: shift every stage's output downstream (the roll →
    collective-permute), feed the fresh microbatch into stage 0, then run
    all stages in parallel. Scanned over T ticks with broadcast params."""

    body_cls: Type[nn.Module]
    body_args: Tuple[Any, ...]
    layers_per_stage: int
    has_bias: bool
    deterministic: bool = True

    @nn.compact
    def __call__(self, carry, xt):
        state_x, state_b = carry
        mx, mbias = xt
        state_x = jnp.roll(state_x, 1, axis=0).at[0].set(mx)
        state_b = jnp.roll(state_b, 1, axis=0).at[0].set(mbias)
        state_x = stage_sharding_constraint(state_x)

        staged = nn.vmap(
            _StageLayers,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=(0, 0),
        )
        out = staged(self.body_cls, self.body_args, self.layers_per_stage,
                     self.has_bias, self.deterministic,
                     name="stages_pipelined")(state_x, state_b)
        out = stage_sharding_constraint(out)
        # the LAST stage's slot has finished microbatch (tick - stages + 1)
        return (out, state_b), out[-1]


class PipelinedStack(nn.Module):
    """Drop-in replacement for a tower's layer stack that runs it as a
    ``stages``-deep GPipe pipeline over ``microbatches`` slices of the batch.

    Identical math to the sequential stack for deterministic passes
    (tests/test_pipeline.py); training draws dropout per (tick, stage)
    instead of per layer. Requires num_layers % stages == 0 and
    batch % microbatches == 0 (static shapes are a framework invariant).
    """

    body_cls: Type[nn.Module]
    body_args: Tuple[Any, ...]
    num_layers: int
    stages: int
    microbatches: int
    has_bias: bool = False

    @nn.compact
    def __call__(self, x, bias=None, deterministic: bool = True):
        S, M = self.stages, self.microbatches
        if self.num_layers % S != 0:
            raise ValueError(
                f"pipeline_stages={S} must divide num_layers="
                f"{self.num_layers}")
        if M < 1 or x.shape[0] % M != 0:
            raise ValueError(
                f"pipeline_microbatches={M} must be >= 1 and divide "
                f"batch={x.shape[0]}")
        mb = x.shape[0] // M
        if self.has_bias and bias is None:
            raise ValueError("has_bias=True pipeline requires a per-sample "
                             "bias tensor (e.g. the attention key bias)")
        if bias is None:
            # dummy per-sample stream so tick carries stay uniform; unused
            # by the body (has_bias=False path)
            bias = jnp.zeros((x.shape[0], 1), x.dtype)

        # (M, mb, ...) microbatch streams, drained with S-1 zero ticks
        def to_stream(a):
            a = a.reshape(M, mb, *a.shape[1:])
            pad = jnp.zeros((S - 1,) + a.shape[1:], a.dtype)
            return jnp.concatenate([a, pad], axis=0) if S > 1 else a

        xs, bs = to_stream(x), to_stream(bias)

        tick = nn.scan(
            _PipelineTick,
            variable_broadcast="params",   # stage weights shared across ticks
            # params init once (broadcast); dropout fresh per tick
            split_rngs={"params": False, "dropout": True},
            in_axes=0, out_axes=0,
            length=M + S - 1,
        )
        state0 = (jnp.zeros((S, mb) + x.shape[1:], x.dtype),
                  jnp.zeros((S, mb) + bias.shape[1:], bias.dtype))
        _, ys = tick(self.body_cls, self.body_args, self.num_layers // S,
                     self.has_bias, deterministic, name="pipeline")(
            state0, (xs, bs))
        # ys[t] is microbatch t-(S-1); the first S-1 ticks are warmup bubble
        return ys[S - 1:].reshape(x.shape)
