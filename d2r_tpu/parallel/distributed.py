"""Multi-host (pod-scale) process initialisation.

The reference is single-process single-GPU (SURVEY.md section 2.9, ref
run.sh / modules/train.py). On TPU the scale-out unit is a pod slice: one
Python process per host, each owning its local chips, all participating in
one global SPMD program over `jax.devices()` (global across hosts).

This module wraps ``jax.distributed.initialize`` and the per-process data
contract:

  * every process computes the SAME deterministic global batch order
    (seeded numpy shuffle, `data/dataset.py::DataLoader._index_batches`);
  * each process materialises only its contiguous 1/num_processes slice of
    each global batch (``DataLoader(process_shard=...)``);
  * `parallel/mesh.py::shard_batch` reassembles the global array with
    ``jax.make_array_from_process_local_data`` — no cross-host data motion:
    each host's slice lands on its local chips and the jitted step sees one
    global (batch, ...) array.

On Cloud TPU pods ``jax.distributed.initialize()`` auto-detects everything
from the metadata server; explicit coordinator flags exist for CPU/GPU
clusters and for the 2-process CPU integration test
(tests/test_multihost.py, tools/multihost_smoke.py).
"""

from __future__ import annotations

import functools
import logging
from typing import Optional

import jax

logger = logging.getLogger(__name__)

_INITIALIZED = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[str] = None,
    auto: bool = False,
) -> None:
    """Join the multi-process runtime. No-op when nothing multi-host is
    requested (the common single-host path must not pay a coordinator
    round-trip or fail off-pod).

    Call BEFORE any other jax API touches the backend. ``auto=True`` (the
    CLI's ``--num_processes -1``) calls ``jax.distributed.initialize()``
    bare — on a Cloud TPU pod slice jax auto-detects coordinator/rank/world
    from the TPU metadata.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return
    if auto:
        jax.distributed.initialize()
        _INITIALIZED = True
        logger.info("multi-host runtime up (auto): process %d/%d",
                    jax.process_index(), jax.process_count())
        return
    if coordinator_address is None and num_processes is None:
        return  # single-host: nothing to do
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None and num_processes > 0:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids:
        kwargs["local_device_ids"] = [
            int(d) for d in str(local_device_ids).split(",")]
    jax.distributed.initialize(**kwargs)
    _INITIALIZED = True
    logger.info("multi-host runtime up: process %d/%d, %d local / %d global "
                "devices", jax.process_index(), jax.process_count(),
                jax.local_device_count(), jax.device_count())


def warmup_collectives(mesh=None) -> None:
    """Connect the cross-process collective transport cliques NOW, while the
    processes are still tightly synchronized from ``initialize``.

    Without this, the first real collective fires inside the first jitted
    train step — after a multi-minute per-process XLA compile whose skew
    (on oversubscribed CI hosts: tests/test_multihost.py runs two ranks on
    one core) can exceed the transport's connect timeout. Gloo's TCP
    full-mesh connect then fails with "Gloo context initialization failed:
    Connect timeout" even though the same pair of processes connects fine
    when both arrive promptly (verified empirically). Once a clique is
    connected it is reused by every later collective, so one tiny psum per
    device group de-risks the whole run. No-op single-process.
    """
    if jax.process_count() == 1:
        return
    import numpy as np
    from jax.experimental import multihost_utils
    # full-device clique (covers pure-dp programs and the eval allgather)
    multihost_utils.sync_global_devices("d2r_tpu_collective_warmup")
    if mesh is None:
        return
    # per-axis subgroup cliques (dp x tp meshes: GSPMD all-reduces over one
    # axis span only that axis's device subsets)
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map
    for ax in mesh.axis_names:
        if mesh.shape[ax] <= 1:
            continue
        f = jax.jit(shard_map(
            functools.partial(jax.lax.psum, axis_name=ax),
            mesh=mesh, in_specs=P(), out_specs=P()))
        with mesh:
            # host numpy input: placed replicated on every process (a
            # device-committed array could not enter a multi-process jit)
            np.asarray(f(np.zeros((8,), np.float32)))  # fetch = sync
    logger.info("collective warmup done (%d processes)", jax.process_count())


def process_shard() -> tuple:
    """(process_index, process_count) — the DataLoader sharding contract."""
    return jax.process_index(), jax.process_count()


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def fetch_local_rows(x):
    """Host-fetch the rows of a batch-sharded global array that live on THIS
    process's devices, in global-index order.

    Single-process (and fully-replicated arrays): a plain ``np.asarray``.
    Multi-process: a global jit output sharded over the data axis is not
    fully addressable, so ``np.asarray`` would raise; instead concatenate
    the local shards (dedup'd across model-axis replicas) — these are
    exactly the rows this process contributed via
    ``make_array_from_process_local_data``, so they pair 1:1 with the
    process-local labels from ``DataLoader(process_shard=...)``.
    """
    import numpy as np
    if jax.process_count() == 1 or getattr(x, "is_fully_replicated", False):
        return np.asarray(x)
    rows = {}
    for s in x.addressable_shards:
        start = s.index[0].start or 0
        if start not in rows:
            rows[start] = np.asarray(s.data)
    return np.concatenate([rows[k] for k in sorted(rows)], axis=0)


def allgather_1d(values) -> "list":
    """Gather variable-length per-process 1-D int lists into the identical
    global list on every process (eval metrics must be computed over ALL
    samples — ref modules/train.py:174-188 computes them single-process).

    Lengths differ across processes (the wrap-pad ``valid`` mask is sliced
    per process), so gather lengths first, pad to the max, gather, trim.
    """
    import numpy as np
    if jax.process_count() == 1:
        return list(values)
    from jax.experimental import multihost_utils
    local = np.asarray(list(values), np.int64)
    lengths = multihost_utils.process_allgather(
        np.asarray([local.size], np.int64))
    lengths = np.asarray(lengths).reshape(-1)
    width = int(lengths.max())
    padded = np.full((width,), -1, np.int64)
    padded[: local.size] = local
    stacked = np.asarray(multihost_utils.process_allgather(padded))
    stacked = stacked.reshape(jax.process_count(), width)
    out: list = []
    for row, n in zip(stacked, lengths):
        out.extend(row[: int(n)].tolist())
    return out


def local_batch_size(global_batch_size: int) -> int:
    """Per-process slice of the global batch; multi-host requires exact
    divisibility (static shapes are a framework invariant)."""
    n = jax.process_count()
    if global_batch_size % n != 0:
        raise ValueError(
            f"global batch size {global_batch_size} must be divisible by "
            f"the process count {n}: every process materialises an "
            f"identical static-shape slice")
    return global_batch_size // n
