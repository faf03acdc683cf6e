"""Orbax checkpointing.

The reference saves only the dev-best model state_dict and reloads it for
test (ref: modules/train.py:210-216,226-229); "resume" restarts the LR
schedule because optimiser state is never saved. We keep the same
best-on-dev-F1 policy and --load_path-compatible flag, but save params +
batch_stats (+ optionally the full optimiser state — a strict superset,
SURVEY.md section 5.4).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp


def _abs(path: str) -> str:
    return os.path.abspath(os.path.expanduser(path))


# --async_checkpoint: one process-wide AsyncCheckpointer so in-flight saves
# can be awaited from anywhere (orbax allows one outstanding save per
# checkpointer). The device->host snapshot happens synchronously inside
# save(); only the serialise-to-disk part runs in the background thread, so
# training can mutate (donate) the live state immediately after save returns.
_ASYNC_CKPTR: Optional[ocp.AsyncCheckpointer] = None


def _async_checkpointer() -> ocp.AsyncCheckpointer:
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _ASYNC_CKPTR


def wait_for_async_saves() -> None:
    """Block until every async checkpoint save is durable on disk. Call
    before READING a path that may have an in-flight save (the trainer does
    before its best-model test reload) and before process exit."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def save_checkpoint(path: str, state, include_opt_state: bool = False,
                    async_save: bool = False) -> None:
    """Save model state under ``path`` (a directory). With ``async_save``
    the write overlaps subsequent compute; durability points are
    :func:`wait_for_async_saves` (orbax still finalises atomically, so a
    crash mid-write never leaves a half-readable checkpoint directory)."""
    payload: Dict[str, Any] = {
        "params": state.params,
        "batch_stats": state.batch_stats,
    }
    if include_opt_state:
        payload["opt_state"] = state.opt_state
        payload["step"] = state.step
    path = _abs(path)
    if async_save:
        ckptr = _async_checkpointer()
        ckptr.wait_until_finished()  # one in-flight save at a time
        ckptr.save(path, args=ocp.args.StandardSave(payload), force=True)
        return
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, payload, force=True)


def _checkpoint_tree_metadata(path: str):
    """Top-level metadata tree of a saved checkpoint (dict of subtrees with
    ArrayMetadata leaves), or ``None`` when unavailable (legacy layouts)."""
    try:
        with ocp.StandardCheckpointer() as ckptr:
            tree = ckptr.metadata(path).item_metadata.tree
        return tree if isinstance(tree, dict) else None
    except Exception:  # noqa: BLE001 — metadata is an optimisation only
        return None


def restore_variables(path: str) -> Dict[str, Any]:
    """Restore a checkpoint as a raw ``{"params", "batch_stats"}`` variables
    dict for inference — no TrainState/optimizer template needed, so serving
    can load any checkpoint (with or without saved opt_state).

    When the checkpoint carries opt_state (``--save_opt_state`` /resume
    slots: AdamW moments ≈ 2x params), a partial restore skips it entirely
    instead of materialising ~3x the needed bytes just to drop them."""
    path = _abs(path)
    md = _checkpoint_tree_metadata(path)
    if md is not None:
        missing = {"params", "batch_stats"} - set(md)
        if missing:
            raise ValueError(
                f"checkpoint at {path} lacks {sorted(missing)}; found "
                f"{sorted(md)} — not a d2r_tpu model checkpoint")
        if not ({"opt_state", "step"} & set(md)):
            with ocp.StandardCheckpointer() as ckptr:
                return dict(ckptr.restore(path))
        template = jax.tree_util.tree_map(
            lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype),
            {k: md[k] for k in ("params", "batch_stats")})
        with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as ckptr:
            restored = ckptr.restore(
                path, args=ocp.args.PyTreeRestore(item=template,
                                                  partial_restore=True))
        return {"params": restored["params"],
                "batch_stats": restored["batch_stats"]}
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(path)
    missing = {"params", "batch_stats"} - set(restored)
    if missing:
        raise ValueError(
            f"checkpoint at {path} lacks {sorted(missing)}; found "
            f"{sorted(restored)} — not a d2r_tpu model checkpoint")
    return {"params": restored["params"],
            "batch_stats": restored["batch_stats"]}


# D2RConfig fields that determine the parameter tree's shape/topology — a
# mismatch between these and a checkpoint guarantees a wrong or failing
# restore. max_seq/batch/lr/... are deliberately absent: they are free to
# differ between training and reload.
GEOMETRY_FIELDS = ("bert_name", "vit_name", "embed_size", "num_head_IMRC",
                   "hid_IMRC", "hid_router", "num_cells", "path_hid",
                   "num_classes", "DR_step", "use_sentic_graph",
                   # scan_layers/pipeline_stages relayout the tower params
                   # (stacked (N,...) scan axis / (S, N/S, ...) pipeline
                   # axes) — same weights, different TREE, so both are
                   # geometry for restore purposes.
                   "scan_layers", "pipeline_stages")


def check_checkpoint_geometry(load_path: str, cfg) -> Optional[str]:
    """Cross-check ``cfg`` against the training-time ``config.json`` that
    the trainer writes beside ``best_model`` (self-describing checkpoints).

    Raises ``ValueError`` listing every differing :data:`GEOMETRY_FIELDS`
    entry — Orbax would otherwise either fail deep inside restore or, for
    same-shaped-but-different-meaning trees, silently load garbage. Returns
    the config.json path used, or ``None`` when the checkpoint predates
    config.json (old checkpoints stay loadable, unchecked).
    """
    from d2r_tpu.config import load_config_json

    root = _abs(load_path).rstrip("/")
    for cand in (os.path.join(root, "config.json"),
                 os.path.join(os.path.dirname(root), "config.json")):
        if not os.path.exists(cand):
            continue
        saved = load_config_json(cand)
        diffs = [(f, getattr(saved, f), getattr(cfg, f))
                 for f in GEOMETRY_FIELDS
                 if getattr(saved, f) != getattr(cfg, f)]
        if diffs:
            lines = "; ".join(f"{f}: checkpoint={a!r} vs flags={b!r}"
                              for f, a, b in diffs)
            raise ValueError(
                f"model geometry mismatch between {cand} and the current "
                f"flags — {lines}. Pass the training-time values (or fix "
                f"--load_path).")
        return cand
    return None


# --------------------------------------------------------------------------
# Preemption-safe resume (--auto_resume). The reference has no notion of
# resuming an interrupted run (ref: modules/train.py saves only the dev-best
# state_dict); on preemptible TPU pods this is table stakes, so the trainer
# can write a full-state checkpoint at every epoch boundary and continue an
# interrupted run bit-exactly (same data order, same dropout stream, same LR
# schedule position — tests/test_auto_resume.py pins equality against an
# uninterrupted run).
#
# Crash-safety protocol: array state alternates between two slot directories
# (epoch parity), and a small JSON meta file naming the valid slot is written
# LAST via atomic rename. A kill at any point leaves either the old meta
# (pointing at the intact previous slot) or the new one (pointing at the
# just-finalised slot) — never a meta that references a half-written
# checkpoint. Orbax itself finalises each slot atomically (tmp dir + rename).

RESUME_SUBDIR = "resume"
_RESUME_META = "resume_meta.json"


def _resume_meta_path(save_path: str) -> str:
    return os.path.join(_abs(save_path), RESUME_SUBDIR, _RESUME_META)


def save_resume_checkpoint(save_path: str, state, meta: Dict[str, Any]) -> None:
    """Write a full-state (params+batch_stats+opt_state+step) checkpoint for
    ``meta['epoch']`` completed epochs, then atomically publish ``meta``.

    The orbax save is collective (all hosts participate); the meta file is
    host-written by rank 0 only, after the collective save returns on every
    rank."""
    import json

    epoch = int(meta["epoch"])
    slot = f"slot_{epoch % 2}"
    root = os.path.join(_abs(save_path), RESUME_SUBDIR)
    save_checkpoint(os.path.join(root, slot), state, include_opt_state=True)
    if jax.process_index() == 0:
        payload = dict(meta, slot=slot)
        tmp = _resume_meta_path(save_path) + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(payload, f)
        os.replace(tmp, _resume_meta_path(save_path))


def load_resume_meta(save_path: str) -> Optional[Dict[str, Any]]:
    """Return the published resume meta, or None when there is nothing to
    resume (fresh run). A meta naming a missing slot directory (e.g. the
    checkpoint tree was manually pruned) is treated as nothing-to-resume
    rather than an error, with the reason in the returned dict being moot."""
    import json

    path = _resume_meta_path(save_path)
    if not os.path.exists(path):
        return None
    with open(path, "r", encoding="utf-8") as f:
        meta = json.load(f)
    slot_dir = os.path.join(_abs(save_path), RESUME_SUBDIR, meta["slot"])
    if not os.path.isdir(slot_dir):
        return None
    return meta


def restore_resume_checkpoint(save_path: str, state, meta: Dict[str, Any]):
    """Restore the full train state named by ``meta`` (from
    :func:`load_resume_meta`)."""
    slot_dir = os.path.join(_abs(save_path), RESUME_SUBDIR, meta["slot"])
    restored = restore_checkpoint(slot_dir, state)
    if restored.opt_state is state.opt_state:
        raise ValueError(
            f"resume checkpoint at {slot_dir} has no opt_state — it was not "
            f"written by save_resume_checkpoint")
    return restored


def _rehost(tree):
    """Orbax restores leaves COMMITTED to the default device; a later jit
    call whose other arguments are sharded over a >1-device mesh then fails
    with 'incompatible devices' instead of re-placing them. Convert restored
    leaves to host numpy (bit-identical) so jit places them exactly like
    fresh-init/pretrained params. Multi-host restores keep their arrays: the
    template there is built with the mesh sharding (create_train_state
    mesh=...), so orbax already restored globals with the right placement
    (and per-process np.asarray on a global array would be wrong anyway)."""
    import numpy as np

    if jax.process_count() > 1:
        return tree
    return jax.tree_util.tree_map(
        lambda x: np.asarray(x) if isinstance(x, jax.Array) else x, tree)


def restore_checkpoint(path: str, state):
    """Restore params/batch_stats (and opt_state if present) into ``state``.

    Whether the checkpoint carries opt_state is decided from its METADATA,
    not by trying the full restore and swallowing whatever raises: a
    structural mismatch in a checkpoint that DOES have opt_state (e.g. a
    --freeze_towers / --optimizer_impl toggle across an interruption) must
    fail loudly with the real error, not silently degrade to a params-only
    restore that loses the schedule position."""
    path = _abs(path)
    template: Dict[str, Any] = {
        "params": state.params,
        "batch_stats": state.batch_stats,
    }
    md = _checkpoint_tree_metadata(path)
    with ocp.StandardCheckpointer() as ckptr:
        if md is not None:
            if "opt_state" in md:
                restored = _rehost(ckptr.restore(path, template | {
                    "opt_state": state.opt_state, "step": state.step}))
                return state.replace(
                    params=restored["params"],
                    batch_stats=restored["batch_stats"],
                    opt_state=restored["opt_state"],
                    step=restored["step"],
                )
            restored = _rehost(ckptr.restore(path, template))
            return state.replace(
                params=restored["params"],
                batch_stats=restored["batch_stats"],
            )
        # metadata unavailable (legacy layout): probe-and-fallback
        try:
            restored = _rehost(ckptr.restore(path, template | {
                "opt_state": state.opt_state, "step": state.step}))
            return state.replace(
                params=restored["params"],
                batch_stats=restored["batch_stats"],
                opt_state=restored["opt_state"],
                step=restored["step"],
            )
        except Exception:
            restored = _rehost(ckptr.restore(path, template))
            return state.replace(
                params=restored["params"],
                batch_stats=restored["batch_stats"],
            )
