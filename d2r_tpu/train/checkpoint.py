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


def save_checkpoint(path: str, state, include_opt_state: bool = False) -> None:
    """Save model state under ``path`` (a directory)."""
    payload: Dict[str, Any] = {
        "params": state.params,
        "batch_stats": state.batch_stats,
    }
    if include_opt_state:
        payload["opt_state"] = state.opt_state
        payload["step"] = state.step
    path = _abs(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, payload, force=True)


def restore_variables(path: str) -> Dict[str, Any]:
    """Restore a checkpoint as a raw ``{"params", "batch_stats"}`` variables
    dict for inference — no TrainState/optimizer template needed, so serving
    can load any checkpoint (with or without saved opt_state)."""
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(_abs(path))
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


def restore_checkpoint(path: str, state):
    """Restore params/batch_stats (and opt_state if present) into ``state``."""
    path = _abs(path)
    with ocp.StandardCheckpointer() as ckptr:
        template: Dict[str, Any] = {
            "params": state.params,
            "batch_stats": state.batch_stats,
        }
        try:
            restored = ckptr.restore(path, template | {
                "opt_state": state.opt_state, "step": state.step})
            return state.replace(
                params=restored["params"],
                batch_stats=restored["batch_stats"],
                opt_state=restored["opt_state"],
                step=restored["step"],
            )
        except Exception:
            restored = ckptr.restore(path, template)
            return state.replace(
                params=restored["params"],
                batch_stats=restored["batch_stats"],
            )
