"""Numeric normalisation helpers.

Semantics match the reference exactly, including where eps sits relative to
the root (ref: models/XModules.py:14-24 — ``norm = sqrt(sum(x^2)) + eps``,
NOT ``sqrt(sum(x^2) + eps)``), because the routing gates downstream are
sensitive to these small differences.
"""

from __future__ import annotations

import jax.numpy as jnp


def l2norm(x: jnp.ndarray, axis: int = -1, eps: float = 1e-8) -> jnp.ndarray:
    """L2-normalize along ``axis`` (ref: models/XModules.py:14-18)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True)) + eps
    return x / norm


def l1norm(x: jnp.ndarray, axis: int, eps: float = 1e-8) -> jnp.ndarray:
    """L1-normalize along ``axis`` (ref: models/XModules.py:20-24)."""
    norm = jnp.sum(jnp.abs(x), axis=axis, keepdims=True) + eps
    return x / norm


def torch_style_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """Equivalent of ``torch.nn.functional.normalize(x, p=2)``.

    torch divides by ``max(||x||, eps)`` (clamp, not add) — distinct from
    :func:`l2norm` above. Used by Block fusion (ref: models/XModules.py:543).
    """
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True))
    return x / jnp.maximum(norm, eps)
