"""Orthogonality (DSN difference) loss.

Reference ``MICCAI-2022/CL_utils/orthogonal_loss.py:11-32``: L2-normalise both
modality features per sample (norms stop-gradiented), then take the mean of
the squared cross-Gram ``(F1^T F2)^2``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def orth_loss(feat1: jnp.ndarray, feat2: jnp.ndarray) -> jnp.ndarray:
    b = feat1.shape[0]
    f1 = feat1.reshape(b, -1)
    f2 = feat2.reshape(b, -1)
    n1 = jax.lax.stop_gradient(jnp.linalg.norm(f1, axis=1, keepdims=True))
    n2 = jax.lax.stop_gradient(jnp.linalg.norm(f2, axis=1, keepdims=True))
    f1 = f1 / (n1 + 1e-6)
    f2 = f2 / (n2 + 1e-6)
    return jnp.mean((f1.T @ f2) ** 2)
