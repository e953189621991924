"""Supervised contrastive loss (Khosla et al. 2020).

Reference ``MIA 2022/CL_utils/supcon_loss.py:11-99`` ('all' contrast mode).
Functional: ``features [B, V, D]`` (V views), optional integer ``labels [B]``
or explicit ``mask [B, B]``.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def supcon_loss(features: jnp.ndarray, labels: Optional[jnp.ndarray] = None,
                mask: Optional[jnp.ndarray] = None, temperature: float = 0.07,
                base_temperature: float = 0.07,
                contrast_mode: str = "all") -> jnp.ndarray:
    if features.ndim < 3:
        raise ValueError("`features` needs to be [bsz, n_views, ...]")
    b, v = features.shape[0], features.shape[1]
    feats = features.reshape(b, v, -1)

    if labels is not None and mask is not None:
        raise ValueError("Cannot define both `labels` and `mask`")
    if labels is None and mask is None:
        mask = jnp.eye(b, dtype=jnp.float32)
    elif labels is not None:
        labels = labels.reshape(-1, 1)
        mask = (labels == labels.T).astype(jnp.float32)
    else:
        mask = mask.astype(jnp.float32)

    contrast_feature = feats.transpose(1, 0, 2).reshape(b * v, -1)
    if contrast_mode == "one":
        anchor_feature, anchor_count = feats[:, 0], 1
    elif contrast_mode == "all":
        anchor_feature, anchor_count = contrast_feature, v
    else:
        raise ValueError(f"Unknown mode: {contrast_mode}")

    logits = anchor_feature @ contrast_feature.T / temperature
    logits = logits - jax.lax.stop_gradient(jnp.max(logits, axis=1,
                                                    keepdims=True))
    mask = jnp.tile(mask, (anchor_count, v))
    n = b * anchor_count
    logits_mask = 1.0 - jnp.eye(n, b * v, dtype=jnp.float32)
    mask = mask * logits_mask

    exp_logits = jnp.exp(logits) * logits_mask
    log_prob = logits - jnp.log(jnp.sum(exp_logits, axis=1, keepdims=True))
    mean_log_prob_pos = jnp.sum(mask * log_prob, axis=1) / jnp.maximum(
        jnp.sum(mask, axis=1), 1e-12)
    loss = -(temperature / base_temperature) * mean_log_prob_pos
    return jnp.mean(loss.reshape(anchor_count, b))
