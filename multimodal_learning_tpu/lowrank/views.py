"""View construction + adjacency for the M3LR t-SVD constraint.

Reference ``MIA 2022/train_test_tSVD.py``:
- ``update_adj_tensor`` (``:57-70``): per view, row-normalised Gram
  ``F.normalize(feat @ feat.T)``.
- view sets for n_views in {2, 4, 6, 8} mixing student / EMA / fused /
  cross-modal-mixup features (``:300-360``).  The fused view is detached
  (``:311``); EMA features carry no gradient by construction.
"""
from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp


def update_adj_tensor(feats: List[jnp.ndarray]) -> jnp.ndarray:
    """[V] list of [B, D] -> [V, B, B] row-normalised Grams."""

    def one(f):
        g = f @ f.T
        return g / jnp.maximum(
            jnp.linalg.norm(g, axis=1, keepdims=True), 1e-12)

    return jnp.stack([one(f) for f in feats])


def build_view_features(n_views: int, fuse, ema_fuse, path, ema_path,
                        omic, ema_omic):
    """Returns (feats1, feats2): the path-modality and omic-modality view
    lists (``train_test_tSVD.py:300-360``)."""
    fuse_d = jax.lax.stop_gradient(fuse)
    norm_fuse = ema_fuse / jnp.max(ema_fuse)
    norm_path = ema_path / jnp.max(ema_path)
    norm_omic = ema_omic / jnp.max(ema_omic)
    if n_views == 2:
        return [path, ema_path], [omic, ema_omic]
    if n_views == 4:
        return ([fuse_d, ema_fuse, path, ema_path],
                [fuse_d, ema_fuse, omic, ema_omic])
    if n_views == 6:
        return ([fuse_d, ema_fuse, path, ema_path,
                 0.9 * norm_path + 0.1 * norm_omic,
                 0.8 * norm_path + 0.2 * norm_omic],
                [fuse_d, ema_fuse, omic, ema_omic,
                 0.9 * norm_omic + 0.1 * norm_path,
                 0.8 * norm_omic + 0.2 * norm_path])
    if n_views == 8:
        mixes_p = [w * norm_path + (1 - w) * norm_omic
                   for w in (0.9, 0.8, 0.7, 0.6)]
        mixes_o = [w * norm_omic + (1 - w) * norm_path
                   for w in (0.9, 0.8, 0.7, 0.6)]
        return ([fuse_d, ema_fuse, path, ema_path] + mixes_p,
                [fuse_d, ema_fuse, omic, ema_omic] + mixes_o)
    raise NotImplementedError(f"n_views={n_views}")
