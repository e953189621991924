"""One-class-SVM loss weighting (AEKD alternative).

Reference ``MIA 2022/CL_utils/optimization.py:16-57``: stack per-loss
gradient vectors, (optionally) normalise, fit a one-class SVM on the
precomputed Gram, and turn the dual coefficients into per-loss weights.
Host-side by nature (sklearn's SMO solver); the reference left it mostly
unused but the capability is kept.
"""
from __future__ import annotations

import numpy as np
from sklearn.svm import OneClassSVM


def find_optimal_svm(vecs: np.ndarray, nu: float = -1,
                     is_norm: bool = True) -> np.ndarray:
    """vecs: [m, B, D] per-loss per-sample gradients (or [m, D]).
    Returns per-loss weights [m]."""
    vecs = np.asarray(vecs, dtype=np.float64)
    m = vecs.shape[0]
    vec_mean = vecs.reshape(m, -1) if vecs.ndim == 2 else \
        vecs.reshape(m, vecs.shape[1], -1).mean(axis=1)
    vec_norm = np.linalg.norm(vec_mean, axis=1, keepdims=True)
    if is_norm:
        vec_mean = vec_mean / np.maximum(vec_norm, 1e-12)
    G = vec_mean @ vec_mean.T

    if nu == -1:
        nu = 1.0 / m
    nu = float(np.clip(nu, 1.0 / m, 1.0))

    svm = OneClassSVM(kernel="precomputed", nu=nu, tol=1e-6)
    svm.fit(G)
    ret = np.zeros(m)
    ret[svm.support_] = svm.dual_coef_ / (m * nu)
    if is_norm:
        ret = ret / np.maximum(vec_norm.reshape(-1), 1e-12)
        ret = ret / max(ret.sum(), 1e-12)
    return ret.astype(np.float32)
