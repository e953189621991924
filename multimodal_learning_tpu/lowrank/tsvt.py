"""Tensor singular value thresholding (t-SVT) — the M3LR low-rank operator.

The reference calls ``my_utils.TSVD_update_aux.update_aux(adj, Lambda/mu)``
(``MIA 2022/train_test_tSVD.py:387,404``) but that module is **missing from
the repo** (SURVEY §0).  This is a reconstruction from the t-SVD-MSC
literature the paper builds on (Xie et al., "On Unifying Multi-view
Self-Representation for Clustering by Tensor Multi-Rank Minimization", IJCV
2018; Lu et al., tensor robust PCA ``prox_tnn``):

    aux = argmin_X  tau * ||X||_TNN + 1/2 ||X - adj||_F^2
        = ifft( SVT_tau( fft(adj, axis=-1) ) )

with the t-SVD-MSC *rotation*: the stacked [B, B, V] adjacency tensor is
rotated to [B, V, B] so the FFT runs along the sample axis (length B) and
each frontal slice is a thin [B, V] matrix — V tiny SVDs of B x V matrices
per step instead of B x B, and the low-rank coupling acts across views for
every sample pair, which is the variant the t-SVD-MSC paper reports as
superior.  ``rotate=False`` gives the unrotated convention (fft over views).

TPU notes: the slices are batched into ONE ``jnp.linalg.svd`` call (complex64)
— shapes are [B, B, V] with B = batch (16) and V = n_views (2-8), so the
whole operator is microseconds and lives inside the jitted train step; the
reference would have done FFT+SVD on the host between batches.  The operator
is applied to a stop-gradiented adjacency (the reference detaches before
``update_aux``, ``train_test_tSVD.py:372-374``), so no custom VJP is needed;
gradients reach the encoders only through the Frobenius penalty.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _svt_slices(slices: jnp.ndarray, tau) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched complex SVT: slices [n, p, q] -> (thresholded, sum of kept
    singular values)."""
    u, s, vh = jnp.linalg.svd(slices, full_matrices=False)
    s_shrunk = jnp.maximum(s - tau, 0.0)
    out = jnp.einsum("npk,nk,nkq->npq", u, s_shrunk.astype(u.dtype), vh)
    return out, jnp.sum(s_shrunk)


def update_aux(adj: jnp.ndarray, tau, rotate: bool = True
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """t-SVT prox on the stacked adjacency tensor.

    adj: [B, B, V] (views stacked on dim 2, ``train_test_tSVD.py:385``)
    tau: threshold = Lambda_global / mu (``:387``)
    Returns (aux [B, B, V], tensor nuclear norm of the result).
    """
    adj = jax.lax.stop_gradient(adj)
    if rotate:
        x = jnp.transpose(adj, (0, 2, 1))      # [B, V, B]
    else:
        x = adj
    n3 = x.shape[-1]
    xf = jnp.fft.fft(x, axis=-1)               # frontal slices along last axis
    slices = jnp.moveaxis(xf, -1, 0)           # [n3, B, V]
    out, tnn = _svt_slices(slices, tau)
    xf = jnp.moveaxis(out, 0, -1)
    x = jnp.real(jnp.fft.ifft(xf, axis=-1))
    if rotate:
        x = jnp.transpose(x, (0, 2, 1))
    return x.astype(jnp.float32), tnn / n3


def tensor_nuclear_norm(adj: jnp.ndarray, rotate: bool = True) -> jnp.ndarray:
    """TNN of the stacked tensor (sum of Fourier-domain singular values / n3;
    reference diagnostic ``tensor_nuclear_norm``, ``train_test_tSVD.py:91-96``)."""
    x = jnp.transpose(adj, (0, 2, 1)) if rotate else adj
    n3 = x.shape[-1]
    xf = jnp.moveaxis(jnp.fft.fft(x, axis=-1), -1, 0)
    s = jnp.linalg.svd(xf, compute_uv=False)
    return jnp.sum(s) / n3
