"""The 14 KD-baseline losses ("distiller zoo").

Functional JAX counterparts of ``MIA 2022/distiller_zoo/`` (= the S2 copy):
DistillKL (see ``kd.py``), feats_KL, HintLoss (FitNet), Attention (AT),
Similarity (SP, see ``kd.sp_loss``), Correlation (CC), VID, RKD, PKT, AB,
FactorTransfer (FT), KDSVD, FSP, NST.  The subset the reference actually
wires into the student loop operates on the 1-D feature vectors
(``train_test_path_multi_distill_v2.py:429-455``); the map-based losses (AT,
FSP, KDSVD, NST, AB) take [B, H, W, C] feature maps (NHWC).

All teacher inputs are expected pre-stop-gradiented by the caller, matching
the reference's ``.detach()`` call sites.
"""
from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..models.common import torch_linear_default

EPS = 1e-7


def feats_kl(f_s: jnp.ndarray, f_t: jnp.ndarray) -> jnp.ndarray:
    """KL between softmaxed feature vectors (``feats_KL.py:12-20``)."""
    log_p_s = jax.nn.log_softmax(f_s, axis=1)
    p_t = jax.nn.softmax(f_t, axis=1)
    safe_log = jnp.where(p_t > 0, jnp.log(jnp.maximum(p_t, 1e-38)), 0.0)
    return jnp.sum(p_t * (safe_log - log_p_s)) / f_s.shape[0]


def hint_loss(f_s: jnp.ndarray, f_t: jnp.ndarray) -> jnp.ndarray:
    """FitNet hint: plain MSE (``FitNet.py``)."""
    return jnp.mean((f_s - f_t) ** 2)


def attention_loss(g_s: Sequence[jnp.ndarray], g_t: Sequence[jnp.ndarray],
                   p: int = 2) -> List[jnp.ndarray]:
    """AT (Zagoruyko & Komodakis): L2 distance of l2-normalised spatial
    attention maps ``mean_c |A|^p`` per layer group (``AT.py``).
    Feature maps NHWC."""

    def at(f):
        a = jnp.mean(jnp.abs(f) ** p, axis=-1).reshape(f.shape[0], -1)
        return a / jnp.maximum(jnp.linalg.norm(a, axis=1, keepdims=True),
                               1e-12)

    return [jnp.mean((at(s) - at(t)) ** 2) for s, t in zip(g_s, g_t)]


def correlation_loss(f_s: jnp.ndarray, f_t: jnp.ndarray) -> jnp.ndarray:
    """CC: congruence of (projected) feature deltas (``CC.py``): mean squared
    difference of the pairwise sample-correlation matrices."""
    b = f_s.shape[0]

    def corr(f):
        f = f - f.mean(0, keepdims=True)
        f = f / jnp.maximum(jnp.linalg.norm(f, axis=1, keepdims=True), 1e-12)
        return f @ f.T

    return jnp.sum((corr(f_s) - corr(f_t)) ** 2) / (b * b)


class VIDHead(nn.Module):
    """Variational Information Distillation regressor: predicts the teacher
    feature mean from the student feature; per-channel log-variance is a
    learned parameter (``VID.py``)."""
    out_dim: int
    mid_dim: int = 128
    init_pred_var: float = 5.0

    @nn.compact
    def __call__(self, f_s, f_t):
        h = nn.relu(nn.Dense(self.mid_dim,
                             kernel_init=torch_linear_default)(f_s))
        h = nn.relu(nn.Dense(self.mid_dim,
                             kernel_init=torch_linear_default)(h))
        mean = nn.Dense(self.out_dim, kernel_init=torch_linear_default)(h)
        alpha = self.param(
            "log_scale", lambda k, s: jnp.full(
                s, float(jnp.log(jnp.exp(self.init_pred_var - 1.0) - 1.0))),
            (self.out_dim,))
        var = jnp.log1p(jnp.exp(alpha)) + 1.0          # softplus + 1
        neg_log_prob = 0.5 * (jnp.log(var) + (f_t - mean) ** 2 / var)
        return jnp.mean(neg_log_prob)


def _smooth_l1(x, y):
    d = jnp.abs(x - y)
    return jnp.mean(jnp.where(d < 1.0, 0.5 * d * d, d - 0.5))


def rkd_loss(f_s: jnp.ndarray, f_t: jnp.ndarray, w_d: float = 25.0,
             w_a: float = 50.0) -> jnp.ndarray:
    """Relational KD (CVPR'19): distance-wise + angle-wise Huber losses
    (``RKD.py:8-58``)."""

    def pdist(e):
        sq = jnp.sum(e ** 2, axis=1)
        d2 = sq[:, None] + sq[None, :] - 2 * (e @ e.T)
        off = 1.0 - jnp.eye(e.shape[0])
        # sqrt only where d2 is meaningfully positive: the raw sqrt's
        # gradient at the clamped diagonal zeros is ~1e6 and NaNs training
        safe = jnp.sqrt(jnp.where(d2 > 1e-12, d2, 1.0))
        return jnp.where(d2 > 1e-12, safe, 0.0) * off

    t_d = jax.lax.stop_gradient(pdist(f_t))
    n_off = f_t.shape[0] * (f_t.shape[0] - 1)
    t_d = t_d / jnp.maximum(jnp.sum(t_d) / n_off, 1e-12)
    s_d = pdist(f_s)
    s_d = s_d / jnp.maximum(jnp.sum(s_d) / n_off, 1e-12)
    loss_d = _smooth_l1(s_d, t_d)

    def angles(e):
        diff = e[None, :, :] - e[:, None, :]
        n2 = jnp.sum(diff ** 2, axis=2, keepdims=True)
        nd = diff * jax.lax.rsqrt(jnp.where(n2 > 1e-12, n2, 1.0))
        nd = jnp.where(n2 > 1e-12, nd, 0.0)
        return jnp.einsum("ijd,ikd->ijk", nd, nd).reshape(-1)

    loss_a = _smooth_l1(angles(f_s), jax.lax.stop_gradient(angles(f_t)))
    return w_d * loss_d + w_a * loss_a


def pkt_loss(f_s: jnp.ndarray, f_t: jnp.ndarray,
             eps: float = 1e-7) -> jnp.ndarray:
    """Probabilistic Knowledge Transfer: KL between cosine-similarity
    distributions (``PKT.py:17-43``)."""

    def prob(f):
        f = f / (jnp.linalg.norm(f, axis=1, keepdims=True) + eps)
        sim = (f @ f.T + 1.0) / 2.0
        return sim / jnp.sum(sim, axis=1, keepdims=True)

    p_s = prob(f_s)
    p_t = prob(f_t)
    return jnp.mean(p_t * jnp.log((p_t + eps) / (p_s + eps)))


def ab_loss(f_s: jnp.ndarray, f_t: jnp.ndarray,
            margin: float = 1.0) -> jnp.ndarray:
    """Activation Boundaries (AAAI'19): hinge on pre-activation sign
    agreement (``AB.py``)."""
    loss = ((f_s + margin) ** 2 * ((f_s > -margin) & (f_t <= 0))
            + (f_s - margin) ** 2 * ((f_s <= margin) & (f_t > 0)))
    return jnp.mean(jnp.sum(loss.reshape(f_s.shape[0], -1), axis=1))


def factor_transfer_loss(factor_s: jnp.ndarray,
                         factor_t: jnp.ndarray) -> jnp.ndarray:
    """FT (NeurIPS'18): L1 between l2-normalised flattened factors
    (``FT.py``)."""

    def norm(f):
        f = f.reshape(f.shape[0], -1)
        return f / jnp.maximum(jnp.linalg.norm(f, axis=1, keepdims=True),
                               1e-12)

    return jnp.mean(jnp.abs(norm(factor_s) - norm(factor_t)))


def kdsvd_loss(g_s: Sequence[jnp.ndarray],
               g_t: Sequence[jnp.ndarray], k: int = 4) -> List[jnp.ndarray]:
    """KDSVD (ECCV'18): distill truncated right-singular subspaces of the
    flattened feature maps, RBF-correlated across consecutive layers
    (``KDSVD.py``); simplified to per-layer subspace alignment."""
    losses = []
    for f_s, f_t in zip(g_s, g_t):
        b = f_s.shape[0]
        s_mat = f_s.reshape(b, -1)
        t_mat = jax.lax.stop_gradient(f_t.reshape(b, -1))
        _, _, v_s = jnp.linalg.svd(s_mat, full_matrices=False)
        _, _, v_t = jnp.linalg.svd(t_mat, full_matrices=False)
        kk = min(k, v_s.shape[0])
        # subspace alignment is sign-invariant: compare projectors
        p_s = v_s[:kk].T @ v_s[:kk]
        p_t = v_t[:kk].T @ v_t[:kk]
        losses.append(jnp.mean((p_s - p_t) ** 2))
    return losses


def fsp_loss(g_s: Sequence[jnp.ndarray],
             g_t: Sequence[jnp.ndarray]) -> List[jnp.ndarray]:
    """FSP (CVPR'17): MSE between Gram ("flow") matrices of consecutive
    layer pairs (``FSP.py``).  Maps NHWC; spatial dims of each pair must
    match (callers pool beforehand)."""
    losses = []
    for (s1, s2), (t1, t2) in zip(zip(g_s[:-1], g_s[1:]),
                                  zip(g_t[:-1], g_t[1:])):
        def flow(a, b):
            hw = a.shape[1] * a.shape[2]
            am = a.reshape(a.shape[0], hw, a.shape[3])
            bm = b.reshape(b.shape[0], hw, b.shape[3])
            return jnp.einsum("bpc,bpd->bcd", am, bm) / hw

        losses.append(jnp.mean((flow(s1, s2) - flow(t1, t2)) ** 2))
    return losses


def nst_loss(f_s: jnp.ndarray, f_t: jnp.ndarray) -> jnp.ndarray:
    """Neuron Selectivity Transfer: squared MMD with polynomial kernel over
    l2-normalised spatial activations (``NST.py``).  Maps NHWC."""
    b = f_s.shape[0]

    def prep(f):
        f = f.reshape(b, -1, f.shape[-1]).transpose(0, 2, 1)  # [B, C, HW]
        return f / jnp.maximum(jnp.linalg.norm(f, axis=2, keepdims=True),
                               1e-12)

    s = prep(f_s)
    t = jax.lax.stop_gradient(prep(f_t))

    def poly(a, b_):
        return jnp.mean((jnp.einsum("bcp,bdp->bcd", a, b_)) ** 2)

    return poly(s, s) + poly(t, t) - 2 * poly(s, t)
