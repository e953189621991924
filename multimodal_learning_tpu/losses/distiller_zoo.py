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

import math
from typing import List, Sequence, Tuple

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
    """CC (``CC.py:14-17``, the author-shared version the reference runs
    live): ``delta = |f_s - f_t|``, then the mean over consecutive-sample
    pairs of ``dot(delta[i], delta[i+1])`` — congruence of the error
    patterns of neighbouring batch rows.  (The similarity-preserving variant
    in ``CC.py:20-42`` is commented out upstream.)"""
    delta = jnp.abs(f_s - f_t)
    return jnp.mean(jnp.sum(delta[:-1] * delta[1:], axis=1))


class VIDHead(nn.Module):
    """Variational Information Distillation regressor: predicts the teacher
    feature mean from the student feature; per-channel log-variance is a
    learned parameter (``VID.py:18-54``).  The reference's three conv1x1
    layers are bias-free Denses here (1x1 conv on a vector IS a Dense);
    ``init_pred_var``/``eps`` follow ``VID.py:17`` exactly."""
    out_dim: int
    mid_dim: int = 128
    init_pred_var: float = 5.0
    eps: float = 1e-5

    @nn.compact
    def __call__(self, f_s, f_t):
        dense = lambda d: nn.Dense(d, use_bias=False,
                                   kernel_init=torch_linear_default)
        h = nn.relu(dense(self.mid_dim)(f_s))
        h = nn.relu(dense(self.mid_dim)(h))
        mean = dense(self.out_dim)(h)
        init_alpha = math.log(math.exp(self.init_pred_var - self.eps) - 1.0)
        alpha = self.param(
            "log_scale", lambda k, s: jnp.full(s, init_alpha),
            (self.out_dim,))
        var = jnp.log1p(jnp.exp(alpha)) + self.eps     # softplus + eps
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
    agreement, per layer: ``sum / bsz / 1000 * 3`` (``AB.py:16-31``).  The
    reference's per-layer weights ``2^(i-n+1)`` are the caller's job."""
    loss = ((f_s + margin) ** 2 * ((f_s > -margin) & (f_t <= 0))
            + (f_s - margin) ** 2 * ((f_s <= margin) & (f_t > 0)))
    per_sample = jnp.sum(loss.reshape(f_s.shape[0], -1), axis=1)
    return jnp.mean(per_sample) / 1000.0 * 3.0


def factor_transfer_loss(factor_s: jnp.ndarray, factor_t: jnp.ndarray,
                         p1: int = 2, p2: int = 1) -> jnp.ndarray:
    """FT (NeurIPS'18): Lp2 between l2-normalised factors (``FT.py:14-31``).
    4-D NHWC maps get the reference's factor extraction ``mean_c(f^p1)``
    first; pre-extracted (2-D) factors are used as-is."""

    def factor(f):
        if f.ndim == 4:
            f = jnp.mean(f ** p1, axis=-1)
        f = f.reshape(f.shape[0], -1)
        return f / jnp.maximum(jnp.linalg.norm(f, axis=1, keepdims=True),
                               1e-12)

    d = factor(factor_s) - factor(factor_t)
    if p2 == 1:
        return jnp.mean(jnp.abs(d))
    return jnp.mean(d ** p2)


def _kdsvd_basis(f: jnp.ndarray, n: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Truncated right-singular basis of the per-sample [HW, C] matrices
    (``KDSVD.py:47-66``): v [B, C, n] and s [B, n], each l2-normalised along
    dim 1 as the reference does; non-finite entries zeroed."""
    b, h, w, c = f.shape
    x = f.reshape(b, h * w, c)
    _, s, vh = jnp.linalg.svd(x, full_matrices=False)
    v = jnp.swapaxes(vh, -2, -1)                         # [B, C, m]
    fin = lambda a: jnp.where(jnp.isfinite(a), a, 0.0)
    v, s = fin(v[:, :, :n]), fin(s[:, :n])
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=1, keepdims=True), 1e-12)
    s = s / jnp.maximum(jnp.linalg.norm(s, axis=1, keepdims=True), 1e-12)
    return v, s


def _kdsvd_align(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """``align_rsv`` (``KDSVD.py:68-75``): signed column-matching of the
    student basis onto the teacher's."""
    cos = jnp.einsum("bcm,bcn->bmn", a, b)
    is_max = jnp.abs(cos) == jnp.max(jnp.abs(cos), axis=1, keepdims=True)
    mask = jnp.where(is_max, jnp.sign(cos), 0.0)
    return jnp.einsum("bcm,bmn->bcn", a, mask)


def kdsvd_loss(g_s: Sequence[jnp.ndarray],
               g_t: Sequence[jnp.ndarray], k: int = 1) -> List[jnp.ndarray]:
    """KDSVD (ECCV'18): distill the truncated right-singular bases of the
    flattened feature maps, RBF-correlated across consecutive layer pairs
    (``KDSVD.py:17-45``).  Maps NHWC; student bases take ``k+3`` columns,
    sign-aligned onto the teacher's ``k`` and scaled by the teacher's
    singular values; layer i>0 contributes the squared difference of the
    inter-layer RBF affinities, summed and divided by the batch size."""
    losses = []
    v_sb = v_tb = None
    for i, (f_s, f_t) in enumerate(zip(g_s, g_t)):
        v_t, s_t = _kdsvd_basis(jax.lax.stop_gradient(f_t), k)
        v_s, _ = _kdsvd_basis(f_s, k + 3)
        v_s = _kdsvd_align(v_s, v_t)
        v_t = v_t * s_t[:, None, :]
        v_s = v_s * s_t[:, None, :]
        if i > 0:
            s_rbf = jnp.exp(-(v_s[:, :, None, :] - v_sb[:, None, :, :]) ** 2
                            / 8.0)
            t_rbf = jnp.exp(-(v_t[:, :, None, :] - v_tb[:, None, :, :]) ** 2
                            / 8.0)
            l2 = (s_rbf - jax.lax.stop_gradient(t_rbf)) ** 2
            l2 = jnp.where(jnp.isfinite(l2), l2, 0.0)
            losses.append(jnp.sum(l2) / g_s[0].shape[0])
        v_sb, v_tb = v_s, v_t
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
