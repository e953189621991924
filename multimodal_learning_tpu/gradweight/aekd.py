"""Gradient-guided teacher weighting (GK-Refine / AEKD / GKM).

Reference mechanics (``MICCAI-2022/train_test_path_multi_distill.py:41-141``,
``MIA 2022/train_test_path_multi_distill_v2.py:50-132``,
``MIA 2023/stage2.../train_test_path_multi_distill.py:81-128``):
each candidate loss is backpropagated *separately* with
``backward(retain_graph=True)`` just to read the gradient it induces at the
student feature ``feat_s`` via a hook — k+1 full network backwards per step.

TPU-native formulation: every loss here is a function of ``feat_s`` through a
tiny head (fc_new2 / a linear embed / the CRD score math), so the same
gradients are k cheap ``jax.grad`` pulls from the scalar loss to ``feat_s``
only — no ResNet backward, identical values.  The weights are treated as
constants (the reference reads detached ``grad.data``), so everything jits
into the train step with ``stop_gradient``.

- ``aekd_scale``:   cosine-Gram row sums (``AEKD_loss``, ``:58-70``)
- ``aekd_v2_gate``: cos(KD grad, CE grad) > 0 binary gate, optionally
  per-sample (``AEKD_loss_v2``, ``:74-141``)
- ``momentum_scale_update``: EMA of the scale + threshold binarisation
  (MIA-2022 ``momentum_AEKD_loss``, ``..._v2.py:89-132``)
- ``gk_refine_thresh_weights``: per-sample grad-cosine thresholding (S2
  ``GK_refine_thresh``, ``:81-128``)
"""
from __future__ import annotations

from typing import Callable, List, Sequence, Tuple

import jax
import jax.numpy as jnp


def feature_grads(loss_fns: Sequence[Callable[[jnp.ndarray], jnp.ndarray]],
                  feat: jnp.ndarray) -> List[jnp.ndarray]:
    """Gradient of each scalar loss wrt the feature tensor.

    Equivalent to the reference's per-loss ``backward(retain_graph=True)`` +
    ``feat_s.register_hook`` (``:45-56``) — but pulled only through the heads.
    """
    return [jax.lax.stop_gradient(jax.grad(fn)(feat)) for fn in loss_fns]


def aekd_scale(grads: Sequence[jnp.ndarray], n_kd: int) -> jnp.ndarray:
    """``AEKD_loss`` scale (``:58-62``): stack all gradients (KD losses
    first, CE last), cosine Gram x n_kd, row sums.  Returns [len(grads)]."""
    G = jnp.stack([g.reshape(-1) for g in grads])
    norms = jnp.linalg.norm(G, axis=1, keepdims=True)
    rel = (G @ G.T) * n_kd / (norms @ norms.T)
    return jax.lax.stop_gradient(jnp.sum(rel, axis=1))


def aekd_total(scale: jnp.ndarray,
               kd_losses: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """``total = dot(scale[:-1], losses)`` (``:68``) — the CE slot's weight is
    dropped.  Requires CE gradients appended (the reference crashes
    otherwise)."""
    k = len(kd_losses)
    return jnp.dot(scale[:k], jnp.stack(kd_losses))


def aekd_v2_gate(kd_grads: Sequence[jnp.ndarray], ce_grad: jnp.ndarray,
                 kd_losses: Sequence[jnp.ndarray],
                 per_sample: bool = False,
                 batch_size: int = 0) -> jnp.ndarray:
    """``AEKD_loss_v2``: keep a KD loss iff its feature-gradient points the
    same way as the CE gradient (``:123-136``).

    per_sample=True: gradients/losses are per-sample ([B, D] grads from
    per-sample losses, losses [B] each); gate is [B, n_kd] and the total is
    ``sum(gate * losses) / batch_size``.
    """
    if per_sample:
        K = jnp.stack([g for g in kd_grads], axis=1)          # [B, n, D]
        c = ce_grad[:, :, None]                               # [B, D, 1]
        num = jnp.einsum("bnd,bdo->bn", K, c)
        den = (jnp.linalg.norm(K, axis=2)
               * jnp.linalg.norm(ce_grad, axis=1, keepdims=True))
        sim = num / jnp.maximum(den, 1e-12)
        gate = jax.lax.stop_gradient((sim > 0).astype(jnp.float32))
        losses = jnp.stack(kd_losses, axis=1)                 # [B, n]
        return jnp.sum(gate * losses) / batch_size
    K = jnp.stack([g.reshape(-1) for g in kd_grads])
    c = ce_grad.reshape(-1)
    sim = (K @ c) / jnp.maximum(
        jnp.linalg.norm(K, axis=1) * jnp.linalg.norm(c), 1e-12)
    gate = jax.lax.stop_gradient((sim > 0).astype(jnp.float32))
    return jnp.sum(gate * jnp.stack(kd_losses))


def momentum_aekd_scale(grads: Sequence[jnp.ndarray],
                        ema_scale: jnp.ndarray, grads_m: float,
                        thresh: float, use_thresh: bool
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """MIA-2022 ``momentum_AEKD_loss`` (``..._v2.py:89-132``): cosine Gram of
    the feature gradients (KD losses first, CE last), optionally binarised
    entrywise by ``thresh``, row-summed, then EMA'd across steps with
    momentum ``grads_m``.  Returns (mo_scale, mo_scale) — the same EMA is
    both the weights and the carried state."""
    G = jnp.stack([g.reshape(-1) for g in grads])
    norms = jnp.linalg.norm(G, axis=1, keepdims=True)
    rel = (G @ G.T) / jnp.maximum(norms @ norms.T, 1e-12)
    if use_thresh:
        rel = (rel > thresh).astype(jnp.float32)
    scale = jnp.sum(rel, axis=1)
    new_ema = grads_m * ema_scale + (1.0 - grads_m) * scale
    new_ema = jax.lax.stop_gradient(new_ema)
    return new_ema, new_ema


def gk_refine_param_space(loss_fns, params, exclude: str = "fc_new2"
                          ) -> jnp.ndarray:
    """MIA-2022 parameter-space ``GK_refine`` (``..._v2.py:50-86``): each
    loss's gradient wrt all student params except the classifier head,
    cosine-Gram row sums.  loss_fns: callables params -> scalar, KD losses
    first, CE last.  Returns scale [len(loss_fns)]."""

    def flat_grad(fn):
        g = jax.grad(fn)(params)
        leaves = [(path, leaf) for path, leaf in
                  jax.tree_util.tree_leaves_with_path(g)]
        kept = [leaf.reshape(-1) for path, leaf in leaves
                if exclude not in jax.tree_util.keystr(path)]
        return jnp.concatenate(kept)

    G = jnp.stack([jax.lax.stop_gradient(flat_grad(fn)) for fn in loss_fns])
    norms = jnp.linalg.norm(G, axis=1, keepdims=True)
    rel = (G @ G.T) / jnp.maximum(norms @ norms.T, 1e-12)
    return jax.lax.stop_gradient(jnp.sum(rel, axis=1))


def gk_refine_thresh_weights(all_grads: Sequence[jnp.ndarray],
                             grads_thresh: float,
                             use_thresh: bool = True) -> jnp.ndarray:
    """S2 ``GK_refine_thresh`` (``stage2 ...distill.py:80-128``): per-sample
    pairwise cosine matrix over ALL loss gradients (KD losses first, CE
    last); each loss's weight is the row sum, binarised by ``grads_thresh``
    when ``use_thresh`` else ReLU-summed.  Returns [B, L] (caller drops the
    CE column, ``:117``)."""
    G = jnp.stack(all_grads, axis=1)                          # [B, L, D]
    Gn = G / jnp.maximum(jnp.linalg.norm(G, axis=2, keepdims=True), 1e-12)
    sim = jnp.einsum("bld,bmd->blm", Gn, Gn)                  # [B, L, L]
    if use_thresh:
        contrib = (sim > grads_thresh).astype(jnp.float32)
    else:
        contrib = jnp.maximum(sim, 0.0)
    return jax.lax.stop_gradient(jnp.sum(contrib, axis=2))
