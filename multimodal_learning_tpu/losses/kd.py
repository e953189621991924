"""Prediction distillation losses.

Reference:
- ``pred_KD_loss`` (``MICCAI-2022/CL_utils/KD_losses.py:12-38``): MSE for the
  survival task; for grading ``KL(log p_s || exp(log p_t))`` where both inputs
  are already log-softmaxed.  ``per_sample=True`` returns the per-sample
  vector (S2 copy, ``MIA 2023/stage2.../KD_loss.py:14-20``).
- ``DistillKL`` (``MICCAI-2022/KD_loss.py:7-17``): temperature-softened KL on
  raw logits, scaled by T^2.
- ``SP_loss`` (``CL_utils/KD_losses.py:41-67``): similarity-preserving
  Gram-matrix MSE.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _kl_terms(log_p_student: jnp.ndarray, p_teacher: jnp.ndarray) -> jnp.ndarray:
    """Elementwise terms of ``F.kl_div(log_q, p, reduction='none')`` =
    ``p * (log p - log q)`` with the torch convention ``0 log 0 = 0``."""
    safe_log_p = jnp.where(p_teacher > 0, jnp.log(jnp.maximum(p_teacher, 1e-38)), 0.0)
    return p_teacher * safe_log_p - p_teacher * log_p_student


def pred_kd_loss(pred_s: jnp.ndarray, pred_t: jnp.ndarray, task: str = "grad",
                 per_sample: bool = False) -> jnp.ndarray:
    """Prediction-consistency loss between student and (EMA/frozen) teacher.

    grading: both args are log-probs; loss = sum KL terms / batch
    (``KD_losses.py:29-31``).  survival: MSE on hazards."""
    if task == "surv":
        return jnp.mean((pred_s - pred_t) ** 2)
    terms = _kl_terms(pred_s, jnp.exp(pred_t))
    if per_sample:
        return jnp.sum(terms, axis=1)
    return jnp.sum(terms) / pred_s.shape[0]


def distill_kl(logit_s: jnp.ndarray, logit_t: jnp.ndarray, T: float,
               per_sample: bool = False) -> jnp.ndarray:
    """Hinton KD: ``KL(softmax(t/T) || softmax(s/T)) * T^2`` averaged over the
    batch (``KD_loss.py:7-17``)."""
    log_p_s = jax.nn.log_softmax(logit_s / T, axis=1)
    p_t = jax.nn.softmax(logit_t / T, axis=1)
    terms = _kl_terms(log_p_s, p_t)
    if per_sample:
        return jnp.sum(terms, axis=1) * (T ** 2)
    return jnp.sum(terms) * (T ** 2) / logit_s.shape[0]


def sp_loss(f_s: jnp.ndarray, f_t: jnp.ndarray) -> jnp.ndarray:
    """Similarity-preserving loss: MSE between row-normalised Gram matrices
    (``KD_losses.py:41-67``).  The teacher side is stop-gradiented as in the
    reference's ``.detach()``."""
    f_t = jax.lax.stop_gradient(f_t)
    bsz = f_s.shape[0]
    f_s = f_s.reshape(bsz, -1)
    f_t = f_t.reshape(bsz, -1)

    def _norm_gram(f):
        g = f @ f.T
        return g / jnp.maximum(jnp.linalg.norm(g, axis=1, keepdims=True), 1e-12)

    diff = _norm_gram(f_t) - _norm_gram(f_s)
    return jnp.sum(diff * diff) / (bsz * bsz)
