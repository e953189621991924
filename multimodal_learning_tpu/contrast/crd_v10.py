"""CLAT stage-2 CRD (v10): class-structured positives from the memory bank.

Reference ``MIA 2023/stage2_unimodal_student/CL_utils/CRD_criterion_v10.py``:
- ``pos_extra='neighbors'``: for each query, the ``num_pos`` most
  cosine-similar same-class bank rows become positives, and the positive
  terms are similarity-weighted (``:70-80, 280-314``).
- ``pos_extra='centers'``: per-class KMeans cluster centres of the bank rows
  act as extra positives (same class) and extra negatives (other classes)
  (``:81-137``).
- per-query ``sample_weights`` multiply the per-sample NCE loss (``:241-276``).

The reference runs sklearn ``cosine_similarity`` and ``KMeans`` on the CPU
**inside the hot loop** (a host sync per step).  Here both are on-device:
the kNN is one [B, n_data] masked matmul + top-k, and KMeans is a fixed
10-iteration masked Lloyd's algorithm over the (replicated) bank — everything
stays inside the jitted step.

Faithfulness note: the reference multiplies the similarity row by the 0/1
class mask *before* the descending sort (``:71-74``), so masked-out zeros can
outrank negative same-class similarities; we keep that behaviour.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .crd import CRDBank, EPS, bank_update, set_z


def _l2n(x, axis=-1):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True),
                           1e-12)


def masked_kmeans(key: jax.Array, x: jnp.ndarray, mask: jnp.ndarray,
                  k: int, iters: int = 10) -> jnp.ndarray:
    """Lloyd's algorithm over the rows of ``x`` where ``mask``=1 (fixed
    shapes: excluded rows carry zero weight).  Returns [k, D] centres."""
    n = x.shape[0]
    # init: k distinct masked rows (gumbel top-k over the mask)
    g = jax.random.gumbel(key, (n,))
    scores = jnp.where(mask > 0, g, -jnp.inf)
    init_idx = jax.lax.top_k(scores, k)[1]
    centers = x[init_idx]

    def step(centers, _):
        d = jnp.sum((x[:, None, :] - centers[None, :, :]) ** 2, -1)  # [n, k]
        assign = jnp.argmin(d, axis=1)
        onehot = jax.nn.one_hot(assign, k) * mask[:, None]           # [n, k]
        tot = onehot.sum(0)[:, None]
        new = (onehot.T @ x) / jnp.maximum(tot, 1e-9)
        new = jnp.where(tot > 0, new, centers)  # keep empty clusters put
        return new, None

    centers, _ = jax.lax.scan(step, centers, None, length=iters)
    return centers


def class_centers(key: jax.Array, memory: jnp.ndarray,
                  class_mask: jnp.ndarray, num_pos: int) -> jnp.ndarray:
    """[C, num_pos-1, D] per-class centres (mean when num_pos==2, KMeans
    otherwise — ``CRD_criterion_v10.py:84-92``)."""
    C = class_mask.shape[0]
    mem = jax.lax.stop_gradient(memory)
    if num_pos == 2:
        w = class_mask / jnp.maximum(class_mask.sum(1, keepdims=True), 1e-9)
        return (w @ mem)[:, None, :]
    keys = jax.random.split(key, C)
    return jnp.stack([masked_kmeans(keys[c], mem, class_mask[c], num_pos - 1)
                      for c in range(C)])


def crd_v10_scores(
    bank: CRDBank, v1: jnp.ndarray, v2: jnp.ndarray,
    batch_label: jnp.ndarray, y: jnp.ndarray, idx: jnp.ndarray, *,
    class_mask: jnp.ndarray, num_pos: int, pos_extra: str,
    T: float = 0.07, momentum: float = 0.5,
    key: Optional[jax.Array] = None, update_bank: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray],
           Optional[jnp.ndarray], CRDBank]:
    """Returns (out_v1, out_v2, sim_for_s, sim_for_t, bank').

    idx: [B, 1+K] with slot 0 = the query itself; class_mask [C, n_data].
    ``sim_for_s`` weights the student-side loss (neighbors mode), i.e. the
    similarities from the teacher bank the student queries, and vice versa.
    """
    B = v1.shape[0]
    mem1 = jax.lax.stop_gradient(bank.memory_v1)
    mem2 = jax.lax.stop_gradient(bank.memory_v2)
    w1 = mem1[idx]   # [B, 1+K, D]
    w2 = mem2[idx]
    bmask = class_mask[batch_label]      # [B, n_data]
    sim1 = sim2 = None

    if pos_extra == "neighbors":
        def knn(mem, w):
            sim = _l2n(w[:, 0, :]) @ _l2n(mem).T     # [B, n_data]
            sim = bmask * sim                        # mask BEFORE sort (:71)
            vals, ids = jax.lax.top_k(sim, num_pos)
            return mem[ids], vals                    # [B, P, D], [B, P]

        knn1, sim1 = knn(mem1, w1)
        knn2, sim2 = knn(mem2, w2)
        w1 = jnp.concatenate([knn1, w1[:, 1:, :]], 1)
        w2 = jnp.concatenate([knn2, w2[:, 1:, :]], 1)
    elif pos_extra == "centers":
        k1, k2 = jax.random.split(key)
        c1 = class_centers(k1, mem1, class_mask, num_pos)  # [C, P-1, D]
        c2 = class_centers(k2, mem2, class_mask, num_pos)
        C = class_mask.shape[0]
        # other-class ids per sample (negative centres, :98-101): argsort of
        # the one-hot keeps the own class last, so the first C-1 entries are
        # the other classes in ascending order
        oh = jax.nn.one_hot(batch_label, C)              # [B, C]
        order = jnp.argsort(oh, axis=1)[:, :C - 1]       # [B, C-1]

        def expand(cc):
            pos = cc[batch_label]                        # [B, P-1, D]
            neg = cc[order].reshape(B, -1, cc.shape[-1])  # [B, (C-1)(P-1), D]
            return pos, neg

        p1, n1 = expand(c1)
        p2, n2 = expand(c2)
        w1 = jnp.concatenate([p1, w1, n1], 1)
        w2 = jnp.concatenate([p2, w2, n2], 1)
    elif pos_extra != "none":
        raise NotImplementedError(pos_extra)

    out_v2 = jnp.exp(jnp.einsum("bsd,bd->bs", w1, v2) / T)
    out_v1 = jnp.exp(jnp.einsum("bsd,bd->bs", w2, v1) / T)
    bank = set_z(bank, out_v1, out_v2)
    out_v1 = out_v1 / bank.z_v1
    out_v2 = out_v2 / bank.z_v2
    if update_bank:
        bank = bank_update(bank, v1, v2, y, momentum)
    # out_v1 scores the student query against the teacher bank -> weight the
    # student loss with the teacher-bank similarities (sim2), and vice versa
    return out_v1, out_v2, sim2, sim1, bank


def contrast_loss_v10(x: jnp.ndarray, n_data: int, num_pos: int,
                      sample_weights: jnp.ndarray,
                      pos_sims: Optional[jnp.ndarray] = None
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """NCE loss with per-query weights (``CRD_criterion_v10.py:241-276``) and
    optional similarity-weighted positives (``:280-314``).
    Returns (mean loss, per-sample loss [B])."""
    bsz = x.shape[0]
    P = num_pos
    m = x.shape[1] - P
    Pn = 1.0 / float(n_data)
    p_pos = x[:, :P]
    log_d1 = jnp.log(p_pos / (p_pos + m * Pn + EPS))
    p_neg = x[:, P:]
    log_d0 = jnp.log((m * Pn) / (p_neg + m * Pn + EPS)).sum(1)
    if pos_sims is not None:
        per_pos = log_d1 + log_d0[:, None]
        sample_loss = -jnp.sum(per_pos * pos_sims, 1) / jnp.maximum(
            jnp.sum(pos_sims, 1), 1e-12)
    else:
        sample_loss = -(jnp.mean(log_d1, 1) + log_d0)
    sample_loss = sample_weights.reshape(-1) * sample_loss
    return jnp.sum(sample_loss) / bsz, sample_loss


def assign_sample_weights(prob_s: jnp.ndarray, prob_t: jnp.ndarray,
                          gt: jnp.ndarray, max_discrep: float,
                          n_classes: int = 3) -> jnp.ndarray:
    """CLAT query-discrepancy weights
    (``stage2 train_test_path_multi_distill.py:131-158``):
    probabilistic-margin confidence ``log p(gt) - log max p(other)`` in
    teacher and student; weight = clip(conf_t - conf_s, 0, max_discrep)."""
    oh = jax.nn.one_hot(gt, n_classes)

    def conf(p):
        gt_p = jnp.sum(p * oh, 1)
        other = jnp.max(p * (1 - oh), 1)
        return jnp.log(gt_p) - jnp.log(other)

    d = jnp.maximum(conf(prob_t) - conf(prob_s), 0.0)
    return jax.lax.stop_gradient(jnp.minimum(d, max_discrep))
