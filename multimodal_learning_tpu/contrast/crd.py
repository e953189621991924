"""Functional CRD NCE memory banks — all generations.

The reference keeps two mutable buffers ``memory_v1/v2 [n_data, feat_dim]``
inside torch modules and mutates them in-place each step
(``MICCAI-2022/CL_utils/CRD_criterion.py:8-81``, ``memory_new.py``).  Here the
bank is an explicit :class:`CRDBank` pytree carried in the train state, and
every step is a pure function ``(bank, queries, idx) -> (scores, bank')`` that
jits into the global train step — no host sync, no in-place aliasing.

Generations implemented (reference pointers):
- v1 ``crd_scores``:          classic CRD (``CRD_criterion.py:25-81``)
- v2/v3 ``crd_scores_select``: DC-Distill / DSCD discrepancy-guided positive
  (and optionally negative) selection (``memory_new.py:103-222, 249-397``)
- v4 soft negative reweighting (``MIA 2022/CL_utils/memory_new.py:398-561``)
  via ``neg_reweight=True``
- mono (student->teacher-bank only) via the returned ``out_v1`` alone with
  ``pos_sort="v4"`` — mono shares v4's fixed relation orientation
  (``MIA 2022/CL_utils/memory_new.py:565-700``)

Semantics notes (behavioural parity, verified against the torch code):
- ``v1`` is the *student* embedding, ``v2`` the *teacher* embedding;
  ``out_v1 = exp(<mem_v2[idx], v1>/T)`` scores the student query against the
  teacher bank and vice versa.
- The normalisation constants ``Z_v1/Z_v2`` are estimated from the first
  batch (``out.mean() * n_data``) and frozen thereafter
  (``CRD_criterion.py:51-59``); here they live in the bank state and are set
  with a ``lax.cond`` guard — identical maths, still one compiled step.
- Bank rows at the batch's own indices are momentum-updated and
  L2-renormalised *after* score computation (``CRD_criterion.py:65-79``).
- In the discrepancy variants the relation difference is
  ``cos(mem_v1[idx], v1) - cos(mem_v2[idx], v2)`` sorted descending for
  positives / ascending for negatives, with slot 0 pinned to the exact
  positive (``memory_new.py:156-188, 338-356``).
"""
from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..models.common import torch_linear_bias, torch_linear_default

EPS = 1e-7


class Embed(nn.Module):
    """Projection head + L2-normalise.

    ``mlp=True``: Linear -> ReLU -> Linear (teacher-side sup-CRD,
    ``CRD_criterion.py:219-233``); ``mlp=False``: single Linear (student-side
    ``CRD_loss.py:256-267``)."""
    dim_out: int = 128
    mlp: bool = True

    @nn.compact
    def __call__(self, x):
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(self.dim_out, kernel_init=torch_linear_default,
                     bias_init=torch_linear_bias(x.shape[-1]), name="fc1")(x)
        if self.mlp:
            x = nn.relu(x)
            x = nn.Dense(self.dim_out, kernel_init=torch_linear_default,
                         bias_init=torch_linear_bias(self.dim_out),
                         name="fc2")(x)
        norm = jnp.sqrt(jnp.sum(x ** 2, axis=1, keepdims=True))
        return x / norm


class CRDBank(NamedTuple):
    memory_v1: jnp.ndarray  # [n_data, feat_dim] student-side bank
    memory_v2: jnp.ndarray  # [n_data, feat_dim] teacher-side bank
    z_v1: jnp.ndarray       # scalar; < 0 means "not yet estimated"
    z_v2: jnp.ndarray


def init_bank(key: jax.Array, n_data: int, feat_dim: int) -> CRDBank:
    """U(-stdv, stdv) with stdv = 1/sqrt(feat_dim/3) (``CRD_criterion.py:21-23``)."""
    stdv = 1.0 / math.sqrt(feat_dim / 3)
    k1, k2 = jax.random.split(key)
    mk = lambda k: jax.random.uniform(k, (n_data, feat_dim),
                                      jnp.float32, -stdv, stdv)
    return CRDBank(mk(k1), mk(k2), jnp.asarray(-1.0), jnp.asarray(-1.0))


def set_z(bank: CRDBank, out_v1: jnp.ndarray, out_v2: jnp.ndarray) -> CRDBank:
    """Freeze Z on first use (``CRD_criterion.py:51-59``)."""
    n = bank.memory_v1.shape[0]
    z1 = jnp.where(bank.z_v1 < 0,
                   jax.lax.stop_gradient(jnp.mean(out_v1)) * n, bank.z_v1)
    z2 = jnp.where(bank.z_v2 < 0,
                   jax.lax.stop_gradient(jnp.mean(out_v2)) * n, bank.z_v2)
    return bank._replace(z_v1=z1, z_v2=z2)


def bank_update(bank: CRDBank, v1: jnp.ndarray, v2: jnp.ndarray,
                y: jnp.ndarray, momentum: float) -> CRDBank:
    """Momentum + L2-renormalise rows ``y`` (``CRD_criterion.py:65-79``).
    ``y`` are dataset indices, unique within a batch by construction."""
    v1 = jax.lax.stop_gradient(v1)
    v2 = jax.lax.stop_gradient(v2)

    def _upd(mem, v):
        old = mem[y]
        new = old * momentum + v * (1.0 - momentum)
        new = new / jnp.sqrt(jnp.sum(new ** 2, axis=1, keepdims=True))
        return mem.at[y].set(new)

    return bank._replace(memory_v1=_upd(bank.memory_v1, v1),
                         memory_v2=_upd(bank.memory_v2, v2))


def _gather_scores(bank: CRDBank, v1, v2, idx, T):
    """exp(<bank rows, query>/T) for both directions; [B, S] each."""
    w1 = jax.lax.stop_gradient(bank.memory_v1[idx])   # [B, S, D]
    w2 = jax.lax.stop_gradient(bank.memory_v2[idx])
    out_v2 = jnp.exp(jnp.einsum("bsd,bd->bs", w1, v2) / T)
    out_v1 = jnp.exp(jnp.einsum("bsd,bd->bs", w2, v1) / T)
    return out_v1, out_v2, w1, w2


def crd_scores(bank: CRDBank, v1: jnp.ndarray, v2: jnp.ndarray,
               y: jnp.ndarray, idx: jnp.ndarray, T: float = 0.07,
               momentum: float = 0.5
               ) -> Tuple[jnp.ndarray, jnp.ndarray, CRDBank]:
    """Classic CRD memory forward (v1): ``idx[:, 0]`` is the positive.

    Returns ``(out_v1, out_v2, bank')`` with scores already divided by Z.
    """
    out_v1, out_v2, _, _ = _gather_scores(bank, v1, v2, idx, T)
    bank = set_z(bank, out_v1, out_v2)
    out_v1 = out_v1 / bank.z_v1
    out_v2 = out_v2 / bank.z_v2
    bank = bank_update(bank, v1, v2, y, momentum)
    return out_v1, out_v2, bank


def _select_columns(scores: jnp.ndarray, cols: jnp.ndarray) -> jnp.ndarray:
    """Per-row gather: ``scores[b, cols[b, j]]``."""
    return jnp.take_along_axis(scores, cols, axis=1)


def crd_scores_select(
    bank: CRDBank, v1: jnp.ndarray, v2: jnp.ndarray, y: jnp.ndarray,
    idx: jnp.ndarray, *, P: int, K: int, P2: int, K2: int,
    T: float = 0.07, momentum: float = 0.5,
    select_pos_mode: str = "hard", select_pos_pairs: bool = True,
    select_neg_pairs: bool = True, neg_reweight: bool = False,
    epoch_frac: float = 0.0, rng: Optional[jax.Array] = None,
    update_bank: bool = True, pos_sort: Optional[str] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, CRDBank, Optional[jnp.ndarray]]:
    """DC-Distill / DSCD memory forward (v2/v3/v4).

    ``idx = [P positives | K negatives]`` per row.  Positive slots are ranked
    by the relation discrepancy and P2 are kept (mode hard/mid/random/
    curriculum, ``memory_new.py:160-175``); negatives optionally ranked
    ascending and the hardest K2 kept (v3, ``memory_new.py:338-356``) or
    soft-reweighted (v4, ``MIA 2022 memory_new.py:510-517``).

    With ``neg_reweight`` the v4 weights are already folded into the returned
    negative scores (and into the Z estimate) exactly as the reference does;
    the fourth return value exposes them for diagnostics only — do NOT also
    pass them to :func:`contrast_loss`.
    """
    batch = v1.shape[0]
    out_v1, out_v2, w1, w2 = _gather_scores(bank, v1, v2, idx, T)

    def _cos_rel(w, v):
        wn = w / jnp.linalg.norm(w, axis=2, keepdims=True)
        vn = v / jnp.linalg.norm(v, axis=1, keepdims=True)
        return jnp.einsum("bsd,bd->bs", wn, vn)

    rel1 = _cos_rel(w1, v1)  # student query vs student bank
    rel2 = _cos_rel(w2, v2)  # teacher query vs teacher bank

    if select_pos_pairs:
        # v2/v3 sort by ``t_relation - s_relation`` where their misnamed
        # ``t_relation`` is the *student*-side cosine (``memory_new.py:148-151``)
        # -> rel1 - rel2.  v4 and mono fixed the naming (teacher relation from
        # the teacher bank, ``MIA 2022/CL_utils/memory_new.py:460-464,
        # :632-637``), so their sort runs the OPPOSITE way: rel2 - rel1.
        # ``pos_sort`` overrides the default per-variant orientation
        # ("v23" | "v4"; None = v4 orientation iff ``neg_reweight``).
        if pos_sort is None:
            pos_sort = "v4" if neg_reweight else "v23"
        if pos_sort == "v4":
            diff_pos = rel2[:, :P] - rel1[:, :P]
        elif pos_sort == "v23":
            diff_pos = rel1[:, :P] - rel2[:, :P]
        else:
            raise ValueError(f"pos_sort: {pos_sort!r}")
        order = jnp.argsort(-diff_pos, axis=1)  # descending
        if select_pos_mode == "hard":
            sel = order[:, :P2]
        elif select_pos_mode == "mid":
            # v3: random draw from rank window [30, 100) (memory_new.py:311)
            pick = jax.random.choice(rng, jnp.arange(30, min(100, P)),
                                     (P2,), replace=False)
            sel = order[:, pick]
        elif select_pos_mode == "random":
            pick = jax.random.randint(rng, (P2,), 0, P)
            sel = order[:, pick]
        elif select_pos_mode == "curriculum":
            # memory_new.py:319-322 — window walks toward harder ranks
            interval = 4 - jnp.ceil(3 * epoch_frac)
            lo = (50 * (interval - 1)).astype(jnp.int32)
            pick = lo + jax.random.randint(rng, (P2,), 0, 50)
            sel = order[:, pick]
        else:
            raise NotImplementedError(select_pos_mode)
        sel = sel.at[:, 0].set(0)  # pin the exact positive, memory_new.py:325
        pos_v1 = _select_columns(out_v1[:, :P], sel)
        pos_v2 = _select_columns(out_v2[:, :P], sel)
    else:
        pos_v1, pos_v2 = out_v1[:, :P], out_v2[:, :P]

    neg_weights = None
    if neg_reweight:
        # v4: keep all K negatives, each exp-score MULTIPLIED by
        # ``s_relation - t_relation + 1`` = rel1 - rel2 + 1 (their fixed
        # naming; ``MIA 2022/CL_utils/memory_new.py:510-517``).  The weight
        # scales the score inside the NCE log (not the log term), and the
        # weighted scores feed the first-batch Z estimate, exactly as the
        # reference.  Weights are detached there (relations computed from
        # ``.detach()``-ed tensors); can dip below 0 when rel2 - rel1 > 1 —
        # a reference behaviour we reproduce rather than clamp.
        neg_weights = jax.lax.stop_gradient(
            rel1[:, P:] - rel2[:, P:] + 1.0)
        neg_v1 = out_v1[:, P:] * neg_weights
        neg_v2 = out_v2[:, P:] * neg_weights
    elif select_neg_pairs:
        diff_neg = rel1[:, P:] - rel2[:, P:]
        order = jnp.argsort(diff_neg, axis=1)[:, :K2]  # ascending
        neg_v1 = _select_columns(out_v1[:, P:], order)
        neg_v2 = _select_columns(out_v2[:, P:], order)
    else:
        neg_v1, neg_v2 = out_v1[:, P:], out_v2[:, P:]

    out_v1 = jnp.concatenate([pos_v1, neg_v1], axis=1)
    out_v2 = jnp.concatenate([pos_v2, neg_v2], axis=1)

    bank = set_z(bank, out_v1, out_v2)
    out_v1 = out_v1 / bank.z_v1
    out_v2 = out_v2 / bank.z_v2
    if update_bank:
        bank = bank_update(bank, v1, v2, y, momentum)
    return out_v1, out_v2, bank, neg_weights


def contrast_loss(x: jnp.ndarray, n_data: int, n_pos: int = 1,
                  per_sample: bool = False) -> jnp.ndarray:
    """NCE binary log-loss (``CRD_criterion.py:191-216`` for n_pos=1;
    ``CRD_loss.py ContrastLoss_v2`` for multi-positive: the positive terms are
    averaged over the P2 slots).

    ``x[:, :n_pos]`` are positive scores, the rest negatives; noise density
    ``Pn = 1/n_data``, m = #negatives.
    """
    bsz = x.shape[0]
    m = x.shape[1] - n_pos
    Pn = 1.0 / float(n_data)

    p_pos = x[:, :n_pos]
    log_d1 = jnp.log(p_pos / (p_pos + m * Pn + EPS))
    p_neg = x[:, n_pos:]
    log_d0 = jnp.log((m * Pn) / (p_neg + m * Pn + EPS))

    if n_pos > 1:
        pos_term = jnp.mean(log_d1, axis=1)  # average over P2 positives
    else:
        pos_term = log_d1[:, 0]
    sample_loss = -(pos_term + jnp.sum(log_d0, axis=1))
    if per_sample:
        return sample_loss
    return jnp.sum(sample_loss) / bsz


def weighted_contrast_loss(x: jnp.ndarray, sample_weights: jnp.ndarray,
                           n_data: int) -> jnp.ndarray:
    """``weighted_ContrastLoss`` (``MICCAI-2022/CL_utils/CRD_loss.py:53-82``):
    the per-sample NCE loss scaled by a 0/1 gate weight, summed and divided
    by the batch size."""
    per = contrast_loss(x, n_data, n_pos=1, per_sample=True)
    return jnp.sum(sample_weights * per) / x.shape[0]


def crd_gate_weights(loss_s: jnp.ndarray, loss_t: jnp.ndarray
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``weighted_CRDLoss`` comparison gate (``CRD_loss.py:44-46``): the
    student-anchored side trains only where the student's per-sample loss
    exceeds the teacher's, and vice versa."""
    s_w = (loss_s > loss_t).astype(jnp.float32)
    t_w = (loss_t > loss_s).astype(jnp.float32)
    return jax.lax.stop_gradient(s_w), jax.lax.stop_gradient(t_w)
