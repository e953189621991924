"""Holistic graph knowledge distillation (HKD) — reference
``MIA 2022/distiller_zoo/GNN.py`` (= S2 ``CL_utils/HKD_loss.py``).

Pipeline per step:
1. InfoNCE between student/teacher embeddings and momentum banks
   (``NCEAverage``, momentum 0.9; positives are the *other side's* bank rows
   at the batch indices, negatives the ``nce_k`` sampled rows, ``:136-161``).
2. A kNN graph (k=8) over the softmaxed logits (softmax-cosine distance,
   self-loop included via the -1 diagonal trick, ``:20-49``), TAGConv(k=1)
   smoothing of the embeddings, and a second InfoNCE on the smoothed
   features against 0.75-momentum-smoothed bank rows (``:163-193``).
3. Bank momentum update (``:195``).

The reference needs ``dgl`` + scipy sparse and builds the graph on the host
every step; batches are 16 nodes, so here the graph is a dense [B, B]
adjacency and TAGConv is two matmuls — all inside the jitted step.
"""
from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..models.common import torch_linear_bias, torch_linear_default

KNN = 8
EPS = 1e-7


class HKDBank(NamedTuple):
    memory_l: jnp.ndarray    # [n_data, feat_dim] student side
    memory_ab: jnp.ndarray   # teacher side


def init_hkd_bank(key: jax.Array, n_data: int, feat_dim: int) -> HKDBank:
    stdv = 1.0 / math.sqrt(feat_dim / 3)
    k1, k2 = jax.random.split(key)
    mk = lambda k: jax.random.uniform(k, (n_data, feat_dim),
                                      jnp.float32, -stdv, stdv)
    return HKDBank(mk(k1), mk(k2))


def _momentum_rows(memory, v, y, momentum):
    rows = memory[y] * momentum + v * (1 - momentum)
    return rows / jnp.sqrt(jnp.sum(rows ** 2, axis=1, keepdims=True))


def hkd_bank_update(bank: HKDBank, f_es, f_et, y) -> HKDBank:
    f_es = jax.lax.stop_gradient(f_es)
    f_et = jax.lax.stop_gradient(f_et)
    new_l = bank.memory_l.at[y].set(
        _momentum_rows(bank.memory_l, f_es, y, 0.9))
    new_ab = bank.memory_ab.at[y].set(
        _momentum_rows(bank.memory_ab, f_et, y, 0.9))
    return HKDBank(new_l, new_ab)


def knn_adjacency(logits: jnp.ndarray, k: int = KNN) -> jnp.ndarray:
    """Dense kNN adjacency from softmax-cosine distances (``GNN.py:20-49``).
    A[dst, src] = 1 when dst is one of src's k nearest (messages src->dst);
    the diagonal trick keeps each node among its own nearest."""
    n = logits.shape[0]
    soft = jax.nn.softmax(logits, axis=1)
    w = jnp.linalg.norm(soft, axis=1, keepdims=True)
    cos = (soft @ soft.T) / jnp.maximum(w @ w.T, EPS)
    dist = 1.0 - cos
    eye = jnp.eye(n)
    dist = dist * (1 - eye) - eye
    # k smallest per row (row = src)
    idx = jnp.argsort(dist, axis=1)[:, :k]            # [n, k] dst nodes
    a = jnp.zeros((n, n))
    src = jnp.repeat(jnp.arange(n), k)
    return a.at[idx.reshape(-1), src].add(1.0)


class TAGEncoder(nn.Module):
    """Dense TAGConv(k=1) + l2norm (``GNN.py:198-207``):
    ``h' = W0 h + W1 (D^-1/2 A D^-1/2 h)`` where ``D`` is the IN-degree
    diagonal on BOTH sides — dgl's TAGConv computes one
    ``in_degrees()**-0.5`` vector and applies it before and after the
    aggregation (its published ``tagconv.py`` forward), it does not
    symmetrise with the out-degree."""
    feat_dim: int = 128

    @nn.compact
    def __call__(self, adj, h):
        # rows of adj are destinations: adj.sum(1) is the in-degree
        norm = jax.lax.rsqrt(jnp.maximum(adj.sum(1, keepdims=True), 1.0))
        h1 = norm * (adj @ (norm * h))
        out = (nn.Dense(self.feat_dim, kernel_init=torch_linear_default,
                        bias_init=torch_linear_bias(h.shape[-1]),
                        name="w0")(h)
               + nn.Dense(self.feat_dim, kernel_init=torch_linear_default,
                          bias_init=torch_linear_bias(h.shape[-1]),
                          name="w1")(h1))
        return out / jnp.sqrt(jnp.sum(out ** 2, axis=1, keepdims=True))


def nce_softmax_loss(scores: jnp.ndarray) -> jnp.ndarray:
    """InfoNCE with the positive in slot 0 (``NCESoftmaxLoss``)."""
    return -jnp.mean(jax.nn.log_softmax(scores, axis=1)[:, 0])


def hkd_scores(bank: HKDBank, f_es, f_et, y, contrast_idx,
               T: float = 0.07) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Independent-sample InfoNCE logits (``GNN.py:141-159``)."""
    w_t = jax.lax.stop_gradient(bank.memory_l[contrast_idx])   # [B, K, D]
    w_s = jax.lax.stop_gradient(bank.memory_ab[contrast_idx])
    f_us = jax.lax.stop_gradient(bank.memory_l[y])
    f_ut = jax.lax.stop_gradient(bank.memory_ab[y])
    ls_pos = jnp.sum(f_ut * f_es, axis=1, keepdims=True)
    lt_pos = jnp.sum(f_us * f_et, axis=1, keepdims=True)
    ls_neg = jnp.einsum("bkd,bd->bk", w_t, f_es)
    lt_neg = jnp.einsum("bkd,bd->bk", w_s, f_et)
    out_s = jnp.concatenate([ls_pos, ls_neg], axis=1) / T
    out_t = jnp.concatenate([lt_pos, lt_neg], axis=1) / T
    return out_s, out_t


def hkd_graph_scores(bank: HKDBank, f_gs, f_gt, y, contrast_idx,
                     T: float = 0.07) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Graph-smoothed InfoNCE logits: positives are 0.75-momentum-smoothed
    bank rows (``get_smooth``, ``GNN.py:76-90, 177-191``)."""
    f_sgs = _momentum_rows(bank.memory_l, jax.lax.stop_gradient(f_gs), y,
                           0.75)
    f_sgt = _momentum_rows(bank.memory_ab, jax.lax.stop_gradient(f_gt), y,
                           0.75)
    w_t = jax.lax.stop_gradient(bank.memory_l[contrast_idx])
    w_s = jax.lax.stop_gradient(bank.memory_ab[contrast_idx])
    gs_pos = jnp.sum(f_sgt * f_gs, axis=1, keepdims=True)
    gt_pos = jnp.sum(f_sgs * f_gt, axis=1, keepdims=True)
    gs_neg = jnp.einsum("bkd,bd->bk", w_t, f_gs)
    gt_neg = jnp.einsum("bkd,bd->bk", w_s, f_gt)
    out_gs = jnp.concatenate([gs_pos, gs_neg], axis=1) / T
    out_gt = jnp.concatenate([gt_pos, gt_neg], axis=1) / T
    return out_gs, out_gt
