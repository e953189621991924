"""CRD memory bank tests vs a numpy restatement of the torch reference
(``CL_utils/CRD_criterion.py``, ``memory_new.py``)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_learning_tpu.contrast import (CRDBank, contrast_loss,
                                              crd_scores, crd_scores_select,
                                              init_bank)

EPS = 1e-7


def _numpy_crd_v1(mem1, mem2, v1, v2, y, idx, T, m):
    """Direct numpy port of ContrastMemory.forward (CRD_criterion.py:25-81)."""
    n = mem1.shape[0]
    w1 = mem1[idx]                      # [B, S, D]
    w2 = mem2[idx]
    out_v2 = np.exp(np.einsum("bsd,bd->bs", w1, v2) / T)
    out_v1 = np.exp(np.einsum("bsd,bd->bs", w2, v1) / T)
    z1 = out_v1.mean() * n
    z2 = out_v2.mean() * n
    out_v1, out_v2 = out_v1 / z1, out_v2 / z2
    for k, mem, v in ((0, mem1, v1), (1, mem2, v2)):
        upd = mem[y] * m + v * (1 - m)
        upd = upd / np.sqrt((upd ** 2).sum(1, keepdims=True))
        mem[y] = upd
    return out_v1, out_v2, z1, z2


def test_crd_scores_match_numpy_reference(rng):
    n, d, b, k = 64, 8, 4, 5
    bank = init_bank(jax.random.PRNGKey(0), n, d)
    mem1 = np.asarray(bank.memory_v1).copy()
    mem2 = np.asarray(bank.memory_v2).copy()
    v1 = rng.normal(size=(b, d)).astype(np.float32)
    v1 /= np.linalg.norm(v1, axis=1, keepdims=True)
    v2 = rng.normal(size=(b, d)).astype(np.float32)
    v2 /= np.linalg.norm(v2, axis=1, keepdims=True)
    y = rng.choice(n, b, replace=False).astype(np.int32)
    idx = np.stack([np.concatenate([[y[i]], rng.choice(n, k)])
                    for i in range(b)]).astype(np.int32)

    out_v1, out_v2, new_bank = crd_scores(
        bank, jnp.asarray(v1), jnp.asarray(v2), jnp.asarray(y),
        jnp.asarray(idx), T=0.07, momentum=0.5)
    ref_v1, ref_v2, z1, z2 = _numpy_crd_v1(mem1, mem2, v1, v2, y, idx,
                                           0.07, 0.5)
    np.testing.assert_allclose(np.asarray(out_v1), ref_v1, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(out_v2), ref_v2, rtol=2e-4)
    assert float(new_bank.z_v1) == pytest.approx(z1, rel=1e-4)
    np.testing.assert_allclose(np.asarray(new_bank.memory_v1), mem1,
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(new_bank.memory_v2), mem2,
                               rtol=2e-5, atol=2e-6)
    # updated rows are unit-norm
    norms = np.linalg.norm(np.asarray(new_bank.memory_v1)[y], axis=1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-5)


def test_z_frozen_after_first_batch(rng):
    n, d, b, k = 32, 4, 2, 3
    bank = init_bank(jax.random.PRNGKey(1), n, d)
    v = rng.normal(size=(b, d)).astype(np.float32)
    y = np.arange(b, dtype=np.int32)
    idx = rng.choice(n, (b, k + 1)).astype(np.int32)
    _, _, bank1 = crd_scores(bank, jnp.asarray(v), jnp.asarray(v),
                             jnp.asarray(y), jnp.asarray(idx))
    z_first = float(bank1.z_v1)
    _, _, bank2 = crd_scores(bank1, jnp.asarray(v * 2), jnp.asarray(v * 2),
                             jnp.asarray(y), jnp.asarray(idx))
    assert float(bank2.z_v1) == z_first


def test_contrast_loss_matches_reference_formula(rng):
    n_data, b, k = 100, 4, 6
    x = rng.uniform(0.001, 0.1, size=(b, 1 + k)).astype(np.float32)
    Pn = 1.0 / n_data
    pos = x[:, 0]
    log_d1 = np.log(pos / (pos + k * Pn + EPS))
    neg = x[:, 1:]
    log_d0 = np.log((k * Pn) / (neg + k * Pn + EPS))
    ref = -(log_d1.sum() + log_d0.sum()) / b
    ours = float(contrast_loss(jnp.asarray(x), n_data))
    assert ours == pytest.approx(ref, rel=1e-5)


def test_contrast_loss_multi_pos_average(rng):
    n_data, b, p, k = 100, 4, 3, 6
    x = rng.uniform(0.001, 0.1, size=(b, p + k)).astype(np.float32)
    Pn = 1.0 / n_data
    log_d1 = np.log(x[:, :p] / (x[:, :p] + k * Pn + EPS)).mean(1)
    log_d0 = np.log((k * Pn) / (x[:, p:] + k * Pn + EPS)).sum(1)
    ref = -(log_d1 + log_d0).sum() / b
    ours = float(contrast_loss(jnp.asarray(x), n_data, n_pos=p))
    assert ours == pytest.approx(ref, rel=1e-5)
    per = contrast_loss(jnp.asarray(x), n_data, n_pos=p, per_sample=True)
    assert per.shape == (b,)


def test_crd_select_hard_picks_largest_discrepancy(rng):
    """hard mode must keep the P2 positives with the largest
    rel(student) - rel(teacher), slot 0 pinned (memory_new.py:156-175)."""
    n, d, b = 64, 8, 2
    P, K, P2, K2 = 6, 10, 3, 4
    bank = init_bank(jax.random.PRNGKey(2), n, d)
    v1 = rng.normal(size=(b, d)).astype(np.float32)
    v2 = rng.normal(size=(b, d)).astype(np.float32)
    y = np.arange(b, dtype=np.int32)
    idx = np.stack([rng.choice(n, P + K, replace=False)
                    for _ in range(b)]).astype(np.int32)
    out_v1, out_v2, new_bank, negw = crd_scores_select(
        bank, jnp.asarray(v1), jnp.asarray(v2), jnp.asarray(y),
        jnp.asarray(idx), P=P, K=K, P2=P2, K2=K2, select_pos_mode="hard")
    assert out_v1.shape == (b, P2 + K2)
    assert negw is None

    # numpy oracle for the selection
    mem1 = np.asarray(bank.memory_v1)
    mem2 = np.asarray(bank.memory_v2)
    w1, w2 = mem1[idx], mem2[idx]
    rel1 = np.einsum("bsd,bd->bs",
                     w1 / np.linalg.norm(w1, axis=2, keepdims=True),
                     v1 / np.linalg.norm(v1, axis=1, keepdims=True))
    rel2 = np.einsum("bsd,bd->bs",
                     w2 / np.linalg.norm(w2, axis=2, keepdims=True),
                     v2 / np.linalg.norm(v2, axis=1, keepdims=True))
    raw_v1 = np.exp(np.einsum("bsd,bd->bs", w2, v1) / 0.07)
    order = np.argsort(-(rel1[:, :P] - rel2[:, :P]), axis=1)[:, :P2]
    order[:, 0] = 0
    sel_pos = np.take_along_axis(raw_v1[:, :P], order, axis=1)
    neg_order = np.argsort(rel1[:, P:] - rel2[:, P:], axis=1)[:, :K2]
    sel_neg = np.take_along_axis(raw_v1[:, P:], neg_order, axis=1)
    ref = np.concatenate([sel_pos, sel_neg], 1)
    ref = ref / (ref.mean() * n)  # Z normalisation from this same batch
    np.testing.assert_allclose(np.asarray(out_v1), ref, rtol=2e-4)


def test_crd_v4_neg_reweight(rng):
    """v4 (MIA 2022/CL_utils/memory_new.py:398-561): the negative exp-scores
    are multiplied by stop-grad ``rel1 - rel2 + 1`` BEFORE the Z estimate,
    and — because v4 fixed v2/v3's swapped relation naming — the positive
    sort runs on ``rel2 - rel1`` descending."""
    n, d, b = 32, 8, 2
    P, K, P2 = 4, 8, 2
    bank = init_bank(jax.random.PRNGKey(3), n, d)
    v1 = rng.normal(size=(b, d)).astype(np.float32)
    v2 = rng.normal(size=(b, d)).astype(np.float32)
    y = np.arange(b, dtype=np.int32)
    idx = np.stack([rng.choice(n, P + K, replace=False)
                    for _ in range(b)]).astype(np.int32)
    out_v1, out_v2, _, negw = crd_scores_select(
        bank, jnp.asarray(v1), jnp.asarray(v2), jnp.asarray(y),
        jnp.asarray(idx), P=P, K=K, P2=P2, K2=0, select_pos_mode="hard",
        neg_reweight=True)
    assert negw.shape == (b, K)
    assert out_v1.shape == (b, P2 + K)

    mem1, mem2 = np.asarray(bank.memory_v1), np.asarray(bank.memory_v2)
    w1, w2 = mem1[idx], mem2[idx]
    rel1 = np.einsum("bsd,bd->bs",
                     w1 / np.linalg.norm(w1, axis=2, keepdims=True),
                     v1 / np.linalg.norm(v1, axis=1, keepdims=True))
    rel2 = np.einsum("bsd,bd->bs",
                     w2 / np.linalg.norm(w2, axis=2, keepdims=True),
                     v2 / np.linalg.norm(v2, axis=1, keepdims=True))
    raw_v1 = np.exp(np.einsum("bsd,bd->bs", w2, v1) / 0.07)
    order = np.argsort(-(rel2[:, :P] - rel1[:, :P]), axis=1)[:, :P2]
    order[:, 0] = 0
    sel_pos = np.take_along_axis(raw_v1[:, :P], order, axis=1)
    wneg = rel1[:, P:] - rel2[:, P:] + 1.0
    np.testing.assert_allclose(np.asarray(negw), wneg, rtol=2e-4)
    weighted_neg = raw_v1[:, P:] * wneg
    ref = np.concatenate([sel_pos, weighted_neg], 1)
    ref = ref / (ref.mean() * n)  # Z includes the weighted negatives
    np.testing.assert_allclose(np.asarray(out_v1), ref, rtol=2e-4)
