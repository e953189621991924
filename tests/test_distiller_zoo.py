"""Distiller-zoo losses vs torch/numpy oracles + HKD machinery."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from multimodal_learning_tpu.losses.distiller_zoo import (
    ab_loss, attention_loss, correlation_loss, factor_transfer_loss,
    feats_kl, fsp_loss, hint_loss, kdsvd_loss, nst_loss, pkt_loss, rkd_loss)


def test_feats_kl_matches_torch(rng):
    fs = rng.normal(size=(8, 16)).astype(np.float32)
    ft = rng.normal(size=(8, 16)).astype(np.float32)
    ref = float(F.kl_div(F.log_softmax(torch.tensor(fs), 1),
                         F.softmax(torch.tensor(ft), 1),
                         reduction="sum") / 8)
    ours = float(feats_kl(jnp.asarray(fs), jnp.asarray(ft)))
    assert ours == pytest.approx(ref, rel=2e-3)


def test_pkt_matches_reference(rng):
    fs = rng.normal(size=(8, 16)).astype(np.float32)
    ft = rng.normal(size=(8, 16)).astype(np.float32)

    def torch_pkt(a, b, eps=1e-7):
        a = a / (a.norm(dim=1, keepdim=True) + eps)
        b = b / (b.norm(dim=1, keepdim=True) + eps)
        ms = (a @ a.t() + 1) / 2
        ts = (b @ b.t() + 1) / 2
        ms = ms / ms.sum(1, keepdim=True)
        ts = ts / ts.sum(1, keepdim=True)
        return float(torch.mean(ts * torch.log((ts + eps) / (ms + eps))))

    ref = torch_pkt(torch.tensor(fs), torch.tensor(ft))
    ours = float(pkt_loss(jnp.asarray(fs), jnp.asarray(ft)))
    assert ours == pytest.approx(ref, rel=1e-3, abs=1e-7)


def test_rkd_distance_term(rng):
    fs = rng.normal(size=(6, 8)).astype(np.float32)
    ft = rng.normal(size=(6, 8)).astype(np.float32)
    v = float(rkd_loss(jnp.asarray(fs), jnp.asarray(ft)))
    assert np.isfinite(v) and v > 0
    # identical features -> zero loss
    z = float(rkd_loss(jnp.asarray(fs), jnp.asarray(fs)))
    assert z == pytest.approx(0.0, abs=1e-5)


def test_hint_and_correlation(rng):
    fs = rng.normal(size=(8, 16)).astype(np.float32)
    assert float(hint_loss(jnp.asarray(fs), jnp.asarray(fs))) == 0.0
    assert float(correlation_loss(jnp.asarray(fs), jnp.asarray(fs))) == \
        pytest.approx(0.0, abs=1e-6)


def test_map_based_losses_shapes(rng):
    maps_s = [jnp.asarray(rng.normal(size=(4, 8, 8, 16)).astype(np.float32)),
              jnp.asarray(rng.normal(size=(4, 8, 8, 32)).astype(np.float32))]
    maps_t = [jnp.asarray(rng.normal(size=(4, 8, 8, 16)).astype(np.float32)),
              jnp.asarray(rng.normal(size=(4, 8, 8, 32)).astype(np.float32))]
    at = attention_loss(maps_s, maps_t)
    assert len(at) == 2 and all(np.isfinite(float(x)) for x in at)
    fsp = fsp_loss(maps_s, maps_t)
    assert len(fsp) == 1 and np.isfinite(float(fsp[0]))
    svd = kdsvd_loss(maps_s, maps_t)
    assert len(svd) == 1 and np.isfinite(float(svd[0]))
    nst = float(nst_loss(maps_s[0], maps_t[0]))
    assert np.isfinite(nst) and nst >= -1e-5
    assert float(nst_loss(maps_s[0], maps_s[0])) == pytest.approx(0.0,
                                                                  abs=1e-5)


def test_ab_loss_sign_agreement():
    f_s = jnp.asarray([[2.0, -2.0]])
    f_t_agree = jnp.asarray([[1.0, -1.0]])
    f_t_disagree = jnp.asarray([[-1.0, 1.0]])
    assert float(ab_loss(f_s, f_t_agree)) == 0.0
    assert float(ab_loss(f_s, f_t_disagree)) > 0.0


def test_factor_transfer_zero_on_same(rng):
    f = jnp.asarray(rng.normal(size=(4, 32)).astype(np.float32))
    assert float(factor_transfer_loss(f, f)) == pytest.approx(0.0, abs=1e-7)


def test_hkd_components(rng):
    from multimodal_learning_tpu.contrast.hkd import (
        HKDBank, hkd_bank_update, hkd_graph_scores, hkd_scores,
        init_hkd_bank, knn_adjacency, nce_softmax_loss, TAGEncoder)
    n, d, b, k = 32, 8, 10, 5
    bank = init_hkd_bank(jax.random.PRNGKey(0), n, d)
    f_es = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    f_et = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    y = jnp.asarray(np.arange(b, dtype=np.int32))
    cidx = jnp.asarray(rng.integers(0, n, (b, k)).astype(np.int32))
    out_s, out_t = hkd_scores(bank, f_es, f_et, y, cidx)
    assert out_s.shape == (b, 1 + k)
    assert np.isfinite(float(nce_softmax_loss(out_s)))

    logits = jnp.asarray(rng.normal(size=(b, 3)).astype(np.float32))
    adj = knn_adjacency(logits, k=4)
    assert adj.shape == (b, b)
    # each src column has exactly 4 outgoing edges (incl. self-loop trick)
    np.testing.assert_array_equal(np.asarray(adj.sum(0)), 4.0)
    # self loop present (diagonal -1 makes self nearest, GNN.py:34)
    assert np.all(np.diag(np.asarray(adj)) >= 1.0)

    gnn = TAGEncoder(d)
    vs = gnn.init(jax.random.PRNGKey(1), adj, f_es)
    h = gnn.apply(vs, adj, f_es)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(h), axis=1), 1.0,
                               rtol=1e-4)
    out_gs, out_gt = hkd_graph_scores(bank, h, h, y, cidx)
    assert out_gs.shape == (b, 1 + k)

    nb = hkd_bank_update(bank, f_es, f_et, y)
    rows = np.asarray(nb.memory_l[np.asarray(y)])
    np.testing.assert_allclose(np.linalg.norm(rows, axis=1), 1.0, rtol=1e-5)
