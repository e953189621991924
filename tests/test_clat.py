"""CLAT stage-2: v10 CRD machinery + end-to-end two-stage flow."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_learning_tpu.contrast.crd import init_bank
from multimodal_learning_tpu.contrast.crd_v10 import (assign_sample_weights,
                                                      class_centers,
                                                      contrast_loss_v10,
                                                      crd_v10_scores,
                                                      masked_kmeans)


def test_masked_kmeans_respects_mask(rng):
    x = np.concatenate([rng.normal(0, 0.1, (20, 4)),
                        rng.normal(10, 0.1, (20, 4))]).astype(np.float32)
    mask = np.concatenate([np.ones(20), np.zeros(20)]).astype(np.float32)
    centers = masked_kmeans(jax.random.PRNGKey(0), jnp.asarray(x),
                            jnp.asarray(mask), k=2)
    # all centres must come from the masked (near-0) cluster
    assert np.all(np.abs(np.asarray(centers)) < 2.0)


def test_class_centers_mean_when_two_pos(rng):
    n, d, C = 30, 4, 3
    mem = rng.normal(size=(n, d)).astype(np.float32)
    labels = rng.integers(0, C, n)
    mask = np.zeros((C, n), np.float32)
    mask[labels, np.arange(n)] = 1
    cc = class_centers(jax.random.PRNGKey(0), jnp.asarray(mem),
                       jnp.asarray(mask), num_pos=2)
    assert cc.shape == (C, 1, d)
    for c in range(C):
        np.testing.assert_allclose(np.asarray(cc[c, 0]),
                                   mem[labels == c].mean(0), rtol=1e-4,
                                   atol=1e-5)


def test_crd_v10_neighbors_shapes(rng):
    n, d, b, k, P, C = 40, 8, 4, 6, 3, 3
    bank = init_bank(jax.random.PRNGKey(0), n, d)
    v = rng.normal(size=(b, d)).astype(np.float32)
    labels = rng.integers(0, C, n)
    mask = np.zeros((C, n), np.float32)
    mask[labels, np.arange(n)] = 1
    y = np.arange(b, dtype=np.int32)
    g = labels[:b].astype(np.int32)
    idx = np.stack([np.concatenate([[i], rng.choice(n, k)])
                    for i in range(b)]).astype(np.int32)
    out_v1, out_v2, sim_s, sim_t, nb = crd_v10_scores(
        bank, jnp.asarray(v), jnp.asarray(v), jnp.asarray(g), jnp.asarray(y),
        jnp.asarray(idx), class_mask=jnp.asarray(mask), num_pos=P,
        pos_extra="neighbors", key=jax.random.PRNGKey(1))
    assert out_v1.shape == (b, P + k)
    assert sim_s.shape == (b, P)
    # top neighbour of the query row is itself (cosine = 1, same class)
    np.testing.assert_allclose(np.asarray(sim_s[:, 0]), 1.0, rtol=1e-4)
    loss, sl = contrast_loss_v10(out_v1, n, P, jnp.ones(b), sim_s)
    assert sl.shape == (b,) and np.isfinite(float(loss))


def test_crd_v10_centers_shapes(rng):
    n, d, b, k, P, C = 40, 8, 4, 6, 3, 3
    bank = init_bank(jax.random.PRNGKey(0), n, d)
    v = rng.normal(size=(b, d)).astype(np.float32)
    labels = rng.integers(0, C, n)
    mask = np.zeros((C, n), np.float32)
    mask[labels, np.arange(n)] = 1
    idx = np.stack([np.concatenate([[i], rng.choice(n, k)])
                    for i in range(b)]).astype(np.int32)
    out_v1, out_v2, sim_s, sim_t, nb = crd_v10_scores(
        bank, jnp.asarray(v), jnp.asarray(v),
        jnp.asarray(labels[:b].astype(np.int32)),
        jnp.asarray(np.arange(b, dtype=np.int32)), jnp.asarray(idx),
        class_mask=jnp.asarray(mask), num_pos=P, pos_extra="centers",
        key=jax.random.PRNGKey(1))
    # width: (P-1) centres + (1+k) original + 2(P-1) other-class centres
    assert out_v1.shape == (b, (P - 1) + 1 + k + (C - 1) * (P - 1))
    assert sim_s is None


def test_assign_sample_weights_semantics():
    # teacher confident & right, student wrong -> positive weight
    p_t = jnp.asarray([[0.8, 0.1, 0.1]])
    p_s = jnp.asarray([[0.2, 0.7, 0.1]])
    g = jnp.asarray([0])
    w = assign_sample_weights(p_s, p_t, g, max_discrep=1.0)
    assert 0.0 < float(w[0]) <= 1.0
    # student better than teacher -> clipped to 0
    w2 = assign_sample_weights(p_t, p_s, g, max_discrep=1.0)
    assert float(w2[0]) == 0.0


@pytest.mark.smoke
def test_clat_two_stage_end_to_end(tmp_path):
    """BASELINE config 5: stage-1 masked teacher -> stage-2 CLAT student."""
    from multimodal_learning_tpu.config import Options
    from multimodal_learning_tpu.data import make_synthetic_splits
    from multimodal_learning_tpu.train.loop import train_teacher
    from multimodal_learning_tpu.train.student_clat import train_clat_student

    data = make_synthetic_splits(n_train=24, n_test=8, roi_size=32, seed=7)
    common = dict(task="grad", label_dim=3, niter=0, batch_size=8,
                  input_size_path=32, lr=1e-3, verbose=0,
                  checkpoints_dir=str(tmp_path), host_workers=2, seed=0,
                  reg_type="none", path_dim=16, omic_dim=16, mmhid=16,
                  feat_dim=8)
    t_opt = Options(mode="pathomic", model_name="c1", niter_decay=1,
                    CRD_distill=0, pred_distill=1, masking=1, start_epoch=0,
                    num_superpixels=9, Path_K=2, Omic_K=5, **common)
    train_teacher(t_opt, data, fold=1)

    s_opt = Options(mode="pathomic", model_name="c2", fixed_model="c1",
                    niter_decay=2, distill="crd", num_teachers=2,
                    assign_weights=True, CE_grads=True,
                    loss_weighting="GK_refine", use_grads_thresh=True,
                    grads_thresh=0.25, pos_mode="exact", pos_extra="neighbors",
                    nce_p=3, nce_k=8, max_discrep=1.0, start_reweight=2,
                    alpha=1.0, beta=0.02, patience=0.0, **common)
    res, best, ext = train_clat_student(s_opt, data, fold=1)
    assert "acc_path" in res
    assert set(res["ext_metrics"]).issuperset({"kappa", "mcc", "f1_macro"})

    # centers variant smoke (num_pos=2 -> class means)
    s_opt2 = s_opt.replace(model_name="c3", pos_extra="centers", nce_p=2,
                           niter_decay=1)
    res2, _, _ = train_clat_student(s_opt2, data, fold=1)
    assert np.isfinite(res2["loss"])
