"""Student distillation stage: gradient-weighting math + end-to-end smoke."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_learning_tpu.gradweight import (aekd_scale, aekd_total,
                                                aekd_v2_gate,
                                                gk_refine_thresh_weights,
                                                momentum_aekd_scale)


def test_aekd_scale_matches_reference_formula(rng):
    n_losses, b, d = 4, 8, 16
    grads = [jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
             for _ in range(n_losses + 1)]  # 4 KD + CE
    scale = aekd_scale(grads, n_kd=n_losses)
    G = np.stack([np.asarray(g).reshape(-1) for g in grads])
    norms = np.linalg.norm(G, axis=1, keepdims=True)
    rel = (G @ G.T) * n_losses / (norms @ norms.T)
    ref = rel.sum(1)
    np.testing.assert_allclose(np.asarray(scale), ref, rtol=1e-4)
    # total drops the CE slot (train_test_path_multi_distill.py:68)
    losses = [jnp.asarray(float(i + 1)) for i in range(n_losses)]
    total = aekd_total(scale, losses)
    assert float(total) == pytest.approx(
        float(np.dot(ref[:n_losses], [1, 2, 3, 4])), rel=1e-4)


def test_aekd_v2_gate_binary(rng):
    ce = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))
    aligned = ce * 2.0          # cos = +1 -> kept
    opposed = -ce               # cos = -1 -> dropped
    losses = [jnp.asarray(3.0), jnp.asarray(5.0)]
    total = aekd_v2_gate([aligned, opposed], ce, losses)
    assert float(total) == pytest.approx(3.0)


def test_gk_refine_thresh_per_sample(rng):
    b, d = 4, 8
    ce = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    g1 = ce * 2.0  # cos = +1 with CE and itself
    g2 = -ce       # cos = -1 with CE/g1, +1 with itself
    # full pairwise row-sums over [g1, g2, ce] (binarised > 0.25):
    # row g1: self(1) + ce(1) = 2;  row g2: self only = 1
    w = gk_refine_thresh_weights([g1, g2, ce], grads_thresh=0.25)
    assert w.shape == (b, 3)
    np.testing.assert_allclose(np.asarray(w[:, 0]), 2.0)
    np.testing.assert_allclose(np.asarray(w[:, 1]), 1.0)
    # relu-sum variant
    w2 = gk_refine_thresh_weights([g1, g2, ce], 0.25, use_thresh=False)
    np.testing.assert_allclose(np.asarray(w2[:, 0]), 2.0, rtol=1e-5)


def test_momentum_aekd_scale(rng):
    b, d = 4, 8
    ce = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    grads = [ce * 2.0, -ce, ce]   # KD1 (aligned), KD2 (opposed), CE
    ema = jnp.zeros(3)
    # binarised relation (> .1): row KD1 = self+CE = 2, row KD2 = self = 1
    w, new = momentum_aekd_scale(grads, ema, grads_m=0.5, thresh=0.1,
                                 use_thresh=True)
    np.testing.assert_allclose(np.asarray(w), [1.0, 0.5, 1.0])  # 0.5 * scale
    w2, _ = momentum_aekd_scale(grads, new, grads_m=0.5, thresh=0.1,
                                use_thresh=True)
    np.testing.assert_allclose(np.asarray(w2), [1.5, 0.75, 1.5])


@pytest.mark.smoke
def test_student_stage_end_to_end(tmp_path):
    """Teacher 1 epoch -> frozen load -> student 2 epochs with CRD v3 + AEKD."""
    from multimodal_learning_tpu.config import Options
    from multimodal_learning_tpu.data import make_synthetic_splits
    from multimodal_learning_tpu.train.loop import train_teacher
    from multimodal_learning_tpu.train.student import train_student

    data = make_synthetic_splits(n_train=48, n_test=16, roi_size=32, seed=4)
    common = dict(task="grad", label_dim=3, niter=0, batch_size=8,
                  input_size_path=32, lr=1e-3, verbose=0,
                  checkpoints_dir=str(tmp_path), host_workers=2, seed=0,
                  reg_type="none", path_dim=16, omic_dim=16, mmhid=16,
                  feat_dim=8, s_dim=16, t_dim=16)
    t_opt = Options(mode="pathomic", model_name="tch", niter_decay=1,
                    CRD_distill=0, pred_distill=1, **common)
    train_teacher(t_opt, data, fold=1)

    s_opt = Options(mode="pathomic", model_name="stu", fixed_model="tch",
                    niter_decay=2, distill="crd", num_teachers=2,
                    assign_weights=True, CE_grads=True,
                    select_pos_mode="hard", pos_mode="multi_pos",
                    nce_p=4, nce_p2=2, nce_k=8, nce_k2=4,
                    alpha=1.0, beta=0.02, CRD_distill=1, pred_distill=1,
                    patience=0.0, **common)
    res, best, avg = train_student(s_opt, data, fold=1)
    assert "acc_path" in res and np.isfinite(res["loss"])
    assert avg.shape == (4,)
