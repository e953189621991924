"""t-SVT operator + M3LR training integration."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_learning_tpu.lowrank import (build_view_features,
                                             tensor_nuclear_norm,
                                             update_adj_tensor, update_aux)


def _numpy_tsvt(adj, tau, rotate=True):
    """Dense numpy restatement of the t-SVT prox."""
    x = adj.transpose(0, 2, 1) if rotate else adj
    n3 = x.shape[-1]
    xf = np.fft.fft(x, axis=-1)
    tnn = 0.0
    out = np.empty_like(xf)
    for j in range(n3):
        u, s, vh = np.linalg.svd(xf[:, :, j], full_matrices=False)
        s2 = np.maximum(s - tau, 0)
        tnn += s2.sum()
        out[:, :, j] = (u * s2) @ vh
    x = np.real(np.fft.ifft(out, axis=-1))
    if rotate:
        x = x.transpose(0, 2, 1)
    return x, tnn / n3


def test_tsvt_matches_numpy(rng):
    B, V = 8, 4
    adj = rng.normal(size=(B, B, V)).astype(np.float32)
    adj = (adj + adj.transpose(1, 0, 2)) / 2
    ours, tnn = update_aux(jnp.asarray(adj), 0.3)
    ref, ref_tnn = _numpy_tsvt(adj.astype(np.float64), 0.3)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3, atol=1e-4)
    assert float(tnn) == pytest.approx(ref_tnn, rel=1e-3)


def test_tsvt_zero_threshold_is_identity(rng):
    B, V = 6, 2
    adj = rng.normal(size=(B, B, V)).astype(np.float32)
    ours, _ = update_aux(jnp.asarray(adj), 0.0)
    np.testing.assert_allclose(np.asarray(ours), adj, rtol=1e-4, atol=1e-5)


def test_tsvt_large_threshold_kills_everything(rng):
    adj = rng.normal(size=(6, 6, 2)).astype(np.float32)
    ours, tnn = update_aux(jnp.asarray(adj), 1e6)
    np.testing.assert_allclose(np.asarray(ours), 0.0, atol=1e-6)
    assert float(tnn) == 0.0


def test_tnn_decreases_after_thresholding(rng):
    adj = rng.normal(size=(8, 8, 4)).astype(np.float32)
    before = float(tensor_nuclear_norm(jnp.asarray(adj)))
    aux, _ = update_aux(jnp.asarray(adj), 0.5)
    after = float(tensor_nuclear_norm(aux))
    assert after < before


def test_adj_tensor_row_normalised(rng):
    feats = [jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))
             for _ in range(4)]
    adj = update_adj_tensor(feats)
    assert adj.shape == (4, 8, 8)
    norms = np.linalg.norm(np.asarray(adj), axis=2)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-4)


def test_view_sets_shapes(rng):
    f = lambda: jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))
    args = [f() for _ in range(6)]
    for v in (2, 4, 6, 8):
        f1, f2 = build_view_features(v, *args)
        assert len(f1) == v and len(f2) == v


@pytest.mark.smoke
def test_tsvd_training_runs(tmp_path):
    """BASELINE config 4 shape: M3LR teacher one epoch end-to-end."""
    from multimodal_learning_tpu.config import Options
    from multimodal_learning_tpu.data import make_synthetic_splits
    from multimodal_learning_tpu.train.loop import train_teacher

    data = make_synthetic_splits(n_train=32, n_test=16, roi_size=32, seed=5)
    opt = Options(mode="pathomic", task="grad", model_name="tsvd",
                  path_dim=16, omic_dim=16, mmhid=16, input_size_path=32,
                  batch_size=8, niter=0, niter_decay=1, lr=1e-3, verbose=0,
                  checkpoints_dir=str(tmp_path), host_workers=2,
                  reg_type="none", CRD_distill=0, pred_distill=1,
                  tSVD_loss=True, tSVD_mode="pathomic", n_views=4,
                  Lambda_global=0.1, mu=1e-5, pho=1.1, max_mu=1.0,
                  aux_iter=1)
    res, best = train_teacher(opt, data, fold=1)
    assert np.isfinite(res["loss"])
