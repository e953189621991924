"""End-to-end training smoke tests on synthetic data (hermetic, CPU)."""
import numpy as np
import pytest

from multimodal_learning_tpu.config import Options
from multimodal_learning_tpu.data import make_synthetic_splits
from multimodal_learning_tpu.train.loop import train_teacher

pytestmark = pytest.mark.smoke


def _base_opt(**kw):
    defaults = dict(
        task="grad", label_dim=3, niter=0, niter_decay=3, batch_size=8,
        input_size_path=32, CRD_distill=0, pred_distill=0, SP_distill=0,
        lr=5e-3, verbose=0, checkpoints_dir="/tmp/mml_tpu_test_ckpt",
        host_workers=2, seed=0, reg_type="none",
    )
    defaults.update(kw)
    return Options(**defaults)


def test_omic_training_learns():
    """BASELINE config 2 (omic SNN grading): accuracy must beat chance on the
    synthetic class-separable data after 3 epochs."""
    data = make_synthetic_splits(n_train=96, n_test=48, roi_size=32, seed=1)
    opt = _base_opt(mode="omic", model_name="test_omic", omic_dim=16,
                    dropout_rate=0.1)
    res, best = train_teacher(opt, data, fold=1)
    assert res["acc_omic"] > 0.5  # 3 classes, chance = 1/3


def test_pathomic_training_runs():
    """Multimodal teacher (BASELINE config 3): full mean-teacher step with
    fusion + pred-KD + CRD bank on tiny shapes."""
    data = make_synthetic_splits(n_train=32, n_test=16, roi_size=32, seed=2)
    opt = _base_opt(mode="pathomic", model_name="test_pathomic",
                    path_dim=16, omic_dim=16, mmhid=16, feat_dim=8,
                    s_dim=16, t_dim=16,
                    niter_decay=1, CRD_distill=1, pred_distill=1,
                    num_teachers=2, pos_mode="exact", nce_p=1, nce_k=8)
    res, best = train_teacher(opt, data, fold=1)
    assert res["acc_fuse"] >= 0.0
    assert np.isfinite(res["loss"])
    for name in ("fuse", "path", "omic"):
        assert f"metrics_{name}" in res


def test_surv_training_runs():
    data = make_synthetic_splits(n_train=32, n_test=16, roi_size=32, seed=3)
    opt = _base_opt(mode="omic", model_name="test_surv", task="surv",
                    act_type="Sigmoid", label_dim=1, niter_decay=2,
                    omic_dim=16)
    res, best = train_teacher(opt, data, fold=1)
    assert 0.0 <= res["cindex_omic"] <= 1.0
    assert "pvalue" in res and "surv_acc" in res
