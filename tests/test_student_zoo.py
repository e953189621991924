"""Student stage with non-CRD distillation types (MIA-2022 v2 switch)."""
import numpy as np
import pytest

from multimodal_learning_tpu.config import Options
from multimodal_learning_tpu.data import make_synthetic_splits
from multimodal_learning_tpu.train.loop import train_teacher
from multimodal_learning_tpu.train.student import train_student


@pytest.fixture(scope="module")
def teacher_ckpt(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("zoo")
    data = make_synthetic_splits(n_train=24, n_test=8, roi_size=32, seed=8)
    common = dict(task="grad", label_dim=3, niter=0, batch_size=8,
                  input_size_path=32, lr=1e-3, verbose=0,
                  checkpoints_dir=str(tmp), host_workers=2, seed=0,
                  reg_type="none", path_dim=16, omic_dim=16, mmhid=16,
                  feat_dim=8)
    t_opt = Options(mode="pathomic", model_name="zt", niter_decay=1,
                    CRD_distill=0, pred_distill=1, **common)
    train_teacher(t_opt, data, fold=1)
    return tmp, data, common


@pytest.mark.parametrize("distill", ["kd", "feats_KL", "similarity", "rkd",
                                     "pkt", "hkd"])
def test_student_zoo_types(teacher_ckpt, distill):
    tmp, data, common = teacher_ckpt
    s_opt = Options(mode="pathomic", model_name=f"zs_{distill}",
                    fixed_model="zt", niter_decay=1, distill=distill,
                    num_teachers=2 if distill in ("kd",) else 1,
                    which_teacher="fuse", assign_weights=False,
                    pos_mode="exact", nce_p=1, nce_k=8,
                    alpha=1.0, beta=0.02, patience=0.0, **common)
    res, best, avg = train_student(s_opt, data, fold=1)
    assert np.isfinite(res["loss"])


def test_student_momentum_aekd(teacher_ckpt):
    tmp, data, common = teacher_ckpt
    s_opt = Options(mode="pathomic", model_name="zs_mom", fixed_model="zt",
                    niter_decay=1, distill="crd", num_teachers=2,
                    assign_weights=True, CE_grads=True,
                    loss_weighting="momentum_AEKD", grads_m=0.5, thresh=0.1,
                    select_pos_mode="hard", pos_mode="multi_pos",
                    nce_p=4, nce_p2=2, nce_k=8, nce_k2=4,
                    alpha=1.0, beta=0.02, patience=0.0, **common)
    res, best, avg = train_student(s_opt, data, fold=1)
    assert np.isfinite(res["loss"])
