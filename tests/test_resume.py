"""Mid-fold resume: the full train state round-trips through a snapshot and
training continues from the saved epoch."""
import os

import numpy as np

from multimodal_learning_tpu.config import Options
from multimodal_learning_tpu.data import make_synthetic_splits
from multimodal_learning_tpu.train.loop import train_teacher


def test_mid_fold_resume(tmp_path):
    data = make_synthetic_splits(n_train=24, n_test=8, roi_size=32, seed=12)
    common = dict(mode="omic", task="grad", model_name="res", omic_dim=8,
                  input_size_path=32, batch_size=8, lr=1e-3, verbose=0,
                  checkpoints_dir=str(tmp_path), host_workers=2,
                  reg_type="none", CRD_distill=0, pred_distill=0,
                  snapshot_every=2)
    # run 2 epochs and snapshot
    opt = Options(niter=0, niter_decay=2, **common)
    train_teacher(opt, data, fold=1)
    snap = os.path.join(str(tmp_path), "grad_15", "res", "res_1_state.snap")
    assert os.path.exists(snap)

    # resume with a 4-epoch budget: must continue from epoch 3
    logs = []
    opt = Options(niter=0, niter_decay=4, resume=True, **common)
    res, best = train_teacher(opt, data, fold=1, log=logs.append)
    assert any("resumed from epoch 2" in str(m) for m in logs)
    assert np.isfinite(res["loss"])

    # without resume, no resume message
    logs2 = []
    opt = Options(niter=0, niter_decay=2, resume=False,
                  **{**common, "model_name": "res2"})
    train_teacher(opt, data, fold=1, log=logs2.append)
    assert not any("resumed" in str(m) for m in logs2)


def _stage_common(tmp_path):
    return dict(task="grad", label_dim=3, niter=0, batch_size=8,
                input_size_path=32, lr=1e-3, verbose=0,
                checkpoints_dir=str(tmp_path), host_workers=2, seed=0,
                reg_type="none", path_dim=16, omic_dim=16, mmhid=16,
                feat_dim=8)


def test_student_mid_fold_resume(tmp_path):
    """VERDICT r2 #6: the student driver snapshots and resumes mid-fold."""
    from multimodal_learning_tpu.train.student import train_student

    data = make_synthetic_splits(n_train=24, n_test=8, roi_size=32, seed=9)
    common = _stage_common(tmp_path)
    t_opt = Options(mode="pathomic", model_name="tch", niter_decay=1,
                    CRD_distill=0, pred_distill=1, **common)
    train_teacher(t_opt, data, fold=1)

    s_common = dict(mode="pathomic", model_name="stu", fixed_model="tch",
                    distill="kd", num_teachers=2, alpha=1.0,
                    CRD_distill=0, pred_distill=1, patience=0.0,
                    snapshot_every=1, **common)
    train_student(Options(niter_decay=1, **s_common), data, fold=1)
    snap = os.path.join(str(tmp_path), "grad_15", "stu", "stu_1_state.snap")
    assert os.path.exists(snap)

    logs = []
    res, _, _ = train_student(Options(niter_decay=2, resume=True,
                                      **s_common), data, fold=1,
                              log=logs.append)
    assert any("resumed from epoch 1" in str(m) for m in logs)
    assert np.isfinite(res["loss"])


def test_clat_mid_fold_resume(tmp_path):
    from multimodal_learning_tpu.train.student_clat import train_clat_student

    data = make_synthetic_splits(n_train=24, n_test=8, roi_size=32, seed=9)
    common = _stage_common(tmp_path)
    t_opt = Options(mode="pathomic", model_name="ct", niter_decay=1,
                    CRD_distill=0, pred_distill=1, **common)
    train_teacher(t_opt, data, fold=1)

    s_common = dict(mode="pathomic", model_name="cs", fixed_model="ct",
                    distill="kd", num_teachers=2, alpha=1.0,
                    CRD_distill=0, pred_distill=1, patience=0.0,
                    snapshot_every=1, **common)
    train_clat_student(Options(niter_decay=1, **s_common), data, fold=1)
    snap = os.path.join(str(tmp_path), "grad_15", "cs", "cs_1_state.snap")
    assert os.path.exists(snap)

    logs = []
    res, _, _ = train_clat_student(Options(niter_decay=2, resume=True,
                                           **s_common), data, fold=1,
                                   log=logs.append)
    assert any("resumed from epoch 1" in str(m) for m in logs)
    assert np.isfinite(res["loss"])


def test_plateau_scale_survives_resume(tmp_path):
    """--lr_policy plateau + --resume: the reduced LR scale is restored
    from the snapshot's extra payload instead of resetting to 1.0 (r3
    review finding: a fresh PlateauTracker wrote 1.0 back)."""
    from multimodal_learning_tpu.train.optim import plateau_scale_of
    from multimodal_learning_tpu.train.schedules import PlateauTracker
    from multimodal_learning_tpu.utils.checkpoint import (load_train_state,
                                                          save_train_state)

    # tracker round-trip through the snapshot extra
    tr = PlateauTracker(patience=0)
    tr.step(1.0)
    tr.step(2.0)            # worse -> scale drops to 0.2
    assert tr.scale == 0.2
    tr2 = PlateauTracker()
    tr2.load_state_dict(tr.state_dict())
    assert tr2.scale == 0.2 and tr2.best == 1.0

    # driver-level: train 2 epochs with plateau, snapshot carries the
    # tracker; resumed run must log the restored scale in its opt_state
    data = make_synthetic_splits(n_train=24, n_test=8, roi_size=32, seed=12)
    common = dict(mode="omic", task="grad", model_name="plt", omic_dim=8,
                  input_size_path=32, batch_size=8, lr=1e-3, verbose=0,
                  checkpoints_dir=str(tmp_path), host_workers=2,
                  reg_type="none", CRD_distill=0, pred_distill=0,
                  snapshot_every=1, lr_policy="plateau")
    opt = Options(niter=0, niter_decay=2, **common)
    train_teacher(opt, data, fold=1)
    snap = os.path.join(str(tmp_path), "grad_15", "plt", "plt_1_state.snap")
    import pickle
    with open(snap, "rb") as fh:
        payload = pickle.load(fh)
    assert payload["extra"] is not None and "plateau" in payload["extra"]
    # force a reduced scale into the saved tracker and resume: the run
    # must come back with the tracker state, not a fresh one
    payload["extra"]["plateau"]["scale"] = 0.04
    payload["extra"]["plateau"]["best"] = 0.0   # nothing beats it
    with open(snap, "wb") as fh:
        pickle.dump(payload, fh)
    opt = Options(niter=0, niter_decay=4, resume=True, **common)
    train_teacher(opt, data, fold=1)
    with open(snap, "rb") as fh:
        after = pickle.load(fh)
    # tracker kept the injected reduction (0.04 * 0.2^k), never reset to 1.0
    assert after["extra"]["plateau"]["scale"] <= 0.04
