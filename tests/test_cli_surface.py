"""CLI flag-surface parity: the reference's exact shell recipes must parse.

Commands taken verbatim from ``MICCAI-2022/README.md:26-33``,
``MIA 2022/train.sh`` and ``MIA 2023/stage2_unimodal_student/
train_20230805.sh`` (flags only; the driver module differs by design).
"""
import os
import shlex

import pytest

from multimodal_learning_tpu.config import Options, parse_args

pytestmark = pytest.mark.smoke


def _parse(cmd: str) -> Options:
    return parse_args(shlex.split(cmd), save=False)


def test_miccai_teacher_recipe():
    opt = _parse("--pred_distill 1 --CRD_distill 0 --cut_fuse_grad True "
                 "--model_name stage1_pathomic_teacher --beta1 0.9")
    assert opt.pred_distill == 1 and opt.CRD_distill == 0
    assert opt.cut_fuse_grad is True and opt.beta1 == 0.9


def test_miccai_student_recipe():
    opt = _parse("--distill crd -a 1 -b 0.02 --nce_p2 20 --num_teachers 2 "
                 "--CE_grads True --model_name path_weighted_4teachers_distill "
                 "--fixed_model stage1_pathomic_teacher "
                 "--reg_type none --beta1 0.9 --select_pos_mode mid "
                 "--assign_weights True")
    assert opt.alpha == 1.0 and opt.beta == 0.02
    assert opt.assign_weights is True and opt.select_pos_mode == "mid"
    assert opt.CE_grads is True and opt.reg_type == "none"


def test_mia22_tsvd_teacher_recipe():
    opt = _parse("--pred_distill 1 --CRD_distill 0 --model_name random_test "
                 "--tSVD_loss True --mode pathomic --init_type max "
                 "--beta1 0.5 --fusion_type pofusion --n_views 4 "
                 "--tSVD_mode pathomic --Lambda_global 0.1 --batch_size 16 "
                 "--path_dim 128 --omic_dim 128 --mmhid 128")
    assert opt.tSVD_loss is True and opt.n_views == 4
    assert opt.Lambda_global == 0.1 and opt.mmhid == 128


def test_mia22_student_recipe():
    opt = _parse("--distill crd -r 1.0 -a 1.0 -b 0.02 --CE_grads True "
                 "--niter_decay 30 --model_name random_test "
                 "--fixed_model 1023_pathomic_MT --reg_type none --beta1 0.9 "
                 "--kd_T 1.0 --nce_p 1 --nce_p2 1 --nce_k 1024 --nce_k2 1024 "
                 "--neg_reweight False --pos_mode exact")
    assert opt.gamma == 1.0 and opt.nce_k == 1024
    assert opt.neg_reweight is False and opt.pos_mode == "exact"


def test_clat_stage2_recipe():
    opt = _parse("--CE_grads True --niter_decay 30 "
                 "--fixed_model stage1_ours_colorjit_v1 --reg_type none "
                 "--beta1 0.9 --pos_mode exact --nce_p 6 --nce_k 4096 "
                 "--pos_extra neighbors --max_discrep 1 --grads_thresh 0.25 "
                 "--use_grads_thresh True --num_teachers 2 "
                 "--assign_weights True")
    assert opt.nce_p == 6 and opt.nce_k == 4096
    assert opt.pos_extra == "neighbors" and opt.use_grads_thresh is True
    assert opt.grads_thresh == 0.25


def test_stage1_masking_recipe():
    opt = _parse("--masking 1 --Path_K 1 --Omic_K 5 --num_superpixels 100")
    assert opt.masking == 1 and opt.Path_K == 1 and opt.Omic_K == 5


def test_unknown_flags_silently_ignored():
    opt = _parse("--mode omic --not_a_real_flag 7 --another_fake x")
    assert opt.mode == "omic"


def test_string_booleans():
    opt = _parse("--tSVD_loss False --orth_loss True --sample_KD True")
    assert opt.tSVD_loss is False and opt.orth_loss is True
    assert opt.sample_KD is True


def test_platform_override_points_cache_at_repo(monkeypatch):
    # CPU CLI drives reuse the repo-local persistent compilation cache
    # (tests/conftest.py and __graft_entry__ point at the same dir), so a
    # repeat sweep/verify run skips recompiles; TPU drives stay uncached
    # (no stale-AOT retry outside __graft_entry__).
    import jax

    from multimodal_learning_tpu.cli._platform import (
        _REPO, apply_platform_override)

    monkeypatch.setenv("MML_PLATFORM", "cpu")
    monkeypatch.delenv("MML_NO_COMPILE_CACHE", raising=False)
    apply_platform_override()
    assert jax.config.jax_compilation_cache_dir == os.path.join(
        _REPO, ".jax_cache")


def test_evaluation_fold_scan_bounded_by_protocol(tmp_path, capsys):
    # Stale pickles from an earlier higher-fold run under the same
    # model_name must not silently mix into the patient-level aggregation
    # (advisor r4): the scan is bounded by the protocol's fold set —
    # synthetic_folds when set, else 5 for grading / 15 for survival
    # (reference evaluation_GBMLGG.py:66 / :30).
    import numpy as np

    from multimodal_learning_tpu.cli import evaluation_GBMLGG
    from multimodal_learning_tpu.eval.analysis import save_pred_test

    rng = np.random.default_rng(0)
    ckpt = tmp_path / "grad_15" / "m"
    ckpt.mkdir(parents=True)
    for k in range(1, 8):  # folds 6-7 simulate stale leftovers
        save_pred_test(str(ckpt / f"m_{k}_pred_test.pkl"),
                       {"pred_test": None,
                        "probs": {"path": rng.dirichlet(np.ones(3), size=8)},
                        "gt": rng.integers(0, 3, 8),
                        "patnames": [f"p{i // 2}" for i in range(8)]})

    base = ["--checkpoints_dir", str(tmp_path), "--exp_name", "grad_15",
            "--model_name", "m"]
    res = evaluation_GBMLGG.main(base + ["--task", "grad",
                                         "--synthetic_folds", "5"])
    out = capsys.readouterr().out
    assert "aggregating folds [1, 2, 3, 4, 5] of expected 1..5" in out
    assert ("path", "max") in res and ("fuse", "max") not in res

    # survival protocol scans 1..15 and therefore picks up all 7
    evaluation_GBMLGG.main(base + ["--task", "surv"])
    out = capsys.readouterr().out
    assert "of expected 1..15" in out
    assert "aggregating folds [1, 2, 3, 4, 5, 6, 7]" in out
