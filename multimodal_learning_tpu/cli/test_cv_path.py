"""Unimodal pathology student eval driver — reference
``MIA 2023/stage2_unimodal_student/test_cv_path.py`` (BASELINE config 1):
loads each fold's path-only student checkpoint, evaluates on the test (or
patches) split, prints per-fold + aggregate metrics, and dumps predictions.
"""
from __future__ import annotations

import os
import sys

import numpy as np

from ._platform import apply_platform_override

apply_platform_override()

import jax

from ..config import parse_args
from ..data.pipeline import Loader, PathomicDataset
from ..data.splits import load_cv_splits, make_synthetic_splits, split_pickle_path
from ..eval.analysis import save_pred_test
from ..eval.metrics import extended_grading_metrics, one_hot
from ..models.factory import define_model
from ..train.loop import evaluate
from ..train.steps import build_eval_step
from ..utils.checkpoint import load_checkpoint


def main(argv=None):
    opt = parse_args(argv)
    if opt.synthetic_data:
        data = make_synthetic_splits(n_train=64, n_test=32,
                                     n_folds=opt.synthetic_folds,
                                     roi_size=max(64, opt.input_size_path),
                                     seed=opt.seed)
    else:
        data = load_cv_splits(split_pickle_path(opt, patches=True))

    eval_opt = opt.replace(mode="path")
    model = define_model(eval_opt)
    eval_step = build_eval_step(eval_opt, model)
    ckpt_dir = os.path.join(opt.checkpoints_dir, opt.exp_name, opt.model_name)

    all_ext = []
    for k in sorted(data["cv_splits"].keys()):
        path = os.path.join(ckpt_dir, f"{opt.model_name}_{k}_best.pt")
        if not os.path.exists(path):
            path = os.path.join(ckpt_dir, f"{opt.model_name}_{k}.pt")
        ckpt = load_checkpoint(path)
        split = data["cv_splits"][k]
        ds = PathomicDataset(eval_opt, split, "test", train=False)
        loader = Loader(ds, opt.batch_size, shuffle=False, drop_last=False,
                        n_views=1, workers=opt.host_workers)
        res = evaluate(eval_opt, eval_step, ckpt["model_state_dict"],
                       ckpt.get("batch_stats", {}), loader,
                       jax.random.PRNGKey(opt.seed))
        ext = extended_grading_metrics(one_hot(res["gt"], opt.label_dim),
                                       res["probs"]["path"]) \
            if opt.task == "grad" else {}
        all_ext.append(ext)
        print(f"fold {k}:", {m: round(v, 4) for m, v in ext.items()})
        save_pred_test(
            os.path.join(ckpt_dir, f"{opt.model_name}_{k}_pred_test.pkl"),
            {"pred_test": res["pred_test"], "probs": res["probs"],
             "gt": res["gt"],
             "patnames": list(split["test"].get("x_patname", []))})
    if all_ext and all_ext[0]:
        keys = sorted(all_ext[0].keys())
        arr = np.array([[m[kk] for kk in keys] for m in all_ext])
        print("mean:", dict(zip(keys, arr.mean(0).round(4))))
        print("std: ", dict(zip(keys, arr.std(0).round(4))))
    return all_ext


if __name__ == "__main__":
    main(sys.argv[1:])
