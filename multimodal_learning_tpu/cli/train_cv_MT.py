"""Teacher CV driver — reference ``MICCAI-2022/train_cv_MT.py``.

Loops folds k=1..5 (or the folds present), trains the mean-teacher multimodal
model, runs the final test, saves per-fold checkpoints and prints running
mean metrics per branch (``train_cv_MT.py:145-151``).

Usage (reference flag surface):
    python -m multimodal_learning_tpu.cli.train_cv_MT --task grad \
        --mode pathomic --pred_distill 1 --CRD_distill 0 --cut_fuse_grad True \
        --model_name stage1_pathomic_teacher --beta1 0.9

TPU additions: ``--synthetic_data`` fabricates a miniature dataset,
``--data_parallel N`` sizes the device mesh.
"""
from __future__ import annotations

import logging
import os
import sys

import numpy as np

from ._platform import apply_platform_override

apply_platform_override()

from ..config import parse_args
from ..data.splits import (load_cv_splits, make_synthetic_splits,
                           split_pickle_path)
from ..train.loop import train_teacher


def main(argv=None):
    # multi-host meshes: no-op unless MML_MULTIHOST=1
    from ..parallel.mesh import maybe_init_distributed
    maybe_init_distributed()
    opt = parse_args(argv)
    if opt.synthetic_data:
        data = make_synthetic_splits(n_train=64, n_test=32,
                                     n_folds=opt.synthetic_folds,
                                     roi_size=max(64, opt.input_size_path),
                                     seed=opt.seed)
        patches = None
    else:
        roi_path = split_pickle_path(opt)              # train_cv_MT.py:35
        patch_path = split_pickle_path(opt, patches=True)  # :48
        data = load_cv_splits(roi_path)
        patches = load_cv_splits(patch_path) if os.path.exists(patch_path) \
            else None

    results = {}
    branch_metrics = {"fuse": [], "path": [], "omic": []}
    for k in sorted(data["cv_splits"].keys()):
        print(f"*******************************************\n"
              f"************** SPLIT ({k}) **************\n"
              f"*******************************************")
        res, best = train_teacher(opt, data, k, patches_data=patches)
        results[k] = res
        if opt.task == "grad":
            for name in branch_metrics:
                m = res.get(f"metrics_{name}")
                if m is not None:
                    branch_metrics[name].append(m)
                    arr = np.array(branch_metrics[name])
                    print(f"[{name}] running mean AUC/AP/F1/F1-IV:",
                          arr.mean(0))
        else:
            print(f"fold {k} C-index:",
                  {n: res.get(f"cindex_{n}") for n in branch_metrics})
    logging.info("finished %d folds", len(results))
    return results


if __name__ == "__main__":
    main(sys.argv[1:])
