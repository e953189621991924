"""Student distillation CV driver — reference
``MICCAI-2022/train_cv_path_multi_MT.py`` (S2 copy adds 9-metric best/avg
tracking).  Trains the path-only student against the frozen multimodal
teacher named by ``--fixed_model``.
"""
from __future__ import annotations

import os
import sys

import numpy as np

from ._platform import apply_platform_override

apply_platform_override()

from ..config import parse_args
from ..data.splits import load_cv_splits, make_synthetic_splits, split_pickle_path
from ..train.student import train_student


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
        data = load_cv_splits(split_pickle_path(opt))
        ppath = split_pickle_path(opt, patches=True)
        patches = load_cv_splits(ppath) if os.path.exists(ppath) else None

    fold_metrics, fold_avg = [], []
    for k in sorted(data["cv_splits"].keys()):
        print(f"*************** SPLIT ({k}) ***************")
        res, best, avg = train_student(opt, data, k, patches_data=patches)
        if res.get("metrics_path") is not None:
            fold_metrics.append(res["metrics_path"])
        fold_avg.append(avg)
        arr = np.array(fold_metrics)
        if len(arr):
            # running mean±std of path AUC/AP/F1/F1-IV
            # (train_cv_path_multi_MT.py:121-124)
            print("path metrics mean:", arr.mean(0), "std:", arr.std(0))
    return fold_metrics


if __name__ == "__main__":
    main(sys.argv[1:])
