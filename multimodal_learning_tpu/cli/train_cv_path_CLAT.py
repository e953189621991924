"""CLAT stage-2 student driver — reference
``MIA 2023/stage2_unimodal_student/train_cv_path_multi_MT.py`` (+
``options_new.py`` flag surface; canonical recipe ``train_20230805.sh:5-9``:
``--nce_p 6 --nce_k 4096 --pos_mode exact --pos_extra neighbors
--max_discrep 1 --grads_thresh 0.25 --use_grads_thresh True
--num_teachers 2 --assign_weights True``).
"""
from __future__ import annotations

import os
import sys

import numpy as np

from ._platform import apply_platform_override

apply_platform_override()

from ..config import parse_args
from ..data.splits import load_cv_splits, make_synthetic_splits, split_pickle_path
from ..train.student_clat import train_clat_student


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

    fold_ext = []
    for k in sorted(data["cv_splits"].keys()):
        print(f"*************** SPLIT ({k}) ***************")
        res, best, ext = train_clat_student(opt, data, k,
                                            patches_data=patches)
        if ext:
            fold_ext.append(ext)
            keys = sorted(ext.keys())
            arr = np.array([[m[kk] for kk in keys] for m in fold_ext])
            print("9-metric mean:", dict(zip(keys, arr.mean(0).round(4))))
            print("9-metric std: ", dict(zip(keys, arr.std(0).round(4))))
    return fold_ext


if __name__ == "__main__":
    main(sys.argv[1:])
