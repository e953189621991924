"""Eval-only CV driver — reference ``MICCAI-2022/test_cv_MT.py``.

Loads each fold's ``<model>_k_best.pt`` (or ``.pt``), runs test() and
aggregates branch metrics.
"""
from __future__ import annotations

import os
import sys

import jax
import numpy as np

from ._platform import apply_platform_override

apply_platform_override()

from ..config import parse_args
from ..data.pipeline import Loader, PathomicDataset
from ..data.splits import load_cv_splits, make_synthetic_splits, split_pickle_path
from ..models.factory import define_model
from ..train.loop import evaluate
from ..train.steps import build_eval_step
from ..utils.checkpoint import load_checkpoint


def _pretrained_fold_params(opt, model, k):
    """Day-1 released-checkpoint path: no native fold checkpoint needed —
    evaluate weights converted from the reference's own ``torch.save`` dict
    (``cli.convert_torch --arch pathomic``).  ``--pretrained_path`` may
    contain a ``{k}`` placeholder for per-fold files.  TPU-build addition;
    the reference always loads its fold checkpoint (test_cv_MT.py:52-65)."""
    import dataclasses

    from ..models.import_torch import apply_pretrained
    from ..train.loop import _sample_shapes
    path = opt.pretrained_path.format(k=k) if "{k}" in opt.pretrained_path \
        else opt.pretrained_path
    rng = jax.random.PRNGKey(opt.seed)
    shapes = _sample_shapes(opt)
    if opt.mode == "pathomic":
        variables = model.init({"params": rng, "dropout": rng},
                               x_path=shapes["x_path"],
                               x_omic=shapes["x_omic"], train=False)
    else:
        variables = model.init({"params": rng, "dropout": rng},
                               shapes["x_path" if opt.mode == "path"
                                      else "x_omic"], train=False)
    params, stats = apply_pretrained(
        dataclasses.replace(opt, pretrained_path=path),
        dict(variables["params"]),
        dict(variables.get("batch_stats", {})), log=print)
    return params, stats


def run_fold(opt, data, k, use_best=True):
    ckpt_dir = os.path.join(opt.checkpoints_dir, opt.exp_name, opt.model_name)
    suffix = "_best.pt" if use_best else ".pt"
    path = os.path.join(ckpt_dir, f"{opt.model_name}_{k}{suffix}")
    if not os.path.exists(path):
        path = os.path.join(ckpt_dir, f"{opt.model_name}_{k}.pt")
    model = define_model(opt)
    if not os.path.exists(path) and getattr(opt, "pretrained_path", ""):
        params, batch_stats = _pretrained_fold_params(opt, model, k)
    else:
        ckpt = load_checkpoint(path)
        params, batch_stats = (ckpt["model_state_dict"],
                               ckpt.get("batch_stats", {}))
    eval_step = build_eval_step(opt, model)
    split = data["cv_splits"][k]
    test_ds = PathomicDataset(opt, split, "test", train=False)
    loader = Loader(test_ds, opt.batch_size, shuffle=False, drop_last=False,
                    n_views=1, workers=opt.host_workers)
    res = evaluate(opt, eval_step, params, batch_stats, loader,
                   jax.random.PRNGKey(opt.seed))
    # dump predictions for offline patient-level analysis
    # (reference pickles pred_test per fold, train_cv_MT.py:134-135)
    from ..eval.analysis import save_pred_test
    patnames = list(split["test"].get("x_patname", []))
    save_pred_test(os.path.join(ckpt_dir,
                                f"{opt.model_name}_{k}_pred_test.pkl"),
                   {"pred_test": res["pred_test"], "probs": res["probs"],
                    "gt": res["gt"], "patnames": patnames})
    return res


def main(argv=None):
    opt = parse_args(argv)
    if opt.synthetic_data:
        # same shape as the train drivers so checkpoints trained with
        # --synthetic_data evaluate on the identical fabricated split
        data = make_synthetic_splits(n_train=64, n_test=32,
                                     n_folds=opt.synthetic_folds,
                                     roi_size=max(64, opt.input_size_path),
                                     seed=opt.seed)
    else:
        data = load_cv_splits(split_pickle_path(opt))
    metrics = {"fuse": [], "path": [], "omic": []}
    for k in sorted(data["cv_splits"].keys()):
        res = run_fold(opt, data, k)
        for name in metrics:
            m = res.get(f"metrics_{name}")
            if m is not None:
                metrics[name].append(m)
        print(f"fold {k}:",
              {n: res.get(f"acc_{n}") for n in metrics
               if res.get(f"acc_{n}") is not None})
    for name, ms in metrics.items():
        if ms:
            arr = np.array(ms)
            print(f"[{name}] AUC/AP/F1/F1-IV mean:", arr.mean(0),
                  "std:", arr.std(0))
    return metrics


if __name__ == "__main__":
    main(sys.argv[1:])
