"""Day-1 released-checkpoint drill (VERDICT r4 #8).

The reference releases fold checkpoints as the exact ``torch.save`` wrapper
dict built at ``MICCAI-2022/train_cv_MT.py:119-130``::

    {'split': k, 'opt': <argparse Namespace>, 'epoch': N, 'data': ...,
     'model_state_dict': ..., 'ema_model_state_dict': ...,
     'optimizer_state_dict': ..., 'metrics': ...}

This drill proves the whole day-1 compatibility pipeline on that exact
layout, end to end through the real CLIs: fabricate the released dict from
a reference-named torch PathomicNet -> ``cli.convert_torch --arch pathomic``
(both state keys) -> ``cli.test_cv_MT --pretrained_path`` evaluates the
converted weights with no native checkpoint present (the reference's own
eval loads ``model_state_dict``, ``test_cv_MT.py:58``).
"""
import os
import pickle

import numpy as np
import pytest

import torch
import torch.nn as tnn

from test_torch_import import TorchResNet18

D, MM = 8, 12  # path/omic feature dim, fusion hidden dim


class TorchMaxNet(tnn.Module):
    def __init__(self):
        super().__init__()
        enc = []
        for a, b in [(80, 64), (64, 48), (48, 32), (32, D)]:
            enc.append(tnn.Sequential(tnn.Linear(a, b), tnn.ELU(),
                                      tnn.AlphaDropout(0.25)))
        self.encoder = tnn.Sequential(*enc)
        self.classifier = tnn.Sequential(tnn.Linear(D, 3))


class TorchBF(tnn.Module):
    """Reference BilinearFusion at skip=1 (fusion.py:6-63 module names)."""

    def __init__(self):
        super().__init__()
        self.linear_h1 = tnn.Sequential(tnn.Linear(D, D), tnn.ReLU())
        self.linear_z1 = tnn.Bilinear(D, D, D)
        self.linear_o1 = tnn.Sequential(tnn.Linear(D, D), tnn.ReLU(),
                                        tnn.Dropout(0.25))
        self.linear_h2 = tnn.Sequential(tnn.Linear(D, D), tnn.ReLU())
        self.linear_z2 = tnn.Bilinear(D, D, D)
        self.linear_o2 = tnn.Sequential(tnn.Linear(D, D), tnn.ReLU(),
                                        tnn.Dropout(0.25))
        self.encoder1 = tnn.Sequential(tnn.Linear((D + 1) ** 2, MM),
                                       tnn.BatchNorm1d(MM), tnn.ReLU(),
                                       tnn.Dropout(0.25))
        self.encoder2 = tnn.Sequential(tnn.Linear(MM + 2 * D + 2, MM),
                                       tnn.BatchNorm1d(MM), tnn.ReLU(),
                                       tnn.Dropout(0.25))


class TorchPathomic(tnn.Module):
    def __init__(self):
        super().__init__()
        self.path_net = TorchResNet18(path_dim=D, num_classes=3)
        self.omic_net = TorchMaxNet()
        self.fusion = TorchBF()
        self.classifier = tnn.Sequential(tnn.Linear(MM, 3))


def _released_dict(seed: int) -> dict:
    """The exact train_cv_MT.py:119-130 payload, with DISTINCT model and
    EMA weights so converting the wrong key is detectable."""
    torch.manual_seed(seed)
    model, ema = TorchPathomic(), TorchPathomic()
    with torch.no_grad():
        for m in list(model.modules()) + list(ema.modules()):
            if isinstance(m, (tnn.BatchNorm2d, tnn.BatchNorm1d)):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)
    import argparse
    return {
        "split": 1,
        "opt": argparse.Namespace(mode="pathomic", task="grad"),
        "epoch": 30,
        "data": {"placeholder": "the reference pickles the full split dict"},
        "model_state_dict": model.state_dict(),
        "ema_model_state_dict": ema.state_dict(),
        "optimizer_state_dict": {"param_groups": [], "state": {}},
        "metrics": {"loss": [1.0]},
    }


@pytest.fixture(scope="module")
def released(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("released")
    src = str(tmp / "vt_1.pt")
    torch.save(_released_dict(0), src)
    return src, tmp


@pytest.mark.smoke
def test_convert_released_dict_both_keys(released):
    """convert_torch extracts model_state_dict by default and
    ema_model_state_dict under --state_key; the two differ."""
    from multimodal_learning_tpu.cli.convert_torch import main
    from multimodal_learning_tpu.models.import_torch import \
        load_pretrained_npz
    src, tmp = released
    dst_m = str(tmp / "vt_1_model.npz")
    dst_e = str(tmp / "vt_1_ema.npz")
    assert main(["--src", src, "--dst", dst_m, "--arch", "pathomic"]) == 0
    assert main(["--src", src, "--dst", dst_e, "--arch", "pathomic",
                 "--state_key", "ema_model_state_dict"]) == 0
    pm, sm = load_pretrained_npz(dst_m)
    pe, se = load_pretrained_npz(dst_e)
    assert set(pm) == {"path_net", "omic_net", "fusion", "classifier"}
    assert sm["path_net"]["bn1"]["mean"].shape == (64,)
    assert not np.allclose(pm["path_net"]["conv1"]["kernel"],
                           pe["path_net"]["conv1"]["kernel"])
    with pytest.raises(KeyError, match="no 'bogus_key'"):
        main(["--src", src, "--dst", dst_m, "--state_key", "bogus_key"])


@pytest.mark.smoke
def test_eval_driver_runs_released_weights(released, tmp_path, capsys):
    """test_cv_MT --pretrained_path evaluates converted released weights
    end-to-end with NO native fold checkpoint on disk."""
    from multimodal_learning_tpu.cli import test_cv_MT
    from multimodal_learning_tpu.cli.convert_torch import main as convert
    src, tmp = released
    dst = str(tmp / "vt_fold{k}.npz")
    assert convert(["--src", src, "--dst", dst.format(k=1),
                    "--arch", "pathomic"]) == 0
    ckpt_dir = str(tmp_path / "ckpt")
    metrics = test_cv_MT.main(
        ("--synthetic_data --mode pathomic --task grad --batch_size 8 "
         "--input_size_path 64 --path_dim 8 --omic_dim 8 --mmhid 12 "
         "--skip 1 --reg_type none --model_name drill "
         f"--checkpoints_dir {ckpt_dir} "
         f"--pretrained_path {dst}").split())
    out = capsys.readouterr().out
    # every converted tensor family merged (trunk + heads + fusion + cls)
    assert "loaded" in out and "param" in out
    n_loaded = int(out.split("loaded ")[1].split(" param")[0])
    # the full pathomic param tree at these dims is exactly 98 leaves
    # (66 resnet + 10 maxnet + 20 fusion + 2 classifier) — all merged,
    # not just a trunk subset
    assert n_loaded == 98
    assert metrics["fuse"], "eval produced no fused-branch metrics"
    assert np.asarray(metrics["fuse"][0]).shape == (4,)  # AUC/AP/F1/F1-IV
    pkl = os.path.join(ckpt_dir, "grad_15", "drill", "drill_1_pred_test.pkl")
    assert os.path.exists(pkl)
    with open(pkl, "rb") as fh:
        pred = pickle.load(fh)
    assert len(pred["gt"]) == 32  # synthetic split's n_test
