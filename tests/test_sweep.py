"""The one-command synthetic sweep drives a real config group end-to-end.

``cli.sweep`` orchestrates the reference's hand-run shell-recipe protocol
(``MICCAI-2022/README.md:26-33``, ``MIA 2022/train.sh``) as one command;
the cheapest group ("omic", BASELINE config 2) is driven here for real —
train -> eval -> fold table -> report file — so the sweep plumbing
(``--synthetic_folds`` threading, ``_fold_table`` normalisation, report
rendering) is covered without the full five-config cost.
"""
import os

import numpy as np
import pytest

from multimodal_learning_tpu.cli import sweep


def test_sweep_omic_group_end_to_end(tmp_path):
    report = tmp_path / "report.md"
    sections = sweep.main([
        "--folds", "1", "--configs", "omic",
        "--out_dir", str(tmp_path / "ckpt"), "--report", str(report)])

    assert len(sections) == 1
    title, rows = sections[0]
    assert "config 2" in title
    # one branch row, the test_cv_MT 4-metric header, finite stats
    (name, header, mean, std), = rows
    assert name == "omic" and header == ("AUC", "AP", "F1", "F1-IV")
    assert np.isfinite(mean).all() and np.isfinite(std).all()
    assert ((0.0 <= mean) & (mean <= 1.0)).all()

    text = report.read_text()
    assert "omic SNN (config 2)" in text
    assert "1 config groups x 1 fold(s)" in text
    # the trained fold left its reference-layout checkpoint behind
    assert os.path.exists(
        tmp_path / "ckpt" / "grad_15" / "sw_omic" / "sw_omic_1.pt")


def test_fold_table_normalises_both_driver_returns():
    # test_cv_MT shape: {branch: [fold rows of 4 metrics]}
    rows = sweep._fold_table({"fuse": [[0.5, 0.4, 0.3, 0.2],
                                       [0.7, 0.6, 0.5, 0.4]],
                              "path": []})
    (name, header, mean, std), = rows
    assert name == "fuse" and len(header) == 4
    np.testing.assert_allclose(mean, [0.6, 0.5, 0.4, 0.3])

    # test_cv_path shape: [fold {metric: value}]
    rows = sweep._fold_table([{"rocauc": 0.6, "ap": 0.4},
                              {"rocauc": 0.8, "ap": 0.6}])
    (name, header, mean, std), = rows
    assert name == "path" and header == ("ap", "rocauc")
    np.testing.assert_allclose(mean, [0.5, 0.7])

    assert sweep._fold_table({}) == [] and sweep._fold_table([]) == []
