"""Offline analysis parity against the reference's OWN code.

Covers both analysis substrates:

- ``core/utils_analysis.py`` grading flow (``getGradTestPats_GBMLGG`` /
  ``getPredAggGrad_GBMLGG`` / ``calcAggGradMetrics``, :42-171) vs
  ``eval.analysis.aggregate_patient_predictions`` + ``grad_evaluation``;
- ``utils.py`` survival flow (``poolSurvTestPD`` :583-615 and
  ``getAggHazardCV`` :620-653) vs ``pool_surv_cv`` + ``get_agg_hazard_cv``
  (the reference's C-index comes from lifelines, absent here; our
  lifelines-semantics ``concordance_index`` is injected into its namespace,
  so the comparison pins the registration + patient-aggregation pipeline).

The reference reads prediction pickles and CV-split pickles from
cwd-relative hardcoded paths — and ``utils_analysis`` executes
``getGradTestPats_GBMLGG()`` and ``getSurvTestPats_GBMLGG()`` at IMPORT time
(default arguments) — so the test fabricates the whole file tree first,
chdirs into it, then imports.  Quirk preserved: ``utils_analysis``'s surv
readers expect the MT-era 9-tuple pickle layout while ``utils.py``'s expect
the older 5-tuple, from the same path pattern — the trees here use distinct
model names for each layout.
"""
import importlib.util
import pickle
import sys

import numpy as np
import pandas as pd
import pytest

torch = pytest.importorskip("torch")

from test_reference_parity_aekd import MICCAI, _install_stubs  # noqa: E402
from test_reference_parity_tcga import _legacy_pandas  # noqa: E402,F401

from multimodal_learning_tpu.data.tcga import (  # noqa: E402
    add_histomolecular_subtype)
from multimodal_learning_tpu.eval.analysis import (  # noqa: E402
    aggregate_patient_predictions, ci_pm, get_agg_hazard_cv, grad_evaluation,
    pool_surv_cv)

UA = "/root/reference/MICCAI-2022/core/utils_analysis.py"
GRAD_MODEL = "pathomic_self_MT_5cv_0118"  # utils_analysis import-time default
SURV_MODEL9 = "pathomic_fusion"           # 9-tuple layout, import-time default
SURV_MODEL5 = "pathomic_MT"               # 5-tuple layout for utils.py flows


def _fabricate_grad(root):
    rng = np.random.default_rng(29)
    split_dir = root / "data/TCGA_GBMLGG/splits_5cv_2022"
    split_dir.mkdir(parents=True, exist_ok=True)
    ckpt = root / f"checkpoints/TCGA_GBMLGG/grad_15/{GRAD_MODEL}"
    ckpt.mkdir(parents=True, exist_ok=True)

    n_pat, ppp = 6, 3
    cv_splits, folds = {}, {}
    all_ids, all_grades = [], []
    for k in range(1, 6):
        ids = [f"TCGA-{k}{i}" for i in range(n_pat)]
        pat_grade = np.array([0, 1, 2, 0, 1, 2])
        patnames = np.repeat(ids, ppp)
        grades = np.repeat(pat_grade, ppp)
        probs = rng.dirichlet(np.ones(3), size=n_pat * ppp)
        cv_splits[k] = {"test": {"g": grades, "x_patname": patnames}}
        pred = (None, None, None, None, None, probs, probs, probs, grades)
        with open(ckpt / f"{GRAD_MODEL}_{k}_patch_pred_test.pkl", "wb") as fh:
            pickle.dump(pred, fh)
        folds[k] = {"probs": probs, "gt": grades, "patnames": patnames}
        all_ids.extend(ids)
        all_grades.extend(pat_grade)

    data_pd = pd.DataFrame({"TCGA ID": all_ids, "Grade": all_grades},
                           index=all_ids)
    with open(split_dir / "gbmlgg5cv_all_st_patches_512_1_1_0.pkl",
              "wb") as fh:
        pickle.dump({"cv_splits": cv_splits, "data_pd": data_pd}, fh)
    return folds


def _fabricate_surv(root):
    rng = np.random.default_rng(31)
    split_dir = root / "data/TCGA_GBMLGG/splits"
    split_dir.mkdir(parents=True, exist_ok=True)
    base = root / "checkpoints/TCGA_GBMLGG/surv_15_rnaseq"
    for m in (SURV_MODEL9, SURV_MODEL5):
        (base / m).mkdir(parents=True, exist_ok=True)

    n_pat, ppp = 5, 2
    cv_splits, folds = {}, {}
    rows = []
    for k in range(1, 16):
        ids = [f"TCGA-S{k:02d}{i}" for i in range(n_pat)]
        t_pat = rng.uniform(1, 120, n_pat).round(2)
        e_pat = rng.integers(0, 2, n_pat).astype(float)
        g_pat = rng.integers(0, 3, n_pat).astype(float)
        mol = rng.integers(0, 3, n_pat)
        hist = rng.integers(0, 4, n_pat)
        patnames = np.repeat(ids, ppp)
        t = np.repeat(t_pat, ppp)
        e = np.repeat(e_pat, ppp)
        g = np.repeat(g_pat, ppp)
        hz = rng.normal(size=n_pat * ppp)
        cv_splits[k] = {"test": {"t": t, "x_patname": patnames}}
        # the deleted slots hold [N, C] prob arrays in the real pickles —
        # the ragged shapes are what make np.array(pred) a 1-D OBJECT array,
        # which the reference's axis-less np.delete depends on
        probs = rng.dirichlet(np.ones(3), size=n_pat * ppp)
        pred9 = (hz, hz, hz, t, e, probs, probs, probs, g)
        with open(base / SURV_MODEL9 /
                  f"{SURV_MODEL9}_{k}_patch_pred_test.pkl", "wb") as fh:
            pickle.dump(pred9, fh)
        pred5 = (hz, t, e, probs, g)
        with open(base / SURV_MODEL5 /
                  f"{SURV_MODEL5}_{k}_patch_pred_test.pkl", "wb") as fh:
            pickle.dump(pred5, fh)
        folds[k] = {"hazard": hz, "t": t, "e": e, "g": g,
                    "patnames": patnames}
        rows.append(pd.DataFrame({
            "TCGA ID": ids, "Survival months": t_pat, "censored": e_pat,
            "Grade": g_pat, "Molecular subtype": mol, "Histology": hist,
        }, index=ids))

    data_pd = pd.concat(rows)
    data_pd.index.name = "TCGA ID"
    data_pd = add_histomolecular_subtype(data_pd)
    with open(split_dir / "gbmlgg15cv_all_st_patches_512_1_0_1_rnaseq.pkl",
              "wb") as fh:
        pickle.dump({"cv_splits": cv_splits, "data_pd": data_pd}, fh)
    return folds, data_pd


@pytest.fixture(autouse=True)
def _legacy_numpy(monkeypatch):
    """The reference's ``np.array(pred)`` on ragged prediction tuples relies
    on legacy numpy's implicit object-array fallback (removed in 1.24+);
    retry with dtype=object only where modern numpy would raise."""
    orig = np.array

    def compat_array(obj, *a, **kw):
        try:
            return orig(obj, *a, **kw)
        except ValueError:
            out = np.empty(len(obj), dtype=object)
            out[:] = list(obj)
            return out

    monkeypatch.setattr(np, "array", compat_array)


@pytest.fixture
def trees(tmp_path, monkeypatch):
    grad_folds = _fabricate_grad(tmp_path)
    surv_folds, data_pd = _fabricate_surv(tmp_path)
    monkeypatch.chdir(tmp_path)
    return grad_folds, surv_folds, data_pd


def _import_ua():
    _install_stubs()
    name = "ref_utils_analysis"
    sys.modules.pop(name, None)
    spec = importlib.util.spec_from_file_location(name, UA)
    ua = importlib.util.module_from_spec(spec)
    sys.modules[name] = ua
    spec.loader.exec_module(ua)  # runs the default-arg getters on our tree
    return ua


def _import_ref_utils():
    _install_stubs()
    if MICCAI not in sys.path:
        sys.path.insert(0, MICCAI)
    import utils
    return utils


def test_grading_patient_aggregation(trees):
    grad_folds, _, _ = trees
    ua = _import_ua()
    test_pats = ua.getGradTestPats_GBMLGG(model=GRAD_MODEL)
    y_label, y_pred = ua.getPredAggGrad_GBMLGG(
        ckpt_name="./checkpoints/TCGA_GBMLGG/grad_15/", model=GRAD_MODEL,
        agg_type="mean", test_pats=test_pats)
    ref_cis = ua.calcAggGradMetrics(y_label, y_pred)

    for i, k in enumerate(range(1, 6)):
        d = grad_folds[k]
        ours_probs, ours_pats = aggregate_patient_predictions(
            d["probs"], d["patnames"], "mean")
        np.testing.assert_allclose(ours_probs, y_pred[i], rtol=1e-12)
        assert list(ours_pats) == list(test_pats[k])

    res = grad_evaluation(grad_folds, agg_type="mean")
    for j, key in enumerate(["rocauc", "ap", "f1_micro", "f1_gradeIV"]):
        m = np.mean(res["per_fold"][key])
        h = ci_pm(res["per_fold"][key])
        assert f"{m:.4f} ± {h:.3f}" == ref_cis[j]


@pytest.mark.parametrize("agg", ["Hazard_mean", "Hazard_max"])
def test_pool_surv_pipeline(trees, agg):
    _, surv_folds, data_pd = trees
    utils = _import_ref_utils()
    ref = utils.poolSurvTestPD(
        ckpt_name="./checkpoints/TCGA_GBMLGG/surv_15_rnaseq/",
        model=SURV_MODEL5, agg_type=agg)
    ours = pool_surv_cv(surv_folds, agg_type=agg,
                        metadata=data_pd.drop(columns=["TCGA ID"]))
    assert list(ours.index) == list(ref.index)
    np.testing.assert_allclose(ours["Hazard"].to_numpy(float),
                               ref["Hazard"].to_numpy(float), rtol=1e-12)
    for col in ("Survival months", "censored", "Grade"):
        np.testing.assert_allclose(
            ours[col].to_numpy(float), ref[col].to_numpy(float), rtol=1e-12)
    assert (list(ours["Histomolecular subtype"])
            == list(ref["Histomolecular subtype"]))


def test_agg_hazard_cindex(trees, monkeypatch):
    _, surv_folds, _ = trees
    utils = _import_ref_utils()
    from multimodal_learning_tpu.eval.metrics import concordance_index
    # the reference's CIndex_lifeline calls lifelines' concordance_index
    # (stubbed to a no-op here); inject our lifelines-semantics one so the
    # comparison isolates the registration + aggregation pipeline
    monkeypatch.setattr(utils, "concordance_index", concordance_index,
                        raising=True)
    ref = utils.getAggHazardCV(
        ckpt_name="./checkpoints/TCGA_GBMLGG/surv_15_rnaseq/",
        model=SURV_MODEL5, agg_type="Hazard_mean")
    ours = get_agg_hazard_cv(surv_folds, agg_type="Hazard_mean")
    np.testing.assert_allclose(ours, ref, rtol=1e-12)
