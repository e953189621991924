"""Offline analysis: patient aggregation, CI, ROI eval, KM plots, TCGA CSV."""
import os

import numpy as np
import pytest

from multimodal_learning_tpu.eval.analysis import (
    aggregate_patient_hazards, aggregate_patient_predictions, ci_interval,
    ci_pm, grad_evaluation, hazard2grade, roi_evaluation)
from multimodal_learning_tpu.eval.metrics import one_hot


def test_patient_aggregation_max_and_mean(rng):
    probs = np.array([[0.2, 0.8], [0.6, 0.4], [0.9, 0.1]])
    pats = ["A", "A", "B"]
    agg, ids = aggregate_patient_predictions(probs, pats, "max")
    assert ids == ["A", "B"]
    np.testing.assert_allclose(agg[0], [0.6, 0.8])
    agg2, _ = aggregate_patient_predictions(probs, pats, "mean")
    np.testing.assert_allclose(agg2[0], [0.4, 0.6])
    agg3, _ = aggregate_patient_predictions(probs, pats, "p0.75")
    assert agg3.shape == (2, 2)


def test_grad_evaluation_end_to_end(rng):
    folds = {}
    for k in (1, 2):
        n_pat, ppp = 10, 3
        gt_pat = rng.integers(0, 3, n_pat)
        gt = np.repeat(gt_pat, ppp)
        probs = one_hot(gt, 3) * 0.7 + rng.dirichlet(np.ones(3), n_pat * ppp) * 0.3
        pats = np.repeat([f"P{i}" for i in range(n_pat)], ppp)
        folds[k] = {"probs": probs, "gt": gt, "patnames": pats}
    res = grad_evaluation(folds, 3, agg_type="max")
    assert len(res["per_fold"]["rocauc"]) == 2
    assert res["mean"][0] > 0.8  # strong signal injected
    assert all(c >= 0 for c in res["ci95"])


def test_ci_pm():
    vals = [0.8, 0.82, 0.78, 0.81, 0.79]
    h = ci_pm(vals)
    lo, hi = ci_interval(vals)
    assert lo < np.mean(vals) < hi
    assert h == pytest.approx((hi - lo) / 2)


def test_roi_evaluation(rng):
    n_roi, ppp = 8, 9
    gt = np.repeat(rng.integers(0, 3, n_roi), ppp)
    probs = one_hot(gt, 3) * 0.6 + rng.dirichlet(np.ones(3), n_roi * ppp) * 0.4
    m = roi_evaluation(probs, gt, patches_per_roi=ppp)
    assert len(m) == 4 and m[0] > 0.7


def test_hazard_aggregation_and_grade():
    hz = np.array([1.0, 3.0, 2.0])
    t = np.array([10.0, 10.0, 5.0])
    e = np.array([1.0, 1.0, 0.0])
    pats = ["A", "A", "B"]
    h, tt, ee, ids = aggregate_patient_hazards(hz, t, e, pats, "mean")
    np.testing.assert_allclose(h, [2.0, 2.0])
    assert hazard2grade(0.5, [1.0, 2.0]) == 0
    assert hazard2grade(1.5, [1.0, 2.0]) == 1
    assert hazard2grade(5.0, [1.0, 2.0]) == 2


def test_km_plot_and_box_plot(tmp_path, rng):
    from multimodal_learning_tpu.eval.plots import (km_curve,
                                                    make_hazard_box_plot,
                                                    make_kaplan_meier_plot)
    n = 60
    hz = rng.normal(size=n)
    t = rng.exponential(20, n) * np.exp(-hz)  # higher hazard dies sooner
    e = rng.binomial(1, 0.8, n).astype(float)
    times, probs = km_curve(t, e)
    assert probs[0] == 1.0 and np.all(np.diff(probs) <= 0)
    out = str(tmp_path / "km.png")
    make_kaplan_meier_plot(hz, t, e, out)
    assert os.path.getsize(out) > 1000
    out2 = str(tmp_path / "box.png")
    make_hazard_box_plot(hz, rng.integers(0, 3, n), out2)
    assert os.path.exists(out2)


def test_tcga_csv_pipeline(tmp_path):
    """getCleanAllDataset parity on a fabricated miniature CSV pair."""
    import pandas as pd
    from multimodal_learning_tpu.data.tcga import get_clean_all_dataset
    ids = [f"TCGA-{i:02d}" for i in range(8)]
    all_ds = pd.DataFrame({
        "indexes": range(8), "TCGA ID": ids,
        "censored": [0, 1, 0, 1, 0, 1, 0, 1],
        "Survival months": np.linspace(5, 80, 8),
        "idh mutation": [1, 0, None, 1, 0, 1, 0, 1],
        "codeletion": [1, 0, None, 0, 0, 1, 0, 1],
        "geneA": [1.0, 2.0, None, 4.0, 5.0, 6.0, 7.0, 8.0],
    })
    grade = pd.DataFrame({
        "TCGA ID": ids,
        "Histology": ["astrocytoma", "glioblastoma",
                      "astrocytoma (glioblastoma)", "oligodendroglioma",
                      None, "oligoastrocytoma", "astrocytoma",
                      "glioblastoma"],
        "Grade": [2, 4, 4, 3, None, 2, 3, 4],
        "Molecular subtype": ["IDHmut-codel", "IDHwt", None, "IDHmut-codel",
                              "IDHwt", "IDHmut-non-codel", "IDHwt", "IDHwt"],
    })
    all_ds.to_csv(tmp_path / "all_dataset.csv", index=False)
    grade.to_csv(tmp_path / "grade_data.csv", index=False)
    meta, df = get_clean_all_dataset(str(tmp_path),
                                     ignore_missing_moltype=True,
                                     ignore_missing_histype=True)
    assert "Histomolecular subtype" in df.columns
    # missing moltype/histology rows dropped
    assert len(df) == 6
    # grade shifted by -2; censored flipped
    assert set(df["Grade"]).issubset({0, 1, 2})
    assert df.loc["TCGA-00", "censored"] == 1
    # '(glioblastoma)' histology remap happened before the join
    assert df.loc["TCGA-01", "Histology"] == 3
    # geneA imputed with median
    assert not df["geneA"].isna().any()


def test_multivariate_logrank_separates_groups(rng):
    from multimodal_learning_tpu.eval.metrics import multivariate_logrank
    n = 60
    groups = np.repeat([0, 1, 2], n // 3)
    t = np.concatenate([rng.exponential(5, n // 3),
                        rng.exponential(20, n // 3),
                        rng.exponential(60, n // 3)])
    e = np.ones(n)
    p_sep = multivariate_logrank(groups, e, t)
    p_null = multivariate_logrank(rng.permutation(groups), e, t)
    assert 0.0 <= p_sep <= 1.0
    assert p_sep < 0.01
    assert p_null > p_sep


def test_register_predictions_asserts(rng):
    from multimodal_learning_tpu.eval.analysis import register_predictions
    n = 12
    # survival time / censor / grade are patient-level attributes: constant
    # across a patient's samples (as in the real data_pd)
    t = np.repeat(rng.exponential(20, n // 3), 3).astype(np.float32)
    e = np.ones(n, np.float32)
    g = np.repeat(rng.integers(0, 3, n // 3), 3).astype(np.int32)
    pats = [f"TCGA-{i // 3:02d}" for i in range(n)]
    split = {"test": {"t": t, "e": e, "g": g, "x_patname": pats}}
    pred = [np.zeros(n)] * 3 + [t, e] + [np.zeros((n, 3))] * 3 + [g]
    assert register_predictions(pred, split) == pats
    bad = list(pred)
    bad[3] = t + 1.0
    with pytest.raises(AssertionError, match="survival times"):
        register_predictions(bad, split)
    # metadata registration (data_pd analogue): one row per patient
    import pandas as pd
    meta = pd.DataFrame({"Survival months": t[::3], "censored": e[::3],
                         "Grade": g[::3],
                         "Histomolecular subtype": ["ODG"] * (n // 3)},
                        index=pats[::3])
    register_predictions(pred, split, metadata=meta)
    meta_bad = meta.copy()
    meta_bad["Grade"] = (meta_bad["Grade"] + 1) % 3
    with pytest.raises(AssertionError, match="grade"):
        register_predictions(pred, split, metadata=meta_bad)


def test_pool_and_agg_hazard_cv(rng):
    from multimodal_learning_tpu.eval.analysis import (get_agg_hazard_cv,
                                                       pool_surv_cv)
    folds = {}
    for k in (1, 2):
        n = 12
        pats = [f"TCGA-{k}{i // 3:02d}" for i in range(n)]
        folds[k] = {"hazard": rng.normal(size=n),
                    "t": np.repeat(rng.exponential(20, n // 3), 3),
                    "e": np.ones(n), "g": np.repeat([0, 1, 2, 0], 3),
                    "patnames": pats}
    pooled = pool_surv_cv(folds, agg_type="Hazard_mean", zscore=True)
    assert len(pooled) == 8  # 4 patients per fold
    assert abs(float(pooled["Hazard"].mean())) < 1e-6  # per-fold z-score
    cis = get_agg_hazard_cv(folds, agg_type="Hazard_mean")
    assert len(cis) == 2 and all(0.0 <= c <= 1.0 for c in cis)


def test_surv_logrank_percentile_variants(rng):
    from multimodal_learning_tpu.eval.analysis import \
        surv_logrank_by_percentile
    n = 90
    hz = rng.normal(size=n)
    t = np.exp(-hz) * 20 + rng.exponential(1, n)
    e = np.ones(n)
    for pct in [(50,), (33, 66), (26, 51, 76), (25, 50, 75)]:
        p = surv_logrank_by_percentile(hz, t, e, percentile=pct)
        assert 0.0 <= p <= 1.0
        assert p < 0.05  # hazard is genuinely prognostic here


def test_hazard_swarm_plot(tmp_path, rng):
    from multimodal_learning_tpu.eval.plots import make_hazard_swarm_plot
    n = 40
    out = str(tmp_path / "swarm.png")
    make_hazard_swarm_plot(
        rng.normal(size=n), rng.integers(0, 3, n),
        np.array(["idhwt_ATC", "idhmut_ATC", "ODG", "ODG"] * 10), out)
    import os
    assert os.path.getsize(out) > 0


class TestCoxPH:
    def _simulate(self, n=400, d=3, seed=0, ties=False):
        rng = np.random.default_rng(seed)
        X = rng.normal(size=(n, d))
        beta = np.array([1.0, -0.5, 0.0][:d])
        # exponential survival with rate exp(X beta); independent censoring
        t = rng.exponential(1.0 / np.exp(X @ beta))
        c = rng.exponential(2.0, n)
        event = (t <= c).astype(float)
        time = np.minimum(t, c)
        if ties:
            time = np.round(time, 1)  # create heavy ties
        return X, time, event, beta

    def test_recovers_coefficients(self):
        from multimodal_learning_tpu.eval import fit_coxph
        X, time, event, beta = self._simulate()
        est = fit_coxph(X, time, event)
        np.testing.assert_allclose(est, beta, atol=0.25)

    def test_score_zero_at_optimum(self):
        from multimodal_learning_tpu.eval import fit_coxph
        from multimodal_learning_tpu.eval.coxph import \
            _efron_loglik_grad_hess
        X, time, event, _ = self._simulate(ties=True)
        est = fit_coxph(X, time, event)
        _, grad, _ = _efron_loglik_grad_hess(est, X, time, event, 0.0)
        assert np.linalg.norm(grad) < 1e-3

    def test_penalizer_shrinks(self):
        from multimodal_learning_tpu.eval import fit_coxph
        X, time, event, _ = self._simulate()
        free = fit_coxph(X, time, event)
        pen = fit_coxph(X, time, event, penalizer=100.0)
        assert np.linalg.norm(pen) < np.linalg.norm(free)

    def test_partial_hazard_ranking_gives_high_cindex(self):
        from multimodal_learning_tpu.eval import (concordance_index,
                                                  fit_coxph,
                                                  predict_partial_hazard)
        X, time, event, _ = self._simulate(seed=1)
        beta = fit_coxph(X[:300], time[:300], event[:300])
        risk = -predict_partial_hazard(X[300:], beta)
        cin = concordance_index(time[300:], risk, event[300:])
        assert cin > 0.75

    def test_train_cox_cv_flow(self):
        """trainCox_GBMLGG parity flow: per-split fit, C-index + log-rank p,
        Hazard column in the returned per-split frames
        (core/utils_analysis.py:288-343)."""
        import pandas as pd
        from multimodal_learning_tpu.eval import train_cox_cv
        X, time, event, _ = self._simulate(seed=2)
        ids = [f"TCGA-{i:04d}" for i in range(len(X))]
        df = pd.DataFrame(X, index=ids,
                          columns=["Age", "Gender", "Grade"])
        df["Survival months"] = time
        df["censored"] = event
        splits = {"1": (ids[:250], ids[250:]),
                  "2": (ids[150:], ids[:150])}
        cin, pvals, hz = train_cox_cv(df, splits, model="cox_agegender",
                                      normalize=True)
        assert len(cin) == 2 and all(0.5 < c <= 1.0 for c in cin)
        assert all(0.0 <= p <= 1.0 for p in pvals)
        assert "Hazard" in hz["1"].columns
        assert len(hz["1"]) == 150


def test_hazard_histogram_plot(tmp_path):
    from multimodal_learning_tpu.eval.plots import make_hazard_histogram_plot
    rng = np.random.default_rng(0)
    n = 100
    make_hazard_histogram_plot(rng.normal(size=n),
                               rng.exponential(1000, n),
                               rng.integers(0, 2, n).astype(float),
                               str(tmp_path / "hhp.png"))
    assert (tmp_path / "hhp.png").exists()


def test_get_agg_hazard_cv_percentile_agg():
    """Regression: the reference's percentile agg types (utils.py:644-646)
    must not crash pandas .agg."""
    from multimodal_learning_tpu.eval.analysis import get_agg_hazard_cv
    rng = np.random.default_rng(0)
    pred_folds = {1: {
        "hazard": rng.normal(size=30),
        "t": rng.exponential(500, 30),
        "e": rng.integers(0, 2, 30).astype(float),
        "patnames": [f"P{i % 10}" for i in range(30)],
    }}
    for agg in ("Hazard_mean", "Hazard_max", "Hazard_p0.75", "Hazard_p0.25"):
        res = get_agg_hazard_cv(pred_folds, agg)
        assert len(res) == 1 and 0.0 <= res[0] <= 1.0


def test_swarm_plot_custom_grade_names(tmp_path):
    """Regression: caller-supplied grade_names must not crash the palette."""
    from multimodal_learning_tpu.eval.plots import make_hazard_swarm_plot
    rng = np.random.default_rng(0)
    n = 40
    make_hazard_swarm_plot(rng.normal(size=n), rng.integers(0, 3, n),
                           np.array(["idhwt_ATC", "idhmut_ATC", "ODG",
                                     "idhwt_ATC"] * 10),
                           str(tmp_path / "swarm.png"),
                           grade_names={0: "G2", 1: "G3", 2: "G4"})
    assert (tmp_path / "swarm.png").exists()
