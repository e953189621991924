"""Offline patient-level evaluation and aggregation.

Reference ``MICCAI-2022/core/utils_analysis.py`` (1182 LoC) +
``evaluation_GBMLGG.py`` + ``MIA 2022/ROI_evaluation.py``:

- per-fold prediction pickles are registered to TCGA patient IDs and
  aggregated patch -> patient by max / mean / 0.75-percentile
  (``getPredAggGrad_GBMLGG``, ``:79-135``)
- fold metrics with 95% confidence intervals (``calcAggGradMetrics``,
  ``:152-167``; ``CI_pm``, ``utils.py:567-573``)
- ROI-level evaluation: reshape (Nx9, 3) -> (N, 9, 3) and average the 9
  patches per ROI (``ROI_evaluation.py:46-66``)
- survival aggregation (``getAggHazardCV`` analogue) and ``hazard2grade``
  (``utils.py:546-551``)

Our prediction layout keeps arrays aligned with the split arrays end to end,
so the reference's assert-based registration dance reduces to a groupby.
"""
from __future__ import annotations

import pickle
from typing import Dict, List, Sequence, Tuple

import numpy as np
from scipy import stats

from .metrics import grading_metrics, one_hot


def ci_pm(data: Sequence[float], confidence: float = 0.95) -> float:
    """Half-width of the t-distribution CI (``utils.py:567-573``)."""
    a = np.asarray(data, dtype=float)
    se = stats.sem(a)
    return float(se * stats.t.ppf((1 + confidence) / 2.0, len(a) - 1))


def ci_interval(data: Sequence[float], confidence: float = 0.95):
    a = np.asarray(data, dtype=float)
    m = float(np.mean(a))
    h = ci_pm(data, confidence)
    return m - h, m + h


def p_percentile(q: float):
    def percentile_(x):
        return np.percentile(x, q * 100)
    return percentile_


def aggregate_patient_predictions(
        probs: np.ndarray, patnames: Sequence[str],
        agg_type: str = "max") -> Tuple[np.ndarray, List[str]]:
    """Aggregate patch/ROI probabilities to patient level.

    probs [N, C] aligned with patnames [N]; agg in {max, mean, p0.75}
    (``utils_analysis.py:121-127``).  Returns ([P, C], patient ids)."""
    import pandas as pd
    df = pd.DataFrame(probs, index=list(patnames))
    if agg_type == "p0.75":
        agg = df.groupby(level=0).quantile(0.75)
    else:
        agg = df.groupby(level=0).agg(agg_type)
    return agg.to_numpy(), list(agg.index)


def grad_evaluation(pred_folds: Dict[int, Dict], n_classes: int = 3,
                    agg_type: str = "max", avg: str = "micro"):
    """Patient-level grading evaluation across folds
    (``evaluation_GBMLGG.grad_evaluation`` + ``calcAggGradMetrics``).

    pred_folds: {fold: {"probs": [N, C], "gt": [N], "patnames": [N]}}.
    Returns dict with per-fold metrics and mean +- 95% CI rows.
    """
    rocs, aps, f1s, f1ivs = [], [], [], []
    for k, d in sorted(pred_folds.items()):
        probs, pats = aggregate_patient_predictions(
            np.asarray(d["probs"]), d["patnames"], agg_type)
        import pandas as pd
        gt_df = pd.Series(np.asarray(d["gt"]), index=list(d["patnames"]))
        gt = gt_df.groupby(level=0).first().loc[pats].to_numpy()
        oh = one_hot(gt, n_classes)
        r, a, f, fi = grading_metrics(oh, probs, avg)
        rocs.append(r)
        aps.append(a)
        f1s.append(f)
        f1ivs.append(fi)
    return {
        "per_fold": {"rocauc": rocs, "ap": aps, "f1_micro": f1s,
                     "f1_gradeIV": f1ivs},
        "mean": [np.mean(rocs), np.mean(aps), np.mean(f1s), np.mean(f1ivs)],
        "ci95": [ci_pm(rocs), ci_pm(aps), ci_pm(f1s), ci_pm(f1ivs)]
        if len(rocs) > 1 else [0.0] * 4,
    }


def roi_evaluation(probs: np.ndarray, gt: np.ndarray,
                   patches_per_roi: int = 9, n_classes: int = 3):
    """Patch -> ROI evaluation: average the 9 patches of each ROI
    (``ROI_evaluation.py:46-66``)."""
    n = probs.shape[0] // patches_per_roi
    roi_probs = probs[:n * patches_per_roi].reshape(
        n, patches_per_roi, -1).mean(1)
    roi_gt = gt[:n * patches_per_roi].reshape(n, patches_per_roi)[:, 0]
    return grading_metrics(one_hot(roi_gt, n_classes), roi_probs)


def aggregate_patient_hazards(hazards: np.ndarray, survtime: np.ndarray,
                              censor: np.ndarray, patnames: Sequence[str],
                              agg_type: str = "mean"):
    """Patch -> patient hazard aggregation for the survival task
    (``poolSurvTestPD`` / ``getAggHazardCV`` analogue,
    ``utils.py:583-653``)."""
    import pandas as pd
    df = pd.DataFrame({"hazard": hazards, "t": survtime, "e": censor},
                      index=list(patnames))
    agg = df.groupby(level=0).agg({"hazard": agg_type, "t": "first",
                                   "e": "first"})
    return (agg["hazard"].to_numpy(), agg["t"].to_numpy(),
            agg["e"].to_numpy(), list(agg.index))


def hazard2grade(hazard: float, p: Sequence[float]) -> int:
    """Percentile-threshold stratification (``utils.py:546-551``)."""
    for i, pct in enumerate(p):
        if hazard < pct:
            return i
    return len(p)


def save_pred_test(path: str, pred_test) -> None:
    """Pickle the per-fold prediction list (layout
    ``train_test_MT.py:452-453``) for offline analysis."""
    with open(path, "wb") as fh:
        pickle.dump(pred_test, fh)


def load_pred_test(path: str):
    with open(path, "rb") as fh:
        return pickle.load(fh)
