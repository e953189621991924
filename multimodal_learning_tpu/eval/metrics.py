"""Evaluation metrics (host-side numpy/sklearn).

Reference:
- grading micro ROC-AUC / AP / F1-micro / F1-gradeIV
  (``MICCAI-2022/train_test_MT.py:473-486``)
- extended MIA-2023 metrics: macro F1/recall/precision, Cohen kappa, MCC
  (``MIA 2023/stage2.../train_test_path_multi_distill.py:655-672``)
- survival: C-index / log-rank p / Cox accuracy (``MICCAI-2022/utils.py:386-425``)
  — the reference uses ``lifelines``; the same statistics are implemented here
  directly (lifelines semantics, including 0.5 credit for tied predictions).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np
from scipy import stats
from sklearn.metrics import (average_precision_score, cohen_kappa_score,
                             f1_score, matthews_corrcoef, precision_score,
                             recall_score, roc_auc_score)


def one_hot(labels: np.ndarray, n_classes: int) -> np.ndarray:
    out = np.zeros((len(labels), n_classes), dtype=np.float32)
    out[np.arange(len(labels)), labels.astype(int)] = 1.0
    return out


def grading_metrics(y_label: np.ndarray, y_pred: np.ndarray,
                    avg: str = "micro") -> Tuple[float, float, float, float]:
    """(rocauc, ap, f1_micro, f1_gradeIV); ``y_label`` one-hot, ``y_pred``
    (log-)probabilities (``train_test_MT.py:473-486``; monotone transforms of
    the probabilities leave the rank-based metrics unchanged)."""
    rocauc = roc_auc_score(y_label, y_pred, average=avg)
    ap = average_precision_score(y_label, y_pred, average=avg)
    gt = np.argmax(y_label, axis=1)
    pred = np.argmax(y_pred, axis=1)
    f1_micro = f1_score(gt, pred, average=avg)
    f1_gradeIV = f1_score(gt, pred, average=None)[2]
    return rocauc, ap, f1_micro, f1_gradeIV


def extended_grading_metrics(y_label: np.ndarray, y_pred: np.ndarray):
    """9-metric report of the MIA-2023 code
    (``train_test_path_multi_distill.py:655-672``): micro AUC/AP/F1/F1-IV plus
    macro F1, macro recall, macro precision, Cohen kappa, MCC."""
    rocauc, ap, f1_micro, f1_iv = grading_metrics(y_label, y_pred)
    gt = np.argmax(y_label, axis=1)
    pred = np.argmax(y_pred, axis=1)
    return {
        "rocauc": rocauc, "ap": ap, "f1_micro": f1_micro, "f1_gradeIV": f1_iv,
        "f1_macro": f1_score(gt, pred, average="macro"),
        "recall_macro": recall_score(gt, pred, average="macro"),
        "precision_macro": precision_score(gt, pred, average="macro",
                                           zero_division=0),
        "kappa": cohen_kappa_score(gt, pred),
        "mcc": matthews_corrcoef(gt, pred),
    }


def concordance_index(event_times: np.ndarray, predicted_scores: np.ndarray,
                      event_observed: np.ndarray) -> float:
    """Harrell's C-index, lifelines semantics
    (``CIndex_lifeline``, ``utils.py:424-425`` calls
    ``concordance_index(survtime, -hazards, censor)``).

    Admissible pairs: (i, j) with t_i < t_j and event_i = 1, plus tied-time
    pairs where exactly one has an event.  Tied predictions get 0.5.
    """
    t = np.asarray(event_times, dtype=float)
    s = np.asarray(predicted_scores, dtype=float)
    e = np.asarray(event_observed, dtype=int)
    n = len(t)
    num, den = 0.0, 0.0
    for i in range(n):
        if e[i] != 1:
            continue
        # pairs where i experienced the event first: concordant when the
        # earlier event has the LOWER predicted score (higher score = longer
        # predicted survival; the caller passes -hazard)
        later = t > t[i]
        den += later.sum()
        num += (s[later] > s[i]).sum() + 0.5 * (s[later] == s[i]).sum()
        # tied times, other is censored: the censored one outlived i
        tied = (t == t[i]) & (e == 0)
        den += tied.sum()
        num += (s[tied] > s[i]).sum() + 0.5 * (s[tied] == s[i]).sum()
        # tied times, both events (counted once per pair): full credit when
        # the predictions are also tied, half otherwise — lifelines' rule.
        tied_ev = (t == t[i]) & (e == 1)
        tied_ev[i] = False
        den += 0.5 * tied_ev.sum()
        num += 0.5 * ((s[tied_ev] == s[i]).sum() * 1.0
                      + (s[tied_ev] != s[i]).sum() * 0.5)
    if den == 0:
        return 0.5
    return num / den


def accuracy_cox(hazards: np.ndarray, censor: np.ndarray) -> float:
    """Median-split hazard dichotomisation accuracy (``utils.py:386-392``)."""
    median = np.median(hazards)
    dichot = (hazards > median).astype(int)
    return float(np.sum(dichot == censor) / len(censor))


def cox_log_rank(hazards: np.ndarray, censor: np.ndarray,
                 survtime: np.ndarray) -> float:
    """Two-group log-rank test p-value after median hazard split
    (``utils.py:395-406``).  Standard Mantel-Haenszel statistic."""
    median = np.median(hazards)
    grp = (hazards > median).astype(int)
    times = np.unique(survtime[censor == 1])
    o_minus_e, var = 0.0, 0.0
    for tt in times:
        at_risk = survtime >= tt
        n = at_risk.sum()
        n1 = (at_risk & (grp == 1)).sum()
        d = ((survtime == tt) & (censor == 1)).sum()
        d1 = ((survtime == tt) & (censor == 1) & (grp == 1)).sum()
        if n <= 1:
            continue
        e1 = d * n1 / n
        v = d * (n1 / n) * (1 - n1 / n) * (n - d) / (n - 1)
        o_minus_e += d1 - e1
        var += v
    if var <= 0:
        return 1.0
    chi2 = o_minus_e ** 2 / var
    return float(stats.chi2.sf(chi2, df=1))


def multivariate_logrank(groups: np.ndarray, censor: np.ndarray,
                         survtime: np.ndarray) -> float:
    """k-group log-rank test p-value (the lifelines
    ``multivariate_logrank_test`` used by the reference's percentile
    stratification plots, ``core/utils_analysis.py:398-419,921-945``).
    Chi-square statistic with k-1 dof from the per-group observed-minus-
    expected event counts and their covariance."""
    groups = np.asarray(groups)
    labels = np.unique(groups)
    k = len(labels)
    if k < 2:
        return 1.0
    gidx = np.searchsorted(labels, groups)
    times = np.unique(survtime[censor == 1])
    z = np.zeros(k)
    V = np.zeros((k, k))
    for tt in times:
        at_risk = survtime >= tt
        n = at_risk.sum()
        if n <= 1:
            continue
        d = ((survtime == tt) & (censor == 1)).sum()
        nj = np.array([(at_risk & (gidx == j)).sum() for j in range(k)],
                      float)
        dj = np.array([((survtime == tt) & (censor == 1)
                        & (gidx == j)).sum() for j in range(k)], float)
        ej = d * nj / n
        z += dj - ej
        frac = nj / n
        V += (d * (n - d) / (n - 1)) * (np.diag(frac) - np.outer(frac, frac))
    # drop one group (covariance is singular by construction)
    z_r, V_r = z[:-1], V[:-1, :-1]
    try:
        chi2 = float(z_r @ np.linalg.solve(V_r, z_r))
    except np.linalg.LinAlgError:
        return 1.0
    return float(stats.chi2.sf(chi2, df=k - 1))
