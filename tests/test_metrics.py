"""Metric implementations vs brute-force / sklearn oracles."""
import numpy as np
import pytest

from multimodal_learning_tpu.eval.metrics import (accuracy_cox,
                                                  concordance_index,
                                                  cox_log_rank,
                                                  extended_grading_metrics,
                                                  grading_metrics, one_hot)

pytestmark = pytest.mark.smoke


def _brute_cindex(t, s, e):
    """Literal definition: admissible pairs + tie credits (lifelines)."""
    num = den = 0.0
    n = len(t)
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            if t[i] < t[j] and e[i] == 1:
                den += 1
                num += 1.0 if s[i] < s[j] else (0.5 if s[i] == s[j] else 0.0)
            elif t[i] == t[j] and i < j:
                if e[i] == 1 and e[j] == 1:
                    den += 1
                    num += 1.0 if s[i] == s[j] else 0.5
                elif e[i] == 1 and e[j] == 0:
                    den += 1
                    num += 1.0 if s[i] < s[j] else (0.5 if s[i] == s[j]
                                                    else 0.0)
                elif e[j] == 1 and e[i] == 0:
                    den += 1
                    num += 1.0 if s[j] < s[i] else (0.5 if s[i] == s[j]
                                                    else 0.0)
    return num / den


def test_concordance_matches_bruteforce(rng):
    n = 40
    t = rng.integers(1, 15, n).astype(float)  # integers force ties
    e = rng.binomial(1, 0.6, n)
    hazards = rng.normal(size=n)
    # usage parity: CIndex_lifeline(hazards, censor, survtime) calls
    # concordance_index(survtime, -hazards, censor) (utils.py:424-425)
    ours = concordance_index(t, -hazards, e)
    ref = _brute_cindex(t, -hazards, e)
    assert ours == pytest.approx(ref, rel=1e-9)


def test_concordance_perfect_ranking():
    t = np.array([1.0, 2.0, 3.0, 4.0])
    e = np.ones(4)
    hazards = np.array([4.0, 3.0, 2.0, 1.0])  # highest risk dies first
    assert concordance_index(t, -hazards, e) == 1.0


def test_accuracy_cox():
    hz = np.array([0.1, 0.2, 0.9, 0.8])
    labels = np.array([0, 0, 1, 1])
    assert accuracy_cox(hz, labels) == 1.0


def test_logrank_separated_groups(rng):
    n = 60
    grp_hazard = np.concatenate([np.zeros(n // 2), np.ones(n // 2)])
    t = np.where(grp_hazard > 0.5, rng.exponential(5, n),
                 rng.exponential(50, n)) + 0.1
    e = np.ones(n)
    p = cox_log_rank(grp_hazard + rng.normal(0, 0.01, n), e, t)
    assert p < 1e-4  # clearly different survival
    # identical groups: p should be large
    p2 = cox_log_rank(rng.normal(size=n), e, rng.exponential(20, n))
    assert p2 > 0.01


def test_grading_metrics_shapes(rng):
    gt = rng.integers(0, 3, 50)
    probs = rng.dirichlet(np.ones(3), 50)
    oh = one_hot(gt, 3)
    rocauc, ap, f1m, f1iv = grading_metrics(oh, probs)
    for v in (rocauc, ap, f1m, f1iv):
        assert 0.0 <= v <= 1.0
    ext = extended_grading_metrics(oh, probs)
    assert set(ext) == {"rocauc", "ap", "f1_micro", "f1_gradeIV", "f1_macro",
                        "recall_macro", "precision_macro", "kappa", "mcc"}


def test_grading_metrics_invariant_to_log(rng):
    """The reference feeds log-probs to the rank-based metrics; AUC/AP must be
    identical to feeding probs (monotone transform)."""
    gt = rng.integers(0, 3, 50)
    probs = rng.dirichlet(np.ones(3), 50)
    oh = one_hot(gt, 3)
    a1 = grading_metrics(oh, probs)
    a2 = grading_metrics(oh, np.log(probs))
    assert a1[0] == pytest.approx(a2[0])
    assert a1[2] == pytest.approx(a2[2])
