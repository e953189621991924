"""Metrics / survival-loss parity against the reference's OWN code.

Reuses the driver loaders from ``test_reference_parity_aekd`` (pytest puts
the tests dir on sys.path):

- ``grading_metrics`` 4-tuple (``MICCAI-2022/train_test_path_multi_distill
  .py:516-527``) and the MIA-2023 9-metric variant
  (``stage2 .../train_test_path_multi_distill.py:655-672``)
- ``CoxLoss`` (``MICCAI-2022/utils.py:361-376``)
- ``accuracy_cox`` (``utils.py:386-392``)
- ``CIndex`` (``utils.py:409-421``) — the reference *reports*
  ``CIndex_lifeline`` (lifelines, absent here); on tie-free data the
  hand-rolled ``CIndex`` coincides with the lifelines definition, which is
  what ``eval.metrics.concordance_index`` implements (incl. tie rules).
"""
import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from test_reference_parity_aekd import MICCAI, _install_stubs, _load_driver  # noqa: E402

from multimodal_learning_tpu.eval.metrics import (  # noqa: E402
    accuracy_cox, concordance_index, extended_grading_metrics,
    grading_metrics, one_hot)
from multimodal_learning_tpu.losses.task import cox_loss  # noqa: E402

S2 = "/root/reference/MIA 2023/stage2_unimodal_student"


@pytest.fixture(scope="module")
def ref_miccai():
    return _load_driver(f"{MICCAI}/train_test_path_multi_distill.py",
                        "ref_distill_miccai", [MICCAI])


@pytest.fixture(scope="module")
def ref_s2():
    return _load_driver(f"{S2}/train_test_path_multi_distill.py",
                        "ref_distill_s2", [MICCAI, S2])


@pytest.fixture(scope="module")
def ref_utils():
    _install_stubs()
    import sys
    if MICCAI not in sys.path:
        sys.path.insert(0, MICCAI)
    import utils
    return utils


@pytest.fixture
def rng():
    return np.random.default_rng(13)


def _grading_data(rng, b=60, c=3):
    gt = rng.integers(0, c, size=b)
    logits = rng.normal(size=(b, c)).astype(np.float64)
    probs = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    return one_hot(gt, c), probs


def test_grading_metrics(ref_miccai, rng):
    y, p = _grading_data(rng)
    ref = ref_miccai.grading_metrics(y, p)
    ours = grading_metrics(y, p)
    np.testing.assert_allclose(ours, ref[:4], rtol=1e-9)


def test_extended_grading_metrics(ref_s2, rng):
    y, p = _grading_data(rng)
    ref = ref_s2.grading_metrics(y, p)
    ours = extended_grading_metrics(y, p)
    keys = ["rocauc", "ap", "f1_micro", "f1_gradeIV", "f1_macro",
            "recall_macro", "precision_macro", "kappa", "mcc"]
    np.testing.assert_allclose([ours[k] for k in keys], ref, rtol=1e-9)


def test_cox_loss(ref_utils, rng):
    b = 16
    t = rng.uniform(1, 100, size=b).astype(np.float32)
    e = rng.integers(0, 2, size=b).astype(np.float32)
    h = rng.normal(size=(b, 1)).astype(np.float32)
    ref = ref_utils.CoxLoss(t, torch.from_numpy(e), torch.from_numpy(h),
                            torch.device("cpu"))
    ours = cox_loss(jnp.asarray(t), jnp.asarray(e), jnp.asarray(h))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_accuracy_cox(ref_utils, rng):
    h = rng.normal(size=40)
    e = rng.integers(0, 2, size=40)
    assert accuracy_cox(h, e) == pytest.approx(ref_utils.accuracy_cox(h, e))


def test_cindex_tie_free(ref_utils, rng):
    # continuous draws: no ties, the hand-rolled CIndex == lifelines rule
    b = 50
    t = rng.uniform(1, 100, size=b)
    e = rng.integers(0, 2, size=b)
    e[0] = 1  # at least one admissible pair
    h = rng.normal(size=b)
    ref = ref_utils.CIndex(h, e, t)
    ours = concordance_index(t, -h, e)
    np.testing.assert_allclose(ours, ref, rtol=1e-12)
