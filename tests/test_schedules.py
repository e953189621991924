"""LR schedules (reference define_scheduler semantics) + prefetch loader."""
import numpy as np
import pytest

from multimodal_learning_tpu.config import Options
from multimodal_learning_tpu.train.schedules import (PlateauTracker,
                                                     make_lr_schedule,
                                                     sigmoid_rampup)


def test_linear_schedule_reference_lambda():
    """lr_l = 1 - max(0, epoch + epoch_count - niter)/(niter_decay + 1)
    (networks_new.py:113-115), stepped per epoch."""
    opt = Options(lr=1.0, lr_policy="linear", niter=0, niter_decay=9,
                  epoch_count=1)
    s = make_lr_schedule(opt, steps_per_epoch=10)
    assert float(s(0)) == pytest.approx(1.0 - 1 / 10)
    assert float(s(9)) == pytest.approx(1.0 - 1 / 10)    # still epoch 0
    assert float(s(10)) == pytest.approx(1.0 - 2 / 10)   # epoch 1
    assert float(s(89)) == pytest.approx(1.0 - 9 / 10)


def test_step_and_exp_and_cosine():
    opt = Options(lr=1.0, lr_policy="step", lr_decay_iters=2, niter=4,
                  niter_decay=0)
    s = make_lr_schedule(opt, 1)
    assert float(s(0)) == 1.0 and float(s(2)) == pytest.approx(0.1)
    opt = Options(lr=1.0, lr_policy="exp")
    s = make_lr_schedule(opt, 1)
    assert float(s(1)) == pytest.approx(0.1)
    opt = Options(lr=1.0, lr_policy="cosine", niter=10)
    s = make_lr_schedule(opt, 1)
    assert float(s(0)) == pytest.approx(1.0)
    assert float(s(5)) == pytest.approx(0.5, abs=1e-6)


def test_plateau_tracker():
    t = PlateauTracker(factor=0.5, patience=1, threshold=0.01)
    assert t.step(1.0) == 1.0          # first -> best
    assert t.step(1.0) == 1.0          # bad 1
    assert t.step(1.0) == 0.5          # bad 2 > patience -> decay
    assert t.step(0.4) == 0.5          # new best, no further decay


def test_sigmoid_rampup():
    assert sigmoid_rampup(0, 10) == pytest.approx(np.exp(-5.0))
    assert sigmoid_rampup(10, 10) == 1.0
    assert sigmoid_rampup(5, 0) == 1.0


def test_prefetch_loader_yields_everything():
    import jax
    from multimodal_learning_tpu.data import make_synthetic_splits
    from multimodal_learning_tpu.data.pipeline import (Loader,
                                                       PathomicDataset,
                                                       PrefetchLoader)
    data = make_synthetic_splits(n_train=12, n_test=4, roi_size=32, seed=14)
    opt = Options(mode="pathomic", input_size_path=32, batch_size=4)
    ds = PathomicDataset(opt, data["cv_splits"][1], "train", train=True)
    loader = Loader(ds, 4, shuffle=False, drop_last=True, n_views=2,
                    workers=2)
    seen = []
    for batch in PrefetchLoader(loader, depth=2):
        # batches arrive as device arrays
        assert isinstance(batch["omic"], jax.Array)
        seen.append(np.asarray(batch["index"]))
    assert sorted(np.concatenate(seen).tolist()) == list(range(12))
