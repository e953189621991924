"""Learning-rate schedules — reference ``define_scheduler``
(``networks_new.py:111-129``).  All schedules are functions of the *epoch*
(the reference steps per epoch except onecycle); we expose them as optax-style
functions of the global step given ``steps_per_epoch``.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import optax


def make_lr_schedule(opt, steps_per_epoch: int):
    base = opt.lr
    total_epochs = opt.niter + opt.niter_decay

    if opt.lr_policy == "linear":
        # lr_l = 1 - max(0, epoch + epoch_count - niter) / (niter_decay + 1)
        # (networks_new.py:113-115); torch's LambdaLR evaluates at
        # last_epoch = #scheduler.step() calls, i.e. epoch index from 0.
        def sched(step):
            epoch = step // steps_per_epoch
            over = jnp.maximum(0, epoch + opt.epoch_count - opt.niter)
            return base * (1.0 - over / float(opt.niter_decay + 1))
        return sched

    if opt.lr_policy == "exp":
        def sched(step):
            epoch = step // steps_per_epoch
            return base * (0.1 ** epoch)
        return sched

    if opt.lr_policy == "step":
        def sched(step):
            epoch = step // steps_per_epoch
            return base * (0.1 ** (epoch // opt.lr_decay_iters))
        return sched

    if opt.lr_policy == "cosine":
        def sched(step):
            epoch = step // steps_per_epoch
            return base * 0.5 * (1 + jnp.cos(jnp.pi * epoch / max(opt.niter, 1)))
        return sched

    if opt.lr_policy == "onecycle":
        # torch OneCycleLR(max_lr=1e-3, epochs=total, steps_per_epoch=200)
        return optax.cosine_onecycle_schedule(
            transition_steps=total_epochs * steps_per_epoch,
            peak_value=1e-3)

    if opt.lr_policy == "plateau":
        # ReduceLROnPlateau (factor 0.2, patience 5, threshold 0.01 —
        # networks_new.py:122) is metric-driven: the schedule itself is the
        # constant base LR, and ``make_optimizer`` wraps the chain in
        # ``inject_hyperparams`` so the loop can scale it per epoch with
        # ``optim.set_plateau_scale`` driven by ``PlateauTracker``.  (The
        # reference's own plateau branch is dead: it calls
        # ``scheduler.step()`` with no metric, a TypeError.)
        def sched(step):
            return base
        return sched

    raise NotImplementedError(
        f"learning rate policy [{opt.lr_policy}] is not implemented")


def sigmoid_rampup(current: float, rampup_length: float) -> float:
    """Exponential consistency ramp-up (Laine & Aila 2017) — reference
    ``utils.py:47-54`` / ``get_current_consistency_weight``
    (``train_test_MT.py:48-50``; the reference defines but comments out its
    use at ``:154-155``)."""
    if rampup_length == 0:
        return 1.0
    phase = 1.0 - min(max(current, 0.0), rampup_length) / rampup_length
    return float(np.exp(-5.0 * phase * phase))


class PlateauTracker:
    """Host-side ReduceLROnPlateau state (mode='min', factor=0.2,
    threshold=0.01 relative, patience=5)."""

    def __init__(self, factor=0.2, patience=5, threshold=0.01):
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.best = float("inf")
        self.bad_epochs = 0
        self.scale = 1.0

    def step(self, metric: float) -> float:
        if metric < self.best * (1 - self.threshold):
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.scale *= self.factor
                self.bad_epochs = 0
        return self.scale

    # snapshotted with the train state so --resume keeps the reduced LR
    # (a fresh tracker would write scale=1.0 back on the first epoch)
    def state_dict(self) -> dict:
        return {"best": self.best, "bad_epochs": self.bad_epochs,
                "scale": self.scale}

    def load_state_dict(self, d: dict) -> None:
        self.best = d["best"]
        self.bad_epochs = d["bad_epochs"]
        self.scale = d["scale"]
