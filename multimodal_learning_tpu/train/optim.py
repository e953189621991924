"""Optimizers — reference ``define_optimizer`` (``networks_new.py:80-90``).

torch.optim.Adam semantics: L2 weight decay is *added to the gradient before*
the moment updates (not decoupled), so the chain is
``add_decayed_weights -> scale_by_adam -> -lr``.  ``adabound`` is accepted and
mapped to adam (the reference's adabound import is broken anyway — it is
missing from its environment, SURVEY §0).
"""
from __future__ import annotations

import jax.numpy as jnp
import optax


def _base_optimizer(opt, lr_schedule) -> optax.GradientTransformation:
    if opt.optimizer_type in ("adam", "adabound"):
        return optax.chain(
            optax.add_decayed_weights(opt.weight_decay),
            optax.scale_by_adam(b1=opt.beta1, b2=opt.beta2, eps=1e-8),
            optax.scale_by_learning_rate(lr_schedule),
        )
    if opt.optimizer_type == "adagrad":
        return optax.chain(
            optax.add_decayed_weights(opt.weight_decay),
            optax.scale_by_rss(initial_accumulator_value=0.1, eps=1e-10),
            optax.scale_by_learning_rate(lr_schedule),
        )
    raise NotImplementedError(
        f"optimizer [{opt.optimizer_type}] is not implemented")


def make_optimizer(opt, lr_schedule) -> optax.GradientTransformation:
    base = _base_optimizer(opt, lr_schedule)
    if opt.lr_policy == "plateau":
        # ReduceLROnPlateau (networks_new.py:122: factor 0.2, patience 5,
        # threshold 0.01) is metric-driven, so the scale lives in the
        # optimizer state as an injected hyperparam; the host loop updates
        # it after each epoch's eval via ``set_plateau_scale`` (driven by
        # ``schedules.PlateauTracker``).
        return optax.inject_hyperparams(
            lambda lr_scale: optax.chain(base, optax.scale(lr_scale))
        )(lr_scale=1.0)
    return base


def set_plateau_scale(opt_state, scale: float):
    """Write the host-side plateau LR scale into an
    ``inject_hyperparams`` optimizer state (no-op cost: one scalar)."""
    hp = dict(opt_state.hyperparams)
    hp["lr_scale"] = jnp.asarray(scale, jnp.float32)
    return opt_state._replace(hyperparams=hp)


def plateau_scale_of(opt_state) -> float:
    """Read back the current plateau scale (for tests/logging)."""
    return float(opt_state.hyperparams["lr_scale"])
