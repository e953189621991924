"""Optimizers — reference ``define_optimizer`` (``networks_new.py:80-90``).

torch.optim.Adam semantics: L2 weight decay is *added to the gradient before*
the moment updates (not decoupled), so the chain is
``add_decayed_weights -> scale_by_adam -> -lr``.

``adabound`` is RECONSTRUCTED: the reference constructs
``adabound.AdaBound(..., final_lr=opt.final_lr)`` (``networks_new.py:83``)
but the module is absent from its tree (SURVEY §0), so the flag is a dead
path there.  Here it is the real algorithm (Luo et al., ICLR 2019): Adam
whose per-element step size is clipped into bounds that converge to
``final_lr`` — smoothly morphing Adam into SGD.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class AdaBoundState(NamedTuple):
    count: jnp.ndarray
    mu: optax.Updates
    nu: optax.Updates


def scale_by_adabound(lr_schedule, *, final_lr: float = 0.1,
                      b1: float = 0.9, b2: float = 0.999,
                      eps: float = 1e-8,
                      bound_gamma: float = 1e-3) -> optax.GradientTransformation:
    """AdaBound (Luo et al. 2019), matching the official torch impl:

      step  = clip(lr_t·√(1−b2ᵗ)/(1−b1ᵗ) / (√v̂ + eps), lo_t, hi_t) · m
      lo_t  = final_lr·(lr_t/lr_0)·(1 − 1/(γ·t + 1))
      hi_t  = final_lr·(lr_t/lr_0)·(1 + 1/(γ·t))

    The bounds tighten onto ``final_lr`` as t grows, so the optimizer
    starts as Adam and ends as SGD with lr ``final_lr``.  Emits the
    *negative* step (ready to add to params) — the lr is folded in, do not
    chain with ``scale_by_learning_rate``."""
    base_lr = float(lr_schedule(0)) if callable(lr_schedule) else lr_schedule

    def init_fn(params):
        return AdaBoundState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(jnp.zeros_like, params),
            nu=jax.tree.map(jnp.zeros_like, params))

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        t = count.astype(jnp.float32)
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g,
                          state.mu, updates)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g,
                          state.nu, updates)
        lr_t = lr_schedule(count) if callable(lr_schedule) else lr_schedule
        step_size = lr_t * jnp.sqrt(1 - b2 ** t) / (1 - b1 ** t)
        flr = final_lr * lr_t / base_lr
        lo = flr * (1 - 1 / (bound_gamma * t + 1))
        hi = flr * (1 + 1 / (bound_gamma * t))

        def upd(m, v):
            per_el = jnp.clip(step_size / (jnp.sqrt(v) + eps), lo, hi)
            return -per_el * m

        return jax.tree.map(upd, mu, nu), AdaBoundState(count, mu, nu)

    return optax.GradientTransformation(init_fn, update_fn)


def _base_optimizer(opt, lr_schedule) -> optax.GradientTransformation:
    if opt.optimizer_type == "adam":
        return optax.chain(
            optax.add_decayed_weights(opt.weight_decay),
            optax.scale_by_adam(b1=opt.beta1, b2=opt.beta2, eps=1e-8),
            optax.scale_by_learning_rate(lr_schedule),
        )
    if opt.optimizer_type == "adabound":
        # the reference passes only lr/final_lr (networks_new.py:83) —
        # AdaBound defaults: betas (0.9, 0.999), gamma 1e-3, no weight decay
        return scale_by_adabound(lr_schedule, final_lr=opt.final_lr)
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
