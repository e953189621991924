"""Optimizers — reference ``define_optimizer`` (``networks_new.py:80-90``).

torch.optim.Adam semantics: L2 weight decay is *added to the gradient before*
the moment updates (not decoupled), so the chain is
``add_decayed_weights -> scale_by_adam -> -lr``.  ``adabound`` is accepted and
mapped to adam (the reference's adabound import is broken anyway — it is
missing from its environment, SURVEY §0).
"""
from __future__ import annotations

import optax


def make_optimizer(opt, lr_schedule) -> optax.GradientTransformation:
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
