"""Mean-teacher EMA update — reference ``update_ema_variables``
(``train_test_MT.py:35-39``): ``alpha = min(1 - 1/(step+1), decay)`` then
``ema = alpha * ema + (1 - alpha) * param``.

Parity quirk preserved: only *parameters* are EMA-averaged.  BatchNorm running
statistics are buffers in torch and are never EMA'd; the EMA teacher's
running stats advance only through its own forward passes in train mode
(SURVEY §7 "BatchNorm + EMA teacher" note) — our loops likewise run the EMA
forward with ``use_running_average=False`` and carry its ``batch_stats``
separately.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_alpha(decay: float, step) -> jnp.ndarray:
    return jnp.minimum(1.0 - 1.0 / (step + 1.0), decay)


def update_ema(params, ema_params, decay: float, step):
    a = ema_alpha(decay, step)
    return jax.tree_util.tree_map(
        lambda e, p: e * a + p.astype(e.dtype) * (1.0 - a),
        ema_params, params)
