"""AdaBound reconstruction (``train/optim.py:scale_by_adabound``).

The reference constructs ``adabound.AdaBound(params, lr, final_lr)``
(``networks_new.py:83``) but ships no adabound module — a dead path there.
Ours is the real ICLR-2019 algorithm; verified against a hand-rolled numpy
transcription of the official update rule, and for its defining property:
the per-element step collapses onto ``final_lr`` (SGD) as t grows."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from multimodal_learning_tpu.config import Options
from multimodal_learning_tpu.train.optim import make_optimizer, scale_by_adabound


def _numpy_adabound(grads, lr=1e-3, final_lr=0.1, b1=0.9, b2=0.999,
                    eps=1e-8, gamma=1e-3):
    """Official AdaBound update sequence (base_lr == lr, no schedule)."""
    p = np.zeros_like(grads[0])
    m = np.zeros_like(p)
    v = np.zeros_like(p)
    for t, g in enumerate(grads, start=1):
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        step_size = lr * np.sqrt(1 - b2 ** t) / (1 - b1 ** t)
        lo = final_lr * (1 - 1 / (gamma * t + 1))
        hi = final_lr * (1 + 1 / (gamma * t))
        p = p - np.clip(step_size / (np.sqrt(v) + eps), lo, hi) * m
    return p


def test_adabound_matches_reference_rule():
    rng = np.random.default_rng(0)
    grads = [rng.normal(size=(5,)).astype(np.float32) for _ in range(7)]
    tx = scale_by_adabound(lambda c: 1e-3, final_lr=0.1)
    p = jnp.zeros(5)
    state = tx.init(p)
    for g in grads:
        upd, state = tx.update(jnp.asarray(g), state)
        p = optax.apply_updates(p, upd)
    np.testing.assert_allclose(p, _numpy_adabound(grads), rtol=1e-5,
                               atol=1e-7)


def test_adabound_converges_to_final_lr_sgd():
    """At large t the clip interval collapses: step == final_lr * m."""
    tx = scale_by_adabound(lambda c: 1e-3, final_lr=0.05)
    p = jnp.zeros(3)
    state = tx.init(p)
    state = state._replace(count=jnp.asarray(10_000_000, jnp.int32))
    g = jnp.asarray([1.0, -2.0, 0.5])
    upd, _ = tx.update(g, state)
    # m after one update from zero state is (1-b1)*g; bounds have width
    # ~2*final_lr/(gamma*t) ~ 1e-5 around final_lr
    np.testing.assert_allclose(upd, -0.05 * 0.1 * g, rtol=1e-3)


def test_adabound_via_make_optimizer_trains():
    opt = Options(optimizer_type="adabound", lr=1e-3, final_lr=0.1)
    tx = make_optimizer(opt, lambda c: opt.lr)
    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros(4)}
    state = tx.init(params)

    def loss(p):
        return jnp.sum((p["w"] @ jnp.ones(4) + p["b"]) ** 2)

    l0 = loss(params)
    for _ in range(25):
        g = jax.grad(loss)(params)
        upd, state = tx.update(g, state, params)
        params = optax.apply_updates(params, upd)
    assert float(loss(params)) < float(l0)
