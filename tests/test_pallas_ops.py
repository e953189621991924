"""Pallas kernels vs XLA references (interpret mode on the CPU mesh)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


@pytest.fixture(autouse=True)
def _interpret_pallas(monkeypatch):
    """Run pallas_call in interpreter mode on CPU."""
    monkeypatch.setenv("MML_PALLAS_FORCE", "1")
    orig = pl.pallas_call

    def patched(*args, **kw):
        kw.setdefault("interpret", True)
        return orig(*args, **kw)

    monkeypatch.setattr(pl, "pallas_call", patched)
    import multimodal_learning_tpu.ops.kron_fusion as kf
    monkeypatch.setattr(kf.pl, "pallas_call", patched)
    yield


def _ref(o1, o2, w, b):
    # w layout [d2, d1, K]: W[j, i, k] pairs with o1[:, i] * o2[:, j]
    return jnp.einsum("bi,bj,jik->bk", o1, o2, w) + b


def test_kron_matmul_forward(rng):
    from multimodal_learning_tpu.ops import kron_matmul
    B, d1, d2, K = 4, 9, 9, 16
    o1 = jnp.asarray(rng.normal(size=(B, d1)).astype(np.float32))
    o2 = jnp.asarray(rng.normal(size=(B, d2)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(d2, d1, K)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(K,)).astype(np.float32))
    out = kron_matmul(o1, o2, w, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_ref(o1, o2, w, b)),
                               rtol=1e-4, atol=1e-5)


def test_kron_matmul_grads(rng):
    from multimodal_learning_tpu.ops import kron_matmul
    B, d1, d2, K = 3, 5, 7, 8
    o1 = jnp.asarray(rng.normal(size=(B, d1)).astype(np.float32))
    o2 = jnp.asarray(rng.normal(size=(B, d2)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(d2, d1, K)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(K,)).astype(np.float32))

    def loss_pallas(o1, o2, w, b):
        return jnp.sum(jnp.sin(kron_matmul(o1, o2, w, b)))

    def loss_ref(o1, o2, w, b):
        return jnp.sum(jnp.sin(_ref(o1, o2, w, b)))

    g_p = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(o1, o2, w, b)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(o1, o2, w, b)
    for a, c in zip(g_p, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=1e-4,
                                   atol=1e-5)


def test_bilinear_fusion_pallas_eval_matches_einsum(rng):
    """pallas_eval=True (interpret mode here) must reproduce the einsum
    eval path exactly."""
    import jax
    from multimodal_learning_tpu.models import BilinearFusion
    d, mm = 15, 16  # d+1 = 16
    v1 = jnp.asarray(rng.normal(size=(4, d)).astype(np.float32))
    v2 = jnp.asarray(rng.normal(size=(4, d)).astype(np.float32))
    ref_mod = BilinearFusion(dim1=d, dim2=d, mmhid=mm, skip=1,
                             pallas_eval=False)
    vs = ref_mod.init({"params": jax.random.PRNGKey(0),
                       "dropout": jax.random.PRNGKey(1)}, v1, v2, train=True)
    ref = ref_mod.apply(vs, v1, v2, train=False)
    fast_mod = BilinearFusion(dim1=d, dim2=d, mmhid=mm, skip=1,
                              pallas_eval=True)
    out = fast_mod.apply(vs, v1, v2, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                               atol=1e-5)


def _ref_masked(o1, o2, w2d, b, maskf):
    o12 = jnp.einsum("bi,bj->bij", o1, o2).reshape(o1.shape[0], -1)
    return (o12 * maskf) @ w2d + b


def test_kron_matmul_dropout_forward(rng):
    from multimodal_learning_tpu.ops import kron_matmul_dropout
    B, d1, d2, K = 4, 9, 9, 16
    o1 = jnp.asarray(rng.normal(size=(B, d1)).astype(np.float32))
    o2 = jnp.asarray(rng.normal(size=(B, d2)).astype(np.float32))
    w2d = jnp.asarray(rng.normal(size=(d1 * d2, K)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(K,)).astype(np.float32))
    keep = 0.75
    maskf = jnp.asarray(
        (rng.random((B, d1 * d2)) < keep).astype(np.float32)) / keep
    out = kron_matmul_dropout(o1, o2, w2d, b, maskf)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_ref_masked(o1, o2, w2d, b, maskf)),
                               rtol=1e-4, atol=1e-5)


def test_kron_matmul_dropout_grads(rng):
    from multimodal_learning_tpu.ops import kron_matmul_dropout
    B, d1, d2, K = 3, 5, 7, 8
    o1 = jnp.asarray(rng.normal(size=(B, d1)).astype(np.float32))
    o2 = jnp.asarray(rng.normal(size=(B, d2)).astype(np.float32))
    w2d = jnp.asarray(rng.normal(size=(d1 * d2, K)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(K,)).astype(np.float32))
    maskf = jnp.asarray(
        (rng.random((B, d1 * d2)) < 0.75).astype(np.float32)) / 0.75

    def loss_pallas(o1, o2, w2d, b):
        return jnp.sum(jnp.sin(kron_matmul_dropout(o1, o2, w2d, b, maskf)))

    def loss_ref(o1, o2, w2d, b):
        return jnp.sum(jnp.sin(_ref_masked(o1, o2, w2d, b, maskf)))

    g_p = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(o1, o2, w2d, b)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(o1, o2, w2d, b)
    for a, c in zip(g_p, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=1e-4,
                                   atol=1e-5)


def test_bilinear_fusion_pallas_train_matches_einsum(rng):
    """pallas_fusion=train with dropout_rate=0 must match the einsum train
    path exactly (same params, dropout disabled -> deterministic)."""
    from multimodal_learning_tpu.models import BilinearFusion
    d, mm = 15, 16
    v1 = jnp.asarray(rng.normal(size=(4, d)).astype(np.float32))
    v2 = jnp.asarray(rng.normal(size=(4, d)).astype(np.float32))
    kw = dict(dim1=d, dim2=d, mmhid=mm, skip=1, dropout_rate=0.0)
    ref_mod = BilinearFusion(**kw)
    vs = ref_mod.init({"params": jax.random.PRNGKey(0),
                       "dropout": jax.random.PRNGKey(1)}, v1, v2, train=True)
    ref, _ = ref_mod.apply(vs, v1, v2, train=True,
                           rngs={"dropout": jax.random.PRNGKey(2)},
                           mutable=["batch_stats"])
    fast_mod = BilinearFusion(**kw, pallas_train=True)
    out, _ = fast_mod.apply(vs, v1, v2, train=True,
                            rngs={"dropout": jax.random.PRNGKey(2)},
                            mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                               atol=1e-5)
