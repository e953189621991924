"""Lane-paired conv reformulation (``ops/paired_conv.py``) — exactness vs
the plain XLA conv it replaces, forward and backward, op- and model-level.
Reference shapes: ``resnets.py:150`` (stem), ``:165-190`` (64-ch stage)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from multimodal_learning_tpu.models.resnet import ResNet18
from multimodal_learning_tpu.ops.paired_conv import (
    paired_conv3x3, paired_stem_conv)


def _conv(x, w, stride, pad):
    return lax.conv_general_dilated(
        x, w, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("h,w,c", [(16, 16, 64), (8, 12, 32), (10, 6, 64)])
def test_paired_conv3x3_forward(h, w, c):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(3, h, w, c)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, c, c)) * 0.1, jnp.float32)
    np.testing.assert_allclose(paired_conv3x3(x, k), _conv(x, k, 1, 1),
                               rtol=1e-5, atol=1e-5)


def test_paired_conv3x3_grads_match_plain_conv():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 64)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, 64, 64)) * 0.1, jnp.float32)
    co = jnp.asarray(rng.normal(size=(2, 8, 8, 64)), jnp.float32)

    def loss_paired(x, k):
        return jnp.sum(paired_conv3x3(x, k) * co)

    def loss_plain(x, k):
        return jnp.sum(_conv(x, k, 1, 1) * co)

    gx_p, gk_p = jax.grad(loss_paired, argnums=(0, 1))(x, k)
    gx_r, gk_r = jax.grad(loss_plain, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(gx_p, gx_r, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(gk_p, gk_r, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("h,w", [(64, 64), (32, 16), (18, 12)])
def test_paired_stem_forward(h, w):
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, h, w, 3)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(7, 7, 3, 64)) * 0.1, jnp.float32)
    np.testing.assert_allclose(paired_stem_conv(x, k), _conv(x, k, 2, 3),
                               rtol=1e-5, atol=1e-5)


def test_paired_stem_wgrad_matches_plain_conv():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(7, 7, 3, 64)) * 0.1, jnp.float32)
    co = jnp.asarray(rng.normal(size=(2, 16, 16, 64)), jnp.float32)
    gk_p = jax.grad(lambda k: jnp.sum(paired_stem_conv(x, k) * co))(k)
    gk_r = jax.grad(lambda k: jnp.sum(_conv(x, k, 2, 3) * co))(k)
    np.testing.assert_allclose(gk_p, gk_r, rtol=1e-4, atol=1e-4)


def test_resnet18_paired_matches_unpaired():
    """Same params (identical trees by construction), same outputs."""
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    m_p = ResNet18(path_dim=32, paired=True)
    m_u = ResNet18(path_dim=32, paired=False)
    vars_p = m_p.init(jax.random.PRNGKey(0), x, train=False)
    out_p = m_p.apply(vars_p, x, train=False)
    out_u = m_u.apply(vars_p, x, train=False)   # identical param tree
    for a, b in zip(out_p, out_u):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)


def test_resnet18_paired_fallback_odd_width():
    """Odd spatial extents take the plain-conv path with the same params."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(1, 66, 66, 3)), jnp.float32)
    m = ResNet18(path_dim=32, paired=True)
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    out = m.apply(v, x, train=False)
    assert all(np.all(np.isfinite(np.asarray(o))) for o in out)
