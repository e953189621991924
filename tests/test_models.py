"""Model shape / behaviour tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_learning_tpu.config import Options
from multimodal_learning_tpu.models import (BilinearFusion, MaxNet,
                                            PathomicModel, PolynomialFusion,
                                            ResNet18, define_model)
from multimodal_learning_tpu.models.fusion import Bilinear

KEY = jax.random.PRNGKey(0)


def test_maxnet_shapes_and_act():
    m = MaxNet(omic_dim=32, label_dim=3, act_type="LSM")
    vs = m.init({"params": KEY, "dropout": KEY}, jnp.ones((4, 80)))
    feat, hazard, pred = m.apply(vs, jnp.ones((4, 80)), train=False)
    assert feat.shape == (4, 32) and hazard.shape == (4, 3)
    # LSM act: log-probs sum to 1 after exp
    np.testing.assert_allclose(np.exp(np.asarray(pred)).sum(1), 1.0,
                               rtol=1e-5)
    assert float(jnp.min(feat)) >= 0.0  # ReLU feature head


def test_maxnet_surv_range_shift():
    m = MaxNet(omic_dim=8, label_dim=1, act_type="Sigmoid")
    vs = m.init({"params": KEY, "dropout": KEY}, jnp.ones((4, 80)))
    _, _, pred = m.apply(vs, jnp.ones((4, 80)) * 100, train=False)
    # sigmoid*6-3 range (networks_new.py:236-237)
    assert np.all(np.asarray(pred) <= 3.0) and np.all(np.asarray(pred) >= -3.0)


def test_resnet18_param_count_and_shapes():
    r = ResNet18(path_dim=32, num_classes=3)
    vs = r.init({"params": KEY}, jnp.ones((2, 64, 64, 3)), train=False)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(vs["params"]))
    # torchvision resnet18 trunk (11.18M) + fc_new heads
    assert 11_100_000 < n_params < 11_300_000
    f3, feat, hz, pred = r.apply(vs, jnp.ones((2, 64, 64, 3)), train=False)
    assert f3.shape == (2, 256)      # layer3 GAP (resnets.py:234)
    assert feat.shape == (2, 32)
    assert hz.shape == (2, 3)


def test_bilinear_module_matches_torch_semantics(rng):
    import torch
    x1 = rng.normal(size=(3, 5)).astype(np.float32)
    x2 = rng.normal(size=(3, 7)).astype(np.float32)
    m = Bilinear(5, 7, 4)
    vs = m.init(KEY, jnp.asarray(x1), jnp.asarray(x2))
    ours = m.apply(vs, jnp.asarray(x1), jnp.asarray(x2))
    tb = torch.nn.Bilinear(5, 7, 4)
    with torch.no_grad():
        tb.weight.copy_(torch.tensor(np.asarray(vs["params"]["kernel"])))
        tb.bias.copy_(torch.tensor(np.asarray(vs["params"]["bias"])))
        ref = tb(torch.tensor(x1), torch.tensor(x2)).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)


def test_bilinear_fusion_shapes():
    f = BilinearFusion(dim1=16, dim2=16, mmhid=24, skip=1)
    v1 = jnp.ones((4, 16))
    v2 = jnp.ones((4, 16))
    vs = f.init({"params": KEY, "dropout": KEY}, v1, v2, train=True)
    out, _ = f.apply(vs, v1, v2, train=True, mutable=["batch_stats"],
                     rngs={"dropout": KEY})
    assert out.shape == (4, 24)
    out_eval = f.apply(vs, v1, v2, train=False)
    assert out_eval.shape == (4, 24)


def test_polynomial_fusion_shapes():
    f = PolynomialFusion(dim1=16, dim2=16, mmhid=16, skip=1)
    v = jnp.ones((4, 16))
    vs = f.init({"params": KEY, "dropout": KEY}, v, v, train=True)
    out, _ = f.apply(vs, v, v, train=True, mutable=["batch_stats"],
                     rngs={"dropout": KEY})
    assert out.shape == (4, 16)


def test_pathomic_cut_fuse_grad_blocks_gradient():
    pm = PathomicModel(path_dim=8, omic_dim=8, mmhid=8, label_dim=3,
                       cut_fuse_grad=True, dropout_rate=0.0)
    k1, k2 = jax.random.split(KEY)
    x_path = jax.random.normal(k1, (4, 32, 32, 3))
    x_omic = jax.random.normal(k2, (4, 80))
    vs = pm.init({"params": KEY, "dropout": KEY}, x_path=x_path,
                 x_omic=x_omic, train=True)

    def fuse_loss(params):
        out, _ = pm.apply({"params": params,
                           "batch_stats": vs["batch_stats"]},
                          x_path=x_path, x_omic=x_omic, train=True,
                          mutable=["batch_stats"], rngs={"dropout": KEY})
        return jnp.sum(out.hazard_fuse ** 2)

    g = jax.grad(fuse_loss)(vs["params"])
    # with cut_fuse_grad, the fused loss must not reach the encoders
    omic_g = jax.tree_util.tree_leaves(g["omic_net"])
    assert all(float(jnp.abs(x).max()) == 0.0 for x in omic_g)
    # but the fusion/classifier do get gradients
    fus_g = jax.tree_util.tree_leaves(g["fusion"])
    assert any(float(jnp.abs(x).max()) > 0.0 for x in fus_g)


def test_define_model_modes():
    opt = Options(mode="omic", omic_dim=16)
    assert isinstance(define_model(opt), MaxNet)
    opt = Options(mode="path", path_dim=16)
    from multimodal_learning_tpu.models.resnet import ResNet
    assert isinstance(define_model(opt), ResNet)
    opt = Options(mode="pathomic")
    assert isinstance(define_model(opt), PathomicModel)
    assert isinstance(define_model(opt, path_only=True), ResNet)
    assert isinstance(define_model(opt, omic_only=True), MaxNet)


def test_stem_conv_space_to_depth_equals_direct():
    """_StemConv's s2d re-tiling must match the direct 7x7/s2 conv
    bit-for-tolerance, including the odd-size fallback path."""
    import numpy as np
    from jax import lax
    from multimodal_learning_tpu.models.resnet import _StemConv

    rng = np.random.default_rng(0)
    for h in (32, 31):
        x = jnp.asarray(rng.normal(size=(2, h, h, 3)), jnp.float32)
        m = _StemConv(features=8)
        v = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(v, x)
        ref = lax.conv_general_dilated(
            x, v["params"]["kernel"], (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        assert y.shape == ref.shape
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   atol=5e-6)
