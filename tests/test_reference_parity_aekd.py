"""Gradient-guided teacher weighting parity against the reference's OWN code.

The reference computes AEKD / GK-Refine weights by backpropagating each loss
separately and reading the gradient at the student feature through a hook
(``MICCAI-2022/train_test_path_multi_distill.py:41-141``,
``MIA 2022/train_test_path_multi_distill_v2.py:50-132``,
``MIA 2023/stage2_unimodal_student/train_test_path_multi_distill.py:81-128``).
Here those driver modules are imported and their actual functions are fed
CONTROLLED gradients — each loss is ``dot(V_i, feat_s)`` so its feature
gradient is exactly ``V_i`` — and the returned scales/totals are compared
against :mod:`multimodal_learning_tpu.gradweight.aekd` on the same vectors.

The drivers' import surface needs lifelines/imblearn/torch_geometric/
torchvision/dgl, none of which are in this env (and none of which the tested
functions touch); ``_install_stubs`` shims exactly those names.
"""
import importlib.util
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from multimodal_learning_tpu.gradweight.aekd import (  # noqa: E402
    aekd_scale, aekd_total, aekd_v2_gate, gk_refine_param_space,
    gk_refine_thresh_weights, momentum_aekd_scale)

MICCAI = "/root/reference/MICCAI-2022"
MIA22 = "/root/reference/MIA 2022"
S2 = "/root/reference/MIA 2023/stage2_unimodal_student"


def _install_stubs():
    import scipy
    if not hasattr(scipy, "interp"):
        scipy.interp = np.interp

    def mod(name, **attrs):
        if name in sys.modules:
            return sys.modules[name]
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        return m

    dummy = lambda *a, **k: None
    lifelines = mod("lifelines", CoxPHFitter=object)
    lifelines.utils = mod("lifelines.utils", concordance_index=dummy,
                          k_fold_cross_validation=dummy)
    lifelines.datasets = mod("lifelines.datasets",
                             load_regression_dataset=dummy)
    lifelines.statistics = mod("lifelines.statistics", logrank_test=dummy)
    imblearn = mod("imblearn")
    imblearn.over_sampling = mod("imblearn.over_sampling",
                                 RandomOverSampler=object)
    tg = mod("torch_geometric")
    tg.data = mod("torch_geometric.data", Batch=object)
    tv = mod("torchvision")
    tv.datasets = mod("torchvision.datasets")
    tv.transforms = mod("torchvision.transforms")
    dgl = mod("dgl", DGLGraph=object)
    dgl.nn = mod("dgl.nn")
    dgl.nn.pytorch = mod("dgl.nn.pytorch", TAGConv=object)
    dgl.nn.pytorch.factory = mod("dgl.nn.pytorch.factory", KNNGraph=object)
    mod("dgl.backend")
    mod("dgl.function")


def _load_driver(path, name, extra_path):
    if name in sys.modules:
        return sys.modules[name]
    _install_stubs()
    # The forks all ship a top-level ``KD_loss`` module but only S2's defines
    # SP_loss; pin S2's (a superset) as THE ``KD_loss`` so every driver's
    # import resolves — none of the functions under test touch it.
    if "KD_loss" not in sys.modules:
        spec = importlib.util.spec_from_file_location(
            "KD_loss", f"{S2}/KD_loss.py")
        kd = importlib.util.module_from_spec(spec)
        sys.modules["KD_loss"] = kd
        spec.loader.exec_module(kd)
    for p in extra_path:
        if p not in sys.path:
            sys.path.append(p)
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(autouse=True)
def _no_cuda(monkeypatch):
    """GK_refine calls .cuda() unguarded (``..._v2.py:84``); shim to
    identity on CPU."""
    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self, raising=True)
    monkeypatch.setattr(torch.nn.Module, "cuda",
                        lambda self, *a, **k: self, raising=True)


@pytest.fixture(scope="module")
def ref_miccai():
    return _load_driver(f"{MICCAI}/train_test_path_multi_distill.py",
                        "ref_distill_miccai", [MICCAI])


@pytest.fixture(scope="module")
def ref_mia22():
    return _load_driver(f"{MIA22}/train_test_path_multi_distill_v2.py",
                        "ref_distill_mia22", [MICCAI, MIA22])


@pytest.fixture(scope="module")
def ref_s2():
    return _load_driver(f"{S2}/train_test_path_multi_distill.py",
                        "ref_distill_s2", [MICCAI, MIA22, S2])


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def _controlled(rng, n_kd, b, d):
    """feat_s whose per-loss gradients are exactly the rows of V (+ CE)."""
    V = rng.normal(size=(n_kd, b, d)).astype(np.float32)
    C = rng.normal(size=(b, d)).astype(np.float32)
    feat = torch.zeros(b, d, requires_grad=True)
    feat_s = feat * 1.0
    opt_t = torch.optim.SGD([feat], lr=0.1)
    kd = [(torch.from_numpy(V[i]) * feat_s).sum() for i in range(n_kd)]
    main = (torch.from_numpy(C) * feat_s).sum()
    return V, C, feat_s, opt_t, kd, main


def test_aekd_loss(ref_miccai, rng):
    """``AEKD_loss`` (:41-70): cosine Gram x n_kd, row sums, CE row kept in
    the Gram but its weight dropped from the total."""
    n_kd, b, d = 3, 4, 6
    V, C, feat_s, opt_t, kd, main = _controlled(rng, n_kd, b, d)
    o = types.SimpleNamespace(CE_grads=True)
    ref_scale, ref_total = ref_miccai.AEKD_loss(o, opt_t, main, feat_s, kd)

    grads = [jnp.asarray(V[i]) for i in range(n_kd)] + [jnp.asarray(C)]
    ours_scale = aekd_scale(grads, n_kd)
    kd_vals = [jnp.asarray(float(l.detach())) for l in kd]
    ours_total = aekd_total(ours_scale, kd_vals)
    np.testing.assert_allclose(np.asarray(ours_scale),
                               ref_scale.detach().numpy(), rtol=1e-5)
    np.testing.assert_allclose(float(ours_total), float(ref_total),
                               rtol=1e-5)


def test_aekd_loss_v2_batch(ref_miccai, rng):
    """``AEKD_loss_v2`` batch gate (:74-141, sample_KD='False'): keep a KD
    loss iff cos(KD grad, CE grad) > 0."""
    n_kd, b, d = 3, 4, 6
    V, C, feat_s, opt_t, kd, main = _controlled(rng, n_kd, b, d)
    o = types.SimpleNamespace(CE_grads=True, sample_KD="False", batch_size=b)
    ref_total = ref_miccai.AEKD_loss_v2(o, opt_t, main, feat_s, kd)

    ours_total = aekd_v2_gate(
        [jnp.asarray(V[i]) for i in range(n_kd)], jnp.asarray(C),
        [jnp.asarray(float(l.detach())) for l in kd])
    np.testing.assert_allclose(float(ours_total), float(ref_total),
                               rtol=1e-5)


def test_aekd_loss_v2_per_sample(ref_miccai, rng):
    """``AEKD_loss_v2`` per-sample gate (sample_KD='True'): [B, n_kd] gate
    from per-sample grad cosines, total = sum(gate * losses) / batch."""
    n_kd, b, d = 3, 4, 6
    V = rng.normal(size=(n_kd, b, d)).astype(np.float32)
    C = rng.normal(size=(b, d)).astype(np.float32)
    feat = torch.zeros(b, d, requires_grad=True)
    feat_s = feat * 1.0
    opt_t = torch.optim.SGD([feat], lr=0.1)
    kd = [(torch.from_numpy(V[i]) * feat_s).sum(1) for i in range(n_kd)]
    main = (torch.from_numpy(C) * feat_s).sum()
    o = types.SimpleNamespace(CE_grads=True, sample_KD="True", batch_size=b)
    ref_total = ref_miccai.AEKD_loss_v2(o, opt_t, main, feat_s, kd)

    ours_total = aekd_v2_gate(
        [jnp.asarray(V[i]) for i in range(n_kd)], jnp.asarray(C),
        [jnp.asarray(l.detach().numpy()) for l in kd],
        per_sample=True, batch_size=b)
    np.testing.assert_allclose(float(ours_total), float(ref_total),
                               rtol=1e-5)


def test_momentum_aekd(ref_mia22, rng):
    """MIA-2022 ``momentum_AEKD_loss`` (:89-132): plain cosine Gram
    (optionally thresh-binarised), row sums, EMA across steps."""
    n_kd, b, d = 3, 4, 6
    for use_thresh in (False, True):
        V, C, feat_s, opt_t, kd, main = _controlled(rng, n_kd, b, d)
        o = types.SimpleNamespace(CE_grads=True, grads_m=0.7, thresh=0.1,
                                  grads_thresh="True" if use_thresh
                                  else "False")
        # seed step (mo_scale=None -> raw scale)
        s1, _ = ref_mia22.momentum_AEKD_loss(o, opt_t, main, feat_s, kd,
                                             None)
        grads = [jnp.asarray(V[i]) for i in range(n_kd)] + [jnp.asarray(C)]
        ours1, _ = momentum_aekd_scale(grads, jnp.zeros(n_kd + 1),
                                       0.0, 0.1, use_thresh)
        np.testing.assert_allclose(np.asarray(ours1), s1.detach().numpy(),
                                   rtol=1e-5)
        # EMA step on fresh gradients
        V2, C2, feat_s2, opt_t2, kd2, main2 = _controlled(rng, n_kd, b, d)
        s2, ref_total = ref_mia22.momentum_AEKD_loss(
            o, opt_t2, main2, feat_s2, kd2, s1)
        grads2 = [jnp.asarray(V2[i]) for i in range(n_kd)] + [jnp.asarray(C2)]
        ours2, _ = momentum_aekd_scale(grads2, ours1, 0.7, 0.1, use_thresh)
        np.testing.assert_allclose(np.asarray(ours2), s2.detach().numpy(),
                                   rtol=1e-5)
        ours_total = jnp.dot(ours2[:n_kd], jnp.stack(
            [jnp.asarray(float(l.detach())) for l in kd2]))
        np.testing.assert_allclose(float(ours_total), float(ref_total),
                                   rtol=1e-5)


def test_gk_refine_param_space(ref_mia22, rng):
    """MIA-2022 parameter-space ``GK_refine`` (:50-86): per-loss gradients
    over all student params except fc_new2, cosine-Gram row sums.  Same tiny
    two-layer model on both sides (weights copied), three quadratic losses;
    the Gram is permutation-invariant so torch/flax flattening order drops
    out."""
    d_in, d_h, d_out = 5, 4, 3

    class Tiny(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.fc1 = torch.nn.Linear(d_in, d_h)
            self.fc_new2 = torch.nn.Linear(d_h, d_out)

        def forward(self, x):
            return self.fc_new2(torch.relu(self.fc1(x)))

    tm = Tiny()
    x = rng.normal(size=(6, d_in)).astype(np.float32)
    tgt = rng.normal(size=(6, d_out)).astype(np.float32)
    xt = torch.from_numpy(x)
    out = tm(xt)
    h = torch.relu(tm.fc1(xt))
    losses = [((out - torch.from_numpy(tgt)) ** 2).mean(),
              (h ** 2).mean()]
    main = out.abs().mean()
    opt_t = torch.optim.SGD(tm.parameters(), lr=0.1)
    ref_scale, ref_total = ref_mia22.GK_refine(
        opt_t, main, list(losses), tm)

    import jax
    params = {
        "fc1": {"kernel": jnp.asarray(tm.fc1.weight.detach().numpy().T),
                "bias": jnp.asarray(tm.fc1.bias.detach().numpy())},
        "fc_new2": {"kernel":
                    jnp.asarray(tm.fc_new2.weight.detach().numpy().T),
                    "bias": jnp.asarray(tm.fc_new2.bias.detach().numpy())},
    }

    def fwd(p, xx):
        hh = jax.nn.relu(xx @ p["fc1"]["kernel"] + p["fc1"]["bias"])
        return hh, hh @ p["fc_new2"]["kernel"] + p["fc_new2"]["bias"]

    xj = jnp.asarray(x)
    tj = jnp.asarray(tgt)
    loss_fns = [lambda p: jnp.mean((fwd(p, xj)[1] - tj) ** 2),
                lambda p: jnp.mean(fwd(p, xj)[0] ** 2),
                lambda p: jnp.mean(jnp.abs(fwd(p, xj)[1]))]
    ours_scale = gk_refine_param_space(loss_fns, params)
    np.testing.assert_allclose(np.asarray(ours_scale),
                               ref_scale.detach().numpy(), rtol=1e-4)
    kd_vals = jnp.asarray([float(l.detach()) for l in losses])
    ours_total = jnp.dot(ours_scale[:2], kd_vals)
    np.testing.assert_allclose(float(ours_total), float(ref_total),
                               rtol=1e-4)


def test_gk_refine_thresh(ref_s2, rng):
    """S2 per-sample ``GK_refine_thresh`` (:81-128): per-sample cosine matrix
    over all loss gradients, thresh-binarised (or ReLU) column sums; total
    drops the CE column."""
    n_kd, b, d = 3, 4, 6
    for use_thresh in ("True", "False"):
        V = rng.normal(size=(n_kd, b, d)).astype(np.float32)
        C = rng.normal(size=(b, d)).astype(np.float32)
        feat = torch.zeros(b, d, requires_grad=True)
        feat_s = feat * 1.0
        opt_t = torch.optim.SGD([feat], lr=0.1)
        kd = [(torch.from_numpy(V[i]) * feat_s).sum(1) for i in range(n_kd)]
        main = (torch.from_numpy(C) * feat_s).sum()
        o = types.SimpleNamespace(CE_grads=True, batch_size=b,
                                  grads_thresh=0.1,
                                  use_grads_thresh=use_thresh)
        ref_scale, ref_total = ref_s2.GK_refine_thresh(
            o, opt_t, main, feat_s, kd)

        all_grads = ([jnp.asarray(V[i]) for i in range(n_kd)]
                     + [jnp.asarray(C)])
        ours_w = gk_refine_thresh_weights(all_grads, 0.1,
                                          use_thresh=(use_thresh == "True"))
        np.testing.assert_allclose(np.asarray(ours_w.mean(0)),
                                   ref_scale.detach().numpy(), rtol=1e-5)
        losses = jnp.stack([jnp.asarray(l.detach().numpy()) for l in kd],
                           axis=1)                            # [B, n_kd]
        ours_total = jnp.sum(ours_w[:, :n_kd] * losses) / b
        np.testing.assert_allclose(float(ours_total), float(ref_total),
                                   rtol=1e-5)
