"""OrthLoss / SupConLoss parity against the reference's OWN torch modules
(``MIA 2022/CL_utils/orthogonal_loss.py``, ``supcon_loss.py``).

``pred_KD_loss`` / ``SP_loss`` parity is covered by the reference-driven
teacher-step test in ``test_reference_parity.py``; the CRD criteria in
``test_reference_parity_crd.py``; the distiller zoo in
``test_reference_parity_zoo.py``.
"""
import importlib.util
import sys

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from multimodal_learning_tpu.losses.orth import orth_loss  # noqa: E402
from multimodal_learning_tpu.losses.supcon import supcon_loss  # noqa: E402

pytestmark = pytest.mark.smoke

MIA22 = "/root/reference/MIA 2022"


def _load(path, name):
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture
def rng():
    return np.random.default_rng(3)


def test_orth_loss(rng):
    m = _load(f"{MIA22}/CL_utils/orthogonal_loss.py", "ref_orth")
    f1 = rng.normal(size=(6, 12)).astype(np.float32)
    f2 = rng.normal(size=(6, 12)).astype(np.float32)
    ref = m.OrthLoss()(torch.from_numpy(f1), torch.from_numpy(f2))
    ours = orth_loss(jnp.asarray(f1), jnp.asarray(f2))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


@pytest.mark.parametrize("mode", ["all", "one"])
@pytest.mark.parametrize("labelled", [True, False])
def test_supcon_loss(rng, mode, labelled):
    m = _load(f"{MIA22}/CL_utils/supcon_loss.py", "ref_supcon")
    b, v, d = 6, 2, 8
    f = rng.normal(size=(b, v, d)).astype(np.float32)
    f = f / np.linalg.norm(f, axis=2, keepdims=True)
    labels = rng.integers(0, 3, size=b).astype(np.int64)
    crit = m.SupConLoss(temperature=0.1, contrast_mode=mode,
                        base_temperature=0.07)
    ref = crit(torch.from_numpy(f),
               torch.from_numpy(labels) if labelled else None)
    ours = supcon_loss(jnp.asarray(f),
                       jnp.asarray(labels) if labelled else None,
                       temperature=0.1, base_temperature=0.07,
                       contrast_mode=mode)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_pred_kd_and_sp_loss(rng):
    """Direct parity for ``pred_KD_loss`` (surv MSE + grad KL, batch and
    per-sample) and ``SP_loss`` (``MICCAI-2022/CL_utils/KD_losses.py``) —
    the teacher-step test exercises them only in composition."""
    import types as _types

    from multimodal_learning_tpu.losses.kd import pred_kd_loss, sp_loss
    m = _load("/root/reference/MICCAI-2022/CL_utils/KD_losses.py",
              "ref_kd_losses")

    b, c = 6, 3
    logp = np.log(np.random.default_rng(1).dirichlet(np.ones(c), b)
                  ).astype(np.float32)
    logp_t = np.log(np.random.default_rng(2).dirichlet(np.ones(c), b)
                    ).astype(np.float32)

    o = _types.SimpleNamespace(task="grad")
    ref = m.pred_KD_loss(o, torch.from_numpy(logp), torch.from_numpy(logp_t))
    ours = pred_kd_loss(jnp.asarray(logp), jnp.asarray(logp_t), task="grad")
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)

    ref_ps = m.pred_KD_loss(o, torch.from_numpy(logp),
                            torch.from_numpy(logp_t), sample_KD="True")
    ours_ps = pred_kd_loss(jnp.asarray(logp), jnp.asarray(logp_t),
                           task="grad", per_sample=True)
    np.testing.assert_allclose(np.asarray(ours_ps), ref_ps.numpy(),
                               rtol=1e-5)

    h_s = rng.normal(size=(b, 1)).astype(np.float32)
    h_t = rng.normal(size=(b, 1)).astype(np.float32)
    o_surv = _types.SimpleNamespace(task="surv")
    ref_s = m.pred_KD_loss(o_surv, torch.from_numpy(h_s),
                           torch.from_numpy(h_t))
    ours_s = pred_kd_loss(jnp.asarray(h_s), jnp.asarray(h_t), task="surv")
    np.testing.assert_allclose(float(ours_s), float(ref_s), rtol=1e-5)

    f_s = rng.normal(size=(b, 10)).astype(np.float32)
    f_t = rng.normal(size=(b, 10)).astype(np.float32)
    ref_sp = m.SP_loss(torch.from_numpy(f_s), torch.from_numpy(f_t))
    ours_sp = sp_loss(jnp.asarray(f_s), jnp.asarray(f_t))
    np.testing.assert_allclose(float(ours_sp), float(ref_sp), rtol=1e-5)
