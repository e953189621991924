"""S1 superpixel attention masking parity against the reference's OWN code.

Runs the reference's ``superpixel_attention_mask``
(``MIA 2023/stage1_multi_modal_teacher/train_test_MT_SP_Masking.py:42-102``)
on the reference's own PathomicNet, and our on-device
:func:`masking.superpixel.superpixel_attention_mask` on the converted flax
model with identical weights/inputs — the input-gradient saliency, the
per-superpixel aggregation, and both top-K masks must agree.
"""
import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from test_reference_parity import (  # noqa: E402
    _build_reference_pathomic, _pathomic_opt)
from test_reference_parity import ref as ref_fixture  # noqa: E402,F401
from test_reference_parity_aekd import MICCAI, _load_driver  # noqa: E402

from multimodal_learning_tpu.masking.superpixel import (  # noqa: E402
    superpixel_attention_mask)

S1 = "/root/reference/MIA 2023/stage1_multi_modal_teacher"


@pytest.fixture(autouse=True)
def _no_cuda(monkeypatch):
    # the ref function hardcodes torch.zeros(...).cuda() (:93)
    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self, raising=True)
    monkeypatch.setattr(torch.nn.Module, "cuda",
                        lambda self, *a, **k: self, raising=True)


@pytest.fixture(scope="module")
def ref_s1():
    """Load the S1 driver.  Its ``from networks_new import
    define_decoder_net`` needs S1's fork of networks_new (MICCAI's, already
    cached by other parity tests, lacks the decoder factory); bind S1's
    temporarily — the function under test takes the model as an argument and
    never touches those imports."""
    import importlib.util
    import sys
    saved = sys.modules.pop("networks_new", None)
    try:
        spec = importlib.util.spec_from_file_location(
            "networks_new", f"{S1}/networks_new.py")
        nn_mod = importlib.util.module_from_spec(spec)
        sys.modules["networks_new"] = nn_mod
        spec.loader.exec_module(nn_mod)
        return _load_driver(f"{S1}/train_test_MT_SP_Masking.py",
                            "ref_sp_masking", [MICCAI])
    finally:
        if saved is not None:
            sys.modules["networks_new"] = saved
        else:
            sys.modules.pop("networks_new", None)


def test_superpixel_attention_mask(ref_fixture, ref_s1):
    from multimodal_learning_tpu.models.factory import define_model
    from multimodal_learning_tpu.models.import_torch import convert_pathomic

    rng = np.random.default_rng(23)
    opt = _pathomic_opt()
    tm = _build_reference_pathomic(ref_fixture, opt)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params, stats = convert_pathomic(sd)
    model = define_model(opt)

    B, H, N = 2, 32, 8
    path_k, omic_k = 2, 5
    x = rng.normal(0, 1, (B, H, H, 3)).astype(np.float32)
    om = rng.normal(size=(B, 80)).astype(np.float32)
    grade = rng.integers(0, 3, size=B).astype(np.int64)
    sp = rng.integers(0, N, size=(B, H, H)).astype(np.int64)
    sp[:, 0, :N] = np.arange(N)  # every id present: F.one_hot infers max+1

    o = type("O", (), {"Path_K": path_k, "Omic_K": omic_k})()
    opt_t = torch.optim.SGD(tm.parameters(), lr=0.1)
    ref_pmask, ref_omask = ref_s1.superpixel_attention_mask(
        o, opt_t, tm, torch.from_numpy(x.transpose(0, 3, 1, 2)),
        torch.zeros(1), torch.from_numpy(om), torch.from_numpy(sp),
        torch.from_numpy(grade), torch.device("cpu"))

    gj = jnp.asarray(grade)

    def cost_fn(xp, xo):
        out = model.apply({"params": params, "batch_stats": stats},
                          x_path=xp, x_omic=xo, train=False)
        return -jnp.mean(jnp.take_along_axis(out.pred_fuse, gj[:, None],
                                             axis=1))

    ours_pmask, ours_omask = superpixel_attention_mask(
        cost_fn, jnp.asarray(x), jnp.asarray(om), jnp.asarray(sp),
        num_superpixels=N, path_k=path_k, omic_k=omic_k)

    np.testing.assert_array_equal(np.asarray(ours_pmask),
                                  ref_pmask.numpy())
    np.testing.assert_array_equal(np.asarray(ours_omask),
                                  ref_omask.numpy())
