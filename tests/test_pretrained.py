"""--pretrained_path wiring: torch .pth -> cli/convert_torch .npz -> model
init consumes the trunk weights (reference fine-tunes from torchvision
ImageNet weights, ``MICCAI-2022/resnets.py:275-284``)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_learning_tpu.config import Options
from multimodal_learning_tpu.models.factory import define_model
from multimodal_learning_tpu.models.import_torch import (
    convert_resnet18, load_pretrained_npz, merge_pretrained,
    save_pretrained_npz)
from multimodal_learning_tpu.train.optim import make_optimizer
from multimodal_learning_tpu.train.schedules import make_lr_schedule
from multimodal_learning_tpu.train.steps import init_teacher_state
from multimodal_learning_tpu.train.student import init_student_state

from test_torch_import import TorchResNet18


@pytest.fixture(scope="module")
def npz_path(tmp_path_factory):
    """Torchvision-style .pth (trunk only, custom heads absent) converted
    through the CLI entry point."""
    import torch
    tmp = tmp_path_factory.mktemp("pretrained")
    tm = TorchResNet18(path_dim=32, num_classes=3)
    sd = {k: v for k, v in tm.state_dict().items()
          if not k.startswith("fc_new")}
    sd["fc.weight"] = torch.zeros(1000, 512)  # torchvision head, ignored
    sd["fc.bias"] = torch.zeros(1000)
    src = str(tmp / "resnet18.pth")
    dst = str(tmp / "resnet18.npz")
    torch.save(sd, src)
    from multimodal_learning_tpu.cli.convert_torch import main
    assert main(["--src", src, "--dst", dst]) == 0
    return dst


def _opt(**kw):
    base = dict(mode="pathomic", task="grad", path_dim=16, omic_dim=16,
                mmhid=16, feat_dim=8, input_size_path=32, batch_size=4,
                CRD_distill=0, pred_distill=0, reg_type="none")
    base.update(kw)
    return Options(**base)


def test_teacher_init_consumes_pretrained(npz_path):
    opt = _opt(pretrained_path=npz_path)
    model = define_model(opt)
    tx = make_optimizer(opt, make_lr_schedule(opt, 4))
    sample = {"x_path": jnp.zeros((1, 32, 32, 3)),
              "x_omic": jnp.zeros((1, 80))}
    state = init_teacher_state(opt, model, tx, jax.random.PRNGKey(0), 16,
                               sample)
    src_params, src_stats = load_pretrained_npz(npz_path)
    got = state.params["model"]["path_net"]
    np.testing.assert_array_equal(np.asarray(got["conv1"]["kernel"]),
                                  src_params["conv1"]["kernel"])
    np.testing.assert_array_equal(
        np.asarray(got["layer4_1"]["conv2"]["kernel"]),
        src_params["layer4_1"]["conv2"]["kernel"])
    np.testing.assert_array_equal(
        np.asarray(state.batch_stats["path_net"]["bn1"]["mean"]),
        src_stats["bn1"]["mean"])
    # heads were absent in the file -> stay randomly initialised
    rand = init_teacher_state(_opt(), model, tx, jax.random.PRNGKey(0), 16,
                              sample)
    np.testing.assert_array_equal(
        np.asarray(got["fc_new1"]["kernel"]),
        np.asarray(rand.params["model"]["path_net"]["fc_new1"]["kernel"]))
    # EMA starts from the pretrained weights too
    np.testing.assert_array_equal(
        np.asarray(state.ema_params["path_net"]["conv1"]["kernel"]),
        src_params["conv1"]["kernel"])


def test_student_init_consumes_pretrained(npz_path):
    opt = _opt(pretrained_path=npz_path, distill="kd")
    model = define_model(opt, path_only=True)
    tx = make_optimizer(opt, make_lr_schedule(opt, 4))
    state = init_student_state(opt, model, tx, jax.random.PRNGKey(0), 16, 32)
    src_params, _ = load_pretrained_npz(npz_path)
    np.testing.assert_array_equal(
        np.asarray(state.params["model"]["conv1"]["kernel"]),
        src_params["conv1"]["kernel"])


def test_bad_pretrained_path_fails_fast(tmp_path):
    bogus = str(tmp_path / "bogus.npz")
    save_pretrained_npz(bogus, {"nonexistent": {"kernel": np.zeros((2, 2))}},
                        {})
    opt = _opt(mode="path", pretrained_path=bogus)
    model = define_model(opt)
    tx = make_optimizer(opt, make_lr_schedule(opt, 4))
    with pytest.raises(ValueError, match="no parameter matched"):
        init_teacher_state(opt, model, tx, jax.random.PRNGKey(0), 16,
                           {"x_path": jnp.zeros((1, 32, 32, 3))})


def test_merge_respects_shape_mismatch():
    tgt = {"a": {"kernel": np.zeros((3, 3))}, "b": np.ones(4)}
    src = {"a": {"kernel": np.full((2, 2), 7.0)}, "b": np.full(4, 7.0)}
    merged, n = merge_pretrained(tgt, src)
    assert n == 1
    np.testing.assert_array_equal(merged["a"]["kernel"], np.zeros((3, 3)))
    np.testing.assert_array_equal(merged["b"], np.full(4, 7.0))
