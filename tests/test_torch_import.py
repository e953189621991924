"""Golden forward-parity: torch reference architectures -> converted flax.

Builds torch modules with the reference's structure/naming (independent
implementations), converts their weights with ``models/import_torch`` and
checks the flax forward matches torch eval-mode outputs — the BASELINE
"checkpoint-for-checkpoint forward parity" requirement.
"""
import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from multimodal_learning_tpu.models import BilinearFusion, MaxNet, ResNet18
from multimodal_learning_tpu.models.import_torch import (
    convert_bilinear_fusion, convert_maxnet, convert_resnet18)


def _torch_block(cin, cout, stride=1):
    class Block(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(cout)
            self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(cout)
            if stride != 1 or cin != cout:
                self.downsample = tnn.Sequential(
                    tnn.Conv2d(cin, cout, 1, stride, bias=False),
                    tnn.BatchNorm2d(cout))
            else:
                self.downsample = None

        def forward(self, x):
            idt = self.downsample(x) if self.downsample else x
            y = torch.relu(self.bn1(self.conv1(x)))
            y = self.bn2(self.conv2(y))
            return torch.relu(y + idt)

    return Block()


class TorchResNet18(tnn.Module):
    """Reference-named ResNet18 + pathomic heads (resnets.py:126-267)."""

    def __init__(self, path_dim=32, num_classes=3):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        cin = 64
        for i, cout in enumerate((64, 128, 256, 512)):
            blocks = [_torch_block(cin, cout, 1 if i == 0 else 2),
                      _torch_block(cout, cout)]
            setattr(self, f"layer{i + 1}", tnn.Sequential(*blocks))
            cin = cout
        self.fc_new1 = tnn.Sequential(tnn.Linear(512, path_dim),
                                      tnn.BatchNorm1d(path_dim),
                                      tnn.ReLU())
        self.fc_new2 = tnn.Linear(path_dim, num_classes)

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        x = self.maxpool(x)
        x = self.layer1(x)
        x = self.layer2(x)
        f3 = self.layer3(x)
        x = self.layer4(f3)
        feat_f3 = f3.mean((2, 3))
        feat = self.fc_new1(x.mean((2, 3)))
        return feat_f3, feat, self.fc_new2(feat)


def test_resnet18_forward_parity(rng):
    tm = TorchResNet18(path_dim=32, num_classes=3).eval()
    # non-trivial BN running stats
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, (tnn.BatchNorm2d, tnn.BatchNorm1d)):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.uniform_(0.8, 1.2)
                m.bias.uniform_(-0.1, 0.1)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params, stats = convert_resnet18(sd)

    x = rng.normal(0, 1, (2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        t_f3, t_feat, t_hz = tm(torch.tensor(x.transpose(0, 3, 1, 2)))

    model = ResNet18(path_dim=32, num_classes=3)
    f3, feat, hz, pred = model.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x),
        train=False)
    np.testing.assert_allclose(np.asarray(f3), t_f3.numpy(), rtol=1e-3,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(feat), t_feat.numpy(), rtol=1e-3,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(hz), t_hz.numpy(), rtol=1e-3,
                               atol=3e-4)


def test_maxnet_forward_parity(rng):
    class TorchMaxNet(tnn.Module):
        def __init__(self):
            super().__init__()
            enc = []
            dims = [(80, 64), (64, 48), (48, 32), (32, 16)]
            for i, (a, b) in enumerate(dims):
                enc.append(tnn.Sequential(tnn.Linear(a, b), tnn.ELU(),
                                          tnn.AlphaDropout(0.25)))
            self.encoder = tnn.Sequential(*enc)
            self.classifier = tnn.Sequential(tnn.Linear(16, 3))

        def forward(self, x):
            f = torch.relu(self.encoder(x))
            return f, self.classifier(f)

    tm = TorchMaxNet().eval()
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params = convert_maxnet(sd)
    x = rng.normal(size=(4, 80)).astype(np.float32)
    with torch.no_grad():
        t_feat, t_hz = tm(torch.tensor(x))
    model = MaxNet(omic_dim=16, label_dim=3, act_type="LSM")
    feat, hz, pred = model.apply({"params": params}, jnp.asarray(x),
                                 train=False)
    np.testing.assert_allclose(np.asarray(feat), t_feat.numpy(), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(hz), t_hz.numpy(), rtol=1e-4,
                               atol=1e-5)


def test_bilinear_fusion_forward_parity(rng):
    d, mm = 8, 12

    class TorchBF(tnn.Module):
        """fusion.py:6-63 with skip=1."""

        def __init__(self):
            super().__init__()
            self.linear_h1 = tnn.Sequential(tnn.Linear(d, d), tnn.ReLU())
            self.linear_z1 = tnn.Bilinear(d, d, d)
            self.linear_o1 = tnn.Sequential(tnn.Linear(d, d), tnn.ReLU(),
                                            tnn.Dropout(0.25))
            self.linear_h2 = tnn.Sequential(tnn.Linear(d, d), tnn.ReLU())
            self.linear_z2 = tnn.Bilinear(d, d, d)
            self.linear_o2 = tnn.Sequential(tnn.Linear(d, d), tnn.ReLU(),
                                            tnn.Dropout(0.25))
            self.encoder1 = tnn.Sequential(tnn.Linear((d + 1) ** 2, mm),
                                           tnn.BatchNorm1d(mm), tnn.ReLU(),
                                           tnn.Dropout(0.25))
            self.encoder2 = tnn.Sequential(tnn.Linear(mm + 2 * d + 2, mm),
                                           tnn.BatchNorm1d(mm), tnn.ReLU(),
                                           tnn.Dropout(0.25))

        def forward(self, v1, v2):
            v1, v2 = torch.relu(v1), torch.relu(v2)
            h1 = self.linear_h1(v1)
            o1 = self.linear_o1(torch.sigmoid(self.linear_z1(v1, v2)) * h1)
            h2 = self.linear_h2(v2)
            o2 = self.linear_o2(torch.sigmoid(self.linear_z2(v1, v2)) * h2)
            ones = torch.ones(o1.shape[0], 1)
            o1 = torch.cat([o1, ones], 1)
            o2 = torch.cat([o2, ones], 1)
            o12 = torch.bmm(o1.unsqueeze(2), o2.unsqueeze(1)).flatten(1)
            out = self.encoder1(o12)
            out = torch.cat([out, o1, o2], 1)
            return self.encoder2(out)

    tm = TorchBF().eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, tnn.BatchNorm1d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params, stats = convert_bilinear_fusion(sd)
    v1 = rng.normal(size=(4, d)).astype(np.float32)
    v2 = rng.normal(size=(4, d)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(v1), torch.tensor(v2)).numpy()
    model = BilinearFusion(dim1=d, dim2=d, mmhid=mm, skip=1)
    out = model.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(v1), jnp.asarray(v2), train=False)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-5)


def test_full_pathomic_checkpoint_import(rng):
    """Full PathomicNet state_dict (path_net/omic_net/fusion/classifier)
    -> PathomicModel, fused logits parity."""
    from multimodal_learning_tpu.models import PathomicModel
    from multimodal_learning_tpu.models.import_torch import convert_pathomic

    d, mm = 8, 12

    class TorchMaxNet(tnn.Module):
        def __init__(self):
            super().__init__()
            enc = []
            for a, b in [(80, 64), (64, 48), (48, 32), (32, d)]:
                enc.append(tnn.Sequential(tnn.Linear(a, b), tnn.ELU(),
                                          tnn.AlphaDropout(0.25)))
            self.encoder = tnn.Sequential(*enc)
            self.classifier = tnn.Sequential(tnn.Linear(d, 3))

        def forward(self, x):
            f = torch.relu(self.encoder(x))
            return f, self.classifier(f)

    class TorchBF(tnn.Module):
        def __init__(self):
            super().__init__()
            self.linear_h1 = tnn.Sequential(tnn.Linear(d, d), tnn.ReLU())
            self.linear_z1 = tnn.Bilinear(d, d, d)
            self.linear_o1 = tnn.Sequential(tnn.Linear(d, d), tnn.ReLU(),
                                            tnn.Dropout(0.25))
            self.linear_h2 = tnn.Sequential(tnn.Linear(d, d), tnn.ReLU())
            self.linear_z2 = tnn.Bilinear(d, d, d)
            self.linear_o2 = tnn.Sequential(tnn.Linear(d, d), tnn.ReLU(),
                                            tnn.Dropout(0.25))
            self.encoder1 = tnn.Sequential(tnn.Linear((d + 1) ** 2, mm),
                                           tnn.BatchNorm1d(mm), tnn.ReLU(),
                                           tnn.Dropout(0.25))
            self.encoder2 = tnn.Sequential(tnn.Linear(mm + 2 * d + 2, mm),
                                           tnn.BatchNorm1d(mm), tnn.ReLU(),
                                           tnn.Dropout(0.25))

        def forward(self, v1, v2):
            v1, v2 = torch.relu(v1), torch.relu(v2)
            h1 = self.linear_h1(v1)
            o1 = self.linear_o1(torch.sigmoid(self.linear_z1(v1, v2)) * h1)
            h2 = self.linear_h2(v2)
            o2 = self.linear_o2(torch.sigmoid(self.linear_z2(v1, v2)) * h2)
            ones = torch.ones(o1.shape[0], 1)
            o1 = torch.cat([o1, ones], 1)
            o2 = torch.cat([o2, ones], 1)
            o12 = torch.bmm(o1.unsqueeze(2), o2.unsqueeze(1)).flatten(1)
            out = self.encoder1(o12)
            return self.encoder2(torch.cat([out, o1, o2], 1))

    class TorchPathomic(tnn.Module):
        def __init__(self):
            super().__init__()
            self.path_net = TorchResNet18(path_dim=d, num_classes=3)
            self.omic_net = TorchMaxNet()
            self.fusion = TorchBF()
            self.classifier = tnn.Sequential(tnn.Linear(mm, 3))

        def forward(self, img, om):
            _, pf, _ = self.path_net(img)
            of, _ = self.omic_net(om)
            return self.classifier(self.fusion(pf, of))

    tm = TorchPathomic().eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, (tnn.BatchNorm2d, tnn.BatchNorm1d)):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params, stats = convert_pathomic(sd)

    x = rng.normal(0, 1, (2, 64, 64, 3)).astype(np.float32)
    om = rng.normal(size=(2, 80)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x.transpose(0, 3, 1, 2)),
                 torch.tensor(om)).numpy()

    model = PathomicModel(path_dim=d, omic_dim=d, mmhid=mm, label_dim=3,
                          skip=1)
    out = model.apply({"params": params, "batch_stats": stats},
                      x_path=jnp.asarray(x), x_omic=jnp.asarray(om),
                      train=False)
    np.testing.assert_allclose(np.asarray(out.hazard_fuse), ref, rtol=2e-3,
                               atol=5e-4)
