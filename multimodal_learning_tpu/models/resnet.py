"""TPU-native ResNet pathology encoder (flax, NHWC).

Capability parity with the reference encoder (``MICCAI-2022/resnets.py``):
torchvision-style ResNet{18,34,50} trunk with the custom grading heads
``fc_new1 = Linear(512*exp -> path_dim) + BN + ReLU`` and
``fc_new2 = Linear(path_dim -> num_classes)`` (``resnets.py:165-169``),
returning ``(feat_f3, features, hazard, pred)`` where ``feat_f3`` is the
global-average-pooled layer-3 map (``resnets.py:234``).

TPU-first design notes (not a translation):
- NHWC layout; convolutions map straight onto the MXU.
- activations run in ``compute_dtype`` (bfloat16 by default in recipes) while
  parameters and BN statistics stay float32.
- BatchNorm over a sharded batch is automatically global under jit-over-Mesh:
  XLA inserts the cross-replica reductions, which supersedes
  ``torch.nn.DataParallel``'s per-replica stats.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from .common import apply_act, kaiming_normal_out, torch_linear_bias, torch_linear_default
from ..ops.paired_conv import PairedConv3x3, PairedStemConv

ModuleDef = Any


class _StemConv(nn.Module):
    """The 7x7/stride-2 stem conv, computed space-to-depth.

    Parameter-identical to ``nn.Conv(64, (7, 7), (2, 2), padding=3)`` —
    kernel ``[7, 7, Cin, 64]`` at the same tree path — but applied as
    space-to-depth(2) on the input + a 4x4/stride-1 conv over 4*Cin
    channels (the MLPerf-TPU stem trick).  A 3-channel 7x7 stride-2 conv
    is the worst-shaped op in the net for the MXU (contraction depth 147
    over misaligned windows) in both the forward and the filter-gradient;
    the re-tiled form contracts 192-deep over aligned stride-1 windows.
    The weight re-tiling (zero-pad to 8x8, regroup 2x2 pixel phases into
    channels) is a few-KB reshape done at apply time, so checkpoints,
    torch import, and EMA trees are unchanged.  Falls back to the direct
    conv for odd spatial dims.

    Measured on the v5e tunnel (bench.py, bf16, 512^2 batch 16): the
    direct 7x7 wins — 717 vs 640 train pps, 2930 vs 2520 eval pps — the
    space-to-depth relayout transposes cost more than the conv saves, so
    ``ResNet.stem_s2d`` defaults to False; kept for other chips/shapes.
    """
    features: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        kernel = self.param("kernel", kaiming_normal_out,
                            (7, 7, c, self.features))
        if h % 2 or w % 2:
            return lax.conv_general_dilated(
                x, kernel.astype(self.dtype), (2, 2), ((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        # y[i,j,o] = sum_{ki,kj,c} x[2i+ki-3, 2j+kj-3, c] w[ki,kj,c,o]
        #          = sum_{a,di}    X[i+a, j+b', (di,dj,c)] W[a,b',(di,dj,c),o]
        # with ki+1 = 2a+di (zero-padded 8x8 kernel) and X the 2x2
        # space-to-depth of x padded by 4.
        w8 = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
        w4 = w8.reshape(4, 2, 4, 2, c, self.features)
        w4 = w4.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * c,
                                                    self.features)
        xp = jnp.pad(x, ((0, 0), (4, 4), (4, 4), (0, 0)))
        hh, wh = (h + 8) // 2, (w + 8) // 2
        xs = xp.reshape(b, hh, 2, wh, 2, c).transpose(0, 1, 3, 2, 4, 5)
        xs = xs.reshape(b, hh, wh, 4 * c)
        y = lax.conv_general_dilated(
            xs, w4.astype(self.dtype), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y[:, :h // 2, :w // 2, :]


class BasicBlock(nn.Module):
    """3x3 + 3x3 residual block (``resnets.py:37-74``)."""
    planes: int
    stride: int = 1
    downsample: bool = False
    norm: ModuleDef = nn.BatchNorm
    dtype: Any = jnp.float32
    paired: bool = False     # lane-paired 3x3 convs at the 64-ch stage
    #                          (ops/paired_conv.py) — exact reformulation

    @nn.compact
    def __call__(self, x):
        conv = partial(nn.Conv, use_bias=False, kernel_init=kaiming_normal_out,
                       dtype=self.dtype)
        # Pairing pays only where Cout underfills the 128 MXU lanes (the
        # 64-channel stage) and needs an even x-extent; both are static.
        pair = self.paired and self.planes == 64 and x.shape[2] % 2 == 0
        identity = x
        if pair and self.stride == 1:
            y = PairedConv3x3(self.planes, dtype=self.dtype, name="conv1")(x)
        else:
            y = conv(self.planes, (3, 3), (self.stride, self.stride),
                     padding=1, name="conv1")(x)
        y = self.norm(name="bn1")(y)
        y = nn.relu(y)
        if pair:
            y = PairedConv3x3(self.planes, dtype=self.dtype, name="conv2")(y)
        else:
            y = conv(self.planes, (3, 3), padding=1, name="conv2")(y)
        y = self.norm(name="bn2")(y)
        if self.downsample:
            identity = conv(self.planes, (1, 1),
                            (self.stride, self.stride), name="ds_conv")(x)
            identity = self.norm(name="ds_bn")(identity)
        return nn.relu(y + identity)


class Bottleneck(nn.Module):
    """1x1 / 3x3 / 1x1 bottleneck, ResNet v1.5 stride placement
    (``resnets.py:77-123``)."""
    planes: int
    stride: int = 1
    downsample: bool = False
    norm: ModuleDef = nn.BatchNorm
    dtype: Any = jnp.float32
    paired: bool = False     # accepted for interface parity; the 3x3 here
    #                          sits mid-bottleneck — not a profiled shape
    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        conv = partial(nn.Conv, use_bias=False, kernel_init=kaiming_normal_out,
                       dtype=self.dtype)
        identity = x
        y = conv(self.planes, (1, 1), name="conv1")(x)
        y = nn.relu(self.norm(name="bn1")(y))
        y = conv(self.planes, (3, 3), (self.stride, self.stride),
                 padding=1, name="conv2")(y)
        y = nn.relu(self.norm(name="bn2")(y))
        y = conv(self.planes * self.expansion, (1, 1), name="conv3")(y)
        y = self.norm(name="bn3")(y)
        if self.downsample:
            identity = conv(self.planes * self.expansion, (1, 1),
                            (self.stride, self.stride), name="ds_conv")(x)
            identity = self.norm(name="ds_bn")(identity)
        return nn.relu(y + identity)


class ResNet(nn.Module):
    """ResNet trunk + pathomic heads.

    ``__call__(x, train)`` with ``x: [B, H, W, 3]`` returns
    ``(feat_f3, features, hazard, pred)``:
      feat_f3  [B, 256*exp]  layer-3 GAP feature (``resnets.py:234``)
      features [B, path_dim] post-``fc_new1`` feature
      hazard   [B, classes]  raw logits
      pred     [B, classes]  activated output (log-probs for grading)
    """
    block: ModuleDef = BasicBlock
    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    path_dim: int = 32
    num_classes: int = 3
    act_type: str = "LSM"
    dtype: Any = jnp.float32
    stem_s2d: bool = False    # measured slower on v5e, see _StemConv
    paired: bool = False      # lane-paired stem + 64-ch stage convs
    #                           (ops/paired_conv.py): exact same math/params
    #                           and 1.5x faster in isolated compute, but the
    #                           un-pairing relayout back to NHWC costs more
    #                           than the MXU gain in situ (measured: stage-1
    #                           0.54 vs 0.34 ms, stem+pool 2.97 vs 1.91 ms,
    #                           tools/conv_lab.py honest_*) — default OFF,
    #                           kept as the documented negative result

    @nn.compact
    def __call__(self, x, train: bool = True) -> Tuple[jnp.ndarray, ...]:
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=self.dtype)
        x = x.astype(self.dtype)
        if self.stem_s2d:
            x = _StemConv(features=64, dtype=self.dtype, name="conv1")(x)
        elif self.paired and x.shape[1] % 2 == 0 and x.shape[2] % 4 == 0:
            x = PairedStemConv(features=64, dtype=self.dtype, name="conv1")(x)
        else:
            x = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False,
                        kernel_init=kaiming_normal_out, dtype=self.dtype,
                        name="conv1")(x)
        x = norm(name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        expansion = getattr(self.block, "expansion", 1) if self.block is Bottleneck else 1
        feat_f3 = None
        for i, n_blocks in enumerate(self.stage_sizes):
            planes = 64 * (2 ** i)
            for j in range(n_blocks):
                stride = 2 if (i > 0 and j == 0) else 1
                in_ch = x.shape[-1]
                out_ch = planes * (4 if self.block is Bottleneck else 1)
                x = self.block(planes=planes, stride=stride,
                               downsample=(stride != 1 or in_ch != out_ch),
                               norm=norm, dtype=self.dtype,
                               paired=self.paired,
                               name=f"layer{i + 1}_{j}")(x)
            if i == 2:  # layer3 GAP feature, resnets.py:234
                feat_f3 = jnp.mean(x, axis=(1, 2))

        x = jnp.mean(x, axis=(1, 2))  # adaptive avg pool to 1x1
        # fc_new1: Linear -> BN1d -> ReLU (resnets.py:165-167)
        features = nn.Dense(self.path_dim, kernel_init=torch_linear_default,
                            bias_init=torch_linear_bias(x.shape[-1]),
                            dtype=self.dtype, name="fc_new1")(x)
        features = norm(name="fc_new1_bn")(features)
        features = nn.relu(features)
        hazard = nn.Dense(self.num_classes, kernel_init=torch_linear_default,
                          bias_init=torch_linear_bias(self.path_dim),
                          dtype=self.dtype, name="fc_new2")(features)
        hazard = hazard.astype(jnp.float32)
        pred = apply_act(self.act_type, hazard)
        return (feat_f3.astype(jnp.float32), features.astype(jnp.float32),
                hazard, pred)


def ResNet18(path_dim=32, num_classes=3, act_type="LSM", dtype=jnp.float32,
             paired=False):
    """reference ``resnets.py:287-295``"""
    return ResNet(block=BasicBlock, stage_sizes=(2, 2, 2, 2),
                  path_dim=path_dim, num_classes=num_classes,
                  act_type=act_type, dtype=dtype, paired=paired)


def ResNet34(path_dim=32, num_classes=3, act_type="LSM", dtype=jnp.float32,
             paired=False):
    return ResNet(block=BasicBlock, stage_sizes=(3, 4, 6, 3),
                  path_dim=path_dim, num_classes=num_classes,
                  act_type=act_type, dtype=dtype, paired=paired)


def ResNet50(path_dim=32, num_classes=3, act_type="LSM", dtype=jnp.float32):
    return ResNet(block=Bottleneck, stage_sizes=(3, 4, 6, 3),
                  path_dim=path_dim, num_classes=num_classes,
                  act_type=act_type, dtype=dtype)
