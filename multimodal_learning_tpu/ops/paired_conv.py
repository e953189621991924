"""Lane-paired convolutions for the ResNet18 bottleneck shapes.

Why: on v5e the MXU has 128 output lanes; XLA's implicit-GEMM conv puts
output *channels* on lanes, so the ResNet18 stage-1 convs (Cout=64,
``resnets.py:165-190`` layer1 in the reference) run at half lane
utilisation (~60 TF/s bf16, 30% of peak — ``PROFILE_r03.md`` §2), and the
Cin=3 stem (``resnets.py:150`` conv1 7x7/2) at 6-7%.

The rewrite computed here: produce output-pixel PAIRS as 2*C fused output
channels.  A 3x3/s1 conv over NHWC becomes a 3x4 conv with x-stride 2 and
weights laid out ``W2[ky, kx', ci, px*C+co] = W[ky, kx'-px, ci, co]``
(zero off-band), giving N = 2*64 = 128 full lanes; the paired output
``[B, H, W/2, 2C]`` reshapes back to ``[B, H, W, C]`` for free (row-major:
the (x-pair, px) split is exactly the channel-major order).  Raw FLOPs are
4/3 of the plain conv but the full-lane MXU more than pays for it:
measured 93 TF/s effective vs 60 (fwd, B16 @128²) and 18 vs 13 for the
stem (``tools/conv_lab.py paired_stage1 paired_stem``).

``paired_conv3x3`` carries a custom VJP: the data gradient of a same-pad
3x3/s1 conv is itself a same-pad 3x3/s1 conv (180°-flipped, IO-transposed
weights), so it reuses the paired forward; the weight gradient uses the
standard XLA batch-contraction formulation (57 TF/s — only ~6% of the
train step, not worth pairing).

These are exact reformulations — same math, same parameter tensors
(HWIO, identical to ``flax.linen.Conv``), different summation order only.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax import lax
import flax.linen as nn

# Same init as models/common.kaiming_normal_out (imported would be circular:
# ops <- models/__init__ <- resnet <- ops).
kaiming_normal_out = jax.nn.initializers.variance_scaling(
    2.0, "fan_out", "normal")


def _pack_pair3(w: jnp.ndarray) -> jnp.ndarray:
    """[3,3,Ci,Co] HWIO -> [3,4,Ci,2*Co] paired weights (traced, linear)."""
    z = ((0, 0), (0, 1), (0, 0), (0, 0))
    w2 = jnp.stack([jnp.pad(w, z),                       # px=0: taps at kx' 0..2
                    jnp.pad(w, ((0, 0), (1, 0), (0, 0), (0, 0)))],  # px=1: 1..3
                   axis=3)                               # [3,4,Ci,2,Co]
    return w2.reshape(3, 4, w.shape[2], 2 * w.shape[3])


def _pair3_apply(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    b, h, wd, _ = x.shape
    co = w.shape[3]
    y = lax.conv_general_dilated(
        x, _pack_pair3(w), (1, 2), ((1, 1), (1, 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y.reshape(b, h, wd, co)


def _wgrad3(x: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """dW[3,3,Ci,Co] for a same-pad 3x3/s1 NHWC conv (batch-contraction)."""
    out = lax.conv_general_dilated(
        x.transpose(3, 1, 2, 0), g.transpose(1, 2, 0, 3), (1, 1),
        ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out.transpose(1, 2, 0, 3)


@jax.custom_vjp
def paired_conv3x3(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Same-pad 3x3/stride-1 NHWC conv, lane-paired. W must be even."""
    return _pair3_apply(x, w)


def _pc3_fwd(x, w):
    return _pair3_apply(x, w), (x, w)


def _pc3_bwd(res, g):
    x, w = res
    wf = jnp.flip(w, (0, 1)).transpose(0, 1, 3, 2)
    dx = _pair3_apply(g, wf)          # dgrad is the same conv family: pair it
    dw = _wgrad3(x, g).astype(w.dtype)
    return dx, dw


paired_conv3x3.defvjp(_pc3_fwd, _pc3_bwd)


def paired_stem_conv(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """7x7/stride-2/pad-3 NHWC conv, lane-paired: a 7x9 conv with x-stride 4
    producing pixel pairs as 128 channels.  Differentiated by plain AD —
    dx is dead (the stem input is data) and the packed wgrad measures on
    par with the standard one.  W_in must be divisible by 4."""
    b, h, wd, _ = x.shape
    co = w.shape[3]
    z = ((0, 0), (0, 2), (0, 0), (0, 0))
    w2 = jnp.stack([jnp.pad(w, z),                       # px=0: kx'' 0..6
                    jnp.pad(w, ((0, 0), (2, 0), (0, 0), (0, 0)))],  # px=1: 2..8
                   axis=3).reshape(7, 9, w.shape[2], 2 * co)
    y = lax.conv_general_dilated(
        x, w2, (2, 4), ((3, 3), (3, 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y.reshape(b, h // 2, wd // 2, co)


class PairedConv3x3(nn.Module):
    """Drop-in for ``nn.Conv(features, (3,3), padding=1, use_bias=False)``
    at the stage-1 shape — same param name/shape/init, paired compute."""
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", kaiming_normal_out,
                            (3, 3, x.shape[-1], self.features), jnp.float32)
        return paired_conv3x3(x.astype(self.dtype), kernel.astype(self.dtype))


class PairedStemConv(nn.Module):
    """Drop-in for the 7x7/s2/p3 stem ``nn.Conv`` (same params)."""
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", kaiming_normal_out,
                            (7, 7, x.shape[-1], self.features), jnp.float32)
        return paired_stem_conv(x.astype(self.dtype),
                                kernel.astype(self.dtype))
