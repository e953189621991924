"""Prototype Pallas kernel for the ResNet18 stage-1 conv (3x3, 64->64,
stride 1, pad 1, 128x128 spatial, NHWC bf16).

Why: PROFILE_r03.md pins this shape at 47-57 TF/s under XLA (24-29% of v5e
bf16 peak) because Cout=64 fills half the 128 MXU lanes.  The lane-merged
formulation computes output PAIRS of pixels — N = 2 px * 64 ch = 128 full
lanes — from a 256-lane input window (4 px * 64 ch), contracting K=256 per
row-tap; 75% of the MACs are useful (the off-band taps are zero weights),
so the ceiling is 0.75x the chip's practical bf16 matmul rate.  The input
lives in VMEM with full 9x tap reuse (the XLA-matmul im2col proxy in
conv_lab.py is HBM-bound and measures only 44 TF/s; this kernel streams no
im2col through HBM).

Layout trick: an NHWC [128, 128, 64] image viewed as [H=128, W*C=8192] is a
row-major bitcast; zero-padding 64 lanes on each side makes every 4-pixel
window [128t, 128t+256) lane-ALIGNED (the odd half-pixel offset is absorbed
by the pad).

Usage:  python tools/pallas_conv_proto.py check|bench [variant]
"""
from __future__ import annotations

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H = W = 128
C = 64
LW = W * C          # merged lane width 8192
LPAD = LW + 2 * C   # 8320 = 65 * 128


def _pack_w3(w):
    """[3,3,64,64] HWIO -> [3, 256, 128]: W3[ky, (px,ci), (w,co)] =
    w[ky, px-w, ci, co] for px-w in {0,1,2}, else 0."""
    w3 = np.zeros((3, 4, C, 2, C), w.dtype)
    w = np.asarray(w)
    for px in range(4):
        for dw in range(2):
            kx = px - dw
            if 0 <= kx <= 2:
                w3[:, px, :, dw, :] = w[:, kx, :, :]
    return jnp.asarray(w3.reshape(3, 4 * C, 2 * C))


def _kernel(x_ref, w3_ref, o_ref, xpad_ref):
    # build the zero-padded merged-lane image: [130, 8320]
    xpad_ref[:] = jnp.zeros_like(xpad_ref)
    xpad_ref[1:H + 1, C:C + LW] = x_ref[0]
    w3 = w3_ref[:]
    for t in range(W // 2):
        acc = jnp.zeros((H, 2 * C), jnp.float32)
        for ky in range(3):
            a = xpad_ref[ky:ky + H, 128 * t:128 * t + 256]
            acc += jnp.dot(a, w3[ky], preferred_element_type=jnp.float32)
        o_ref[0, :, 128 * t:128 * t + 128] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=())
def conv_pallas(x, w3):
    """x: [B, 128, 128, 64] bf16;  w3: [3, 256, 128] packed weights."""
    b = x.shape[0]
    xm = x.reshape(b, H, LW)
    out = pl.pallas_call(
        _kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, H, LW), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 4 * C, 2 * C), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, LW), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, H, LW), x.dtype),
        scratch_shapes=[pltpu.VMEM((H + 2, LPAD), x.dtype)],
    )(xm, w3)
    return out.reshape(b, H, W, C)


def conv_ref(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def check():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, H, W, C)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(3, 3, C, C)) * 0.05, jnp.bfloat16)
    ref = conv_ref(x, w)
    got = conv_pallas(x, _pack_w3(np.asarray(w)))
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                - got.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
    print(f"max abs err {err:.4f}  (scale {scale:.2f})")
    assert err <= 0.05 * scale + 0.05, "MISMATCH"
    print("OK")


def bench(batch=16, n=100, reps=3):
    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(
        rng.normal(size=(batch, H, W, C)), jnp.bfloat16))
    w = jnp.asarray(rng.normal(size=(3, 3, C, C)) * 0.05, jnp.bfloat16)
    w3 = _pack_w3(np.asarray(w))
    fl = 2 * batch * H * W * 9 * C * C

    def run(c, xx):
        def body(c, _):
            y = conv_pallas(xx + c.astype(xx.dtype), w3)
            return jnp.float32(0) * jnp.sum(y).astype(jnp.float32), None
        return lax.scan(body, c, None, length=n)[0]

    j = jax.jit(run)
    float(j(jnp.float32(0), x))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(j(jnp.float32(0), x))
        best = min(best, time.perf_counter() - t0)
    per = best / n
    print(f"pallas stage1 conv B{batch}: {fl / per / 1e12:8.1f} TF/s   "
          f"{per * 1e3:8.3f} ms")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "check"
    if mode == "check":
        check()
    else:
        bench()
