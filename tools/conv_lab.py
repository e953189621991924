"""Conv micro-lab: measure the profiled ResNet18 bottleneck shapes and the
candidate Pallas reformulations' ceilings on the real chip.

Round-3 follow-up to ``PROFILE_r03.md``: the flagship step's two deficits are
(a) the 7x7/s2 Cin=3 stem (11-14 TF/s, ~6% of v5e bf16 peak, ~11% of step
time) and (b) the 3x3 64-ch stage-1 convs (57 TF/s, 29% of peak).  Both are
lane-bound: XLA's implicit-matmul conv puts output channels (64) on the
128-wide lane axis.  The candidate fix is a "transposed-N" matmul — compute
``out[Cout, pixels] = W[Cout, K] @ patches[K, pixels]`` so pixels fill the
lanes — which this lab bounds from above by timing the raw matmuls with
pre-materialised patches.

Usage: MML_PLATFORM= python tools/conv_lab.py exp1 exp2 ...   (or 'all')

Timing: one jitted lax.scan chain of N steps, carry threaded through the
input (``x + c*0``) so nothing hoists (CLAUDE.md scan-hoisting trap), synced
by a float() fetch; best-of-3.
"""
from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

N = int(__import__("os").environ.get("LAB_N", 50))
REPS = 3
B = 16


def chain(op, x, flops, n=N, reps=REPS):
    """Best-of-reps TF/s for y=op(x) with a data-dependent scan chain."""
    def run(c, xx):
        def body(c, _):
            y = op(xx + c.astype(xx.dtype))
            return jnp.float32(0) * jnp.sum(y).astype(jnp.float32), None
        return lax.scan(body, c, None, length=n)[0]

    j = jax.jit(run)
    x = jax.device_put(x)
    float(j(jnp.float32(0), x))  # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(j(jnp.float32(0), x))
        best = min(best, time.perf_counter() - t0)
    per = best / n
    return flops / per / 1e12, per * 1e3


def conv(x, w, stride, pad):
    return lax.conv_general_dilated(
        x, w, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def report(name, tf, ms):
    print(f"{name:28s} {tf:8.1f} TF/s   {ms:8.3f} ms")


def stem(dtype):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, 512, 512, 3)), dtype)
    w = jnp.asarray(rng.normal(size=(7, 7, 3, 64)) * 0.1, dtype)
    fl = 2 * B * 256 * 256 * 7 * 7 * 3 * 64
    report(f"stem 7x7/s2 {dtype}", *chain(lambda t: conv(t, w, 2, 3), x, fl))


def stem_nchw():
    """Stem via feature-group trick? No — plain NCHW I/O layouts."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, 3, 512, 512)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(64, 3, 7, 7)) * 0.1, jnp.bfloat16)
    fl = 2 * B * 256 * 256 * 7 * 7 * 3 * 64

    def op(t):
        return lax.conv_general_dilated(
            t, w, (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
    report("stem 7x7/s2 NCHW bf16", *chain(op, x, fl))


def stage1(dtype, batch):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, 128, 128, 64)), dtype)
    w = jnp.asarray(rng.normal(size=(3, 3, 64, 64)) * 0.05, dtype)
    fl = 2 * batch * 128 * 128 * 9 * 64 * 64
    report(f"3x3 64ch B{batch} {dtype}", *chain(lambda t: conv(t, w, 1, 1),
                                                x, fl))


def stage1_dgrad():
    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.normal(size=(B, 128, 128, 64)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(3, 3, 64, 64)) * 0.05, jnp.bfloat16)
    fl = 2 * B * 128 * 128 * 9 * 64 * 64
    wf = jnp.flip(jnp.flip(w, 0), 1).transpose(0, 1, 3, 2)
    report("3x3 64ch dgrad bf16", *chain(lambda t: conv(t, wf, 1, 1), g, fl))


def stage1_wgrad():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, 128, 128, 64)), jnp.bfloat16)
    g = jnp.asarray(rng.normal(size=(B, 128, 128, 64)) * 0.05, jnp.bfloat16)
    fl = 2 * B * 128 * 128 * 9 * 64 * 64

    def op(t):
        return lax.conv_general_dilated(
            t.transpose(3, 1, 2, 0), g.transpose(1, 2, 0, 3), (1, 1),
            ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    report("3x3 64ch wgrad bf16", *chain(op, x, fl))


def mm(m, k, n, dtype, label):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(m, k)) * 0.05, dtype)
    b = jnp.asarray(rng.normal(size=(k, n)) * 0.05, dtype)
    fl = 2 * m * k * n
    report(label, *chain(
        lambda t: jnp.dot(a, t, preferred_element_type=jnp.float32), b, fl))


def mm_n(m, k, n, dtype, label):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(m, k)) * 0.05, dtype)
    b = jnp.asarray(rng.normal(size=(k, n)) * 0.05, dtype)
    fl = 2 * m * k * n
    report(label, *chain(
        lambda t: jnp.dot(t, b, preferred_element_type=jnp.float32), a, fl))


def _pack_paired_stage1(w):
    """[3,3,C,C] -> [3,4,C,2C]: W2[ky,kx',ci,px*C+co] = w[ky,kx'-px,ci,co]."""
    c = w.shape[2]
    w2 = np.zeros((3, 4, c, 2, c), np.asarray(w).dtype)
    for px in range(2):
        for kxp in range(4):
            kx = kxp - px
            if 0 <= kx <= 2:
                w2[:, kxp, :, px, :] = np.asarray(w)[:, kx, :, :]
    return jnp.asarray(w2.reshape(3, 4, c, 2 * c))


def paired_stage1(batch=B, check=False):
    """Paired-output 3x3 64ch conv: output pixel PAIRS as 128 channels
    (full MXU lanes) via a 3x4/stride-(1,2) conv + free reshape.
    1.33x raw FLOPs; reported rate is EFFECTIVE (original conv FLOPs)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, 128, 128, 64)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(3, 3, 64, 64)) * 0.05, jnp.bfloat16)
    w2 = _pack_paired_stage1(w)
    fl = 2 * batch * 128 * 128 * 9 * 64 * 64

    def op(t):
        y = lax.conv_general_dilated(
            t, w2, (1, 2), ((1, 1), (1, 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y.reshape(t.shape[0], 128, 128, 64)

    if check:
        ref = conv(x, w, 1, 1)
        got = op(x)
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                    - got.astype(jnp.float32))))
        print(f"paired stage1 max abs err {err:.4f} "
              f"(scale {float(jnp.max(jnp.abs(ref.astype(jnp.float32)))):.2f})")
    report(f"3x3 64ch B{batch} PAIRED eff", *chain(op, x, fl))


def _pack_paired_stem(w):
    """[7,7,3,64] -> [7,9,3,128]: W2[ky,kx'',ci,px*64+co] =
    w[ky,kx''-2px,ci,co] (stride-2 conv, paired outputs)."""
    w2 = np.zeros((7, 9, 3, 2, 64), np.asarray(w).dtype)
    for px in range(2):
        for kxp in range(9):
            kx = kxp - 2 * px
            if 0 <= kx <= 6:
                w2[:, kxp, :, px, :] = np.asarray(w)[:, kx, :, :]
    return jnp.asarray(w2.reshape(7, 9, 3, 128))


def paired_stem(check=False):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, 512, 512, 3)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(7, 7, 3, 64)) * 0.1, jnp.bfloat16)
    w2 = _pack_paired_stem(w)
    fl = 2 * B * 256 * 256 * 7 * 7 * 3 * 64

    def op(t):
        y = lax.conv_general_dilated(
            t, w2, (2, 4), ((3, 3), (3, 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y.reshape(t.shape[0], 256, 256, 64)

    if check:
        ref = conv(x, w, 2, 3)
        got = op(x)
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                    - got.astype(jnp.float32))))
        print(f"paired stem max abs err {err:.4f} "
              f"(scale {float(jnp.max(jnp.abs(ref.astype(jnp.float32)))):.2f})")
    report("stem 7x7/s2 PAIRED eff", *chain(op, x, fl))


def honest_stage1(paired):
    """conv + residual add: the add forces materialisation in the consumer
    layout, so the paired variant pays its un-pairing relayout (the plain
    ``sum(y)`` chain lets XLA elide it — measurement trap)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, 128, 128, 64)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(3, 3, 64, 64)) * 0.05, jnp.bfloat16)
    w2 = _pack_paired_stage1(w)
    fl = 2 * B * 128 * 128 * 9 * 64 * 64

    def op(t):
        if paired:
            y = lax.conv_general_dilated(
                t, w2, (1, 2), ((1, 1), (1, 2)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = y.reshape(t.shape[0], 128, 128, 64)
        else:
            y = conv(t, w, 1, 1)
        return jnp.maximum(y + t, 0)          # residual+relu, forces layout

    report(f"3x3 64ch +res {'PAIRED' if paired else 'plain '}",
           *chain(op, x, fl))


def honest_stem(paired):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, 512, 512, 3)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(7, 7, 3, 64)) * 0.1, jnp.bfloat16)
    w2 = _pack_paired_stem(w)
    b = jnp.asarray(rng.normal(size=(64,)), jnp.bfloat16)
    fl = 2 * B * 256 * 256 * 7 * 7 * 3 * 64

    def op(t):
        if paired:
            y = lax.conv_general_dilated(
                t, w2, (2, 4), ((3, 3), (3, 2)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = y.reshape(t.shape[0], 256, 256, 64)
        else:
            y = conv(t, w, 2, 3)
        y = jnp.maximum(y + b, 0)
        # the real consumer: 3x3/s2 max-pool — needs spatial neighbourhoods,
        # so the paired variant cannot elide its un-pairing relayout
        return lax.reduce_window(
            y, -jnp.inf, lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            ((0, 0), (1, 1), (1, 1), (0, 0)))

    report(f"stem +bnrelu+pool {'PAIRED' if paired else 'plain '}",
           *chain(op, x, fl))


EXPS = {
    "honest_stage1_plain": lambda: honest_stage1(False),
    "honest_stage1_paired": lambda: honest_stage1(True),
    "honest_stem_plain": lambda: honest_stem(False),
    "honest_stem_paired": lambda: honest_stem(True),
    "paired_stage1": lambda: paired_stage1(check=True),
    "paired_stage1_b32": lambda: paired_stage1(32),
    "paired_stem": lambda: paired_stem(check=True),
    "stem_bf16": lambda: stem(jnp.bfloat16),
    "stem_f32": lambda: stem(jnp.float32),
    "stem_nchw": stem_nchw,
    "stage1_b16": lambda: stage1(jnp.bfloat16, 16),
    "stage1_b32": lambda: stage1(jnp.bfloat16, 32),
    "stage1_f32": lambda: stage1(jnp.float32, 16),
    "stage1_dgrad": stage1_dgrad,
    "stage1_wgrad": stage1_wgrad,
    # transposed-N ceilings: out[Cout, pixels], pixels on lanes
    "mm_t_stage1": lambda: mm(64, 576, B * 128 * 128, jnp.bfloat16,
                              "mm [64,576]@[576,262k] T"),
    "mm_t_stem": lambda: mm(64, 192, B * 256 * 256, jnp.bfloat16,
                            "mm [64,192]@[192,1M] T"),
    # standard-N (what XLA's conv effectively does): out[pixels, Cout]
    "mm_n_stage1": lambda: mm_n(B * 128 * 128, 576, 64, jnp.bfloat16,
                                "mm [262k,576]@[576,64] N"),
    # wgrad transposed: dW_t[64, 576] = g[64, Npix] @ patches_t[Npix, 576]
    "mm_t_wgrad": lambda: mm(64, B * 128 * 128, 576, jnp.bfloat16,
                             "mm [64,262k]@[262k,576] W"),
    # A-concat kernel shape: M=pixel-pairs, K=(2+2px)*192, N=2px*64ch.
    # Useful-MAC fraction is 75%, so kernel ceiling = 0.75 * this rate.
    "mm_a_stage1": lambda: mm_n(B * 128 * 128 // 2, 768, 128, jnp.bfloat16,
                                "mm [131k,768]@[768,128] A"),
    # same at half K (single-row-group matmul, K=256)
    "mm_a_k256": lambda: mm_n(B * 128 * 128 // 2, 256, 128, jnp.bfloat16,
                              "mm [131k,256]@[256,128] A3"),
    # stem A-form: M=out pixels, K=8 half-rows*144 lanes, N=16px*64... too
    # wasteful (17% useful); measure the 4x4 s2d form instead:
    # M=out px/2, K=(2+2)*4*... s2d conv 4x4x12: pairs: K=(2+2px)*4*48?
    "mm_a_stem": lambda: mm_n(B * 256 * 256 // 2, 6 * 192, 128, jnp.bfloat16,
                              "mm [524k,1152]@[1152,128] S"),
    # practical matmul peak on this chip (compute-bound, VMEM-resident tiles)
    "mm_big_bf16": lambda: mm_n(4096, 4096, 4096, jnp.bfloat16,
                                "mm 4096^3 bf16"),
    "mm_big_f32": lambda: mm_n(4096, 4096, 4096, jnp.float32,
                               "mm 4096^3 f32"),
}


def main():
    names = sys.argv[1:] or ["all"]
    if names == ["all"]:
        names = list(EXPS)
    print(f"devices: {jax.devices()}")
    for nm in names:
        EXPS[nm]()


if __name__ == "__main__":
    main()
