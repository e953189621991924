"""Pallas TPU kernel: fused Kronecker-fusion contraction.

The Pathomic fusion's characteristic op is ``encoder1(vec(o1 o2^T))``
(``fusion.py:58-60``): a per-sample outer product flattened to
(d1+1)(d2+1) = 129^2 = 16641 floats and pushed through a Linear.  The
reference materialises that [B, 16641] tensor; this kernel computes the
factored contraction

    y[b, k] = sum_i o1[b,i] * (sum_j o2[b,j] * W[j, i, k]) + bias[k]

entirely in VMEM: one MXU matmul forms T = o2 @ W and a VPU reduction folds
in o1 — the Kronecker vector never exists anywhere, in any memory space.

Layout notes (hard-won on v5e):
- weights enter the kernels pre-flattened as [d2, d1*K]: collapsing
  (d1, K) -> d1*K *inside* a kernel forces a full re-tiling copy when d1 is
  not a sublane multiple (129), which alone blows the 16 MB VMEM budget;
  outside the kernel the same reshape is a free metadata change on the
  row-major HBM buffer.  Splitting the minor dim ([B, d1*K] -> [B, d1, K])
  is lane-aligned for K a multiple of 128 and stays free in-kernel.
- the backward runs as two kernels so W and dW (8.5 MB each at the paper
  config) are never resident together.
- the forward matmul uses HIGHEST precision (6-pass f32): measured 6.5e-7
  relative error vs float64, better than XLA's einsum at HIGHEST (3.9e-6);
  the gradients use default precision, which keeps them within bf16-pass
  noise of the reference while fitting VMEM.

Custom VJP:
    dW[j,i,k] = sum_b o2[b,j] (o1[b,i] g[b,k])
    do1[b,i]  = sum_k T[b,i,k] g[b,k]
    do2[b,j]  = sum_ik W[j,i,k] (o1[b,i] g[b,k])

Validated against the einsum reference in ``tests/test_pallas_ops.py``
(interpret mode) and on v5e hardware (see docstring numbers).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_kernel(o1_ref, o2_ref, w2d_ref, b_ref, out_ref):
    o1 = o1_ref[:]                       # [B, d1]
    o2 = o2_ref[:]                       # [B, d2]
    w2d = w2d_ref[:]                     # [d2, d1*K]
    B, d1 = o1.shape
    K = out_ref.shape[1]
    t = jax.lax.dot_general(             # [B, d1*K]
        o2, w2d, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    t = t.reshape(B, d1, K)
    out_ref[:] = jnp.sum(o1[:, :, None] * t, axis=1) + b_ref[:][None, :]


def _vmem(*specs):
    return [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in specs]


def _fwd(o1, o2, w, b):
    B = o1.shape[0]
    d2, d1, K = w.shape
    w2d = w.reshape(d2, d1 * K)          # free outside the kernel
    return pl.pallas_call(
        _fwd_kernel,
        in_specs=_vmem(o1, o2, w2d, b),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, K), jnp.float32),
    )(o1, o2, w2d, b)


def _bwd_dw_kernel(o1_ref, o2_ref, g_ref, dw_ref):
    o1 = o1_ref[:]                       # [B, d1]
    o2 = o2_ref[:]                       # [B, d2]
    g = g_ref[:]                         # [B, K]
    B, d1 = o1.shape
    K = g.shape[1]
    og = (o1[:, :, None] * g[:, None, :]).reshape(B, d1 * K)
    # dW[j, (i,k)] = sum_b o2[b,j] og[b,(i,k)]
    dw_ref[:] = jax.lax.dot_general(
        o2, og, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _bwd_dvec_kernel(o1_ref, o2_ref, w2d_ref, g_ref, do1_ref, do2_ref):
    o1 = o1_ref[:]
    o2 = o2_ref[:]
    w2d = w2d_ref[:]                     # [d2, d1*K]
    g = g_ref[:]                         # [B, K]
    B, d1 = o1.shape
    K = g.shape[1]
    og = (o1[:, :, None] * g[:, None, :]).reshape(B, d1 * K)
    # do2[b,j] = sum_(i,k) og[b,(i,k)] W[j,(i,k)]
    do2_ref[:] = jax.lax.dot_general(
        og, w2d, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    # do1[b,i] = sum_k T[b,i,k] g[b,k] with T = o2 @ W
    t = jax.lax.dot_general(
        o2, w2d, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(B, d1, K)
    do1_ref[:] = jnp.sum(t * g[:, None, :], axis=2)


@jax.custom_vjp
def kron_matmul(o1, o2, w, b):
    """y[b] = vec(o1[b] o2[b]^T) @ W + b with W stored [d2, d1, K]
    (W[j, i, k] multiplies o1[:, i] * o2[:, j]); the Kronecker vector is
    never materialised.  K must be a multiple of 128 (lane width)."""
    return _fwd(o1, o2, w, b)


def _kron_fwd(o1, o2, w, b):
    return _fwd(o1, o2, w, b), (o1, o2, w)


def _kron_bwd(res, g):
    o1, o2, w = res
    B, d1 = o1.shape
    d2 = o2.shape[1]
    K = w.shape[2]
    w2d = w.reshape(d2, d1 * K)
    dw2d = pl.pallas_call(
        _bwd_dw_kernel,
        in_specs=_vmem(o1, o2, g),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d2, d1 * K), jnp.float32),
    )(o1, o2, g)
    do1, do2 = pl.pallas_call(
        _bwd_dvec_kernel,
        in_specs=_vmem(o1, o2, w2d, g),
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((B, d1), jnp.float32),
                   jax.ShapeDtypeStruct((B, d2), jnp.float32)),
    )(o1, o2, w2d, g)
    db = jnp.sum(g, axis=0)
    return do1, do2, dw2d.reshape(d2, d1, K), db


kron_matmul.defvjp(_kron_fwd, _kron_bwd)


# ---------------------------------------------------------------------------
# Training-mode kernel: Kronecker contraction with dropout on the Kronecker
# vector (reference ``fusion.py:59`` applies Dropout(0.25) to vec(o1 o2^T)
# before encoder1).  The element-wise mask is rank-full over (i, j), so the
# factored eval contraction above cannot absorb it.  Mosaic cannot
# shape-cast a 129-minor [B, d1, d2] -> [B, d1*d2] in-kernel (unsupported
# re-tile, verified on v5e), so the per-sample factors enter pre-expanded:
# XLA builds ``repeat(o1, d2)`` and ``tile(o2, d1)`` ([B, (d1)(d2)] f32,
# ~1 MB each at the paper config — free metadata-ish passes in HBM), and the
# kernels stay purely 2-D: mask * factor products fused straight into the
# MXU contraction, the masked Kronecker vector never hits HBM.  The dW
# backward re-forms it in VMEM the same way (W and dW, 8.5 MB each, are
# never resident together); the small dvec backward (g @ W^T then two
# [B, d1, d2] reductions) is plain XLA — well-shaped and not worth a kernel.
# ---------------------------------------------------------------------------


def _fwd_train_kernel(o1r_ref, o2t_ref, m_ref, w2d_ref, b_ref, out_ref):
    a = o1r_ref[:] * o2t_ref[:] * m_ref[:]       # [B, (d1)(d2)] in VMEM
    out_ref[:] = jax.lax.dot_general(
        a, w2d_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b_ref[:][None, :]


def _expand_factors(o1, o2):
    """[B,d1],[B,d2] -> i-major [B,(d1)(d2)] repeat/tile expansions matching
    the reference's ``vec(o1 o2^T)`` flattening order."""
    d1, d2 = o1.shape[1], o2.shape[1]
    return jnp.repeat(o1, d2, axis=1), jnp.tile(o2, (1, d1))


@jax.custom_vjp
def kron_matmul_dropout(o1, o2, w2d, b, maskf):
    """y[b] = (vec(o1[b] o2[b]^T) * maskf[b]) @ w2d + b.

    ``w2d``: [(d1)(d2), K] in the reference einsum layout (row-major over
    (i, j) — exactly the encoder1 Linear kernel, no re-tiling needed).
    ``maskf``: [B, (d1)(d2)] f32 dropout mask pre-scaled by 1/keep (ones for
    rate 0).  Differentiable in o1/o2/w2d/b; the mask gets no cotangent.
    VMEM budget is sized for the paper config (batch <= 32 at 129^2 x 128).
    """
    return _fwd_train(o1, o2, w2d, b, maskf)


def _fwd_train(o1, o2, w2d, b, maskf):
    B = o1.shape[0]
    K = w2d.shape[1]
    o1r, o2t = _expand_factors(o1, o2)
    return pl.pallas_call(
        _fwd_train_kernel,
        in_specs=_vmem(o1r, o2t, maskf, w2d, b),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, K), jnp.float32),
    )(o1r, o2t, maskf, w2d, b)


def _kron_dropout_fwd(o1, o2, w2d, b, maskf):
    return _fwd_train(o1, o2, w2d, b, maskf), (o1, o2, w2d, maskf)


def _kron_dropout_bwd(res, g):
    o1, o2, w2d, maskf = res
    B, d1 = o1.shape
    d2 = o2.shape[1]
    # Whole backward in XLA.  A Pallas dW kernel (masked vector re-formed in
    # VMEM, [N, K] = a^T g) measured 227 ms/step on v5e — Mosaic tiles the
    # N=16641-row output of a contraction-16 matmul pathologically — vs
    # sub-ms for XLA's layout; the fwd fusion is where Pallas pays.
    o1r, o2t = _expand_factors(o1, o2)
    a = o1r * o2t * maskf
    dw = jax.lax.dot_general(
        a, g, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # s[b,(i,j)] = (g W^T * mask); do1 = sum_j s o2, do2 = sum_i s o1
    s = ((g @ w2d.T) * maskf).reshape(B, d1, d2)
    do1 = jnp.einsum("bij,bj->bi", s, o2)
    do2 = jnp.einsum("bij,bi->bj", s, o1)
    return do1, do2, dw, jnp.sum(g, axis=0), None


kron_matmul_dropout.defvjp(_kron_dropout_fwd, _kron_dropout_bwd)
