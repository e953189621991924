"""Superpixel attention masking (CLAT stage-1 "comprehensive learning").

Reference ``MIA 2023/stage1_multi_modal_teacher/train_test_MT_SP_Masking.py:
42-102``: input-gradient saliency of the fused NLL wrt both modalities (an
extra full backward on adversarial input copies, with the per-superpixel
aggregation ``bmm(grad, one_hot)`` **moved to the CPU mid-step** — a host
sync).  Top-``Path_K`` superpixels and top-``Omic_K`` omic features are
masked.

Here the whole thing is one on-device function inside the jitted step:
``jax.grad`` wrt the inputs, a one-hot MXU contraction for the per-segment
aggregation, top-k masks — no host round-trip.  (A ``segment_sum``
formulation was tried first: scatter-add serialises on TPU, while the
one-hot einsum is ~0.8 GFLOP of dense matmul the MXU eats for free — the
same shape the reference's ``bmm(grad, one_hot)`` uses, minus the mid-step
``.cpu()`` sync.)
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def superpixel_attention_mask(
    cost_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    x_path: jnp.ndarray, x_omic: jnp.ndarray, sp_mask: jnp.ndarray,
    num_superpixels: int, path_k: int, omic_k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (path_mask [B, H, W] in {0,1}, omic_mask [B, D] in {0,1}).

    cost_fn(x_path, x_omic) -> scalar fused NLL, evaluated in eval mode
    (the reference flips the model to .eval() for the saliency pass, :62).
    """
    g_path, g_omic = jax.grad(cost_fn, argnums=(0, 1))(x_path, x_omic)
    g_path = jax.lax.stop_gradient(g_path)
    g_omic = jax.lax.stop_gradient(g_omic)

    B, H, W = sp_mask.shape
    # per-superpixel mean gradient: sum grads over channels then segments.
    # one-hot contraction, not segment_sum: scatter serialises on TPU while
    # this is a dense [B,HW]x[B,HW,N] reduction the MXU handles in ~us.
    # ACCUMULATE in f32 (preferred_element_type / dtype=) while keeping the
    # [B, HW, N] one-hot in the narrow activation dtype: segment areas
    # (~2600 px) are not representable in bf16 (integers exact only to 256)
    # and a count error can flip near-tied top-k picks — but widening the
    # one-hot itself to f32 would double a ~1 GB operand if XLA ever
    # materialises it; f32 accumulation over exact bf16 ones costs nothing.
    g_sum = g_path.sum(-1).reshape(B, -1)             # [B, HW]
    seg = sp_mask.reshape(B, -1)
    onehot = jax.nn.one_hot(seg, num_superpixels, dtype=g_sum.dtype)
    sums = jnp.einsum("bh,bhn->bn", g_sum, onehot,
                      preferred_element_type=jnp.float32)
    area = jnp.sum(onehot, axis=1, dtype=jnp.float32)
    seg_mean = sums / (area + 1e-9)                   # [B, N]
    _, top_ids = jax.lax.top_k(seg_mean, path_k)      # [B, K]
    path_mask = (seg[:, :, None] == top_ids[:, None, :]).any(-1)
    path_mask = path_mask.reshape(B, H, W).astype(jnp.float32)

    # omic: features with grad >= k-th largest (:97)
    kth = jax.lax.top_k(g_omic, omic_k)[0][:, -1:]
    omic_mask = (g_omic >= kth).astype(jnp.float32)
    return path_mask, omic_mask
