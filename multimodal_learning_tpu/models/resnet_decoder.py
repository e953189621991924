"""ResnetDecoder — CLAT stage-1 reconstruction decoder (parity-kept dead
code: imported but never called in the reference,
``MIA 2023/stage1_multi_modal_teacher/networks_new.py:432-491``):
latent -> Dense(512*2*2) -> 6x ConvTranspose(stride 2) -> 3x128x128 Tanh.
NHWC flax version.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .common import torch_linear_default


class ResnetDecoder(nn.Module):
    latent_dim: int = 128
    out_size: int = 128

    @nn.compact
    def __call__(self, z, train: bool = True):
        h = nn.Dense(512 * 2 * 2, kernel_init=torch_linear_default)(z)
        h = h.reshape(z.shape[0], 2, 2, 512)
        widths = (256, 128, 64, 32, 16)
        for i, w in enumerate(widths):
            h = nn.ConvTranspose(w, (4, 4), strides=(2, 2),
                                 padding="SAME", name=f"up{i}")(h)
            h = nn.BatchNorm(use_running_average=not train,
                             momentum=0.9, name=f"bn{i}")(h)
            h = nn.relu(h)
        h = nn.ConvTranspose(3, (4, 4), strides=(2, 2), padding="SAME",
                             name="out")(h)
        return jnp.tanh(h)
