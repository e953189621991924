"""MaxNet self-normalizing genomic encoder.

Capability parity with ``MICCAI-2022/networks_new.py:182-251``: a 4-layer SNN
``80 -> 64 -> 48 -> 32 -> omic_dim`` of [Linear -> ELU -> AlphaDropout], a ReLU
feature head, and a linear classifier, with N(0, 1/sqrt(fan_in)) "max" init
(``utils.py:239-244``).  Returns ``(features, hazard, pred)``.

An 80-d MLP is tiny for the MXU; recipes batch it wide and it fuses into a
handful of XLA ops — the value here is functional purity (explicit dropout
PRNG) so the whole train step jits.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import AlphaDropout, apply_act, max_init, torch_linear_bias, torch_linear_default


class MaxNet(nn.Module):
    input_dim: int = 80
    omic_dim: int = 32
    dropout_rate: float = 0.25
    act_type: str = "LSM"
    label_dim: int = 3
    init_max: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True) -> Tuple[jnp.ndarray, ...]:
        hidden = (64, 48, 32, self.omic_dim)
        kinit = max_init if self.init_max else torch_linear_default
        h = x.astype(self.dtype)
        for i, width in enumerate(hidden):
            binit = (nn.initializers.zeros if self.init_max
                     else torch_linear_bias(h.shape[-1]))
            h = nn.Dense(width, kernel_init=kinit, bias_init=binit,
                         dtype=self.dtype, name=f"encoder{i + 1}")(h)
            h = jax.nn.elu(h)
            h = AlphaDropout(self.dropout_rate)(h, deterministic=not train)
        features = nn.relu(h).astype(jnp.float32)
        binit = (nn.initializers.zeros if self.init_max
                 else torch_linear_bias(self.omic_dim))
        hazard = nn.Dense(self.label_dim, kernel_init=kinit, bias_init=binit,
                          name="classifier")(features)
        pred = apply_act(self.act_type, hazard)
        return features, hazard, pred


class MaxNetDecoder(nn.Module):
    """Reverse SNN decoder (CLAT stage-1 dead code, kept for parity:
    ``MIA 2023/stage1_multi_modal_teacher/networks_new.py:493-521``)."""
    omic_dim: int = 32
    output_dim: int = 80
    dropout_rate: float = 0.25
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z, train: bool = True) -> jnp.ndarray:
        h = z.astype(self.dtype)
        for i, width in enumerate((32, 48, 64)):
            h = nn.Dense(width, kernel_init=max_init,
                         bias_init=nn.initializers.zeros,
                         dtype=self.dtype, name=f"decoder{i + 1}")(h)
            h = jax.nn.elu(h)
            h = AlphaDropout(self.dropout_rate)(h, deterministic=not train)
        return nn.Dense(self.output_dim, kernel_init=max_init,
                        bias_init=nn.initializers.zeros,
                        name="decoder4")(h).astype(jnp.float32)
