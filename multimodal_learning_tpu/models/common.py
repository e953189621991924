"""Shared model building blocks.

Weight-init distributions mirror the reference:
- conv: Kaiming-normal fan_out (``MICCAI-2022/resnets.py:176-178``)
- "max" init Linear: N(0, 1/sqrt(fan_in)), zero bias
  (``MICCAI-2022/utils.py:239-244``)
- torch-default Linear: U(+-1/sqrt(fan_in)) for both kernel and bias
  (used by the ResNet heads, which the reference never re-initialises)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

# torch kaiming_normal_(mode='fan_out', nonlinearity='relu')
kaiming_normal_out = jax.nn.initializers.variance_scaling(
    2.0, "fan_out", "normal")

# reference init_max_weights: N(0, 1/sqrt(fan_in)) (utils.py:239-244)
max_init = jax.nn.initializers.variance_scaling(1.0, "fan_in", "normal")

# torch nn.Linear default: U(-1/sqrt(fan_in), 1/sqrt(fan_in))
torch_linear_default = jax.nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform")


def torch_linear_bias(fan_in: int):
    """torch Linear bias default U(+-1/sqrt(fan_in))."""
    bound = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


# SELU constants used by AlphaDropout
_SELU_ALPHA = 1.6732632423543772
_SELU_SCALE = 1.0507009873554805
_ALPHA_P = -_SELU_ALPHA * _SELU_SCALE  # value dropped units take


class AlphaDropout(nn.Module):
    """Self-normalizing dropout (Klambauer et al. 2017).

    Equivalent to ``torch.nn.AlphaDropout`` as used by the MaxNet SNN encoder
    (``MICCAI-2022/networks_new.py:189-211``): dropped units are set to
    ``-alpha*scale`` and the output is affinely rescaled so mean/variance are
    preserved.
    """
    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool):
        if deterministic or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        a = (keep + _ALPHA_P ** 2 * keep * (1 - keep)) ** -0.5
        b = -a * _ALPHA_P * (1 - keep)
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, keep, x.shape)
        return a * jnp.where(mask, x, _ALPHA_P) + b


def apply_act(act_type: str, hazard: jnp.ndarray) -> jnp.ndarray:
    """Output activation (reference ``define_act_layer``,
    ``networks_new.py:132-145``), including the survival range-shift
    ``sigmoid(x)*6-3`` (``resnets.py:249-253``, ``networks_new.py:233-237``)."""
    if act_type == "LSM":
        return jax.nn.log_softmax(hazard, axis=-1)
    if act_type == "Sigmoid":
        return jax.nn.sigmoid(hazard) * 6.0 - 3.0
    if act_type == "Tanh":
        return jnp.tanh(hazard)
    if act_type == "ReLU":
        return jax.nn.relu(hazard)
    if act_type == "none":
        return hazard
    raise NotImplementedError(f"activation [{act_type}] is not found")
