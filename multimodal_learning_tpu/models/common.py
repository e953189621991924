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


def apply_init_type(rng, params, init_type: str, init_gain: float):
    """Post-init re-initialisation — reference ``init_weights``
    (``utils.py:205-233``, applied by ``init_net`` from ``define_net``):

    - Conv/Linear kernels: normal(0, gain) | xavier_normal(gain) |
      kaiming_normal(fan_in) | orthogonal(gain); their biases -> 0
    - BatchNorm scale: N(1, gain), bias -> 0

    ``max`` (the recipes' default) and ``none`` leave the modules'
    self-initialisation untouched, matching ``init_net``'s max branch.
    Operates on a flax param pytree: kernels are leaves named ``kernel``
    with ndim >= 2; BN subtrees are identified by a ``scale`` sibling.
    """
    if init_type in ("max", "none", "normal_default"):
        return params
    if init_type not in ("normal", "xavier", "kaiming", "orthogonal"):
        raise NotImplementedError(
            f"initialization method [{init_type}] is not implemented")

    if init_type == "xavier":
        kinit = jax.nn.initializers.xavier_normal()
    elif init_type == "kaiming":
        # torch kaiming_normal_(a=0, mode='fan_in') -> gain sqrt(2)
        kinit = jax.nn.initializers.variance_scaling(2.0, "fan_in", "normal")
    elif init_type == "orthogonal":
        kinit = jax.nn.initializers.orthogonal()

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    keys = jax.random.split(rng, len(flat))
    bn_dirs = {jax.tree_util.keystr(path[:-1])
               for path, _ in flat
               if jax.tree_util.keystr(path[-1:]) == "['scale']"}
    new_leaves = []
    for key, (path, leaf) in zip(keys, flat):
        name = jax.tree_util.keystr(path[-1:])
        parent = jax.tree_util.keystr(path[:-1])
        if parent in bn_dirs:
            if name == "['scale']":
                leaf = 1.0 + init_gain * jax.random.normal(
                    key, leaf.shape, leaf.dtype)
            elif name == "['bias']":
                leaf = jnp.zeros_like(leaf)
        elif name == "['kernel']" and leaf.ndim >= 2:
            if init_type == "normal":
                leaf = init_gain * jax.random.normal(key, leaf.shape,
                                                     leaf.dtype)
            else:
                leaf = kinit(key, leaf.shape, leaf.dtype)
                if init_type in ("xavier", "orthogonal"):
                    # torch multiplies the draw by ``gain``; kaiming
                    # takes no gain argument in the reference
                    leaf = leaf * init_gain
        elif name == "['bias']":
            leaf = jnp.zeros_like(leaf)
        new_leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


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


def count_parameters(params) -> int:
    """Total trainable parameter count (``utils.py:542-543``
    ``count_parameters``; printed at setup by every reference driver, e.g.
    ``train_test_MT.py:96``).  All params in the tree are trainable here —
    freezing is an optimizer mask (``train/freeze.py``), not a tree prune."""
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
