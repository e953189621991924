"""Parameter-freezing utilities.

The reference freezes torch modules by flipping ``requires_grad``
(``dfs_freeze/dfs_unfreeze/unfreeze_unimodal/print_if_frozen``,
``MICCAI-2022/utils.py:277-347``).  The JAX equivalent is an optimizer mask:
frozen subtrees receive zero updates while everything else trains normally.
"""
from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import optax


def freeze_mask(params: Any, frozen_keys: Sequence[str]) -> Any:
    """Pytree of booleans: True = trainable, False = frozen.  A leaf is
    frozen when any path component matches one of ``frozen_keys``."""

    def label(path, _leaf):
        keys = {jax.tree_util.keystr((p,)).strip("[]'\"")
                for p in path}
        names = {getattr(p, "key", getattr(p, "name", "")) for p in path}
        return not any(k in names or k in keys for k in frozen_keys)

    return jax.tree_util.tree_map_with_path(label, params)


def masked_optimizer(tx: optax.GradientTransformation, params: Any,
                     frozen_keys: Sequence[str]) -> optax.GradientTransformation:
    """Wrap ``tx`` so subtrees named in ``frozen_keys`` never update
    (reference ``dfs_freeze`` analogue)."""
    mask = freeze_mask(params, frozen_keys)
    return optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()},
        jax.tree_util.tree_map(
            lambda trainable: "train" if trainable else "freeze", mask))


def count_frozen(params: Any, frozen_keys: Sequence[str]) -> int:
    """``print_if_frozen`` analogue: number of frozen parameters."""
    mask = freeze_mask(params, frozen_keys)
    leaves = zip(jax.tree_util.tree_leaves(params),
                 jax.tree_util.tree_leaves(mask))
    return sum(int(p.size) for p, trainable in leaves if not trainable)
