"""Task losses: grading NLL, Cox partial likelihood, L1 regularisation.

Reference:
- NLL over LogSoftmax outputs (``train_test_MT.py:212-215``)
- ``CoxLoss`` (``MICCAI-2022/utils.py:361-376``) — the reference builds the
  O(B^2) risk matrix in Python loops on the host every step; here it is a
  single broadcast comparison that fuses into the backward pass on the VPU.
- ``regularize_*`` L1 penalties (``utils.py:60-198``)
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp


def nll_loss(log_probs: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """``F.nll_loss``: mean negative log-likelihood of already-log-softmaxed
    predictions."""
    picked = jnp.take_along_axis(log_probs, labels[:, None], axis=1)[:, 0]
    return -jnp.mean(picked)


def cox_loss(survtime: jnp.ndarray, censor: jnp.ndarray,
             hazard_pred: jnp.ndarray) -> jnp.ndarray:
    """Cox partial likelihood (``utils.py:361-376``).

    ``R[i, j] = survtime[j] >= survtime[i]`` (at-risk set), loss is
    ``-mean((theta_i - log sum_j exp(theta_j) R_ij) * censor_i)``.
    """
    theta = hazard_pred.reshape(-1)
    risk = (survtime[None, :] >= survtime[:, None]).astype(theta.dtype)
    # log-sum-exp over the risk set, numerically stable (the reference's raw
    # exp-sum-log overflows for |theta| > ~80; same value where both finite).
    masked = jnp.where(risk > 0, theta[None, :], -jnp.inf)
    log_risk = jax.scipy.special.logsumexp(masked, axis=1)
    return -jnp.mean((theta - log_risk) * censor)


def l1_regularizer(params: Any, reg_type: str = "all") -> jnp.ndarray:
    """L1 penalty over parameter subsets (``define_reg``,
    ``networks_new.py:93-108`` + ``utils.py:60-198``):

    - ``none``: 0
    - ``all``:  every parameter
    - ``omic``: the ``omic_net`` subtree (``regularize_MM_omic``)
    - ``mm``:   omic_net + fusion + classifier (``regularize_MM_weights``)
    - ``path``: classifier subtree (``regularize_path_weights``)
    """
    if reg_type == "none":
        return jnp.asarray(0.0)

    def _tree_l1(tree):
        leaves = jax.tree_util.tree_leaves(tree)
        if not leaves:
            return jnp.asarray(0.0)
        return sum(jnp.abs(leaf).sum() for leaf in leaves)

    if reg_type == "all":
        return _tree_l1(params)

    if not isinstance(params, dict):
        return _tree_l1(params)

    wanted: Dict[str, tuple] = {
        "omic": ("omic_net",),
        "mm": ("omic_net", "fusion", "classifier"),
        "path": ("classifier",),
    }
    if reg_type not in wanted:
        raise NotImplementedError(f"reg method [{reg_type}] is not implemented")
    # subtrees that don't exist contribute nothing — the reference's
    # hasattr() guards skip them the same way (utils.py:92-182).
    total = jnp.asarray(0.0)
    for key in wanted[reg_type]:
        if key in params:
            total = total + _tree_l1(params[key])
    return total
