"""MMDynamic fusion — reconstruction of the class the reference uses but
never defines (``MICCAI-2022/networks_new.py:372-418`` constructs
``MMDynamic(dim_list, hidden_dim=[mmhid], num_class, dropout)`` — SURVEY §0
lists it as missing).  Rebuilt from the MMDynamics paper (Han et al.,
"Multimodal Dynamics: Dynamical Fusion for Trustworthy Multimodal
Classification", CVPR 2022):

- per modality: a feature-informativeness gate (sigmoid elementwise),
  a TCP confidence head, and a modality classifier
- fusion: concat(gated feature x confidence) -> MLP classifier
- loss: modality CEs + fused CE + TCP regression (confidence vs the true
  class probability)

Makes ``--fusion_type mmdynamics`` a live path instead of a crash.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import torch_linear_bias, torch_linear_default


def _dense(width, name):
    return nn.Dense(width, kernel_init=torch_linear_default, name=name)


class MMDynamic(nn.Module):
    dim_list: Sequence[int]
    hidden_dim: Sequence[int] = (128,)
    num_class: int = 3
    dropout: float = 0.5

    @nn.compact
    def __call__(self, features: List[jnp.ndarray], labels=None,
                 train: bool = True, infer: bool = False):
        gated, tcp_logits, confidences = [], [], []
        for i, f in enumerate(features):
            info = jax.nn.sigmoid(
                _dense(f.shape[-1], f"fi_{i}")(f))           # feature gate
            f = f * info
            f = nn.Dropout(self.dropout)(f, deterministic=not train)
            logit_i = _dense(self.num_class, f"clf_{i}")(f)   # TCPClassifier
            conf_i = jax.nn.sigmoid(
                _dense(1, f"conf_{i}")(f))                    # TCPConfidence
            gated.append(f * conf_i)
            tcp_logits.append(logit_i)
            confidences.append(conf_i)

        h = jnp.concatenate(gated, axis=1)
        for j, width in enumerate(self.hidden_dim):
            h = nn.relu(_dense(width, f"mm_{j}")(h))
            h = nn.Dropout(self.dropout)(h, deterministic=not train)
        mm_logit = _dense(self.num_class, "mm_clf")(h)
        if infer or labels is None:
            return mm_logit

        oh = jax.nn.one_hot(labels, self.num_class)

        def ce(logit):
            return -jnp.mean(jnp.sum(
                oh * jax.nn.log_softmax(logit, axis=1), axis=1))

        mm_loss = ce(mm_logit)
        for logit_i, conf_i in zip(tcp_logits, confidences):
            p = jax.nn.softmax(logit_i, axis=1)
            tcp = jnp.sum(p * oh, axis=1, keepdims=True)     # true class prob
            conf_loss = jnp.mean((conf_i - jax.lax.stop_gradient(tcp)) ** 2)
            mm_loss = mm_loss + ce(logit_i) + conf_loss
        return mm_loss, mm_logit, tcp_logits
