"""Train state pytree.

One struct carries everything the jitted step mutates: model params, BN
stats, the EMA teacher (params + its own BN stats — see ``ema.py`` for the
parity quirk), optimizer state, and the CRD memory banks.  The whole struct
is replicated over the data mesh; batches are the only sharded inputs.

Functional replacement for the reference's scattered mutable state: model/
ema module attrs + ``ContrastMemory`` registered buffers
(``MICCAI-2022/train_test_MT.py:62-96``, ``CL_utils/CRD_criterion.py:124-131``)
and the in-place ADMM aux tensors (``MIA 2022/train_test_tSVD.py:150-210``).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any                 # {'model': ..., 'crd_<name>_s'/'_t': ...}
    batch_stats: Any
    opt_state: Any
    ema_params: Optional[Any] = None
    ema_batch_stats: Optional[Any] = None
    banks: Optional[Dict[str, Any]] = None   # name -> CRDBank
