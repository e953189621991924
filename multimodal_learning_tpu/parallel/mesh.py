"""Device mesh + sharding helpers.

The reference's only parallelism is intra-process ``torch.nn.DataParallel``
(``MICCAI-2022/utils.py:257-260``, ``train_test_MT.py:62-64``).  The
TPU-native replacement is a 1-D ``data`` mesh: batches are sharded over it,
parameters / EMA / CRD banks are replicated, and XLA inserts the gradient
psums and global BatchNorm reductions automatically when the train step is
jitted with these shardings.  On one chip everything degenerates to local
compute; on a pod slice the same program scales over ICI with no code change.

Multi-host: ``maybe_init_distributed()`` (called by every training CLI)
initializes the jax distributed runtime when ``MML_MULTIHOST=1``; the mesh
then spans ``jax.devices()`` globally and ``shard_batch`` switches to
``jax.make_array_from_process_local_data`` so each host contributes its
local slice of the global batch.  The train steps need no change — they
are already written against global-batch shardings.  (Single-chip rig:
the multi-process branch is exercised only as the process_count==1
degenerate case; multi-host hardware runs the same code path.)
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_init_distributed() -> bool:
    """Initialize the jax distributed runtime for multi-host meshes.

    Gated on ``MML_MULTIHOST=1`` (the coordinator address / process ids are
    auto-detected on TPU pods; override with the standard
    ``JAX_COORDINATOR_ADDRESS`` / ``JAX_PROCESS_ID`` env).  Returns whether
    initialization ran.  Must be called before first device use.
    """
    if os.environ.get("MML_MULTIHOST") != "1":
        return False
    # idempotent: delegating CLIs call this twice (the masking CLI wraps
    # train_cv_MT.main), and jax.distributed.initialize raises on re-init
    global _DISTRIBUTED_INITIALIZED
    if _DISTRIBUTED_INITIALIZED:
        return True
    jax.distributed.initialize()
    _DISTRIBUTED_INITIALIZED = True
    return True


_DISTRIBUTED_INITIALIZED = False


def data_mesh(n_devices: int = 0) -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (0 = all)."""
    devs = jax.devices()
    if n_devices and n_devices > 0:
        if n_devices > len(devs):
            raise ValueError(
                f"--data_parallel {n_devices} requested but only "
                f"{len(devs)} device(s) are visible")
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("data",))


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Shard every array's leading (batch) axis over ``data``.

    Single-process: a sharded ``device_put``.  Multi-host (process_count >
    1): every host runs an IDENTICAL Loader (same split, same ``opt.seed``
    -> same shuffle order, by construction in ``data/pipeline.py``), so the
    host-side batch is the full global batch on every process; each process
    contributes its own contiguous slice via
    ``make_array_from_process_local_data``.  Slicing by ``process_index``
    keeps the assembled global batch identical to the single-host one —
    feeding the full batch from every host would stitch N duplicate copies
    together instead.
    """
    sharding = NamedSharding(mesh, P("data"))
    n, rank = jax.process_count(), jax.process_index()
    if n > 1:
        def contribute(x):
            x = np.asarray(x)
            return jax.make_array_from_process_local_data(
                sharding, process_slice(x, n, rank),
                global_shape=x.shape)
        return jax.tree_util.tree_map(contribute, batch)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def process_slice(x: np.ndarray, n_processes: int, rank: int) -> np.ndarray:
    """This process's contiguous contribution to a host-identical global
    batch: rows ``[rank*per, (rank+1)*per)``.  Concatenating the slices of
    ranks 0..n-1 reproduces the global batch exactly (tested in
    ``tests/test_sharding.py``); anything else would stitch duplicate
    copies into the assembled global array."""
    lead = x.shape[0]
    if lead % n_processes:
        raise ValueError(
            f"global batch of {lead} not divisible by "
            f"{n_processes} processes")
    per = lead // n_processes
    return x[rank * per:(rank + 1) * per]


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Replicate a pytree (params, banks, ...) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def setup_data_parallel(opt, state: Any):
    """Driver-side data-parallel wiring (replaces the reference's
    ``model = nn.DataParallel(model)``, ``train_test_MT.py:62-64``).

    ``opt.data_parallel``: 0 = off (single device), -1 = all devices,
    N > 0 = first N devices.  Returns ``(state, train_sharding)`` where
    ``train_sharding`` is a batch sharding to hand to ``PrefetchLoader`` (or
    None when off) and ``state`` is replicated over the mesh.
    """
    if not opt.data_parallel:
        return state, None
    mesh = data_mesh(0 if opt.data_parallel < 0 else opt.data_parallel)
    if opt.batch_size % mesh.size:
        raise ValueError(
            f"--batch_size {opt.batch_size} must be divisible by the "
            f"data-parallel mesh size {mesh.size}")
    state = jax.device_put(state, replicated_sharding(mesh))
    return state, batch_sharding(mesh)
