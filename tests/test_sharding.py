"""Multi-device data-parallel tests on the virtual 8-CPU mesh.

Verifies that the jitted teacher train step produces the same loss whether
the batch lives on one device or is sharded over the mesh — i.e. the global
BatchNorm / gradient psums XLA inserts are semantically invisible (the
replacement for torch DataParallel, SURVEY §2.7).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multimodal_learning_tpu.config import Options
from multimodal_learning_tpu.models.factory import define_model
from multimodal_learning_tpu.train.optim import make_optimizer
from multimodal_learning_tpu.train.schedules import make_lr_schedule
from multimodal_learning_tpu.train.steps import (build_teacher_train_step,
                                                 init_teacher_state)


def _setup(batch):
    opt = Options(mode="pathomic", task="grad", path_dim=8, omic_dim=8,
                  mmhid=8, feat_dim=8, input_size_path=32, batch_size=batch,
                  CRD_distill=1, pred_distill=1, pos_mode="exact", nce_p=1,
                  nce_k=8, n_data=64, reg_type="none", dropout_rate=0.0,
                  niter_decay=2)
    model = define_model(opt)
    tx = make_optimizer(opt, make_lr_schedule(opt, 4))
    sample = {"x_path": jnp.zeros((1, 32, 32, 3)),
              "x_omic": jnp.zeros((1, 80))}
    state = init_teacher_state(opt, model, tx, jax.random.PRNGKey(0), 64,
                               sample)
    step = build_teacher_train_step(opt, model, tx)
    rng = np.random.default_rng(0)
    batch_host = {
        "path_views": rng.integers(0, 255, (batch, 2, 32, 32, 3),
                                   dtype=np.uint8),
        "omic": rng.normal(size=(batch, 80)).astype(np.float32),
        "e": np.ones(batch, np.float32),
        "t": rng.exponential(20, batch).astype(np.float32),
        "g": rng.integers(0, 3, batch).astype(np.int32),
        "index": np.arange(batch, dtype=np.int32),
        "sample_idx": rng.integers(0, 64, (batch, 9), dtype=np.int32),
    }
    return opt, state, step, batch_host


def test_sharded_step_matches_single_device():
    batch = 16
    opt, state, step, batch_host = _setup(batch)
    key = jax.random.PRNGKey(7)
    cw = jnp.asarray(0.1)

    # single-device run, two steps
    state1, m1 = step(state, jax.device_put(batch_host), key, cw)
    bank1_step1 = np.asarray(state1.banks["fuse"].memory_v1)
    state1, m1b = step(state1, jax.device_put(batch_host), key, cw)

    # sharded run over all 8 virtual devices, two steps
    opt, state, step, _ = _setup(batch)
    mesh = Mesh(np.array(jax.devices()), ("data",))
    shard = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    state = jax.device_put(state, repl)
    batch_dev = {k: jax.device_put(v, shard) for k, v in batch_host.items()}
    state8, m8 = step(state, batch_dev, key, cw)
    bank8_step1 = np.asarray(state8.banks["fuse"].memory_v1)
    state8, m8b = step(state8, batch_dev, key, cw)

    # the loss trajectory must match: step-1 loss is a pure function of the
    # (replicated) init, step-2 loss additionally goes through the full
    # update (grads psum'd across shards, global BN, bank update).  Exact
    # param comparison is meaningless here: Adam's first step is sign-like,
    # so any float-reduction-order difference on a ~0 gradient flips a full
    # lr-sized step on a weight that doesn't affect the loss.
    assert float(m1["loss"]) == pytest.approx(float(m8["loss"]), rel=2e-4)
    assert float(m1b["loss"]) == pytest.approx(float(m8b["loss"]), rel=5e-3)
    # CRD banks identical after step 1 (pure gather/scatter, no
    # reductions); after step 2 they inherit the Adam sign-amplification
    # divergence on ~zero-grad params, so only step 1 is exact
    np.testing.assert_allclose(bank1_step1, bank8_step1, rtol=1e-3,
                               atol=1e-4)


def test_dryrun_multichip_entrypoint():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "graft_entry", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)
