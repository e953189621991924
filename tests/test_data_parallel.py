"""--data_parallel wiring: the full teacher driver trains over the 8-device
virtual CPU mesh with the same loss trajectory as single-device (the
reference's DataParallel path, ``train_test_MT.py:62-64`` / SURVEY §2.7)."""
import numpy as np
import pytest

from multimodal_learning_tpu.config import Options
from multimodal_learning_tpu.data import make_synthetic_splits
from multimodal_learning_tpu.train.loop import train_teacher


def _opt(dp, name):
    return Options(
        mode="pathomic", task="grad", label_dim=3, niter=0, niter_decay=2,
        batch_size=8, input_size_path=32, path_dim=16, omic_dim=16, mmhid=16,
        feat_dim=8, s_dim=16, t_dim=16, CRD_distill=1, pred_distill=1,
        num_teachers=2, pos_mode="exact", nce_p=1, nce_k=8, lr=5e-3,
        verbose=0, checkpoints_dir="/tmp/mml_tpu_test_ckpt", host_workers=2,
        seed=0, reg_type="none", dropout_rate=0.0, data_parallel=dp,
        model_name=name)


def _epoch_losses(model_name):
    import json
    import os
    path = os.path.join("/tmp/mml_tpu_test_ckpt", "grad_15", model_name,
                        "metrics.jsonl")
    rows = [json.loads(l) for l in open(path)]
    return [r["train_loss"] for r in rows if "train_loss" in r]


def test_teacher_data_parallel_matches_single_device():
    import glob
    import os
    for f in glob.glob("/tmp/mml_tpu_test_ckpt/grad_15/dp_t*/metrics.jsonl"):
        os.remove(f)   # JSONL is append-only; drop stale runs
    data = make_synthetic_splits(n_train=32, n_test=16, roi_size=32, seed=7)
    res1, _ = train_teacher(_opt(0, "dp_t1"), data, fold=1)
    res8, _ = train_teacher(_opt(8, "dp_t8"), data, fold=1)
    assert np.isfinite(res8["loss"])
    # same data order / RNG stream on both paths: the sharded run must
    # track the single-device run (global-BN psums and grad reductions are
    # semantically invisible).  Assert on the PER-EPOCH train-loss series,
    # not one end scalar (VERDICT r2 #8), with a tolerance that covers only
    # float-reduction-order drift amplified through Adam.
    s1, s8 = _epoch_losses("dp_t1"), _epoch_losses("dp_t8")
    assert len(s1) == len(s8) >= 2
    for a, b in zip(s1, s8):
        assert b == pytest.approx(a, rel=0.01), (s1, s8)
    assert res8["loss"] == pytest.approx(res1["loss"], rel=0.01)
    assert res8["acc_fuse"] == pytest.approx(res1["acc_fuse"], abs=0.15)


def test_prefetch_loader_shards_and_ragged_fallback():
    """PrefetchLoader with a data Sharding commits divisible batches to the
    mesh and leaves a ragged final eval batch on host (uncommitted), so a
    replicated-params eval_step accepts both (the r3 dp-eval bug)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from multimodal_learning_tpu.data.pipeline import PrefetchLoader

    mesh = Mesh(np.array(jax.devices()), ("data",))
    sh = NamedSharding(mesh, P("data"))
    batches = [{"x": np.ones((8, 4), np.float32)},
               {"x": np.ones((5, 4), np.float32)}]   # ragged tail
    out = list(PrefetchLoader(batches, depth=2, device=sh))
    assert isinstance(out[0]["x"], jax.Array)
    assert out[0]["x"].sharding.is_equivalent_to(sh, 2)
    assert isinstance(out[1]["x"], np.ndarray)       # host fallback
    # both flavours run against replicated params
    params = jax.device_put(jnp.ones(4), NamedSharding(mesh, P()))
    f = jax.jit(lambda p, b: jnp.sum(b["x"] * p))
    assert np.isfinite(float(f(params, out[0])))
    assert np.isfinite(float(f(params, out[1])))


def test_data_parallel_rejects_indivisible_batch():
    data = make_synthetic_splits(n_train=30, n_test=8, roi_size=32, seed=7)
    opt = _opt(8, "dp_bad").replace(batch_size=6)
    with pytest.raises(ValueError, match="divisible"):
        train_teacher(opt, data, fold=1)
