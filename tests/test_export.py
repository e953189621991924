"""Serving export (StableHLO via jax.export): round-trip parity.

The artifact must reproduce the in-process eval forward bit-for-bit when
reloaded through ``serve.load_exported`` (same backend, same math), and the
CLI must produce a loadable artifact from a reference-layout fold
checkpoint."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_learning_tpu.config import Options
from multimodal_learning_tpu.models.factory import define_model
from multimodal_learning_tpu.serve import (export_infer, load_exported,
                                           make_infer_fn)

SIZE = 64
BATCH = 4


def _opt(**kw):
    base = dict(mode="pathomic", task="grad", input_size_path=SIZE,
                batch_size=BATCH, label_dim=3, synthetic_data=True)
    base.update(kw)
    return Options(**base)


def _init(opt, model, rng):
    v = model.init({"params": rng, "dropout": rng},
                   x_path=jnp.zeros((1, SIZE, SIZE, 3)),
                   x_omic=jnp.zeros((1, opt.input_size_omic)), train=False)
    return v["params"], v.get("batch_stats", {})


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    x_path = rng.integers(0, 255, (BATCH, SIZE, SIZE, 3), dtype=np.uint8)
    x_omic = rng.normal(size=(BATCH, 80)).astype(np.float32)
    return x_path, x_omic


def test_export_round_trip_matches_direct_forward():
    opt = _opt()
    model = define_model(opt)
    params, stats = _init(opt, model, jax.random.PRNGKey(0))
    x_path, x_omic = _inputs()

    direct = jax.jit(make_infer_fn(opt, model, params, stats))(
        x_path, x_omic)
    blob, outputs = export_infer(opt, model, params, stats, BATCH)
    served = load_exported(blob)(x_path, x_omic)

    assert set(served) == set(direct)
    assert {"pred_fuse", "pred_path", "pred_omic"} <= set(direct)
    for k in direct:
        np.testing.assert_array_equal(np.asarray(served[k]),
                                      np.asarray(direct[k]))
        assert served[k].dtype == np.float32


def test_export_surv_task_emits_hazards():
    opt = _opt(task="surv", label_dim=1)
    model = define_model(opt)
    params, stats = _init(opt, model, jax.random.PRNGKey(1))
    blob, outputs = export_infer(opt, model, params, stats, BATCH)
    x_path, x_omic = _inputs(1)
    served = load_exported(blob)(x_path, x_omic)
    assert {"hazard_fuse", "hazard_path", "hazard_omic"} <= set(served)
    assert served["hazard_fuse"].shape == (BATCH, 1)


def test_export_cli_from_fold_checkpoint(tmp_path):
    """cli.export_model finds the fold's _best checkpoint, writes the
    .stablehlo + manifest, and the artifact serves."""
    from multimodal_learning_tpu.cli import export_model
    from multimodal_learning_tpu.utils.checkpoint import save_checkpoint

    opt = _opt(checkpoints_dir=str(tmp_path), exp_name="e",
               model_name="m", export_batch=2)
    model = define_model(opt)
    params, stats = _init(opt, model, jax.random.PRNGKey(2))
    ckpt_dir = os.path.join(str(tmp_path), "e", "m")
    save_checkpoint(os.path.join(ckpt_dir, "m_1_best.pt"),
                    {"model_state_dict": params, "batch_stats": stats,
                     "opt": opt})

    written = export_model.main(
        ["--checkpoints_dir", str(tmp_path), "--exp_name", "e",
         "--model_name", "m", "--mode", "pathomic", "--task", "grad",
         "--input_size_path", str(SIZE), "--batch_size", str(BATCH),
         "--label_dim", "3", "--export_batch", "2"])
    assert written == [os.path.join(ckpt_dir, "m_1.stablehlo")]
    assert os.path.exists(written[0] + ".json")

    import json
    man = json.load(open(written[0] + ".json"))
    assert man["inputs"]["x_path"] == f"uint8[2,{SIZE},{SIZE},3]"
    assert "pred_fuse" in man["outputs"]

    fn = load_exported(open(written[0], "rb").read())
    rng = np.random.default_rng(3)
    out = fn(rng.integers(0, 255, (2, SIZE, SIZE, 3), dtype=np.uint8),
             rng.normal(size=(2, 80)).astype(np.float32))
    assert out["pred_fuse"].shape == (2, 3)
    assert np.isfinite(np.asarray(out["pred_fuse"])).all()


def test_export_rejects_wrong_shape():
    opt = _opt()
    model = define_model(opt)
    params, stats = _init(opt, model, jax.random.PRNGKey(0))
    blob, outputs = export_infer(opt, model, params, stats, BATCH)
    fn = load_exported(blob)
    x_path, x_omic = _inputs()
    with pytest.raises(Exception):
        fn(x_path[:2], x_omic[:2])  # artifact is fixed-shape by design


def test_export_refuses_test_augment_configs():
    """--test_augment evals go through random augmentation; a deterministic
    artifact cannot reproduce them, so export fails fast."""
    opt = _opt(test_augment=True)
    model = define_model(opt)
    params, stats = _init(opt, model, jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="test_augment"):
        export_infer(opt, model, params, stats, BATCH)


def test_export_cli_prefers_checkpoint_opt(tmp_path):
    """The checkpoint's saved opt is the source of truth for the exported
    forward: CLI flags that disagree on shape-invariant arch knobs must not
    change the artifact (only --export_batch is taken from the CLI)."""
    from multimodal_learning_tpu.cli import export_model
    from multimodal_learning_tpu.utils.checkpoint import save_checkpoint

    opt = _opt(checkpoints_dir=str(tmp_path), exp_name="e", model_name="m")
    model = define_model(opt)
    params, stats = _init(opt, model, jax.random.PRNGKey(4))
    ckpt_dir = os.path.join(str(tmp_path), "e", "m")
    save_checkpoint(os.path.join(ckpt_dir, "m_1_best.pt"),
                    {"model_state_dict": params, "batch_stats": stats,
                     "opt": opt})

    # act_type Tanh would change the forward without changing param shapes;
    # the CLI must export the checkpoint's act_type (LSM default)
    written = export_model.main(
        ["--checkpoints_dir", str(tmp_path), "--exp_name", "e",
         "--model_name", "m", "--mode", "pathomic", "--task", "grad",
         "--input_size_path", str(SIZE), "--batch_size", str(BATCH),
         "--label_dim", "3", "--act_type", "Tanh", "--export_batch",
         str(BATCH)])
    served = load_exported(open(written[0], "rb").read())
    direct = jax.jit(make_infer_fn(opt, model, params, stats))(*_inputs(5))
    out = served(*_inputs(5))
    for k in direct:
        np.testing.assert_array_equal(np.asarray(out[k]),
                                      np.asarray(direct[k]))

    import json
    man = json.load(open(written[0] + ".json"))
    assert man["opt"]["act_type"] == opt.act_type  # provenance is truthful


def test_export_dynamic_batch_serves_any_size():
    """batch_size='dynamic' exports a batch-polymorphic artifact: one blob,
    called at two different batch sizes, each matching the direct forward."""
    opt = _opt()
    model = define_model(opt)
    params, stats = _init(opt, model, jax.random.PRNGKey(2))
    blob, outputs = export_infer(opt, model, params, stats, "dynamic")
    fn = load_exported(blob)
    direct = jax.jit(make_infer_fn(opt, model, params, stats))

    rng = np.random.default_rng(7)
    for b in (2, 5):
        x_path = rng.integers(0, 255, (b, SIZE, SIZE, 3), dtype=np.uint8)
        x_omic = rng.normal(size=(b, 80)).astype(np.float32)
        served = fn(x_path, x_omic)
        want = direct(x_path, x_omic)
        assert set(served) == set(want)
        for k in want:
            assert served[k].shape[0] == b
            np.testing.assert_allclose(np.asarray(served[k]),
                                       np.asarray(want[k]),
                                       rtol=1e-6, atol=1e-6)


def test_export_pallas_recipe_stays_cross_platform(monkeypatch):
    """A pallas_fusion recipe (recipes/baseline.py sets "train"; bench uses
    it) must still export a ("cpu","tpu") artifact: the TPU Pallas kron
    kernel cannot lower for the CPU platform, so export_infer reroutes the
    forward through the einsum path — identical params, exact math.

    MML_PALLAS_FORCE=1 makes _KronEncoder1._pallas_ok() return True on the
    CPU backend, reproducing what the TPU default backend sees at bench
    time (bench_serve hit exactly this: "Only interpret mode is supported
    on CPU backend")."""
    opt = _opt(pallas_fusion="train")
    model = define_model(opt)
    # init before forcing: _KronEncoder1 owns the same kernel/bias params on
    # both paths, and the pallas path cannot RUN on this CPU backend.
    params, stats = _init(opt, model, jax.random.PRNGKey(3))
    x_path, x_omic = _inputs(3)

    monkeypatch.setenv("MML_PALLAS_FORCE", "1")
    blob, outputs = export_infer(opt, model, params, stats, BATCH)
    served = load_exported(blob)(x_path, x_omic)

    opt_off = _opt(pallas_fusion="off")
    want = jax.jit(make_infer_fn(opt_off, define_model(opt_off), params,
                                 stats))(x_path, x_omic)
    assert set(served) == set(want)
    for k in want:
        np.testing.assert_array_equal(np.asarray(served[k]),
                                      np.asarray(want[k]))
