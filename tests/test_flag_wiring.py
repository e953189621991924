"""Round-2 flag wiring: supcon/CRD_gate in the teacher step, SVM and
param-space GK_refine weighting in the student step, teacher_bn modes, and
fail-fast on the reference's unimplemented loss_weighting values."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_learning_tpu.config import Options
from multimodal_learning_tpu.contrast import (contrast_loss,
                                              crd_gate_weights,
                                              weighted_contrast_loss)
from multimodal_learning_tpu.models.factory import define_model
from multimodal_learning_tpu.train.optim import make_optimizer
from multimodal_learning_tpu.train.schedules import make_lr_schedule
from multimodal_learning_tpu.train.steps import (build_teacher_train_step,
                                                 init_teacher_state)
from multimodal_learning_tpu.train.student import (build_student_train_step,
                                                   init_student_state)

SIZE = 32


def _opt(**kw):
    base = dict(mode="pathomic", task="grad", path_dim=8, omic_dim=8,
                mmhid=8, feat_dim=8, input_size_path=SIZE, batch_size=4,
                CRD_distill=1, pred_distill=1, pos_mode="exact", nce_p=1,
                nce_k=8, n_data=64, niter_decay=2, reg_type="none")
    base.update(kw)
    return Options(**base)


def _batch(rng, n_views=2, sample_cols=9):
    b = 4
    out = {
        "path_views": rng.integers(0, 255, (b, n_views, SIZE, SIZE, 3),
                                   dtype=np.uint8),
        "omic": rng.normal(size=(b, 80)).astype(np.float32),
        "e": np.ones(b, np.float32),
        "t": rng.exponential(20, b).astype(np.float32),
        "g": rng.integers(0, 3, b).astype(np.int32),
        "index": np.arange(b, dtype=np.int32),
    }
    if sample_cols:
        out["sample_idx"] = rng.integers(0, 64, (b, sample_cols),
                                         dtype=np.int32)
    return out


def _teacher_setup(opt):
    model = define_model(opt)
    tx = make_optimizer(opt, make_lr_schedule(opt, 4))
    sample = {"x_path": jnp.zeros((1, SIZE, SIZE, 3)),
              "x_omic": jnp.zeros((1, 80))}
    state = init_teacher_state(opt, model, tx, jax.random.PRNGKey(0), 64,
                               sample)
    return model, tx, state


def test_weighted_contrast_loss_matches_gated_sum(rng):
    x = jnp.asarray(np.abs(rng.normal(size=(4, 9))).astype(np.float32))
    w = jnp.asarray([1.0, 0.0, 1.0, 0.0])
    got = weighted_contrast_loss(x, w, n_data=64)
    per = contrast_loss(x, 64, per_sample=True)
    assert float(got) == pytest.approx(
        float(jnp.sum(w * per)) / 4, rel=1e-6)
    s_w, t_w = crd_gate_weights(jnp.asarray([1.0, 2.0]),
                                jnp.asarray([2.0, 1.0]))
    np.testing.assert_array_equal(np.asarray(s_w), [0.0, 1.0])
    np.testing.assert_array_equal(np.asarray(t_w), [1.0, 0.0])


def test_supcon_distill_reaches_teacher_step(rng):
    opt = _opt(supcon_distill=1, supcon_weight=0.5)
    model, tx, state = _teacher_setup(opt)
    step = build_teacher_train_step(opt, model, tx)
    _, metrics = step(state, _batch(rng), jax.random.PRNGKey(1),
                      jnp.asarray(0.1))
    assert np.isfinite(float(metrics["loss_supcon"]))
    assert float(metrics["loss_supcon"]) != 0.0


def test_supcon_surv_fails_fast():
    opt = _opt(supcon_distill=1, task="surv", act_type="Sigmoid",
               label_dim=1)
    model, tx, state = _teacher_setup(opt)
    with pytest.raises(NotImplementedError, match="supcon"):
        build_teacher_train_step(opt, model, tx)


def test_crd_gate_reaches_teacher_step(rng):
    opt = _opt(CRD_gate=True)
    model, tx, state = _teacher_setup(opt)
    step = build_teacher_train_step(opt, model, tx)
    _, metrics = step(state, _batch(rng), jax.random.PRNGKey(1),
                      jnp.asarray(0.1))
    assert np.isfinite(float(metrics["loss_CRD"]))


def _student_setup(opt):
    teacher = define_model(opt)
    k = jax.random.PRNGKey(0)
    tv = teacher.init({"params": k, "dropout": k},
                      x_path=jnp.zeros((1, SIZE, SIZE, 3)),
                      x_omic=jnp.zeros((1, 80)), train=False)
    tvars = {"params": tv["params"],
             "batch_stats": tv.get("batch_stats", {})}
    model = define_model(opt, path_only=True)
    tx = make_optimizer(opt, make_lr_schedule(opt, 4))
    state = init_student_state(opt, model, tx, k, 64, SIZE)
    return model, teacher, tvars, tx, state


@pytest.mark.parametrize("weighting", ["SVM", "GK_refine_param"])
def test_student_loss_weighting_variants(rng, weighting):
    opt = _opt(distill="crd", num_teachers=2, assign_weights=True,
               CE_grads=True, select_pos_mode="hard", pos_mode="multi_pos",
               nce_p=4, nce_p2=2, nce_k=8, nce_k2=4, alpha=1.0, beta=0.02,
               loss_weighting=weighting)
    model, teacher, tvars, tx, state = _student_setup(opt)
    step = build_student_train_step(opt, model, teacher, tvars, tx)
    new_state, metrics = step(state, _batch(rng, sample_cols=12),
                              jax.random.PRNGKey(2), jnp.asarray(0.5))
    assert np.isfinite(float(metrics["loss"]))
    assert np.all(np.isfinite(np.asarray(metrics["scale"])))


def test_student_unknown_weighting_fails_fast():
    opt = _opt(distill="crd", num_teachers=2, assign_weights=True,
               loss_weighting="RLW", pos_mode="multi_pos", nce_p=4,
               nce_p2=2, nce_k=8, nce_k2=4)
    model, teacher, tvars, tx, state = _student_setup(opt)
    with pytest.raises(NotImplementedError, match="RLW"):
        build_student_train_step(opt, model, teacher, tvars, tx)


def test_clat_unknown_weighting_fails_fast():
    from multimodal_learning_tpu.train.student_clat import \
        build_clat_student_step
    opt = _opt(distill="crd", assign_weights=True, loss_weighting="UW")
    model, teacher, tvars, tx, state = _student_setup(opt)
    with pytest.raises(NotImplementedError, match="UW"):
        build_clat_student_step(opt, model, teacher, tvars, tx,
                                np.zeros((3, 64), np.float32))


@pytest.mark.parametrize("mode", ["batch", "running"])
def test_teacher_bn_modes_run(rng, mode):
    opt = _opt(distill="kd", num_teachers=2, teacher_bn=mode)
    model, teacher, tvars, tx, state = _student_setup(opt)
    step = build_student_train_step(opt, model, teacher, tvars, tx)
    _, metrics = step(state, _batch(rng), jax.random.PRNGKey(2),
                      jnp.asarray(0.5))
    assert np.isfinite(float(metrics["loss"]))


# ---------------------------------------------------------------- round 3


@pytest.mark.smoke
def test_options_closure():
    """Every Options field is either consumed somewhere in the package or
    registered in DEAD_FLAGS with a reason (VERDICT r2 #4: no flag may
    parse and silently do nothing without being on the record)."""
    import dataclasses
    import pathlib
    import re

    from multimodal_learning_tpu.config.options import DEAD_FLAGS, Options

    pkg_root = pathlib.Path(
        __import__("multimodal_learning_tpu").__file__).parent
    src = ""
    for p in pkg_root.rglob("*.py"):
        if p.name != "options.py":
            src += p.read_text()
    for extra in ("bench.py", "__graft_entry__.py"):
        q = pkg_root.parent / extra
        if q.exists():
            src += q.read_text()

    missing = []
    for f in dataclasses.fields(Options):
        if f.name in DEAD_FLAGS:
            continue
        pat = re.compile(r"\bopt\.%s\b|\beval_opt\.%s\b|[\"']%s[\"']"
                         % (f.name, f.name, f.name))
        if not pat.search(src):
            missing.append(f.name)
    assert not missing, (
        f"Options fields neither consumed nor in DEAD_FLAGS: {missing}")
    stale = [k for k in DEAD_FLAGS
             if k not in {f.name for f in dataclasses.fields(Options)}]
    assert not stale, f"DEAD_FLAGS entries without an Options field: {stale}"


def test_aekd_v2_gate_per_sample_matches_torch_math(rng):
    """Per-sample AEKD_loss_v2 (sample_KD mode) vs a numpy transliteration
    of the reference (:103-112, :131-136)."""
    from multimodal_learning_tpu.gradweight import aekd_v2_gate

    b, d, n_kd = 8, 16, 3
    kd_grads = [rng.normal(size=(b, d)).astype(np.float32)
                for _ in range(n_kd)]
    ce = rng.normal(size=(b, d)).astype(np.float32)
    kd_losses = [rng.uniform(0.1, 2.0, b).astype(np.float32)
                 for _ in range(n_kd)]

    total = aekd_v2_gate([jnp.asarray(g) for g in kd_grads], jnp.asarray(ce),
                         [jnp.asarray(x) for x in kd_losses],
                         per_sample=True, batch_size=b)

    # reference: per-row cosine(KD grad, CE grad) > 0 gate, then
    # sum(gate * losses) / batch_size
    ref = 0.0
    for g, l in zip(kd_grads, kd_losses):
        num = (g * ce).sum(1)
        den = np.linalg.norm(g, axis=1) * np.linalg.norm(ce, axis=1)
        gate = (num / den > 0).astype(np.float32)
        ref += (gate * l).sum()
    ref /= b
    assert float(total) == pytest.approx(float(ref), rel=1e-5)


def test_sample_kd_step_runs(rng):
    opt = _opt(distill="kd", num_teachers=2, assign_weights=True,
               CE_grads=True, student_customize=True, sample_KD=True,
               alpha=1.0, CRD_distill=0)
    model, teacher, tvars, tx, state = _student_setup(opt)
    step = build_student_train_step(opt, model, teacher, tvars, tx)
    _, metrics = step(state, _batch(rng), jax.random.PRNGKey(2),
                      jnp.asarray(0.5))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["loss_KD"]) >= 0.0


def test_sample_kd_fails_fast_without_customize():
    opt = _opt(distill="kd", num_teachers=2, sample_KD=True)
    model, teacher, tvars, tx, state = _student_setup(opt)
    with pytest.raises(NotImplementedError, match="sample_KD"):
        build_student_train_step(opt, model, teacher, tvars, tx)


def test_plateau_policy_scales_updates():
    """--lr_policy plateau: tracker drops the scale after `patience`
    non-improving epochs and the injected hyperparam shrinks the updates."""
    import optax

    from multimodal_learning_tpu.train.optim import (plateau_scale_of,
                                                     set_plateau_scale)
    from multimodal_learning_tpu.train.schedules import PlateauTracker

    opt = _opt(lr_policy="plateau", lr=0.1, weight_decay=0.0)
    tx = make_optimizer(opt, make_lr_schedule(opt, 4))
    params = {"w": jnp.ones(4)}
    st = tx.init(params)
    grads = {"w": jnp.ones(4)}

    _, st1 = tx.update(grads, st, params)
    up_full, _ = tx.update(grads, st, params)

    # 1 improving epoch then 6 flat ones -> factor 0.2 (patience 5)
    tracker = PlateauTracker()
    scale = tracker.step(1.0)
    for _ in range(6):
        scale = tracker.step(1.0)
    assert scale == pytest.approx(0.2)

    st_scaled = set_plateau_scale(st, scale)
    assert plateau_scale_of(st_scaled) == pytest.approx(0.2)
    up_scaled, _ = tx.update(grads, st_scaled, params)
    ratio = float(up_scaled["w"][0] / up_full["w"][0])
    assert ratio == pytest.approx(0.2, rel=1e-5)


def test_plateau_loop_smoke(tmp_path):
    """End-to-end: the teacher loop runs under --lr_policy plateau."""
    from multimodal_learning_tpu.data import make_synthetic_splits
    from multimodal_learning_tpu.train.loop import train_teacher

    data = make_synthetic_splits(n_train=16, n_test=8, roi_size=32, seed=3)
    opt = Options(mode="omic", task="grad", model_name="plat", omic_dim=8,
                  input_size_path=32, batch_size=8, lr=1e-3, verbose=0,
                  checkpoints_dir=str(tmp_path), host_workers=2,
                  reg_type="none", CRD_distill=0, pred_distill=0,
                  lr_policy="plateau", niter=0, niter_decay=2)
    res, _ = train_teacher(opt, data, fold=1)
    assert np.isfinite(res["loss"])


def test_init_type_reinit(rng):
    from multimodal_learning_tpu.models.common import apply_init_type

    params = {
        "conv1": {"kernel": jnp.asarray(
            rng.normal(size=(3, 3, 4, 8)).astype(np.float32)),
            "bias": jnp.ones(8)},
        "bn1": {"scale": jnp.ones(8) * 0.5, "bias": jnp.ones(8)},
        "fc": {"kernel": jnp.asarray(
            rng.normal(size=(8, 3)).astype(np.float32)),
            "bias": jnp.ones(3)},
    }
    k = jax.random.PRNGKey(0)
    # max / none: untouched
    same = apply_init_type(k, params, "max", 0.02)
    assert float(jnp.abs(same["conv1"]["kernel"]
                         - params["conv1"]["kernel"]).max()) == 0.0
    # orthogonal: kernels re-drawn, biases zeroed, BN scale ~ N(1, gain)
    out = apply_init_type(k, params, "orthogonal", 0.5)
    assert float(jnp.abs(out["fc"]["kernel"]
                         - params["fc"]["kernel"]).max()) > 0.0
    np.testing.assert_allclose(np.asarray(out["fc"]["bias"]), 0.0)
    np.testing.assert_allclose(np.asarray(out["conv1"]["bias"]), 0.0)
    assert abs(float(out["bn1"]["scale"].mean()) - 1.0) < 0.5
    np.testing.assert_allclose(np.asarray(out["bn1"]["bias"]), 0.0)
    # orthogonality of the fc kernel (gain 1)
    out1 = apply_init_type(k, params, "orthogonal", 1.0)
    ktk = np.asarray(out1["fc"]["kernel"].T @ out1["fc"]["kernel"])
    np.testing.assert_allclose(ktk, np.eye(3), atol=1e-5)
    # unknown type fails fast
    with pytest.raises(NotImplementedError):
        apply_init_type(k, params, "bogus", 0.02)


def test_split_pickle_path_naming():
    from multimodal_learning_tpu.data.splits import split_pickle_path

    opt = Options(dataroot="/d")
    assert split_pickle_path(opt).endswith(
        "splits_5cv_2022/gbmlgg5cv_all_st_1_1_0.pkl")
    assert split_pickle_path(opt, patches=True).endswith(
        "gbmlgg5cv_all_st_patches_512_1_1_0.pkl")
    opt2 = Options(dataroot="/d", use_vgg_features=1, use_rnaseq=1)
    assert split_pickle_path(opt2).endswith(
        "gbmlgg5cv_all_st_patches_512_1_1_1_rnaseq.pkl")
