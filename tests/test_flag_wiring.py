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
