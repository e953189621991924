"""CLAT stage-1 superpixel masking: SLIC, saliency masks, end-to-end."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_learning_tpu.masking import slic_segment
from multimodal_learning_tpu.masking.superpixel import superpixel_attention_mask


def test_slic_labels_valid(rng):
    img = np.clip(rng.normal(128, 40, (96, 96, 3)), 0, 255).astype(np.uint8)
    labels = slic_segment(img, 25)
    assert labels.shape == (96, 96)
    assert labels.min() >= 0 and labels.max() < 25


def test_superpixel_mask_selects_salient_segments():
    """Cost depends only on region A; the path mask must cover A."""
    B, H, W, D = 2, 16, 16, 8
    sp = np.zeros((B, H, W), np.int32)
    sp[:, :, 8:] = 1                     # two segments: left(0) / right(1)
    x_path = jnp.ones((B, H, W, 3))
    x_omic = jnp.ones((B, D))

    def cost_fn(xp, xo):
        # salient: right half of the image, omic feature 3
        return jnp.sum(xp[:, :, 8:, :]) * 0.1 + jnp.sum(xo[:, 3]) * 2.0

    pm, om = superpixel_attention_mask(cost_fn, x_path, x_omic,
                                       jnp.asarray(sp), num_superpixels=2,
                                       path_k=1, omic_k=1)
    np.testing.assert_array_equal(np.asarray(pm[:, :, 8:]), 1.0)
    np.testing.assert_array_equal(np.asarray(pm[:, :, :8]), 0.0)
    assert np.all(np.asarray(om[:, 3]) == 1.0)
    assert float(np.asarray(om).sum()) == B  # exactly one feature per sample


@pytest.mark.smoke
def test_stage1_masking_training_runs(tmp_path):
    """BASELINE config 5 stage 1: masked teacher end-to-end."""
    from multimodal_learning_tpu.config import Options
    from multimodal_learning_tpu.data import make_synthetic_splits
    from multimodal_learning_tpu.train.loop import train_teacher

    data = make_synthetic_splits(n_train=24, n_test=8, roi_size=32, seed=6)
    opt = Options(mode="pathomic", task="grad", model_name="clat1",
                  path_dim=16, omic_dim=16, mmhid=16, input_size_path=32,
                  batch_size=8, niter=0, niter_decay=2, lr=1e-3, verbose=0,
                  checkpoints_dir=str(tmp_path), host_workers=2,
                  reg_type="none", CRD_distill=0, pred_distill=1,
                  masking=1, start_epoch=1, num_superpixels=9,
                  Path_K=2, Omic_K=5)
    res, best = train_teacher(opt, data, fold=1)
    assert np.isfinite(res["loss"])


def test_masking_bn_chain_vs_discard():
    """--masking_bn only changes the BN running-stat trajectory: the loss
    (and therefore gradients) must be identical; the post-step batch_stats
    must differ (chain folds the masked forwards' stats in, reference
    torch semantics)."""
    from multimodal_learning_tpu.config import Options
    from multimodal_learning_tpu.models.factory import define_model
    from multimodal_learning_tpu.train.optim import make_optimizer
    from multimodal_learning_tpu.train.schedules import make_lr_schedule
    from multimodal_learning_tpu.train.steps import (
        build_teacher_train_step, init_teacher_state)

    rng_np = np.random.default_rng(3)
    batch = {
        "path_views": rng_np.integers(0, 255, (4, 4, 32, 32, 3),
                                      dtype=np.uint8),
        "omic": rng_np.normal(size=(4, 80)).astype(np.float32),
        "e": np.ones(4, np.float32),
        "t": rng_np.exponential(20, 4).astype(np.float32),
        "g": rng_np.integers(0, 3, 4).astype(np.int32),
        "index": np.arange(4, dtype=np.int32),
        "sp_mask": rng_np.integers(0, 8, (4, 32, 32), dtype=np.int32),
    }
    results = {}
    for mode in ("chain", "discard"):
        opt = Options(mode="pathomic", task="grad", path_dim=8, omic_dim=8,
                      mmhid=8, input_size_path=32, batch_size=4,
                      CRD_distill=0, pred_distill=1, masking=1,
                      num_superpixels=8, Path_K=2, Omic_K=4,
                      masking_bn=mode, reg_type="none", niter_decay=2,
                      dropout_rate=0.0)
        model = define_model(opt)
        tx = make_optimizer(opt, make_lr_schedule(opt, 4))
        sample = {"x_path": jnp.zeros((1, 32, 32, 3)),
                  "x_omic": jnp.zeros((1, 80))}
        state = init_teacher_state(opt, model, tx, jax.random.PRNGKey(0),
                                   16, sample)
        step = build_teacher_train_step(opt, model, tx, masking=True)
        new_state, m = step(state, jax.device_put(batch),
                            jax.random.PRNGKey(5), jnp.asarray(0.0))
        results[mode] = (float(m["loss"]),
                         np.asarray(new_state.batch_stats["path_net"]["bn1"]
                                    ["mean"]))
    assert results["chain"][0] == pytest.approx(results["discard"][0],
                                                rel=1e-5)
    assert not np.allclose(results["chain"][1], results["discard"][1])


def test_masked_step_restructure_equivalences(rng):
    """The r3 masked-step restructure is semantics-preserving:
    (a) PathomicModel(..., path_feats=<trunk outputs>) == running the trunk
        in-call (trunk has no dropout; train-mode BN) — the m2 reuse;
    (b) the vmapped 2-slice EMA apply == two sequential applies with the
        same input stats (vmap keeps BN batch statistics per slice);
    (c) the closed-form chained running stats == sequentially-applied
        updates (r2' = mom*r1' + r_b - mom*r0 replay)."""
    import jax
    import jax.numpy as jnp

    from multimodal_learning_tpu.models.factory import define_model
    from multimodal_learning_tpu.config import Options

    opt = Options(mode="pathomic", task="grad", path_dim=8, omic_dim=8,
                  mmhid=8, input_size_path=32, dropout_rate=0.25)
    model = define_model(opt)
    k = jax.random.PRNGKey(0)
    xp = jnp.asarray(rng.normal(size=(4, 32, 32, 3)).astype(np.float32))
    xo = jnp.asarray(rng.normal(size=(4, 80)).astype(np.float32))
    variables = model.init({"params": k, "dropout": k}, x_path=xp,
                           x_omic=xo, train=True)
    vars_ = {"params": variables["params"],
             "batch_stats": variables.get("batch_stats", {})}
    kd = jax.random.PRNGKey(7)

    # (a) path_feats reuse == in-call trunk (same dropout key)
    full, mut_full = model.apply(vars_, x_path=xp, x_omic=xo, train=True,
                                 rngs={"dropout": kd},
                                 mutable=["batch_stats"])
    reused, mut_reused = model.apply(
        vars_, x_omic=xo, train=True, rngs={"dropout": kd},
        mutable=["batch_stats"],
        path_feats=(full.path_feat_f3, full.path_feat, full.hazard_path,
                    full.pred_path))
    np.testing.assert_allclose(np.asarray(reused.pred_fuse),
                               np.asarray(full.pred_fuse), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(reused.fuse_feat),
                               np.asarray(full.fuse_feat), rtol=1e-6)

    # (b) vmapped pair == sequential applies from the same input stats
    xq = jnp.asarray(rng.normal(size=(4, 32, 32, 3)).astype(np.float32))
    k1, k2 = jax.random.split(kd)

    def fwd(x, key):
        o, mut = model.apply(vars_, x_path=x, x_omic=xo, train=True,
                             rngs={"dropout": key}, mutable=["batch_stats"])
        return o, mut["batch_stats"]

    pair_o, pair_s = jax.vmap(fwd)(jnp.stack([xp, xq]), jnp.stack([k1, k2]))
    seq1_o, seq1_s = fwd(xp, k1)
    seq2_o, seq2_s = fwd(xq, k2)
    # vmap re-fuses the convs, so summation order differs from the
    # sequential applies — observed drift up to ~1.4e-5 on the CPU backend
    np.testing.assert_allclose(np.asarray(pair_o.pred_fuse[0]),
                               np.asarray(seq1_o.pred_fuse), atol=1e-4)
    np.testing.assert_allclose(np.asarray(pair_o.pred_fuse[1]),
                               np.asarray(seq2_o.pred_fuse), atol=1e-4)

    # (c) closed-form chain replay: running slice-2 FROM slice-1's stats
    # must equal mom*slice1 + slice2 - mom*r0 (linear BN update algebra)
    mom = 0.9
    vars_chained = {"params": variables["params"], "batch_stats": seq1_s}
    _, seq2_chained = model.apply(vars_chained, x_path=xq, x_omic=xo,
                                  train=True, rngs={"dropout": k2},
                                  mutable=["batch_stats"])
    replay = jax.tree_util.tree_map(
        lambda a, b, r: mom * a + b - mom * r,
        seq1_s, seq2_s, vars_["batch_stats"])
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_allclose(np.asarray(x),
                                                np.asarray(y), atol=1e-5),
        seq2_chained["batch_stats"], replay)
