"""Coverage for selection modes, survival pathomic flow, patch-loader
switching, loader determinism, and sampler modes."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_learning_tpu.config import Options
from multimodal_learning_tpu.contrast import crd_scores_select, init_bank
from multimodal_learning_tpu.data import make_synthetic_splits
from multimodal_learning_tpu.data.pipeline import Loader, PathomicDataset
from multimodal_learning_tpu.data.sampling import ContrastSampler, omic_transform


@pytest.mark.parametrize("mode", ["mid", "random", "curriculum"])
def test_crd_select_pos_modes(rng, mode):
    n, d, b, P, K, P2, K2 = 256, 8, 4, 120, 30, 5, 10
    bank = init_bank(jax.random.PRNGKey(0), n, d)
    v = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    y = jnp.asarray(np.arange(b, dtype=np.int32))
    idx = jnp.asarray(np.stack([rng.choice(n, P + K, replace=False)
                                for _ in range(b)]).astype(np.int32))
    out_v1, out_v2, _, _ = crd_scores_select(
        bank, v, v, y, idx, P=P, K=K, P2=P2, K2=K2,
        select_pos_mode=mode, epoch_frac=0.5,
        rng=jax.random.PRNGKey(3))
    assert out_v1.shape == (b, P2 + K2)
    assert np.all(np.isfinite(np.asarray(out_v1)))


def test_sampler_modes(rng):
    labels = rng.integers(0, 3, 60)
    for pos_mode in ("exact", "relax", "multi_pos"):
        s = ContrastSampler(labels, 3, "grad", nce_p=5, nce_k=10,
                            pos_mode=pos_mode)
        out = s.draw_batch(np.arange(8))
        assert out.shape == (8, s.sample_width)
        if pos_mode == "multi_pos":
            assert np.all(out[:, 0] == np.arange(8))  # anchor pinned
            # positives same class as anchor
            for i in range(8):
                assert np.all(labels[out[i, :5]] == labels[i])
    # surv mode: negatives exclude the anchor
    s = ContrastSampler(labels, 3, "surv", nce_p=1, nce_k=10,
                        pos_mode="exact")
    out = s.draw_batch(np.arange(8))
    for i in range(8):
        assert i not in out[i, 1:]


def test_omic_transform_modes(rng):
    x = rng.normal(size=(8, 20)).astype(np.float32)
    d = omic_transform(x, "drop", rate=0.5, rng=np.random.default_rng(0))
    # dropped entries are exactly zero, kept entries unchanged
    mask = d == 0
    assert 0.2 < mask.mean() < 0.8
    np.testing.assert_allclose(d[~mask], x[~mask])
    v = omic_transform(x, "vime", rate=0.5, rng=np.random.default_rng(0))
    assert v.shape == x.shape and not np.allclose(v, x)


def test_loader_determinism_and_coverage():
    data = make_synthetic_splits(n_train=20, n_test=10, roi_size=32, seed=9)
    opt = Options(mode="pathomic", input_size_path=32, batch_size=4,
                  label_dim=3)
    ds = PathomicDataset(opt, data["cv_splits"][1], "train", train=True)
    l1 = Loader(ds, 4, shuffle=True, drop_last=True, n_views=2, workers=2,
                seed=7)
    l2 = Loader(ds, 4, shuffle=True, drop_last=True, n_views=2, workers=2,
                seed=7)
    b1 = [b["index"] for b in l1]
    b2 = [b["index"] for b in l2]
    assert len(b1) == 5
    np.testing.assert_array_equal(np.concatenate(b1), np.concatenate(b2))
    # epoch 2 differs (shuffle advances)
    b1b = [b["index"] for b in l1]
    assert not np.array_equal(np.concatenate(b1), np.concatenate(b1b))
    # all samples covered once per epoch
    assert sorted(np.concatenate(b1).tolist()) == list(range(20))


def test_surv_pathomic_training(tmp_path):
    """Cox losses through the full 3-branch pathomic teacher."""
    from multimodal_learning_tpu.train.loop import train_teacher
    data = make_synthetic_splits(n_train=24, n_test=8, roi_size=32, seed=10)
    opt = Options(mode="pathomic", task="surv", act_type="Sigmoid",
                  label_dim=1, model_name="survp", path_dim=16, omic_dim=16,
                  mmhid=16, input_size_path=32, batch_size=8, niter=0,
                  niter_decay=1, lr=1e-3, verbose=0,
                  checkpoints_dir=str(tmp_path), host_workers=2,
                  reg_type="none", CRD_distill=0, pred_distill=1)
    res, best = train_teacher(opt, data, fold=1)
    for name in ("fuse", "path", "omic"):
        assert 0.0 <= res[f"cindex_{name}"] <= 1.0
    assert "pvalue" in res


def test_patch_loader_switch(tmp_path):
    """Last-15-epochs patch-loader switch (train_test_MT.py:287-289): with a
    9-patch test split, the final eval must see 9x the samples."""
    from multimodal_learning_tpu.train.loop import train_teacher
    data = make_synthetic_splits(n_train=16, n_test=4, roi_size=32, seed=11)
    patches = make_synthetic_splits(n_train=16, n_test=4, roi_size=32,
                                    seed=11, patches_per_roi=9)
    opt = Options(mode="omic", task="grad", model_name="psw", omic_dim=8,
                  input_size_path=32, batch_size=8, niter=0, niter_decay=2,
                  verbose=0, checkpoints_dir=str(tmp_path), host_workers=2,
                  reg_type="none", CRD_distill=0, pred_distill=0)
    res, best = train_teacher(opt, data, fold=1, patches_data=patches)
    assert res["n"] == 4 * 9  # evaluated on the patches loader


def test_freeze_mask_and_optimizer(rng):
    import jax
    import jax.numpy as jnp
    import optax
    from multimodal_learning_tpu.train.freeze import (count_frozen,
                                                      freeze_mask,
                                                      masked_optimizer)
    params = {"omic_net": {"w": jnp.ones((4, 4))},
              "path_net": {"w": jnp.ones((4, 4))}}
    mask = freeze_mask(params, ["omic_net"])
    assert mask["omic_net"]["w"] is False and mask["path_net"]["w"] is True
    assert count_frozen(params, ["omic_net"]) == 16
    tx = masked_optimizer(optax.sgd(0.1), params, ["omic_net"])
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    assert float(jnp.abs(updates["omic_net"]["w"]).max()) == 0.0
    assert float(jnp.abs(updates["path_net"]["w"]).max()) > 0.0
