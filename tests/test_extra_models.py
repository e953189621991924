"""MMDynamic reconstruction, decoders, LMF/HFB fusions, recipes."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_learning_tpu.config import Options
from multimodal_learning_tpu.models import (HFBFusion, LMFusion, MMDynamic,
                                            MaxNetDecoder,
                                            PathomicDynamicsModel,
                                            ResnetDecoder, TrilinearFusion,
                                            define_model)

KEY = jax.random.PRNGKey(0)


def test_mmdynamic_loss_and_infer(rng):
    m = MMDynamic(dim_list=(16, 16), hidden_dim=(16,), num_class=3)
    f1 = jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32))
    f2 = jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 3, 4))
    vs = m.init({"params": KEY, "dropout": KEY}, [f1, f2], y, train=True)
    loss, logit, tcp = m.apply(vs, [f1, f2], y, train=True,
                               rngs={"dropout": KEY})
    assert np.isfinite(float(loss)) and logit.shape == (4, 3)
    assert len(tcp) == 2
    out = m.apply(vs, [f1, f2], train=False, infer=True)
    assert out.shape == (4, 3)
    # gradient flows
    g = jax.grad(lambda p: m.apply({"params": p}, [f1, f2], y, train=False)[0]
                 )(vs["params"])
    assert any(float(jnp.abs(x).max()) > 0
               for x in jax.tree_util.tree_leaves(g))


def test_pathomic_dynamics_container(rng):
    model = PathomicDynamicsModel(path_dim=8, omic_dim=8, mmhid=8,
                                  label_dim=3)
    xp = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    xo = jnp.asarray(rng.normal(size=(2, 80)).astype(np.float32))
    y = jnp.asarray([0, 1])
    vs = model.init({"params": KEY, "dropout": KEY}, xp, xo, y, train=False)
    loss, logit, _ = model.apply(vs, xp, xo, y, train=False)
    assert np.isfinite(float(loss)) and logit.shape == (2, 3)
    opt = Options(mode="pathomic", fusion_type="mmdynamics", path_dim=8,
                  omic_dim=8, mmhid=8)
    assert isinstance(define_model(opt), PathomicDynamicsModel)


def test_decoders(rng):
    dec = ResnetDecoder(latent_dim=16)
    z = jnp.asarray(rng.normal(size=(2, 16)).astype(np.float32))
    vs = dec.init(KEY, z, train=False)
    out = dec.apply(vs, z, train=False)
    assert out.shape == (2, 128, 128, 3)
    assert float(jnp.abs(out).max()) <= 1.0  # tanh range

    mdec = MaxNetDecoder(omic_dim=16, output_dim=80)
    vs = mdec.init({"params": KEY, "dropout": KEY}, z, train=False)
    assert mdec.apply(vs, z, train=False).shape == (2, 80)


def test_lmf_hfb_trilinear(rng):
    v1 = jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32))
    v2 = jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32))
    v3 = jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32))
    lmf = LMFusion(dim1=16, dim2=16, mmhid=24, rank=4)
    vs = lmf.init({"params": KEY, "dropout": KEY}, v1, v2, train=False)
    assert lmf.apply(vs, v1, v2, train=False).shape == (4, 24)
    hfb = HFBFusion(dim1=16, dim2=16, mmhid=24, rank=5)
    vs = hfb.init({"params": KEY, "dropout": KEY}, v1, v2, train=False)
    assert hfb.apply(vs, v1, v2, train=False).shape == (4, 24)
    for variant in ("A", "B"):
        tri = TrilinearFusion(variant=variant, dim1=16, dim2=16, dim3=16,
                              mmhid=24)
        vs = tri.init({"params": KEY, "dropout": KEY}, v1, v2, v3,
                      train=False)
        assert tri.apply(vs, v1, v2, v3, train=False).shape == (4, 24)


def test_recipes_resolve():
    from multimodal_learning_tpu.recipes import BASELINE_RECIPES, get_recipe
    assert len(BASELINE_RECIPES) >= 7
    opt = get_recipe("clat_stage2", batch_size=4)
    assert opt.batch_size == 4 and opt.pos_extra == "neighbors"
    assert opt.nce_k == 4096
    with pytest.raises(KeyError):
        get_recipe("nope")


def test_mmdynamics_training_runs(tmp_path, rng):
    """--fusion_type mmdynamics end-to-end (a dead path in the reference)."""
    from multimodal_learning_tpu.data import make_synthetic_splits
    from multimodal_learning_tpu.train.loop import train_teacher
    data = make_synthetic_splits(n_train=16, n_test=8, roi_size=32, seed=13)
    opt = Options(mode="pathomic", fusion_type="mmdynamics", task="grad",
                  model_name="mmd", path_dim=16, omic_dim=16, mmhid=16,
                  input_size_path=32, batch_size=8, niter=0, niter_decay=1,
                  lr=1e-3, verbose=0, checkpoints_dir=str(tmp_path),
                  host_workers=2, reg_type="none", CRD_distill=0,
                  pred_distill=0)
    res, best = train_teacher(opt, data, fold=1)
    assert "acc_fuse" in res and np.isfinite(res["loss"])
