"""Teacher training/eval loops — reference ``train_test_MT.py`` train()/test()
and the fold driver ``train_cv_MT.py``.

The hot loop is one jitted step (see ``steps.py``); everything here is host
orchestration: epoch scheduling, the CRD-weight drop at epoch 15
(``train_test_MT.py:118-119``), patch-loader switch for the last 15 epochs
(``:287-289``), best-checkpoint selection by fused test accuracy after epoch
15 (``:295-307``), and metric aggregation.
"""
from __future__ import annotations

import os
import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.pipeline import Loader, PathomicDataset, PrefetchLoader
from ..eval.metrics import (accuracy_cox, concordance_index, cox_log_rank,
                            grading_metrics, one_hot)
from ..models.factory import define_model
from ..utils.checkpoint import (load_train_state, save_checkpoint,
                                save_train_state)
from ..utils.logging import MetricsLogger
from .optim import make_optimizer
from .schedules import make_lr_schedule
from .steps import (build_eval_step, build_mmdynamics_train_step,
                    build_teacher_train_step, init_teacher_state)


def _sample_shapes(opt):
    s = opt.input_size_path
    shapes = {}
    if opt.mode in ("path", "pathomic"):
        shapes["x_path"] = jnp.zeros((1, s, s, 3), jnp.float32)
    if opt.mode in ("omic", "pathomic"):
        shapes["x_omic"] = jnp.zeros((1, opt.input_size_omic), jnp.float32)
    return shapes


def evaluate(opt, eval_step, params, batch_stats, loader, key,
             sharding=None) -> Dict:
    """reference ``test()`` (``train_test_MT.py:340-458``): accumulates
    per-branch probabilities / risks, returns losses + metrics + the
    ``pred_test`` list used by offline analysis.

    ``sharding``: the data sharding when the caller's state is replicated
    over a ``--data_parallel`` mesh — eval batches must be committed to the
    same mesh (a device-0 batch against 8-device params is an error).
    Multi-host: eval runs redundantly on every host from uncommitted host
    batches (params are replicated, so outputs are too, and the final
    ``device_get`` stays addressable; sharded outputs would not be)."""
    probs = {"fuse": [], "path": [], "omic": []}
    feats = {"fuse": [], "path": [], "omic": []}
    loss_parts = []
    gts, times, events = [], [], []
    n_batches = 0
    feat_fields = {"fuse": "fuse_feat", "path": "path_feat",
                   "omic": "omic_feat"}
    # Device outputs are only *collected* inside the loop — no float()/
    # np.asarray per batch, which on the tunnel costs a ~25 ms blocking sync
    # each and serialises the eval steps (VERDICT r2 #7).  One device_get at
    # the end fetches everything and lets the steps pipeline.  H2D is
    # pipelined too: plain Loaders get wrapped in a 2-deep PrefetchLoader.
    from ..data.pipeline import Loader as _HostLoader
    from ..data.pipeline import PrefetchLoader as _Prefetch
    if jax.process_count() > 1:
        sharding = None          # host batches; see docstring
    elif isinstance(loader, _HostLoader):
        loader = _Prefetch(loader, depth=2, device=sharding)
    for batch in loader:
        key, sub = jax.random.split(key)
        out, parts = eval_step(params, batch_stats, batch, sub)
        n_batches += 1
        for name in probs:
            pred = getattr(out, f"pred_{name}")
            if pred is not None:
                probs[name].append(pred)
            feat = getattr(out, feat_fields[name])
            if feat is not None:
                feats[name].append(feat)
        loss_parts.append(parts)
        gts.append(batch["g"])
        times.append(batch["t"])
        events.append(batch["e"])

    probs, feats, loss_parts, gts, times, events = jax.device_get(
        (probs, feats, loss_parts, gts, times, events))
    gts = [np.asarray(g) for g in gts]
    times = [np.asarray(t) for t in times]
    events = [np.asarray(e) for e in events]
    losses = {name: float(sum(np.asarray(p[f"loss_{name}"])
                              for p in loss_parts))
              for name in ("fuse", "path", "omic")} if loss_parts else \
        {"fuse": 0.0, "path": 0.0, "omic": 0.0}
    gt = np.concatenate(gts)
    t_all = np.concatenate(times)
    e_all = np.concatenate(events)
    res: Dict = {"gt": gt, "n": len(gt)}
    probs = {k: (np.concatenate(v) if v else None) for k, v in probs.items()}
    res["probs"] = probs
    # per-branch features (reference test() feats_test, train_test_MT.py:455)
    res["feats"] = {k: (np.concatenate(v) if v else None)
                    for k, v in feats.items()}
    for name in ("fuse", "path", "omic"):
        res[f"loss_{name}"] = losses[name] / max(n_batches, 1)
    res["loss"] = sum(losses.values()) / max(n_batches, 1)

    if opt.task == "grad":
        oh = one_hot(gt, opt.label_dim)
        for name, p in probs.items():
            if p is None:
                continue
            res[f"acc_{name}"] = float((np.argmax(p, 1) == gt).mean())
            res[f"metrics_{name}"] = grading_metrics(oh, p)
    else:
        for name, p in probs.items():
            if p is None:
                continue
            risk = p.reshape(-1)
            res[f"cindex_{name}"] = concordance_index(t_all, -risk, e_all)
        risk_main = (probs["fuse"] if probs["fuse"] is not None
                     else next(p for p in probs.values() if p is not None))
        risk_main = risk_main.reshape(-1)
        res["pvalue"] = cox_log_rank(risk_main, e_all, t_all)
        res["surv_acc"] = accuracy_cox(risk_main, e_all)
    # pred_test layout parity (train_test_MT.py:452-453)
    risk = {k: (p.reshape(-1) if (p is not None and opt.task == "surv")
                else np.array([])) for k, p in probs.items()}
    res["pred_test"] = [risk["fuse"], risk["path"], risk["omic"], t_all,
                        e_all, probs["fuse"], probs["path"], probs["omic"],
                        gt]
    return res


def train_teacher(opt, data: Dict, fold: int,
                  patches_data: Optional[Dict] = None,
                  log=print) -> Tuple[Dict, Dict]:
    """One fold of teacher training.  Returns (final_eval, best_info)."""
    split = data["cv_splits"][fold]
    need_contrast = opt.CRD_distill == 1 or opt.distill == "crd"
    use_masking = bool(opt.masking) and opt.mode == "pathomic"
    train_ds = PathomicDataset(
        opt, split, "train", train=True, contrast=need_contrast,
        superpixels=opt.num_superpixels if use_masking else 0)
    test_ds = PathomicDataset(opt, split, "test", train=False)
    # stage-1 masking needs 4 views: student, EMA, and the two extra EMA
    # views distilled against the masked student forwards
    # (data_loaders_MT_SP.py:446-453)
    train_loader = Loader(train_ds, opt.batch_size, shuffle=True,
                          drop_last=True, n_views=4 if use_masking else 2,
                          workers=opt.host_workers, seed=opt.seed + fold)
    test_loader = Loader(test_ds, opt.batch_size, shuffle=False,
                         drop_last=False, n_views=1,
                         workers=opt.host_workers, seed=opt.seed)
    patches_loader = None
    if patches_data is not None:
        psplit = patches_data["cv_splits"][fold]
        patches_ds = PathomicDataset(opt, psplit, "test", train=False)
        patches_loader = Loader(patches_ds, opt.batch_size, shuffle=False,
                                drop_last=False, n_views=1,
                                workers=opt.host_workers, seed=opt.seed)

    n_data = len(train_ds)
    opt = opt.replace(n_data=n_data)
    steps_per_epoch = len(train_loader)
    model = define_model(opt)
    lr_schedule = make_lr_schedule(opt, steps_per_epoch)
    tx = make_optimizer(opt, lr_schedule)

    rng = jax.random.PRNGKey(opt.seed + fold)
    rng, k_init = jax.random.split(rng)
    state = init_teacher_state(opt, model, tx, k_init, n_data,
                               _sample_shapes(opt))
    from ..models.common import count_parameters
    log("Number of Trainable Parameters: %d"
        % count_parameters(state.params))
    if opt.mode == "pathomic" and opt.fusion_type == "mmdynamics":
        train_step = build_mmdynamics_train_step(opt, model, tx)
    else:
        train_step = build_teacher_train_step(opt, model, tx)
    masked_step = (build_teacher_train_step(opt, model, tx, masking=True)
                   if use_masking else None)
    eval_step = build_eval_step(opt, model)

    total_epochs = opt.niter + opt.niter_decay
    best = {"acc": 0.0, "epoch": -1}
    ckpt_dir = os.path.join(opt.checkpoints_dir, opt.exp_name, opt.model_name)
    mlog = MetricsLogger(ckpt_dir, run_name=f"teacher_fold{fold}")
    final_eval = None

    # mid-fold resume from the latest snapshot (full train state incl.
    # optimizer/EMA/banks — a capability the reference lacks, SURVEY §5)
    snap_path = os.path.join(ckpt_dir, f"{opt.model_name}_{fold}_state.snap")
    start_epoch = opt.epoch_count
    snap_extra = None
    if opt.resume and os.path.exists(snap_path):
        state, done_epoch, snap_extra = load_train_state(
            snap_path, state, with_extra=True)
        start_epoch = done_epoch + 1
        log(f"[fold {fold}] resumed from epoch {done_epoch}")

    # --data_parallel: replicate state over a 1-D mesh, shard batches over it
    # (the DataParallel replacement, train_test_MT.py:62-64 / SURVEY §2.7)
    from ..parallel.mesh import setup_data_parallel
    state, train_sharding = setup_data_parallel(opt, state)

    from .schedules import PlateauTracker
    plateau = PlateauTracker() if opt.lr_policy == "plateau" else None
    if plateau is not None and snap_extra and "plateau" in snap_extra:
        # --resume: keep the reduced-LR tracker state (a fresh tracker
        # would write scale=1.0 back after the first post-resume epoch)
        plateau.load_state_dict(snap_extra["plateau"])

    for epoch in range(start_epoch, total_epochs + 1):
        crd_weight = 0.01 if epoch >= 15 else opt.CRD_weight
        t0 = time.time()
        agg: Dict[str, float] = {}
        n_samples = 0
        use_tsvd = opt.tSVD_loss and opt.mode == "pathomic"
        # masking kicks in after start_epoch (train_test_MT_SP_Masking.py:199)
        step_fn = (masked_step if use_masking and epoch > opt.start_epoch
                   else train_step)
        for batch_idx, batch in enumerate(
                PrefetchLoader(train_loader, depth=opt.prefetch_depth,
                               device=train_sharding)):
            if use_tsvd:
                batch = dict(batch)
                # host numpy scalar: uncommitted, so jit replicates it over
                # whatever mesh the state lives on
                batch["tsvd_update"] = np.asarray(
                    batch_idx % opt.aux_iter == 0)
            rng, sub = jax.random.split(rng)
            state, metrics = step_fn(state, batch, sub,
                                     jnp.asarray(crd_weight))
            n_samples += opt.batch_size
            for k, v in metrics.items():
                if k.startswith(("loss", "correct")):
                    agg[k] = agg.get(k, 0.0) + float(v)
        dt = time.time() - t0
        nb = max(steps_per_epoch, 1)

        loader_for_eval = test_loader
        if patches_loader is not None and epoch > total_epochs - 15:
            loader_for_eval = patches_loader  # train_test_MT.py:287-289
        rng, sub = jax.random.split(rng)
        res = evaluate(opt, eval_step, state.params["model"],
                       state.batch_stats, loader_for_eval, sub,
                       sharding=train_sharding)
        final_eval = res

        if plateau is not None:
            # ReduceLROnPlateau on the eval loss (networks_new.py:122)
            from .optim import set_plateau_scale
            scale = plateau.step(res["loss"])
            state = state.replace(opt_state=set_plateau_scale(
                state.opt_state, scale))

        if opt.snapshot_every > 0 and epoch % opt.snapshot_every == 0:
            save_train_state(snap_path, state, epoch,
                             extra={"plateau": plateau.state_dict()}
                             if plateau else None)

        if opt.task == "grad":
            test_acc = res.get("acc_fuse", res.get("acc_path",
                                                   res.get("acc_omic", 0.0)))
        else:
            test_acc = res.get("cindex_fuse", res.get("cindex_path",
                                                      res.get("cindex_omic",
                                                              0.0)))
        if epoch > 15 and test_acc > best["acc"]:  # :295-307
            best = {"acc": test_acc, "epoch": epoch}
            save_checkpoint(
                os.path.join(ckpt_dir, f"{opt.model_name}_{fold}_best.pt"),
                {"split": fold, "opt": opt, "epoch": total_epochs,
                 "model_state_dict": state.params["model"],
                 "batch_stats": state.batch_stats,
                 "ema_model_state_dict": state.ema_params,
                 "ema_batch_stats": state.ema_batch_stats,
                 "metrics": res.get("metrics_fuse")})

        mlog.log({"epoch": epoch,
                  "train_loss": agg.get("loss", 0) / nb,
                  "samples_per_s": n_samples / max(dt, 1e-9),
                  **{f"test_{k}": v for k, v in res.items()
                     if k.startswith(("acc_", "cindex_", "loss"))
                     and np.isscalar(v)}})
        if opt.verbose:
            msg = (f"[fold {fold}] epoch {epoch}/{total_epochs} "
                   f"loss {agg.get('loss', 0) / nb:.4f} "
                   f"({n_samples / max(dt, 1e-9):.1f} samples/s)")
            if opt.task == "grad":
                for name in ("fuse", "path", "omic"):
                    if f"acc_{name}" in res:
                        msg += f" test_{name}_acc {res[f'acc_{name}']:.4f}"
            else:
                for name in ("fuse", "path", "omic"):
                    if f"cindex_{name}" in res:
                        msg += f" cindex_{name} {res[f'cindex_{name}']:.4f}"
            log(msg)

    # final fold checkpoint (train_cv_MT.py:119-130)
    save_checkpoint(
        os.path.join(ckpt_dir, f"{opt.model_name}_{fold}.pt"),
        {"split": fold, "opt": opt, "epoch": total_epochs,
         "model_state_dict": state.params["model"],
         "batch_stats": state.batch_stats,
         "ema_model_state_dict": state.ema_params,
         "ema_batch_stats": state.ema_batch_stats,
         "crd_params": {k: v for k, v in state.params.items()
                        if k != "model"},
         "metrics": final_eval.get("metrics_fuse") if final_eval else None})
    return final_eval, best
