"""CLAT stage-2 adaptive-teaching student — reference
``MIA 2023/stage2_unimodal_student/train_test_path_multi_distill.py`` +
``train_cv_path_multi_MT.py`` (9-metric best/avg tracking).

Per step (reference ``:320-460``):
- student path ResNet + EMA self-teacher + frozen stage-1 fused teacher
- per-sample DistillKL from both teachers
- query-discrepancy sample weights: probabilistic-margin confidence gap
  teacher-vs-student, clipped at ``max_discrep`` (``:131-158``); reset to 1
  before ``start_reweight``, +1 after (``:371-377``)
- CRD v10: kNN-neighbour or KMeans-centre positives from the banks, with
  the sample weights folded into the per-sample NCE loss
- GK_refine_thresh: per-sample pairwise gradient-cosine weights over
  [div1, div2, kd1, kd2, CE] at the feature cut-point (``:80-128``)
"""
from __future__ import annotations

import os
import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..contrast import Embed, init_bank
from ..contrast.crd_v10 import (assign_sample_weights, contrast_loss_v10,
                                crd_v10_scores)
from ..data.augment import augment_views
from ..data.pipeline import Loader, PathomicDataset, PrefetchLoader
from ..eval.metrics import extended_grading_metrics, one_hot
from ..gradweight import gk_refine_thresh_weights
from ..losses import cox_loss, distill_kl, l1_regularizer, nll_loss
from ..models.factory import _dtype, define_model
from ..utils.checkpoint import (load_train_state, save_checkpoint,
                                save_train_state)
from .ema import update_ema
from .loop import evaluate
from .optim import make_optimizer
from .schedules import make_lr_schedule
from .state import TrainState
from .steps import build_eval_step
from .student import (frozen_teacher_forward, init_student_state,
                      load_teacher)


def build_clat_student_step(opt, model, teacher_model, teacher_vars, tx,
                            class_mask: np.ndarray):
    """class_mask: [C, n_data] 0/1 — same-class bank rows per class
    (S2 loader's ``train_class_idx``)."""
    embed = Embed(opt.feat_dim, mlp=False)
    cmask = jnp.asarray(class_mask, jnp.float32)
    alpha = 1.0 if opt.alpha is None else opt.alpha
    beta = 1.0 if opt.beta is None else opt.beta
    if opt.assign_weights and opt.loss_weighting != "GK_refine":
        raise NotImplementedError(
            f"--loss_weighting {opt.loss_weighting}: the CLAT student only "
            "implements GK_refine — the reference's RLW/UW options are "
            "unimplemented there too (options_new.py:18-19; "
            "train_test_path_multi_distill.py:421-424 has no other branch)")

    def step(state: TrainState, batch, key, reweight_on):
        k_aug, k_drop, k_drop_ema, k_drop_t, k_c1, k_c2 = \
            jax.random.split(key, 6)
        views = augment_views(k_aug, batch["path_views"],
                              dtype=_dtype(opt))
        x1, x2 = views[:, 0], views[:, 1]
        bsz = x1.shape[0]

        ema_raw, ema_mut = model.apply(
            {"params": state.ema_params,
             "batch_stats": state.ema_batch_stats},
            x2, train=True, rngs={"dropout": k_drop_ema},
            mutable=["batch_stats"])
        _, ema_path_feat, ema_logit_path, _ = jax.tree_util.tree_map(
            jax.lax.stop_gradient, ema_raw)
        t_out = frozen_teacher_forward(opt, teacher_model, teacher_vars,
                                       x1, batch["omic"], k_drop_t)

        def kd_fn(params, path_feat):
            """per-sample KD losses as functions of the feature cut-point."""
            w = params["model"]["fc_new2"]["kernel"]
            b = params["model"]["fc_new2"]["bias"]
            logit_path = path_feat @ w + b
            # query-discrepancy sample weights (:359-377)
            w1 = assign_sample_weights(jax.nn.softmax(logit_path, 1),
                                       jax.nn.softmax(t_out.hazard_fuse, 1),
                                       batch["g"], opt.max_discrep,
                                       opt.label_dim)
            w2 = assign_sample_weights(jax.nn.softmax(logit_path, 1),
                                       jax.nn.softmax(ema_logit_path, 1),
                                       batch["g"], opt.max_discrep,
                                       opt.label_dim)
            w1 = jnp.where(reweight_on, w1 + 1.0, jnp.ones_like(w1))
            w2 = jnp.where(reweight_on, w2 + 1.0, jnp.ones_like(w2))

            losses = {
                "div1": alpha * distill_kl(logit_path, t_out.hazard_fuse,
                                           opt.kd_T, per_sample=True),
                "div2": alpha * distill_kl(logit_path, ema_logit_path,
                                           opt.kd_T, per_sample=True),
            }
            banks = {}
            if opt.distill == "crd":
                teachers = {"fuse": (t_out.fuse_feat, w1, k_c1),
                            "ema": (ema_path_feat, w2, k_c2)}
                for i, (name, (t_feat, sw, kc)) in enumerate(
                        teachers.items(), 1):
                    f_s = embed.apply({"params": params[f"crd_{name}_s"]},
                                      path_feat)
                    f_t = embed.apply({"params": params[f"crd_{name}_t"]},
                                      t_feat)
                    out_s, out_t, sim_s, sim_t, bank = crd_v10_scores(
                        state.banks[name], f_s, f_t, batch["g"],
                        batch["index"], batch["sample_idx"],
                        class_mask=cmask, num_pos=opt.nce_p,
                        pos_extra=opt.pos_extra, T=opt.nce_t,
                        momentum=opt.nce_m, key=kc, update_bank=True)
                    _, sl_s = contrast_loss_v10(out_s, opt.n_data, opt.nce_p,
                                                sw, sim_s)
                    _, sl_t = contrast_loss_v10(out_t, opt.n_data, opt.nce_p,
                                                sw, sim_t)
                    losses[f"kd{i}"] = beta * (sl_s + sl_t)
                    banks[name] = bank
            return losses, banks, (jnp.mean(w1), jnp.mean(w2))

        def loss_fn(params):
            raw, mut = model.apply(
                {"params": params["model"], "batch_stats": state.batch_stats},
                x1, train=True, rngs={"dropout": k_drop},
                mutable=["batch_stats"])
            _, path_feat, logit_path, pred_path = raw

            if opt.task == "surv":
                loss_cls = cox_loss(batch["t"], batch["e"], pred_path)
            else:
                loss_cls = nll_loss(pred_path, batch["g"])

            kd, new_banks, wmeans = kd_fn(params, path_feat)
            kd_keys = sorted(kd.keys())
            kd_vals = [kd[k] for k in kd_keys]   # per-sample [B] each

            if opt.assign_weights and opt.loss_weighting == "GK_refine":
                # per-sample gradients of each summed per-sample loss at the
                # feature cut-point (loss[b] depends only on feat[b], so the
                # gradient of the sum is the per-sample gradient)
                fns = [lambda f, kk=k: jnp.sum(
                    kd_fn(params, f)[0][kk]) / bsz for k in kd_keys]

                def ce_fn(f):
                    w = params["model"]["fc_new2"]["kernel"]
                    b = params["model"]["fc_new2"]["bias"]
                    from ..models.common import apply_act
                    return nll_loss(apply_act(opt.act_type, f @ w + b),
                                    batch["g"])

                grads = [jax.lax.stop_gradient(jax.grad(fn)(path_feat))
                         for fn in fns]
                grads.append(jax.lax.stop_gradient(
                    jax.grad(ce_fn)(path_feat)))
                scale = gk_refine_thresh_weights(
                    grads, opt.grads_thresh, use_thresh=opt.use_grads_thresh)
                # total = sum_b sum_j scale[b, j] * loss_j[b] / B (:117)
                losses_bl = jnp.stack(kd_vals, axis=1)     # [B, n_kd]
                loss_KD = jnp.sum(scale[:, :len(kd_vals)] * losses_bl) / bsz
                mean_scale = jnp.mean(scale, axis=0)
            else:
                loss_KD = sum(jnp.sum(v) / bsz for v in kd_vals)
                mean_scale = jnp.zeros(len(kd_vals) + 1)

            loss_reg = l1_regularizer(params["model"], opt.reg_type)
            loss = (opt.lambda_nll * loss_cls + opt.lambda_reg * loss_reg
                    + loss_KD)
            metrics = {"loss": loss, "loss_cls": loss_cls,
                       "loss_KD": loss_KD, "scale": mean_scale,
                       "w1_mean": wmeans[0], "w2_mean": wmeans[1]}
            return loss, (metrics, mut.get("batch_stats", {}),
                          new_banks or state.banks, raw)

        grads, (metrics, new_stats, new_banks, raw) = jax.grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = update_ema(new_params["model"], state.ema_params,
                             opt.ema_decay, state.step)
        if opt.task == "grad":
            metrics["correct_path"] = jnp.sum(
                jnp.argmax(raw[3], axis=1) == batch["g"])
        new_state = state.replace(
            step=state.step + 1, params=new_params, batch_stats=new_stats,
            opt_state=new_opt_state, ema_params=new_ema,
            ema_batch_stats=ema_mut.get("batch_stats", {}),
            banks=new_banks)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,))


def train_clat_student(opt, data: Dict, fold: int,
                       patches_data: Optional[Dict] = None,
                       log=print) -> Tuple[Dict, Dict, Dict]:
    """One fold of CLAT stage-2 training.  Returns (final_eval, best_info,
    best_ext_metrics)."""
    split = data["cv_splits"][fold]
    train_ds = PathomicDataset(opt, split, "train", train=True,
                               contrast=(opt.distill in ("crd", "hkd")))
    test_ds = PathomicDataset(opt, split, "test", train=False)
    train_loader = Loader(train_ds, opt.batch_size, shuffle=True,
                          drop_last=True, n_views=2,
                          workers=opt.host_workers, seed=opt.seed + fold)
    test_loader = Loader(test_ds, opt.batch_size, shuffle=False,
                         drop_last=False, n_views=1,
                         workers=opt.host_workers, seed=opt.seed)
    patches_loader = None
    if patches_data is not None:
        pds = PathomicDataset(opt, patches_data["cv_splits"][fold], "test",
                              train=False)
        patches_loader = Loader(pds, opt.batch_size, shuffle=False,
                                drop_last=False, n_views=1,
                                workers=opt.host_workers, seed=opt.seed)

    n_data = len(train_ds)
    opt = opt.replace(n_data=n_data)
    class_mask = one_hot(train_ds.g, opt.label_dim).T  # [C, n_data]

    teacher_model, teacher_vars = load_teacher(opt, fold)
    model = define_model(opt, path_only=True)
    tx = make_optimizer(opt, make_lr_schedule(opt, len(train_loader)))
    rng = jax.random.PRNGKey(opt.seed + fold)
    rng, k_init = jax.random.split(rng)
    state = init_student_state(opt, model, tx, k_init, n_data,
                               opt.input_size_path)
    from ..models.common import count_parameters
    log("Number of Trainable Parameters: %d"
        % count_parameters(state.params))
    eval_opt = opt.replace(mode="path")
    eval_step = build_eval_step(eval_opt, model)

    ckpt_dir = os.path.join(opt.checkpoints_dir, opt.exp_name, opt.model_name)
    # mid-fold resume (same machinery as the teacher/student drivers)
    snap_path = os.path.join(ckpt_dir, f"{opt.model_name}_{fold}_state.snap")
    start_epoch = opt.epoch_count
    snap_extra = None
    if opt.resume and os.path.exists(snap_path):
        state, done_epoch, snap_extra = load_train_state(
            snap_path, state, with_extra=True)
        start_epoch = done_epoch + 1
        log(f"[fold {fold}] resumed from epoch {done_epoch}")

    # --data_parallel wiring (see train/student.py); teacher replicated
    # before the step closes over it
    from ..parallel.mesh import replicated_sharding, setup_data_parallel
    state, train_sharding = setup_data_parallel(opt, state)
    if train_sharding is not None:
        teacher_vars = jax.device_put(
            teacher_vars, replicated_sharding(train_sharding.mesh))
    step = build_clat_student_step(opt, model, teacher_model, teacher_vars,
                                   tx, class_mask)

    total_epochs = opt.niter + opt.niter_decay
    best = {"acc": 0.0, "epoch": -1, "ext": None}
    final_eval = None

    from .schedules import PlateauTracker
    plateau = PlateauTracker() if opt.lr_policy == "plateau" else None
    if plateau is not None and snap_extra and "plateau" in snap_extra:
        # --resume: keep the reduced-LR tracker state (a fresh tracker
        # would write scale=1.0 back after the first post-resume epoch)
        plateau.load_state_dict(snap_extra["plateau"])

    for epoch in range(start_epoch, total_epochs + 1):
        t0 = time.time()
        agg: Dict[str, float] = {}
        reweight_on = jnp.asarray(epoch >= opt.start_reweight)
        for batch in PrefetchLoader(train_loader, depth=opt.prefetch_depth,
                                    device=train_sharding):
            rng, sub = jax.random.split(rng)
            state, metrics = step(state, batch, sub, reweight_on)
            for k, v in metrics.items():
                if k.startswith(("loss", "correct", "w1", "w2")):
                    agg[k] = agg.get(k, 0.0) + float(v)
        dt = time.time() - t0
        nb = max(len(train_loader), 1)

        loader_for_eval = test_loader
        if patches_loader is not None and epoch > total_epochs - 10:
            loader_for_eval = patches_loader
        rng, sub = jax.random.split(rng)
        res = evaluate(eval_opt, eval_step, state.params["model"],
                       state.batch_stats, loader_for_eval, sub,
                       sharding=train_sharding)
        final_eval = res
        # 9-metric CLAT report (stage2 ...distill.py:655-672)
        ext = extended_grading_metrics(
            one_hot(res["gt"], opt.label_dim), res["probs"]["path"]) \
            if opt.task == "grad" else {}
        res["ext_metrics"] = ext

        if plateau is not None:
            from .optim import set_plateau_scale
            state = state.replace(opt_state=set_plateau_scale(
                state.opt_state, plateau.step(res["loss"])))
        if opt.snapshot_every > 0 and epoch % opt.snapshot_every == 0:
            save_train_state(snap_path, state, epoch,
                             extra={"plateau": plateau.state_dict()}
                             if plateau else None)

        if opt.verbose:
            log(f"[fold {fold}] epoch {epoch}/{total_epochs} "
                f"cls {agg.get('loss_cls', 0) / nb:.4f} "
                f"KD {agg.get('loss_KD', 0) / nb:.4f} "
                f"w1 {agg.get('w1_mean', 0) / nb:.3f} "
                f"test_acc {res.get('acc_path', 0):.4f} "
                f"({opt.batch_size * nb / max(dt, 1e-9):.1f} samples/s)")

        if opt.task == "grad" and agg.get("loss", 0) / nb < opt.patience:
            log(f"Early stopping at Epoch {epoch}")
            break

        if epoch > opt.niter_decay - 10 and ext:
            avg_metric = float(np.mean(list(ext.values())))
            if avg_metric > best["acc"]:
                best = {"acc": avg_metric, "epoch": epoch, "ext": ext}
                save_checkpoint(
                    os.path.join(ckpt_dir,
                                 f"{opt.model_name}_{fold}_best.pt"),
                    {"split": fold, "opt": opt, "epoch": total_epochs,
                     "model_state_dict": state.params["model"],
                     "batch_stats": state.batch_stats,
                     "ema_model_state_dict": state.ema_params,
                     "metrics": ext})

    # intra/inter-class similarity diagnostics (reference
    # evaluate_feature, stage2 ...distill.py:170-186): teacher fuse vs
    # student path features over the plain test split
    if final_eval is not None and opt.task == "grad":
        from ..eval.diagnostics import evaluate_feature
        t_eval_step = build_eval_step(opt, teacher_model)
        rng, sub = jax.random.split(rng)
        t_res = evaluate(opt, t_eval_step, teacher_vars["params"],
                         teacher_vars.get("batch_stats", {}), test_loader,
                         sub, sharding=train_sharding)
        s_feats = final_eval["feats"].get("path")
        t_feats = t_res["feats"].get("fuse")
        if (s_feats is not None and t_feats is not None
                and len(s_feats) == len(t_feats)):
            final_eval["similarity_diagnostics"] = evaluate_feature(
                t_feats, s_feats, final_eval["gt"])
            if opt.verbose:
                log(f"[fold {fold}] similarity diagnostics: "
                    f"{final_eval['similarity_diagnostics']}")

    save_checkpoint(
        os.path.join(ckpt_dir, f"{opt.model_name}_{fold}.pt"),
        {"split": fold, "opt": opt, "epoch": total_epochs,
         "model_state_dict": state.params["model"],
         "batch_stats": state.batch_stats,
         "ema_model_state_dict": state.ema_params,
         "metrics": final_eval.get("ext_metrics") if final_eval else None})
    return final_eval, best, best.get("ext") or {}
