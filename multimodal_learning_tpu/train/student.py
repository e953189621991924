"""Gradient-weighted student distillation — reference
``MICCAI-2022/train_test_path_multi_distill.py`` (and the MIA-2022
``..._v2.py`` extensions).

Flow per step (reference ``:242-330``):
- student path-only ResNet forward
- EMA self-teacher + frozen multimodal ``fix_model`` teacher forwards (no
  grad)
- ``loss_cls`` NLL; ``loss_div1/2`` DistillKL from {fuse teacher, EMA};
  ``loss_kd1/2`` CRD v3 (discrepancy-guided positive/negative selection) from
  the two teachers, each with its own bank+embeds
- AEKD: per-loss feature gradients at ``path_feat`` -> cosine-Gram weights
  (``:292-309``); here computed with jax.grad pulls through the heads only
  (identical values, no extra full backwards — SURVEY §7 "AEKD" note)
- total = lambda_nll*cls + lambda_reg*reg + weighted KD; Adam; EMA update.

The frozen teacher's params are loaded from a teacher checkpoint produced by
``train_teacher`` (``:156-173``).
"""
from __future__ import annotations

import os
import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..contrast import (Embed, contrast_loss, crd_scores_select, init_bank)
from ..contrast.hkd import (TAGEncoder, hkd_bank_update, hkd_graph_scores,
                            hkd_scores, init_hkd_bank, knn_adjacency,
                            nce_softmax_loss)
from ..data.augment import augment_views
from ..data.pipeline import Loader, PathomicDataset, PrefetchLoader
from ..eval.metrics import grading_metrics, one_hot
from ..gradweight import (aekd_scale, aekd_total, aekd_v2_gate,
                          momentum_aekd_scale)
from ..losses import cox_loss, distill_kl, l1_regularizer, nll_loss, sp_loss
from ..losses.distiller_zoo import (correlation_loss, feats_kl, hint_loss,
                                    pkt_loss, rkd_loss)
from ..models.factory import _dtype, define_model
from ..utils.checkpoint import (load_checkpoint, load_train_state,
                                save_checkpoint, save_train_state)
from .ema import update_ema
from .loop import evaluate
from .optim import make_optimizer
from .schedules import make_lr_schedule
from .state import TrainState
from .steps import build_eval_step


def init_student_state(opt, model, tx, rng, n_data: int,
                       input_size: int) -> TrainState:
    k_model, k_drop, kb1, kb2, ke1, ke2, k_reinit = jax.random.split(rng, 7)
    x = jnp.zeros((1, input_size, input_size, 3))
    variables = model.init({"params": k_model, "dropout": k_drop}, x,
                           train=True)
    # reference order: pretrained trunk loads in the constructor
    # (resnets.py:275-284), init_net -> init_weights runs AFTER
    # (utils.py:263-265) and clobbers it for init_type not in {max, none} —
    # pretrained first, re-init second, same end state as the reference
    from ..models.common import apply_init_type
    from ..models.import_torch import apply_pretrained
    model_params, batch_stats = apply_pretrained(
        opt, dict(variables["params"]),
        dict(variables.get("batch_stats", {})))
    model_params = apply_init_type(k_reinit, dict(model_params),
                                   opt.init_type, opt.init_gain)
    params = {"model": jax.tree_util.tree_map(jnp.asarray, model_params)}
    batch_stats = jax.tree_util.tree_map(jnp.asarray, batch_stats)
    # two CRD criteria: fuse-teacher bank + EMA-teacher bank (:202-208);
    # student embeds are single-Linear (CRD_loss.py:256-267)
    embed = Embed(opt.feat_dim, mlp=False)
    d_s = jnp.zeros((1, opt.path_dim))
    # teacher-side dims: fuse feature is mmhid-wide, EMA path feature
    # path_dim-wide (identical, 128, in the paper configs)
    t_dims = {"fuse": opt.mmhid, "ema": opt.path_dim}
    banks = {}
    if opt.distill == "crd":
        for name, kb, ke in (("fuse", kb1, ke1), ("ema", kb2, ke2)):
            ks, kt = jax.random.split(ke)
            params[f"crd_{name}_s"] = embed.init(ks, d_s)["params"]
            params[f"crd_{name}_t"] = embed.init(
                kt, jnp.zeros((1, t_dims[name])))["params"]
            banks[name] = init_bank(kb, n_data, opt.feat_dim)
    elif opt.distill == "hkd":
        # HKD: embeds + TAGConv encoders + NCE bank (GNN.py:121-134)
        ks, kt = jax.random.split(ke1)
        params["hkd_embed_s"] = embed.init(ks, d_s)["params"]
        params["hkd_embed_t"] = embed.init(
            kt, jnp.zeros((1, opt.mmhid)))["params"]
        gnn = TAGEncoder(opt.feat_dim)
        kg1, kg2 = jax.random.split(ke2)
        dummy_adj = jnp.zeros((2, 2))
        dummy_h = jnp.zeros((2, opt.feat_dim))
        params["hkd_gnn_s"] = gnn.init(kg1, dummy_adj, dummy_h)["params"]
        params["hkd_gnn_t"] = gnn.init(kg2, dummy_adj, dummy_h)["params"]
        banks["hkd"] = init_hkd_bank(kb1, n_data, opt.feat_dim)
    if opt.assign_weights and opt.loss_weighting == "momentum_AEKD":
        # MIA-2022 momentum-AEKD scale EMA (..._v2.py:475); NaN is the
        # "unseeded" sentinel — the first step's scale replaces it
        n_losses = (4 if opt.distill == "crd" else 2) + int(opt.CE_grads)
        banks["aekd_ema"] = jnp.full(n_losses, jnp.nan)
    opt_state = tx.init(params)
    copy = lambda t: jax.tree_util.tree_map(jnp.array, t)
    # --global_step seeds the step counter (reference iter_num, :222)
    return TrainState(step=jnp.asarray(opt.global_step, jnp.int32),
                      params=params,
                      batch_stats=batch_stats, opt_state=opt_state,
                      ema_params=copy(params["model"]),
                      ema_batch_stats=copy(batch_stats),
                      banks=banks or None)


def frozen_teacher_forward(opt, teacher_model, teacher_vars, x_path, x_omic,
                           rng):
    """Frozen-teacher forward, stop-gradiented.  ``--teacher_bn batch``
    (default) mirrors the reference's ``fix_model.train()`` under no_grad
    (``train_test_path_multi_distill.py:232``): BN uses batch statistics and
    dropout stays live (the stats advance is discarded — the reference's
    fix_model running stats are never saved again either); ``running``
    evaluates with the saved stats."""
    if opt.teacher_bn == "batch":
        t_out, _ = teacher_model.apply(
            teacher_vars, x_path=x_path, x_omic=x_omic, train=True,
            rngs={"dropout": rng}, mutable=["batch_stats"])
    else:
        t_out = teacher_model.apply(teacher_vars, x_path=x_path,
                                    x_omic=x_omic, train=False)
    return jax.tree_util.tree_map(
        lambda x: None if x is None else jax.lax.stop_gradient(x),
        t_out, is_leaf=lambda x: x is None)


def build_student_train_step(opt, model, teacher_model, teacher_vars, tx):
    """Returns jitted ``step(state, batch, key, epoch_frac) ->
    (state, metrics)``.  ``teacher_vars`` = {'params':…, 'batch_stats':…} of
    the frozen pathomic teacher."""
    embed = Embed(opt.feat_dim, mlp=False)
    n_kd = 4 if (opt.distill == "crd" and opt.num_teachers == 2) else \
        (2 if opt.num_teachers == 2 else 1)
    known_weightings = ("GK_refine", "momentum_AEKD", "SVM",
                        "GK_refine_param")
    if opt.assign_weights and opt.loss_weighting not in known_weightings:
        raise NotImplementedError(
            f"--loss_weighting {opt.loss_weighting}: supported values are "
            f"{known_weightings} (the reference's RLW/UW revision options "
            "are unimplemented there too, options_new.py:18-19)")
    if opt.sample_KD and not (opt.assign_weights and opt.student_customize
                              and opt.distill in ("crd", "kd")):
        raise NotImplementedError(
            "--sample_KD is the per-sample AEKD_v2 gate "
            "(train_test_path_multi_distill.py:74-141): it needs "
            "--assign_weights --student_customize and --distill crd|kd")
    if (opt.assign_weights and opt.student_customize and not opt.CE_grads
            and n_kd < 2):
        # with CE_grads off the reference skips the CE backward and its
        # gate silently anchors on the LAST KD gradient
        # (train_test_path_multi_distill.py:95-121) — a quirk we preserve
        # for >=2 KD losses; with a single KD loss there is no anchor left
        # and the reference's tensor algebra breaks there too
        raise NotImplementedError(
            "--student_customize without --CE_grads needs at least two KD "
            "losses (the reference gates on the last KD gradient when the "
            "CE backward is skipped)")

    def step(state: TrainState, batch, key, epoch_frac):
        k_aug, k_drop, k_drop_ema, k_drop_t, k_sel1, k_sel2 = \
            jax.random.split(key, 6)
        views = augment_views(k_aug, batch["path_views"],
                              dtype=_dtype(opt))
        x1, x2 = views[:, 0], views[:, 1]

        # EMA self-teacher (train mode, stats advance — :252-255)
        ema_raw, ema_mut = model.apply(
            {"params": state.ema_params,
             "batch_stats": state.ema_batch_stats},
            x2, train=True, rngs={"dropout": k_drop_ema},
            mutable=["batch_stats"])
        _, ema_path_feat, ema_logit_path, ema_pred_path = \
            jax.tree_util.tree_map(jax.lax.stop_gradient, ema_raw)

        t_out = frozen_teacher_forward(opt, teacher_model, teacher_vars,
                                       x1, batch["omic"], k_drop_t)

        def kd_losses_fn(params, path_feat, per_sample=False):
            """All KD losses as functions of the feature cut-point.

            ``per_sample=True`` (--sample_KD, AEKD_loss_v2 sample mode,
            ``train_test_path_multi_distill.py:85-112``) returns each loss
            as an un-reduced [B] vector; only the weightable modes (kd/crd)
            support it — enforced by the build-time fail-fast above."""
            # logits head: fc_new2(path_feat)
            w = params["model"]["fc_new2"]["kernel"]
            b = params["model"]["fc_new2"]["bias"]
            logit_path = path_feat @ w + b
            losses = {}
            alpha = 1.0 if opt.alpha is None else opt.alpha
            if opt.num_teachers == 2:
                losses["div1"] = alpha * distill_kl(
                    logit_path, t_out.hazard_fuse, opt.kd_T,
                    per_sample=per_sample)
                losses["div2"] = alpha * distill_kl(
                    logit_path, ema_logit_path, opt.kd_T,
                    per_sample=per_sample)
            elif opt.which_teacher == "fuse":
                losses["div1"] = alpha * distill_kl(
                    logit_path, t_out.hazard_fuse, opt.kd_T,
                    per_sample=per_sample)
            else:
                losses["div1"] = alpha * distill_kl(
                    logit_path, ema_logit_path, opt.kd_T,
                    per_sample=per_sample)
            t_feat_fuse = t_out.fuse_feat
            if opt.distill == "kd":
                pass  # KL-div only (v2 :434-435)
            elif opt.distill == "feats_KL":
                losses["kd1"] = feats_kl(path_feat, t_feat_fuse)
            elif opt.distill in ("similarity", "sp"):
                losses["kd1"] = sp_loss(path_feat, t_feat_fuse)
            elif opt.distill == "rkd":
                losses["kd1"] = rkd_loss(path_feat, t_feat_fuse)
            elif opt.distill == "pkt":
                losses["kd1"] = pkt_loss(path_feat, t_feat_fuse)
            elif opt.distill == "hint":
                losses["kd1"] = hint_loss(path_feat, t_feat_fuse)
            elif opt.distill == "correlation":
                losses["kd1"] = correlation_loss(path_feat, t_feat_fuse)
            elif opt.distill == "hkd":
                # holistic graph KD (GNN.py:136-196); sample_idx holds only
                # negatives for hkd (loader ``distill='hkd'``)
                w = params["model"]["fc_new2"]["kernel"]
                b = params["model"]["fc_new2"]["bias"]
                logit_s = path_feat @ w + b
                f_es = embed.apply({"params": params["hkd_embed_s"]},
                                   path_feat)
                f_et = embed.apply({"params": params["hkd_embed_t"]},
                                   t_feat_fuse)
                bank = state.banks["hkd"]
                out_s, out_t = hkd_scores(bank, f_es, f_et, batch["index"],
                                          batch["sample_idx"])
                loss_hkd = nce_softmax_loss(out_s) + nce_softmax_loss(out_t)
                gnn = TAGEncoder(opt.feat_dim)
                adj_s = knn_adjacency(jax.lax.stop_gradient(logit_s))
                adj_t = knn_adjacency(t_out.hazard_fuse)
                f_gs = gnn.apply({"params": params["hkd_gnn_s"]}, adj_s, f_es)
                f_gt = gnn.apply({"params": params["hkd_gnn_t"]}, adj_t, f_et)
                out_gs, out_gt = hkd_graph_scores(bank, f_gs, f_gt,
                                                  batch["index"],
                                                  batch["sample_idx"])
                loss_hkd = loss_hkd + (nce_softmax_loss(out_gs)
                                       + nce_softmax_loss(out_gt))
                losses["kd1"] = loss_hkd
            elif opt.distill == "crd":
                if opt.num_teachers == 2:
                    teachers = [("fuse", t_out.fuse_feat, k_sel1),
                                ("ema", ema_path_feat, k_sel2)]
                elif opt.which_teacher == "fuse":
                    teachers = [("fuse", t_out.fuse_feat, k_sel1)]
                else:  # self_EMA
                    teachers = [("ema", ema_path_feat, k_sel2)]
                for i, (name, t_feat, k_sel) in enumerate(teachers, 1):
                    f_s = embed.apply({"params": params[f"crd_{name}_s"]},
                                      path_feat)
                    f_t = embed.apply({"params": params[f"crd_{name}_t"]},
                                      t_feat)
                    out_s, out_t, _, _ = crd_scores_select(
                        state.banks[name], f_s, f_t, batch["index"],
                        batch["sample_idx"], P=opt.nce_p, K=opt.nce_k,
                        P2=opt.nce_p2, K2=opt.nce_k2, T=opt.nce_t,
                        momentum=opt.nce_m,
                        select_pos_mode=opt.select_pos_mode,
                        select_pos_pairs=opt.select_pos_pairs,
                        select_neg_pairs=opt.select_neg_pairs,
                        neg_reweight=opt.neg_reweight,
                        epoch_frac=epoch_frac, rng=k_sel,
                        update_bank=False)
                    n_pos = opt.nce_p2 if opt.select_pos_pairs else opt.nce_p
                    # v4 neg_reweight weights are already folded into the
                    # scores by crd_scores_select (reference semantics).
                    crd = (contrast_loss(out_s, opt.n_data, n_pos=n_pos,
                                         per_sample=per_sample)
                           + contrast_loss(out_t, opt.n_data, n_pos=n_pos,
                                           per_sample=per_sample))
                    beta = 1.0 if opt.beta is None else opt.beta
                    losses[f"kd{i}"] = beta * crd
            return losses

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

            kd = kd_losses_fn(params, path_feat)
            kd_keys = sorted(kd.keys())  # [div1, div2, kd1, kd2]
            kd_vals = [kd[k] for k in kd_keys]
            new_ema_scale = state.banks.get("aekd_ema") \
                if state.banks else None

            weightable = opt.distill in ("crd", "kd")
            if opt.assign_weights and weightable:
                # per-loss feature gradients via vjp taps (AEKD_loss :41-70)
                fns = [lambda f, kk=k: kd_losses_fn(params, f)[kk]
                       for k in kd_keys]

                def ce_fn(f):
                    w = params["model"]["fc_new2"]["kernel"]
                    b = params["model"]["fc_new2"]["bias"]
                    lp = f @ w + b
                    if opt.task == "surv":
                        return cox_loss(batch["t"], batch["e"], lp)
                    from ..models.common import apply_act
                    return nll_loss(apply_act(opt.act_type, lp), batch["g"])

                grads = [jax.lax.stop_gradient(jax.grad(fn)(path_feat))
                         for fn in fns]
                if opt.CE_grads:
                    grads.append(jax.lax.stop_gradient(
                        jax.grad(ce_fn)(path_feat)))
                # grads[-1] is the gate anchor: the CE gradient when
                # --CE_grads, else the last KD gradient (reference quirk,
                # ...distill.py:95-121; guarded n_kd >= 2 at build time)
                if opt.student_customize:
                    if opt.sample_KD:
                        # per-sample AEKD_v2 (:103-112, :131-136): per-sample
                        # KD losses gated by the per-row cos(KD grad, CE
                        # grad) > 0.  The grads computed above ARE per-sample
                        # rows (each loss's sample-i term reaches path_feat
                        # only through row i; the reference backprops
                        # sum(loss)/B, and cosine is row-scale-invariant).
                        kd_ps = kd_losses_fn(params, path_feat,
                                             per_sample=True)
                        loss_KD = aekd_v2_gate(
                            grads[:-1], grads[-1],
                            [kd_ps[k] for k in kd_keys], per_sample=True,
                            batch_size=opt.batch_size)
                    else:
                        # batch-level AEKD_loss_v2 binary gating (:74-141)
                        loss_KD = aekd_v2_gate(grads[:-1], grads[-1],
                                               kd_vals)
                    scale = jnp.zeros(len(grads))
                elif opt.loss_weighting == "SVM":
                    # one-class-SVM loss weighting (the reference's
                    # commented alternative, ..._v2.py:156-158 +
                    # CL_utils/optimization.py:16-57).  sklearn's SMO is
                    # host-only, so the weights come through a pure_callback
                    # on the stacked per-loss feature gradients.
                    from ..gradweight.svm import find_optimal_svm
                    import numpy as _np

                    def _svm_host(g):
                        return find_optimal_svm(
                            _np.asarray(g), nu=0.5,
                            is_norm=opt.svm_norm).astype(_np.float32)

                    gstack = jnp.stack([g.astype(jnp.float32)
                                        for g in grads])  # [m, B, D]
                    scale = jax.pure_callback(
                        _svm_host,
                        jax.ShapeDtypeStruct((len(grads),), jnp.float32),
                        gstack)
                    loss_KD = aekd_total(scale, kd_vals)
                elif opt.loss_weighting == "GK_refine_param":
                    # MIA-2022 parameter-space GK_refine (..._v2.py:50-86,
                    # commented live call :472): gradients of each KD loss +
                    # CE wrt ALL student params except fc_new2 — one full
                    # backward per loss, exactly like the reference
                    from ..gradweight import gk_refine_param_space

                    def _full(kk):
                        def fn(mp):
                            p2 = dict(params)
                            p2["model"] = mp
                            raw2, _ = model.apply(
                                {"params": mp,
                                 "batch_stats": state.batch_stats},
                                x1, train=True, rngs={"dropout": k_drop},
                                mutable=["batch_stats"])
                            return kd_losses_fn(p2, raw2[1])[kk]
                        return fn

                    def _ce_full(mp):
                        raw2, _ = model.apply(
                            {"params": mp, "batch_stats": state.batch_stats},
                            x1, train=True, rngs={"dropout": k_drop},
                            mutable=["batch_stats"])
                        if opt.task == "surv":
                            return cox_loss(batch["t"], batch["e"], raw2[3])
                        return nll_loss(raw2[3], batch["g"])

                    fns_p = [_full(k) for k in kd_keys] + [_ce_full]
                    scale = gk_refine_param_space(fns_p, params["model"])
                    loss_KD = aekd_total(scale, kd_vals)
                elif opt.loss_weighting == "momentum_AEKD":
                    # MIA-2022 momentum AEKD (..._v2.py:89-132, 475); the
                    # reference seeds mo_scale with the first step's scale.
                    # The carried EMA starts as NaN (the unseeded sentinel,
                    # init_student_state), so seeding is one branchless
                    # select instead of computing both branches forever.
                    ema = state.banks["aekd_ema"]
                    mo, _ = momentum_aekd_scale(
                        grads, jnp.where(jnp.isnan(ema), 0.0, ema),
                        opt.grads_m, opt.thresh, use_thresh=True)
                    # unseeded: mo = (1-m)*scale, so dividing recovers the
                    # first step's raw scale exactly
                    scale = jnp.where(jnp.isnan(ema),
                                      mo / max(1.0 - opt.grads_m, 1e-9),
                                      mo)
                    loss_KD = aekd_total(scale, kd_vals)
                    new_ema_scale = scale
                else:
                    scale = aekd_scale(grads, n_kd=len(kd_vals))
                    loss_KD = aekd_total(scale, kd_vals)
            else:
                loss_KD = sum(kd_vals)
                scale = jnp.zeros(max(n_kd + 1, 2))

            loss_reg = l1_regularizer(params["model"], opt.reg_type)
            loss = (opt.lambda_nll * loss_cls + opt.lambda_reg * loss_reg
                    + loss_KD)
            if opt.task == "surv":
                loss = (opt.lambda_cox * loss_cls
                        + opt.lambda_reg * loss_reg + loss_KD)

            metrics = {"loss": loss, "loss_cls": loss_cls,
                       "loss_KD": loss_KD, "scale": scale}
            for k, v in kd.items():
                metrics[f"loss_{k}"] = v
            return loss, (metrics, mut.get("batch_stats", {}), raw, path_feat)

        grads, (metrics, new_stats, raw, path_feat) = jax.grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = update_ema(new_params["model"], state.ema_params,
                             opt.ema_decay, state.step)

        # bank updates happen once, after score computation (:278-284 call
        # into memory forward which updates in the same pass; our split is
        # value-identical because updates use pre-update rows and the
        # forward-time (pre-optimizer-step) embed params)
        new_banks = dict(state.banks) if state.banks else None
        if opt.distill == "hkd":
            f_es = embed.apply({"params": state.params["hkd_embed_s"]},
                               path_feat)
            f_et = embed.apply({"params": state.params["hkd_embed_t"]},
                               t_out.fuse_feat)
            new_banks["hkd"] = hkd_bank_update(state.banks["hkd"], f_es,
                                               f_et, batch["index"])
        if new_banks is not None and "aekd_ema" in new_banks:
            new_banks["aekd_ema"] = metrics["scale"]
        if opt.distill == "crd":
            from ..contrast.crd import bank_update
            teachers = {"fuse": t_out.fuse_feat, "ema": ema_path_feat}
            if opt.num_teachers == 2:
                used = ("fuse", "ema")
            else:
                used = ("fuse",) if opt.which_teacher == "fuse" else ("ema",)
            for name in used:
                bank = state.banks[name]
                f_s = embed.apply(
                    {"params": state.params[f"crd_{name}_s"]}, path_feat)
                f_t = embed.apply(
                    {"params": state.params[f"crd_{name}_t"]}, teachers[name])
                # Z constants are set during the loss computation on the old
                # bank; recompute the lazy init here on the stored state
                out_s_raw = jnp.exp(jnp.einsum(
                    "bsd,bd->bs",
                    bank.memory_v2[batch["sample_idx"]], f_s) / opt.nce_t)
                out_t_raw = jnp.exp(jnp.einsum(
                    "bsd,bd->bs",
                    bank.memory_v1[batch["sample_idx"]], f_t) / opt.nce_t)
                from ..contrast.crd import set_z
                bank = set_z(bank, out_s_raw, out_t_raw)
                new_banks[name] = bank_update(
                    bank, jax.lax.stop_gradient(f_s),
                    jax.lax.stop_gradient(f_t), batch["index"], opt.nce_m)

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


def load_teacher(opt, fold: int):
    """Load the frozen pathomic teacher (``:156-173``)."""
    load_path = os.path.join(opt.checkpoints_dir, opt.exp_name,
                             opt.fixed_model,
                             f"{opt.fixed_model}_{fold}_best.pt")
    if not os.path.exists(load_path):
        load_path = os.path.join(opt.checkpoints_dir, opt.exp_name,
                                 opt.fixed_model,
                                 f"{opt.fixed_model}_{fold}.pt")
    ckpt = load_checkpoint(load_path)
    teacher_model = define_model(opt)  # pathomic container
    teacher_vars = {"params": ckpt["model_state_dict"],
                    "batch_stats": ckpt.get("batch_stats", {})}
    return teacher_model, teacher_vars


def train_student(opt, data: Dict, fold: int,
                  patches_data: Optional[Dict] = None,
                  log=print) -> Tuple[Dict, Dict, np.ndarray]:
    """One fold of student distillation (driver
    ``train_cv_path_multi_MT.py`` + ``train()``).  Returns
    (final_eval, best_info, avg_all_metrics/3)."""
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
    steps_per_epoch = len(train_loader)
    teacher_model, teacher_vars = load_teacher(opt, fold)
    model = define_model(opt, path_only=True)
    tx = make_optimizer(opt, make_lr_schedule(opt, steps_per_epoch))
    rng = jax.random.PRNGKey(opt.seed + fold)
    rng, k_init = jax.random.split(rng)
    state = init_student_state(opt, model, tx, k_init, n_data,
                               opt.input_size_path)
    from ..models.common import count_parameters
    log("Number of Trainable Parameters: %d"
        % count_parameters(state.params))
    # eval the path-only student
    eval_opt = opt.replace(mode="path")
    eval_step = build_eval_step(eval_opt, model)

    ckpt_dir = os.path.join(opt.checkpoints_dir, opt.exp_name, opt.model_name)
    # mid-fold resume (same machinery as the teacher, train/loop.py): full
    # train state incl. optimizer/EMA/CRD banks
    snap_path = os.path.join(ckpt_dir, f"{opt.model_name}_{fold}_state.snap")
    start_epoch = opt.epoch_count
    snap_extra = None
    if opt.resume and os.path.exists(snap_path):
        state, done_epoch, snap_extra = load_train_state(
            snap_path, state, with_extra=True)
        start_epoch = done_epoch + 1
        log(f"[fold {fold}] resumed from epoch {done_epoch}")

    # --data_parallel: replicate student state + frozen teacher over the
    # mesh, shard train batches (train_test_MT.py:62-64 / SURVEY §2.7).
    # Replicate the teacher BEFORE the step closes over it.
    from ..parallel.mesh import replicated_sharding, setup_data_parallel
    state, train_sharding = setup_data_parallel(opt, state)
    if train_sharding is not None:
        teacher_vars = jax.device_put(
            teacher_vars, replicated_sharding(train_sharding.mesh))
    step = build_student_train_step(opt, model, teacher_model, teacher_vars,
                                    tx)

    total_epochs = opt.niter + opt.niter_decay
    best = {"acc": 0.0, "epoch": -1}
    avg_all_metrics = np.zeros(4)
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
        for batch in PrefetchLoader(train_loader, depth=opt.prefetch_depth,
                                    device=train_sharding):
            rng, sub = jax.random.split(rng)
            state, metrics = step(state, batch, sub,
                                  jnp.asarray(epoch / max(opt.niter_decay, 1)))
            for k, v in metrics.items():
                if k.startswith(("loss", "correct")):
                    agg[k] = agg.get(k, 0.0) + float(v)
        dt = time.time() - t0
        nb = max(steps_per_epoch, 1)
        loss_epoch = agg.get("loss", 0.0)

        loader_for_eval = test_loader
        if patches_loader is not None and epoch > total_epochs - 10:
            loader_for_eval = patches_loader  # :360-366
        rng, sub = jax.random.split(rng)
        res = evaluate(eval_opt, eval_step, state.params["model"],
                       state.batch_stats, loader_for_eval, sub,
                       sharding=train_sharding)
        final_eval = res
        path_metrics = np.array(res["metrics_path"]) \
            if "metrics_path" in res else np.zeros(4)

        if plateau is not None:
            from .optim import set_plateau_scale
            state = state.replace(opt_state=set_plateau_scale(
                state.opt_state, plateau.step(res["loss"])))
        if opt.snapshot_every > 0 and epoch % opt.snapshot_every == 0:
            save_train_state(snap_path, state, epoch,
                             extra={"plateau": plateau.state_dict()}
                             if plateau else None)

        if epoch > opt.niter_decay - 3:  # :368-369
            avg_all_metrics += path_metrics

        if opt.verbose:
            log(f"[fold {fold}] epoch {epoch}/{total_epochs} "
                f"cls {agg.get('loss_cls', 0) / nb:.4f} "
                f"KD {agg.get('loss_KD', 0) / nb:.4f} "
                f"test_acc {res.get('acc_path', 0):.4f} "
                f"({opt.batch_size * nb / max(dt, 1e-9):.1f} samples/s)")

        if opt.task == "grad" and loss_epoch / nb < opt.patience:  # :383-385
            log(f"Early stopping at Epoch {epoch}")
            break

        if epoch > opt.niter_decay - 10:  # best by mean path metric :387-402
            avg_metric = float(np.mean(path_metrics))
            if avg_metric > best["acc"]:
                best = {"acc": avg_metric, "epoch": epoch}
                save_checkpoint(
                    os.path.join(ckpt_dir,
                                 f"{opt.model_name}_{fold}_best.pt"),
                    {"split": fold, "opt": opt, "epoch": total_epochs,
                     "model_state_dict": state.params["model"],
                     "batch_stats": state.batch_stats,
                     "ema_model_state_dict": state.ema_params,
                     "metrics": res.get("metrics_path")})

    save_checkpoint(
        os.path.join(ckpt_dir, f"{opt.model_name}_{fold}.pt"),
        {"split": fold, "opt": opt, "epoch": total_epochs,
         "model_state_dict": state.params["model"],
         "batch_stats": state.batch_stats,
         "ema_model_state_dict": state.ema_params,
         "metrics": final_eval.get("metrics_path") if final_eval else None})
    return final_eval, best, avg_all_metrics / 3.0
