"""Jitted train/eval steps for the mean-teacher multimodal flow.

One compiled program per step does: on-device augmentation of both views ->
student forward -> EMA-teacher forward -> task losses + pred-KD + CRD bank
lookup/update + SP/Orth -> backward -> Adam -> EMA update.  This replaces the
reference hot loop ``train_test_MT.py:108-242`` (which round-trips the host
between every stage) with a single XLA computation; under a data mesh the
batch dimension shards and XLA inserts the psums.

Branch availability follows ``opt.mode``:
- pathomic: all three branches, KD across them (``train_test_MT.py:177-199``)
- path / omic: single branch; EMA self-distillation still available
  (num_teachers=1, which_teacher=self_EMA semantics).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from flax import struct

from ..contrast import (Embed, contrast_loss, crd_scores, init_bank)
from ..data.augment import augment_view, augment_views
from ..losses import (cox_loss, distill_kl, l1_regularizer, nll_loss,
                      orth_loss, pred_kd_loss, sp_loss)
from ..lowrank import build_view_features, update_adj_tensor, update_aux
from ..models.factory import _dtype
from ..models.pathomic import PathomicOutput
from .ema import update_ema
from .state import TrainState


@struct.dataclass
class TsvdAux:
    """ADMM auxiliary state for the M3LR t-SVD constraint
    (``MIA 2022/train_test_tSVD.py:376-431``): recovered low-rank tensors for
    both modalities, the growing penalty weight mu, and the latest TNN
    diagnostics."""
    aux1: jnp.ndarray   # [V, B, B]
    aux2: jnp.ndarray
    mu: jnp.ndarray
    tnn1: jnp.ndarray
    tnn2: jnp.ndarray


def adapt_output(opt, raw) -> PathomicOutput:
    """Normalise MaxNet/ResNet/Pathomic outputs to PathomicOutput."""
    if isinstance(raw, PathomicOutput):
        return raw
    if opt.mode == "omic" or (isinstance(raw, tuple) and len(raw) == 3):
        feat, hazard, pred = raw
        return PathomicOutput(None, None, feat, None, None, None, hazard,
                              None, None, pred)
    f3, feat, hazard, pred = raw
    return PathomicOutput(None, feat, None, f3, None, hazard, None,
                          None, pred, None)


def model_inputs(opt, batch, x_path=None):
    kw = {}
    if opt.mode in ("path", "pathomic"):
        kw["x_path"] = x_path
    if opt.mode in ("omic", "pathomic"):
        kw["x_omic"] = batch["omic"]
    if opt.mode == "pathomic":
        return kw
    # unimodal models take positional input
    return kw


def _apply(opt, model, params, batch_stats, batch, x_path, train, rng,
           mutable):
    variables = {"params": params, "batch_stats": batch_stats}
    rngs = {"dropout": rng} if rng is not None else None
    if opt.mode == "pathomic":
        return model.apply(variables, x_path=x_path, x_omic=batch["omic"],
                           train=train, rngs=rngs,
                           mutable=["batch_stats"] if mutable else False)
    x = x_path if opt.mode == "path" else batch["omic"]
    return model.apply(variables, x, train=train, rngs=rngs,
                       mutable=["batch_stats"] if mutable else False)


def task_losses(opt, out: PathomicOutput, batch) -> Tuple[jnp.ndarray, Dict]:
    """3-branch NLL (grad) / Cox (surv) — ``train_test_MT.py:149-152,212-215``."""
    zeros = jnp.asarray(0.0)
    parts = {}
    total = zeros
    for name, pred in (("fuse", out.pred_fuse), ("path", out.pred_path),
                       ("omic", out.pred_omic)):
        if pred is None:
            parts[f"loss_{name}"] = zeros
            continue
        if opt.task == "surv":
            li = cox_loss(batch["t"], batch["e"], pred)
        else:
            li = nll_loss(pred, batch["g"])
        parts[f"loss_{name}"] = li
        total = total + li
    return total, parts


def pred_kd(opt, out: PathomicOutput, ema: PathomicOutput) -> jnp.ndarray:
    """Mean-teacher prediction KD (``train_test_MT.py:177-199``)."""
    t = opt.task
    if opt.mode != "pathomic":
        pred = out.pred_path if opt.mode == "path" else out.pred_omic
        ema_pred = ema.pred_path if opt.mode == "path" else ema.pred_omic
        return pred_kd_loss(pred, ema_pred, t)
    kd_fuse = pred_kd_loss(out.pred_fuse, ema.pred_fuse, t)
    if opt.num_teachers == 1:
        kd_path = pred_kd_loss(out.pred_path, ema.pred_path, t)
        kd_omic = pred_kd_loss(out.pred_omic, ema.pred_omic, t)
    elif opt.num_teachers == 2:
        kd_path = (pred_kd_loss(out.pred_path, ema.pred_path, t)
                   + pred_kd_loss(out.pred_path, ema.pred_fuse, t)) / 2.0
        kd_omic = (pred_kd_loss(out.pred_omic, ema.pred_omic, t)
                   + pred_kd_loss(out.pred_omic, ema.pred_fuse, t)) / 2.0
    elif opt.num_teachers == 3:
        kd_path = (pred_kd_loss(out.pred_path, ema.pred_path, t)
                   + pred_kd_loss(out.pred_path, ema.pred_fuse, t)
                   + pred_kd_loss(out.pred_path, ema.pred_omic, t)) / 3.0
        kd_omic = (pred_kd_loss(out.pred_omic, ema.pred_omic, t)
                   + pred_kd_loss(out.pred_omic, ema.pred_fuse, t)
                   + pred_kd_loss(out.pred_omic, ema.pred_path, t)) / 3.0
    else:
        raise NotImplementedError(f"num_teachers={opt.num_teachers}")
    return kd_fuse + kd_path + kd_omic


def _branch_feat(opt, out: PathomicOutput):
    if opt.mode == "pathomic":
        return out.fuse_feat
    return out.path_feat if opt.mode == "path" else out.omic_feat


def _branch_pred(opt, out: PathomicOutput):
    if opt.mode == "pathomic":
        return out.pred_fuse
    return out.pred_path if opt.mode == "path" else out.pred_omic


def init_teacher_state(opt, model, tx, rng, n_data: int,
                       sample_batch) -> TrainState:
    """Initialise params / EMA / banks / embeds for the teacher flow."""
    k_model, k_drop, k_bank, k_embed, k_reinit = jax.random.split(rng, 5)
    if opt.mode == "pathomic" and opt.fusion_type == "mmdynamics":
        variables = model.init({"params": k_model, "dropout": k_drop},
                               sample_batch.get("x_path"),
                               sample_batch.get("x_omic"), train=True,
                               infer=True)
    elif opt.mode == "pathomic":
        variables = model.init({"params": k_model, "dropout": k_drop},
                               x_path=sample_batch.get("x_path"),
                               x_omic=sample_batch.get("x_omic"), train=True)
    else:
        x = (sample_batch["x_path"] if opt.mode == "path"
             else sample_batch["x_omic"])
        variables = model.init({"params": k_model, "dropout": k_drop},
                               x, train=True)
    # reference order: pretrained ResNet18 weights load in the constructor
    # (resnets.py:275-284) and init_net -> init_weights runs AFTER it
    # (utils.py:263-265), so --init_type normal/xavier/kaiming/orthogonal
    # deliberately clobbers the pretrained trunk (only max/none keep it) —
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
    banks = None
    if opt.CRD_distill == 1:
        embed = Embed(opt.feat_dim)
        feat_width = opt.mmhid if opt.mode == "pathomic" else (
            opt.path_dim if opt.mode == "path" else opt.omic_dim)
        dummy = jnp.zeros((1, feat_width))
        ks, kt = jax.random.split(k_embed)
        params["crd_fuse_s"] = embed.init(ks, dummy)["params"]
        params["crd_fuse_t"] = embed.init(kt, dummy)["params"]
        banks = {"fuse": init_bank(k_bank, n_data, opt.feat_dim)}
    if opt.tSVD_loss and opt.mode == "pathomic":
        b = opt.batch_size
        banks = banks or {}
        # two distinct buffers — sharing one would break donation
        banks["tsvd"] = TsvdAux(aux1=jnp.zeros((opt.n_views, b, b)),
                                aux2=jnp.zeros((opt.n_views, b, b)),
                                mu=jnp.asarray(opt.mu),
                                tnn1=jnp.asarray(0.0),
                                tnn2=jnp.asarray(0.0))
    opt_state = tx.init(params)
    copy = lambda t: jax.tree_util.tree_map(jnp.array, t)  # fresh buffers —
    # aliasing params would break buffer donation in the jitted step
    # --global_step seeds the step counter (reference iter_num =
    # opt.global_step, train_test_MT.py:104) — it feeds the EMA warm-up
    return TrainState(step=jnp.asarray(opt.global_step, jnp.int32),
                      params=params,
                      batch_stats=batch_stats, opt_state=opt_state,
                      ema_params=copy(params["model"]),
                      ema_batch_stats=copy(batch_stats), banks=banks)


def build_mmdynamics_train_step(opt, model, tx):
    """Train step for ``--fusion_type mmdynamics``
    (``PathomicNet_dynamics``, ``networks_new.py:372-418``): the MMDynamic
    fusion computes its own composite loss (modality CEs + TCP confidence
    regression + fused CE); no mean-teacher machinery."""

    def train_step(state: TrainState, batch, key, crd_weight):
        k_aug, k_drop = jax.random.split(key)
        views = augment_views(k_aug, batch["path_views"],
                              dtype=_dtype(opt))
        x1 = views[:, 0]

        def loss_fn(params):
            (loss, mm_logit, _), mut = model.apply(
                {"params": params["model"], "batch_stats": state.batch_stats},
                x1, batch["omic"], batch["g"], train=True,
                rngs={"dropout": k_drop}, mutable=["batch_stats"])
            loss = loss + opt.lambda_reg * l1_regularizer(
                params["model"], opt.reg_type)
            return loss, (mut.get("batch_stats", {}), mm_logit)

        (loss, (new_stats, mm_logit)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss,
                   "correct_fuse": jnp.sum(
                       jnp.argmax(mm_logit, 1) == batch["g"])}
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_stats,
                                  opt_state=new_opt_state)
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,))


def build_teacher_train_step(opt, model, tx, masking: bool = False):
    """Returns jitted ``train_step(state, batch, key, crd_weight) ->
    (state, metrics)``.

    ``masking=True`` builds the CLAT stage-1 variant
    (``train_test_MT_SP_Masking.py:190-220``): the batch carries 4 views +
    a SLIC label map; superpixel/omic saliency masks are computed on-device
    and two masked student views are distilled against EMA forwards on the
    two extra views.  The flag is static — the driver selects the masked
    step once ``epoch > start_epoch``.
    """
    from ..data.augment import augment_views_with_mask
    from ..masking.superpixel import superpixel_attention_mask

    embed = Embed(opt.feat_dim)
    use_images = opt.mode in ("path", "pathomic")
    if opt.supcon_distill == 1 and opt.task != "grad":
        raise NotImplementedError(
            "--supcon_distill needs class labels (task=grad); the flag is "
            "parsed-but-dead in the reference (MICCAI-2022/options.py:98)")
    if opt.CRD_gate and (opt.task != "grad" or opt.pos_mode
                         not in ("exact", "relax")):
        raise NotImplementedError(
            "--CRD_gate implements the single-positive weighted_CRDLoss "
            "(CRD_loss.py:8-50): task=grad with pos_mode exact/relax only")

    def train_step(state: TrainState, batch, key, crd_weight):
        k_aug, k_drop, k_drop_ema, k_drop_m = jax.random.split(key, 4)
        sp_mask = None
        if masking:
            views, sp_mask = augment_views_with_mask(
                k_aug, batch["path_views"], batch["sp_mask"],
                dtype=_dtype(opt))
            x1, x2 = views[:, 0], views[:, 1]
            xm1, xm2 = views[:, 2], views[:, 3]
        elif use_images:
            views = augment_views(k_aug, batch["path_views"],
                                  dtype=_dtype(opt))
            x1, x2 = views[:, 0], views[:, 1]
        else:
            x1 = x2 = None

        # EMA teacher forward (train mode: BN batch stats + its own stats
        # advance — reference runs ema_model un-eval'd under no_grad,
        # train_test_MT.py:143-145)
        ema_raw, ema_mut = _apply(opt, model, state.ema_params,
                                  state.ema_batch_stats, batch, x2,
                                  train=True, rng=k_drop_ema, mutable=True)
        ema_out = adapt_output(opt, jax.tree_util.tree_map(
            jax.lax.stop_gradient, ema_raw))

        def loss_fn(params):
            raw, mut = _apply(opt, model, params["model"], state.batch_stats,
                              batch, x1, train=True, rng=k_drop, mutable=True)
            out = adapt_output(opt, raw)
            loss_task, parts = task_losses(opt, out, batch)
            metrics = dict(parts)
            # running-stat trajectories; the masking block may chain further
            # train-mode forwards onto these (--masking_bn)
            masked_stats = mut.get("batch_stats", {})
            masked_ema_stats = ema_mut.get("batch_stats", {})

            loss = opt.lambda_nll * loss_task if opt.task == "grad" \
                else opt.lambda_cox * loss_task
            loss = loss + opt.lambda_reg * l1_regularizer(
                params["model"], opt.reg_type)

            new_banks = state.banks
            if opt.CRD_distill == 1:
                f_s = embed.apply({"params": params["crd_fuse_s"]},
                                  _branch_feat(opt, out))
                f_t = embed.apply({"params": params["crd_fuse_t"]},
                                  jax.lax.stop_gradient(
                                      _branch_feat(opt, ema_out)))
                out_s, out_t, bank = crd_scores(
                    state.banks["fuse"], f_s, f_t, batch["index"],
                    batch["sample_idx"], T=opt.nce_t, momentum=opt.nce_m)
                # v1 expects a single positive in slot 0; with multi_pos
                # sampling the P positives are averaged (ContrastLoss_v2
                # semantics) instead of the reference's shape crash.
                n_pos = (1 if opt.task == "surv"
                         or opt.pos_mode in ("exact", "relax") else opt.nce_p)
                if opt.CRD_gate:
                    # weighted_CRDLoss (CRD_loss.py:8-50, dead in the
                    # reference): gate each anchor side by whose per-sample
                    # task loss is larger (log-prob preds -> per-sample NLL)
                    from ..contrast import (crd_gate_weights,
                                            weighted_contrast_loss)
                    pred_s = _branch_pred(opt, out)
                    pred_t = _branch_pred(opt, ema_out)
                    g_col = batch["g"][:, None]
                    ls = -jnp.take_along_axis(pred_s, g_col, 1)[:, 0]
                    lt = -jnp.take_along_axis(pred_t, g_col, 1)[:, 0]
                    s_w, t_w = crd_gate_weights(ls, lt)
                    loss_crd = (
                        weighted_contrast_loss(out_s, s_w, opt.n_data)
                        + weighted_contrast_loss(out_t, t_w, opt.n_data))
                else:
                    loss_crd = (contrast_loss(out_s, opt.n_data, n_pos=n_pos)
                                + contrast_loss(out_t, opt.n_data,
                                                n_pos=n_pos))
                loss = loss + crd_weight * loss_crd
                metrics["loss_CRD"] = crd_weight * loss_crd
                new_banks = dict(state.banks)
                new_banks["fuse"] = bank
            else:
                metrics["loss_CRD"] = jnp.asarray(0.0)

            if opt.pred_distill == 1:
                loss_kd = opt.KD_weight * pred_kd(opt, out, ema_out)
                loss = loss + loss_kd
                metrics["loss_KD"] = loss_kd
            else:
                metrics["loss_KD"] = jnp.asarray(0.0)

            if opt.SP_distill == 1 and opt.mode == "pathomic":
                loss_sp = opt.SP_weight * (
                    sp_loss(out.fuse_feat, ema_out.fuse_feat)
                    + sp_loss(out.path_feat, ema_out.path_feat)
                    + sp_loss(out.omic_feat, ema_out.omic_feat)) / 3.0
                loss = loss + loss_sp
                metrics["loss_SP"] = loss_sp
            else:
                metrics["loss_SP"] = jnp.asarray(0.0)

            if opt.orth_loss and opt.mode == "pathomic":
                loss = loss + orth_loss(out.path_feat, out.omic_feat)

            if opt.supcon_distill == 1:
                # --supcon_distill is parsed-but-dead in the reference
                # (options.py:98-99, the loss never imported); here it gets
                # live semantics: SupCon over the L2-normalised student/EMA
                # branch embeddings with the class labels
                from ..losses import supcon_loss
                f_a = _branch_feat(opt, out)
                f_b = _branch_feat(opt, ema_out)
                norm = lambda f: f / jnp.maximum(
                    jnp.linalg.norm(f, axis=1, keepdims=True), 1e-12)
                loss_sc = opt.supcon_weight * supcon_loss(
                    jnp.stack([norm(f_a), norm(f_b)], axis=1),
                    labels=batch["g"])
                loss = loss + loss_sc
                metrics["loss_supcon"] = loss_sc

            if masking:
                # CLAT stage-1 comprehensive learning: saliency masks from
                # an eval-mode input-gradient pass (:62-71), masked student
                # views distilled against EMA forwards on the extra views
                # (:198-220).
                def cost_fn(xp, xo):
                    o = model.apply({"params": params["model"],
                                     "batch_stats": state.batch_stats},
                                    x_path=xp, x_omic=xo, train=False)
                    return nll_loss(o.pred_fuse, batch["g"])

                path_mask, omic_mask = superpixel_attention_mask(
                    cost_fn, x1, batch["omic"], sp_mask,
                    opt.num_superpixels, opt.Path_K, opt.Omic_K)
                x_path_masked = x1 * (1.0 - path_mask[..., None])
                x_omic_masked = batch["omic"] * (1.0 - omic_mask)
                km1, km2 = jax.random.split(k_drop_m)
                # --masking_bn chain (reference): torch advances BN running
                # stats in-place through EVERY train-mode forward, so the
                # masked forwards' stat updates chain onto the view-1
                # forward's (and the EMA masked forwards onto the EMA's).
                # "discard" keeps only the view-1 / EMA-view-2 updates.
                # Train-mode BN normalises by the CURRENT batch's stats, so
                # this choice affects only the running-stat trajectory
                # (eval metrics), never this step's losses or gradients.
                chain_bn = opt.masking_bn == "chain"
                mom = 0.9   # BN momentum of every model BN (resnet.py:158)
                tmap = jax.tree_util.tree_map

                # masked student forward 1: genuinely new trunk input
                st_stats = (masked_stats if chain_bn
                            else state.batch_stats)
                out_m1_raw, mut_m1 = model.apply(
                    {"params": params["model"], "batch_stats": st_stats},
                    x_path=x_path_masked, x_omic=batch["omic"], train=True,
                    rngs={"dropout": km1}, mutable=["batch_stats"])
                out_m1 = adapt_output(opt, out_m1_raw)

                # masked student forward 2 re-runs the path trunk on the
                # SAME view x1 as the main forward in the reference
                # (train-BN + no trunk dropout -> bit-identical tensors),
                # so the trunk is REUSED: only the omic/fusion branches
                # run, and AD merges the trunk backward into the main one
                # (saves a full ResNet backward per step).
                st_stats = (mut_m1.get("batch_stats", {}) if chain_bn
                            else state.batch_stats)
                out_m2_raw, mut_m2 = model.apply(
                    {"params": params["model"], "batch_stats": st_stats},
                    x_omic=x_omic_masked, train=True,
                    rngs={"dropout": km2}, mutable=["batch_stats"],
                    path_feats=(out.path_feat_f3, out.path_feat,
                                out.hazard_path, out.pred_path))
                out_m2 = adapt_output(opt, out_m2_raw)
                if chain_bn:
                    # stat tree after m1 then m2: branches m2 actually ran
                    # (fusion) advance via its own mutation; the path trunk
                    # it did NOT run is replayed in closed form.  Main fwd:
                    # r1 = mom*r0 + (1-mom)*s1; m2's trunk pass would be
                    # r3 = mom*r2 + (1-mom)*s1 = mom*r2 + r1 - mom*r0.
                    new_tree = dict(mut_m1.get("batch_stats", {}))
                    new_tree.update(
                        {k: v for k, v in
                         mut_m2.get("batch_stats", {}).items()
                         if k != "path_net"})
                    if "path_net" in new_tree:
                        new_tree["path_net"] = tmap(
                            lambda a2, a1, a0: mom * a2 + a1 - mom * a0,
                            new_tree["path_net"],
                            masked_stats["path_net"],
                            state.batch_stats["path_net"])
                    masked_stats = new_tree

                sg = lambda t: jax.tree_util.tree_map(
                    lambda x: None if x is None else jax.lax.stop_gradient(x),
                    t, is_leaf=lambda x: x is None)
                # EMA masked forwards: a data-independent pair with shared
                # frozen params -> one vmapped 2-slice apply.  vmap keeps BN
                # batch statistics PER SLICE (reductions stay inside the
                # mapped axis), so the math is exactly the sequential
                # reference's; the convs lower to plain 2B-batch convs,
                # which measure ~20% faster at the 64-channel stages.
                ema_in = (masked_ema_stats if chain_bn
                          else state.ema_batch_stats)

                def ema_fwd(xp, key):
                    o, mut = model.apply(
                        {"params": state.ema_params, "batch_stats": ema_in},
                        x_path=xp, x_omic=batch["omic"], train=True,
                        rngs={"dropout": key}, mutable=["batch_stats"])
                    return o, mut.get("batch_stats", {})

                ema_pair_raw, ema_stats_pair = jax.vmap(ema_fwd)(
                    jnp.stack([xm1, xm2]), jnp.stack([km1, km2]))
                ema_m1 = adapt_output(opt, sg(tmap(lambda a: a[0],
                                                   ema_pair_raw)))
                ema_m2 = adapt_output(opt, sg(tmap(lambda a: a[1],
                                                   ema_pair_raw)))
                if chain_bn:
                    # sequential replay: r1e = slice0 output; the slice1
                    # output ran from ema_in, so chaining gives
                    # r2e = mom*r1e + (1-mom)*s2 = mom*r1e + slice1 - mom*r_in
                    masked_ema_stats = jax.lax.stop_gradient(tmap(
                        lambda p, r: mom * p[0] + p[1] - mom * r,
                        ema_stats_pair, ema_in))
                loss_masking = (
                    pred_kd_loss(out_m1.pred_fuse, ema_m1.pred_fuse, opt.task)
                    + pred_kd_loss(out_m2.pred_fuse, ema_m2.pred_fuse,
                                   opt.task))
                loss = loss + loss_masking
                metrics["loss_masking"] = loss_masking

            if opt.tSVD_loss and opt.mode == "pathomic":
                # M3LR low-rank constraint (train_test_tSVD.py:300-431)
                feats1, feats2 = build_view_features(
                    opt.n_views, out.fuse_feat, ema_out.fuse_feat,
                    out.path_feat, ema_out.path_feat,
                    out.omic_feat, ema_out.omic_feat)
                adj1 = update_adj_tensor(feats1)   # [V, B, B]
                adj2 = update_adj_tensor(feats2)
                tsvd: TsvdAux = state.banks["tsvd"]

                def do_update(t):
                    # ADMM aux refresh every aux_iter batches (:376-413)
                    a1, tnn1 = update_aux(
                        jnp.transpose(jax.lax.stop_gradient(adj1), (1, 2, 0)),
                        opt.Lambda_global / t.mu)
                    a2, tnn2 = update_aux(
                        jnp.transpose(jax.lax.stop_gradient(adj2), (1, 2, 0)),
                        opt.Lambda_global / t.mu)
                    new_mu = jnp.minimum(t.mu * opt.pho, opt.max_mu)
                    return TsvdAux(jnp.transpose(a1, (2, 0, 1)),
                                   jnp.transpose(a2, (2, 0, 1)),
                                   new_mu, tnn1, tnn2)

                tsvd = jax.lax.cond(batch["tsvd_update"], do_update,
                                    lambda t: t, tsvd)
                frob = lambda a, x: jnp.sum(
                    jnp.sum((a - x) ** 2, axis=(1, 2)))
                if opt.tSVD_mode == "path":
                    loss_tsvd = tsvd.mu / 2.0 * frob(adj1, tsvd.aux1)
                elif opt.tSVD_mode == "omic":
                    loss_tsvd = tsvd.mu / 2.0 * frob(adj2, tsvd.aux2)
                else:  # pathomic
                    loss_tsvd = tsvd.mu / 2.0 * (frob(adj1, tsvd.aux1)
                                                 + frob(adj2, tsvd.aux2))
                loss = loss + loss_tsvd
                metrics["loss_tsvd"] = loss_tsvd
                metrics["tnn_path"] = tsvd.tnn1
                metrics["tnn_omic"] = tsvd.tnn2
                new_banks = dict(new_banks or {})
                new_banks["tsvd"] = tsvd

            metrics["loss"] = loss
            return loss, (metrics, masked_stats, masked_ema_stats,
                          new_banks, out)

        grads, (metrics, new_stats, new_ema_stats, new_banks, out) = jax.grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = update_ema(new_params["model"], state.ema_params,
                             opt.ema_decay, state.step)

        # train accuracy counts (train_test_MT.py:254-260) / risk outputs
        if opt.task == "grad":
            for name, pred in (("fuse", out.pred_fuse),
                               ("path", out.pred_path),
                               ("omic", out.pred_omic)):
                if pred is not None:
                    metrics[f"correct_{name}"] = jnp.sum(
                        jnp.argmax(pred, axis=1) == batch["g"])
        else:
            metrics["risk_fuse"] = (out.pred_fuse.reshape(-1)
                                    if out.pred_fuse is not None else 0)
            metrics["risk_path"] = (out.pred_path.reshape(-1)
                                    if out.pred_path is not None else 0)
            metrics["risk_omic"] = (out.pred_omic.reshape(-1)
                                    if out.pred_omic is not None else 0)

        new_state = state.replace(
            step=state.step + 1, params=new_params, batch_stats=new_stats,
            opt_state=new_opt_state, ema_params=new_ema,
            ema_batch_stats=new_ema_stats,
            banks=new_banks)
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,))


def build_eval_step(opt, model):
    """Jitted eval forward: returns branch predictions + per-batch loss sums
    (reference ``test()``, ``train_test_MT.py:340-458``)."""

    def eval_step(params, batch_stats, batch, key):
        if opt.mode in ("path", "pathomic"):
            x = batch["path_views"][:, 0]
            if opt.test_augment:
                x = augment_view(key, x, dtype=_dtype(opt))
            else:
                # normalise in the compute dtype: the model casts to it at
                # conv1 anyway, and f32 here costs an extra 100 MB pass
                dt = _dtype(opt)
                x = (x.astype(dt) / jnp.asarray(127.5, dt)
                     - jnp.asarray(1.0, dt))
        else:
            x = None
        if opt.mode == "pathomic" and opt.fusion_type == "mmdynamics":
            mm_logit = model.apply(
                {"params": params, "batch_stats": batch_stats},
                x, batch["omic"], train=False, infer=True)
            pred = jax.nn.log_softmax(mm_logit, axis=1)
            out = PathomicOutput(None, None, None, None, mm_logit, None,
                                 None, pred, None, None)
            _, parts = task_losses(opt, out, batch)
            return out, parts
        raw = _apply(opt, model, params, batch_stats, batch, x,
                     train=False, rng=None, mutable=False)
        out = adapt_output(opt, raw)
        loss_task, parts = task_losses(opt, out, batch)
        return out, parts

    return jax.jit(eval_step)
