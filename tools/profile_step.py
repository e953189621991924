"""Phase-ablation profile of the flagship teacher train step.

The tunnel has no jax.profiler support, so phases are timed by ablation:
each phase is its own jitted lax.scan chain (the honest protocol from
bench.py — one sync per measurement, value-fetch barrier), and the phase
cost is read off the differences:

    aug            on-device augmentation of the two uint8 views
    fwd            student forward (train mode, batch stats advance)
    fwd_bwd        + value_and_grad of the task loss + adam update
    ema            EMA-teacher forward alone
    full           the shipped build_teacher_train_step

Usage: python tools/profile_step.py [n_steps]    (TPU by default)
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import BATCH, SIZE, N_DATA, N_DISTINCT, _stack_batches  # noqa: E402

N_STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 30
REPS = 2
DTYPE = os.environ.get("MML_BENCH_DTYPE", "bfloat16")


def main():
    import jax
    import jax.numpy as jnp

    from multimodal_learning_tpu.config import Options
    from multimodal_learning_tpu.data.augment import augment_views
    from multimodal_learning_tpu.models.factory import define_model
    from multimodal_learning_tpu.train.optim import make_optimizer
    from multimodal_learning_tpu.train.schedules import make_lr_schedule
    from multimodal_learning_tpu.train.steps import (
        build_teacher_train_step, init_teacher_state)

    opt = Options(mode="pathomic", task="grad", path_dim=128, omic_dim=128,
                  mmhid=128, feat_dim=128, input_size_path=SIZE,
                  batch_size=BATCH, CRD_distill=1, pred_distill=1,
                  num_teachers=2, pos_mode="exact", nce_p=1, nce_k=512,
                  n_data=N_DATA, reg_type="omic", niter_decay=30,
                  compute_dtype=DTYPE)
    model = define_model(opt)
    tx = make_optimizer(opt, make_lr_schedule(opt, 50))
    rng = jax.random.PRNGKey(0)
    sample = {"x_path": jnp.zeros((1, SIZE, SIZE, 3)),
              "x_omic": jnp.zeros((1, 80))}
    state0 = init_teacher_state(opt, model, tx, rng, N_DATA, sample)
    full_step = build_teacher_train_step(opt, model, tx)

    nprng = np.random.default_rng(0)
    tbatches = jax.device_put(_stack_batches(nprng, views=2))
    one = jax.tree_util.tree_map(lambda x: x[0], tbatches)
    cw = jnp.asarray(0.1)

    def timed(name, chain, *args):
        chain_j = jax.jit(chain, static_argnames=("n",))
        r = chain_j(*args, n=2)
        jax.tree_util.tree_map(
            lambda x: jax.block_until_ready(x), r)
        float(jax.tree_util.tree_leaves(r)[-1].sum())
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            r = chain_j(*args, n=N_STEPS)
            float(jax.tree_util.tree_leaves(r)[-1].sum())
            best = min(best, time.perf_counter() - t0)
        ms = 1e3 * best / N_STEPS
        print(f"{name:>10}: {ms:8.2f} ms/step   "
              f"({BATCH * N_STEPS / best:8.1f} pps)")
        return ms

    # --- aug: augmentation of both views only (in the step's compute
    # dtype — the full step augments in bf16 by default, so an f32 ablation
    # here would overstate the subtracted aug cost) ----------------------
    aug_dt = jnp.bfloat16 if DTYPE == "bfloat16" else jnp.float32

    def aug_chain(key, n):
        def body(k, i):
            k, sub = jax.random.split(k)
            v = augment_views(sub, one["path_views"], dtype=aug_dt)
            return k, jnp.mean(v.astype(jnp.float32))
        _, outs = jax.lax.scan(body, key, jnp.arange(n))
        return outs[-1]

    t_aug = timed("aug", aug_chain, jax.random.PRNGKey(1))

    # --- fwd: student forward, train mode ------------------------------
    x1 = augment_views(jax.random.PRNGKey(2), one["path_views"],
                       dtype=aug_dt)[:, 0]
    x1 = jax.device_put(x1)

    def fwd_chain(params, stats, key, n):
        # the input must depend on the carry (x1 + tok*0): with loop-invariant
        # inputs AND params XLA hoists the entire forward out of the scan
        # (train-mode BN output doesn't depend on the carried running stats)
        # and the chain reads ~0.4 ms/step of pure fiction — see CLAUDE.md.
        def body(carry, i):
            stats, tok, k = carry
            k, sub = jax.random.split(k)
            raw, mut = model.apply(
                {"params": params, "batch_stats": stats},
                x_path=x1 + tok.astype(x1.dtype) * 0, x_omic=one["omic"],
                train=True, rngs={"dropout": sub},
                mutable=["batch_stats"])
            out = jnp.mean(raw.pred_fuse)
            return (mut["batch_stats"], out * 1e-30, k), out
        (_, _, _), outs = jax.lax.scan(body, (stats, jnp.float32(0), key),
                                       jnp.arange(n))
        return outs[-1]

    t_fwd = timed("fwd", fwd_chain, state0.params["model"],
                  state0.batch_stats, jax.random.PRNGKey(3))

    # --- fwd_bwd: task loss grad + adam, no EMA / CRD / KD -------------
    tx2 = make_optimizer(opt, make_lr_schedule(opt, 50))
    opt_state0 = tx2.init(state0.params["model"])

    def fb_chain(params, stats, opt_state, key, n):
        def body(carry, i):
            params, stats, opt_state, k = carry
            k, sub = jax.random.split(k)

            def loss_fn(p):
                raw, mut = model.apply(
                    {"params": p, "batch_stats": stats},
                    x_path=x1, x_omic=one["omic"], train=True,
                    rngs={"dropout": sub}, mutable=["batch_stats"])
                lp = jnp.take_along_axis(raw.pred_fuse,
                                         one["g"][:, None], 1)
                return -jnp.mean(lp), mut["batch_stats"]

            (loss, stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            upd, opt_state = tx2.update(grads, opt_state, params)
            params = jax.tree_util.tree_map(
                lambda a, b: a + b, params, upd)
            return (params, stats, opt_state, k), loss
        (_, _, _, _), outs = jax.lax.scan(
            body, (params, stats, opt_state, key), jnp.arange(n))
        return outs[-1]

    t_fb = timed("fwd_bwd", fb_chain, state0.params["model"],
                 state0.batch_stats, opt_state0, jax.random.PRNGKey(4))

    # --- ema: EMA-teacher forward alone ---------------------------------
    t_ema = timed("ema", fwd_chain, state0.ema_params,
                  state0.ema_batch_stats, jax.random.PRNGKey(5))

    # --- full step -------------------------------------------------------
    def full_chain(state, key, n):
        def body(carry, i):
            st, k = carry
            k, sub = jax.random.split(k)
            st, metrics = full_step(st, one, sub, cw)
            return (st, k), metrics["loss"]
        (_, _), outs = jax.lax.scan(body, (state, key), jnp.arange(n))
        return outs[-1]

    t_full = timed("full", full_chain, state0, jax.random.PRNGKey(6))

    print(json.dumps({
        "aug_ms": round(t_aug, 2), "fwd_ms": round(t_fwd, 2),
        "fwd_bwd_ms": round(t_fb, 2), "ema_fwd_ms": round(t_ema, 2),
        "full_ms": round(t_full, 2),
        "other_ms": round(t_full - t_fb - t_ema - t_aug, 2),
        "dtype": DTYPE}))


if __name__ == "__main__":
    main()
