"""XLA compiler-flag A/B on the flagship conv-heavy program (VERDICT-r4 #6).

PROFILE_r03 pinned the 26.7% MFU plateau on XLA's conv efficiency at
ResNet18's 64-ch/stem shapes with four counter-experiments; the one
untried lever was a compiler-options sweep.  This tool times the
fwd+bwd task-loss chain (the same conv-heavy program profile_step.py
ablates) under per-variant ``compiler_options`` passed through
``jax.jit(...).lower(...).compile(...)`` — the only channel that reaches
the server-side compiler through the tunnel (client env XLA_FLAGS do
not).  Honest protocol per CLAUDE.md: one jitted lax.scan chain of
N steps, carry-threaded input, value-fetch sync, best-of-REPS.

Variants are known-real TPU flags relevant to a single-chip conv
program (collective/megacore flags are no-ops on one v5e chip):
  - latency-hiding scheduler
  - scoped-VMEM limit (bigger/smaller fusion budget)
A variant whose options the backend rejects is recorded as "rejected",
which is itself evidence (the tunnel's compile surface).

Usage: MML_PLATFORM= python tools/xla_flag_lab.py [n_steps]
Writes one JSON line; paste into PROFILE_r04.md.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import BATCH, SIZE, N_DATA, _stack_batches  # noqa: E402

N_STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 50
REPS = 3
DTYPE = os.environ.get("MML_BENCH_DTYPE", "bfloat16")

VARIANTS = [
    ("default", {}),
    ("lhs", {"xla_tpu_enable_latency_hiding_scheduler": "true"}),
    ("vmem32m", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ("vmem96m", {"xla_tpu_scoped_vmem_limit_kib": "98304"}),
]


def main():
    import jax
    import jax.numpy as jnp

    from multimodal_learning_tpu.config import Options
    from multimodal_learning_tpu.data.augment import augment_views
    from multimodal_learning_tpu.models.factory import define_model
    from multimodal_learning_tpu.train.optim import make_optimizer
    from multimodal_learning_tpu.train.schedules import make_lr_schedule
    from multimodal_learning_tpu.train.steps import init_teacher_state

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

    nprng = np.random.default_rng(0)
    tbatches = jax.device_put(_stack_batches(nprng, views=2))
    one = jax.tree_util.tree_map(lambda x: x[0], tbatches)

    aug_dt = jnp.bfloat16 if DTYPE == "bfloat16" else jnp.float32
    x1 = augment_views(jax.random.PRNGKey(2), one["path_views"],
                       dtype=aug_dt)[:, 0]
    x1 = jax.device_put(x1)

    tx2 = make_optimizer(opt, make_lr_schedule(opt, 50))
    opt_state0 = tx2.init(state0.params["model"])

    def fb_chain(params, stats, opt_state, key, n):
        # input depends on the carry (x1 + loss*0) so XLA cannot hoist the
        # model out of the scan (CLAUDE.md scan-hoisting trap)
        def body(carry, i):
            params, stats, opt_state, k, tok = carry
            k, sub = jax.random.split(k)

            def loss_fn(p):
                raw, mut = model.apply(
                    {"params": p, "batch_stats": stats},
                    x_path=x1 + tok.astype(x1.dtype) * 0,
                    x_omic=one["omic"], train=True,
                    rngs={"dropout": sub}, mutable=["batch_stats"])
                lp = jnp.take_along_axis(raw.pred_fuse,
                                         one["g"][:, None], 1)
                return -jnp.mean(lp), mut["batch_stats"]

            (loss, stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            upd, opt_state = tx2.update(grads, opt_state, params)
            params = jax.tree_util.tree_map(lambda a, b: a + b, params, upd)
            return (params, stats, opt_state, k, loss * 1e-30), loss
        carry0 = (params, stats, opt_state, key, jnp.float32(0))
        _, outs = jax.lax.scan(body, carry0, jnp.arange(n))
        return outs[-1]

    args = (state0.params["model"], state0.batch_stats, opt_state0,
            jax.random.PRNGKey(4))
    lowered = jax.jit(fb_chain, static_argnums=(4,)).lower(*args, N_STEPS)

    results = {}
    for name, options in VARIANTS:
        try:
            compiled = lowered.compile(
                compiler_options=options if options else None)
        except Exception as e:  # backend rejected the option
            print(f"{name:>10}: REJECTED ({type(e).__name__}: {e})",
                  flush=True)
            results[name] = {"rejected": str(e)[:200]}
            continue
        # warm + sync
        float(compiled(*args))
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            float(compiled(*args))
            best = min(best, time.perf_counter() - t0)
        ms = 1e3 * best / N_STEPS
        pps = BATCH * N_STEPS / best
        # per-step FLOPs from the compiled program itself (cost_analysis of
        # a lax.scan counts the body once — i.e. one step), same accounting
        # as bench.py's MFU report
        tflops = mfu = None
        try:
            cost = compiled.cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            step_flops = float(cost["flops"])
            tflops = step_flops / (best / N_STEPS) / 1e12
            mfu = 100 * tflops / 197.0  # v5e bf16 MXU peak
        except Exception:
            pass
        tf_s = f"{tflops:6.1f} TF/s ({mfu:4.1f}% MFU)" if tflops else "n/a"
        print(f"{name:>10}: {ms:8.2f} ms/step  {pps:8.1f} pps  {tf_s}",
              flush=True)
        results[name] = {"ms_per_step": round(ms, 2), "pps": round(pps, 1)}
        if tflops:
            results[name].update(tflops=round(tflops, 1),
                                 mfu_pct_v5e_bf16=round(mfu, 1))

    print(json.dumps({"n_steps": N_STEPS, "reps": REPS, "batch": BATCH,
                      "size": SIZE, "dtype": DTYPE,
                      "variants": results}))


if __name__ == "__main__":
    main()
