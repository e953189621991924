"""Throughput benchmark: GBMLGG ROI patches/sec/chip (train+eval).

Runs the flagship multimodal mean-teacher config (paper dims: ResNet18 +
MaxNet + Kronecker fusion, 512x512 patches, batch 16, pred-KD + CRD bank) on
the available accelerator and reports steady-state patches/sec for the full
train step (augment + student fwd + EMA fwd + losses + backward + Adam + EMA
+ bank update) and the eval forward.

Measurement protocol (shaped by the dev rig's TPU tunnel, which adds ~25 ms
per host<->device sync, fans independent executions out to a pool, and shows
~1.6x contention swings):
- the entire measured run is ONE jitted ``lax.scan`` of N_STEPS steps, so
  there is exactly one fixed sync overhead per measurement and every
  iteration is data-dependent (single-chip serial execution by construction);
- synchronisation is a value fetch (``float()``), not ``block_until_ready``;
- best-of-REPS rejects pool contention.  The fixed overhead is NOT
  subtracted — reported numbers are conservative.

Baseline: the same workload shape on PyTorch CPU (the reference repo is
CUDA-or-CPU torch; this container has torch-CPU), measured once and cached
in ``.bench_baseline.json``.

Wedge-proof emission protocol (round-3 lesson: a wedged tunnel + the driver's
external timeout produced `rc 124, parsed: null` — NO number for the round):
- a cumulative JSON line is printed to stdout after EVERY measurement phase
  (flagship train first, then eval, then each family), marked
  ``"partial": true`` until the run completes; the driver parses the LAST
  line in its captured tail, so a kill at any point still yields the most
  complete record measured so far;
- a heartbeat watchdog thread emits the partial record and hard-exits if no
  phase completes for MML_BENCH_STALL seconds (default 900 — generous vs
  any single legit compile even on a degraded 1-core host) or the total run
  exceeds MML_BENCH_TIMEOUT (default 1800); blocking XLA RPCs can't be
  interrupted, so ``os._exit`` it is;
- SIGTERM (the driver's `timeout`) also triggers a best-effort partial emit.

The final line (no "partial" key):
    {"metric": ..., "value": N, "unit": "patches/sec", "vs_baseline": N}
"""
from __future__ import annotations

import json
import os
import signal
import sys
import threading
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
CACHE = os.path.join(REPO, ".bench_baseline.json")

BATCH = 16
SIZE = 512
N_DATA = 256
N_STEPS = 100      # scan length: fixed ~25 ms sync is <=12% of the run
N_DISTINCT = 1     # one resident batch: per-step augmentation keys already
                   # make iterations distinct; avoids a 100 MB in-scan gather
REPS = 3
DTYPE = os.environ.get("MML_BENCH_DTYPE", "bfloat16")
FAMILIES = os.environ.get("MML_BENCH_FAMILIES", "1") not in ("0", "")


class Reporter:
    """Cumulative-emission state shared with the watchdog thread.

    Every completed measurement phase calls :meth:`update`, which rebuilds
    the headline record from everything measured so far and prints it as one
    JSON line (marked partial until :meth:`finish`).  ``beat()`` timestamps
    are what the stall watchdog monitors.
    """

    def __init__(self):
        self.detail = {"compute_dtype": DTYPE}
        self.times = {}          # phase -> seconds (train/eval)
        self.base = None         # torch-CPU pps
        self.t0 = time.monotonic()
        self.last_beat = self.t0
        self.done = False
        # RLock, not Lock: the SIGTERM handler runs in the MAIN thread and
        # calls update() — with a plain Lock a SIGTERM landing while the
        # main thread is inside update() would deadlock the handler and then
        # wedge the watchdog thread on the same lock (advisor r4).
        self._lock = threading.RLock()

    def beat(self, stage: str | None = None):
        self.last_beat = time.monotonic()
        if stage:  # phase marker for post-mortems of wedged runs
            print(f"[bench +{self.last_beat - self.t0:.0f}s] {stage}",
                  file=sys.stderr, flush=True)

    def _value(self):
        tt, te = self.times.get("train"), self.times.get("eval")
        if tt and te:
            return BATCH * N_STEPS * 2 / (tt + te)
        if tt:
            return BATCH * N_STEPS / tt
        return None

    def record(self) -> dict:
        value = self._value()
        detail = dict(self.detail)
        if self.base:
            detail["torch_cpu_pps"] = round(self.base, 2)
        return {"metric": "GBMLGG ROI patches/sec/chip (train+eval)",
                "value": round(value, 2) if value else None,
                "unit": "patches/sec",
                "vs_baseline": (round(value / self.base, 2)
                                if value and self.base else None),
                "detail": detail}

    def update(self, partial=True, error=None, **kv):
        with self._lock:
            for k, v in kv.items():
                self.detail[k] = round(v, 2) if isinstance(v, float) else v
            line = self.record()
            if partial:
                line["partial"] = True
            if error:
                line["error"] = error
            print(json.dumps(line), flush=True)
        self.beat()

    def finish(self):
        self.done = True
        self.update(partial=False)


def _start_watchdog(rep: Reporter):
    """Emit the partial record and hard-exit when measurement stalls (a
    wedged tunnel RPC: no phase completes for MML_BENCH_STALL seconds) or
    the whole run exceeds MML_BENCH_TIMEOUT.  Runs in a daemon thread —
    blocking XLA calls can't be interrupted, so bail via ``os._exit`` with
    the most complete record already on stdout."""
    stall = float(os.environ.get("MML_BENCH_STALL", "900") or 0)
    budget = float(os.environ.get("MML_BENCH_TIMEOUT", "1800") or 0)
    if stall <= 0 and budget <= 0:
        return

    def run():
        while not rep.done:
            time.sleep(10)
            now = time.monotonic()
            if rep.done:
                return
            if stall > 0 and now - rep.last_beat > stall:
                rep.update(error=f"no measurement progress for {stall:.0f}s "
                                 "(device unreachable or compile hung)")
                os._exit(3)
            if budget > 0 and now - rep.t0 > budget:
                rep.update(error=f"bench exceeded {budget:.0f}s budget")
                os._exit(3)

    t = threading.Thread(target=run, daemon=True)
    t.start()


def _make_batch(rng, views=2, sample_cols=1 + 512, with_mask=False):
    b = {
        "omic": rng.normal(size=(BATCH, 80)).astype(np.float32),
        "e": np.ones(BATCH, np.float32),
        "t": rng.exponential(20, BATCH).astype(np.float32),
        "g": rng.integers(0, 3, BATCH).astype(np.int32),
        "index": rng.choice(N_DATA, BATCH, replace=False).astype(np.int32),
    }
    if sample_cols:
        b["sample_idx"] = rng.integers(0, N_DATA, (BATCH, sample_cols),
                                       dtype=np.int32)
        b["sample_idx"][:, 0] = b["index"]
    b["path_views"] = rng.integers(0, 255, (BATCH, views, SIZE, SIZE, 3),
                                   dtype=np.uint8)
    if with_mask:
        b["sp_mask"] = rng.integers(0, 100, (BATCH, SIZE, SIZE),
                                    dtype=np.int32)
    return b


def _stack_batches(rng, **kw):
    bs = [_make_batch(rng, **kw) for _ in range(N_DISTINCT)]
    return {k: np.stack([b[k] for b in bs]) for k in bs[0]}


def bench_jax(rep: Reporter) -> None:
    import jax
    import jax.numpy as jnp

    from multimodal_learning_tpu.config import Options
    from multimodal_learning_tpu.models.factory import define_model
    from multimodal_learning_tpu.train.optim import make_optimizer
    from multimodal_learning_tpu.train.schedules import make_lr_schedule
    from multimodal_learning_tpu.train.steps import (
        build_eval_step, build_teacher_train_step, init_teacher_state)

    opt = Options(mode="pathomic", task="grad", path_dim=128, omic_dim=128,
                  mmhid=128, feat_dim=128, input_size_path=SIZE,
                  batch_size=BATCH, CRD_distill=1, pred_distill=1,
                  num_teachers=2, pos_mode="exact", nce_p=1, nce_k=512,
                  n_data=N_DATA, reg_type="omic", niter_decay=30,
                  compute_dtype=DTYPE,
                  pallas_fusion=os.environ.get("MML_BENCH_PALLAS", "train"))
    model = define_model(opt)
    tx = make_optimizer(opt, make_lr_schedule(opt, steps_per_epoch=50))
    rng = jax.random.PRNGKey(0)
    sample = {"x_path": jnp.zeros((1, SIZE, SIZE, 3)),
              "x_omic": jnp.zeros((1, 80))}
    rep.beat("model built; initialising state on device")
    state = init_teacher_state(opt, model, tx, rng, N_DATA, sample)
    train_step_fn = build_teacher_train_step(opt, model, tx)
    eval_step = build_eval_step(opt, model)
    rep.beat("state initialised; uploading batches")

    nprng = np.random.default_rng(0)
    tbatches = jax.device_put(_stack_batches(nprng, views=2))
    jax.block_until_ready(tbatches)
    rep.beat("train batches uploaded")
    ebatches = jax.device_put(_stack_batches(nprng, views=1))
    jax.block_until_ready(ebatches)
    rep.beat("eval batches uploaded; compiling train chain")
    cw = jnp.asarray(0.1)

    def train_chain(state, key, n):
        def body(carry, i):
            st, k = carry
            k, sub = jax.random.split(k)
            batch = jax.tree_util.tree_map(
                lambda x: x[i % N_DISTINCT], tbatches)
            st, metrics = train_step_fn(st, batch, sub, cw)
            return (st, k), metrics["loss"]
        (state, _), losses = jax.lax.scan(body, (state, key),
                                          jnp.arange(n))
        return state, losses[-1]

    # cost-analysis args as abstract shapes (the live state gets donated by
    # the chain below); the (second) compile this costs runs AFTER the first
    # number is out, so a wedge there can't null the record.
    cost_args = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
        (state, jax.tree_util.tree_map(lambda x: x[0], tbatches),
         jax.random.PRNGKey(1), cw))
    train_chain_j = jax.jit(train_chain, static_argnames=("n",),
                            donate_argnums=(0,))
    state, loss = train_chain_j(state, jax.random.PRNGKey(1), 2)  # compile
    float(loss)
    rep.beat("train chain compiled; measuring")
    train_time = float("inf")
    for r in range(REPS):
        k = jax.random.PRNGKey(100 + r)
        t0 = time.perf_counter()
        state, loss = train_chain_j(state, k, N_STEPS)
        float(loss)
        train_time = min(train_time, time.perf_counter() - t0)
        rep.beat()
    rep.times["train"] = train_time
    rep.update(train_pps=BATCH * N_STEPS / train_time)

    # compiled-cost accounting for the MFU report.  Lower ONE train step —
    # cost_analysis of a lax.scan counts the body once, not times the trip
    # count, so the chain is not usable here.
    step_flops = None
    try:
        cost = (train_step_fn.lower(*cost_args).compile().cost_analysis())
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        step_flops = float(cost["flops"])
    except Exception:
        pass
    if step_flops:
        # MFU vs the v5e bf16 MXU peak (197 TFLOP/s)
        train_tflops = step_flops * N_STEPS / train_time / 1e12
        rep.update(train_tflops=train_tflops,
                   step_gflops=step_flops / 1e9,
                   mfu_pct_v5e_bf16=100 * train_tflops / 197.0)
    del cost_args

    params, stats = state.params["model"], state.batch_stats

    def eval_chain(params, stats, init_tok, n):
        def body(tok, i):
            batch = jax.tree_util.tree_map(
                lambda x: x[i % N_DISTINCT], ebatches)
            batch = dict(batch)
            batch["path_views"] = batch["path_views"] + tok.astype(jnp.uint8)
            out, _ = eval_step(params, stats, batch, jax.random.PRNGKey(0))
            return jnp.sum(out.pred_fuse) * 1e-12, jnp.sum(out.pred_fuse)
        _, sums = jax.lax.scan(body, init_tok, jnp.arange(n))
        return jnp.sum(sums)

    eval_chain_j = jax.jit(eval_chain, static_argnames=("n",))
    float(eval_chain_j(params, stats, jnp.asarray(0.0), 2))  # compile
    rep.beat("eval chain compiled; measuring")
    eval_time = float("inf")
    for r in range(REPS):
        tok = jnp.asarray((r + 1) * 1e-9)
        t0 = time.perf_counter()
        float(eval_chain_j(params, stats, tok, N_STEPS))
        eval_time = min(eval_time, time.perf_counter() - t0)
        rep.beat()
    rep.times["eval"] = eval_time
    rep.update(eval_pps=BATCH * N_STEPS / eval_time)

    if os.environ.get("MML_BENCH_SERVE", "1") not in ("0", ""):
        try:
            bench_serve(rep, opt, model, params, stats)
        except Exception as exc:  # serving must degrade, not null, the run
            rep.update(serve_error=repr(exc)[:200])


def bench_serve(rep: Reporter, opt, model, params, stats) -> None:
    """Serving throughput off the exported StableHLO artifact (VERDICT r4
    #7): serialize the eval forward exactly as ``cli.export_model`` does,
    rehydrate it WITHOUT the model code, and measure it with the same honest
    chain protocol as every other number here.  Quantifies the beyond-parity
    serving replacement — the reference "serves" by re-running its torch
    test script with the full training stack in-process
    (``MICCAI-2022/test_cv_MT.py:47-163``)."""
    import jax
    import jax.numpy as jnp

    from multimodal_learning_tpu.serve.export import export_infer

    rep.beat("exporting serve artifact")
    blob, _ = export_infer(opt, model, params, stats, BATCH)
    rep.update(serve_artifact_mb=len(blob) / 1e6)
    exported = jax.export.deserialize(bytearray(blob))

    nprng = np.random.default_rng(7)
    x_path = jax.device_put(nprng.integers(
        0, 255, (BATCH, SIZE, SIZE, 3), dtype=np.uint8))
    x_omic = jax.device_put(nprng.normal(size=(BATCH, 80)).astype(np.float32))
    jax.block_until_ready((x_path, x_omic))
    rep.beat("serve inputs uploaded; compiling serve chain")

    def serve_chain(tok, n):
        def body(tok, i):
            # carry threaded through the INPUT so the artifact call can't be
            # hoisted out of the scan (CLAUDE.md measurement trap)
            out = exported.call(x_path + tok.astype(jnp.uint8), x_omic)
            key = "pred_fuse" if "pred_fuse" in out else sorted(out)[0]
            s = jnp.sum(out[key].astype(jnp.float32))
            return (s * 1e-12).astype(jnp.float32), s
        _, sums = jax.lax.scan(body, tok, jnp.arange(n))
        return jnp.sum(sums)

    serve_j = jax.jit(serve_chain, static_argnames=("n",))
    float(serve_j(jnp.asarray(0.0, jnp.float32), 2))  # compile
    rep.beat("serve chain compiled; measuring")
    best = float("inf")
    for r in range(REPS):
        tok = jnp.asarray((r + 1) * 1e-9, jnp.float32)
        t0 = time.perf_counter()
        float(serve_j(tok, N_STEPS))
        best = min(best, time.perf_counter() - t0)
        rep.beat()
    rep.update(serve_pps=BATCH * N_STEPS / best)


def _chain_pps(step_fn, state, batches, extra, n_steps, reps=3,
               reporter=None):
    """Best-of-reps patches/sec for one jitted train-step family, measured
    as a single in-jit lax.scan chain synced by a value fetch (see module
    docstring for why)."""
    import jax
    import jax.numpy as jnp

    def chain(state, key, n):
        def body(carry, i):
            st, k = carry
            k, sub = jax.random.split(k)
            batch = jax.tree_util.tree_map(
                lambda x: x[i % N_DISTINCT], batches)
            st, metrics = step_fn(st, batch, sub, extra)
            return (st, k), metrics["loss"]
        (state, _), losses = jax.lax.scan(body, (state, key),
                                          jnp.arange(n))
        return state, losses[-1]

    chain_j = jax.jit(chain, static_argnames=("n",), donate_argnums=(0,))
    state, loss = chain_j(state, jax.random.PRNGKey(1), 2)  # compile
    float(loss)
    best = float("inf")
    for r in range(reps):
        if reporter is not None:
            reporter.beat()
        t0 = time.perf_counter()
        state, loss = chain_j(state, jax.random.PRNGKey(100 + r), n_steps)
        float(loss)
        best = min(best, time.perf_counter() - t0)
    return BATCH * n_steps / best


_TEACHER_MEMO: dict = {}


def build_family(which: str):
    """Build one jitted step family at paper dims: returns
    ``(step_fn, state, stacked_batches_np, extra)`` with ``step_fn(state,
    batch, key, extra)``.  Shared by :func:`bench_families` (throughput) and
    ``tools/profile_hlo.py`` (per-op FLOP accounting), so both measure the
    exact same compiled step."""
    import jax
    import jax.numpy as jnp

    from multimodal_learning_tpu.config import Options
    from multimodal_learning_tpu.models.factory import define_model
    from multimodal_learning_tpu.train.optim import make_optimizer
    from multimodal_learning_tpu.train.schedules import make_lr_schedule
    from multimodal_learning_tpu.train.steps import (
        build_teacher_train_step, init_teacher_state)
    from multimodal_learning_tpu.train.student import (
        build_student_train_step, init_student_state)

    base = dict(mode="pathomic", task="grad", path_dim=128, omic_dim=128,
                mmhid=128, feat_dim=128, input_size_path=SIZE,
                batch_size=BATCH, pred_distill=1, n_data=N_DATA,
                reg_type="omic", niter_decay=30, compute_dtype=DTYPE)
    rng = jax.random.PRNGKey(0)
    nprng = np.random.default_rng(0)
    sample = {"x_path": jnp.zeros((1, SIZE, SIZE, 3)),
              "x_omic": jnp.zeros((1, 80))}

    if which == "tsvd":
        # M3LR t-SVD teacher (MIA22 recipe: n_views=4, Lambda_global=0.1)
        opt = Options(CRD_distill=0, tSVD_loss=True, tSVD_mode="pathomic",
                      n_views=4, Lambda_global=0.1, **base)
        model = define_model(opt)
        tx = make_optimizer(opt, make_lr_schedule(opt, 50))
        state = init_teacher_state(opt, model, tx, rng, N_DATA, sample)
        step = build_teacher_train_step(opt, model, tx)
        b = _stack_batches(nprng, views=2, sample_cols=0)
        b["tsvd_update"] = np.ones(N_DISTINCT, bool)
        return step, state, b, jnp.asarray(0.0)

    if which == "masked":
        # S1 masking teacher (saliency grad + segment_sum + 2 masked distills)
        opt = Options(CRD_distill=1, pos_mode="exact", nce_p=1, nce_k=512,
                      masking=1, num_superpixels=100, Path_K=1, Omic_K=5,
                      **base)
        model = define_model(opt)
        tx = make_optimizer(opt, make_lr_schedule(opt, 50))
        state = init_teacher_state(opt, model, tx, rng, N_DATA, sample)
        step = build_teacher_train_step(opt, model, tx, masking=True)
        b = _stack_batches(nprng, views=4, with_mask=True)
        return step, state, b, jnp.asarray(0.0)

    # the two student families share a frozen two-branch teacher; its init
    # is a full pathomic forward at paper dims, so memoize across calls
    memo_key = (SIZE, BATCH, N_DATA, DTYPE)
    if memo_key not in _TEACHER_MEMO:
        topt = Options(CRD_distill=1, num_teachers=2, **base)
        teacher_model = define_model(topt)
        tvars = teacher_model.init({"params": rng, "dropout": rng},
                                   x_path=sample["x_path"],
                                   x_omic=sample["x_omic"], train=False)
        _TEACHER_MEMO[memo_key] = (teacher_model, {
            "params": tvars["params"],
            "batch_stats": tvars.get("batch_stats", {})})
    teacher_model, teacher_vars = _TEACHER_MEMO[memo_key]

    if which == "student":
        # MICCAI student (CRD v3 two banks + AEKD vjp pulls + frozen teacher)
        opt = Options(CRD_distill=1, distill="crd", num_teachers=2,
                      assign_weights=True, CE_grads=True,
                      select_pos_mode="hard", pos_mode="multi_pos", nce_p=4,
                      nce_p2=2, nce_k=512, nce_k2=256, alpha=1.0, beta=0.02,
                      **base)
        model = define_model(opt, path_only=True)
        tx = make_optimizer(opt, make_lr_schedule(opt, 50))
        state = init_student_state(opt, model, tx, rng, N_DATA,
                                   input_size=SIZE)
        step = build_student_train_step(opt, model, teacher_model,
                                        teacher_vars, tx)
        b = _stack_batches(nprng, views=2, sample_cols=opt.nce_p + opt.nce_k)
        return step, state, b, jnp.asarray(0.5)

    if which == "clat":
        # CLAT stage-2 student (CRD v10 kNN positives + GK_refine_thresh,
        # train_20230805.sh recipe shape at bank size N_DATA)
        from multimodal_learning_tpu.train.student_clat import \
            build_clat_student_step
        opt = Options(CRD_distill=1, distill="crd", num_teachers=2,
                      assign_weights=True, loss_weighting="GK_refine",
                      use_grads_thresh=True, grads_thresh=0.25, nce_p=6,
                      nce_k=512, pos_extra="neighbors", pos_mode="multi_pos",
                      max_discrep=1.0, **base)
        labels = nprng.integers(0, 3, N_DATA)
        class_mask = np.zeros((3, N_DATA), np.float32)
        class_mask[labels, np.arange(N_DATA)] = 1.0
        model = define_model(opt, path_only=True)
        tx = make_optimizer(opt, make_lr_schedule(opt, 50))
        state = init_student_state(opt, model, tx, rng, N_DATA,
                                   input_size=SIZE)
        step = build_clat_student_step(opt, model, teacher_model,
                                       teacher_vars, tx, class_mask)
        b = _stack_batches(nprng, views=2, sample_cols=1 + opt.nce_k)
        return step, state, b, jnp.asarray(True)

    raise ValueError(f"unknown family {which!r}")


def bench_families(rep: Reporter, n_steps=50) -> None:
    # >=50 steps best-of-3 per family: against the tunnel's documented
    # ~1.6x contention swings, 30-step best-of-2 could hide sub-40%
    # regressions (VERDICT r2 #8)
    """Throughput of the other jitted step families at paper dims, so kernel
    regressions in the complex t-SVT SVD, the saliency segment_sum, and the
    CRD-v3 bank select/scatter + AEKD vjp pulls show up in BENCH_r*.json.

    Each family's number is emitted as soon as it is measured ("masked"
    first — it certifies the round-3 step restructure); a per-family failure
    or a watchdog bail degrades the record instead of nulling it."""
    import jax

    for which in ("masked", "tsvd", "student", "clat"):
        try:
            step, state, b, extra = build_family(which)
            rep.beat(f"family {which} built; uploading + compiling")
            pps = _chain_pps(step, state, jax.device_put(b), extra,
                             n_steps, reporter=rep)
            rep.update(**{f"{which}_pps": pps})
        except Exception as exc:  # a family regression must not kill bench
            rep.update(**{f"{which}_error": repr(exc)[:200]})


def bench_torch_cpu() -> float:
    """PyTorch-CPU reference workload: ResNet18+SNN+bilinear fusion,
    forward+backward, batch 16 @ 512^2 (train step only; this is the
    dominant cost in the reference's loop)."""
    if os.path.exists(CACHE):
        with open(CACHE) as fh:
            return json.load(fh)["torch_cpu_pps"]

    import torch
    import torch.nn as tnn

    class Block(tnn.Module):
        def __init__(self, cin, cout, stride=1):
            super().__init__()
            self.c1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.b1 = tnn.BatchNorm2d(cout)
            self.c2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.b2 = tnn.BatchNorm2d(cout)
            self.ds = None
            if stride != 1 or cin != cout:
                self.ds = tnn.Sequential(
                    tnn.Conv2d(cin, cout, 1, stride, bias=False),
                    tnn.BatchNorm2d(cout))

        def forward(self, x):
            idt = self.ds(x) if self.ds else x
            y = torch.relu(self.b1(self.c1(x)))
            y = self.b2(self.c2(y))
            return torch.relu(y + idt)

    class R18(tnn.Module):
        def __init__(self):
            super().__init__()
            self.stem = tnn.Sequential(
                tnn.Conv2d(3, 64, 7, 2, 3, bias=False), tnn.BatchNorm2d(64),
                tnn.ReLU(), tnn.MaxPool2d(3, 2, 1))
            layers = []
            cin = 64
            for i, cout in enumerate((64, 128, 256, 512)):
                layers += [Block(cin, cout, 1 if i == 0 else 2),
                           Block(cout, cout)]
                cin = cout
            self.layers = tnn.Sequential(*layers)
            self.head = tnn.Linear(512, 128)
            self.cls = tnn.Linear(128, 3)

        def forward(self, x):
            h = self.layers(self.stem(x)).mean((2, 3))
            f = torch.relu(self.head(h))
            return f, self.cls(f)

    class Teacherish(tnn.Module):
        def __init__(self):
            super().__init__()
            self.path = R18()
            self.omic = tnn.Sequential(
                tnn.Linear(80, 64), tnn.ELU(), tnn.Linear(64, 48), tnn.ELU(),
                tnn.Linear(48, 32), tnn.ELU(), tnn.Linear(32, 128), tnn.ELU())
            self.fuse = tnn.Linear(129 * 129, 128)
            self.cls = tnn.Linear(128, 3)

        def forward(self, img, om):
            pf, pl = self.path(img)
            of = self.omic(om)
            o1 = torch.cat([pf, torch.ones(pf.shape[0], 1)], 1)
            o2 = torch.cat([of, torch.ones(of.shape[0], 1)], 1)
            o12 = torch.bmm(o1.unsqueeze(2), o2.unsqueeze(1)).flatten(1)
            fl = self.cls(torch.relu(self.fuse(o12)))
            return pl, fl

    model = Teacherish()
    opt_t = torch.optim.Adam(model.parameters(), lr=5e-4)
    img = torch.randn(BATCH, 3, SIZE, SIZE)
    om = torch.randn(BATCH, 80)
    y = torch.randint(0, 3, (BATCH,))
    lossf = tnn.CrossEntropyLoss()

    def step():
        opt_t.zero_grad()
        pl, fl = model(img, om)
        loss = lossf(pl, y) + lossf(fl, y)
        loss.backward()
        opt_t.step()

    step()  # warmup
    n = 3
    t0 = time.perf_counter()
    for _ in range(n):
        step()
    dt = time.perf_counter() - t0
    pps = BATCH * n / dt
    with open(CACHE, "w") as fh:
        json.dump({"torch_cpu_pps": pps}, fh)
    return pps


def main():
    rep = Reporter()
    _start_watchdog(rep)

    def on_term(signum, frame):  # driver's `timeout` — best-effort partial
        rep.update(error="SIGTERM (external timeout)")
        os._exit(3)

    try:
        signal.signal(signal.SIGTERM, on_term)
    except (ValueError, OSError):
        pass

    # torch-CPU baseline: instant when cached (checked-in rigs keep
    # .bench_baseline.json); otherwise measured at the END so a ~1 min CPU
    # run can't delay the first TPU number.
    if os.path.exists(CACHE):
        try:
            rep.base = bench_torch_cpu()
        except Exception:
            pass

    bench_jax(rep)
    if FAMILIES:
        bench_families(rep)
    if rep.base is None:
        try:
            rep.base = bench_torch_cpu()
        except Exception:
            pass
    rep.finish()


if __name__ == "__main__":
    main()
