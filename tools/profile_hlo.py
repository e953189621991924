"""Per-op FLOP/byte table from the compiled HLO of a train step.

The dev rig's TPU tunnel has no jax.profiler, so per-op *timing* is not
directly observable; this tool gives the next-strongest evidence for the
MFU ceiling question (VERDICT r2 #3): the optimized-HLO convolution/dot
inventory — every contraction the step runs, its shape, FLOPs, and share
of the step — plus standalone timing of each distinct conv shape measured
as its own scan chain on the device.

Usage:
    python tools/profile_hlo.py [teacher|masked|tsvd|student|clat] \
        [--time] [--json PATH]

Output: a table on stdout and (with --json PATH) a JSON artifact.
"""
from __future__ import annotations

import json
import re
import sys
import time

import numpy as np

import os
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import BATCH, SIZE, N_DATA, _stack_batches  # noqa: E402

DTYPE = os.environ.get("MML_BENCH_DTYPE", "bfloat16")

_SHAPE = re.compile(r"(bf16|f32|f16|s32|u8|pred|s8|u32)\[([0-9,]*)\]")


def _dims(tok):
    m = _SHAPE.search(tok)
    if not m:
        return None, None
    dims = [int(x) for x in m.group(2).split(",")] if m.group(2) else []
    return m.group(1), dims


def _prod(xs):
    out = 1
    for x in xs:
        out *= x
    return out


_DEF = re.compile(
    r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*"
    r"(bf16|f32|f16|s32|u8|pred|s8|u32|u16|s16)\[([0-9,]*)\]")
_OPERANDS = re.compile(r"\(([^)]*)\)")


def conv_table(hlo_text: str):
    """Extract convolution + dot instructions from optimized HLO text with
    their shapes and FLOP counts.  Optimized HLO references operands by
    name only, so a first pass builds a name -> shape symbol table."""
    shapes = {}
    for line in hlo_text.splitlines():
        m = _DEF.match(line)
        if m:
            dims = ([int(x) for x in m.group(3).split(",")]
                    if m.group(3) else [])
            shapes[m.group(1)] = (m.group(2), dims)

    def operand_shapes(line, opname):
        inner = line.split(opname + "(", 1)
        if len(inner) < 2:
            return []
        inner = inner[1]
        depth, buf, names = 1, "", []
        for ch in inner:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    break
            buf += ch
        for tok in buf.split(","):
            tok = tok.strip().lstrip("%")
            mm = re.match(r"(?:(?:bf16|f32|f16|s32|u8|pred)\[[0-9,]*\][^ ]* "
                          r")?%?([\w.\-]+)", tok)
            if mm and mm.group(1) in shapes:
                names.append(shapes[mm.group(1)])
        return names

    def phase_of(line):
        mo = re.search(r'op_name="jit\(train_step\)/([^"]*)"', line)
        if not mo:
            return "?"
        p = mo.group(1)
        if "transpose(" in p:
            ph = "bwd"
        elif "jvp(" in p:
            ph = "fwd"
        else:
            ph = "fwd_nodiff"
        mm = re.search(r"(path_net|omic_net|fusion|classifier|crd|Embed)",
                       p)
        return f"{ph}:{mm.group(1) if mm else p.split('/')[-1][:24]}"

    rows = []
    for line in hlo_text.splitlines():
        line = line.strip()
        m = _DEF.match(line)
        if not m:
            continue
        body = line.split("=", 1)[1]
        odtype, odims = m.group(2), \
            ([int(x) for x in m.group(3).split(",")] if m.group(3) else [])
        if re.search(r"\bconvolution\(", body):
            mwin = re.search(r"window={size=([0-9x]+)", line)
            win = ([int(x) for x in mwin.group(1).split("x")]
                   if mwin else [1])
            ops = operand_shapes(body, "convolution")
            mdl = re.search(r"dim_labels=(\S+?)_(\S+?)->", line)
            cin = 1
            kshape = ""
            if len(ops) >= 2:
                rdt, rdims = ops[1]
                kshape = "x".join(map(str, rdims))
                if mdl:
                    # rhs labels e.g. 01io / o01i...: 'i' position = C_in
                    rl = mdl.group(2)
                    if "i" in rl and len(rl) == len(rdims):
                        cin = rdims[rl.index("i")]
                    else:
                        cin = rdims[-2] if len(rdims) >= 2 else 1
                else:
                    cin = rdims[-2] if len(rdims) >= 2 else 1
            mfg = re.search(r"feature_group_count=(\d+)", line)
            fg = int(mfg.group(1)) if mfg else 1
            flops = 2 * _prod(odims) * _prod(win) * cin // max(fg, 1)
            rows.append({"kind": "conv", "out": f"{odtype}{odims}",
                         "kernel": kshape, "window": "x".join(map(str, win)),
                         "phase": phase_of(line),
                         "flops": flops, "line": line[:160]})
        elif re.search(r"\bdot\(", body):
            ops = operand_shapes(body, "dot")
            mcontr = re.search(r"lhs_contracting_dims={([0-9,]+)}", line)
            if len(ops) < 1 or not mcontr:
                continue
            lhs = ops[0][1]
            cdims = [int(x) for x in mcontr.group(1).split(",")]
            try:
                k = _prod(lhs[c] for c in cdims)
            except IndexError:
                continue
            flops = 2 * _prod(odims) * k
            rows.append({"kind": "dot", "out": f"{odtype}{odims}",
                         "kernel": "x".join(map(str, lhs)),
                         "window": "", "phase": phase_of(line),
                         "flops": flops, "line": line[:160]})
    return rows


def group_rows(rows, by_phase=False):
    from collections import defaultdict
    g = defaultdict(lambda: {"count": 0, "flops": 0})
    for r in rows:
        key = ((r["phase"],) if by_phase else
               (r["kind"], r["out"], r["kernel"], r["window"]))
        g[key]["count"] += 1
        g[key]["flops"] += r["flops"]
    total = sum(v["flops"] for v in g.values())
    out = []
    for key, v in sorted(g.items(), key=lambda kv: -kv[1]["flops"]):
        row = {"count": v["count"], "gflops": v["flops"] / 1e9,
               "pct": 100.0 * v["flops"] / max(total, 1)}
        if by_phase:
            row["phase"] = key[0]
        else:
            row.update({"kind": key[0], "out": key[1], "kernel": key[2],
                        "window": key[3]})
        out.append(row)
    return out, total


def build_step(which: str):
    """(step_fn, state, one_batch, extra) for any step family.

    ``teacher`` is the flagship bench config (built here); the other four
    families come from :func:`bench.build_family`, so the profiled step is
    bit-identical to the one ``bench_families`` times."""
    import jax
    import jax.numpy as jnp

    if which != "teacher":
        from bench import build_family
        step, state, b, extra = build_family(which)
        one = jax.tree_util.tree_map(lambda x: x[0], b)
        return step, state, one, extra

    from multimodal_learning_tpu.config import Options
    from multimodal_learning_tpu.models.factory import define_model
    from multimodal_learning_tpu.train.optim import make_optimizer
    from multimodal_learning_tpu.train.schedules import make_lr_schedule
    from multimodal_learning_tpu.train.steps import (
        build_teacher_train_step, init_teacher_state)

    opt = Options(mode="pathomic", task="grad", path_dim=128, omic_dim=128,
                  mmhid=128, feat_dim=128, input_size_path=SIZE,
                  batch_size=BATCH, pred_distill=1, n_data=N_DATA,
                  reg_type="omic", niter_decay=30, compute_dtype=DTYPE,
                  num_teachers=2, CRD_distill=1, pos_mode="exact", nce_p=1,
                  nce_k=512)
    model = define_model(opt)
    tx = make_optimizer(opt, make_lr_schedule(opt, 50))
    rng = jax.random.PRNGKey(0)
    sample = {"x_path": jnp.zeros((1, SIZE, SIZE, 3)),
              "x_omic": jnp.zeros((1, 80))}
    state = init_teacher_state(opt, model, tx, rng, N_DATA, sample)
    step = build_teacher_train_step(opt, model, tx)
    nprng = np.random.default_rng(0)
    b = _stack_batches(nprng, views=2)
    one = {k: v[0] for k, v in b.items()}
    return step, state, one, jnp.asarray(0.1)


def time_conv_shapes(grouped, n_steps=400, top=12):
    """Standalone scan-chain timing of the top conv shapes (fwd direction
    as written in the HLO; bf16).  The carry feeds the WEIGHTS (tiny
    elementwise) so each iteration is data-dependent without adding a
    memory-bound pass over the activation; n_steps is long enough that the
    ~30 ms fixed tunnel sync is <1% of the measurement."""
    import jax
    import jax.numpy as jnp

    out = []
    for row in grouped[:top]:
        if row["kind"] != "conv":
            continue
        odims = [int(x) for x in
                 re.findall(r"\d+", row["out"].split("[", 1)[1])]
        rhs = [int(x) for x in row["kernel"].split("x") if x]
        win = [int(x) for x in row["window"].split("x") if x]
        if len(odims) != 4 or len(rhs) < 2:
            continue
        # reconstruct NHWC fwd conv: out [B,H,W,Cout], kernel [kh,kw,Cin,Cout]
        B, H, W, Cout = odims
        if B != BATCH:
            continue  # weight-gradient convs: output is a kernel, not NHWC
        Cin = rhs[-2]
        kh = win[0] if win else 1
        kw = win[1] if len(win) > 1 else kh
        x = jnp.zeros((B, H + kh - 1, W + kw - 1, Cin), jnp.bfloat16)
        w = jnp.zeros((kh, kw, Cin, Cout), jnp.bfloat16)

        def chain(x, w, n):
            def body(c, _):
                y = jax.lax.conv_general_dilated(
                    x, w + c, (1, 1), "VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                # full reduce: a sliced output would let XLA narrow the
                # conv itself (verified: slice -> 240 "TF/s" on a v5e)
                return (jnp.sum(y) * jnp.asarray(1e-12, x.dtype)), ()
            c, _ = jax.lax.scan(body, jnp.asarray(0, x.dtype),
                                None, length=n)
            return c

        cj = jax.jit(chain, static_argnames=("n",))
        float(cj(x, w, 2))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            float(cj(x, w, n_steps))
            best = min(best, time.perf_counter() - t0)
        fl = 2 * B * H * W * Cout * kh * kw * Cin
        tfs = fl * n_steps / best / 1e12
        out.append({**row, "standalone_tflops": round(tfs, 1)})
    return out


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "teacher"
    do_time = "--time" in sys.argv
    jpath = None
    if "--json" in sys.argv:
        jpath = sys.argv[sys.argv.index("--json") + 1]

    step, state, batch, extra = build_step(which)
    import jax
    compiled = step.lower(state, batch, jax.random.PRNGKey(1),
                          extra).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    hlo = compiled.as_text()
    rows = conv_table(hlo)
    grouped, total = group_rows(rows)
    print(f"step={which}  xla_flops={cost['flops']/1e9:.1f} GF  "
          f"table_flops={total/1e9:.1f} GF  "
          f"bytes={cost.get('bytes accessed', 0)/1e9:.2f} GB")
    phases, _ = group_rows(rows, by_phase=True)
    print("\n-- by phase (ad-direction : module) --")
    for r in phases[:20]:
        print(f"  {r['gflops']:>8.1f} GF {r['pct']:>5.1f}%  x{r['count']:<4}"
              f" {r['phase']}")
    print(f"\n{'kind':>5} {'count':>5} {'GF':>8} {'%':>5}  out / kernel")
    for r in grouped[:25]:
        print(f"{r['kind']:>5} {r['count']:>5} {r['gflops']:>8.1f} "
              f"{r['pct']:>5.1f}  {r['out']}  k={r['kernel']} "
              f"w={r['window']}")
    timed = None
    if do_time:
        timed = time_conv_shapes(grouped)
        print("\nstandalone conv timings (scan-chain, bf16):")
        for r in timed:
            print(f"  {r['out']} k={r['kernel']}: "
                  f"{r['standalone_tflops']} TF/s ({r['pct']:.1f}% of step)")
    if jpath:
        with open(jpath, "w") as fh:
            json.dump({"which": which, "xla_flops": cost["flops"],
                       "table": grouped[:40], "timed": timed}, fh, indent=1)
        print("wrote", jpath)


if __name__ == "__main__":
    main()
