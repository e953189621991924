"""Ahead-of-time export of the eval forward for serving (StableHLO).

Beyond-parity capability: the reference has no deployment story —
"inference" means re-running ``test_cv_MT.py``/``test_cv_path.py`` with the
full torch training stack in-process (``MICCAI-2022/test_cv_MT.py:40-70``).
Here the eval forward (uint8 patches + omic vector -> branch hazards and
log-prob predictions, weights baked in as constants) is serialized with
``jax.export`` as a self-contained StableHLO artifact:

- hardware-portable: lowered for both ``cpu`` and ``tpu`` in one artifact;
- reloadable without the training stack, the checkpoint pipeline, or the
  original Python model code (`load_exported` needs only jax);
- consumable by external StableHLO toolchains (IREE, tf.saved_model, ...).

The exported signature is fixed-shape ``(x_path: u8[B,S,S,3],
x_omic: f32[B,D]) -> {branch: f32[B,...]}`` — static shapes are the
TPU-friendly choice (no dynamic-shape recompiles at serve time); export one
artifact per serving batch size.  Unimodal configs still take both inputs
(the unused one is traced away) so every artifact has the same calling
convention.
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp

from ..models.factory import _dtype
from ..train.steps import _apply, adapt_output

_BRANCHES = ("hazard_fuse", "hazard_path", "hazard_omic",
             "pred_fuse", "pred_path", "pred_omic")


def make_infer_fn(opt, model, params, batch_stats) -> Callable:
    """Pure serving forward with weights closed over (they become artifact
    constants under export).  Input normalisation matches
    ``train/steps.py:build_eval_step`` exactly (u8 -> [-1, 1] in the
    compute dtype); outputs are the non-None branches as f32."""
    if getattr(opt, "test_augment", False):
        # build_eval_step applies the RANDOM train augmentation at test time
        # under this flag (MICCAI quirk); a deterministic serving artifact
        # cannot reproduce it, so refuse rather than silently diverge from
        # the numbers test_cv_* reported.
        raise ValueError(
            "--test_augment configs evaluate through random augmentation "
            "(data_loaders_MT.py:112-119 parity); the exported artifact is "
            "deterministic and would not match the reported eval numbers. "
            "Export with test_augment=False.")
    if getattr(model, "pallas_fusion", "off") != "off":
        # The artifact declares platforms ("cpu", "tpu"); a TPU Pallas
        # custom call in the traced forward makes the CPU lowering fail at
        # export time ("Only interpret mode is supported on CPU backend").
        # Serve through the einsum path instead: _KronEncoder1 owns the
        # identical kernel/bias params either way (models/fusion.py:93),
        # so the same params apply and the math is exact.
        from ..models.factory import define_model
        opt = dataclasses.replace(opt, pallas_fusion="off")
        model = define_model(opt)
    dt = _dtype(opt)

    def infer(x_path, x_omic):
        x = None
        if opt.mode in ("path", "pathomic"):
            x = (x_path.astype(dt) / jnp.asarray(127.5, dt)
                 - jnp.asarray(1.0, dt))
        batch = {"omic": x_omic}
        if opt.mode == "pathomic" and opt.fusion_type == "mmdynamics":
            mm_logit = model.apply(
                {"params": params, "batch_stats": batch_stats},
                x, x_omic, train=False, infer=True)
            return {"pred_fuse": jax.nn.log_softmax(mm_logit, axis=1)
                    .astype(jnp.float32)}
        raw = _apply(opt, model, params, batch_stats, batch, x,
                     train=False, rng=None, mutable=False)
        out = adapt_output(opt, raw)
        return {k: getattr(out, k).astype(jnp.float32)
                for k in _BRANCHES if getattr(out, k) is not None}

    return infer


def export_infer(opt, model, params, batch_stats, batch_size):
    """Serialize the eval forward at ``batch_size``.

    ``batch_size`` is an int for a fixed-shape artifact (the TPU-friendly
    default: no serve-time recompiles) or the string ``"dynamic"`` for a
    batch-polymorphic artifact (``jax.export`` symbolic shapes): one blob
    serves ANY batch size, at the cost of one compile per distinct size at
    load/serve time — the right trade for CPU serving or bucketed batchers.

    Returns ``(blob, output_names)`` — the StableHLO bytes and the output
    dict's keys, read from the export's own pytree metadata (no second
    trace, so the manifest can never disagree with the artifact)."""
    infer = make_infer_fn(opt, model, params, batch_stats)
    s = opt.input_size_path
    if batch_size == "dynamic":
        (b,) = jax.export.symbolic_shape("b")
    else:
        b = int(batch_size)
    x_path = jax.ShapeDtypeStruct((b, s, s, 3), jnp.uint8)
    x_omic = jax.ShapeDtypeStruct((b, opt.input_size_omic), jnp.float32)
    exported = jax.export.export(
        jax.jit(infer), platforms=("cpu", "tpu"))(x_path, x_omic)
    outs = jax.tree_util.tree_unflatten(exported.out_tree,
                                        list(exported.out_avals))
    return exported.serialize(), sorted(outs)


def load_exported(data: bytes) -> Callable:
    """Rehydrate an artifact into a jitted callable — needs only jax, not
    this package's model code."""
    exported = jax.export.deserialize(bytearray(data))
    return jax.jit(exported.call)


def manifest(opt, batch_size, outputs) -> Dict[str, Any]:
    """Sidecar JSON: calling convention + the config that produced it."""
    b = "b" if batch_size == "dynamic" else batch_size
    return {
        "format": "stablehlo/jax.export",
        "platforms": ["cpu", "tpu"],
        "inputs": {
            "x_path": f"uint8[{b},{opt.input_size_path},"
                      f"{opt.input_size_path},3]",
            "x_omic": f"float32[{b},{opt.input_size_omic}]",
        },
        "outputs": sorted(outputs),
        "task": opt.task,
        "mode": opt.mode,
        "opt": dataclasses.asdict(opt),
    }


def write_artifact(path: str, blob: bytes, man: Dict[str, Any]) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as fh:
        fh.write(blob)
    with open(path + ".json", "w") as fh:
        json.dump(man, fh, indent=1, default=str)
