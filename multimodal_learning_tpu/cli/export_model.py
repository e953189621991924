"""Export trained fold checkpoints as serving artifacts (StableHLO).

Beyond-parity driver (the reference deploys by re-running its torch test
scripts in-process, ``MICCAI-2022/test_cv_MT.py``): for every fold
checkpoint of ``--model_name`` this writes ``<model>_<k>.stablehlo`` (the
eval forward with weights baked in, lowered for cpu+tpu) plus a ``.json``
manifest with the calling convention.  Reload with
``multimodal_learning_tpu.serve.load_exported`` — or any external StableHLO
consumer.

    python -m multimodal_learning_tpu.cli.export_model \
        --model_name stage1_pathomic_teacher --mode pathomic --task grad \
        --export_batch 16
"""
from __future__ import annotations

import glob
import os
import sys

from ._platform import apply_platform_override

apply_platform_override()

from ..config import parse_args
from ..models.factory import define_model
from ..serve.export import export_infer, manifest, write_artifact
from ..utils.checkpoint import load_checkpoint


def export_fold(opt, ckpt_path: str, out_path: str) -> str:
    ckpt = load_checkpoint(ckpt_path)
    # the checkpoint's saved opt is the source of truth for the forward:
    # CLI flags with shape-invariant arch effects (act_type, skip, gates,
    # compute_dtype, ...) would otherwise export a silently different
    # function from the trained one.  CLI keeps only the export knobs.
    saved = ckpt.get("opt")
    if isinstance(saved, dict):
        import dataclasses
        cli_export_batch = opt.export_batch
        cli_dynamic = opt.export_dynamic_batch
        fields = {f.name for f in dataclasses.fields(type(opt))}
        opt = type(opt)(**{k: v for k, v in saved.items() if k in fields})
        if cli_export_batch:
            opt = opt.replace(export_batch=cli_export_batch)
        if cli_dynamic:
            opt = opt.replace(export_dynamic_batch=True)
    model = define_model(opt)
    params = ckpt["model_state_dict"]
    stats = ckpt.get("batch_stats", {})
    bs = ("dynamic" if opt.export_dynamic_batch
          else (opt.export_batch or opt.batch_size))
    blob, outputs = export_infer(opt, model, params, stats, bs)
    write_artifact(out_path, blob, manifest(opt, bs, outputs))
    return out_path


def main(argv=None):
    opt = parse_args(argv)
    ckpt_dir = os.path.join(opt.checkpoints_dir, opt.exp_name,
                            opt.model_name)
    # prefer each fold's rolling _best checkpoint, like the test drivers
    paths = {}
    for p in sorted(glob.glob(os.path.join(
            ckpt_dir, f"{opt.model_name}_*.pt"))):
        stem = os.path.basename(p)[len(opt.model_name) + 1:-3]
        if stem.endswith("_best"):
            paths[stem[:-5]] = p
        elif stem.isdigit():
            paths.setdefault(stem, p)
    if not paths:
        raise FileNotFoundError(
            f"no fold checkpoints under {ckpt_dir!r} — train with "
            f"cli.train_cv_MT (or friends) first")
    written = []
    for k, p in sorted(paths.items()):
        out = os.path.join(ckpt_dir, f"{opt.model_name}_{k}.stablehlo")
        written.append(export_fold(opt, p, out))
        print("exported", written[-1])
    return written


if __name__ == "__main__":
    main(sys.argv[1:])
