"""Convert torch checkpoints to the ``--pretrained_path`` .npz format.

Replaces the reference's in-process torchvision download+load
(``MICCAI-2022/resnets.py:275-284``): conversion happens once, offline, and
training consumes a plain .npz (no torch dependency in the hot path).

Usage:
    python -m multimodal_learning_tpu.cli.convert_torch \
        --src resnet18-f37072fd.pth --dst resnet18_imagenet.npz

    # full reference PathomicNet checkpoint -> flax tree
    python -m multimodal_learning_tpu.cli.convert_torch \
        --src pathomic_1_best.pt --dst teacher_fold1.npz --arch pathomic

``--arch resnet18`` (default) accepts both torchvision ImageNet files and
the reference's ResNet-with-fc_new-heads state_dicts (``--prefix path_net.``
strips a container prefix); ``--arch pathomic`` converts a full PathomicNet
state_dict.
"""
from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--src", required=True, help=".pth/.pt torch checkpoint")
    ap.add_argument("--dst", required=True, help="output .npz")
    ap.add_argument("--arch", default="resnet18",
                    choices=["resnet18", "pathomic"])
    ap.add_argument("--prefix", default="",
                    help="state_dict key prefix to convert under "
                         "(e.g. 'path_net.')")
    ap.add_argument("--state_key", default="model_state_dict",
                    help="which state dict to extract from a released "
                         "wrapper checkpoint (model_state_dict or "
                         "ema_model_state_dict; train_cv_MT.py:119-130)")
    args = ap.parse_args(argv)

    from ..models.import_torch import (convert_pathomic, convert_resnet18,
                                       flatten_tree, load_torch_state_dict,
                                       save_pretrained_npz)
    sd = load_torch_state_dict(args.src, state_key=args.state_key)
    if args.arch == "pathomic":
        params, stats = convert_pathomic(sd)
    else:
        params, stats = convert_resnet18(sd, prefix=args.prefix)
    save_pretrained_npz(args.dst, params, stats)
    n = len(flatten_tree(params)) + len(flatten_tree(stats))
    print(f"wrote {args.dst}: {n} tensors ({args.arch})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
