"""Torch-checkpoint import: reference state_dicts -> flax params/batch_stats.

Addresses the BASELINE north star "checkpoint-for-checkpoint grading outputs
match the PyTorch reference": released reference checkpoints
(``<model>_k_best.pt`` with ``model_state_dict``) and torchvision ResNet18
ImageNet weights (``resnets.py:275-284``) can be converted and loaded into
the flax models, with NCHW->NHWC kernel transposes and the
Sequential-index -> named-module mapping.

Key maps (reference module names, SURVEY §2.3):
- ResNet trunk ``convN/bnN/layerX.Y.*`` incl. ``downsample.{0,1}``
- heads ``fc_new1.0`` (Linear) / ``fc_new1.1`` (BN1d) / ``fc_new2``
- MaxNet ``encoder.K.0`` (Linear) / ``classifier.0``
- BilinearFusion ``linear_h{1,2}.0 / linear_z{1,2} / linear_o{1,2}.0 /
  encoder{1,2}.0 / encoder{1,2}.1``
- PathomicNet ``path_net.* / omic_net.* / fusion.* / classifier.0``
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _t(w):
    return np.asarray(w)


def _conv(sd, key):
    # torch [O, I, kh, kw] -> flax [kh, kw, I, O]
    return _t(sd[key]).transpose(2, 3, 1, 0)


def _linear(sd, key):
    # torch [O, I] -> flax [I, O]
    return {"kernel": _t(sd[key + ".weight"]).T,
            "bias": _t(sd[key + ".bias"])}


def _bn(sd, key) -> Tuple[Dict, Dict]:
    params = {"scale": _t(sd[key + ".weight"]),
              "bias": _t(sd[key + ".bias"])}
    stats = {"mean": _t(sd[key + ".running_mean"]),
             "var": _t(sd[key + ".running_var"])}
    return params, stats


def convert_resnet18(sd: Dict, prefix: str = "",
                     stage_sizes=(2, 2, 2, 2)) -> Tuple[Dict, Dict]:
    """Convert a reference/torchvision ResNet18 state_dict subtree.

    Accepts both torchvision names (``fc.*`` ignored) and the reference's
    custom heads (``fc_new1.0/.1``, ``fc_new2``).  Returns
    (params, batch_stats) trees matching ``models/resnet.py:ResNet``.
    """
    p = prefix
    params: Dict = {}
    stats: Dict = {}
    params["conv1"] = {"kernel": _conv(sd, p + "conv1.weight")}
    params["bn1"], stats["bn1"] = _bn(sd, p + "bn1")
    for i, n_blocks in enumerate(stage_sizes):
        for j in range(n_blocks):
            src = f"{p}layer{i + 1}.{j}."
            dst = f"layer{i + 1}_{j}"
            blk: Dict = {}
            bstats: Dict = {}
            blk["conv1"] = {"kernel": _conv(sd, src + "conv1.weight")}
            blk["bn1"], bstats["bn1"] = _bn(sd, src + "bn1")
            blk["conv2"] = {"kernel": _conv(sd, src + "conv2.weight")}
            blk["bn2"], bstats["bn2"] = _bn(sd, src + "bn2")
            if src + "downsample.0.weight" in sd:
                blk["ds_conv"] = {
                    "kernel": _conv(sd, src + "downsample.0.weight")}
                blk["ds_bn"], bstats["ds_bn"] = _bn(sd, src + "downsample.1")
            params[dst] = blk
            stats[dst] = bstats
    if p + "fc_new1.0.weight" in sd:
        params["fc_new1"] = _linear(sd, p + "fc_new1.0")
        params["fc_new1_bn"], stats["fc_new1_bn"] = _bn(sd, p + "fc_new1.1")
        params["fc_new2"] = _linear(sd, p + "fc_new2")
    return params, stats


def convert_maxnet(sd: Dict, prefix: str = "") -> Dict:
    """MaxNet SNN: ``encoder.K.0`` Linear stack + ``classifier.0``."""
    p = prefix
    params = {}
    for k in range(4):
        params[f"encoder{k + 1}"] = _linear(sd, f"{p}encoder.{k}.0")
    params["classifier"] = _linear(sd, p + "classifier.0")
    return params


def convert_bilinear_fusion(sd: Dict, prefix: str = "") -> Tuple[Dict, Dict]:
    """BilinearFusion (``fusion.py:6-63``) -> models/fusion.py naming."""
    p = prefix
    params: Dict = {}
    stats: Dict = {}
    for i in (1, 2):
        unit = {
            "linear_h": _linear(sd, f"{p}linear_h{i}.0"),
            "linear_o": _linear(sd, f"{p}linear_o{i}.0"),
        }
        zkey = f"{p}linear_z{i}"
        if zkey + ".weight" in sd and _t(sd[zkey + ".weight"]).ndim == 3:
            unit["linear_z"] = {"kernel": _t(sd[zkey + ".weight"]),
                                "bias": _t(sd[zkey + ".bias"])}
        elif zkey + ".0.weight" in sd:
            unit["linear_z"] = _linear(sd, zkey + ".0")
        params[f"unit{i}"] = unit
    for i in (1, 2):
        params[f"encoder{i}"] = _linear(sd, f"{p}encoder{i}.0")
        params[f"encoder{i}_bn"], stats[f"encoder{i}_bn"] = _bn(
            sd, f"{p}encoder{i}.1")
    return params, stats


def convert_pathomic(sd: Dict) -> Tuple[Dict, Dict]:
    """Full PathomicNet state_dict -> (params, batch_stats) for
    ``PathomicModel``."""
    path_params, path_stats = convert_resnet18(sd, "path_net.")
    omic_params = convert_maxnet(sd, "omic_net.")
    fusion_params, fusion_stats = convert_bilinear_fusion(sd, "fusion.")
    params = {"path_net": path_params, "omic_net": omic_params,
              "fusion": fusion_params,
              "classifier": _linear(sd, "classifier.0")}
    stats = {"path_net": path_stats, "fusion": fusion_stats}
    return params, stats


def flatten_tree(tree: Dict, prefix: str = "") -> Dict[str, np.ndarray]:
    """Nested dict -> {'a/b/c': array} (npz-friendly)."""
    out: Dict[str, np.ndarray] = {}
    for k, v in tree.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(flatten_tree(v, key + "/"))
        else:
            out[key] = np.asarray(v)
    return out


def unflatten_tree(flat: Dict[str, np.ndarray]) -> Dict:
    out: Dict = {}
    for k, v in flat.items():
        parts = k.split("/")
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return out


def save_pretrained_npz(path: str, params: Dict, batch_stats: Dict) -> None:
    """Write converted weights as a flat .npz with ``params/…`` and
    ``batch_stats/…`` key prefixes (the ``--pretrained_path`` format)."""
    flat = {**flatten_tree({"params": params}),
            **flatten_tree({"batch_stats": batch_stats})}
    np.savez(path, **flat)


def load_pretrained_npz(path: str) -> Tuple[Dict, Dict]:
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    tree = unflatten_tree(flat)
    return tree.get("params", {}), tree.get("batch_stats", {})


def merge_pretrained(target: Dict, source: Dict) -> Tuple[Dict, int]:
    """Recursively overwrite ``target`` leaves with same-path, same-shape
    ``source`` leaves (the flax analogue of torch's
    ``load_state_dict(strict=False)``, which the reference relies on to put
    torchvision ImageNet weights under its custom heads,
    ``MICCAI-2022/resnets.py:275-284``).  Returns (merged, n_leaves)."""
    merged: Dict = {}
    n = 0
    for k, v in target.items():
        s = source.get(k)
        if isinstance(v, dict):
            if isinstance(s, dict):
                merged[k], dn = merge_pretrained(v, s)
                n += dn
            else:
                merged[k] = v
        elif s is not None and not isinstance(s, dict) \
                and tuple(np.shape(s)) == tuple(np.shape(v)):
            merged[k] = np.asarray(s, dtype=np.asarray(v).dtype)
            n += 1
        else:
            merged[k] = v
    return merged, n


def apply_pretrained(opt, params: Dict, batch_stats: Dict, log=None
                     ) -> Tuple[Dict, Dict]:
    """Consume ``--pretrained_path``: merge a converted ResNet18 .npz (see
    ``cli/convert_torch``) into the path branch of a freshly-initialised
    model.  For pathomic models the weights land under ``path_net``; for
    path-only models at the root.  Heads (``fc_new*``) are merged only when
    present in the file with matching shapes (a reference checkpoint), so a
    torchvision ImageNet file initialises the trunk and leaves the custom
    heads random — exactly the reference semantics."""
    if not getattr(opt, "pretrained_path", ""):
        return params, batch_stats
    src_params, src_stats = load_pretrained_npz(opt.pretrained_path)
    params = dict(params)
    batch_stats = dict(batch_stats)
    if "path_net" in params and "path_net" not in src_params:
        # ResNet18-only npz into a pathomic container: land under path_net
        params["path_net"], n_p = merge_pretrained(
            params["path_net"], src_params)
        batch_stats["path_net"], n_s = merge_pretrained(
            batch_stats.get("path_net", {}), src_stats)
    else:  # path-only ResNet, or a full pathomic npz (--arch pathomic from
        # a released checkpoint) into a pathomic container: merge at root
        params, n_p = merge_pretrained(params, src_params)
        batch_stats, n_s = merge_pretrained(batch_stats, src_stats)
    if n_p == 0:
        raise ValueError(
            f"--pretrained_path {opt.pretrained_path}: no parameter matched "
            "the model tree (wrong architecture or un-converted file? "
            "run cli/convert_torch first)")
    if log:
        log(f"loaded {n_p} param / {n_s} batch-stat tensors from "
            f"{opt.pretrained_path}")
    return params, batch_stats


def load_torch_state_dict(path: str, state_key: str = "model_state_dict"
                          ) -> Dict:
    """Load a .pt/.pth file into {name: numpy} (CPU, no grad).

    Released reference checkpoints are wrapper dicts
    ``{split, opt, epoch, data, model_state_dict, ema_model_state_dict,
    optimizer_state_dict, metrics}`` (``MICCAI-2022/train_cv_MT.py:119-130``);
    ``state_key`` picks which state dict to extract (the reference's own
    eval loads ``model_state_dict``, ``test_cv_MT.py:58``).  A bare
    state_dict file (torchvision ImageNet weights) passes through as-is."""
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and state_key != "model_state_dict" \
            and state_key not in obj:
        raise KeyError(f"{path}: no {state_key!r} in checkpoint "
                       f"(keys: {sorted(obj)[:12]})")
    sd = obj.get(state_key, obj) if isinstance(obj, dict) else obj
    return {k: v.detach().cpu().numpy() for k, v in sd.items()
            if hasattr(v, "detach")}
