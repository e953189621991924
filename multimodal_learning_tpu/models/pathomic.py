"""PathomicModel — the multimodal teacher/student container.

Capability parity with ``MICCAI-2022/networks_new.py:267-369``:
``path_net`` (ResNet18) + ``omic_net`` (MaxNet) + fusion + linear classifier.
Branch outputs are returned as a :class:`PathomicOutput` pytree instead of the
reference's positional 11-tuple; ``cut_fuse_grad`` detaches the unimodal
features before fusion via ``stop_gradient`` (``networks_new.py:302-311``),
and ``fusion_type='concat'`` concatenates features (stage-1 variant,
``MIA 2023/stage1.../networks_new.py:293-297``, classifier takes
``path_dim+omic_dim``).
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import apply_act, torch_linear_bias, torch_linear_default
from .fusion import BilinearFusion, HFBFusion, LMFusion, PolynomialFusion
from .maxnet import MaxNet
from .resnet import ResNet18


class PathomicOutput(NamedTuple):
    """Branch outputs (reference return tuple ``networks_new.py:352-353``)."""
    fuse_feat: Optional[jnp.ndarray]   # fused feature [B, mmhid]
    path_feat: Optional[jnp.ndarray]   # path feature  [B, path_dim]
    omic_feat: Optional[jnp.ndarray]   # omic feature  [B, omic_dim]
    path_feat_f3: Optional[jnp.ndarray]  # layer-3 GAP feature [B, 256]
    hazard_fuse: Optional[jnp.ndarray]
    hazard_path: Optional[jnp.ndarray]
    hazard_omic: Optional[jnp.ndarray]
    pred_fuse: Optional[jnp.ndarray]   # activated (log-probs / range-shifted)
    pred_path: Optional[jnp.ndarray]
    pred_omic: Optional[jnp.ndarray]


def make_fusion(fusion_type: str, *, skip=0, use_bilinear=1, path_gate=1,
                omic_gate=1, path_dim=128, omic_dim=128, path_scale=1,
                omic_scale=1, mmhid=128, dropout_rate=0.25,
                pallas_fusion="off", name="fusion") -> Optional[nn.Module]:
    """reference ``define_bifusion`` (``networks_new.py:148-175``) extended to
    the polynomial / LMF / HFB types.  ``pallas_fusion`` routes the pofusion
    Kronecker contraction through the fused Pallas kernels: "eval" for the
    eval forward only, "train" for the train path too (masked kernel,
    ops/kron_fusion.py)."""
    common = dict(skip=skip, use_bilinear=use_bilinear,
                  gate1=path_gate, gate2=omic_gate,
                  dim1=path_dim, dim2=omic_dim,
                  scale_dim1=path_scale, scale_dim2=omic_scale,
                  mmhid=mmhid, dropout_rate=dropout_rate)
    if fusion_type == "pofusion":
        return BilinearFusion(
            **common, pallas_eval=pallas_fusion in ("eval", "train"),
            pallas_train=pallas_fusion == "train", name=name)
    if fusion_type == "polynomial_fusion":
        return PolynomialFusion(**common, name=name)
    if fusion_type == "LMF":
        return LMFusion(dim1=path_dim, dim2=omic_dim, mmhid=mmhid,
                        rank=4, dropout_rate=dropout_rate, name=name)
    if fusion_type == "HFB":
        return HFBFusion(dim1=path_dim, dim2=omic_dim, mmhid=mmhid,
                         rank=20, dropout_rate=dropout_rate, name=name)
    if fusion_type == "concat":
        return None
    raise NotImplementedError(f"fusion type [{fusion_type}] is not found")


class PathomicDynamicsModel(nn.Module):
    """MMDynamics container — reference ``PathomicNet_dynamics``
    (``networks_new.py:372-418``): path/omic encoders feed the
    (reconstructed) MMDynamic trustworthy fusion.  ``__call__`` with labels
    returns (MMLoss, MMlogit, TCPLogits); with ``infer=True`` just MMlogit.
    """
    path_dim: int = 128
    omic_dim: int = 128
    mmhid: int = 128
    label_dim: int = 3
    input_size_omic: int = 80
    dropout_rate: float = 0.25
    act_type: str = "LSM"
    init_max: bool = True
    dtype: Any = jnp.float32
    paired_conv: bool = False    # lane-paired ResNet convs — measured net-slower
    #                          in situ (relayout-bound); see ops/paired_conv.py

    def setup(self):
        from .mmdynamic import MMDynamic
        self.path_net = ResNet18(path_dim=self.path_dim,
                                 num_classes=self.label_dim,
                                 act_type=self.act_type, dtype=self.dtype,
                                 paired=self.paired_conv)
        self.omic_net = MaxNet(input_dim=self.input_size_omic,
                               omic_dim=self.omic_dim,
                               dropout_rate=self.dropout_rate,
                               act_type=self.act_type,
                               label_dim=self.label_dim,
                               init_max=self.init_max, dtype=self.dtype)
        self.fusion = MMDynamic(dim_list=(self.path_dim, self.omic_dim),
                                hidden_dim=(self.mmhid,),
                                num_class=self.label_dim, dropout=0.5)

    def __call__(self, x_path, x_omic, labels=None, train: bool = True,
                 infer: bool = False):
        _, path_feat, _, _ = self.path_net(x_path, train=train)
        omic_feat, _, _ = self.omic_net(x_omic, train=train)
        return self.fusion([path_feat, omic_feat], labels=labels,
                           train=train, infer=infer)


class PathomicModel(nn.Module):
    """Multimodal model; also runs single-branch when one input is None."""
    path_dim: int = 128
    omic_dim: int = 128
    mmhid: int = 128
    label_dim: int = 3
    input_size_omic: int = 80
    dropout_rate: float = 0.25
    act_type: str = "LSM"
    fusion_type: str = "pofusion"
    skip: int = 0
    use_bilinear: int = 1
    path_gate: int = 1
    omic_gate: int = 1
    path_scale: int = 1
    omic_scale: int = 1
    cut_fuse_grad: bool = False
    init_max: bool = True
    dtype: Any = jnp.float32
    pallas_fusion: str = "off"   # off|eval|train (pofusion Pallas kernels)
    paired_conv: bool = False    # lane-paired ResNet convs — measured net-slower
    #                          in situ (relayout-bound); see ops/paired_conv.py

    def setup(self):
        self.path_net = ResNet18(path_dim=self.path_dim,
                                 num_classes=self.label_dim,
                                 act_type=self.act_type, dtype=self.dtype,
                                 paired=self.paired_conv)
        self.omic_net = MaxNet(input_dim=self.input_size_omic,
                               omic_dim=self.omic_dim,
                               dropout_rate=self.dropout_rate,
                               act_type=self.act_type,
                               label_dim=self.label_dim,
                               init_max=self.init_max, dtype=self.dtype)
        self.fusion = make_fusion(
            self.fusion_type, skip=self.skip, use_bilinear=self.use_bilinear,
            path_gate=self.path_gate, omic_gate=self.omic_gate,
            path_dim=self.path_dim, omic_dim=self.omic_dim,
            path_scale=self.path_scale, omic_scale=self.omic_scale,
            mmhid=self.mmhid, dropout_rate=self.dropout_rate,
            pallas_fusion=self.pallas_fusion)
        clf_in = (self.path_dim + self.omic_dim
                  if self.fusion is None else self.mmhid)
        self.classifier = nn.Dense(
            self.label_dim, kernel_init=torch_linear_default,
            bias_init=torch_linear_bias(clf_in), name="classifier")

    def __call__(self, x_path=None, x_omic=None, train: bool = True,
                 path_feats=None) -> PathomicOutput:
        """``path_feats``: precomputed ``(path_feat_f3, path_feat,
        hazard_path, pred_path)`` in place of running ``path_net``.  Used by
        the masked train step: its second masked forward re-runs the path
        trunk on the SAME view as the main forward (train-mode BN + no trunk
        dropout -> bit-identical outputs in the reference too,
        ``train_test_MT_SP_Masking.py:208-210``), so reusing the tensors is
        semantics-preserving and lets AD merge the trunk backward."""
        path_feat = omic_feat = path_feat_f3 = None
        hazard_path = hazard_omic = pred_path = pred_omic = None
        if path_feats is not None:
            path_feat_f3, path_feat, hazard_path, pred_path = path_feats
        elif x_path is not None:
            path_feat_f3, path_feat, hazard_path, pred_path = self.path_net(
                x_path, train=train)
        if x_omic is not None:
            omic_feat, hazard_omic, pred_omic = self.omic_net(
                x_omic, train=train)

        if path_feat is None or x_omic is None:
            return PathomicOutput(None, path_feat, omic_feat, path_feat_f3,
                                  None, hazard_path, hazard_omic,
                                  None, pred_path, pred_omic)

        pv, ov = path_feat, omic_feat
        if self.cut_fuse_grad:  # networks_new.py:302-306
            pv, ov = jax.lax.stop_gradient(pv), jax.lax.stop_gradient(ov)
        if self.fusion is None:  # concat
            fuse_feat = jnp.concatenate([pv, ov], axis=1)
        else:
            fuse_feat = self.fusion(pv, ov, train=train)
        hazard_fuse = self.classifier(fuse_feat)
        pred_fuse = apply_act(self.act_type, hazard_fuse)
        return PathomicOutput(fuse_feat, path_feat, omic_feat, path_feat_f3,
                              hazard_fuse, hazard_path, hazard_omic,
                              pred_fuse, pred_path, pred_omic)
