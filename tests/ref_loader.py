"""Load reference (torch) modules from /root/reference by file path.

The reference package can't be imported wholesale: its CUDA extensions
(pcdet.ops.*) aren't built here, `pcdet/version.py` doesn't exist, and a few
third-party deps (SharedArray, numba) are absent.  This loader registers a
fake `pcdet` package tree in sys.modules with stub modules for the native
ops / missing deps, then imports the PURE-PYTHON reference files we use as
parity oracles (utils/box_coder_utils.py, utils/loss_utils.py, dense-head
target assigners, model_utils/sst_utils.py, centernet_utils.py, the fastai
optimizer schedules).

All loading happens lazily and is cached; torch stays on CPU (`.cuda()` is
patched to a no-op, matching how the reference math behaves numerically).
"""
from __future__ import annotations

import importlib.util
import sys
import types
from pathlib import Path

import numpy as np

REF = Path("/root/reference")

_loaded = {}


def _ensure_stub_pkg(name):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    mod.__path__ = []  # mark as package
    sys.modules[name] = mod
    parent, _, child = name.rpartition(".")
    if parent:
        setattr(_ensure_stub_pkg(parent), child, mod)
    return mod


def _numpy_ingroup_inds(group_inds):
    """Pure-numpy oracle for sst_ops_utils.get_inner_win_inds
    (reference sst_ops_gpu.cu:14 `ingroup_inds`): for each element, its
    0-based rank within its group, in order of appearance."""
    import torch

    g = group_inds.cpu().numpy().astype(np.int64)
    out = np.zeros_like(g)
    counts = {}
    for i, v in enumerate(g):
        out[i] = counts.get(v, 0)
        counts[v] = out[i] + 1
    return torch.from_numpy(out).to(group_inds.dtype)


def _numpy_group_inner_inds(points, inverse_inds, K):
    """Pure-numpy oracle for sst_ops_utils.group_inner_inds (reference
    sst_ops_gpu.cu:22-39 + sst_ops_utils.py:15-27): for each group, the
    first K member indices in order of appearance, WRAP-REPEATED to fill;
    returns the gathered point values (num_groups, K, C).  GT gathering is
    gradient-free in the reference, so numpy indexing is faithful."""
    import torch

    inv = inverse_inds.cpu().numpy().astype(np.int64)
    n_groups = int(inv.max()) + 1
    members = [[] for _ in range(n_groups)]
    for i, g in enumerate(inv):
        if len(members[g]) < K:
            members[g].append(i)
    idx = np.full((n_groups, K), -1, np.int64)
    for g, mem in enumerate(members):
        if mem:
            reps = (K + len(mem) - 1) // len(mem)
            idx[g] = (mem * reps)[:K]
    return points[torch.from_numpy(idx)]


def _make_torch_scatter_stub():
    """Pure-torch emulation of the torch_scatter ops the reference GD-MAE
    forward path uses (scatter / scatter_max / scatter_min with argout).

    Test-only oracle code: favors clarity (stable sort + segment reduce)
    over speed."""
    import torch

    ts = types.ModuleType("torch_scatter")

    def _seg(index):
        order = torch.argsort(index, stable=True)
        si = index[order]
        n = int(index.max().item()) + 1 if index.numel() else 0
        return order, si, n

    def _reduce(src, index, mode, dim_size=None):
        assert src.shape[0] == index.shape[0]
        order, si, n = _seg(index)
        n = dim_size if dim_size is not None else n
        ss = src[order]
        out_shape = (n,) + tuple(src.shape[1:])
        if mode == "max":
            init, better = -torch.inf, torch.gt
        elif mode == "min":
            init, better = torch.inf, torch.lt
        else:
            init, better = 0.0, None
        if src.is_floating_point():
            out = torch.full(out_shape, init, dtype=src.dtype)
        else:
            lim = torch.iinfo(src.dtype)
            out = torch.full(out_shape, {"max": lim.min, "min": lim.max,
                                         "sum": 0, "mean": 0}[mode],
                             dtype=src.dtype)
        arg = torch.full((n,) + tuple(src.shape[1:]), src.shape[0],
                         dtype=torch.long)
        if mode in ("sum", "mean"):
            out = out.index_add(0, si, ss)
            if mode == "mean":
                cnt = torch.zeros(n, dtype=src.dtype).index_add(
                    0, si, torch.ones_like(si, dtype=src.dtype))
                out = out / cnt.clamp(min=1).reshape((n,) + (1,) * (src.ndim - 1))
            return out, arg
        # max/min: walk segments (test-scale N only)
        flat_pos = order
        for j in range(ss.shape[0]):
            g = int(si[j])
            take = better(ss[j], out[g])
            out[g] = torch.where(take, ss[j], out[g])
            arg[g] = torch.where(take, flat_pos[j].expand_as(arg[g]), arg[g])
        return out, arg

    def scatter(src, index, dim=0, dim_size=None, reduce="sum"):
        assert dim == 0
        out, _ = _reduce(src, index, "mean" if reduce == "mean" else "sum",
                         dim_size)
        return out

    def scatter_max(src, index, dim=0, dim_size=None):
        assert dim == 0
        return _reduce(src, index, "max", dim_size)

    def scatter_min(src, index, dim=0, dim_size=None):
        assert dim == 0
        return _reduce(src, index, "min", dim_size)

    def scatter_add(src, index, dim=0, dim_size=None):
        assert dim == 0
        return _reduce(src, index, "sum", dim_size)[0]

    ts.scatter = scatter
    ts.scatter_max = scatter_max
    ts.scatter_min = scatter_min
    ts.scatter_add = scatter_add
    ts.scatter_mean = lambda src, index, dim=0, dim_size=None: scatter(
        src, index, dim, dim_size, reduce="mean")
    return ts


def _make_spconv_stub():
    """Dense-emulation shim for the spconv 2.x API surface the reference
    GD-MAE graph uses (2D submanifold + strided sparse conv).

    Sparse convolution over active sites with zero features elsewhere is
    numerically IDENTICAL to a dense conv on the scattered canvas (inactive
    inputs contribute 0 with bias=False), so the shim scatters to dense,
    runs F.conv2d, and gathers back at the active-site set:
      - SubMConv: output sites == input sites.
      - SparseConv (strided): output site active iff >=1 active input in
        its receptive field (occupancy maxpool with the same footprint).
    Weight layout matches spconv 2.x native: (out, k1, k2, in)."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    sp = types.ModuleType("spconv")
    sp.__path__ = []

    class SparseConvTensor:
        def __init__(self, features, indices, spatial_shape, batch_size):
            self.features = features          # (N, C)
            self.indices = indices            # (N, 1+ndim) int (b, y, x)
            self.spatial_shape = list(int(s) for s in spatial_shape)
            self.batch_size = int(batch_size)

        def replace_feature(self, feats):
            return SparseConvTensor(feats, self.indices, self.spatial_shape,
                                    self.batch_size)

        def dense(self):
            c = self.features.shape[1]
            out = self.features.new_zeros(
                (self.batch_size, *self.spatial_shape, c))
            idx = self.indices.long()
            out[tuple(idx[:, i] for i in range(idx.shape[1]))] = self.features
            # (B, spatial..., C) -> (B, C, spatial...)
            perm = (0, out.ndim - 1) + tuple(range(1, out.ndim - 1))
            return out.permute(*perm).contiguous()

    class SparseModule(nn.Module):
        pass

    class SparseConvolution(SparseModule):
        def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                     padding=0, dilation=1, bias=False, indice_key=None,
                     subm=False, ndim=2):
            super().__init__()
            self.ndim = ndim
            ks = (kernel_size,) * ndim if isinstance(kernel_size, int) else tuple(kernel_size)
            self.in_channels, self.out_channels = in_channels, out_channels
            self.kernel_size = ks
            self.stride = (stride,) * ndim if isinstance(stride, int) else tuple(stride)
            self.padding = (padding,) * ndim if isinstance(padding, int) else tuple(padding)
            self.dilation = (dilation,) * ndim if isinstance(dilation, int) else tuple(dilation)
            self.subm = subm
            self.indice_key = indice_key
            # spconv 2.x native layout: (out, k1, k2, in)
            w = torch.empty(out_channels, *ks, in_channels)
            nn.init.kaiming_uniform_(w.reshape(out_channels, -1),
                                     a=5 ** 0.5)
            self.weight = nn.Parameter(w)
            self.bias = nn.Parameter(torch.zeros(out_channels)) if bias else None
            if subm:
                assert all(k % 2 == 1 for k in ks), "subm needs odd kernels"
                self.padding = tuple(d * (k // 2) for k, d in
                                     zip(ks, self.dilation))
                self.stride = (1,) * ndim

        def forward(self, x: SparseConvTensor):
            nd = self.ndim
            convnd = F.conv2d if nd == 2 else F.conv3d
            dense = x.dense()  # (B, C, spatial...)
            # spconv2 native layout (out, k..., in) -> torch (out, in, k...)
            w = self.weight.permute(0, nd + 1, *range(1, nd + 1))
            out = convnd(dense, w, self.bias, stride=self.stride,
                         padding=self.padding, dilation=self.dilation)
            if self.subm:
                new_indices = x.indices
                out_shape = x.spatial_shape
            else:
                occ = x.features.new_zeros(
                    (x.batch_size, 1, *x.spatial_shape))
                idx = x.indices.long()
                occ[(idx[:, 0], torch.zeros_like(idx[:, 0]),
                     *(idx[:, i] for i in range(1, nd + 1)))] = 1.0
                ones = torch.ones((1, 1, *self.kernel_size),
                                  dtype=occ.dtype)
                hit = convnd(occ, ones, stride=self.stride,
                             padding=self.padding, dilation=self.dilation)
                nz = (hit[:, 0] > 0).nonzero()  # (M, 1+nd) lexicographic
                new_indices = nz.to(x.indices.dtype)
                out_shape = list(out.shape[-nd:])
            idx = new_indices.long()
            feats = out[(idx[:, 0], slice(None),
                         *(idx[:, i] for i in range(1, nd + 1)))]
            return SparseConvTensor(feats, new_indices, out_shape,
                                    x.batch_size)

    def SubMConv2d(in_channels, out_channels, kernel_size, stride=1,
                   padding=0, dilation=1, bias=False, indice_key=None):
        return SparseConvolution(in_channels, out_channels, kernel_size,
                                 stride, padding, dilation, bias, indice_key,
                                 subm=True)

    def SparseConv2d(in_channels, out_channels, kernel_size, stride=1,
                     padding=0, dilation=1, bias=False, indice_key=None):
        return SparseConvolution(in_channels, out_channels, kernel_size,
                                 stride, padding, dilation, bias, indice_key,
                                 subm=False)

    def SubMConv3d(in_channels, out_channels, kernel_size, stride=1,
                   padding=0, dilation=1, bias=False, indice_key=None):
        return SparseConvolution(in_channels, out_channels, kernel_size,
                                 stride, padding, dilation, bias, indice_key,
                                 subm=True, ndim=3)

    def SparseConv3d(in_channels, out_channels, kernel_size, stride=1,
                     padding=0, dilation=1, bias=False, indice_key=None):
        return SparseConvolution(in_channels, out_channels, kernel_size,
                                 stride, padding, dilation, bias, indice_key,
                                 subm=False, ndim=3)

    class SparseSequential(nn.Sequential):
        def forward(self, x):
            for m in self:
                if isinstance(m, (SparseConvolution, SparseSequential,
                                  SparseModule)):
                    x = m(x)  # sparse-aware (incl. nested Sequentials)
                elif isinstance(x, SparseConvTensor):
                    x = x.replace_feature(m(x.features))
                else:
                    x = m(x)
            return x

    conv_mod = types.ModuleType("spconv.conv")
    conv_mod.SparseConvolution = SparseConvolution
    sp.conv = conv_mod
    sp.SparseConvTensor = SparseConvTensor
    sp.SparseModule = SparseModule
    sp.SparseSequential = SparseSequential
    sp.SubMConv2d = SubMConv2d
    sp.SparseConv2d = SparseConv2d
    sp.SubMConv3d = SubMConv3d
    sp.SparseConv3d = SparseConv3d
    sys.modules["spconv.conv"] = conv_mod
    pytorch_mod = types.ModuleType("spconv.pytorch")
    for k in ("conv", "SparseConvTensor", "SparseModule", "SparseSequential",
              "SubMConv2d", "SparseConv2d", "SubMConv3d", "SparseConv3d"):
        setattr(pytorch_mod, k, getattr(sp, k))
    sys.modules["spconv.pytorch"] = pytorch_mod
    return sp


def _install_stubs():
    import torch

    # CPU torch build: make the reference's unconditional .cuda() calls
    # no-ops (numerics unchanged)
    if not torch.cuda.is_available():
        torch.Tensor.cuda = lambda self, *a, **k: self
        torch.nn.Module.cuda = lambda self, *a, **k: self

    if "SharedArray" not in sys.modules:
        sa = types.ModuleType("SharedArray")
        sa.attach = sa.create = sa.delete = lambda *a, **k: None
        sys.modules["SharedArray"] = sa

    if "torch_scatter" not in sys.modules:
        sys.modules["torch_scatter"] = _make_torch_scatter_stub()

    if "pytorch3d" not in sys.modules:
        # torch oracle for pytorch3d.loss.chamfer_distance as the reference
        # MAE loss uses it (spt_backbone_mae.py:88: positional (x, y) +
        # weights).  Semantics of pytorch3d defaults (point_reduction
        # 'mean', batch_reduction 'mean'): per-cloud mean nearest SQUARED
        # distance in both directions, per-cloud weights, batch mean
        # normalized by weights.sum().
        import torch as _t

        def _chamfer(x, y, weights=None, **kw):
            d2 = ((x[:, :, None, :] - y[:, None, :, :]) ** 2).sum(-1)
            cham_x = d2.min(dim=2).values  # (N, P1)
            cham_y = d2.min(dim=1).values  # (N, P2)
            if weights is not None:
                cham_x = cham_x * weights[:, None]
                cham_y = cham_y * weights[:, None]
                div = weights.sum()
            else:
                div = _t.tensor(float(x.shape[0]))
            loss = cham_x.mean(1).sum() / div + cham_y.mean(1).sum() / div
            return loss, None

        p3d = types.ModuleType("pytorch3d")
        p3d_loss = types.ModuleType("pytorch3d.loss")
        p3d_loss.chamfer_distance = _chamfer
        p3d.loss = p3d_loss
        sys.modules["pytorch3d"] = p3d
        sys.modules["pytorch3d.loss"] = p3d_loss

    if "spconv" not in sys.modules:
        sys.modules["spconv"] = _make_spconv_stub()

    if "numba" not in sys.modules:
        nb = types.ModuleType("numba")

        def _jit(*a, **k):
            if len(a) == 1 and callable(a[0]) and not k:
                return a[0]
            return lambda f: f

        nb.jit = _jit
        nb.njit = _jit
        sys.modules["numba"] = nb

    _ensure_stub_pkg("pcdet")
    _ensure_stub_pkg("pcdet.ops")
    dcn = _ensure_stub_pkg("pcdet.ops.dcn")
    dcn_dc = _ensure_stub_pkg("pcdet.ops.dcn.deform_conv")
    import torch as _torch

    class _MDCP(_torch.nn.Module):  # import-only stub (IDAUp uses it)
        def __init__(self, *a, **k):
            super().__init__()
    dcn_dc.ModulatedDeformConvPack = _MDCP
    dcn.deform_conv = dcn_dc
    iou = _ensure_stub_pkg("pcdet.ops.iou3d_nms")
    iou_utils = _ensure_stub_pkg("pcdet.ops.iou3d_nms.iou3d_nms_utils")
    iou.iou3d_nms_utils = iou_utils

    def _boxes_iou3d_cpu(boxes_a, boxes_b):
        # CPU oracle for the reference's CUDA boxes_iou3d_gpu (N,7)x(M,7)
        # (iou3d_nms_utils.py:48-76): exact polygon-clip BEV overlap (our
        # numpy twin of the reference kernel) x height overlap / union.
        # Non-differentiable — matches the reference's .detach()ed use in
        # IoULossCenterNet (loss_utils.py:410-419).
        from gdmae_tpu.utils.rotated_iou_np import boxes_overlap_bev_cpu

        a = boxes_a.detach().cpu().numpy().astype(np.float64)
        b = boxes_b.detach().cpu().numpy().astype(np.float64)
        ov = boxes_overlap_bev_cpu(a[:, :7], b[:, :7])
        a_max = (a[:, 2] + a[:, 5] / 2)[:, None]
        a_min = (a[:, 2] - a[:, 5] / 2)[:, None]
        b_max = (b[:, 2] + b[:, 5] / 2)[None, :]
        b_min = (b[:, 2] - b[:, 5] / 2)[None, :]
        ov_h = np.clip(np.minimum(a_max, b_max)
                        - np.maximum(a_min, b_min), 0, None)
        vol = ov * ov_h
        va = (a[:, 3] * a[:, 4] * a[:, 5])[:, None]
        vb = (b[:, 3] * b[:, 4] * b[:, 5])[None, :]
        iou3d = vol / np.clip(va + vb - vol, 1e-6, None)
        return _torch.as_tensor(iou3d.astype(np.float32))

    iou_utils.boxes_iou3d_gpu = _boxes_iou3d_cpu
    roiaware = _ensure_stub_pkg("pcdet.ops.roiaware_pool3d")
    roiaware.roiaware_pool3d_utils = _ensure_stub_pkg(
        "pcdet.ops.roiaware_pool3d.roiaware_pool3d_utils")
    patch = _ensure_stub_pkg("pcdet.ops.patch_ops")
    patch.patch_ops_utils = _ensure_stub_pkg(
        "pcdet.ops.patch_ops.patch_ops_utils")
    sst = _ensure_stub_pkg("pcdet.ops.sst_ops")
    sst_utils_ops = _ensure_stub_pkg("pcdet.ops.sst_ops.sst_ops_utils")
    sst_utils_ops.get_inner_win_inds = _numpy_ingroup_inds
    sst_utils_ops.group_inner_inds = _numpy_group_inner_inds
    sst.sst_ops_utils = sst_utils_ops
    _ensure_stub_pkg("pcdet.utils")
    _ensure_stub_pkg("pcdet.models")
    _ensure_stub_pkg("pcdet.models.model_utils")
    _ensure_stub_pkg("pcdet.models.dense_heads")
    _ensure_stub_pkg("pcdet.models.dense_heads.target_assigner")
    _ensure_stub_pkg("pcdet.models.backbones_3d")
    _ensure_stub_pkg("pcdet.models.backbones_3d.vfe")
    _ensure_stub_pkg("pcdet.models.backbones_2d")
    _ensure_stub_pkg("pcdet.models.img_backbones")
    _ensure_stub_pkg("pcdet.models.fusion_layers")
    _ensure_stub_pkg("pcdet.models.roi_heads")
    _ensure_stub_pkg("pcdet.models.roi_heads.target_assigner")
    _ensure_stub_pkg("tools_ref")
    _ensure_stub_pkg("tools_ref.train_utils")
    _ensure_stub_pkg("tools_ref.train_utils.optimization")


_FILES = {
    "pcdet.utils.spconv_utils": "pcdet/utils/spconv_utils.py",
    "pcdet.models.model_utils.network_utils":
        "pcdet/models/model_utils/network_utils.py",
    "pcdet.models.model_utils.cosine_msa":
        "pcdet/models/model_utils/cosine_msa.py",
    "pcdet.models.model_utils.sst_basic_block":
        "pcdet/models/model_utils/sst_basic_block.py",
    "pcdet.models.backbones_3d.vfe.vfe_template":
        "pcdet/models/backbones_3d/vfe/vfe_template.py",
    "pcdet.models.backbones_3d.vfe.dyn_vfe":
        "pcdet/models/backbones_3d/vfe/dyn_vfe.py",
    "pcdet.models.backbones_3d.spt_backbone":
        "pcdet/models/backbones_3d/spt_backbone.py",
    "pcdet.models.backbones_3d.spt_backbone_mae":
        "pcdet/models/backbones_3d/spt_backbone_mae.py",
    "pcdet.models.backbones_3d.spconv_backbone":
        "pcdet/models/backbones_3d/spconv_backbone.py",
    "pcdet.models.img_backbones.dla": "pcdet/models/img_backbones/dla.py",
    "pcdet.models.roi_heads.target_assigner.proposal_target_layer":
        "pcdet/models/roi_heads/target_assigner/proposal_target_layer.py",
    "pcdet.models.roi_heads.roi_head_template":
        "pcdet/models/roi_heads/roi_head_template.py",
    "pcdet.utils.transform_utils": "pcdet/utils/transform_utils.py",
    "pcdet.models.fusion_layers.point_sample":
        "pcdet/models/fusion_layers/point_sample.py",
    "pcdet.models.roi_heads.graphrcnn_head":
        "pcdet/models/roi_heads/graphrcnn_head.py",
    "pcdet.models.backbones_2d.sst_bev_backbone":
        "pcdet/models/backbones_2d/sst_bev_backbone.py",
    "pcdet.models.dense_heads.target_assigner.anchor_generator":
        "pcdet/models/dense_heads/target_assigner/anchor_generator.py",
    "pcdet.models.dense_heads.target_assigner.atss_target_assigner":
        "pcdet/models/dense_heads/target_assigner/atss_target_assigner.py",
    "pcdet.models.dense_heads.anchor_head_template":
        "pcdet/models/dense_heads/anchor_head_template.py",
    "pcdet.models.dense_heads.anchor_head_single":
        "pcdet/models/dense_heads/anchor_head_single.py",
    "pcdet.utils.common_utils": "pcdet/utils/common_utils.py",
    "pcdet.utils.box_utils": "pcdet/utils/box_utils.py",
    "pcdet.utils.box_coder_utils": "pcdet/utils/box_coder_utils.py",
    "pcdet.utils.loss_utils": "pcdet/utils/loss_utils.py",
    "pcdet.models.model_utils.sst_utils": "pcdet/models/model_utils/sst_utils.py",
    "pcdet.models.model_utils.centernet_utils":
        "pcdet/models/model_utils/centernet_utils.py",
    "pcdet.models.model_utils.model_nms_utils":
        "pcdet/models/model_utils/model_nms_utils.py",
    "pcdet.models.dense_heads.target_assigner.axis_aligned_target_assigner":
        "pcdet/models/dense_heads/target_assigner/axis_aligned_target_assigner.py",
    "pcdet.models.dense_heads.center_head":
        "pcdet/models/dense_heads/center_head.py",
    "tools_ref.train_utils.optimization.fastai_optim":
        "tools/train_utils/optimization/fastai_optim.py",
    "tools_ref.train_utils.optimization.learning_schedules_fastai":
        "tools/train_utils/optimization/learning_schedules_fastai.py",
}

# imports each module performs that must be loaded (or stubbed) first
_DEPS = {
    "pcdet.utils.box_utils": ["pcdet.utils.common_utils"],
    "pcdet.utils.loss_utils": ["pcdet.utils.box_utils"],
    "pcdet.models.dense_heads.target_assigner.axis_aligned_target_assigner":
        ["pcdet.utils.box_utils"],
    "pcdet.models.dense_heads.center_head": [
        "pcdet.utils.loss_utils",
        "pcdet.models.model_utils.centernet_utils",
        "pcdet.models.model_utils.model_nms_utils",
    ],
    "tools_ref.train_utils.optimization.learning_schedules_fastai":
        ["tools_ref.train_utils.optimization.fastai_optim"],
    "pcdet.models.backbones_3d.vfe.dyn_vfe": [
        "pcdet.models.backbones_3d.vfe.vfe_template",
        "pcdet.models.model_utils.network_utils",
        "pcdet.utils.common_utils",
    ],
    "pcdet.models.model_utils.sst_basic_block": [
        "pcdet.models.model_utils.cosine_msa",
        "pcdet.models.model_utils.sst_utils",
    ],
    "pcdet.models.backbones_3d.spt_backbone": [
        "pcdet.models.model_utils.sst_basic_block",
        "pcdet.models.model_utils.sst_utils",
        "pcdet.utils.spconv_utils",
    ],
    "pcdet.models.backbones_3d.spt_backbone_mae": [
        "pcdet.models.backbones_3d.spt_backbone",
        "pcdet.utils.spconv_utils",
        "pcdet.utils.common_utils",
    ],
    "pcdet.models.backbones_3d.spconv_backbone": [
        "pcdet.utils.spconv_utils",
    ],
    "pcdet.models.roi_heads.roi_head_template": [
        "pcdet.utils.box_coder_utils",
        "pcdet.utils.common_utils",
        "pcdet.utils.loss_utils",
        "pcdet.models.model_utils.model_nms_utils",
        "pcdet.models.roi_heads.target_assigner.proposal_target_layer",
    ],
    "pcdet.models.roi_heads.target_assigner.proposal_target_layer": [
        "pcdet.utils.box_utils",
    ],
    "pcdet.models.fusion_layers.point_sample": [
        "pcdet.utils.transform_utils",
    ],
    "pcdet.models.roi_heads.graphrcnn_head": [
        "pcdet.models.roi_heads.roi_head_template",
        "pcdet.models.model_utils.network_utils",
        "pcdet.models.fusion_layers.point_sample",
        "pcdet.utils.common_utils",
    ],
    "pcdet.models.dense_heads.anchor_head_template": [
        "pcdet.utils.box_coder_utils",
        "pcdet.utils.common_utils",
        "pcdet.utils.loss_utils",
        "pcdet.models.dense_heads.target_assigner.anchor_generator",
        "pcdet.models.dense_heads.target_assigner.atss_target_assigner",
        "pcdet.models.dense_heads.target_assigner.axis_aligned_target_assigner",
    ],
    "pcdet.models.dense_heads.anchor_head_single":
        ["pcdet.models.dense_heads.anchor_head_template"],
}


def load_ref(name: str):
    """Load a reference module by its dotted name (see _FILES)."""
    if name in _loaded:
        return _loaded[name]
    _install_stubs()
    for dep in _DEPS.get(name, []):
        load_ref(dep)
    path = REF / _FILES[name]
    spec = importlib.util.spec_from_file_location(name, str(path))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    # attach to parent so relative imports (`from . import x`) resolve
    parent, _, child = name.rpartition(".")
    if parent in sys.modules:
        setattr(sys.modules[parent], child, mod)
    spec.loader.exec_module(mod)
    # `from ..fusion_layers import PointSample`-style imports need the
    # class re-exported on the stub package
    if name == "pcdet.models.fusion_layers.point_sample":
        sys.modules["pcdet.models.fusion_layers"].PointSample = \
            mod.PointSample
    _loaded[name] = mod
    return mod
