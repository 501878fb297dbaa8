"""Discriminator: is the residual jax-vs-torch gradient gap fp32 noise?

Runs the torch reference graph twice — fp32 and fp64 — from identical
weights and prints the per-module gradient deltas.  If torch-f32 vs
torch-f64 shows the same ~4e-3 deltas as jax-f32 vs torch-f32, the gap is
conditioning noise inherent to fp32, not a semantic difference.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))
import numpy as np

from tests import ref_loader
from tests.test_train_trajectory import (_small_meta, _synth_scene,
                                         _ref_batch, _load_sd)

import torch
import torch.nn as nn
from gdmae_tpu.config import cfg_from_yaml_file

repo = Path(__file__).resolve().parent.parent.parent
cfg = cfg_from_yaml_file(str(repo / "tools/cfgs/kitti_models/gd_mae.yaml"))
meta = _small_meta()
grid = np.array([64, 64, 1])
pcr = np.array(meta.point_cloud_range, np.float32)
vsz = [0.32, 0.32, 4.0]

dyn_vfe = ref_loader.load_ref("pcdet.models.backbones_3d.vfe.dyn_vfe")
spt = ref_loader.load_ref("pcdet.models.backbones_3d.spt_backbone")
bev = ref_loader.load_ref("pcdet.models.backbones_2d.sst_bev_backbone")
heads = ref_loader.load_ref("pcdet.models.dense_heads.anchor_head_single")

torch.manual_seed(0)


class RefDet(nn.Module):
    def __init__(self):
        super().__init__()
        self.vfe = dyn_vfe.DynVFE(
            model_cfg=cfg.MODEL.VFE, num_point_features=4,
            voxel_size=vsz, point_cloud_range=pcr, grid_size=grid)
        self.backbone_3d = spt.SPTBackbone(
            model_cfg=cfg.MODEL.BACKBONE_3D, input_channels=128,
            grid_size=np.array([64, 64]), voxel_size=vsz,
            point_cloud_range=pcr)
        self.backbone_2d = bev.SSTBEVBackbone(model_cfg=cfg.MODEL.BACKBONE_2D)
        self.dense_head = heads.AnchorHeadSingle(
            model_cfg=cfg.MODEL.DENSE_HEAD, input_channels=128,
            num_class=3, class_names=list(cfg.CLASS_NAMES),
            grid_size=grid, point_cloud_range=pcr,
            predict_boxes_when_training=False)

    def forward(self, bd):
        for m in (self.vfe, self.backbone_3d, self.backbone_2d):
            bd = m(bd)
        # synthetic head-free loss: isolates the backbone backward
        return bd["spatial_features_2d"].pow(2).mean()


ref_model = RefDet().train()
sd0 = {k: v.detach().clone().numpy() for k, v in ref_model.state_dict().items()}
pts, gt = _synth_scene(4, meta.max_points)


def run(double):
    _load_sd(ref_model, sd0)
    m = ref_model.double() if double else ref_model.float()
    m.zero_grad()
    bd = _ref_batch(torch, pts, gt)
    if double:
        bd = {k: (v.double() if torch.is_tensor(v) and v.is_floating_point()
                  else v) for k, v in bd.items()}
    loss = m(bd)
    loss.backward()
    g = {k: p.grad.detach().double().numpy()
         for k, p in m.named_parameters() if p.grad is not None}
    m.float()
    return float(loss.item()), g


l32, g32 = run(False)
l64, g64 = run(True)
print("loss f32", l32, "f64", l64)

import collections
by = collections.defaultdict(list)
for name, r in g64.items():
    rn = np.linalg.norm(r)
    if rn < 1e-10:
        continue
    rel = np.linalg.norm(g32[name] - r) / rn
    by[".".join(name.split(".")[:2])].append(rel)
print("per-module torch f32-vs-f64 max/median rel err:")
for k in sorted(by):
    v = sorted(by[k])
    print(f"  {k:55s} n={len(v):3d} max={v[-1]:.2e} med={v[len(v)//2]:.2e}")
