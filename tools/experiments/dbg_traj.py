"""Debug: which gradient tensors diverge from the torch reference and how."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))
import numpy as np
import jax
import jax.numpy as jnp

from tests import ref_loader
from tests.test_train_trajectory import (_small_meta, _synth_scene,
                                         _ref_batch, _load_sd)
from gdmae_tpu.runtime import torch_import

import torch
import torch.nn as nn
from gdmae_tpu.config import cfg_from_yaml_file
from gdmae_tpu.models.detectors.detector3d_template import build_network
from gdmae_tpu.runtime import train as train_lib

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
        for m in (self.vfe, self.backbone_3d, self.backbone_2d,
                  self.dense_head):
            bd = m(bd)
        loss, tb = self.dense_head.get_loss()
        return loss


ref_model = RefDet().train()
sd0 = {k: v.detach().clone().numpy() for k, v in ref_model.state_dict().items()}
pts, gt = _synth_scene(4, meta.max_points)

cfg.MODEL.BACKBONE_3D.pop("TPU_WINDOW_CAPS", None)
model = build_network(cfg.MODEL, num_class=3, dataset=meta)
batch = {"points": jnp.asarray(pts[None]),
         "point_mask": jnp.ones((1, meta.max_points), bool),
         "gt_boxes": jnp.asarray(gt)}
with jax.default_matmul_precision("highest"):
    params, batch_stats = train_lib.init_model(model, batch, seed=0)
    params, batch_stats, report = torch_import.import_torch_state(
        sd0, params, batch_stats)

strides = {}
for i, src in enumerate(cfg.MODEL.BACKBONE_3D.FEATURES_SOURCE):
    s = int(cfg.MODEL.BACKBONE_3D.FUSE_LAYER[src].UPSAMPLE_STRIDE)
    strides[f"backbone_3d/fuse/deblock_{i}/kernel"] = s

_load_sd(ref_model, sd0)
ref_model.zero_grad()
loss = ref_model(_ref_batch(torch, pts, gt))
loss.backward()
ref_grads = {k: prm.grad.detach().numpy()
             for k, prm in ref_model.named_parameters()
             if prm.grad is not None}


def loss_fn(params):
    out, _ = model.apply(
        {"params": params, "batch_stats": batch_stats},
        batch, train=True, rngs={"mae_mask": jax.random.PRNGKey(0)},
        mutable=["batch_stats"])
    return out["loss"]


with jax.default_matmul_precision("highest"):
    jloss, grads = jax.value_and_grad(loss_fn)(params)
print("loss ref", float(loss.item()), "jax", float(jloss))

got = torch_import.export_torch_state(grads, deconv_strides=strides)
rows = []
for name, ref_g in ref_grads.items():
    g = np.asarray(got[name], np.float64)
    r = np.asarray(ref_g, np.float64)
    rn = np.linalg.norm(r)
    if rn < 1e-10:
        continue
    rel = np.linalg.norm(g - r) / rn
    rows.append((rel, name, rn))
rows.sort(reverse=True)
for rel, name, rn in rows[:20]:
    print(f"{rel:.3e}  |r|={rn:.3e}  {name}")
print("n>2e-3:", sum(1 for r in rows if r[0] > 2e-3), "of", len(rows))
import collections
by = collections.defaultdict(list)
for rel, name, rn in rows:
    by[".".join(name.split(".")[:2])].append(rel)
print("\nper-module max/median rel err:")
for k in sorted(by):
    v = sorted(by[k])
    print(f"  {k:55s} n={len(v):3d} max={v[-1]:.2e} med={v[len(v)//2]:.2e}")
