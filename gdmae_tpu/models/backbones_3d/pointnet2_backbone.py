"""PointNet++ backbones: MSG and fusion-sampling (SAMSG) variants.

TPU-native counterpart of reference
pcdet/models/backbones_3d/pointnet2_backbone.py +
pcdet/ops/pointnet2/pointnet2_batch/pointnet2_modules.py: set abstraction is
masked-FPS centers + (dilated) ball-query grouping + shared per-point MLP +
masked max-pool, and feature propagation is 3-NN inverse-distance
interpolation — all padded/batched, no ragged ops.
"""
from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...config import as_easy
from ...ops import pointnet as pn
from ..model_utils.blocks import MaskedBatchNorm


class SharedMLP(nn.Module):
    """Conv2d-1x1 + BN + ReLU stack over (..., C) token tensors."""

    channels: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, train: bool = True):
        for i, c in enumerate(self.channels):
            x = nn.Dense(int(c), use_bias=False, dtype=self.dtype, name=f"fc{i}")(x)
            x = MaskedBatchNorm(dtype=self.dtype, name=f"bn{i}")(
                x, mask=mask, use_running_average=not train)
            x = nn.relu(x)
        return x


class SAModuleMSG(nn.Module):
    """Multi-scale-grouping set abstraction with optional fusion sampling
    (reference PointnetSAModuleMSG / PointnetSAModuleFSMSG)."""

    npoint_list: Tuple[int, ...]
    sample_range_list: Tuple[Tuple[int, int], ...]
    sample_method_list: Tuple[str, ...]
    radii: Tuple[float, ...]
    nsamples: Tuple[int, ...]
    mlps: Tuple[Tuple[int, ...], ...]
    use_xyz: bool = True
    dilated_radius_group: bool = False
    weight_gamma: float = 1.0
    aggregation_mlp: Tuple[int, ...] = ()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xyz, feats, valid, train: bool = True):
        """xyz (B, N, 3); feats (B, N, C) or None; valid (B, N)."""
        b, n, _ = xyz.shape

        def sample_one(x, f, v):
            idx_list = []
            for method, (lo, hi), npts in zip(
                    self.sample_method_list, self.sample_range_list,
                    self.npoint_list):
                hi = min(hi, n)
                xs, vs = x[lo:hi], v[lo:hi]
                if method == "d-fps":
                    si = pn.masked_fps(xs, vs, npts)
                elif method == "f-fps":
                    fs = f[lo:hi] if f is not None else None
                    dm = pn.calc_dist_matrix_for_sampling(xs, fs, self.weight_gamma)
                    si = pn.masked_fps_matrix(dm, vs, npts)
                else:
                    raise NotImplementedError(method)
                idx_list.append(si + lo)
            return jnp.concatenate(idx_list)

        feats_or_dummy = feats if feats is not None else jnp.zeros_like(xyz[..., :1])
        sample_idx = jax.vmap(sample_one)(xyz, feats_or_dummy, valid)  # (B, sum(np))
        new_xyz = jnp.take_along_axis(xyz, sample_idx[..., None], axis=1)
        new_valid = jnp.take_along_axis(valid, sample_idx, axis=1)

        outs = []
        former_r = 0.0
        for gi, (radius, nsample, mlp) in enumerate(
                zip(self.radii, self.nsamples, self.mlps)):
            if self.dilated_radius_group:
                query = jax.vmap(lambda x, v, q, qv: pn.ball_query_dilated(
                    former_r, radius, nsample, x, v, q, qv))
            else:
                query = jax.vmap(lambda x, v, q, qv: pn.ball_query(
                    radius, nsample, x, v, q, qv))
            idx, cnt = query(xyz, valid, new_xyz, new_valid)  # (B, M, ns)
            former_r = radius

            grouped_xyz = jnp.take_along_axis(
                xyz[:, :, None, :].repeat(1, axis=2),
                idx[..., None].repeat(3, axis=-1), axis=1)  # (B, M, ns, 3)
            grouped_xyz = grouped_xyz - new_xyz[:, :, None, :]
            parts = [grouped_xyz] if self.use_xyz else []
            if feats is not None:
                grouped_f = jnp.take_along_axis(
                    feats[:, :, None, :].repeat(1, axis=2),
                    idx[..., None].repeat(feats.shape[-1], axis=-1), axis=1)
                parts.append(grouped_f)
            g = jnp.concatenate(parts, axis=-1)
            tok_mask = (cnt > 0)[..., None] & jnp.ones_like(idx, bool)
            g = SharedMLP(tuple(mlp), dtype=self.dtype, name=f"mlp_{gi}")(
                g, mask=tok_mask, train=train)
            g = g * (cnt > 0)[..., None, None].astype(g.dtype)
            pooled = jnp.max(g, axis=2)  # (B, M, mlp[-1])
            outs.append(pooled)
        new_feats = jnp.concatenate(outs, axis=-1)
        if self.aggregation_mlp:
            new_feats = SharedMLP(tuple(self.aggregation_mlp), dtype=self.dtype,
                                  name="agg")(new_feats, mask=new_valid, train=train)
        return new_xyz, new_feats, new_valid


class FPModule(nn.Module):
    """Feature propagation: 3-NN interpolate + MLP (reference
    PointnetFPModule)."""

    mlp: Tuple[int, ...]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, unknown, unknown_valid, known, known_valid,
                 unknown_feats, known_feats, train: bool = True):
        def interp_one(u, uv, k, kv, kf):
            idx, dist = pn.three_nn(u, uv, k, kv)
            return pn.three_interpolate(kf, idx, dist)

        interp = jax.vmap(interp_one)(unknown, unknown_valid, known,
                                      known_valid, known_feats)
        if unknown_feats is not None:
            interp = jnp.concatenate([interp, unknown_feats], axis=-1)
        return SharedMLP(tuple(self.mlp), dtype=self.dtype)(
            interp, mask=unknown_valid, train=train)


class PointNet2MSG(nn.Module):
    """Reference PointNet2MSG (pointnet2_backbone.py:7-93) — SA pyramid +
    FP decoder back to the full point set."""

    model_cfg: Any
    input_channels: int
    grid_size: Tuple[int, ...] = (1, 1)
    voxel_size: Tuple[float, ...] = (1, 1, 1)
    point_cloud_range: Tuple[float, ...] = ()
    max_pillars: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, batch_dict, train: bool = True):
        cfg = as_easy(self.model_cfg)
        sa_cfg = cfg.SA_CONFIG
        points = batch_dict["points"]
        valid = batch_dict["point_mask"]
        xyz = points[..., :3]
        feats = points[..., 3:].astype(self.dtype) if points.shape[-1] > 3 else None

        l_xyz, l_feats, l_valid = [xyz], [feats], [valid]
        for k in range(len(sa_cfg.NPOINTS)):
            npoint = sa_cfg.NPOINTS[k]
            npoint_list = npoint if isinstance(npoint, (list, tuple)) else [npoint]
            nx, nf, nv = SAModuleMSG(
                npoint_list=tuple(int(v) for v in npoint_list),
                sample_range_list=tuple((0, 10 ** 9) for _ in npoint_list),
                sample_method_list=tuple("d-fps" for _ in npoint_list),
                radii=tuple(float(r) for r in sa_cfg.RADIUS[k]),
                nsamples=tuple(int(s) for s in sa_cfg.NSAMPLE[k]),
                mlps=tuple(tuple(int(c) for c in m) for m in sa_cfg.MLPS[k]),
                use_xyz=bool(sa_cfg.get("USE_XYZ", True)),
                dtype=self.dtype, name=f"sa_{k}",
            )(l_xyz[k], l_feats[k], l_valid[k], train=train)
            l_xyz.append(nx)
            l_feats.append(nf)
            l_valid.append(nv)

        fp_mlps = cfg.FP_MLPS
        for i in range(len(fp_mlps) - 1, -1, -1):
            l_feats[i] = FPModule(
                mlp=tuple(int(c) for c in fp_mlps[i]), dtype=self.dtype,
                name=f"fp_{i}",
            )(l_xyz[i], l_valid[i], l_xyz[i + 1], l_valid[i + 1],
              l_feats[i], l_feats[i + 1], train=train)

        batch_dict["point_features"] = l_feats[0]  # (B, N, C)
        batch_dict["point_coords"] = l_xyz[0]
        batch_dict["point_valid"] = l_valid[0]
        return batch_dict

    @property
    def num_point_features(self):
        return int(as_easy(self.model_cfg).FP_MLPS[0][-1])


class PointNet2SAMSG(nn.Module):
    """Reference PointNet2SAMSG (pointnet2_backbone.py:95-189) — fusion
    sampling (d-fps + f-fps) SA pyramid; emits the last level's points."""

    model_cfg: Any
    input_channels: int
    grid_size: Tuple[int, ...] = (1, 1)
    voxel_size: Tuple[float, ...] = (1, 1, 1)
    point_cloud_range: Tuple[float, ...] = ()
    max_pillars: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, batch_dict, train: bool = True):
        cfg = as_easy(self.model_cfg)
        sa_cfg = cfg.SA_CONFIG
        points = batch_dict["points"]
        valid = batch_dict["point_mask"]
        xyz = points[..., :3]
        feats = points[..., 3:].astype(self.dtype) if points.shape[-1] > 3 else None

        l_xyz, l_feats, l_valid = [xyz], [feats], [valid]
        for k in range(len(sa_cfg.NPOINTS)):
            nx, nf, nv = SAModuleMSG(
                npoint_list=tuple(int(v) for v in sa_cfg.NPOINTS[k]),
                sample_range_list=tuple(
                    (int(a), int(b)) for a, b in sa_cfg.SAMPLE_RANGE[k]),
                sample_method_list=tuple(sa_cfg.SAMPLE_METHOD[k]),
                radii=tuple(float(r) for r in sa_cfg.RADIUS[k]),
                nsamples=tuple(int(s) for s in sa_cfg.NSAMPLE[k]),
                mlps=tuple(tuple(int(c) for c in m) for m in sa_cfg.MLPS[k]),
                use_xyz=bool(sa_cfg.get("USE_XYZ", True)),
                dilated_radius_group=bool(sa_cfg.get("DILATED_RADIUS_GROUP", False)),
                weight_gamma=float(sa_cfg.get("WEIGHT_GAMMA", 1.0)),
                aggregation_mlp=tuple(
                    int(c) for c in sa_cfg.AGGREGATION_MLPS[k]),
                dtype=self.dtype, name=f"sa_{k}",
            )(l_xyz[k], l_feats[k], l_valid[k], train=train)
            l_xyz.append(nx)
            l_feats.append(nf)
            l_valid.append(nv)

        batch_dict["point_coords"] = l_xyz[-1]  # (B, M, 3)
        batch_dict["point_features"] = l_feats[-1]
        batch_dict["point_valid"] = l_valid[-1]
        return batch_dict

    @property
    def num_point_features(self):
        cfg = as_easy(self.model_cfg)
        agg = cfg.SA_CONFIG.AGGREGATION_MLPS[-1]
        if agg:
            return int(agg[-1])
        return sum(int(m[-1]) for m in cfg.SA_CONFIG.MLPS[-1])
