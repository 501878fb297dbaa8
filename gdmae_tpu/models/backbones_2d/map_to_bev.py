"""map_to_bev modules (reference pcdet/models/backbones_2d/map_to_bev/).

``PointPillarScatter`` scatters pillar features onto the dense BEV canvas
(reference pointpillar_scatter.py:5-37) — in the TPU design this reuses the
canvas scatter of the SPT backbone.  ``HeightCompression`` flattens a sparse
3D volume's z axis onto BEV channels (reference height_compression.py:4-26).
"""
from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ...config import as_easy
from ..backbones_3d.spt_backbone import scatter_pillars_to_canvas


class PointPillarScatter(nn.Module):
    model_cfg: Any
    grid_size: Tuple[int, int]  # (nx, ny)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, batch_dict, train: bool = True):
        ny, nx = int(self.grid_size[1]), int(self.grid_size[0])
        # hard-voxelized pillars arrive in first-come (NOT raster) order
        canvas, occ = scatter_pillars_to_canvas(
            batch_dict["pillar_features"].astype(self.dtype),
            batch_dict["pillar_coords"],
            batch_dict["pillar_mask"],
            (ny, nx),
            sorted_cells=False,
        )
        batch_dict["spatial_features"] = canvas
        batch_dict["spatial_occupancy"] = occ
        batch_dict["spatial_features_stride"] = 1
        return batch_dict

    @property
    def num_bev_features(self):
        return int(as_easy(self.model_cfg).NUM_BEV_FEATURES)


class HeightCompression(nn.Module):
    """Flatten (B, Z, Ny, Nx, C) dense voxel features to (B, Ny, Nx, Z*C)."""

    model_cfg: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, batch_dict, train: bool = True):
        x = batch_dict["encoded_voxel_features"]  # (B, Z, Ny, Nx, C)
        b, z, ny, nx, c = x.shape
        batch_dict["spatial_features"] = x.transpose(0, 2, 3, 1, 4).reshape(
            b, ny, nx, z * c)
        batch_dict["spatial_features_stride"] = batch_dict.get(
            "encoded_voxel_stride", 8)
        return batch_dict

    @property
    def num_bev_features(self):
        return int(as_easy(self.model_cfg).NUM_BEV_FEATURES)
