"""KITTI-360 raw-scan dataset — the label-free MAE pretraining corpus
(reference pcdet/datasets/kitti360/kitti360_dataset.py)."""
from __future__ import annotations

from pathlib import Path

import numpy as np

from ..dataset import DatasetTemplate


class Kitti360Dataset(DatasetTemplate):
    def __init__(self, dataset_cfg, class_names, training=True, root_path=None, logger=None):
        super().__init__(
            dataset_cfg=dataset_cfg, class_names=class_names, training=training,
            root_path=root_path, logger=logger,
        )
        raw_dir = Path(self.root_path) / "data_3d_raw"
        self.scan_files = (
            sorted(str(p.relative_to(raw_dir)) for p in raw_dir.rglob("*.bin"))
            if raw_dir.exists() else []
        )
        if self.logger is not None:
            self.logger.info("Total samples for KITTI-360 dataset: %d", len(self.scan_files))

    def get_lidar(self, rel_path):
        f = Path(self.root_path) / "data_3d_raw" / rel_path
        return np.fromfile(str(f), dtype=np.float32).reshape(-1, 4)

    def __len__(self):
        if self._merge_all_iters_to_one_epoch:
            return len(self.scan_files) * self.total_epochs
        return len(self.scan_files)

    def __getitem__(self, index):
        if self._merge_all_iters_to_one_epoch:
            index = index % len(self.scan_files)
        rel_path = self.scan_files[index]
        parts = Path(rel_path).parts
        frame_id = (parts[-4] if len(parts) >= 4 else "seq") + "_" + Path(rel_path).stem

        input_dict = {"frame_id": frame_id}
        if "points" in self.dataset_cfg.get("GET_ITEM_LIST", ["points"]):
            input_dict["points"] = self.get_lidar(rel_path)
        return self.prepare_data(data_dict=input_dict)
