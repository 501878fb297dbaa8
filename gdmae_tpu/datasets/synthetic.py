"""Synthetic random-scene dataset: drive the FULL training/eval CLIs with
no downloaded data.

Samples are generated from the real DATA_CONFIG geometry (point cloud
range, class list) and flow through the REAL ``prepare_data`` pipeline —
world-transform augmentations (gt_sampling is disabled: it needs database
files), point-feature encoding, and the processor queue — so everything
except file IO is exercised.  Select with ``DATASET: SyntheticDataset`` or
``tools/train.py --synthetic N``.
"""
from __future__ import annotations

import copy

import numpy as np

from .dataset import DatasetTemplate


class SyntheticDataset(DatasetTemplate):
    def __init__(self, dataset_cfg=None, class_names=None, training=True,
                 root_path=None, logger=None):
        dataset_cfg = copy.deepcopy(dataset_cfg)
        aug = dataset_cfg.get("DATA_AUGMENTOR", None)
        if aug is not None:
            disable = set(aug.get("DISABLE_AUG_LIST", []))
            disable.add("gt_sampling")
            aug["DISABLE_AUG_LIST"] = sorted(disable)
        super().__init__(
            dataset_cfg=dataset_cfg, class_names=class_names,
            training=training, root_path=root_path or ".", logger=logger,
        )
        syn = dataset_cfg.get("SYNTHETIC", {})
        self.num_samples = int(syn.get("NUM_SAMPLES", 64))
        self.num_points = int(syn.get("NUM_POINTS", 16384))
        self.num_objects = int(syn.get("NUM_OBJECTS", 8))
        self.seed = int(syn.get("SEED", 0))

    def __len__(self):
        return self.num_samples

    def _raw_sample(self, index):
        rng = np.random.RandomState(self.seed + index)
        x0, y0, z0, x1, y1, z1 = self.point_cloud_range
        n = self.num_points
        pts = np.zeros((n, 4), np.float32)
        pts[:, 0] = rng.uniform(x0, x1, n)
        pts[:, 1] = rng.uniform(y0, y1, n)
        pts[:, 2] = rng.uniform(max(z0, -2.5), min(z1, 0.5), n)
        pts[:, 3] = rng.uniform(0, 1, n)

        k = self.num_objects
        boxes = np.zeros((k, 7), np.float32)
        boxes[:, 0] = rng.uniform(x0 + 3, x1 - 3, k)
        boxes[:, 1] = rng.uniform(y0 + 3, y1 - 3, k)
        boxes[:, 2] = rng.uniform(-1.5, -0.5, k)
        boxes[:, 3] = rng.uniform(1.6, 4.5, k)
        boxes[:, 4] = rng.uniform(1.4, 2.0, k)
        boxes[:, 5] = rng.uniform(1.4, 1.8, k)
        boxes[:, 6] = rng.uniform(-np.pi, np.pi, k)
        names = np.array(
            [self.class_names[i % len(self.class_names)] for i in range(k)])

        # densify each box with a few points so heads have signal to fit
        extra = []
        for b in boxes:
            m = 32
            local = rng.uniform(-0.5, 0.5, (m, 3)) * b[3:6]
            c, s = np.cos(b[6]), np.sin(b[6])
            rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
            p = local @ rot.T + b[:3]
            extra.append(np.concatenate(
                [p, rng.uniform(0, 1, (m, 1))], axis=1).astype(np.float32))
        pts = np.concatenate([pts] + extra, axis=0)

        return {
            "points": pts,
            "gt_boxes": boxes,
            "gt_names": names,
            "frame_id": index,
            "use_lead_xyz": True,
            "transformation_3d_list": [],
            "transformation_3d_params": {},
        }

    def __getitem__(self, index):
        return self.prepare_data(self._raw_sample(index % self.num_samples))

    # eval protocol: trivial passthrough so the eval CLI runs end-to-end
    @staticmethod
    def generate_prediction_dicts(batch_dict, pred_dicts, class_names,
                                  output_path=None):
        annos = []
        for i, pd in enumerate(pred_dicts):
            annos.append({
                "name": np.array(
                    [class_names[int(l) - 1] for l in pd["pred_labels"]]),
                "score": np.asarray(pd["pred_scores"]),
                "boxes_lidar": np.asarray(pd["pred_boxes"]),
                "frame_id": batch_dict["frame_id"][i]
                if "frame_id" in batch_dict else i,
            })
        return annos

    def evaluation(self, det_annos, class_names, **kwargs):
        n = sum(len(a["name"]) for a in det_annos)
        return f"synthetic eval: {len(det_annos)} frames, {n} detections", {
            "num_detections": n}
